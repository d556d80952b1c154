"""MSM configuration: tuned constants promoted into a real config object.

The reference hard-codes its tuning (window size 15 at src/metal/msm.rs:140,
GPU threshold 2^17 at msm.rs:440, split ratios msm.rs:377-383, 128
pairs/thread bucket_wise_accumulation.rs:38, ...) with several "TODO - learn
how to calculate this" notes. Here every knob lives in one dataclass with a
size-driven selection function, so autotuning can overwrite it.
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class MsmConfig:
    """Static (trace-time) configuration of the Pippenger pipeline."""

    # Window size in bits. 16 and 8 align digits exactly with the u16 limb
    # representation (digit extraction becomes a limb slice); other values are
    # supported via bit extraction. Reference default: 15 (msm.rs:135-141).
    window_bits: int = 16

    # Number of scan lanes (the vectorization width of the sequential
    # prefix-scan stage). Reference analogue: pairs-per-thread / threads-per-
    # group sizing (bucket_wise_accumulation.rs:38-49).
    scan_lanes: int = 8192

    # Sequential fold widths for the bucket-query reduction.
    reduce_fanout: int = 4096

    # EC-op backend: "auto" (pallas on TPU, jnp on CPU), "pallas", or "jnp".
    # Pallas = fused VMEM-resident kernels (tpu_msm.ops.pallas_curve); batches
    # narrower than 1024 lanes fall back to jnp ops either way.
    backend: str = "auto"

    # Number of significant scalar bits. BN254 Fr is a 254-bit prime
    # (reference: ScalarGPU::MODULUS_BIT_SIZE, limbs_conversion.rs:49-63,
    # driving window_num at msm.rs:143-146). Callers whose scalars are
    # bounded tighter (e.g. small exponents) may lower this — windows above
    # ceil(scalar_bits / window_bits) are provably all-zero and are neither
    # computed nor compiled. Scalars MUST be < 2^scalar_bits.
    scalar_bits: int = 254

    # Signed-digit (balanced) window recoding: digits live in
    # [-2^(c-1), 2^(c-1)] instead of [0, 2^c), negative digits negate the
    # point (y -> P - y, free in affine form). Halves the bucket range —
    # half the bucket-boundary queries and reduction work per window — and
    # turns the M*X(n) term into pure doublings (M = 2^(c-1)). The window
    # count needs one extra bit of headroom for the recoding carry
    # (ceil((scalar_bits+1)/c)) — identical to the unsigned count unless
    # window_bits divides scalar_bits. Bit-exactness is unaffected: the
    # digits still sum to the scalar exactly (SURVEY §7 allows signed
    # windows explicitly).
    signed_digits: bool = False

    # Windows processed together (jax.lax.map batch_size — vmaps the window
    # body over k windows at a time). 1 = fully sequential (minimum memory);
    # 2/4 trade ~270 MB HBM per extra window at 2^20 for cross-window
    # instruction-level overlap between the sort/scan/reduce stages.
    window_batch: int = 1

    # How bucket segment starts s_b are located in the sorted digit array:
    #   "bincount"  — histogram (scatter-add) + exclusive cumsum
    #   "ss_scan"   — vectorized binary search (jnp.searchsorted, 'scan')
    #   "ss_sort"   — searchsorted via one extra keys-only sort ('sort')
    #   "ss_2level" — two-level search (measured rejection, kept in-tree)
    #   "hist"      — MXU histogram (one-hot matmul) + cumsum: zero gathers,
    #                 zero scatters, order-free so it runs off the sort's
    #                 critical path (ops/hist.py; the r5 default on TPU).
    #                 Row-input kernel (digit_hist_pallas2): one (1, CHUNK)
    #                 view, dot contracts chunk-dim x chunk-dim.
    #   "hist_cols" — the two-view histogram kernel (row + column digit
    #                 layouts); kept for A/B — its (steps, CHUNK, 1) input
    #                 costs a T(8,128) relayout the row kernel avoids
    # All are exact (the reference binary-searches per threadgroup,
    # msm.h.metal:119-131); which is fastest on TPU depends on how XLA
    # lowers scatter vs gather-loop vs sort vs dot — an autotune decision.
    segment_starts: str = "bincount"

    # How points reach digit-sorted order for the scan stage:
    #   "payload" — ONE 17-operand lax.sort carrying digits + both packed
    #               coordinates (no gathers; the r2-r4 production path)
    #   "rank"    — 2-operand (digit, position) sort + one row-major gather
    #               of the (n, 16)-packed coordinates. Moves 2 operands
    #               through the comparator network instead of 17 at the cost
    #               of one embedding-style row gather + a layout transpose;
    #               the payload sort measured superlinear per operand at
    #               2^22 (~2.7 ms/operand, artifacts/sort_probe.log).
    sort_impl: str = "payload"

    # Limb representation inside the fused scan kernel: "u16" (16x16-bit
    # rows), "f15" (17x15-bit rows — grouped raw product accumulation,
    # ~30% fewer VPU ops per mixed add; see ops/f15.py), "f15d" (the f15
    # core over two interleaved half-blocks so every op has a pairable twin
    # for the VPU's second VLIW issue slot — ec_rows.DualField; scan kernel
    # only, needs >= 2048 lanes), or "mxu" (the f15
    # core with REDC's constant convolutions as int8 MXU matmuls — see
    # ops/fmxu.py; applies to the scan kernel, side stages run f15). Wire
    # format at the kernel boundary is identical, so this is purely a
    # kernel-internal choice; results are bit-exact either way.
    field_impl: str = "u16"

    # Scan steps processed per Pallas grid step (field_impl="f15d" only).
    # The 1-step kernel measured 121 us/grid-step against a 56 us dual-issue
    # compute bound at 4096 lanes (artifacts/scan_probe.log) — per-step
    # DMA/launch overhead; batching amortizes it. Must divide the step
    # count or the kernel falls back to 1.
    scan_step_batch: int = 1

    # GLV endomorphism decomposition (ops/glv.py): each 254-bit scalar is
    # split into two signed halves |k_i| < 2^127 and the point set is
    # doubled with phi(P) = (BETA*x, y), so the pipeline runs 2n points over
    # HALF the windows — the scan work is unchanged but every per-window
    # fixed cost (lane-carry scan, bucket queries, ec_reduce, Horner)
    # halves. Requires signed_digits and the default scalar_bits (the
    # decomposition bound analysis assumes canonical scalars < r). Bit-exact
    # (tests/test_glv.py); the reference has no analogue.
    glv: bool = False

    def __post_init__(self):
        if self.scan_step_batch < 1:
            raise ValueError(
                f"scan_step_batch must be >= 1, got {self.scan_step_batch}")
        if self.segment_starts not in ("bincount", "ss_scan", "ss_sort",
                                       "ss_2level", "hist", "hist_cols"):
            raise ValueError(f"unknown segment_starts {self.segment_starts!r}")
        if self.sort_impl not in ("payload", "rank"):
            raise ValueError(f"unknown sort_impl {self.sort_impl!r}")

    def num_windows(self) -> int:
        bits = self.scalar_bits + (1 if self.signed_digits else 0)
        return -(-bits // self.window_bits)

    def buckets_per_window(self) -> int:
        if self.signed_digits:
            return 1 << (self.window_bits - 1)
        return (1 << self.window_bits) - 1


def resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    import jax

    # Honor an active jax.default_device(...) context: computations placed
    # on a CPU device must use the jnp ops even when a TPU backend exists
    # in the process (jax.default_backend() ignores the context — measured
    # on the axon host, r5; Pallas kernels are TPU-only).
    dd = jax.config.jax_default_device
    if dd is not None:
        plat = getattr(dd, "platform", str(dd))
        return "jnp" if plat == "cpu" else "pallas"
    return "jnp" if jax.default_backend() == "cpu" else "pallas"


def select_config(n: int) -> MsmConfig:
    """Size-driven config selection (reference: window_size heuristic,
    src/metal/msm.rs:135-141 picks c=15, or c=3 below 32 points).

    First consults the measured autotune table (tpu_msm.utils.autotune —
    the reference's "TODO - learn how to calculate this" done with data);
    falls back to the cost model: total EC adds ~= num_windows * (n + 2^c),
    c in {8, 16} keeps digit extraction free (limb-aligned), crossover at
    n ~= 2^17.
    """
    from tpu_msm.utils import autotune

    tuned = autotune.lookup(n)
    if tuned is not None:
        lanes = tuned["scan_lanes"]
        while lanes > 8 and lanes * 2 > n:
            lanes //= 2
        return MsmConfig(window_bits=tuned["window_bits"], scan_lanes=lanes,
                         reduce_fanout=tuned["reduce_fanout"],
                         signed_digits=tuned.get("signed_digits", False),
                         field_impl=tuned.get("field_impl", "u16"),
                         segment_starts=tuned.get("segment_starts",
                                                  "bincount"),
                         window_batch=tuned.get("window_batch", 1),
                         glv=tuned.get("glv", False),
                         scan_step_batch=tuned.get("scan_step_batch", 1),
                         sort_impl=tuned.get("sort_impl", "payload"))
    if n < (1 << 17):
        c = 8
        signed = False
        fimpl = "u16"
    else:
        c = 16
        # Large sizes: balanced windows halve the bucket-query/reduce work
        # and the 15-bit limb core cuts ~30% of the scan kernel's VPU ops;
        # both are bit-exact vs the u16/unsigned path (tests/test_f15.py,
        # test_pippenger.py) — strictly less work, so on by default. The
        # measured autotune table overrides this heuristic when present.
        signed = True
        fimpl = "f15"
    lanes = 8192
    # Small inputs: don't spread thinner than one point per lane.
    while lanes > 8 and lanes * 2 > n:
        lanes //= 2
    return MsmConfig(window_bits=c, scan_lanes=lanes, signed_digits=signed,
                     field_impl=fimpl)


def enable_persistent_cache() -> None:
    """Point jax's persistent compilation cache at the repo-local dir.

    Distinct full-pipeline graphs cost ~12-15 min of server-side compile on
    the tunneled TPU; serialized executables are a few MB and reload in
    seconds (measured: the streamed-MSM graphs cached by the test suite).
    Call before the first jit execution — bench.py, the autotune sweep and
    the profiler CLI all do. Safe to call twice; no-op if jax already has a
    cache dir configured (e.g. under pytest, conftest set the per-host one).
    """
    import os

    import jax

    if jax.config.jax_compilation_cache_dir:
        return
    d = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".cache", "jax-tpu")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
