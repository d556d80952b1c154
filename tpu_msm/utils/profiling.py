"""Per-stage profiling and roofline accounting.

Reference parity (SURVEY.md §5.1): the reference wraps every pipeline stage
in `log::debug!` wall-clock timers (src/metal/msm.rs:193-215) and ships a
`profiling-release` build for Xcode GPU capture (build.rs:39-41). The TPU
equivalents here:

* `profile_stages(log_n, cfg)` — times each pipeline stage as its own jitted
  sub-graph with true host-fetch sync (on the tunneled TPU platform,
  `block_until_ready` returns at enqueue time) and logs a breakdown.
* `trace(path)` — context manager around `jax.profiler.trace` for XLA-level
  traces viewable in TensorBoard/Perfetto.
* `roofline(log_n, cfg, seconds)` — compares the measured Montgomery-multiply
  rate against the VPU integer-op roofline (BASELINE.md acceptance: within
  1.5x of roofline).
"""

from __future__ import annotations

import contextlib
import logging
import time

import numpy as np

log = logging.getLogger("tpu_msm.profiling")


def _sync(x):
    import jax

    leaves = jax.tree.leaves(x)
    np.asarray(leaves[0].ravel()[0:1])
    return x


def time_fn(fn, *args, iters: int = 2):
    """Compile, then median-time `fn(*args)` with host-fetch sync."""
    import jax

    jitted = jax.jit(fn)
    _sync(jitted(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(jitted(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


@contextlib.contextmanager
def trace(path: str = "/tmp/tpu_msm_trace"):
    """XLA profiler trace (TensorBoard-compatible)."""
    import jax

    jax.profiler.start_trace(path)
    try:
        yield path
    finally:
        jax.profiler.stop_trace()


def profile_stages(log_n: int, cfg=None, seed: int = 1):
    """Stage-by-stage timing of the MSM pipeline at 2^log_n points.

    Returns {stage: seconds} and logs the breakdown. Stages mirror the
    reference pipeline (msm.rs:189-217): sort (≙ prepare+sort), scan
    (≙ bucket_wise_accumulation), window reduction (≙ sum_reduction), and
    the full end-to-end run (the difference is sort/gather/query overhead).
    """
    import jax.numpy as jnp

    from tpu_msm import msm_device
    from tpu_msm.models import bn254
    from tpu_msm.ops import pippenger
    from tpu_msm.utils import preprocess
    from tpu_msm.utils.config import select_config, resolve_backend, MsmConfig

    n = 1 << log_n
    if cfg is None:
        cfg = select_config(n)
    cfg = MsmConfig(window_bits=cfg.window_bits, scan_lanes=cfg.scan_lanes,
                    reduce_fanout=cfg.reduce_fanout,
                    backend=resolve_backend(cfg.backend))
    inst = preprocess.get_or_create_msm_instances(log_n, 1, seed=seed)[0]
    px, py, sl = (jnp.asarray(inst.px), jnp.asarray(inst.py),
                  jnp.asarray(inst.scalars))
    results = {}

    def stage_sort(sl, px, py):
        import jax

        digits = pippenger.window_digits(sl, cfg)
        idx = jnp.arange(digits.shape[1], dtype=jnp.int32)
        _, sidx = jax.lax.sort_key_val(digits[0], idx)
        return jnp.take(px, sidx, axis=1), jnp.take(py, sidx, axis=1)

    results["sort_1window"] = time_fn(stage_sort, sl, px, py)
    results["window_sums_all"] = time_fn(
        lambda a, b, s: pippenger.window_sums(
            __import__("tpu_msm.ops.curve", fromlist=["AffinePoint"]).AffinePoint(a, b), s, cfg),
        px, py, sl)
    results["end_to_end"] = time_fn(lambda a, b, s: msm_device(a, b, s, cfg), px, py, sl)
    for k, v in results.items():
        log.info("%s: %.1f ms", k, v * 1e3)
    log.info("throughput: %.2f Mpoints/s", n / results["end_to_end"] / 1e6)
    return results


# v5e VPU: 8 sublanes x 128 lanes x ~940 MHz; one u32 op per lane per cycle.
VPU_U32_OPS_PER_S = 8 * 128 * 940e6
# One 256-bit Montgomery multiply, u16 rows (pallas_curve): 648 u32
# multiplies (full product 256 + REDC m 136 + m*P 256) at 5 ops each
# (mul/mask/shift/2 adds) plus three carry ripples ≈ 3.6k u32 ops; the
# original 2100 estimate undercounted the per-product accumulation.
MONT_MUL_U32_OPS = {"u16": 3600, "f15": 2450}
# RCB mixed addition: 11 Montgomery muls + 2 mul-by-9 chains + ~12 mod-adds.
MADD_MONT_MULS = 11


def roofline(log_n: int = 20, cfg=None):
    """Measured end-to-end Montgomery-mul rate vs the VPU roofline.

    Counts ~12 Montgomery multiplies per mixed add and W*(n + M) adds per
    MSM; BASELINE.md acceptance is >= 1/1.5 of roofline for the mul kernel.
    """
    from tpu_msm.utils.config import select_config

    n = 1 << log_n
    if cfg is None:
        cfg = select_config(n)
    stats = profile_stages(log_n, cfg)
    w = cfg.num_windows()
    m = cfg.buckets_per_window()
    ec_adds = w * (n + m)
    mont_muls = ec_adds * MADD_MONT_MULS
    rate = mont_muls / stats["end_to_end"]
    ops = MONT_MUL_U32_OPS.get(getattr(cfg, "field_impl", "u16"),
                               MONT_MUL_U32_OPS["u16"])
    peak = VPU_U32_OPS_PER_S / ops
    log.info("mont-mul rate: %.1f M/s; VPU roofline %.1f M/s (%s core); "
             "ratio %.2fx", rate / 1e6, peak / 1e6,
             getattr(cfg, "field_impl", "u16"), peak / rate)
    return {"mont_mul_per_s": rate, "roofline_per_s": peak,
            "ratio_to_roofline": peak / rate, **stats}
