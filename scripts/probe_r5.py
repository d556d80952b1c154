"""Round-5 stage micro-probes on the real TPU: segment-starts strategies
(ss_scan vs bincount vs MXU hist jnp/pallas) and sort strategies (17-operand
payload vs 2-operand rank+gather), at production shapes.

Methodology (docs/PERF_NOTES.md r4 + memory notes): every timed program
carries an in-jit checksum reduction so a sliced fetch cannot under-wait;
the tunnel's ~28 ms dispatch RTT is measured same-run and reported, and
each probe runs at TWO scales so the MARGINAL time is RTT-free. Nothing
else may run on the host CPU during this script.

    python scripts/probe_r5.py [--log-size 20] > artifacts/probe_r5.log
"""

from __future__ import annotations

import argparse
import time

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from tpu_msm.utils.config import enable_persistent_cache


def _median_time(fn, reps=7):
    import jax

    jax.block_until_ready(fn())  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())  # device->host fetch of the (tiny) checksum
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-size", type=int, default=20)
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    n = 1 << args.log_size
    m = 1 << 15  # signed c=16 bucket count
    rng = np.random.RandomState(11)
    print(f"probe_r5: n=2^{args.log_size}, m={m}, backend="
          f"{jax.default_backend()}", flush=True)

    rtt = _median_time(jax.jit(lambda: jnp.uint32(1) + jnp.uint32(1)),
                       args.reps)
    print(f"RTT floor (trivial jit): {rtt*1e3:.2f} ms", flush=True)

    digits = jax.device_put(
        rng.randint(0, m + 2, size=n).astype(np.uint32))
    sorted_digits = jax.device_put(np.sort(np.asarray(digits)))
    ops = [jax.device_put(rng.randint(0, 1 << 32, size=n, dtype=np.uint64)
                          .astype(np.uint32)) for _ in range(16)]
    jax.block_until_ready([digits, sorted_digits] + ops)

    # --- segment starts: k repetitions inside one jit (marginal = per-call).
    # Inputs are passed as jit ARGUMENTS: closed-over device arrays trace as
    # jaxpr constants and XLA constant-folds whole stages at compile time
    # (first clean run measured the 17-operand sort at x1 BELOW the RTT
    # floor — nothing ran at runtime).
    def starts_prog(kind, k):
        @jax.jit
        def f_(d_in):
            acc = jnp.uint32(0)
            for i in range(k):
                d = d_in
                # acc-dependent xor defeats CSE across the k repetitions
                # (timing only; the correctness check below runs separately)
                d = d ^ (acc & jnp.uint32(1))
                if kind == "ss_scan":
                    bvals = jnp.arange(1, m + 1, dtype=jnp.uint32)
                    s = jnp.searchsorted(d, bvals, side="left",
                                         method="scan").astype(jnp.uint32)
                elif kind == "bincount":
                    counts = jnp.bincount(d, length=m + 2)
                    s = jnp.cumsum(counts)[:m].astype(jnp.uint32)
                elif kind == "hist_jnp":
                    from tpu_msm.ops import hist
                    s = hist.segment_starts_hist(d, m).astype(jnp.uint32)
                else:  # hist_pallas
                    from tpu_msm.ops import hist
                    s = hist.segment_starts_hist_pallas(d, m).astype(
                        jnp.uint32)
                wq = jnp.arange(1, m + 1, dtype=jnp.uint32)
                acc = acc + (s * wq).sum()  # order-dependent (see below)
            return acc
        d_arg = sorted_digits if kind.startswith("ss") else digits
        return lambda: f_(d_arg)

    for kind in ("ss_scan", "bincount", "hist_jnp", "hist_pallas"):
        try:
            t1 = _median_time(starts_prog(kind, 1), args.reps)
            t3 = _median_time(starts_prog(kind, 3), args.reps)
            print(f"starts/{kind:12s}: x1 {t1*1e3:7.2f} ms  x3 {t3*1e3:7.2f}"
                  f" ms  marginal {(t3-t1)/2*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"starts/{kind}: FAILED {type(e).__name__}: {e}",
                  flush=True)

    # --- correctness cross-check on-device (hist vs searchsorted)
    from tpu_msm.ops import hist
    s_ref = np.asarray(jax.jit(lambda: jnp.searchsorted(
        sorted_digits, jnp.arange(1, m + 1, dtype=jnp.uint32), side="left",
        method="scan"))())
    for name, fn in (("hist_jnp", hist.segment_starts_hist),
                     ("hist_pallas", hist.segment_starts_hist_pallas)):
        try:
            got = np.asarray(fn(digits, m))
            print(f"check/{name}: {'OK' if (got == s_ref).all() else 'MISMATCH'}",
                  flush=True)
        except Exception as e:
            print(f"check/{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # --- sort strategies at production payload
    lanes = 4096
    steps = n // lanes

    # Position-weighted checksums: a plain .sum() over a sorted/gathered
    # array is permutation-INVARIANT, so XLA eliminates the whole sort as
    # dead code (first warm run measured the 17-operand sort at ~0 ms
    # marginal). Multiplying by the position index makes the reduction
    # order-dependent; the extra n mul+adds are noise at this scale.
    wpos = jnp.arange(1 << args.log_size, dtype=jnp.uint32)

    def sort_prog(kind, k):
        @jax.jit
        def f_(d_in, *ops_in):
            acc = jnp.uint32(0)
            for i in range(k):
                d = d_in ^ (acc & jnp.uint32(1))  # defeat cross-rep CSE
                if kind == "payload17":
                    out = jax.lax.sort([d] + list(ops_in), num_keys=1)
                    acc = acc + (out[1] * wpos).sum() + (out[16] * wpos).sum()
                elif kind == "sort2":
                    sd, si = jax.lax.sort_key_val(
                        d, jnp.arange(n, dtype=jnp.int32))
                    acc = acc + (sd * wpos).sum() + (
                        si.astype(jnp.uint32) * wpos).sum()
                else:  # rank_full: sort2 + row gather + kernel-layout moveaxis
                    sd, si = jax.lax.sort_key_val(
                        d, jnp.arange(n, dtype=jnp.int32))
                    # xor ties rows_t to the iteration so the (n, 16) build
                    # (the pipeline's per-window select+transpose cost) is
                    # not hoisted out of the k repetitions
                    rows_t = jnp.stack(
                        [o ^ (acc & jnp.uint32(1)) for o in ops_in], axis=1)
                    g = jnp.take(rows_t, si, axis=0).T   # (16, n)
                    gt = g.reshape(16, lanes, steps)
                    sg = jnp.moveaxis(gt, 1, 2)          # (16, steps, lanes)
                    acc = acc + (sg * wpos.reshape(1, steps, lanes)).sum() \
                        + (sd * wpos).sum()
            return acc
        return lambda: f_(digits, *ops)

    for kind in ("payload17", "sort2", "rank_full"):
        try:
            t1 = _median_time(sort_prog(kind, 1), args.reps)
            t3 = _median_time(sort_prog(kind, 3), args.reps)
            print(f"sort/{kind:10s}: x1 {t1*1e3:7.2f} ms  x3 {t3*1e3:7.2f} ms"
                  f"  marginal {(t3-t1)/2*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"sort/{kind}: FAILED {type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
