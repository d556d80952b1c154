"""Headline benchmark: BN254 G1 MSM throughput on the TPU.

Workload parity with the reference's canonical bench (BN254 G1 MSM at
log-size 20; benches/msm_benchmark.rs:62-67, BASELINE.md): random points and
scalars, timed end-to-end on device (compile excluded), median of repeated
runs, reported as points/sec.

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is the
ratio of two MEASUREMENTS taken in the same run on the same host: the device
pipeline's rate over the native C++ host engine's rate (native/msm_cpu.cpp —
this repo's equivalent of the halo2curves CPU MSM the reference dispatches to
below 2^17, src/metal/msm.rs:440-444). Both numerator and denominator are in
the JSON. The CPU side is measured at min(n, 2^18) and the measured rate is
size-extrapolation-free enough for a baseline (Pippenger rate varies < 15%
across 2^14..2^18 on this host — 89.1 kpts/s at 2^14, 98.0 at 2^16).

Prints exactly one JSON line:
    {"metric": "...", "value": N, "unit": "points/s", "vs_baseline": N, ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Cap for the baseline measurement so bench stays bounded on slow hosts: the
# native engine runs ~100 kpts/s on this 1-core host class (2^18 ≈ 2.7 s).
_BASELINE_MAX_LOG = 18


def _native_baseline(px, py, sl) -> float | None:
    """Measured native-C++-engine rate (pts/s) on a prefix of this run's own
    inputs; None when the engine isn't built (vs_baseline then omitted)."""
    from tpu_msm.bindings import native

    if not native.available():
        return None
    n = min(px.shape[1], 1 << _BASELINE_MAX_LOG)
    cx = np.ascontiguousarray(px[:, :n])
    cy = np.ascontiguousarray(py[:, :n])
    cs = np.ascontiguousarray(sl[:, :n])
    t0 = time.perf_counter()
    native.msm(cx, cy, cs)
    return n / (time.perf_counter() - t0)


def _random_inputs(n: int, seed: int = 1):
    """Random valid G1 points (distinct small multiples of G, tiled) and
    uniform 254-bit scalars, as (16, n) limb arrays."""
    from tpu_msm.utils import interop, oracle

    rng = np.random.RandomState(seed)
    base_count = min(n, 512)
    base = []
    acc = oracle.GEN
    step = oracle.ec_mul(oracle.GEN, 0xDEADBEEF)
    for _ in range(base_count):
        base.append(acc)
        acc = oracle.ec_add(acc, step)
    bx, by = interop.affine_points_to_limbs(base)
    reps = -(-n // base_count)
    px = np.tile(bx, reps)[:, :n]  # numpy tiling: no per-element Python work
    py = np.tile(by, reps)[:, :n]
    sbytes = rng.bytes(32 * n)
    scalars = np.frombuffer(sbytes, dtype="<u2").reshape(n, 16).T.astype(np.uint32)
    scalars[15] &= 0x3FFF  # < 2^254 < r is fine for throughput purposes
    return px, py, scalars


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-size", type=int, default=20)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--stream-above", type=int, default=22,
                    help="log size beyond which the chunked streaming path "
                         "is used (working set exceeds HBM headroom)")
    ap.add_argument("--check", action="store_true",
                    help="verify result vs the Python oracle (slow; small sizes)")
    args = ap.parse_args()

    # Preflight: when a TPU tunnel is configured, probe it in a subprocess
    # with a hard timeout — a dead tunnel otherwise hangs backend init for
    # minutes with no diagnostic (observed: axon relay outages).
    import os
    import subprocess

    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); assert d[0].platform != 'cpu'"],
                capture_output=True, timeout=180)
            ok = probe.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if not ok:
            print("bench: TPU tunnel is not responding (probe failed); "
                  "refusing to hang — fix the tunnel and rerun",
                  file=sys.stderr)
            return 3

    import jax
    import jax.numpy as jnp

    from tpu_msm.utils.config import enable_persistent_cache

    enable_persistent_cache()

    from tpu_msm import msm_device
    from tpu_msm.ops import streaming
    from tpu_msm.utils.config import select_config

    from tpu_msm.utils.config import MsmConfig

    n = 1 << args.log_size
    px, py, sl = _random_inputs(n)
    # Inputs go to HBM ONCE (excluded from timing, like compile): 3 GB even
    # at 2^24 — the streamed path chunks the per-window TRANSIENTS, which
    # are what overflow, not the inputs. Re-streaming inputs per iteration
    # measured 109.8 kpts/s at log 24 over the tunneled host link
    # (artifacts/bench_log24.log r3) vs ~1.5 Mpts/s compute.
    dpx, dpy, dsl = jnp.asarray(px), jnp.asarray(py), jnp.asarray(sl)

    def runner(cfg):
        if args.log_size > args.stream_above:
            return lambda: streaming.msm_streamed(dpx, dpy, dsl, cfg,
                                                  chunk_log=args.stream_above)
        return lambda: msm_device(dpx, dpy, dsl, cfg)

    def measure(cfg):
        """Median seconds, or None if the config fails to compile/run.
        NOTE: on the remote-tunneled TPU platform block_until_ready returns
        at enqueue time, so every timed iteration ends with a device->host
        fetch of the (tiny) result — the transfer cannot complete before
        the compute does. Compile is excluded from timing."""
        run = runner(cfg)
        try:
            res = run()
            np.asarray(res.x)
        except Exception as e:
            print(f"bench: config {cfg} failed ({type(e).__name__})",
                  file=sys.stderr)
            return None, None
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            res = run()
            np.asarray(res.x)
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2], res

    # Measure the selected config AND the conservative baseline, report the
    # best (the adaptive-dispatcher philosophy applied to the bench itself;
    # also insurance against a tuned config regressing on this hardware).
    candidates = [select_config(min(n, 1 << args.stream_above)),
                  MsmConfig(window_bits=16, scan_lanes=4096,
                            reduce_fanout=2048)]
    med = res = best_cfg = None
    for cfg in candidates:
        t, r = measure(cfg)
        if t is not None:
            print(f"bench: {n / t:.0f} pts/s with {cfg}", file=sys.stderr)
        if t is not None and (med is None or t < med):
            med, res, best_cfg = t, r, cfg
        if cfg == candidates[0] and med is not None and args.log_size < 18:
            break  # small sizes: one config is representative enough
    assert med is not None, "every bench config failed"
    pts_per_s = n / med

    if args.check:
        from tpu_msm.utils import interop, oracle

        [got] = interop.proj_limbs_to_affine_points(
            np.asarray(res.x), np.asarray(res.y), np.asarray(res.z)
        )
        want = oracle.msm(
            interop.limbs_to_ints(np.asarray(sl)),
            interop.limbs_to_affine_points(np.asarray(px), np.asarray(py)),
        )
        assert got == want, "MSM result mismatch vs oracle"
        print("check: OK", file=sys.stderr)

    baseline = _native_baseline(px, py, sl)
    out = {
        "metric": f"bn254_msm_log{args.log_size}_throughput",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
    }
    if baseline:
        out["vs_baseline"] = round(pts_per_s / baseline, 4)
        out["baseline_pts_per_s"] = round(baseline, 1)
        out["baseline_src"] = "native_cpu_engine_same_host"
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
