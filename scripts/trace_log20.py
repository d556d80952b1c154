"""Capture a jax.profiler trace of the tuned log-20 MSM + a measured
per-stage attribution table (VERDICT r3 #7).

Two outputs:
* artifacts/trace_log20/ — the raw xplane trace of one warm msm_device run
  (the reference's analogue is the `profiling-release` GPU-capture feature,
  build.rs:39-41).
* stdout — a stage table with the dispatch round-trip latency measured and
  subtracted (the tunnel adds ~RTT ms to every small timed program;
  artifacts/probe_rtt.log established the floor).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    from tpu_msm.utils.config import enable_persistent_cache, select_config

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from bench import _random_inputs
    from tpu_msm import msm_device
    from tpu_msm.ops import pallas_curve as pc
    from tpu_msm.ops import pippenger

    n = 1 << 20
    cfg = select_config(n)
    print(f"cfg: {cfg}", flush=True)
    px, py, sl = _random_inputs(n)
    dpx, dpy, dsl = jnp.asarray(px), jnp.asarray(py), jnp.asarray(sl)

    def med(fn, iters=5):
        fn()  # warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            np.asarray(fn())[...]
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    # Dispatch round-trip floor (subtract from the small stage programs).
    one = jnp.ones((8, 128), jnp.uint32)
    triv = jax.jit(lambda a: a + 1)
    rtt = med(lambda: triv(one)[0, 0:1])
    print(f"dispatch RTT floor: {rtt*1e3:.2f} ms", flush=True)

    rows = {}
    # Full end-to-end.
    t = med(lambda: msm_device(dpx, dpy, dsl, cfg).x[0, 0:1])
    rows["end_to_end"] = t
    w = cfg.num_windows()
    print(f"end_to_end: {t*1e3:.1f} ms ({n/t/1e6:.2f} Mpts/s, {w} windows)",
          flush=True)

    # One window's 17-operand payload sort at the production size.
    rng = np.random.RandomState(5)
    npts = 2 * n if cfg.glv else n
    digits = jnp.asarray(rng.randint(0, 1 << 15, npts).astype(np.uint32))
    prows = [jnp.asarray(rng.randint(0, 1 << 31, npts, dtype=np.int64)
                         .astype(np.uint32)) for _ in range(16)]
    f_sort = jax.jit(lambda d, *rs: jax.lax.sort([d, *rs], num_keys=1))
    t = med(lambda: f_sort(digits, *prows)[0][0:1])
    rows["sort_1window"] = t - rtt
    print(f"sort_1window (n={npts}): {t*1e3:.1f} ms raw, "
          f"{(t-rtt)*1e3:.1f} ms net -> x{w} = {(t-rtt)*w*1e3:.0f} ms",
          flush=True)

    # One window's scan kernel at the tuned shape.
    lanes = cfg.scan_lanes
    r = lanes // pc.LANE
    steps = npts // lanes
    gx = jnp.asarray(rng.randint(0, 1 << 31, (8, steps, r, pc.LANE),
                                 dtype=np.int64).astype(np.uint32))
    import functools
    scan = {"f15": pc.scan_madd_packed_u16_f15,
            "f15d": functools.partial(pc.scan_madd_packed_u16_f15d,
                                      step_batch=cfg.scan_step_batch),
            "u16": pc.scan_madd_packed_u16}[cfg.field_impl]
    t = med(lambda: scan(gx, gx)[0, 0, 0, 0:1])
    rows["scan_1window"] = t - rtt
    print(f"scan_1window ({steps} steps x {lanes} lanes, "
          f"step_batch={cfg.scan_step_batch}): {t*1e3:.1f} ms raw, "
          f"{(t-rtt)*1e3:.1f} ms net -> x{w} = {(t-rtt)*w*1e3:.0f} ms",
          flush=True)

    resid = rows["end_to_end"] - w * (rows["sort_1window"]
                                      + rows["scan_1window"])
    rows["residual_sides"] = resid
    print(f"residual (lane scan + queries + reduce + Horner + digits): "
          f"{resid*1e3:.0f} ms", flush=True)

    # Raw profiler trace of one warm run.
    out_dir = Path("artifacts/trace_log20")
    out_dir.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(out_dir)):
        np.asarray(msm_device(dpx, dpy, dsl, cfg).x)
    files = sorted(p.relative_to(out_dir).as_posix()
                   for p in out_dir.rglob("*") if p.is_file())
    print(f"trace files: {files[:8]}{'...' if len(files) > 8 else ''}",
          flush=True)
    print(json.dumps({k: round(v, 6) for k, v in rows.items()}))


if __name__ == "__main__":
    main()
