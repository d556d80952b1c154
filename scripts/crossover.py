"""Measure the device-vs-native-engine crossover at 2^12..2^17.

VERDICT r3 #3: CPU_THRESHOLD = 2^13 was asserted, not measured (the
reference measured its 2^17 GPU threshold, src/metal/msm.rs:440-444). This
script times both engines on identical inputs at each size and prints the
measured crossover; the committed log is the basis for the production
threshold in tpu_msm/__init__.py.

Device timing matches bench.py conventions: inputs resident in HBM
(excluded, like compile), median of repeated runs, a tiny device->host fetch
closes each iteration (the tunneled platform's block_until_ready returns at
enqueue). The native engine is timed on the same host arrays.

    python scripts/crossover.py --log-sizes 12 13 14 15 16 17
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-sizes", type=int, nargs="+",
                    default=[12, 13, 14, 15, 16, 17])
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from tpu_msm.utils.config import enable_persistent_cache, select_config

    enable_persistent_cache()

    import jax.numpy as jnp

    from bench import _random_inputs
    from tpu_msm import msm_device
    from tpu_msm.bindings import native

    assert native.available(), "native engine required for the comparison"

    rows = []
    for lg in args.log_sizes:
        n = 1 << lg
        px, py, sl = _random_inputs(n)
        cfg = select_config(n)

        t0 = time.perf_counter()
        native.msm(px, py, sl)
        t_cpu0 = time.perf_counter() - t0
        times = []
        for _ in range(max(1, args.iters // 2)):
            t0 = time.perf_counter()
            native.msm(px, py, sl)
            times.append(time.perf_counter() - t0)
        t_cpu = sorted(times + [t_cpu0])[len(times) // 2]

        dpx, dpy, dsl = jnp.asarray(px), jnp.asarray(py), jnp.asarray(sl)
        res = msm_device(dpx, dpy, dsl, cfg)  # compile (excluded)
        np.asarray(res.x)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            res = msm_device(dpx, dpy, dsl, cfg)
            np.asarray(res.x)
            times.append(time.perf_counter() - t0)
        t_dev = sorted(times)[len(times) // 2]

        rows.append({"log_size": lg, "native_s": round(t_cpu, 6),
                     "device_s": round(t_dev, 6),
                     "native_pts_per_s": round(n / t_cpu, 1),
                     "device_pts_per_s": round(n / t_dev, 1),
                     "winner": "device" if t_dev < t_cpu else "native",
                     "cfg": str(cfg)})
        print(f"2^{lg}: native {t_cpu*1e3:8.1f} ms ({n/t_cpu/1e3:7.1f} kpts/s)"
              f"  device {t_dev*1e3:8.1f} ms ({n/t_dev/1e3:7.1f} kpts/s)"
              f"  -> {rows[-1]['winner']}", flush=True)

    # Crossover = smallest size where the device wins and keeps winning.
    crossover = None
    for row in rows:
        if row["winner"] == "device":
            if crossover is None:
                crossover = row["log_size"]
        else:
            crossover = None
    print(json.dumps({"rows": rows, "device_wins_from_log": crossover}))


if __name__ == "__main__":
    main()
