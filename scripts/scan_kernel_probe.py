"""Time the fused scan kernel ALONE at production shape (incl. HBM io).

The montmul microbench (benches/montmul_benchmark.py) is VMEM-resident; the
real scan kernel also streams 2x8 packed input rows in and 48 output rows
out per grid step and pays per-step grid overhead. This probe times
scan_madd_packed_u16{,_f15,_f15d} on one window's worth of production-shaped
data to attribute the e2e gap: kernel-compute vs grid/DMA vs the rest of the
pipeline (sort, gathers, reductions).

    python scripts/scan_kernel_probe.py --lanes 4096 --steps 256
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
    ap.add_argument("--lanes", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--impls", nargs="+", default=["f15", "f15d"])
    ap.add_argument("--step-batch", type=int, default=1,
                    help="scan steps per grid step (f15d only)")
    args = ap.parse_args()

    from tpu_msm.utils.config import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp

    from tpu_msm.ops import pallas_curve as pc

    r = args.lanes // pc.LANE
    rng = np.random.RandomState(42)
    # Random u16-packed payload is fine for timing: the kernel's control flow
    # is branchless/data-independent (complete formulas, selects only).
    gx = jnp.asarray(rng.randint(0, 1 << 31, (8, args.steps, r, pc.LANE),
                                 dtype=np.int64).astype(np.uint32))
    gy = jnp.asarray(rng.randint(0, 1 << 31, (8, args.steps, r, pc.LANE),
                                 dtype=np.int64).astype(np.uint32))

    import functools
    kernels = {"u16": pc.scan_madd_packed_u16,
               "f15": pc.scan_madd_packed_u16_f15,
               "f15d": functools.partial(pc.scan_madd_packed_u16_f15d,
                                         step_batch=args.step_batch)}
    out = {}
    muls = args.lanes * args.steps * 11  # RCB madd = 11 mont-muls
    for impl in args.impls:
        fn = kernels[impl]
        res = fn(gx, gy)
        np.asarray(res[0, 0, 0, 0])  # sync (tunnel: fetch closes the timing)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            res = fn(gx, gy)
            np.asarray(res[0, 0, 0, 0])
            ts.append(time.perf_counter() - t0)
        sec = sorted(ts)[len(ts) // 2]
        out[impl] = {"seconds": round(sec, 6),
                     "mont_mul_per_s": round(muls / sec, 1),
                     "per_step_us": round(sec / args.steps * 1e6, 2)}
        print(f"{impl}: {sec*1e3:.2f} ms for {args.steps} steps x "
              f"{args.lanes} lanes = {muls/sec/1e6:.1f} M mul/s "
              f"({out[impl]['per_step_us']} us/step)", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
