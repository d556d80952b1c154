"""Limb-conversion micro-benchmark — parity with benches/to_u32_limbs_benchmark.rs.

The reference benchmarks converting 2^20 scalars (8 limbs) and points
(24 limbs) to u32 limbs with rayon (to_u32_limbs_benchmark.rs:7-8,27-128).
Here the equivalents are the vectorized numpy bridges in
tpu_msm.utils.interop: bytes <-> u16-limb arrays and the arkworks/halo2curves
wire-format converters.

Usage: python benches/conversion_benchmark.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def bench(name, fn, n, iters=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:7.1f} ms ({n/dt/1e6:7.1f} Melem/s)")


def main():
    from tpu_msm.utils import interop

    n = 1 << 20
    rng = np.random.RandomState(0)
    raw = rng.bytes(32 * n)
    limbs = np.frombuffer(raw, dtype="<u2").reshape(n, 16).T.astype(np.uint32)
    limbs = np.ascontiguousarray(limbs)

    bench("h2c bytes -> limbs (2^20)",
          lambda: interop.from_h2c_bytes(np.frombuffer(raw, np.uint8).reshape(n, 32)), n)
    bench("limbs -> h2c bytes (2^20)", lambda: interop.to_h2c_bytes(limbs), n)
    bench("limbs -> ark u32 (2^20)", lambda: interop.to_ark_u32_limbs(limbs), n)
    ark = interop.to_ark_u32_limbs(limbs)
    bench("ark u32 -> limbs (2^20)", lambda: interop.from_ark_u32_limbs(ark), n)


if __name__ == "__main__":
    main()
