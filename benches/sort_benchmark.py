"""Digit-sort micro-benchmark — parity with benches/sort_buckets_indices_benchmark.rs.

The reference sorts 2^{16,18,20,22} x 17 (u32, u32) pairs with rayon on the
CPU (sort_buckets_indices_benchmark.rs:9-17). The TPU build sorts on device:
one digit key carrying the 32 coordinate rows as payload, batched over all
windows. Reports elements/s like criterion's Throughput::Elements.

Usage: python benches/sort_benchmark.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    for log_n in (16, 18, 20, 22):
        n = 1 << log_n
        digits = jnp.asarray(rng.randint(0, 1 << 16, size=(n,), dtype=np.int64)
                             .astype(np.uint32))
        payload = jnp.asarray(rng.randint(0, 1 << 16, size=(32, n), dtype=np.int64)
                              .astype(np.uint32))

        @jax.jit
        def do_sort(d, p):
            return jax.lax.sort([d] + [p[i] for i in range(32)], num_keys=1)[0]

        np.asarray(do_sort(digits, payload)[0:1])
        t0 = time.perf_counter()
        out = do_sort(digits, payload)
        np.asarray(out[0:1])
        dt = time.perf_counter() - t0
        print(f"sort 2^{log_n} x (1 key + 32 payload rows): {dt*1e3:7.1f} ms "
              f"({n/dt/1e6:7.1f} Melem/s)")


if __name__ == "__main__":
    main()
