"""Time the production 17-operand payload sort alone at 2^n.

The pipeline sorts (digits, 8 packed x-rows, 8 packed y-rows) once per
window (pippenger._msm_window). This probe isolates that stage at
production size to attribute the e2e budget left after the scan-kernel
speedups.

    python scripts/sort_probe.py --log-size 20
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
    ap.add_argument("--log-size", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from tpu_msm.utils.config import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    n = 1 << args.log_size
    rng = np.random.RandomState(7)
    digits = jnp.asarray(rng.randint(0, 1 << 15, n).astype(np.uint32))
    rows = [jnp.asarray(rng.randint(0, 1 << 31, n, dtype=np.int64)
                        .astype(np.uint32)) for _ in range(16)]

    @jax.jit
    def payload_sort(d, *rs):
        return jax.lax.sort([d, *rs], num_keys=1)

    out = payload_sort(digits, *rows)
    np.asarray(out[0][0:1])
    ts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = payload_sort(digits, *rows)
        np.asarray(out[0][0:1])
        ts.append(time.perf_counter() - t0)
    sec = sorted(ts)[len(ts) // 2]
    print(f"17-operand payload sort at 2^{args.log_size}: {sec*1e3:.2f} ms "
          f"(x16 windows = {16*sec*1e3:.0f} ms)", flush=True)
    print(json.dumps({"sort_1window_s": round(sec, 6),
                      "all_windows_s": round(16 * sec, 6)}))


if __name__ == "__main__":
    main()
