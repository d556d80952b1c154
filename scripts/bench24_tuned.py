"""Streamed log-24 measurement under the tuned config (BASELINE config 5's
single-chip half). Same measurement discipline as bench.py (inputs resident
in HBM once, excluded from timing; every timed iteration ends with a
device->host fetch; median of repeats) but measures ONLY the tuned config —
the conservative insurance candidate would cost a second ~20-min streamed-
graph compile for a number nobody dispatches."""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

sys.argv = [sys.argv[0]]
from bench import _random_inputs

from tpu_msm.utils.config import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp

from tpu_msm.ops import streaming
from tpu_msm.utils.config import select_config

n = 1 << 24
px, py, sl = _random_inputs(n)
dpx, dpy, dsl = jnp.asarray(px), jnp.asarray(py), jnp.asarray(sl)
cfg = select_config(1 << 22)  # chunk-sized config (chunks stream at 2^22)
print(f"config: {cfg}", flush=True)

run = lambda: streaming.msm_streamed(dpx, dpy, dsl, cfg, chunk_log=22)
res = run()
np.asarray(res.x)  # compile + warm
times = []
for _ in range(3):
    t0 = time.perf_counter()
    res = run()
    np.asarray(res.x)
    times.append(time.perf_counter() - t0)
med = sorted(times)[1]
print(json.dumps({"metric": "bn254_msm_log24_throughput_streamed",
                  "value": round(n / med, 1), "unit": "points/s",
                  "seconds": round(med, 4)}))
