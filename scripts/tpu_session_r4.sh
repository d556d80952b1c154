#!/bin/bash
# Round-4 measurement pass. Run AFTER the probe scripts (montmul ilp,
# scan/sort probes) have committed their artifacts. Per-step commits so a
# dead session keeps everything measured so far.
#
#   bash scripts/tpu_session_r4.sh [logdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts}
mkdir -p "$OUT"

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2 rc; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  echo "rc=$rc" >> "$OUT/$name.log"
  echo "    rc=$rc tail:"; tail -4 "$OUT/$name.log" | sed 's/^/    /'
  git add "$OUT"
  if python -m json.tool tpu_msm/utils/tuned_configs.json >/dev/null 2>&1; then
    git add tpu_msm/utils/tuned_configs.json 2>/dev/null
  fi
  local msg="TPU session artifact: $name"
  [ "$rc" -ne 0 ] && msg="$msg (rc=$rc)"
  git commit -q -m "$msg" 2>/dev/null || true
}

# 1. Autotune the new knobs at the headline size: step-batched dual scan and
#    GLV, on top of the r4 bases.
run autotune_r4b 9000 python - <<'EOF'
from tpu_msm.utils import autotune
autotune.sweep([20], space={
    "window_bits": [16],
    "scan_lanes": [4096],
    "reduce_fanout": [2048],
    "signed_digits": [True],
    "field_impl": ["f15d"],
    "segment_starts": ["ss_scan"],
    "scan_step_batch": [4, 8],
})
autotune.sweep([20], space={
    "window_bits": [16],
    "scan_lanes": [4096],
    "reduce_fanout": [2048],
    "signed_digits": [True],
    "field_impl": ["f15d"],
    "segment_starts": ["ss_scan"],
    "scan_step_batch": [4],
    "glv": [True],
})
EOF

# 2. Fresh headline bench with the tuned table (also measures the native
#    baseline denominator for vs_baseline).
run bench_log20_r4 2400 python bench.py --log-size 20

# 3. Small-size crossover (VERDICT #3): device vs native engine 2^12..2^17.
run crossover 9000 python scripts/crossover.py --log-sizes 12 13 14 15 16 17

# 3b. Side-stage attribution on a quiet host (the first run was contaminated
#     by CPU contention inflating dispatch RTT to 637 ms).
run probe_sides 4800 python scripts/probe_sides.py

# 4. Stage profile + roofline under the tuned config.
run stage_profile_r4 2400 python - <<'EOF'
import logging
logging.basicConfig(level=logging.INFO)
from tpu_msm.utils.config import enable_persistent_cache
enable_persistent_cache()
from tpu_msm.utils import profiling
import json
r = profiling.roofline(20)
print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                  for k, v in r.items()}))
EOF

# 5. jax.profiler trace at log 20 (VERDICT #7) — per-op attribution.
run trace_log20 2400 python scripts/trace_log20.py

# 6. Concurrency-stress HW artifact (VERDICT #4): 4 concurrent chunked
#    device MSMs with random delays, verified vs single-threaded.
run profiler_parallel 5400 python -m tpu_msm.cli.profiler 16 2 tpu 2 4

# 7. Size rows under the final tuned config.
run autotune_log16_r4 7200 python - <<'EOF'
from tpu_msm.utils import autotune
autotune.sweep([16], space={
    "window_bits": [16],
    "scan_lanes": [4096],
    "reduce_fanout": [2048],
    "signed_digits": [True],
    "field_impl": ["f15d"],
    "segment_starts": ["ss_scan"],
    "scan_step_batch": [4],
    "glv": [False, True],
})
EOF
run bench_log22_r4 3600 python bench.py --log-size 22
run bench_log24_r4 3600 python bench.py --log-size 24
