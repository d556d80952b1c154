#!/bin/bash
# Round-4b: post-refactor re-ranking. The batched-sides refactor + trace
# attribution (artifacts/trace_log20.log) showed segment_starts='ss_scan'
# costs ~157 ms of the 403 ms device program at 2^20 — re-rank the three
# exact strategies under the new structure, re-measure GLV with the fixed
# (mul_const) decomposition, then refresh the headline artifacts.
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

run autotune_r4c 12000 python - <<'EOF'
from tpu_msm.utils import autotune
base = {
    "window_bits": [16],
    "scan_lanes": [4096],
    "reduce_fanout": [2048],
    "signed_digits": [True],
    "field_impl": ["f15d"],
    "scan_step_batch": [4],
}
# 1. re-rank segment starts post-refactor
autotune.sweep([20], space={**base, "segment_starts": ["ss_sort", "bincount", "ss_scan"]})
# 2. GLV with the fixed decomposition, on the winner-agnostic ss_sort +
#    the incumbent ss_scan
autotune.sweep([20], space={**base, "segment_starts": ["ss_sort", "ss_scan"],
                            "glv": [True]})
EOF

run bench_log20_r4b 2400 python bench.py --log-size 20

run trace_log20_r4b 2400 python scripts/trace_log20.py
