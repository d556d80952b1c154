#!/bin/bash
# Round-5b TPU session: validate + measure the two wired levers (row-input
# MXU histogram 'hist2', flat-index loc48 gather). Serialized; the final
# bench re-run happens after the CPU-side sharded chunk finishes so its
# timing is uncontended (one-core host: concurrency inflates tunnel RTT).
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2 rc; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "artifacts/$name.log" 2>&1
  rc=$?
  echo "rc=$rc" >> "artifacts/$name.log"
  echo "    rc=$rc: $(tail -2 "artifacts/$name.log" | head -1)"
  git add artifacts tpu_msm/utils/tuned_configs.json 2>/dev/null
  git commit -q -m "r5b TPU session: $name (rc=$rc)" 2>/dev/null || true
}

# Warm the exact graphs bench.py default runs (tuned log20 + u16 baseline),
# then the differential gate, then the trace for the PERF_NOTES attribution.
step bench_log20_r5b   3600 python bench.py --log-size 20
step check_e2e_20b     3600 python -m tpu_msm.cli.profiler 20 1 check
step trace_log20_r5b   3600 python scripts/trace_log20.py
echo "=== session done ==="
