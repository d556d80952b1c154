#!/bin/bash
# Trimmed TPU measurement session. Worst-case timeout budget is ~3.5 h; the
# per-step commits mean a shorter window keeps whatever completed, and steps
# are ordered most-important-first (roofline numerator, stage profile,
# headline benches) so a cut-off loses the least valuable evidence.
#
#   bash scripts/tpu_session_short.sh [logdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts}
mkdir -p "$OUT"

# Concurrent jax processes racing on the persistent compile cache have
# produced SIGSEGV/SIGABRT in the cache (de)serializer (observed 2026-08-18).
# If a test suite is mid-run, let it finish first (bounded wait).
for _ in $(seq 180); do
  pgrep -f "python -m pytest" > /dev/null || break
  sleep 60
done

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2 rc; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  # The exit code lives IN the artifact: a timeout-killed run (rc=124) must
  # be distinguishable from a clean pass by reading the committed log alone.
  echo "rc=$rc" >> "$OUT/$name.log"
  echo "    rc=$rc tail:"; tail -4 "$OUT/$name.log" | sed 's/^/    /'
  git add "$OUT"
  # Only commit the tuned table if it parses — never commit a corrupt JSON
  # onto the per-MSM dispatch path.
  if python -m json.tool tpu_msm/utils/tuned_configs.json >/dev/null 2>&1; then
    git add tpu_msm/utils/tuned_configs.json 2>/dev/null
  fi
  local msg="TPU session artifact: $name"
  [ "$rc" -ne 0 ] && msg="$msg (rc=$rc)"
  git commit -q -m "$msg" 2>/dev/null || true
}

# 1. Mont-mul kernel throughput (the roofline numerator), both limb cores.
run montmul 900 python benches/montmul_benchmark.py --lanes 65536 --chain 32

# 2. Stage profile + roofline at log 20 (acceptance evidence).
run stage_profile 900 python - <<'EOF'
import logging
logging.basicConfig(level=logging.INFO)
from tpu_msm.utils import profiling
import json
r = profiling.roofline(20)
print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                  for k, v in r.items()}))
EOF

# 3. Headline benches at the BASELINE config sizes.
for LOG in 22 16 24; do
  run "bench_log${LOG}" 1500 python bench.py --log-size "$LOG"
done

# 4. Focused autotune at the headline size (writes tuned_configs.json
#    incrementally — a timeout keeps completed combos).
run autotune 1800 python - <<'EOF'
from tpu_msm.utils import autotune
autotune.sweep([20], space={
    "window_bits": [16],
    "scan_lanes": [4096, 8192],
    "reduce_fanout": [2048, 4096],
    "signed_digits": [True],
    "field_impl": ["u16", "f15"],
}, repeats=2)
print("sweep done")
EOF

# 5. Reference-parity workloads: gpu_profiler 20x5 + e2e check vs native CPU.
run profiler_20x5 900 python -m tpu_msm.cli.profiler 20 5 tpu 2
run check_log18 900 python -m tpu_msm.cli.profiler 18 1 check 1

# 6. Compiled Pallas kernels vs jnp ops, on hardware.
run kernel_check_tpu 900 python -m tpu_msm.cli.profiler --check-kernels

echo "=== done ==="
