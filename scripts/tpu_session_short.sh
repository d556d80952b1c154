#!/bin/bash
# Trimmed TPU measurement session, sized for a ~45-minute window on one chip.
# Same artifacts as scripts/tpu_session.sh, tighter budgets, commit after each
# step so partial progress survives the session ending.
#
#   bash scripts/tpu_session_short.sh [logdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts}
mkdir -p "$OUT"

run() {  # run <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "    rc=$? tail:"; tail -3 "$OUT/$name.log" | sed 's/^/    /'
  git add "$OUT" tpu_msm/utils/tuned_configs.json 2>/dev/null
  git commit -q -m "TPU session artifact: $name" 2>/dev/null || true
}

# 1. Compiled Pallas kernels vs jnp ops, on hardware (round-evidence item).
run kernel_check_tpu 600 python -m tpu_msm.cli.profiler --check-kernels

# 2. Focused autotune at the headline size (writes tuned_configs.json).
run autotune 900 python - <<'EOF'
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

# 3. Stage profile + roofline at log 20 (acceptance evidence).
run stage_profile 900 python - <<'EOF'
import logging
logging.basicConfig(level=logging.INFO)
from tpu_msm.utils import profiling
import json
r = profiling.roofline(20)
print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                  for k, v in r.items()}))
EOF

# 4. Mont-mul kernel throughput (roofline numerator), both limb cores.
run montmul 600 python benches/montmul_benchmark.py --lanes 65536 --chain 32

# 5. Headline benches at the BASELINE config sizes.
for LOG in 16 22 24; do
  run "bench_log${LOG}" 1500 python bench.py --log-size "$LOG"
done

# 6. Reference-parity workloads: gpu_profiler 20x5 + e2e check vs native CPU.
run profiler_20x5 900 python -m tpu_msm.cli.profiler 20 5 tpu 2
run check_log18 900 python -m tpu_msm.cli.profiler 18 1 check 1

echo "=== done ==="
