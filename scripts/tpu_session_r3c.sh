#!/bin/bash
# Round-3 final measurement pass: the knobs the r3b sweep didn't reach
# (segment_starts, window_batch), table rows at the other BASELINE sizes,
# and refreshed stage-profile/headline artifacts under the tuned config.
# Run AFTER tpu_session_r3b.sh. Per-step commits as before.
# Step order: cached-graph steps (headline bench, stage profile) FIRST so the
# high-value refreshed artifacts exist even if the window dies mid-sweep.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts}
mkdir -p "$OUT"

# (No pytest wait: CPU-tier pytest uses the per-host jax-<cpu> cache dir,
# the TPU steps use .cache/jax-tpu — distinct files, no (de)serializer race.)

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

# 4. Fresh headline with the tuned table in place.
run bench_log20 1800 python bench.py --log-size 20

# 3. Refreshed acceptance artifacts under the tuned config.
run stage_profile 1800 python - <<'EOF'
import logging
logging.basicConfig(level=logging.INFO)
from tpu_msm.utils import profiling
from tpu_msm.utils.config import enable_persistent_cache
enable_persistent_cache()
import json, pathlib
kernel_rates = None
try:
    for line in pathlib.Path("artifacts/montmul.log").read_text().splitlines():
        if line.startswith("{"):
            d = json.loads(line)
            kernel_rates = {k: v["mont_mul_per_s"] for k, v in d.items()}
except Exception as e:
    print(f"no kernel rates available ({e}); model-only ratios")
r = profiling.roofline(20, kernel_rates=kernel_rates)
print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                  for k, v in r.items()}))
EOF

# 1. The unmeasured knobs, on top of the measured best (4096/2048/f15).
run autotune_knobs 3600 python - <<'EOF'
from tpu_msm.utils import autotune
base = {
    "window_bits": [16],
    "scan_lanes": [4096],
    "reduce_fanout": [2048],
    "signed_digits": [True],
    "field_impl": ["f15"],
}
autotune.sweep([20], space={**base, "window_batch": [2, 4]}, repeats=2)
autotune.sweep([20], space={**base,
                            "segment_starts": ["ss_scan", "ss_sort"]},
               repeats=2)
print("sweep done")
EOF

# 2. Table rows at the other BASELINE sizes (lookup() serves +/-1 log size,
#    so 22 covers 21-23 and 16 covers 15-17; 18 fills the middle).
run autotune_sizes 5400 python - <<'EOF'
from tpu_msm.utils import autotune
best = {
    "window_bits": [16],
    "scan_lanes": [4096],
    "reduce_fanout": [2048],
    "signed_digits": [True],
    "field_impl": ["f15"],
}
autotune.sweep([22, 18], space=best, repeats=2)
# log 16: is the c=8 heuristic actually right? Measure both.
autotune.sweep([16], space={**best, "window_bits": [16, 8],
                            "signed_digits": [True, False]}, repeats=2)
print("sweep done")
EOF

echo "=== done ==="
