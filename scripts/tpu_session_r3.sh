#!/bin/bash
# Round-3 TPU measurement session (VERDICT r2 items 1-7). Steps are ordered
# most-important-first and each one commits its artifact, so a tunnel outage
# or window cut-off keeps everything completed so far. Worst-case budget sums
# to ~4 h; run under the watcher or directly when the tunnel is up:
#
#   bash scripts/tpu_session_r3.sh [logdir]
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

# 1. Stage profile + roofline at log 20 (acceptance evidence). 1800 s: the
#    900 s budget of the r2 session died inside the three cold compiles.
run stage_profile 1800 python - <<'EOF'
import logging
logging.basicConfig(level=logging.INFO)
from tpu_msm.utils import profiling
import json, pathlib
# Kernel rates measured by the (already-run) montmul step: last JSON line.
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

# 2. Headline benches at the BASELINE config sizes (22 first: config-4 proxy
#    and the scaling-model denominator; then 16; then streamed 24).
run bench_log22 1800 python bench.py --log-size 22
run bench_log16 900 python bench.py --log-size 16
run bench_log24 2400 python bench.py --log-size 24

# 3. Focused autotune at the headline sizes (writes tuned_configs.json
#    incrementally — a timeout keeps completed combos). Sweeps the
#    still-unmeasured knobs (segment_starts, window_batch) on top of the
#    r2 base grid.
run autotune 2700 python - <<'EOF'
from tpu_msm.utils import autotune
autotune.sweep([20], space={
    "window_bits": [16],
    "scan_lanes": [4096, 8192],
    "reduce_fanout": [2048, 4096],
    "signed_digits": [True],
    "field_impl": ["u16", "f15"],
}, repeats=2)
autotune.sweep([20], space={
    "window_bits": [16],
    "scan_lanes": [8192],
    "reduce_fanout": [4096],
    "signed_digits": [True],
    "field_impl": ["f15"],
    "segment_starts": ["bincount", "ss_scan", "ss_sort"],
}, repeats=2)
autotune.sweep([20], space={
    "window_bits": [16],
    "scan_lanes": [8192],
    "reduce_fanout": [4096],
    "signed_digits": [True],
    "field_impl": ["f15"],
    "window_batch": [1, 2, 4],
}, repeats=2)
autotune.sweep([18], space={
    "window_bits": [16],
    "scan_lanes": [4096, 8192],
    "reduce_fanout": [2048, 4096],
    "signed_digits": [True],
    "field_impl": ["u16", "f15"],
}, repeats=2)
print("sweep done")
EOF

# 4. Reference-parity workloads: gpu_profiler 20x5 + e2e check vs native CPU
#    + the sharded mode on the real-device mesh (VERDICT r2 item 6).
run profiler_20x5 1200 python -m tpu_msm.cli.profiler 20 5 tpu 2
run check_log18 1200 python -m tpu_msm.cli.profiler 18 1 check 1
run profiler_sharded 1200 python -m tpu_msm.cli.profiler 18 1 sharded 1

echo "=== done ==="
