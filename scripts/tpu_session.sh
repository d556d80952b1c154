#!/bin/bash
# One-shot TPU measurement session: run everything that needs the real chip
# and leave committed artifacts behind. Run whenever the axon tunnel is up:
#
#   bash scripts/tpu_session.sh [logdir]
#
# Produces, under artifacts/ (committed):
#   kernel_check_tpu.log    compiled-Pallas-kernel correctness on hardware
#   stage_profile.log       per-stage timings + roofline at log 20
#   autotune sweep          -> tpu_msm/utils/tuned_configs.json
#   bench_log{20,22,24}.json  headline throughput runs
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
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "    rc=$? tail:"; tail -3 "$OUT/$name.log" | sed 's/^/    /'
}

# 1. Compiled (non-interpret) Pallas kernels vs jnp ops, on hardware.
run kernel_check_tpu 900 python -m tpu_msm.cli.profiler --check-kernels

# 1b. Kernel-level Montgomery-mul throughput (BASELINE acceptance metric),
#     both limb cores.
run montmul 1800 python benches/montmul_benchmark.py --lanes 65536 --chain 32

# 1c. e2e correctness of the production config (signed + f15 + padded
#     queries engage at n >= 2^17) vs the native CPU engine.
run check_log18 1800 python -m tpu_msm.cli.profiler 18 1 check 1

# 2. Stage profile + roofline at the canonical log-20 workload.
run stage_profile 1800 python - <<'EOF'
import logging
logging.basicConfig(level=logging.INFO)
from tpu_msm.utils import profiling
import json
r = profiling.roofline(20)
print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                  for k, v in r.items()}))
EOF

# 3. Measured autotune sweep (writes tpu_msm/utils/tuned_configs.json).
#    Focused space: the full DEFAULT_SPACE grid is 72 combos/size (~hours of
#    compiles on one chip); this covers the decisions that matter at the
#    headline size — limb core, signed digits, lanes, fanout — in ~12 combos.
run autotune 7200 python - <<'EOF'
from tpu_msm.utils import autotune
autotune.sweep([20], space={
    "window_bits": [16],
    "scan_lanes": [4096, 8192],
    "reduce_fanout": [2048, 4096],
    "signed_digits": [True],
    "field_impl": ["u16", "f15"],
}, repeats=3)
autotune.sweep([18], space={
    "window_bits": [8, 16],
    "scan_lanes": [4096],
    "reduce_fanout": [2048],
    "signed_digits": [True],
    "field_impl": ["f15"],
}, repeats=3)
# Segment-starts strategy (scatter-histogram vs binary search vs extra sort)
# at the headline size, on top of whatever the first sweep picked.
best = autotune.lookup(1 << 20) or {"window_bits": 16, "scan_lanes": 8192,
                                    "reduce_fanout": 4096,
                                    "signed_digits": True,
                                    "field_impl": "f15"}
autotune.sweep([20], space={
    **{k: [v] for k, v in best.items() if k != "segment_starts"},
    "segment_starts": ["bincount", "ss_scan", "ss_sort"],
}, repeats=3)
# Cross-window overlap (lax.map batch_size), again on top of the best.
best = autotune.lookup(1 << 20) or best
autotune.sweep([20], space={
    **{k: [v] for k, v in best.items() if k != "window_batch"},
    "window_batch": [1, 2, 4],
}, repeats=3)
print("sweep done")
EOF

# 4. Headline benches (after tuning).
for LOG in 16 20 22 24; do
  run "bench_log${LOG}" 3600 python bench.py --log-size "$LOG"
done

# 5. Reference-parity profiler workloads (BASELINE configs 4-5: the
#    `gpu_profiler 20 5` batched workload and the large sizes).
run profiler_20x5 3600 python -m tpu_msm.cli.profiler 20 5 tpu 2
run profiler_22_stream 3600 python -m tpu_msm.cli.profiler 22 1 stream 2

echo "=== done; review $OUT/, tuned_configs.json, then commit ==="

# Leave the measurements committed even if nobody is watching (the session
# may be fired by the tunnel watcher): artifacts + the tuned table only.
if [ "${TPU_SESSION_AUTOCOMMIT:-1}" = 1 ]; then
  git add "$OUT" tpu_msm/utils/tuned_configs.json 2>/dev/null
  git commit -q -m "TPU measurement session: kernel check, roofline, autotune sweep, benches (artifacts/)" \
    && echo "committed" || echo "nothing to commit"
fi
