#!/bin/bash
# Round-5 TPU measurement session, strictly serialized (one CPU core: any
# concurrent job inflates tunnel RTT ~20x — docs/PERF_NOTES.md r4).
# Ordering: cheapest/highest-value first so budget cuts lose the least.
#
#   bash scripts/tpu_session_r5.sh
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
  git commit -q -m "r5 TPU session: $name (rc=$rc)" 2>/dev/null || true
}

step probe_r5          3600 python scripts/probe_r5.py --log-size 20
step kernel_check_r5   3600 python -m tpu_msm.cli.profiler --check-kernels
step tune_r5_20        7200 python scripts/tune_r5.py 20
step tune_r5_20b       7200 python scripts/tune_r5.py 20b
step bench_log20_r5    3600 python bench.py --log-size 20
# e2e differential gate for whatever config the sweep just promoted:
# device result must equal the native C++ engine's (profiler 'check' mode).
step check_e2e_20      3600 python -m tpu_msm.cli.profiler 20 1 check
step trace_log20_r5    3600 python scripts/trace_log20.py
step tune_r5_mid       5400 python scripts/tune_r5.py mid
step tune_r5_band     10800 python scripts/tune_r5.py band
step check_e2e_18      3600 python -m tpu_msm.cli.profiler 18 1 check
step tune_r5_22        7200 python scripts/tune_r5.py 22
step bench_log22_r5    3600 python bench.py --log-size 22
step bench_log24_r5    5400 python bench.py --log-size 24
step bench_log16_r5    3600 python bench.py --log-size 16
# CPU_THRESHOLD re-derivation under the r5 tuned table (VERDICT next #5).
step crossover_r5      5400 python scripts/crossover.py
# Loopback-DCN collective latency (VERDICT next #6) — CPU-only, needs the
# quiet host this serialized session guarantees.
step collective_dcn    3600 python scripts/collective_dcn.py

echo "=== session done ==="
