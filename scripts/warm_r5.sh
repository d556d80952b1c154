#!/bin/bash
# Compile-cache warm pass for the r5 TPU session: runs the probe + every
# tune_r5 combo so their server-side compiles (12-15 min per fresh pipeline
# graph) land in the persistent cache, then DISCARDS the (contention-
# contaminated) timings and table rows. The clean session afterwards
# re-measures everything against warm caches in seconds per combo.
# Safe to run while CPU-bound test chunks run: local work is tracing only;
# the chunks use a different cache dir (per-host CPU cache).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/warm_r5

run() { echo "=== warm $1 ($(date +%H:%M:%S))"; timeout "$2" "${@:3}" \
  > "/tmp/warm_r5/$1.log" 2>&1; echo "    rc=$?"; }

run probe    5400 python scripts/probe_r5.py --log-size 20
run kernels  3600 python -m tpu_msm.cli.profiler --check-kernels
run tune20  12000 python scripts/tune_r5.py 20
run tune20b 12000 python scripts/tune_r5.py 20b
run mid      9000 python scripts/tune_r5.py mid
run band    16200 python scripts/tune_r5.py band
run tune22  12000 python scripts/tune_r5.py 22
# discard contaminated measurements; compiles stay cached
git checkout -- tpu_msm/utils/tuned_configs.json
echo "=== warm pass done ($(date +%H:%M:%S)) ==="
