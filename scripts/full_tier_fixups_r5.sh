#!/bin/bash
# Re-run of the two r5 chunks that failed on first pass, after their fixes:
#  * distributed — first run raced the mid-edit sharded.py restructure (the
#    subprocess imported a half-finished intermediate; the committed code
#    traces clean);
#  * sharded — two tests exposed resolve_backend ignoring the CPU mesh /
#    default_device context on a TPU-attached host (fixed in
#    utils/config.resolve_backend + make_sharded_msm mesh-platform
#    resolution).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/pytest_full_r5}
mkdir -p "$OUT"

chunk() {
  local name=$1 tmo=$2 rc; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  TPU_MSM_RUN_SLOW=1 TPU_MSM_RUN_DEVICE=1 \
    timeout "$tmo" python -m pytest "$@" -q --no-header \
    > "$OUT/$name.log" 2>&1
  rc=$?
  echo "rc=$rc" >> "$OUT/$name.log"
  echo "    rc=$rc: $(tail -2 "$OUT/$name.log" | head -1)"
  git add "$OUT"
  git commit -q -m "full-tier TPU chunk rerun: $name (rc=$rc)" 2>/dev/null || true
}

chunk sharded      9000 tests/test_sharded.py
chunk distributed  5400 tests/test_distributed.py
echo "=== fixups done ==="
