#!/bin/bash
# Full-tier (slow + device) test run against the real TPU, in budget-sized
# chunks with a per-chunk log + commit — no rc=124 truncation can eat the
# whole run (VERDICT r3 #1/#2: the bar is a fully green suite log).
#
#   bash scripts/full_tier_tpu.sh [logdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/pytest_full_r4}
mkdir -p "$OUT"

chunk() {  # chunk <name> <timeout-s> <pytest-args...>
  local name=$1 tmo=$2 rc; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  TPU_MSM_RUN_SLOW=1 TPU_MSM_RUN_DEVICE=1 \
    timeout "$tmo" python -m pytest "$@" -q --no-header \
    > "$OUT/$name.log" 2>&1
  rc=$?
  echo "rc=$rc" >> "$OUT/$name.log"
  echo "    rc=$rc: $(tail -2 "$OUT/$name.log" | head -1)"
  git add "$OUT"
  git commit -q -m "full-tier TPU chunk: $name (rc=$rc)" 2>/dev/null || true
}

# Chunks ordered fastest-first; each file gets its own budget so one slow
# compile cannot starve the rest. Device-tier graphs are served by the
# persistent cache after their first compile.
chunk u256_field   3600 tests/test_u256.py tests/test_field.py
chunk curve        5400 tests/test_curve.py
chunk f15          5400 tests/test_f15.py
chunk glv          5400 tests/test_glv.py
chunk golden       7200 tests/test_golden_vectors.py
chunk dispatch     7200 tests/test_dispatch.py
chunk concurrency  5400 tests/test_concurrency.py
chunk pippenger    10800 tests/test_pippenger.py
chunk properties   7200 tests/test_properties.py
chunk pallas       10800 tests/test_pallas_kernels.py
chunk sharded      10800 tests/test_sharded.py
chunk native_embed 3600 tests/test_native.py tests/test_embed.py tests/test_export.py
chunk distributed  3600 tests/test_distributed.py
chunk rows_eager   1800 tests/test_kernel_rows_eager.py

echo "=== summary ==="
grep -H -E "passed|failed|error" "$OUT"/*.log | grep -v "^Binary" | sed 's/^/  /'
