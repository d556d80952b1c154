#!/bin/bash
# Second rerun of the sharded chunk. The first rerun (04:44) failed in 1.84s
# with "Unable to initialize backend 'axon'": the axon tunnel was down at
# that moment, and with TPU_MSM_RUN_DEVICE=1 conftest leaves the default
# platform list (env JAX_PLATFORMS=axon) in place, so jax.devices("cpu")'s
# backend-registry init failed loudly before any test ran — an infra race,
# not a product failure (the same tests then needed only the 8 virtual CPU
# devices). Retry policy: run against the default platform first (covers the
# TPU-attached-host resolve_backend regressions fixed earlier this round);
# if the run dies on axon init, fall back to TPU_MSM_TEST_PLATFORM=cpu,
# which the sharded tests fully support (mesh over jax.devices("cpu")).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/pytest_full_r5}
mkdir -p "$OUT"

run() {
  TPU_MSM_RUN_SLOW=1 TPU_MSM_RUN_DEVICE=1 "$@" \
    timeout 7200 python -m pytest tests/test_sharded.py -q --no-header \
    > "$OUT/sharded.log" 2>&1
  echo "rc=$?" >> "$OUT/sharded.log"
}

echo "=== sharded ($(date +%H:%M:%S)) ==="
run env
if grep -q "Unable to initialize backend 'axon'" "$OUT/sharded.log"; then
  echo "    axon tunnel down — falling back to TPU_MSM_TEST_PLATFORM=cpu"
  run env TPU_MSM_TEST_PLATFORM=cpu
fi
echo "    $(tail -2 "$OUT/sharded.log" | tr '\n' ' ')"
git add "$OUT"
git commit -q -m "full-tier TPU chunk rerun: sharded ($(tail -1 "$OUT/sharded.log"))" || true
echo "=== done ==="
