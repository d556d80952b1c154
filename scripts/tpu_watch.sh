#!/bin/bash
# Poll the axon TPU tunnel; when it comes up, run the one-shot measurement
# session (scripts/tpu_session.sh). Writes status to /tmp/tpu_status.
# Usage: bash scripts/tpu_watch.sh [max_wait_seconds]
set -u
cd "$(dirname "$0")/.."
MAX=${1:-36000}
START=$(date +%s)
while :; do
  NOW=$(date +%s)
  if (( NOW - START > MAX )); then
    echo "gave-up $(date -u +%FT%TZ)" > /tmp/tpu_status
    exit 2
  fi
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" \
      > /tmp/tpu_probe.log 2>&1; then
    echo "up $(date -u +%FT%TZ)" > /tmp/tpu_status
    break
  fi
  echo "down $(date -u +%FT%TZ)" > /tmp/tpu_status
  sleep 120
done
echo "=== tunnel up; starting tpu_session ==="
bash scripts/tpu_session.sh artifacts
echo "session-done $(date -u +%FT%TZ)" > /tmp/tpu_status
