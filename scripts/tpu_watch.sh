#!/bin/bash
# Poll the axon tunnel; the moment it answers, run the queued bench session.
# Probes are timeout-bounded (a down tunnel blocks jax backend init ~10 min).
mkdir -p /tmp/tpu_logs
cd "$(dirname "$0")/.."
for i in $(seq 1 120); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel up at $(date)" | tee /tmp/tpu_logs/UP
    bash scripts/tpu_session.sh >/tmp/tpu_logs/session.out 2>&1
    echo "session done at $(date)" | tee /tmp/tpu_logs/DONE
    exit 0
  fi
  echo "probe $i: down at $(date)" >> /tmp/tpu_logs/watch.log
  sleep 240
done
echo "gave up at $(date)" | tee /tmp/tpu_logs/GAVE_UP
