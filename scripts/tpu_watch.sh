#!/bin/bash
# Poll the axon tunnel; whenever it answers, (re)run the queued bench session.
# Probes are timeout-bounded (a down tunnel blocks jax backend init ~10 min).
# The session script is resumable (probe-gated steps, STEP_DONE markers), so
# a flapping tunnel just pauses the queue: exit 42 means "tunnel lost,
# steps remain" and the watcher goes back to polling; exit 0 means the whole
# queue is done.
mkdir -p /tmp/tpu_logs
cd "$(dirname "$0")/.."
for i in $(seq 1 120); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel up at $(date)" | tee -a /tmp/tpu_logs/UP
    bash scripts/tpu_session.sh >>/tmp/tpu_logs/session.out 2>&1
    rc=$?
    if [ "$rc" -ne 42 ]; then
      echo "session done (rc=$rc) at $(date)" | tee /tmp/tpu_logs/DONE
      exit 0
    fi
    echo "tunnel lost mid-queue at $(date) — re-arming" >> /tmp/tpu_logs/watch.log
  else
    echo "probe $i: down at $(date)" >> /tmp/tpu_logs/watch.log
  fi
  sleep 240
done
echo "gave up at $(date)" | tee /tmp/tpu_logs/GAVE_UP
