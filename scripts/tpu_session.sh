#!/bin/bash
# Queued TPU measurements for the next tunnel window (run from repo root,
# normally fired by scripts/tpu_watch.sh). Logs land in docs/tpu_logs INSIDE
# the repo, so partial results survive a round boundary — the driver commits
# uncommitted files when turns run out.
#
# Resumable: each step is probe-gated (a dead tunnel stops the queue with
# exit 42 instead of burning every remaining step's timeout blocked on
# backend init) and skipped on re-fire once its log carries STEP_DONE, so
# the watcher can re-arm across flapping tunnel windows without repeating
# finished measurements.
# ORDER: quick benches that settle config defaults first; long quality arms
# last — if the window closes early, the decisions that gate commits are
# already on disk.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_logs docs/tpu_logs

probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

# run_step <name> <cmd...>: probe-gated, logged, resumable
run_step() {
  local name="$1"; shift
  local log="docs/tpu_logs/${name}.log"
  if [ -f "$log" ] && grep -q '^STEP_DONE$' "$log"; then
    echo "skip ${name}: already done"
    return 0
  fi
  if ! probe; then
    echo "tunnel down — stopping queue before ${name}" | tee /tmp/tpu_logs/ABORTED
    exit 42
  fi
  "$@" 2>&1 | tee "$log"
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -eq 0 ]; then
    echo "STEP_DONE" >> "$log"
  else
    # no STEP_DONE: a re-fired queue retries this step (partials kept)
    echo "STEP_RC=${rc}" >> "$log"
  fi
}


# --- 2026-08-20g (round 4, queue 4): shipped-defaults finals, one window.
# All round-4 flips are in: svgp_chol_backend auto->blocked,
# optimizer_state_dtype bfloat16, gat_ext_vmap auto (gated OFF for banded
# tables per the atlas attribution: vmap-on 1.7065 / vmap-off 1.5979 /
# unroll-off 1.7039 / both-off 1.6163), kmeans_refresh_unroll auto. These
# three runs are the round-4 record the driver's BENCH_r04 should echo at
# CH scale.
run_step bench_ch_final timeout 3600 python bench.py
run_step bench_mouse_final timeout 3600 env BENCH_MODE=mouse python bench.py
run_step bench_atlas_final timeout 7200 env BENCH_MODE=atlas python bench.py
