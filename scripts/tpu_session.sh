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


# --- 2026-08-20h (round 4, queue 5): slim-cond blocked2 A/B.
# 'blocked2' assembles X = L^-1 OUTSIDE the guard cond (cond carries
# (Lp, dinv) instead of (L, X)) — bit-identical outputs (tests), targets
# the ~10 ms/ep of (10,321,321) layout copies at CH
# (profile_ch_blocked.log). Decision rule: fold into 'blocked' (make it
# THE blocked form) iff CH and mouse beat the finals (0.1072 / 0.1887)
# outside +/-1% in this window; else record the dead end.
run_step bench_ch_blocked2slim timeout 3600 \
  env BENCH_CFG='{"svgp_chol_backend": "blocked2"}' python bench.py
run_step bench_mouse_blocked2slim timeout 3600 \
  env BENCH_MODE=mouse BENCH_CFG='{"svgp_chol_backend": "blocked2"}' python bench.py
# window-drift anchors (cache-hit re-runs of the shipped defaults)
run_step bench_ch_final2 timeout 3600 python bench.py
run_step bench_mouse_final2 timeout 3600 env BENCH_MODE=mouse python bench.py
