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
# ORDER: headline benches first — if the window closes early, the numbers
# that matter most (BENCH_r03-shaped) are already on disk.
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

# --- 2026-08-19c queue (prior queues fully harvested: svgpgemm neutral at
# all scales once pinned; staticoff within noise; logs committed).

# 0. CH confirm: is the pinned-path 0.1319 (bench_ch_svgpfix) noise or a
# real ~3% restructure regression vs the 0.1272/0.1295 pre-restructure runs?
run_step bench_ch_svgpfix2 timeout 3600 python bench.py

# 1. atlas-scale training quality: 100-epoch domain ARI at 2 x 102,400 under
# the shipped atlas config (exact closures) — no quality number existed at
# any scale where the minibatch machinery is mandatory AND multi-tp OT runs
run_step atlas_quality_100ep timeout 10800 python examples/atlas_quality.py

# 2. analyze stage at atlas scale, device backend (elbow included): first
# measured number for the factored 102k x 102k full-cell OT + device elbow
run_step analyze_atlas_device timeout 10800 \
  python scripts/bench_analyze.py 102400 2 device 1

# 3. host-sklearn clustering comparison (clustering phases only — the OT
# phase is backend-independent and already timed by step 2)
run_step analyze_atlas_sklearn timeout 10800 \
  env SPADOT_BENCH_PHASES=none python scripts/bench_analyze.py 102400 2 sklearn 1

# 4. per-op decomposition at atlas scale with the per-line xplane parser
# (what binds the 1.67 s epoch: GAT flash kernels vs SVGP terms vs decoder)
run_step profile_atlas_lines timeout 3600 \
  env BENCH_MODE=atlas python scripts/profile_epoch.py 2

# 5. CH decomposition re-print with the fixed parser (the svgpgemm capture
# summed overlapping lines and was unreadable)
run_step profile_ch_lines timeout 3600 python scripts/profile_epoch.py 3

# 6. atlas batch-size A/B: 8192 halves the step count if the closures stay
# within the banding budget (the global criterion re-decides at this shape)
run_step bench_atlas_b8192 timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"batch_size": 8192}' python bench.py
