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

# --- 2026-08-18d queue (after the SVGP trsm->gemm restructure: L_mm-derived
# constants precomputed once, per-step triangular solves replaced by MXU
# gemms — ops/svgp.py:svgp_shared).

# 1-3. headline A/Bs at the shipped defaults (HLO changed -> fresh compiles)
run_step bench_ch_svgpgemm timeout 3600 python bench.py
run_step bench_atlas_svgpgemm timeout 3600 env BENCH_MODE=atlas python bench.py
run_step bench_mouse_svgpgemm timeout 3600 env BENCH_MODE=mouse python bench.py

# 4. quality re-gate on the new path: multi-seed fast-vs-parity composite
# (the 2026-08-18c study measured +0.0051 ± 0.0096 on the PREVIOUS code)
run_step quality_multiseed_svgpgemm timeout 10800 \
  python examples/quality_multiseed.py

# 5. fresh per-op profile at CH scale (what replaced the 35% trsm/chol block)
run_step profile_ch_svgpgemm timeout 3600 python scripts/profile_epoch.py 3

# 6. attribution A/B: atlas with static closure adjacencies forced OFF
# (the 'auto' default builds them when the 4 GiB budget allows — this pins
# the contribution of dropping the 5.9 ms/step mask scatter; CLAUDE.md
# lists the measurement as pending from the 2026-08-18 outage)
run_step bench_atlas_staticoff timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"gat_ext_static_adj": false}' python bench.py

# --- 2026-08-19 follow-ups (svgp precision pin, db43632) ---
# 7. CH re-measure with the pinned solve-replacement gemms (the step-1 CH
# number above ran the UNPINNED code; atlas NaN'd on it — the pinned-path
# number is what BENCH_r03 will reflect). The failed unpinned atlas log is
# preserved as bench_atlas_svgpgemm_nan.log; the step-2 retry on re-fire
# overwrites bench_atlas_svgpgemm.log with the pinned run.
run_step bench_ch_svgpfix timeout 3600 python bench.py
