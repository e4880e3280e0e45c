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


# --- 2026-08-20d (round 4): finish the blocked-Cholesky decision.
# The 2026-08-20c queue is fully superseded: bench_ch_blocked WON its arm
# (0.1071 vs series 0.1142, bench_ch_blocked.log) but bench_mouse_blocked
# burned its window on a dead tunnel and the atlas arm was never queued
# (VERDICT r3 Missing #2). Since then the backend was FOLDED
# (ops/tri_inverse.py:blocked_cholesky_inv — the panel loop's per-128-block
# diagonal inverses are reused by the assembly instead of recomputed;
# round-3 advisor finding), so every arm below re-measures the folded form
# under fresh step names. HEAD (series) re-confirms run in the SAME window
# so the A/B is not cross-window (windows drift ~4%: the 2026-08-20 cvjp
# re-confirm window ran slow across the board).
#
# Decision rule (unchanged from r3): flip _resolve_chol_backend 'auto' ->
# 'blocked' on TPU iff blocked beats series outside the ±1% noise band at
# CH AND mouse AND atlas (the atlas SVGP factor complex is back to ~5-7%
# of the epoch at m=605, profile_atlas_series.log — do not assume neutral).
# Then re-gate quality 5-seed (step 7) before committing the flip.

run_step bench_ch_head4 timeout 3600 python bench.py
run_step bench_ch_blocked2 timeout 3600 \
  env BENCH_CFG='{"svgp_chol_backend": "blocked"}' python bench.py
run_step bench_mouse_head4 timeout 3600 env BENCH_MODE=mouse python bench.py
run_step bench_mouse_blocked2 timeout 3600 \
  env BENCH_MODE=mouse BENCH_CFG='{"svgp_chol_backend": "blocked"}' python bench.py
run_step bench_atlas_head4 timeout 7200 env BENCH_MODE=atlas python bench.py
run_step bench_atlas_blocked timeout 7200 \
  env BENCH_MODE=atlas BENCH_CFG='{"svgp_chol_backend": "blocked"}' python bench.py

# 7. Quality re-gate for the prospective flip: 5-seed paired A/B, shipped
# defaults vs + blocked backend (protocol = kmwarm/svgpgemm gates). Only
# consulted if the three arms above pass the decision rule.
run_step quality_blocked_5seed timeout 14400 \
  env SPADOT_AB_CFG='{"svgp_chol_backend": "blocked"}' \
  python examples/quality_multiseed.py

# 8. Per-op profile under the blocked backend at CH: did the
# CholeskyExpander complex (~22 ms/ep: blocked custom calls + layout
# copies, profile_ch_series.log) actually collapse, and what's the new
# top block?
run_step profile_ch_blocked timeout 3600 \
  env BENCH_CFG='{"svgp_chol_backend": "blocked"}' python scripts/profile_epoch.py 3
