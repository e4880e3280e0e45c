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

# --- 2026-08-18c queue (written after the 18b harvest: mlp 1-pass flipped,
# svgp 1-pass ruled out — NaN latents -> OT overflow at every scale).

# 1. Multi-seed composite-precision quality study: fast preset (shipped
# defaults) vs parity preset (all highest), 5 training seeds on identical
# ChickenHeart-shaped data. Answers whether the golden-refresh ARI gap
# (0.961 vs 0.982, single seed) is run-to-run noise or a real compounding
# cost of the three quality-gated precision flips. ~2 compiles + 10 cached
# trains.
run_step quality_multiseed timeout 10800 python examples/quality_multiseed.py

# 2-3. Branch-ablation decomposition at the CURRENT round-3 defaults
# (the documented where-the-time-goes split predates exact closures,
# flash3b and the precision flips): encoder_mode svgp|gat isolates each
# branch's epoch share at CH scale.
run_step bench_ch_svgp_only timeout 3600 \
  env BENCH_CFG='{"encoder_mode": "svgp"}' python bench.py
run_step bench_ch_gat_only timeout 3600 \
  env BENCH_CFG='{"encoder_mode": "gat"}' python bench.py

# 4-5. Same decomposition at atlas scale — picks the next atlas lever
# (flash3b GAT vs SVGP terms vs everything-else residue at 1.64 s/epoch).
run_step bench_atlas_svgp_only timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"encoder_mode": "svgp"}' python bench.py
run_step bench_atlas_gat_only timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"encoder_mode": "gat"}' python bench.py
