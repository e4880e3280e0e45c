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

# --- 2026-08-18b queue (written after the svgp 'high' default flip; the
# previous 17-step queue completed and was harvested into docs/performance.md)

# 1-3. headline confirms at the shipped round-3 defaults (svgp high is now
# the default — these are the numbers BENCH_r03.json should reproduce)
run_step bench_ch_r3final timeout 3600 python bench.py
run_step bench_atlas_r3final timeout 3600 env BENCH_MODE=atlas python bench.py
run_step bench_mouse_r3final timeout 3600 env BENCH_MODE=mouse python bench.py

# 4-6. mlp_matmul_precision=default (1-pass bf16 for the SVGP-encoder +
# decoder GEMMs — the z->genes decoder dominates non-GAT FLOPs at 9k genes,
# so mouse scale is where this should matter most)
run_step bench_mouse_mlp_default timeout 3600 \
  env BENCH_MODE=mouse BENCH_CFG='{"mlp_matmul_precision": "default"}' \
  python bench.py
run_step bench_ch_mlp_default timeout 3600 \
  env BENCH_CFG='{"mlp_matmul_precision": "default"}' python bench.py
run_step bench_atlas_mlp_default timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"mlp_matmul_precision": "default"}' \
  python bench.py

# 7. mlp 1-pass quality gate (flip criterion: ARI delta within ~0.005 of
# highest AND finite throughout, same bar the svgp 'high' flip cleared)
run_step mlp_quality timeout 5400 \
  env SPADOT_PREC_KEY=mlp_matmul_precision SPADOT_SVGP_CAND=default \
  python examples/svgp_precision_quality.py

# 8. svgp 1-pass speed probe (atlas; only worth a quality gate if this
# shows a real win over the shipped 3-pass 1.644)
run_step bench_atlas_svgp_default timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"svgp_matmul_precision": "default"}' \
  python bench.py

# 9. svgp 1-pass quality gate (the risky one: 'high' kept the whitened
# Cholesky PSD; 1-pass is unvalidated — watch finiteness first)
run_step svgp_default_quality timeout 5400 \
  env SPADOT_SVGP_CAND=default python examples/svgp_precision_quality.py

# 10. compound: both unflipped candidates together at mouse scale
run_step bench_mouse_compound timeout 3600 \
  env BENCH_MODE=mouse \
  BENCH_CFG='{"mlp_matmul_precision": "default", "svgp_matmul_precision": "default"}' \
  python bench.py
