#!/bin/bash
# 2026-08-19d follow-up queue — fired after the 2026-08-19c queue drains
# (do not edit a script bash is still executing). Decides the
# svgp_gemm_solves default: the pinned gemm path measures a real CH
# regression (0.1319/0.1331 vs the 0.1272/0.1295 pre-restructure band);
# these A/B the restored per-step solve path at every scale.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_logs docs/tpu_logs

probe() {
  timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

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
    echo "STEP_RC=${rc}" >> "$log"
  fi
}

run_step bench_ch_solvepath timeout 3600 \
  env BENCH_CFG='{"svgp_gemm_solves": false}' python bench.py
run_step bench_mouse_solvepath timeout 3600 \
  env BENCH_MODE=mouse BENCH_CFG='{"svgp_gemm_solves": false}' python bench.py
run_step bench_atlas_solvepath timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"svgp_gemm_solves": false}' python bench.py

# retry the analyze-stage full-cell OT at 102k x 102k with the int32
# overflow fixed (2f7f91d); sklearn clustering (1.5 s measured) feeds it —
# the phase under test is backend-independent
run_step analyze_atlas_ot timeout 10800 \
  env SPADOT_BENCH_PHASES=ot python scripts/bench_analyze.py 102400 2 sklearn 0

# atlas-quality divergence arms (the speed-default run NaN'd ~epoch 40,
# atlas_quality_100ep.log). Hypotheses, in order of suspicion:
# (a) effective lr — the loss SUMS over batch rows, so batch 4096 carries
#     ~8x the reference's batch-512 gradient at the same lr 3e-4;
# (b) precision — bf16 speed defaults compound at this scale.
run_step atlasq_lrscaled timeout 10800 \
  env QUALITY_CFG='{"lr": 3.75e-5}' python examples/atlas_quality.py
run_step atlasq_parity timeout 10800 \
  env QUALITY_CFG='{"precision_preset": "parity"}' python examples/atlas_quality.py
run_step atlasq_b512 timeout 10800 \
  env QUALITY_CFG='{"batch_size": 512}' python examples/atlas_quality.py
