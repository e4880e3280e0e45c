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

# --- 2026-08-19d queue. Supersedes the fully-harvested 19c queue and the
# never-fired tpu_session2.sh draft. Two 19c steps ended STEP_RC=1 and are
# NOT retried under their old names: atlas_quality_100ep (real divergence —
# the arms below investigate it) and analyze_atlas_device (int32 overflow,
# fixed in 2f7f91d — retried below as analyze_atlas_ot).

# 1-3. svgp_gemm_solves default decision: the pinned gemm path measures a
# real CH regression (0.1319/0.1331 vs the 0.1272/0.1295 pre-restructure
# band); A/B the restored per-step solve path at every scale.
run_step bench_ch_solvepath timeout 3600 \
  env BENCH_CFG='{"svgp_gemm_solves": false}' python bench.py
run_step bench_mouse_solvepath timeout 3600 \
  env BENCH_MODE=mouse BENCH_CFG='{"svgp_gemm_solves": false}' python bench.py
run_step bench_atlas_solvepath timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"svgp_gemm_solves": false}' python bench.py

# 4-6. warm-start KMeans refresh (ops/kmeans.py:kmeans_refit): the cold
# 10-restart kmeans++ fit is 387 ms of the 1.66 s atlas epoch
# (profile_atlas_lines.log). Expect ~20% atlas win if the warm path holds.
run_step bench_atlas_kmwarm timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"kmeans_refresh_warm": true}' python bench.py
run_step bench_ch_kmwarm timeout 3600 \
  env BENCH_CFG='{"kmeans_refresh_warm": true}' python bench.py
run_step bench_mouse_kmwarm timeout 3600 \
  env BENCH_MODE=mouse BENCH_CFG='{"kmeans_refresh_warm": true}' python bench.py

# 7. warm-KMeans quality gate: 5-seed paired ARI, shipped defaults vs
# defaults + warm refresh, at ChickenHeart scale / 100 epochs
run_step kmwarm_quality timeout 7200 \
  env SPADOT_AB_CFG='{"kmeans_refresh_warm": true}' \
  python examples/quality_multiseed.py

# 8. retry the analyze-stage full-cell OT at 102k x 102k with the int32
# overflow fixed (2f7f91d); sklearn clustering (1.5 s measured) feeds it —
# the phase under test is backend-independent
run_step analyze_atlas_ot timeout 10800 \
  env SPADOT_BENCH_PHASES=ot python scripts/bench_analyze.py 102400 2 sklearn 0

# 9-11. atlas-quality divergence arms (the speed-default run NaN'd ~epoch
# 31-40, atlas_quality_100ep.log). Hypotheses, in order of suspicion:
# (a) effective lr — the loss SUMS over batch rows, so batch 4096 carries
#     ~8x the reference's batch-512 gradient at the same lr 3e-4;
# (b) precision — bf16 speed defaults compound at this scale.
run_step atlasq_lrscaled timeout 10800 \
  env QUALITY_CFG='{"lr": 3.75e-5}' python examples/atlas_quality.py
run_step atlasq_parity timeout 10800 \
  env QUALITY_CFG='{"precision_preset": "parity"}' python examples/atlas_quality.py
run_step atlasq_b512 timeout 10800 \
  env QUALITY_CFG='{"batch_size": 512}' python examples/atlas_quality.py

# --- 2026-08-19c queue: post-B-pin timing re-measure -------------------
# The whitened-SVGP B/Bt gemms are now pinned 'highest' (644925d — fixes
# the large-ratio chol NaN). One (m,b)x(b,m) gemm per latent dim moved
# from 3-pass to 6-pass: re-measure the headline benches to confirm the
# cost is noise-level before the driver's round-end BENCH capture.
run_step bench_ch_bpin timeout 3600 python bench.py
run_step bench_mouse_bpin timeout 3600 env BENCH_MODE=mouse python bench.py
run_step bench_atlas_bpin timeout 3600 env BENCH_MODE=atlas python bench.py
