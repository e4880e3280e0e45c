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

# 1. ChickenHeart headline bench (r03 default config, incl. bf16 gather auto)
run_step bench_ch timeout 3600 python bench.py

# 2. atlas epoch bench (banded default + static adjacencies + svgp restructure)
run_step bench_atlas timeout 3600 env BENCH_MODE=atlas python bench.py

# 2b. MouseOrganogenesis-scale bench (9,281 genes, 3 tps — SURVEY §6)
run_step bench_mouse timeout 3600 env BENCH_MODE=mouse python bench.py

# 3. banded closure attention: flash3b vs XLA banded vs flash3 dense
# (3 sizes x 2 precisions x 3 paths ~ 18 cold fwd+bwd compiles over the
# tunnel at ~2-3 min each; the tee'd log keeps partials if time runs out)
run_step banded timeout 5400 python scripts/bench_banded.py

# 4. atlas step decomposition (SVGP gemm restructure, precision candidates)
run_step atlas_step timeout 3600 python scripts/bench_atlas_step.py

# 5. batch-row staging strategies (Y_ext gather)
run_step gather timeout 900 python scripts/bench_gather.py

# 6. atlas A/B: bf16 gather staging off (vs step 2's auto-on)
run_step bench_atlas_nobf16 timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"gat_bf16_gather": "false"}' python bench.py

# 6b. atlas A/B: host-pre-gathered closure rows streamed as scan xs
# (replaces the 6.6 ms/step latency-bound device gather; bit-identical)
run_step bench_atlas_pregather timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"gat_ext_pregather": "true"}' python bench.py

# 6c. atlas A/B: pregather + streamed batch rows (the full staging package)
run_step bench_atlas_stream timeout 3600 \
  env BENCH_MODE=atlas \
  BENCH_CFG='{"gat_ext_pregather": "true", "batch_rows_stream": "true"}' \
  python bench.py

# 7. atlas A/B: banded closures off (square static masks + flash3)
run_step bench_atlas_nobanded timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"gat_ext_banded": "false"}' python bench.py

# 8. ChickenHeart A/B: force banded closures (auto keeps them off at P~1280)
run_step bench_ch_banded timeout 3600 \
  env BENCH_CFG='{"gat_ext_banded": "true", "gat_ext_band_ti": 128}' \
  python bench.py

# 9. SVGP 'high' (3-pass bf16) candidate at ChickenHeart scale
run_step bench_ch_svgp_high timeout 3600 \
  env BENCH_CFG='{"svgp_matmul_precision": "high"}' python bench.py

# 10. flash3 tall-tile A/B: TI=1024 vs 512 at the 1024-aligned dense size
# (8192 auto-switches under the env; step 3's 8192 row is the 512 baseline)
run_step flash3_ti1024 timeout 1800 \
  env SPADOT_FLASH3_TI=1024 python scripts/bench_banded.py 8192

# 11. windowed-vs-exact training quality at 51200 spots/tp, 100 epochs
# (VERDICT r2 weak #4: no quality number at a scale where windowed mode
# matters; exact closures are the default now, windowed is the opt-in
# approximation — this quantifies what opting in costs at 51k)
run_step windowed_quality_51k timeout 5400 \
  python examples/windowed_quality.py 51200 100

# 12. golden-run quality refresh under the round-3 defaults (bf16 GAT +
# exact closures): full preprocess->train(100ep)->analyze into a SCRATCH
# dir (committed golden_out/ fixtures stay untouched), domain ARI logged
run_step golden_refresh timeout 3600 \
  python examples/golden_run.py /tmp/golden_refresh

# 13. ChickenHeart re-measure after the GLOBAL band-vs-square decision fix
# (bench_ch above ran pre-fix: a 3-banded/1-square mix dropped the fused
# static mask stack; the fix stacks consistent square masks — this step
# measures what the per-step scatter removal is worth at P=1280)
run_step bench_ch_static timeout 3600 python bench.py

# 14. atlas re-measure with pregather+stream if 6b/6c won (harvest decides);
# unconditional here: it also covers the global-decision codepath at atlas
run_step bench_atlas2 timeout 3600 env BENCH_MODE=atlas python bench.py

# 15. SVGP 'high' precision quality gate (the microbench won on speed;
# this decides whether the default can flip without the non-PSD relapse)
run_step svgp_quality timeout 5400 python examples/svgp_precision_quality.py

# 16. atlas A/B: SVGP 'high' matmul precision (CH already measured 0.1267
# vs 0.1388; the atlas step decomposition says 12.0 vs 15.4 ms/step -> an
# expected ~0.17 s off the 1.833 epoch). Default flip is gated on step 15.
run_step bench_atlas_svgp_high timeout 3600 \
  env BENCH_MODE=atlas BENCH_CFG='{"svgp_matmul_precision": "high"}' \
  python bench.py

# 17. mouse-scale A/B: SVGP 'high' (9,281 genes shifts the epoch toward the
# encoder/decoder GEMMs; this tells us whether the flip matters there too)
run_step bench_mouse_svgp_high timeout 3600 \
  env BENCH_MODE=mouse BENCH_CFG='{"svgp_matmul_precision": "high"}' \
  python bench.py
