#!/bin/bash
# Queued TPU measurements for the next tunnel window (run from repo root).
# Each step is independently time-bounded; logs land in docs/tpu_logs (inside
# the repo, so partial results survive a round boundary — the driver commits
# uncommitted files when turns run out).
# Probe first: timeout 120 python -c "import jax; jax.devices()"
# ORDER: headline benches first — if the window closes early, the numbers
# that matter most (BENCH_r03-shaped) are already on disk.
set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_logs docs/tpu_logs

# 1. ChickenHeart headline bench (r03 default config, incl. bf16 gather auto)
timeout 3600 python bench.py 2>&1 | tee docs/tpu_logs/bench_ch.log

# 2. atlas epoch bench (banded default + static adjacencies + svgp restructure)
timeout 3600 env BENCH_MODE=atlas python bench.py 2>&1 | tee docs/tpu_logs/bench_atlas.log

# 2b. MouseOrganogenesis-scale bench (9,281 genes, 3 tps — SURVEY §6)
timeout 3600 env BENCH_MODE=mouse python bench.py 2>&1 | tee docs/tpu_logs/bench_mouse.log

# 3. banded closure attention: flash3b vs XLA banded vs flash3 dense
# (3 sizes x 2 precisions x 3 paths ~ 18 cold fwd+bwd compiles over the
# tunnel at ~2-3 min each; the tee'd log keeps partials if time runs out)
timeout 5400 python scripts/bench_banded.py 2>&1 | tee docs/tpu_logs/banded.log

# 4. atlas step decomposition (SVGP gemm restructure, precision candidates)
timeout 3600 python scripts/bench_atlas_step.py 2>&1 | tee docs/tpu_logs/atlas_step.log

# 5. batch-row staging strategies (Y_ext gather)
timeout 900 python scripts/bench_gather.py 2>&1 | tee docs/tpu_logs/gather.log

# 6. atlas A/B: bf16 gather staging off (vs step 2's auto-on)
timeout 3600 env BENCH_MODE=atlas BENCH_CFG='{"gat_bf16_gather": "false"}' \
  python bench.py 2>&1 | tee docs/tpu_logs/bench_atlas_nobf16.log

# 6b. atlas A/B: host-pre-gathered closure rows streamed as scan xs
# (replaces the 6.6 ms/step latency-bound device gather; bit-identical)
timeout 3600 env BENCH_MODE=atlas BENCH_CFG='{"gat_ext_pregather": "true"}' \
  python bench.py 2>&1 | tee docs/tpu_logs/bench_atlas_pregather.log

# 6c. atlas A/B: pregather + streamed batch rows (the full staging package)
timeout 3600 env BENCH_MODE=atlas \
  BENCH_CFG='{"gat_ext_pregather": "true", "batch_rows_stream": "true"}' \
  python bench.py 2>&1 | tee docs/tpu_logs/bench_atlas_stream.log

# 7. atlas A/B: banded closures off (square static masks + flash3)
timeout 3600 env BENCH_MODE=atlas BENCH_CFG='{"gat_ext_banded": "false"}' \
  python bench.py 2>&1 | tee docs/tpu_logs/bench_atlas_nobanded.log

# 8. ChickenHeart A/B: force banded closures (auto keeps them off at P~1280)
timeout 3600 env BENCH_CFG='{"gat_ext_banded": "true", "gat_ext_band_ti": 128}' \
  python bench.py 2>&1 | tee docs/tpu_logs/bench_ch_banded.log

# 9. SVGP 'high' (3-pass bf16) candidate at ChickenHeart scale
timeout 3600 env BENCH_CFG='{"svgp_matmul_precision": "high"}' \
  python bench.py 2>&1 | tee docs/tpu_logs/bench_ch_svgp_high.log

# 10. flash3 tall-tile A/B: TI=1024 vs 512 at the 1024-aligned dense size
# (8192 auto-switches under the env; step 3's 8192 row is the 512 baseline)
timeout 1800 env SPADOT_FLASH3_TI=1024 python scripts/bench_banded.py 8192 \
  2>&1 | tee docs/tpu_logs/flash3_ti1024.log

# 11. windowed-vs-exact training quality at 51200 spots/tp, 100 epochs
# (VERDICT r2 weak #4: no quality number at a scale where windowed mode
# matters; exact closures are the default now, windowed is the opt-in
# approximation — this quantifies what opting in costs at 51k)
timeout 5400 python examples/windowed_quality.py 51200 100 \
  2>&1 | tee docs/tpu_logs/windowed_quality_51k.log
