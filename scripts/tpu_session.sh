#!/bin/bash
# Queued TPU measurements for the next tunnel window (run from repo root).
# Each step is independently time-bounded; logs land in /tmp/tpu_logs.
# Probe first: timeout 120 python -c "import jax; jax.devices()"
set -x
mkdir -p /tmp/tpu_logs
cd "$(dirname "$0")/.."

# 1. banded closure attention: flash3b vs XLA banded vs flash3 dense
timeout 1800 python scripts/bench_banded.py 2>&1 | tee /tmp/tpu_logs/banded.log

# 2. atlas step decomposition (SVGP gemm restructure, precision candidates)
timeout 1800 python scripts/bench_atlas_step.py 2>&1 | tee /tmp/tpu_logs/atlas_step.log

# 3. batch-row staging strategies (Y_ext gather)
timeout 900 python scripts/bench_gather.py 2>&1 | tee /tmp/tpu_logs/gather.log

# 4. atlas epoch bench (banded default + static adjacencies + svgp restructure)
timeout 3600 env BENCH_MODE=atlas python bench.py 2>&1 | tee /tmp/tpu_logs/bench_atlas.log

# 5. ChickenHeart headline bench (r03 default config)
timeout 3600 python bench.py 2>&1 | tee /tmp/tpu_logs/bench_ch.log
