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


# --- 2026-08-20k (round 5 open): driver-verifiable evidence first.
# (1) Verdict Next #3: one window, all three scale headlines as parseable
# JSON lines from the new BENCH_SCALES mode (the driver's own entry point).
run_step bench_scales_r5 timeout 7200 \
  env BENCH_SCALES=ch,mouse,atlas python bench.py

# (2) Verdict Next #4a: the standing 5-seed fast-vs-parity paired gate at
# the MOUSE run shape (3 tps x 3400 spots, 9,281 genes) — every prior gate
# was CH-scale.
run_step quality_mouse_5seed timeout 14400 \
  python examples/quality_multiseed.py 3400 100 9281 3

# (3) Verdict Next #4b: >=3 seeds at atlas scale under the shipped
# large-scale config (b4096, scaled lr, 100 epochs); prior evidence was
# the single-seed 0.8525 (atlasq_lrscaled.log).
run_step quality_atlas_3seed timeout 14400 \
  env SPADOT_SEEDS=1993,7,42 python examples/atlas_quality.py

# --- appended mid-session 2026-08-20k (round 5): flash3bb A/B at atlas
# (verdict Next #1 — the nb axis built into the flash3b kernel grid).
# Control arm adjacent in the same window; the auto gate logs whether the
# batched kernel probe passed (a failed probe makes both arms identical).
run_step bench_atlas_flash3bb timeout 7200 \
  env BENCH_MODE=atlas python bench.py
run_step bench_atlas_kbatch0 timeout 7200 \
  env BENCH_MODE=atlas BENCH_CFG='{"gat_ext_kernel_batch": 0}' python bench.py
run_step profile_atlas_flash3bb timeout 7200 \
  env BENCH_MODE=atlas python scripts/profile_epoch.py 2

# --- appended 2026-08-20l (round 5): SVGP per-dim gemm levers (verdict
# Next #2). (a) svgp_bt_shared default-on (B-tilde formed from B's shared
# W gemm — math-identical, differentially tested); A/B arms at every
# scale with the direct-forming control. (b) m-reduction probe at atlas
# (inducing 600 vs the reference 1200) — bench + 3-seed quality.
run_step bench_ch_r5head timeout 7200 python bench.py
run_step bench_mouse_r5head timeout 7200 env BENCH_MODE=mouse python bench.py
run_step bench_ch_btoff timeout 7200 \
  env BENCH_CFG='{"svgp_bt_shared": false}' python bench.py
run_step bench_mouse_btoff timeout 7200 \
  env BENCH_MODE=mouse BENCH_CFG='{"svgp_bt_shared": false}' python bench.py
run_step bench_atlas_btoff timeout 7200 \
  env BENCH_MODE=atlas BENCH_CFG='{"svgp_bt_shared": false}' python bench.py
run_step bench_atlas_m600 timeout 7200 \
  env BENCH_MODE=atlas BENCH_INDUCING=600 python bench.py
run_step quality_atlas_3seed_m600 timeout 14400 \
  env SPADOT_SEEDS=1993,7,42 QUALITY_CFG='{"inducing_point_nums": 600}' \
  python examples/atlas_quality.py

# --- appended 2026-08-20m (round 5): CH layout-copy bounded attempt
# (verdict Next #6) — per_dim consumers of X = Lb^-1 read the produced
# layout by default; the env arm restores the transposed pre-r5 forms.
run_step bench_ch_xlayout_off timeout 7200 \
  env SPADOT_SVGP_XLAYOUT=0 python bench.py

# --- appended 2026-08-20n: atlas 3-seed RETRY under subprocess-per-seed
# (the in-process seed loop OOM'd the TPU on seed 2 — see the v1 log,
# which keeps seed 1993's 0.8871; this re-runs all three isolated).
run_step quality_atlas_3seed_v2 timeout 14400 \
  env SPADOT_SEEDS=1993,7,42 python examples/atlas_quality.py

# --- appended 2026-08-20o: complete the CH 2x2 (bt x xlayout) factorial —
# both-off = round-4-equivalent code in THIS window (disambiguates window
# drift from the xlayout effect).
run_step bench_ch_r4equiv timeout 7200 \
  env SPADOT_SVGP_XLAYOUT=0 BENCH_CFG='{"svgp_bt_shared": false}' python bench.py
run_step bench_mouse_xlayout_off timeout 7200 \
  env BENCH_MODE=mouse SPADOT_SVGP_XLAYOUT=0 python bench.py

# --- appended 2026-08-20p: post-flip confirms (xlayout default reverted
# to the transposed forms after it measured +5% at CH) — atlas + CH heads
# at the final round-5 defaults (bt_shared on, xlayout off, kernel_batch
# off).
run_step bench_atlas_r5final timeout 7200 env BENCH_MODE=atlas python bench.py
run_step bench_ch_r5final timeout 7200 python bench.py
run_step bench_mouse_r5final timeout 7200 env BENCH_MODE=mouse python bench.py

# --- appended 2026-08-21a: composite 5-seed quality anchor at the FINAL
# round-5 HEAD (the standing fast-vs-parity study at CH shape — the
# round-5 analogue of quality_r4_composite_5seed.log).
run_step quality_r5_composite_5seed timeout 14400 \
  python examples/quality_multiseed.py

# --- appended 2026-08-21b: full-graph extraction arm at atlas (the
# closure-batched refresh re-projects ~1.9x the rows there; the
# windowed-gather full pass was never re-measured after banding landed).
run_step bench_atlas_extfull timeout 7200 \
  env BENCH_MODE=atlas BENCH_CFG='{"latent_ext_mode": "full"}' python bench.py
