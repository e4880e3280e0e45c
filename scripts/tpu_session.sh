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

# --- 2026-08-20 queue. Supersedes the fully-harvested 19d queue (solve-path
# A/Bs, kmwarm gate+benches, atlasq lr/precision/b512 arms, B-pin benches —
# all decisions recorded in CLAUDE.md / docs/scaling.md). Remaining opens:
#
# 1. HEAD confirmation of the ChickenHeart headline after the collapsed-dim
#    Cholesky rescue (89ad97f) — the guard's lax.cond is supposed to be free
#    on the healthy path; this is the number the driver's round-end BENCH
#    capture should reproduce.
run_step bench_ch_r3head timeout 3600 python bench.py

# 2. Analyze-stage full-cell OT at 102k x 102k, retried on the host-chunked
#    factored dispatch (fd2c714) + growth warm-start (dda46b9). The
#    pre-chunking attempt timed out at 3h (analyze_atlas_ot.log STEP_RC=143,
#    one monolithic while_loop dispatch never returning over the tunnel);
#    the first chunked attempt lost its tunnel window after the clustering
#    phase (analyze_atlas_ot_chunked.log, no STEP_RC). Fresh name, fresh
#    window.
run_step analyze_atlas_ot2 timeout 10800 \
  env SPADOT_BENCH_PHASES=ot python scripts/bench_analyze.py 102400 2 sklearn 0

# 3. b512-at-atlas quality arm under the chol guard: the 19d arm NaN'd at
#    the first OT refresh via the collapsed-dim mechanism the guard now
#    rescues (CLAUDE.md "COLLAPSED-DIM CHOL RESCUE"). Default scaled lr
#    (3.75e-5) is the harness default; only the batch size is overridden.
#    Closes the "batch 512 at 102k" numerics story with a finite 100-epoch
#    ARI or a fresh root cause.
run_step atlasq_b512_guard timeout 10800 \
  env QUALITY_CFG='{"batch_size": 512}' python examples/atlas_quality.py

# 4-6. HEAD bench confirms after the guard's gradient fix (fa2214b): the
#    rescue probe is now an ALWAYS-ON extra (L, m, m) forward Cholesky per
#    step (the lax.cond variant it replaces wrote NaN grads whenever the
#    rescue actually fired). Same-shape factor ops measured at wall noise
#    in the solve-path A/Bs, but the driver's round-end BENCH captures
#    HEAD — confirm the headline at every scale before it does.
run_step bench_ch_gradfix timeout 3600 python bench.py
run_step bench_mouse_gradfix timeout 3600 env BENCH_MODE=mouse python bench.py
run_step bench_atlas_gradfix timeout 7200 env BENCH_MODE=atlas python bench.py

# 7-9. Re-confirm after the guard's custom_vjp restructure: the
#    stop_gradient-probe variant (steps 4-6) measured +20% at CH and
#    mouse — it doubled the per-step Cholesky count. The custom_vjp
#    guard is ONE plain chol on the healthy path (rescue re-chol only
#    when a dim actually NaN's, behind a real cond) with the standard
#    Cholesky pullback applied at the returned finite factor — expected
#    to restore the 0.127-0.137 CH band while keeping rescue gradients
#    finite.
run_step bench_ch_cvjp timeout 3600 python bench.py
run_step bench_mouse_cvjp timeout 3600 env BENCH_MODE=mouse python bench.py
run_step bench_atlas_cvjp timeout 7200 env BENCH_MODE=atlas python bench.py

# 10. Adaptive elbow sweep at atlas scale on the DEVICE backend (the
#    single-executable traced-k sweep, 826ba54) — VERDICT r2 weak #5
#    called the host elbow the 100k-pipeline bottleneck; this records
#    the fixed number. Clustering phase only (OT already measured).
run_step elbow_atlas_device timeout 3600 \
  env SPADOT_BENCH_PHASES=cluster python scripts/bench_analyze.py 102400 2 device 1

# 11. Fresh per-op profile at the 0.1239 HEAD (custom_vjp guard) — the
#    round-4 lever hunt input: where do the remaining 6.2 ms/step go
#    (closure-GAT passes vs SVGP terms vs refresh vs copies).
run_step profile_ch_cvjp timeout 3600 python scripts/profile_epoch.py 3

# --- 2026-08-20b queue (post-series profiles; feeds the round-4 lever hunt).
# The CH series-HEAD profile and the kmiters8 neutral A/B were measured
# interactively (profile_ch_series.log, bench_ch_kmiters8.log). Remaining:
# per-op profiles at the OTHER two scales under the series backend — mouse
# (weakest multiplier, 15.7x: where do the 9,281-gene GEMMs sit vs the
# scale-constant SVGP factor complex?) and atlas (is the refresh/extraction
# share at 102k spots still ~residual after closure-batched KMeans?).
run_step profile_mouse_series2 timeout 3000 \
  env BENCH_MODE=mouse python scripts/profile_epoch.py 3
run_step profile_atlas_series timeout 4800 \
  env BENCH_MODE=atlas python scripts/profile_epoch.py 2

# --- 2026-08-20c: blocked-Cholesky backend A/B (svgp_chol_backend:
# blocked — keeps only the per-128-block chol custom calls; panels are
# series-gemm products, ops/tri_inverse.py:blocked_cholesky). Targets the
# ~22 ms/ep (CH) / ~45 ms/ep (mouse) CholeskyExpander complex measured in
# profile_ch_series.log / profile_mouse_series.log. CPU-differential
# tests green (tests/test_pallas.py::test_blocked_*, ::test_svgp_batch_
# terms_blocked_backend_matches_xla). Decision rule: flip 'auto' to
# blocked-on-TPU next round iff both arms beat series HEAD (0.1142 CH /
# 0.1955 mouse) outside the ±1% noise band.
run_step bench_ch_blocked timeout 3600 \
  env BENCH_CFG='{"svgp_chol_backend": "blocked"}' python bench.py
run_step bench_mouse_blocked timeout 3600 \
  env BENCH_MODE=mouse BENCH_CFG='{"svgp_chol_backend": "blocked"}' python bench.py
