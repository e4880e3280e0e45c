"""Factored (cost-matrix-free) Sinkhorn vs the dense engines, and the
blockwise plan reductions used by the large-scale analyze path."""
import numpy as np
import pytest
from scipy.spatial.distance import cdist

from spadot_tpu.ops.sinkhorn import sinkhorn_duality_gap_np
from spadot_tpu.ops.sinkhorn_flash import (
    cost_median_factored,
    plan_reductions,
    sinkhorn_factored,
)

PARAMS = dict(
    lambda1=0.1, lambda2=5.0, epsilon=0.05, batch_size=5,
    tolerance=1e-8, epsilon0=1, max_iter=10_000_000,
)


def _xy(rng, I=60, J=75, d=12):
    return rng.normal(0, 2, (I, d)), rng.normal(0.5, 2, (J, d))


def test_factored_matches_dense(rng):
    X0, X1 = _xy(rng)
    C = cdist(X0, X1, "sqeuclidean")
    C = C / np.median(C)
    G = rng.uniform(0.5, 2, X0.shape[0])
    R_np = sinkhorn_duality_gap_np(C, G, **PARAMS)
    R_fl = sinkhorn_factored(X0, X1, G, block=32, dtype=np.float32, **PARAMS)
    np.testing.assert_allclose(R_fl, R_np, rtol=5e-3, atol=1e-8)


def test_factored_block_size_invariance(rng):
    X0, X1 = _xy(rng, 50, 40)
    R1 = sinkhorn_factored(X0, X1, block=8, dtype=np.float32, **PARAMS)
    R2 = sinkhorn_factored(X0, X1, block=64, dtype=np.float32, **PARAMS)
    np.testing.assert_allclose(R1, R2, rtol=2e-3, atol=1e-9)


def test_plan_reductions_match_dense(rng):
    X0, X1 = _xy(rng, 45, 55)
    G = np.ones(45)
    f, g, s, eps_final = sinkhorn_factored(
        X0, X1, G, return_plan=False, dtype=np.float32, block=16, **PARAMS
    )
    C = cdist(X0, X1, "sqeuclidean") / s
    R = np.exp((f[:, None] + g[None, :] - C) / eps_final) / 55
    M1 = rng.integers(0, 2, size=(55, 3)).astype(np.float64)
    rows, cols, agg = plan_reductions(
        f, g, np.asarray(X0, np.float32), np.asarray(X1, np.float32),
        s=s, eps_final=eps_final, M1=M1, block=16,
    )
    np.testing.assert_allclose(rows, R.sum(axis=1), rtol=2e-3)
    np.testing.assert_allclose(cols, R.sum(axis=0), rtol=2e-3)
    np.testing.assert_allclose(agg, R @ M1, rtol=2e-3, atol=1e-10)


def test_cost_median_sampled_close(rng):
    X0, X1 = _xy(rng, 400, 300, 5)
    exact = cost_median_factored(X0, X1, scale_samples=10**9)
    sampled = cost_median_factored(X0, X1, scale_samples=50_000)
    assert abs(sampled / exact - 1) < 0.05


def test_factored_chunk_invariance(rng):
    """Host-chunked dispatch (bounded while_loop per device call — the
    remote-TPU-worker-survival fix) must be bitwise-equivalent to one big
    dispatch: chunking moves dispatch boundaries, never iteration or
    gap-check semantics."""
    X0, X1 = _xy(rng, 50, 40)
    R_one = sinkhorn_factored(X0, X1, chunk_iters=10_000, dtype=np.float32,
                              block=16, **PARAMS)
    R_tiny = sinkhorn_factored(X0, X1, chunk_iters=7, dtype=np.float32,
                               block=16, **PARAMS)
    np.testing.assert_array_equal(R_one, R_tiny)


@pytest.mark.slow  # fast-lane hygiene: warm-start resume path; chunk invariance stays in-lane
def test_factored_warm_start_same_answer(rng):
    """Warm-started duals (the growth-iteration path) must reach the same
    converged plan as a cold solve: the unbalanced problem's optimum is
    unique, the ladder is pure continuation, and the gap criterion certifies
    convergence regardless of init. The warm path skips the epsilon ladder."""
    X0, X1 = _xy(rng, 50, 40)
    G1 = rng.uniform(0.5, 2, 50)
    f1, g1, s, eps_final = sinkhorn_factored(
        X0, X1, np.ones(50), return_plan=False, dtype=np.float32, block=16,
        **PARAMS,
    )
    # growth step: new row marginal, warm vs cold
    cold = sinkhorn_factored(X0, X1, G1, dtype=np.float32, block=16, **PARAMS)
    warm = sinkhorn_factored(
        X0, X1, G1, dtype=np.float32, block=16, f0=f1, g0=g1, **PARAMS
    )
    np.testing.assert_allclose(warm, cold, rtol=5e-3, atol=1e-8)


@pytest.mark.slow  # fast-lane hygiene: failure-handling path
def test_factored_plateau_bail(rng, capfd, monkeypatch):
    """An unreachable gap threshold must not spin until max_iter: the f32
    relative duality gap has a cancellation floor (measured frozen at
    3.340e-04 for 16k+ iterations at 102k x 102k,
    docs/tpu_logs/analyze_atlas_ot2.log). With SPADOT_OT_PLATEAU_CHUNKS set,
    a stage whose gap stops improving by >=0.1%/chunk bails with a warning
    and returns the fixed-point duals. The stall shape is reproduced by
    handing the host loop a threshold below the solver's own floor, so the
    device iterate freezes while the host criterion stays unmet — exactly
    the production failure."""
    import jax.numpy as jnp

    from spadot_tpu.ops.sinkhorn_flash import (
        _drive_chunks,
        _make_solver,
    )

    X0, X1 = _xy(rng, 30, 25)
    X0 = np.asarray(X0, np.float32)
    X1 = np.asarray(X1, np.float32)
    I, J = X0.shape[0], X1.shape[0]
    s = cost_median_factored(X0, X1)
    stage_chunk, stage_params = _make_solver(
        I, J, X0.shape[1], np.float32, 0.1, 5.0, 0.05, 1.0,
        5, 1e-8, 20_000, 16,
    )
    # final-stage HOST threshold made unreachable (the device cond still
    # converges at its clamped eff_tol and then freezes)
    hacked = stage_params[:-1] + [(stage_params[-1][0], 1e-30, True)]
    monkeypatch.setenv("SPADOT_OT_PLATEAU_CHUNKS", "3")
    args = (jnp.asarray(X0), jnp.asarray(X1),
            jnp.ones((I,), jnp.float32), jnp.full((J,), 1.0, jnp.float32),
            jnp.asarray(1.0 / s, jnp.float32))
    f, g = _drive_chunks(
        stage_chunk, hacked, *args,
        dtype=np.float32, I=I, J=J, max_iter=20_000, chunk_iters=5,
    )
    err = capfd.readouterr().err
    assert "plateaued" in err
    assert np.isfinite(np.asarray(f)).all() and np.isfinite(np.asarray(g)).all()
    # the bailed duals ARE the converged fixed point, not a mid-descent cut
    f_ref, g_ref = _drive_chunks(
        stage_chunk, stage_params, *args,
        dtype=np.float32, I=I, J=J, max_iter=20_000, chunk_iters=5,
    )
    np.testing.assert_array_equal(np.asarray(f), np.asarray(f_ref))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))


def test_factored_verbose_progress(rng, capfd):
    """SPADOT_OT_VERBOSE=1 emits one stderr line per chunk (stage/it/gap) —
    the observability lever for multi-hour 100k x 100k solves."""
    X0, X1 = _xy(rng, 30, 25)
    import os

    os.environ["SPADOT_OT_VERBOSE"] = "1"
    try:
        sinkhorn_factored(X0, X1, dtype=np.float32, block=16, **PARAMS)
    finally:
        del os.environ["SPADOT_OT_VERBOSE"]
    err = capfd.readouterr().err
    assert "[sinkhorn_factored] stage" in err and "gap=" in err
