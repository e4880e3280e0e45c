"""SCTransform: GLM fit recovery on simulated NB data + pipeline behavior."""
import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from spadot_tpu.preprocess.bandwidth import bw_sj, ksmooth_normal
from spadot_tpu.preprocess.sctransform import fit_poisson_genes, sctransform


def _simulate_nb(rng, n_cells=400, n_genes=60, theta=5.0):
    """NB counts with mu_gc = exp(a_g + b_g * log10(umi_c))."""
    depth = rng.uniform(1000, 10000, n_cells)
    log_umi = np.log10(depth)
    a = rng.uniform(-3, 0, n_genes)
    b = rng.uniform(0.8, 1.2, n_genes)
    mu = np.exp(a[:, None] + b[:, None] * log_umi[None, :])
    p = theta / (theta + mu)
    counts = rng.negative_binomial(theta, p)
    return counts.astype(float), log_umi, a, b


def _numpy_poisson_irls(y, log_umi, tol=1e-9, maxiter=100):
    """Reference Newton IRLS for y ~ 1 + log_umi (float64 host)."""
    X = np.stack([np.ones_like(log_umi), log_umi], axis=1)
    b = np.array([np.log(max(y.mean(), 1e-12)), 0.0])
    for _ in range(maxiter):
        m = np.exp(np.clip(X @ b, -708, 709))
        L1 = X.T @ (y - m)
        L2 = X.T @ (X * m[:, None])
        step = np.linalg.solve(L2, L1)
        b = b + step
        if np.abs(step).sum() <= tol:
            break
    return b


def test_glm_fit_matches_numpy_irls(rng):
    """The vmapped JAX Newton must agree with a float64 host IRLS."""
    counts, log_umi, a, b = _simulate_nb(rng)
    thetas, intercepts, slopes = fit_poisson_genes(
        sp.csr_matrix(counts), log_umi, chunk=64
    )
    keep = counts.sum(axis=1) > 50  # identifiable genes
    for g in np.where(keep)[0][:20]:
        ref = _numpy_poisson_irls(counts[g], log_umi)
        np.testing.assert_allclose(intercepts[g], ref[0], rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(slopes[g], ref[1], rtol=1e-3, atol=1e-3)
    # against the simulation truth: unbiased in aggregate
    assert np.median(np.abs(slopes[keep] - b[keep])) < 0.3
    # theta should be in a sane range around the simulated 5
    assert np.median(thetas[keep]) == pytest.approx(5.0, rel=1.0)


def test_sctransform_pipeline(rng):
    counts, log_umi, _, _ = _simulate_nb(rng, n_cells=300, n_genes=80)
    genes = np.array([f"g{i}" for i in range(80)])
    cells = np.array([f"c{i}" for i in range(300)])
    assay_out, vst_out = sctransform(
        sp.csr_matrix(counts), genes, cells,
        variable_features_n=None, variable_features_rv_th=1.3,
    )
    sd = assay_out["scale.data"]
    assert isinstance(sd, pd.DataFrame)
    assert sd.shape[1] == 300
    X = sd.to_numpy()
    assert np.isfinite(X).all()
    # row-centered
    np.testing.assert_allclose(X.mean(axis=1), 0, atol=1e-10)
    # clipped to +-sqrt(n/30) around the centering shift
    assert np.abs(X).max() < 2 * np.sqrt(300 / 30)
    # NB-simulated data has no real variable genes -> residual variance ~ 1
    rv = vst_out["gene_attr"]["residual_variance"]
    assert 0.5 < rv.median() < 2.0


def test_sctransform_filters_rare_genes(rng):
    counts, log_umi, _, _ = _simulate_nb(rng, n_cells=200, n_genes=30)
    counts[5] = 0.0
    counts[5, :3] = 1.0  # detected in only 3 cells < min_cells=5
    genes = np.array([f"g{i}" for i in range(30)])
    cells = np.array([f"c{i}" for i in range(200)])
    assay_out, _ = sctransform(sp.csr_matrix(counts), genes, cells)
    assert "g5" not in assay_out["scale.data"].index


def test_sctransform_survives_nonfinite_glm_fit(rng, monkeypatch):
    """A single diverged (NaN) GLM fit must not poison the regularized
    params of every gene via the kernel smoother (observed at
    MouseOrganogenesis scale with near-constant cell UMI totals)."""
    import importlib

    sct = importlib.import_module("spadot_tpu.preprocess.sctransform")

    counts, log_umi, _, _ = _simulate_nb(rng, n_cells=250, n_genes=70)
    real_fit = sct.fit_poisson_genes

    def poisoned_fit(umi, log_umi, chunk=2048):
        th, ic, sl = real_fit(umi, log_umi, chunk=chunk)
        th[3], ic[3], sl[3] = np.inf, np.nan, np.nan
        return th, ic, sl

    monkeypatch.setattr(sct, "fit_poisson_genes", poisoned_fit)
    genes = np.array([f"g{i}" for i in range(70)])
    cells = np.array([f"c{i}" for i in range(250)])
    assay_out, vst_out = sct.sctransform(sp.csr_matrix(counts), genes, cells)
    X = assay_out["scale.data"].to_numpy()
    assert np.isfinite(X).all()
    mp = vst_out["model_pars_fit"][["Intercept", "log_umi"]].to_numpy()
    assert np.isfinite(mp).all()


def test_bw_sj_safe_fallback_on_point_mass():
    """bw_sj raises on (near-)point-mass samples; the safe wrapper must fall
    back to the Silverman rule instead of aborting preprocessing."""
    from spadot_tpu.preprocess.bandwidth import bw_nrd0, bw_sj_safe

    x = np.concatenate([np.full(500, 2.0), [2.001, 1.999]])
    bw = bw_sj_safe(x)
    assert np.isfinite(bw) and bw > 0
    assert bw == pytest.approx(bw_nrd0(x))


def test_svg_pca_sanitizes_nonfinite():
    from spadot_tpu.preprocess.louvain import pca

    rng = np.random.default_rng(0)
    X = rng.normal(size=(50, 20))
    X[3, 4] = np.nan
    X[7, 1] = np.inf
    comps = pca(X, n_comps=5)
    assert np.isfinite(comps).all() and comps.shape == (50, 5)


def test_svg_pca_matches_svd_both_orientations():
    """The Gram-side eigendecomposition must reproduce the SVD scores U·S
    exactly (up to per-component sign — consumers are distance-based) on
    both tall and wide inputs."""
    from spadot_tpu.preprocess.louvain import pca

    rng = np.random.default_rng(7)
    for shape in [(90, 60), (60, 90)]:
        X = rng.normal(size=shape)
        Xc = X - X.mean(0, keepdims=True)
        U, S, _ = np.linalg.svd(Xc, full_matrices=False)
        ref = U[:, :20] * S[:20]
        got = pca(X, n_comps=20)
        sgn = np.sign(np.sum(got * ref, axis=0))
        np.testing.assert_allclose(got * sgn, ref, atol=1e-9)


def test_bw_sj_reasonable(rng):
    x = rng.normal(0, 1, 500)
    bw = bw_sj(x)
    # SJ bandwidth for a standard normal n=500 is around 0.25-0.45
    assert 0.1 < bw < 0.8


def test_ksmooth_recovers_smooth_function(rng):
    x = np.sort(rng.uniform(0, 10, 400))
    y = np.sin(x) + rng.normal(0, 0.1, 400)
    xs, ys = ksmooth_normal(x, y, np.linspace(1, 9, 50), bandwidth=0.5)
    np.testing.assert_allclose(ys, np.sin(xs), atol=0.15)
