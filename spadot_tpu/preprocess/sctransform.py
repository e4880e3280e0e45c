"""SCTransform: regularized negative-binomial normalization of UMI counts.

Capability parity with the reference's vendored Stereopy port
(SpaDOT/utils/sctransform/: vst.py:26-224, sctransform_utils.py:65-197,
sctransform.py:12-198) as called by the preprocess stage
(_preprocess_utils.py:88-93: n_cells=None -> all cells,
variable_features_n=None with rv threshold 1.3, return_only_var_genes=False).

Pipeline: per-gene quasi-Poisson GLM of counts on log10(cell UMI) -> NB theta
MLE given the fitted means -> kernel-smoothed regularization of (intercept,
slope, od-factor) across the gene gmean axis (Sheather-Jones bandwidth x 3,
binned robust-z outlier removal) -> Pearson residuals with double clipping
(+-sqrt(n), then +-sqrt(n/30)) -> row centering.

TPU-native core: the reference fits each gene with a numba/joblib-threaded
Newton loop (sctransform_utils.py:89-166). Here the IRLS Newton iteration and
the theta score/info iteration are closed-form 2x2 solves vmapped over genes
in JAX — thousands of independent GLMs per MXU-friendly batched step —
processed in gene chunks to bound memory. Host numpy handles only the tiny
regularization smoothers.
"""

import numpy as np
import pandas as pd
import scipy.sparse as sp

from spadot_tpu.preprocess.bandwidth import bw_sj, bw_sj_safe, ksmooth_normal
from spadot_tpu.utils.logging import logger

MIN_THETA = 1e-7


# ---------------------------------------------------------------------------
# vmapped GLM fits (JAX)
# ---------------------------------------------------------------------------

def _jax_fit_chunk(y_chunk, log_umi, n_newton=60, n_theta=10):
    """Fit y ~ log_umi quasi-Poisson per gene + NB theta ML.

    y_chunk: (Gc, n) float32/float64 dense counts; log_umi: (n,).
    Returns (theta (Gc,), intercept (Gc,), slope (Gc,)).
    """
    import jax
    import jax.numpy as jnp
    from jax.scipy.special import digamma, polygamma

    x = log_umi
    n = x.shape[0]
    # convergence threshold must be representable in the compute dtype: the
    # reference's 1e-9 (float64 numpy) is below float32 resolution and would
    # burn the full iteration budget without converging
    tol = 1e-9 if y_chunk.dtype == jnp.float64 else 2e-6

    def fit_one(y):
        b0 = jnp.log(jnp.maximum(jnp.mean(y), 1e-12))
        b = jnp.array([b0, 0.0], y.dtype)

        def newton(state):
            b, diff, it = state
            eta = jnp.clip(b[0] + b[1] * x, -708.0, 709.0)
            m = jnp.exp(eta)
            r = y - m
            L1 = jnp.array([jnp.sum(r), jnp.sum(r * x)])
            s0 = jnp.sum(m)
            s1 = jnp.sum(m * x)
            s2 = jnp.sum(m * x * x)
            det = s0 * s2 - s1 * s1
            step = jnp.array(
                [(s2 * L1[0] - s1 * L1[1]) / det, (-s1 * L1[0] + s0 * L1[1]) / det]
            )
            b_new = b + step
            return b_new, jnp.sum(jnp.abs(step)), it + 1

        def cond(state):
            _, diff, it = state
            return jnp.logical_and(diff > tol, it < n_newton)

        b, _, _ = jax.lax.while_loop(cond, newton, (b, jnp.inf, 0))
        mu = jnp.exp(jnp.clip(b[0] + b[1] * x, -708.0, 709.0))

        # theta.ml (sctransform_utils.py:152-166): Newton on the NB theta score
        t0 = n / jnp.sum((y / mu - 1.0) ** 2)

        def theta_step(state):
            t, delta, it = state
            t = jnp.abs(t)
            a = t + y
            bb = t + mu
            score = jnp.sum(
                digamma(a) - digamma(t) + jnp.log(t) + 1.0 - jnp.log(bb) - a / bb
            )
            info = jnp.sum(
                -polygamma(1, a) + polygamma(1, t) - 1.0 / t + 2.0 / bb - a / bb**2
            )
            delta = score / info
            return t + delta, delta, it + 1

        def theta_cond(state):
            _, delta, it = state
            return jnp.logical_and(jnp.abs(delta) > 1.220703e-4, it < n_theta)

        t0, _, _ = jax.lax.while_loop(theta_cond, theta_step, (t0, jnp.inf, 1))
        t0 = jnp.maximum(t0, 0.0)
        return t0, b[0], b[1]

    return jax.jit(jax.vmap(fit_one))(y_chunk)


def fit_poisson_genes(umi, log_umi, chunk=2048, dtype=np.float64):
    """Per-gene GLM fits over all genes. umi: (G, n) sparse/dense."""
    import jax.numpy as jnp

    G = umi.shape[0]
    thetas = np.empty(G)
    intercepts = np.empty(G)
    slopes = np.empty(G)
    lx = jnp.asarray(np.asarray(log_umi, dtype=dtype))
    for s in range(0, G, chunk):
        block = umi[s : s + chunk]
        block = block.toarray() if sp.issparse(block) else np.asarray(block)
        t, b0, b1 = _jax_fit_chunk(jnp.asarray(block.astype(dtype)), lx)
        thetas[s : s + chunk] = np.asarray(t)
        intercepts[s : s + chunk] = np.asarray(b0)
        slopes[s : s + chunk] = np.asarray(b1)
    return thetas, intercepts, slopes


# ---------------------------------------------------------------------------
# regularization helpers (host)
# ---------------------------------------------------------------------------

def _robust_scale_binned(y, x, breaks):
    """Robust z within bins of x (sctransform_utils.py:190-222 semantics).

    NaN-tolerant: a non-finite fit in one bin must not NaN the whole bin's
    median/MAD (one poisoned z row would then unflag every gene in the bin)."""
    z = np.zeros(len(y))
    which = np.digitize(x, breaks)
    eps = 2.220446e-16
    for b in np.unique(which):
        rows = which == b
        vals = y[rows]
        med = np.nanmedian(vals)
        mad = np.nanmedian(np.abs(vals - med)) * 1.4826
        z[rows] = (vals - med) / (mad + eps)
    return z


def is_outlier_param(y, x, th=10.0):
    eps = 2.220446e-16 * 10
    bw = bw_sj(x)
    bin_width = (x.max() - x.min()) * bw / 2.0
    breaks1 = np.arange(x.min() - eps, x.max() + bin_width, bin_width)
    breaks2 = np.arange(x.min() - eps - bin_width / 2.0, x.max() + bin_width, bin_width)
    s1 = np.abs(_robust_scale_binned(y, x, breaks1))
    s2 = np.abs(_robust_scale_binned(y, x, breaks2))
    # a non-finite parameter is always an outlier: one NaN surviving into the
    # ksmooth numerator poisons the regularized params of EVERY gene within
    # kernel support (observed at MouseOrganogenesis scale, where a
    # near-constant cell-UMI profile made one GLM fit diverge)
    return (np.minimum(s1, s2) > th) | ~np.isfinite(y)


def _density_sampling_probs(vals):
    from scipy.stats import gaussian_kde

    kde = gaussian_kde(vals, bw_method="silverman")
    dens = kde(vals)
    prob = 1.0 / (dens + np.finfo(float).eps)
    return prob / prob.sum()


def _row_log_gmean(umi, eps=1.0):
    """log10 of the per-gene geometric mean: exp(mean(log(x+eps))) - eps."""
    if sp.issparse(umi):
        umi = umi.tocsr()
        n = umi.shape[1]
        logsum = np.zeros(umi.shape[0])
        logdata = np.log(umi.data + eps)
        for i in range(umi.shape[0]):
            logsum[i] = logdata[umi.indptr[i] : umi.indptr[i + 1]].sum()
        gmean = np.exp(logsum / n) - eps
    else:
        gmean = np.exp(np.log(np.asarray(umi) + eps).mean(axis=1)) - eps
    return np.log10(np.maximum(gmean, 1e-300))


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------

def sctransform(
    umi, genes, cells, *, n_cells=None, n_genes=2000, min_cells=5,
    variable_features_n=None, variable_features_rv_th=1.3,
    bw_adjust=3.0, seed=1448145, do_correct_umi=True, chunk=2048,
):
    """Run SCTransform. umi: (G, n) sparse counts (genes x cells).

    Returns (assay_out, vst_out): assay_out['scale.data'] is the centered,
    clipped Pearson-residual DataFrame (genes x cells); vst_out carries the
    model parameters, gene attributes and top_features.
    """
    rng = np.random.RandomState(seed)
    umi = sp.csr_matrix(umi, dtype=np.float64)
    genes = np.asarray(genes)
    cells = np.asarray(cells)
    n = umi.shape[1]
    clip_lo, clip_hi = -np.sqrt(n / 30.0), np.sqrt(n / 30.0)
    res_clip = np.sqrt(n)

    cell_umi = np.asarray(umi.sum(axis=0)).ravel()
    log_umi = np.log10(np.maximum(cell_umi, 1e-300))

    # gene filter: detected in >= min_cells cells (vst.py:69-73)
    det = np.asarray((umi >= 0.01).sum(axis=1)).ravel()
    keep = det >= min_cells
    umi = umi[keep]
    genes = genes[keep]
    G = umi.shape[0]
    log_gmean = _row_log_gmean(umi)

    # step-1 gene subsample for model fitting (vst.py:108-125)
    if n_genes and n_genes < G:
        prob = _density_sampling_probs(log_gmean)
        step1_idx = np.sort(
            rng.choice(G, size=n_genes, replace=False, p=prob)
        )
    else:
        step1_idx = np.arange(G)
    log_gmean_s1 = log_gmean[step1_idx]

    logger.info("SCTransform: fitting %d gene GLMs (of %d genes, %d cells)",
                len(step1_idx), G, n)
    thetas, intercepts, slopes = fit_poisson_genes(
        umi[step1_idx], log_umi, chunk=chunk
    )
    # drop genes whose Newton/theta iteration diverged (non-finite fits):
    # they carry no usable signal for the regularization and a single NaN
    # would spread through the kernel smoother to all genes
    finite = (
        np.isfinite(thetas) & np.isfinite(intercepts) & np.isfinite(slopes)
    )
    if not finite.all():
        logger.info(
            "SCTransform: dropping %d/%d non-finite GLM fits before "
            "regularization", int((~finite).sum()), len(finite),
        )
        step1_idx = step1_idx[finite]
        thetas, intercepts, slopes = (
            thetas[finite], intercepts[finite], slopes[finite],
        )
        log_gmean_s1 = log_gmean[step1_idx]
    thetas = np.maximum(thetas, MIN_THETA)

    # regularization (vst.py:245-325): od_factor parameterization
    disp_par = np.log10(1.0 + 10.0**log_gmean_s1 / thetas)
    params = np.stack([intercepts, slopes, disp_par], axis=1)

    out_flags = np.zeros(len(step1_idx), dtype=bool)
    for c in range(3):
        try:
            out_flags |= is_outlier_param(params[:, c], log_gmean_s1)
        except ValueError:
            pass
    keep_s1 = ~out_flags
    params_kept = params[keep_s1]
    gmean_kept = log_gmean_s1[keep_s1]

    x_points = np.clip(log_gmean, gmean_kept.min(), gmean_kept.max())
    order = np.argsort(x_points, kind="stable")
    inv_order = np.empty_like(order)
    inv_order[order] = np.arange(len(order))

    bw = bw_sj_safe(gmean_kept) * bw_adjust
    fitted = np.empty((G, 3))
    for c in range(3):
        _, smoothed = ksmooth_normal(
            gmean_kept, params_kept[:, c], x_points[order], bw
        )
        fitted[:, c] = smoothed[inv_order]
    int_fit, slope_fit, disp_fit = fitted[:, 0], fitted[:, 1], fitted[:, 2]
    od = 10.0**disp_fit - 1.0
    theta_fit = np.where(od > 0, 10.0**log_gmean / np.maximum(od, 1e-300), np.inf)

    # Pearson residuals in gene chunks (vst.py:169-181)
    res = np.empty((G, n))
    for s in range(0, G, chunk):
        block = umi[s : s + chunk].toarray()
        mu = np.exp(int_fit[s : s + chunk, None] + slope_fit[s : s + chunk, None] * log_umi[None, :])
        var = mu + mu**2 / theta_fit[s : s + chunk, None]
        res[s : s + chunk] = (block - mu) / np.sqrt(var)
    np.clip(res, -res_clip, res_clip, out=res)

    gene_attr = pd.DataFrame(index=genes)
    gene_attr["gmean"] = 10.0**log_gmean
    gene_attr["residual_mean"] = res.mean(axis=1)
    gene_attr["residual_variance"] = res.var(axis=1, ddof=1)
    rv = gene_attr["residual_variance"].sort_values(ascending=False)
    if variable_features_n:
        top_features = rv.index.values[: min(variable_features_n, len(rv))]
    else:
        top_features = rv[rv >= variable_features_rv_th].index.values

    # final clip + row centering (sctransform.py:173-198, scale_data.py:6-43)
    np.clip(res, clip_lo, clip_hi, out=res)
    res = res - res.mean(axis=1, keepdims=True)
    scale_data = pd.DataFrame(res, index=genes, columns=cells)

    umi_corrected = None
    if do_correct_umi:
        med = np.median(log_umi)
        corr = np.empty((G, n))
        for s in range(0, G, chunk):
            mu = np.exp(int_fit[s : s + chunk, None] + slope_fit[s : s + chunk, None] * med)
            mu = np.broadcast_to(mu, (min(chunk, G - s), n))
            var = mu + mu**2 / theta_fit[s : s + chunk, None]
            corr[s : s + chunk] = mu + res[s : s + chunk] * np.sqrt(var)
        corr = np.round(corr)
        corr[corr < 0] = 0
        umi_corrected = sp.csr_matrix(corr)

    vst_out = {
        "model_pars_fit": pd.DataFrame(
            {"Intercept": int_fit, "log_umi": slope_fit, "theta": theta_fit},
            index=genes,
        ),
        "gene_attr": gene_attr,
        "top_features": top_features,
        "umi_corrected": umi_corrected,
        "genes": genes,
        "cells": cells,
    }
    assay_out = {
        "counts": umi_corrected if do_correct_umi else umi,
        "data": None,
        "scale.data": scale_data,
    }
    return assay_out, vst_out
