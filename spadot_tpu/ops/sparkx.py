"""SPARK-X: non-parametric spatial-variability score tests.

Re-implementation of the reference's Python port of R SPARK-X
(SpaDOT/utils/_utils.py:121-251, itself porting archived/Rcode/run_SPARKX.R):
a projection-kernel score test plus (option='mixture') 5 gaussian and 5
cosine location transforms; per-kernel quadratic-form p-values; ACAT
combination across kernels; BY FDR; and the >=500-gene floor.

Structure of the statistic (per kernel): with centered locations
X (n, d) and counts Y (n, G),
    stat_g = n * (E_g' (X'X)^{-1} E_g) / sum_i Y_ig^2,  E_g = Y[:, g]' X
    null: stat_g ~ ylam_g * sum_j klam_j chi^2_1,
    ylam_g = 1 - n * mean_g^2 / sum Y^2,  klam = eigvals((X'X)^{-1} X'X) = 1.
Everything over genes is one (G, n) x (n, d) matmul + vector ops — computed
sparse on host or dense via jnp on the MXU; the p-value batch uses the
vectorized Imhof integrator in ops/stats.py instead of a process pool.
"""
import numpy as np
import pandas as pd
import scipy.sparse as sp

from spadot_tpu.ops.stats import acat_combine_batch, fdr_by, quadform_pvalues
from spadot_tpu.utils.logging import logger


def transform_locations(coord, lker, transfunc="gaussian"):
    """Location transforms (parity: _utils.py:398-414): center columns,
    per-column quantiles of |coord| at 20%..100%, then gaussian/cosine map."""
    coord = coord - np.mean(coord, axis=0)
    probs = np.arange(0.2, 1.01, 0.2)
    l = np.quantile(np.abs(coord), q=probs, axis=0)
    if transfunc == "gaussian":
        return np.exp(-(coord**2) / (2 * l[lker, :][np.newaxis, :] ** 2))
    if transfunc == "cosine":
        return np.cos(2 * np.pi * coord / l[lker, :][np.newaxis, :])
    raise ValueError("transfunc must be 'gaussian' or 'cosine'")


def _sparkx_single_kernel(counts, infomat):
    """Score statistic + p-value per gene for one location kernel
    (parity: _sparkx_sk, _utils.py:223-251)."""
    X = np.asarray(infomat, dtype=np.float64)
    X = X - X.mean(axis=0, keepdims=True)
    n = X.shape[0]
    XtX = X.T @ X
    loc_inv = np.linalg.inv(XtX)
    klam = np.linalg.eigvalsh(XtX @ loc_inv)  # = ones(d) up to fp error

    if sp.issparse(counts):
        EHL = np.asarray((counts.T @ X))
        sumsq = np.asarray(counts.power(2).sum(axis=0)).ravel()
        ybar = np.asarray(counts.mean(axis=0)).ravel()
    else:
        Yd = np.asarray(counts, dtype=np.float64)
        EHL = Yd.T @ X
        sumsq = (Yd**2).sum(axis=0)
        ybar = Yd.mean(axis=0)

    stat = np.einsum("ij,jk,ik->i", EHL, loc_inv, EHL) * n / sumsq
    ylam = 1 - n * ybar**2 / sumsq
    lambdas = ylam[:, None] * np.sort(klam)[::-1][None, :]
    pvals = quadform_pvalues(stat, lambdas)
    return pd.DataFrame({"stat": stat, "pval": pvals})


def sparkx(count, location, genenames, option="mixture"):
    """Full SPARK-X test (parity: _sparkx, _utils.py:121-193).

    Returns a DataFrame indexed by gene with combinedPval / adjustedPval,
    sorted ascending, truncated to max(#significant at 0.05, 500).
    """
    genenames = np.asarray(genenames)
    assert count.shape[1] == len(genenames)

    totalcount = np.asarray(count.sum(axis=1)).ravel()
    keep_cell = totalcount != 0
    count = count[keep_cell, :]
    location = np.asarray(location)[keep_cell, :]
    genecount = np.asarray(count.sum(axis=0)).ravel()
    keep_gene = genecount != 0
    count = count[:, keep_gene]
    genenames = genenames[keep_gene].copy()
    na = pd.isna(genenames)
    if na.any():
        genenames[na] = "NAgene"

    logger.info(
        "SPARK-X input: %d cells x %d genes", count.shape[0], count.shape[1]
    )
    results = [_sparkx_single_kernel(count, location)]
    if option == "mixture":
        for iker in range(5):
            loc_t = transform_locations(location, iker, "gaussian")
            results.append(_sparkx_single_kernel(count, loc_t))
        for iker in range(5):
            loc_t = transform_locations(location, iker, "cosine")
            results.append(_sparkx_single_kernel(count, loc_t))

    allpvals = np.column_stack([r["pval"].to_numpy() for r in results])
    comb = acat_combine_batch(allpvals)
    pBY = fdr_by(comb)
    res = pd.DataFrame(
        {"combinedPval": comb, "adjustedPval": pBY}, index=genenames
    ).sort_values(by="adjustedPval")
    n_sig = int((res["adjustedPval"] <= 0.05).sum())
    n_keep = min(res.shape[0], max(n_sig, 500))
    return res.iloc[:n_keep, :]
