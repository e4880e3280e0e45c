"""Statistical primitives for SPARK-X: quadratic-form tail probabilities
(Davies via Imhof's integral, Liu's moment-matching fallback), the ACAT
Cauchy p-value combination, and Benjamini-Yekutieli FDR adjustment.

The reference depends on the external `chi2comb` package for Davies
(SpaDOT/utils/_utils.py:19,281) and vendors Liu/ACAT ports (_utils.py:290-396);
here everything is self-contained. The Imhof integrand is vectorized over a
whole batch of genes on a shared quadrature grid — replacing the reference's
per-gene multiprocessing.Pool (_utils.py:241-245) — with scipy adaptive
quadrature only for the small minority the grid cannot certify.
"""
import numpy as np
from scipy import integrate
from scipy.stats import cauchy, ncx2


def imhof_tail(q, lambdas):
    """P[Q > q] for Q = sum_i lambda_i chi^2_1, one gene. Imhof (1961)."""
    lambdas = np.asarray(lambdas, dtype=np.float64)

    def integrand(u):
        theta = 0.5 * np.sum(np.arctan(lambdas * u)) - 0.5 * q * u
        rho = np.prod((1.0 + (lambdas * u) ** 2) ** 0.25)
        return np.sin(theta) / (u * rho)

    # finite upper limit: the envelope decays like u^{-1-r/2}, so truncating
    # at u_max = 2e3/max|lambda| leaves a tail < ~1e-6 for r >= 2
    u_max = 2e3 / max(np.abs(lambdas).max(), 1e-300)
    val, _ = integrate.quad(integrand, 1e-12, u_max, limit=500)
    return 0.5 + val / np.pi


def imhof_tail_batch(q, lambdas, n_grid=2000, u_max_factor=200.0):
    """Vectorized Imhof over genes: q (G,), lambdas (G, r) -> P[Q > q] (G,).

    Fixed log-spaced grid in u, trapezoid rule; accuracy ~1e-6 for the
    well-scaled statistics SPARK-X produces (lambdas ~ O(1), q ~ O(1..100)).
    """
    q = np.asarray(q, dtype=np.float64)
    lam = np.asarray(lambdas, dtype=np.float64)
    lam_scale = np.maximum(np.abs(lam).max(axis=1), 1e-300)
    u_hi = u_max_factor / lam_scale
    # per-gene grids: u = t * u_hi with shared t in (0, 1]
    t = np.linspace(1e-8, 1.0, n_grid)
    u = t[None, :] * u_hi[:, None]  # (G, n_grid)
    lu = lam[:, :, None] * u[:, None, :]  # (G, r, n_grid)
    theta = 0.5 * np.arctan(lu).sum(axis=1) - 0.5 * q[:, None] * u
    log_rho = 0.25 * np.log1p(lu**2).sum(axis=1)
    integrand = np.sin(theta) * np.exp(-log_rho) / u
    val = np.trapezoid(integrand, u, axis=1)
    return 0.5 + val / np.pi


def liu_tail(q, lambdas, h=None, delta=None):
    """Liu-Tang-Zhang moment-matched noncentral-chi2 approximation of
    P[Q > q] (port target: _utils.py:290-352, itself from CompQuadForm::liu)."""
    lambdas = np.asarray(lambdas, dtype=np.float64)
    r = len(lambdas)
    h = np.ones(r) if h is None else np.asarray(h)
    delta = np.zeros(r) if delta is None else np.asarray(delta)
    c1 = np.sum(lambdas * h) + np.sum(lambdas * delta)
    c2 = np.sum(lambdas**2 * h) + 2 * np.sum(lambdas**2 * delta)
    c3 = np.sum(lambdas**3 * h) + 3 * np.sum(lambdas**3 * delta)
    c4 = np.sum(lambdas**4 * h) + 4 * np.sum(lambdas**4 * delta)
    s1 = c3 / c2**1.5
    s2 = c4 / c2**2
    muQ = c1
    sigmaQ = np.sqrt(2 * c2)
    tstar = (q - muQ) / sigmaQ
    if s1**2 > s2:
        a = 1 / (s1 - np.sqrt(s1**2 - s2))
        d = s1 * a**3 - a**2
        l = a**2 - 2 * d
    else:
        a = 1 / s1
        d = 0.0
        l = c2**3 / c3**2
    muX = l + d
    sigmaX = np.sqrt(2) * a
    return float(ncx2.sf(tstar * sigmaX + muX, df=l, nc=d))


def quadform_pvalues(stats, lambdas):
    """Tail probabilities for a batch of genes with per-gene weights.

    stats: (G,), lambdas: (G, r). Grid Imhof first; any value outside (0, 1)
    or non-finite falls back to Liu (the reference's exact fallback policy,
    _utils.py:283-287).
    """
    from scipy.stats import chi2

    stats = np.asarray(stats, dtype=np.float64)
    lam = np.asarray(lambdas, dtype=np.float64)
    # exact fast path: equal weights per gene => Q = lam * chi2_r. SPARK-X's
    # kernel eigenvalues are eigvals((X'X)(X'X)^{-1}) = 1 identically, so
    # this path covers the entire pipeline; the quadrature below remains for
    # genuinely unequal weight vectors.
    spread = lam.max(axis=1) - lam.min(axis=1)
    if np.all(spread <= 1e-9 * np.abs(lam).max(axis=1)):
        lam0 = np.maximum(lam[:, 0], 1e-300)
        return np.clip(chi2.sf(stats / lam0, df=lam.shape[1]), 0.0, 1.0)
    p = imhof_tail_batch(stats, lam)
    bad = ~np.isfinite(p) | (p <= 0.0) | (p >= 1.0)
    for i in np.where(bad)[0]:
        p[i] = liu_tail(stats[i], np.sort(lam[i])[::-1])
    return np.clip(p, 0.0, 1.0)


def acat_combine(pvals, weights=None):
    """ACAT Cauchy combination of p-values (port target: _utils.py:354-396)."""
    pvals = np.asarray(pvals, dtype=np.float64)
    if np.any(np.isnan(pvals)):
        raise ValueError("Cannot have NAs in the p-values!")
    if np.any(pvals < 0) or np.any(pvals > 1):
        raise ValueError("P-values must be between 0 and 1!")
    is_zero = np.any(pvals == 0)
    is_one = np.any(pvals == 1)
    if is_zero and is_one:
        raise ValueError("Cannot have both 0 and 1 p-values!")
    if is_zero:
        return 0.0
    if is_one:
        return 1.0
    n = len(pvals)
    if weights is None:
        weights = np.ones(n) / n
    else:
        weights = np.asarray(weights, dtype=np.float64)
        weights = weights / weights.sum()
    small = pvals < 1e-16
    if not np.any(small):
        stat = np.sum(weights * np.tan((0.5 - pvals) * np.pi))
    else:
        # w/p overflows to inf for denormal-range p; the stat>1e15 branch
        # below returns the correct limit (p -> 0), so silence the warning
        with np.errstate(over="ignore", divide="ignore"):
            stat = np.sum(weights[small] / (np.pi * pvals[small]))
        stat += np.sum(weights[~small] * np.tan((0.5 - pvals[~small]) * np.pi))
    if stat > 1e15:
        return float(1 / (stat * np.pi))
    return float(1 - cauchy.cdf(stat))


def acat_combine_batch(pmat):
    """Row-wise ACAT over a (G, n_kernels) p-value matrix. The common case
    (no exact 0/1, nothing below 1e-16) is fully vectorized; edge-case rows
    fall back to the scalar routine."""
    from scipy.stats import cauchy as _cauchy

    pmat = np.asarray(pmat, dtype=np.float64)
    G, n = pmat.shape
    out = np.empty(G)
    easy = np.all((pmat > 1e-16) & (pmat < 1.0), axis=1)
    if easy.any():
        stat = np.mean(np.tan((0.5 - pmat[easy]) * np.pi), axis=1)
        p = np.where(stat > 1e15, 1.0 / (stat * np.pi), 1 - _cauchy.cdf(stat))
        out[easy] = p
    for i in np.where(~easy)[0]:
        out[i] = acat_combine(pmat[i])
    return out


def fdr_by(pvals):
    """Benjamini-Yekutieli adjusted p-values (statsmodels fdr_by equivalent;
    the reference calls multipletests(method='fdr_by'), _utils.py:184)."""
    p = np.asarray(pvals, dtype=np.float64)
    n = len(p)
    order = np.argsort(p)
    ranked = p[order]
    cm = np.sum(1.0 / np.arange(1, n + 1))
    adj = ranked * n * cm / np.arange(1, n + 1)
    adj = np.minimum.accumulate(adj[::-1])[::-1]
    adj = np.clip(adj, 0, 1)
    out = np.empty(n)
    out[order] = adj
    return out
