"""Sheather-Jones solve-the-equation bandwidth + kernel smoothing.

Implements the public R algorithms the reference pipeline depends on
(reference vendored ports: SpaDOT/utils/sctransform/bw.py:8-53 `bwSJ`,
ksmooth.py:5-56 `ksmooth` — both ports of R's bandwidths.c / ksmooth.c).
Re-implemented here vectorized: the binned pair-count histogram is one
np.bincount over the pairwise bin-distance matrix and the phi4/phi6 kernel
sums are single vector expressions, replacing the reference's O(nb) Python
loops.
"""
import numpy as np
from scipy import optimize

_DELTA_MAX = 1000.0


def _pair_bin_counts(x, nb=1000):
    """Histogram of pairwise bin distances (R's band_den_bin)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    rang = (x.max() - x.min()) * 1.01
    dd = rang / nb
    ii = (x / dd).astype(np.int64)
    diff = np.abs(ii[:, None] - ii[None, :])
    cnt = np.bincount(diff[np.triu_indices(n, k=1)], minlength=nb).astype(np.float64)
    return dd, cnt[:nb]


def _phi4(n, d, cnt, h):
    i = np.arange(len(cnt), dtype=np.float64)
    delta = (i * d / h) ** 2
    keep = delta < _DELTA_MAX
    term = np.exp(-delta[keep] / 2) * (delta[keep] ** 2 - 6 * delta[keep] + 3)
    s = 2 * np.sum(term * cnt[keep]) + n * 3
    return s / (n * (n - 1) * h**5 * np.sqrt(2 * np.pi))


def _phi6(n, d, cnt, h):
    i = np.arange(len(cnt), dtype=np.float64)
    delta = (i * d / h) ** 2
    keep = delta < _DELTA_MAX
    dk = delta[keep]
    term = np.exp(-dk / 2) * (dk**3 - 15 * dk**2 + 45 * dk - 15)
    s = 2 * np.sum(term * cnt[keep]) - 15 * n
    return s / (n * (n - 1) * h**7 * np.sqrt(2 * np.pi))


def bw_sj(x, nb=1000):
    """Sheather-Jones (ste) bandwidth of a 1-D sample."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    d, cnt = _pair_bin_counts(x, nb)
    q75, q25 = np.percentile(x, [75, 25])
    scale = min(np.std(x, ddof=1), (q75 - q25) / 1.349)
    if scale <= 0:
        raise ValueError("bw_sj: sample has zero spread")
    a = 1.24 * scale * n ** (-1 / 7)
    b = 1.23 * scale * n ** (-1 / 9)
    c1 = 1 / (2 * np.sqrt(np.pi) * n)
    TD = -_phi6(n, d, cnt, b)
    if not np.isfinite(TD) or TD <= 0:
        raise ValueError("bw_sj: inadmissible TD estimate")
    hmax = 1.144 * scale * n ** (-1 / 5)
    lower, upper = 0.1 * hmax, hmax
    alph2 = 1.357 * (_phi4(n, d, cnt, a) / TD) ** (1 / 7)

    def fSD(h):
        return (c1 / _phi4(n, d, cnt, alph2 * h ** (5 / 7))) ** (1 / 5) - h

    itry = 1
    while fSD(lower) * fSD(upper) > 0:
        if itry > 99:
            raise ValueError("bw_sj: no sign change found")
        if itry % 2:
            upper *= 1.2
        else:
            lower /= 1.2
        itry += 1
    return optimize.brentq(fSD, lower, upper, xtol=0.1 * lower)


def bw_nrd0(x):
    """R's bw.nrd0 (Silverman rule-of-thumb) — the robust fallback when the
    solve-the-equation estimate is inadmissible (near-point-mass samples)."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    sd = np.std(x, ddof=1) if n > 1 else 0.0
    q75, q25 = np.percentile(x, [75, 25])
    lo = min(sd, (q75 - q25) / 1.349)
    if lo <= 0:
        lo = sd if sd > 0 else (abs(x[0]) if abs(x[0]) > 0 else 1.0)
    return 0.9 * lo * n ** (-0.2)


def bw_sj_safe(x, nb=1000):
    """bw_sj with the bw.nrd0 fallback on inadmissible samples."""
    try:
        return bw_sj(x, nb)
    except ValueError:
        return bw_nrd0(x)


def ksmooth_normal(x, y, x_eval, bandwidth):
    """Nadaraya-Watson smoother with the R 'normal' kernel convention:
    effective sd = bandwidth * 0.3706506, support cutoff 4*bandwidth."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x_eval = np.sort(np.asarray(x_eval, dtype=np.float64))
    bw = bandwidth * 0.3706506
    cutoff = 4 * bandwidth * 0.3706506
    out = np.zeros(len(x_eval))
    # chunk the (n_eval, n) weight matrix to bound memory
    chunk = max(1, int(5e7 // max(len(x), 1)))
    for s in range(0, len(x_eval), chunk):
        xe = x_eval[s : s + chunk]
        dist = np.abs(xe[:, None] - x[None, :])
        w = np.where(dist <= cutoff, np.exp(-0.5 * (dist / bw) ** 2), 0.0)
        den = w.sum(axis=1)
        num = w @ y
        out[s : s + chunk] = np.where(den > 0, num / np.maximum(den, 1e-300), 0.0)
    return x_eval, out
