"""Count normalization primitives (scanpy-equivalent semantics, no scanpy).

normalize_total/log1p/scale per the reference calls at
SpaDOT/utils/_preprocess_utils.py:34-35,49: library-size normalization to
target_sum, natural log1p, and per-gene standardization with ddof=1 (scanpy's
_get_mean_var convention; zero-variance genes get std=1).
"""
import numpy as np
import scipy.sparse as sp


def normalize_total(X, target_sum=1e-4):
    """Scale each row to sum to target_sum (rows summing to 0 untouched)."""
    dense = not sp.issparse(X)
    row_sum = np.asarray(X.sum(axis=1)).ravel()
    factor = np.where(row_sum > 0, target_sum / np.maximum(row_sum, 1e-300), 1.0)
    if dense:
        return np.asarray(X) * factor[:, None]
    X = sp.csr_matrix(X, dtype=np.float64, copy=True)
    X.data *= np.repeat(factor, np.diff(X.indptr))
    return X


def log1p(X):
    if sp.issparse(X):
        X = X.copy()
        X.data = np.log1p(X.data)
        return X
    return np.log1p(X)


def scale(X, zero_center=True):
    """Per-column standardization, ddof=1, zero-variance columns -> std 1."""
    X = X.toarray() if sp.issparse(X) else np.asarray(X, dtype=np.float64)
    mean = X.mean(axis=0)
    n = X.shape[0]
    var = X.var(axis=0) * (n / max(n - 1, 1))
    std = np.sqrt(var)
    std[std == 0] = 1.0
    if zero_center:
        X = X - mean
    return X / std
