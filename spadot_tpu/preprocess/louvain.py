"""SVG clustering: PCA -> gaussian-kernel kNN graph -> Louvain.

Replaces the scanpy pca/neighbors(method='gauss')/louvain chain of the
reference (SpaDOT/utils/_utils.py:195-221) without scanpy/igraph: PCA via a
centered SVD, an adaptive gaussian kNN affinity (sigma_i = distance to the
k-th neighbor, symmetrized), and networkx's Louvain implementation with the
reference's resolution ladder (start 1.0, +0.1 until >= k clusters).
"""
import numpy as np
import networkx as nx
from sklearn.neighbors import NearestNeighbors

from spadot_tpu.utils.logging import logger


def pca(X, n_comps=50):
    X = np.asarray(X, dtype=np.float64)
    if not np.isfinite(X).all():
        # a non-finite residual row would abort the whole preprocess run in
        # LAPACK; zero it (the gene still clusters, on no signal) and say so
        logger.warning(
            "SVG PCA input has %d non-finite entries; zeroing them",
            int((~np.isfinite(X)).sum()),
        )
        X = np.nan_to_num(X, nan=0.0, posinf=0.0, neginf=0.0)
    Xc = X - X.mean(axis=0, keepdims=True)
    n_comps = min(n_comps, min(Xc.shape) - 1)
    try:
        U, S, Vt = np.linalg.svd(Xc, full_matrices=False)
    except np.linalg.LinAlgError:
        # rare LAPACK non-convergence: the (smaller-side) Gram eigendecomp
        # is more robust; recover row scores as Xc V = U S directly
        evals, V = np.linalg.eigh(Xc.T @ Xc)
        order = np.argsort(evals)[::-1][:n_comps]
        return (Xc @ V[:, order]).astype(np.float64)
    return (U[:, :n_comps] * S[:n_comps]).astype(np.float64)


def gauss_knn_graph(X, n_neighbors=100, n_pcs=30):
    """Adaptive gaussian affinities on the kNN graph (scanpy 'gauss'-style:
    per-point bandwidth from the local neighbor-distance scale).

    Built vectorized: weights computed as numpy arrays, symmetrized by
    elementwise max through one scipy sparse pass (a python edge loop here
    cost ~1 min per timepoint at 3k genes x 100 neighbors)."""
    import scipy.sparse as sp

    Xp = X[:, : min(n_pcs, X.shape[1])]
    n = Xp.shape[0]
    k = min(n_neighbors, n - 1)
    nbrs = NearestNeighbors(n_neighbors=k + 1).fit(Xp)
    dist, idx = nbrs.kneighbors(Xp)
    dist, idx = dist[:, 1:], idx[:, 1:]
    sigma = np.maximum(dist[:, -1] / 2.0, 1e-12)
    rows = np.repeat(np.arange(n), k)
    cols = idx.ravel()
    w = np.exp(-(dist.ravel() ** 2) / (2.0 * sigma[rows] * sigma[cols]))
    A = sp.coo_matrix((w, (rows, cols)), shape=(n, n)).tocsr()
    A = A.maximum(A.T)  # undirected, keep the larger directed weight
    return nx.from_scipy_sparse_array(A)


def cluster_svgs(svg_mat, k=10, seed=1993):
    """Louvain-cluster genes (rows of svg_mat), raising resolution by 0.1
    until >= k clusters (parity: _cluster_SVGs, _utils.py:195-221)."""
    comps = pca(svg_mat)
    G = gauss_knn_graph(comps, n_neighbors=100, n_pcs=30)
    resolution = 1.0
    labels = None
    for _ in range(200):
        communities = nx.community.louvain_communities(
            G, weight="weight", resolution=resolution, seed=seed
        )
        labels = np.empty(svg_mat.shape[0], dtype=np.int64)
        for c_i, members in enumerate(
            sorted(communities, key=lambda c: -len(c))
        ):
            labels[list(members)] = c_i
        if len(communities) >= k:
            break
        resolution += 0.1
    logger.info(
        "SVG clustering: %d clusters at resolution %.1f",
        len(set(labels.tolist())), resolution,
    )
    return labels.astype(str)
