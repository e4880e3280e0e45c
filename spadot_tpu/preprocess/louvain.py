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
    """Top-`n_comps` PCA scores via the smaller-side Gram eigendecomposition.

    Exact (not randomized): the leading eigenvectors of XcᵀXc (or XcXcᵀ,
    whichever side is smaller) span the same principal subspace as the SVD's,
    so the returned scores match `U S` up to per-component sign — and every
    consumer (gauss-kNN distances in `gauss_knn_graph`) is sign-invariant.
    A full `gesdd` SVD of a (3k, 2.5k) float64 residual matrix costs ~28 s
    on one host core for 50 wanted components; the d² gemm + 50-vector
    `syevr` subset costs ~2 s. Falls back to the full eigh when the subset
    driver is unavailable."""
    X = np.asarray(X, dtype=np.float64)
    if not np.isfinite(X).all():
        # a non-finite residual row would abort the whole preprocess run in
        # LAPACK; zero it (the gene still clusters, on no signal) and say so
        logger.warning(
            "SVG PCA input has %d non-finite entries; zeroing them",
            int((~np.isfinite(X)).sum()),
        )
        X = np.nan_to_num(X, nan=0.0, posinf=0.0, neginf=0.0)
    from scipy.linalg import eigh

    Xc = X - X.mean(axis=0, keepdims=True)
    n, d = Xc.shape
    n_comps = min(n_comps, n - 1, d)
    if d <= n:
        G = Xc.T @ Xc  # (d, d)
        try:
            evals, V = eigh(G, subset_by_index=[d - n_comps, d - 1])
        except Exception:
            evals, V = np.linalg.eigh(G)
            evals, V = evals[-n_comps:], V[:, -n_comps:]
        return (Xc @ V[:, ::-1]).astype(np.float64)
    G = Xc @ Xc.T  # (n, n)
    try:
        evals, U = eigh(G, subset_by_index=[n - n_comps, n - 1])
    except Exception:
        evals, U = np.linalg.eigh(G)
        evals, U = evals[-n_comps:], U[:, -n_comps:]
    scores = U * np.sqrt(np.maximum(evals, 0.0))[None, :]
    return scores[:, ::-1].astype(np.float64)


def gauss_knn_affinity(X, n_neighbors=100, n_pcs=30):
    """Adaptive gaussian affinities on the kNN graph (scanpy 'gauss'-style:
    per-point bandwidth from the local neighbor-distance scale), as a
    symmetric scipy CSR matrix.

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
    return A.maximum(A.T)  # undirected, keep the larger directed weight


def gauss_knn_graph(X, n_neighbors=100, n_pcs=30):
    """networkx view of `gauss_knn_affinity` (the slow-backend input)."""
    return nx.from_scipy_sparse_array(gauss_knn_affinity(X, n_neighbors, n_pcs))


def _louvain_backend(backend):
    """Resolve 'auto' to the native C++ library when it builds/loads, else
    networkx. env SPADOT_LOUVAIN={native,networkx} overrides for A/Bs."""
    import os

    backend = os.environ.get("SPADOT_LOUVAIN", backend or "auto")
    if backend == "auto":
        from spadot_tpu.native.louvain_cpu import louvain_available

        return "native" if louvain_available() else "networkx"
    return backend


def cluster_svgs(svg_mat, k=10, seed=1993, backend="auto"):
    """Louvain-cluster genes (rows of svg_mat), raising resolution by 0.1
    until >= k clusters (parity: _cluster_SVGs, _utils.py:195-221).

    backend 'native' runs the C++ Louvain (native/louvain_cpu.cpp, ~100x
    the networkx rung speed, identical partitions on structured graphs —
    tests/test_preprocess.py differential test); 'networkx' keeps the
    pure-Python reference implementation; 'auto' (default) prefers native."""
    comps = pca(svg_mat)
    A = gauss_knn_affinity(comps, n_neighbors=100, n_pcs=30)
    backend = _louvain_backend(backend)
    G = nx.from_scipy_sparse_array(A) if backend == "networkx" else None
    resolution = 1.0
    labels = None
    for _ in range(200):
        if backend == "native":
            from spadot_tpu.native.louvain_cpu import louvain_csr

            raw = louvain_csr(A, resolution=resolution, seed=seed)
            # relabel communities by decreasing size (the networkx path
            # sorts the same way below; keeps CSV cluster ids comparable)
            ids, counts = np.unique(raw, return_counts=True)
            order = ids[np.argsort(-counts, kind="stable")]
            remap = np.empty(order.max() + 1, dtype=np.int64)
            remap[order] = np.arange(len(order))
            labels = remap[raw]
            n_comm = len(ids)
        else:
            communities = nx.community.louvain_communities(
                G, weight="weight", resolution=resolution, seed=seed
            )
            labels = np.empty(svg_mat.shape[0], dtype=np.int64)
            for c_i, members in enumerate(
                sorted(communities, key=lambda c: -len(c))
            ):
                labels[list(members)] = c_i
            n_comm = len(communities)
        if n_comm >= k:
            break
        resolution += 0.1
    logger.info(
        "SVG clustering: %d clusters at resolution %.1f",
        len(set(labels.tolist())), resolution,
    )
    return labels.astype(str)
