"""Preprocess stage on realistic input variants (sparse counts, string tps)."""
import os
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from _synthetic import make_synthetic_adata
from spadot_tpu.io import read_h5ad


def test_preprocess_sparse_counts_with_feature_selection(tmp_path):
    from spadot_tpu.preprocess.core import preprocess

    adata = make_synthetic_adata(n_per_tp=150, n_genes=120, n_tp=2, counts=True)
    adata.X = sp.csr_matrix(adata.X)  # real h5ad inputs are usually CSR
    raw = str(tmp_path / "raw.h5ad")
    adata.write_h5ad(raw)
    args = SimpleNamespace(
        data=raw, output_dir=str(tmp_path), prefix="preprocessed_",
        feature_selection=True,
    )
    out = preprocess(args)
    assert np.isfinite(out.toarray()).all()
    assert (tmp_path / "SVG_genes.txt").exists()
    assert (tmp_path / "0_SVG_sparkx_clustered_louvain.csv").exists()
    assert (tmp_path / "preprocessed_raw.h5ad").exists()
    rt = read_h5ad(str(tmp_path / "preprocessed_raw.h5ad"))
    assert rt.shape == out.shape
    assert sp.issparse(rt.layers["counts"])


def test_preprocess_missing_schema_errors(tmp_path):
    from spadot_tpu.preprocess.core import preprocess

    adata = make_synthetic_adata(n_per_tp=30, n_genes=10, n_tp=1, counts=True)
    del adata.obs["timepoint"]
    adata.obs["not_timepoint"] = 0
    raw = str(tmp_path / "bad.h5ad")
    adata.write_h5ad(raw)
    args = SimpleNamespace(data=raw, output_dir=str(tmp_path),
                           prefix="p_", feature_selection=False)
    with pytest.raises(ValueError, match="timepoint"):
        preprocess(args)


def _planted_affinity(n=240, k=3, p_in=0.3, p_out=0.01, seed=0):
    rng = np.random.default_rng(seed)
    blocks = np.repeat(np.arange(k), n // k)
    rows, cols, w = [], [], []
    for i in range(n):
        for j in range(i + 1, n):
            p = p_in if blocks[i] == blocks[j] else p_out
            if rng.uniform() < p:
                rows += [i, j]
                cols += [j, i]
                w += [1.0, 1.0]
    A = sp.coo_matrix((w, (rows, cols)), shape=(n, n)).tocsr()
    return A, blocks


def test_native_louvain_matches_networkx_on_planted_graph():
    """Differential test of the C++ Louvain (native/louvain_cpu.cpp)
    against networkx's implementation: both must recover a planted
    3-community partition exactly, and the native backend must be
    deterministic for a fixed seed."""
    import networkx as nx
    from sklearn.metrics import adjusted_rand_score

    from spadot_tpu.native.louvain_cpu import louvain_available, louvain_csr

    if not louvain_available():
        pytest.skip("native louvain library unavailable (no g++?)")
    A, blocks = _planted_affinity()
    lab = louvain_csr(A, resolution=1.0, seed=1993)
    assert adjusted_rand_score(lab, blocks) == 1.0
    G = nx.from_scipy_sparse_array(A)
    comm = nx.community.louvain_communities(
        G, weight="weight", resolution=1.0, seed=1993
    )
    lab_nx = np.empty(A.shape[0], dtype=np.int64)
    for ci, members in enumerate(comm):
        lab_nx[list(members)] = ci
    assert adjusted_rand_score(lab, lab_nx) == 1.0
    assert np.array_equal(lab, louvain_csr(A, resolution=1.0, seed=1993))


def test_cluster_svgs_backends_agree(monkeypatch):
    """cluster_svgs must reach >= k clusters through the same resolution
    ladder on both backends, with size-ordered labels ('0' largest)."""
    from spadot_tpu.native.louvain_cpu import louvain_available
    from spadot_tpu.preprocess.louvain import cluster_svgs

    if not louvain_available():
        pytest.skip("native louvain library unavailable (no g++?)")
    monkeypatch.delenv("SPADOT_LOUVAIN", raising=False)
    rng = np.random.default_rng(3)
    grp = rng.integers(0, 12, 300)
    factors = rng.normal(size=(12, 80))
    mat = factors[grp] * 1.5 + rng.normal(size=(300, 80))
    for backend in ("native", "networkx"):
        labels = cluster_svgs(mat, k=10, backend=backend)
        counts = pd.Series(labels).value_counts()
        assert len(counts) >= 10
        # labels are strings of ints ordered by decreasing community size
        assert counts.index[0] == "0"
