"""Preprocess stage on realistic input variants (sparse counts, string tps)."""
import os
from types import SimpleNamespace

import numpy as np
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
