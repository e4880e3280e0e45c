"""Preprocess-stage entry point + SVG union logic.

Parity with SpaDOT/preprocess.py:10-31 and
SpaDOT/utils/_preprocess_utils.py:11-104: schema validation, optional
per-timepoint SPARK-X feature selection (SCTransform -> SPARK-X -> Louvain
clustering of SVGs -> per-timepoint CSV), the cross-timepoint SVG union rule
(smallest timepoint contributes its full list; every other timepoint
contributes its top max(100, round(min_len/n_clusters)) genes per SVG
cluster by adjusted p-value), then per-timepoint normalize_total(1e-4) +
log1p, gene-union subsetting, per-timepoint scaling, and concatenation.
"""
import os
import random

import numpy as np
import pandas as pd
import scipy.sparse as sp

from spadot_tpu.io import concat, read_h5ad
from spadot_tpu.preprocess.norm import log1p, normalize_total, scale
from spadot_tpu.utils.logging import logger

SEED = 1993


def preprocess(args):
    """Preprocess the data for SpaDOT model training."""
    # seed at ENTRY, not import (reference seeds at module import,
    # preprocess.py:7-8 — a global side effect we deliberately avoid)
    random.seed(SEED)
    np.random.seed(SEED)
    data_dir = os.path.abspath(args.data)
    if not getattr(args, "output_dir", None):
        args.output_dir = os.path.dirname(data_dir)
    os.makedirs(args.output_dir, exist_ok=True)

    adata = read_h5ad(data_dir)
    # schema validation (preprocess.py:22-28)
    if "timepoint" not in adata.obs.columns:
        raise ValueError(
            "The `timepoint` column is not found in adata.obs. Please make sure "
            "timepoint information is given."
        )
    if "spatial" not in adata.obsm:
        raise ValueError(
            "The `spatial` key is not found in adata.obsm. Please make sure "
            "spatial coordinates are provided."
        )
    spatial = np.asarray(adata.obsm["spatial"])
    if spatial.ndim != 2:
        raise ValueError(
            "The `spatial` key in adata.obsm is not a 2D numpy array. Please make "
            "sure spatial coordinates are correctly provided."
        )
    # count sanity (the normalization pipeline assumes non-negative counts;
    # log1p of negatives silently produces NaNs)
    Xmin = adata.X.min() if not sp.issparse(adata.X) else adata.X.data.min() if adata.X.nnz else 0
    if Xmin < 0:
        logger.warning(
            "adata.X contains negative values — preprocess expects raw counts; "
            "normalization/log1p will produce NaNs for negative entries."
        )
    preprocessed = preprocess_adata(args, adata)
    preprocessed.write_h5ad(
        os.path.join(args.output_dir, args.prefix + os.path.basename(data_dir))
    )
    return preprocessed


def preprocess_adata(args, adata):
    tps = adata.obs["timepoint"].unique()
    if getattr(args, "feature_selection", True):
        from spadot_tpu.preprocess.sparkx_runner import run_sparkx

        run_sparkx(args, adata, tps, option="mixture", num_cores=4)
        svgs = get_svgs(args, tps)
        adata = adata[:, np.asarray(svgs)].copy()
    # stash raw counts (preprocess_utils.py:26-29)
    if not sp.issparse(adata.X):
        adata.layers["counts"] = sp.csr_matrix(adata.X)
    else:
        adata.layers["counts"] = adata.X

    tp_values = adata.obs["timepoint"].to_numpy()
    tp_adata_list = []
    for tp in tps:
        tp_adata = adata[tp_values == tp].copy()
        tp_adata.X = log1p(normalize_total(tp_adata.X, target_sum=1e-4))
        tp_adata_list.append(tp_adata)

    if getattr(args, "feature_selection", True):
        genes = sorted(set().union(*(set(a.var_names) for a in tp_adata_list)))
        with open(args.output_dir + os.sep + "SVG_genes.txt", "w") as f:
            for item in genes:
                f.write("%s\n" % item)
    new_list = []
    for tp_adata in tp_adata_list:
        if getattr(args, "feature_selection", True):
            tp_adata = tp_adata[:, np.asarray(genes)].copy()
        tp_adata.X = scale(tp_adata.X)
        new_list.append(tp_adata)
    return concat(new_list)


def get_svgs(args, tps):
    """Cross-timepoint SVG union rule (_preprocess_utils.py:55-79)."""
    tp_SVGs = []
    for tp in tps:
        df = pd.read_csv(
            args.output_dir + os.sep + str(tp) + "_SVG_sparkx_clustered_louvain.csv",
            header=0, index_col=0,
        )
        tp_SVGs.append(df)
    min_idx = min(range(len(tp_SVGs)), key=lambda i: len(tp_SVGs[i]))
    min_len = len(tp_SVGs[min_idx])
    svg_genes = tp_SVGs[min_idx].index.tolist()
    for idx, tp_SVG in enumerate(tp_SVGs):
        if idx == min_idx:
            continue
        n_clusters = len(set(tp_SVG["cluster"]))
        top = (
            tp_SVG.sort_values(by="adjustedPval", ascending=True)
            .groupby("cluster")
            .head(max(100, round(min_len / n_clusters)))
        )
        svg_genes.extend(top.index.tolist())
    svg_genes = sorted(set(svg_genes))
    return svg_genes
