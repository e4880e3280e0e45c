"""Per-timepoint feature-selection runner: SCTransform -> SPARK-X -> Louvain
SVG clustering -> per-timepoint CSV (parity: _run_sparkx,
SpaDOT/utils/_preprocess_utils.py:82-104)."""
import os

import numpy as np
import scipy.sparse as sp

from spadot_tpu.ops.sparkx import sparkx
from spadot_tpu.preprocess.louvain import cluster_svgs
from spadot_tpu.preprocess.sctransform import sctransform
from spadot_tpu.utils.logging import logger


def run_sparkx(args, adata, tps, option="mixture", num_cores=4):
    del num_cores  # the Imhof p-value batch is vectorized, no pool needed
    tp_values = adata.obs["timepoint"].to_numpy()
    for tp in tps:
        tp_adata = adata[tp_values == tp].copy()
        X = tp_adata.X
        counts = sp.csr_matrix(X) if not sp.issparse(X) else X.tocsr()
        assay_out, vst_out = sctransform(
            counts.T,
            genes=np.asarray(tp_adata.var_names),
            cells=np.asarray(tp_adata.obs_names),
            n_cells=None,
            variable_features_n=None,
            variable_features_rv_th=1.3,
        )
        kept_genes = assay_out["scale.data"].index.to_numpy()
        tp_adata = tp_adata[:, kept_genes].copy()
        logger.info(
            "Timepoint %s: %d cells, %d genes after SCTransform filter",
            tp, tp_adata.n_obs, tp_adata.n_vars,
        )
        svgs = sparkx(
            sp.csr_matrix(tp_adata.X),
            np.asarray(tp_adata.obsm["spatial"]),
            np.asarray(tp_adata.var_names),
            option=option,
        )
        svg_clusters = cluster_svgs(
            assay_out["scale.data"].loc[svgs.index].to_numpy(), k=10
        )
        svgs = svgs.copy()
        svgs["cluster"] = svg_clusters
        svgs.to_csv(
            args.output_dir + os.sep + str(tp) + "_SVG_sparkx_clustered_louvain.csv"
        )
