"""Domain clustering of the latent space.

Parity with SpaDOT/utils/_analyze_utils.py:10-105: fixed-k KMeans per
timepoint (random_state=1993, n_init=10) and the adaptive elbow variant (WSS
over k=4..20, diffs filtered at 10% of the WSS range, argmax of the
consecutive-diff ratio, elbow plot saved per timepoint). sklearn is used here
deliberately — this is a tiny host-side post-processing stage and sklearn
matches the reference bit-for-bit; the device KMeans (ops/kmeans.py) serves
the in-training refresh loop. The elbow-selection arithmetic intentionally
MIRRORS the reference's rule step for step (artifact parity: identical k
choices on identical WSS curves), so this module is fidelity-first, not a
re-design.
"""
import os

import numpy as np
import pandas as pd
from sklearn.cluster import KMeans

from spadot_tpu.io import concat


def kmeans_clustering(adata, n_clusters):
    tps = sorted(adata.obs["timepoint"].unique().tolist())
    parts = []
    for i, tp in enumerate(tps):
        tp_adata = adata[(adata.obs["timepoint"] == tp).to_numpy()].copy()
        km = KMeans(n_clusters=int(n_clusters[i]), random_state=1993, n_init=10).fit(
            tp_adata.toarray()
        )
        tp_adata.obs["kmeans"] = km.labels_.astype(str)
        parts.append(tp_adata)
    return concat(parts)


def adaptive_clustering(args, adata, min_clusters=4, max_clusters=20, wss_threshold=0.1):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tps = sorted(adata.obs["timepoint"].unique().tolist())
    parts = []
    for tp in tps:
        tp_adata = adata[(adata.obs["timepoint"] == tp).to_numpy()].copy()
        X = tp_adata.toarray()
        wss = []
        for k in range(min_clusters, max_clusters + 1):
            wss.append(KMeans(n_clusters=k, random_state=1993, n_init=10).fit(X).inertia_)
        wss_diff = -np.diff(wss)
        ratios = [wss_diff[i] / wss_diff[i + 1] for i in range(len(wss_diff) - 1)]
        wss_df = pd.DataFrame(
            {
                "clusters": range(min_clusters, max_clusters + 1),
                "wss": wss,
                "wss_diff": [None] + list(wss_diff),
                "wss_diff_ratio": [None] + list(ratios) + [None],
            }
        )
        wss_range = wss_df["wss"].max() - wss_df["wss"].min()
        filtered = wss_df[wss_df["wss_diff"] > wss_threshold * wss_range]
        max_idx = filtered["wss_diff_ratio"].idxmax()
        wss_cluster = int(filtered["clusters"][max_idx])
        highlight = filtered["wss"][max_idx]

        plt.figure(figsize=(10, 6))
        plt.plot(wss_df["clusters"], wss_df["wss"], marker="o")
        plt.scatter(wss_cluster, highlight, color="red", s=100, label="Selected Cluster")
        plt.title("WSS vs Number of Clusters")
        plt.xlabel("Number of Clusters")
        plt.ylabel("WSS")
        plt.xticks(wss_df["clusters"])
        plt.grid()
        plt.savefig(args.output_dir + os.sep + args.prefix + str(tp) + "_WSS_vs_Clusters.png")
        plt.close()

        labels = KMeans(n_clusters=wss_cluster, random_state=1993, n_init=10).fit(X).labels_
        tp_adata.obs["kmeans"] = labels.astype(str)
        parts.append(tp_adata)
    return concat(parts)
