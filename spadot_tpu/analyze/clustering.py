"""Domain clustering of the latent space.

Parity with SpaDOT/utils/_analyze_utils.py:10-105: fixed-k KMeans per
timepoint (random_state=1993, n_init=10) and the adaptive elbow variant (WSS
over k=4..20, diffs filtered at 10% of the WSS range, argmax of the
consecutive-diff ratio, elbow plot saved per timepoint). sklearn is the
default backend — it matches the reference bit-for-bit; `--analyze_backend
device` swaps every fit for the accelerator KMeans (ops/kmeans.py), which
turns the 17-fit x n_init=10 elbow sweep from minutes into seconds at
100k+ spots. The elbow-selection arithmetic intentionally
MIRRORS the reference's rule step for step (artifact parity: identical k
choices on identical WSS curves), so this module is fidelity-first, not a
re-design.
"""
import os

import numpy as np
import pandas as pd
from sklearn.cluster import KMeans

from spadot_tpu.io import concat


def _row_bucket(n):
    """Pad row counts to a shared bucket so per-timepoint fits reuse one
    compiled executable (remote-TPU compiles dominate the device backend's
    wall clock, docs/tpu_logs/analyze_atlas_device.log)."""
    step = 8192 if n > 8192 else 256
    return ((n + step - 1) // step) * step


def _fit(X, k, backend, k_max=None):
    """(labels, inertia) for one KMeans fit on the chosen backend.

    backend 'sklearn' (default): bit-for-bit the reference's host fits.
    backend 'device': ops/kmeans.py on the accelerator — the elbow sweep is
    17 fits x n_init=10 on the FULL latent matrix per timepoint, which at
    100k+ spots turns the analyze stage into the pipeline bottleneck on
    host. Same algorithm family (kmeans++ x 10 restarts, best inertia);
    partitions agree on separated data (tests/test_analyze.py), exact label
    order may differ. With ``k_max`` the cluster count is a traced value
    padded to k_max and the rows are bucket-padded under a mask, so the
    whole 17-k sweep (and every timepoint in the same bucket) shares ONE
    compiled executable (ops/kmeans.py:kmeans_fit_padded) — measured 114 s
    -> one compile + sub-second fits at 102k spots.
    """
    if backend == "device":
        import jax

        if k_max is not None:
            import jax.numpy as jnp

            from spadot_tpu.ops.kmeans import kmeans_fit_padded

            n = X.shape[0]
            n_pad = _row_bucket(n)
            Xp = np.zeros((n_pad, X.shape[1]), np.float32)
            Xp[:n] = X
            mask = np.zeros((n_pad,), np.float32)
            mask[:n] = 1.0
            _, labels, inertia = kmeans_fit_padded(
                jax.random.PRNGKey(1993), jnp.asarray(Xp),
                jnp.asarray(int(k), jnp.int32), int(k_max),
                mask=jnp.asarray(mask), n_init=10, n_iter=300,
            )
            return np.asarray(labels)[:n], float(inertia)

        from spadot_tpu.ops.kmeans import kmeans_fit

        centers, labels, inertia = kmeans_fit(
            jax.random.PRNGKey(1993), np.asarray(X, np.float32), int(k),
            n_init=10, n_iter=300,
        )
        return np.asarray(labels), float(inertia)
    km = KMeans(n_clusters=int(k), random_state=1993, n_init=10).fit(X)
    return km.labels_, float(km.inertia_)


def kmeans_clustering(adata, n_clusters, backend="sklearn"):
    tps = sorted(adata.obs["timepoint"].unique().tolist())
    # device backend: pad every timepoint's k to the max so same-bucket
    # timepoints share one compiled executable
    k_max = max(int(k) for k in n_clusters) if backend == "device" else None
    parts = []
    for i, tp in enumerate(tps):
        tp_adata = adata[(adata.obs["timepoint"] == tp).to_numpy()].copy()
        labels, _ = _fit(
            tp_adata.toarray(), int(n_clusters[i]), backend, k_max=k_max
        )
        tp_adata.obs["kmeans"] = labels.astype(str)
        parts.append(tp_adata)
    return concat(parts)


def adaptive_clustering(args, adata, min_clusters=4, max_clusters=20, wss_threshold=0.1,
                        backend=None):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    backend = backend or getattr(args, "analyze_backend", None) or "sklearn"
    tps = sorted(adata.obs["timepoint"].unique().tolist())
    parts = []
    for tp in tps:
        tp_adata = adata[(adata.obs["timepoint"] == tp).to_numpy()].copy()
        X = tp_adata.toarray()
        # device backend: pad k to max_clusters so the whole sweep (and the
        # final fit below) shares one compiled executable
        k_max = max_clusters if backend == "device" else None
        wss = []
        for k in range(min_clusters, max_clusters + 1):
            wss.append(_fit(X, k, backend, k_max=k_max)[1])
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

        labels, _ = _fit(X, wss_cluster, backend, k_max=k_max)
        tp_adata.obs["kmeans"] = labels.astype(str)
        parts.append(tp_adata)
    return concat(parts)
