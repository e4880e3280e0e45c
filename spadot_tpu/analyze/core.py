"""Analyze-stage entry point (parity with SpaDOT/analyze.py:5-26)."""
import os

import numpy as np

from spadot_tpu.io import read_h5ad
from spadot_tpu.utils.logging import logger


def analyze(args):
    from spadot_tpu.utils.platform import select_platform

    select_platform(getattr(args, "device", None), logger)
    data_dir = os.path.abspath(args.data)
    if not getattr(args, "output_dir", None):
        args.output_dir = os.path.dirname(data_dir)
    os.makedirs(args.output_dir, exist_ok=True)
    if getattr(args, "n_clusters", None) is None and args.prefix == "":
        args.prefix = "adaptive_"

    latent = read_h5ad(data_dir)
    from spadot_tpu.analyze.clustering import adaptive_clustering, kmeans_clustering

    backend = getattr(args, "analyze_backend", None) or "sklearn"
    if getattr(args, "n_clusters", None) is None:
        logger.info("Adaptive (elbow) clustering (%s backend)...", backend)
        latent = adaptive_clustering(args, latent, backend=backend)
    else:
        logger.info("KMeans clustering with k=%s...", args.n_clusters)
        latent = kmeans_clustering(latent, args.n_clusters, backend=backend)
    spatial = np.asarray(latent.obsm["spatial"])
    latent.obs["pixel_x"] = spatial[:, 0]
    latent.obs["pixel_y"] = spatial[:, 1]

    from spadot_tpu.analyze.plots import plot_domains, plot_ot
    from spadot_tpu.analyze.transport import ot_analysis

    plot_domains(args, latent)
    logger.info("Optimal-transport analysis...")
    ot_analysis(args, latent)
    plot_ot(args, latent)
    return latent
