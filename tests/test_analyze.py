"""Analyze stage: clustering, transport analysis, plots, artifact contract."""
import os
from types import SimpleNamespace

import numpy as np
import pandas as pd
import pytest

from spadot_tpu.io import AnnData, read_h5ad


def _latent_adata(rng, n_per_tp=90, z=8, n_tp=2, k=3):
    """Synthetic latent space with k well-separated clusters per timepoint."""
    Xs, tps, clusters, coords = [], [], [], []
    for t in range(n_tp):
        centers = rng.normal(0, 8, size=(k, z))
        lab = rng.integers(0, k, n_per_tp)
        Xs.append(centers[lab] + rng.normal(0, 0.4, size=(n_per_tp, z)))
        tps.extend([t] * n_per_tp)
        clusters.append(lab)
        coords.append(rng.uniform(0, 10, size=(n_per_tp, 2)))
    obs = pd.DataFrame({"timepoint": tps, "true": np.concatenate(clusters)})
    obs.index = [f"c{i}" for i in range(len(tps))]
    return AnnData(np.vstack(Xs), obs=obs, obsm={"spatial": np.vstack(coords)})


def test_kmeans_clustering_recovers_clusters(rng):
    from sklearn.metrics import adjusted_rand_score

    from spadot_tpu.analyze.clustering import kmeans_clustering

    ad = _latent_adata(rng)
    out = kmeans_clustering(ad, [3, 3])
    assert "kmeans" in out.obs.columns
    for tp in (0, 1):
        rows = (out.obs["timepoint"] == tp).to_numpy()
        ari = adjusted_rand_score(
            out.obs["true"].to_numpy()[rows], out.obs["kmeans"].to_numpy()[rows]
        )
        assert ari > 0.95


def test_adaptive_clustering_selects_k(rng, tmp_path):
    from spadot_tpu.analyze.clustering import adaptive_clustering

    ad = _latent_adata(rng, k=5)
    args = SimpleNamespace(output_dir=str(tmp_path), prefix="adaptive_")
    out = adaptive_clustering(args, ad)
    # elbow should land near the true k=5 on well-separated data
    for tp in (0, 1):
        rows = (out.obs["timepoint"] == tp).to_numpy()
        n_found = len(set(out.obs["kmeans"].to_numpy()[rows]))
        assert 4 <= n_found <= 7
    assert (tmp_path / "adaptive_0_WSS_vs_Clusters.png").exists()


def test_full_analyze_artifacts(rng, tmp_path):
    from spadot_tpu.analyze.core import analyze

    ad = _latent_adata(rng)
    path = str(tmp_path / "latent.h5ad")
    ad.write_h5ad(path)
    args = SimpleNamespace(
        data=path, output_dir=str(tmp_path), prefix="", n_clusters=[3, 3]
    )
    analyze(args)
    for name in (
        "0_domains.png", "1_domains.png",
        "transition_table_0_1.h5ad", "transition_dotplot_0_1.png",
    ):
        assert (tmp_path / name).exists(), name
    tt = read_h5ad(str(tmp_path / "transition_table_0_1.h5ad"))
    assert tt.shape == (3, 3)
    X = tt.toarray()
    assert np.isfinite(X).all() and (X >= 0).all() and X.sum() > 0
    assert (tmp_path / "OT").is_dir()
    gfiles = os.listdir(tmp_path / "OT")
    assert any(f.startswith("growth_rates") for f in gfiles)


def test_load_tmap_roundtrip(rng, tmp_path):
    from spadot_tpu.analyze.core import analyze
    from spadot_tpu.analyze.transport import load_tmap

    ad = _latent_adata(rng, n_per_tp=40)
    path = str(tmp_path / "latent.h5ad")
    ad.write_h5ad(path)
    analyze(SimpleNamespace(data=path, output_dir=str(tmp_path), prefix="",
                            n_clusters=[3, 3]))
    tmap = load_tmap(str(tmp_path / "OT"), 0, 1)
    assert tmap.shape == (40, 40)
    with pytest.raises(FileNotFoundError):
        load_tmap(str(tmp_path / "OT"), 5, 6)


def test_analyze_single_timepoint(rng, tmp_path):
    """One timepoint: domains plot but no transitions (empty day loop)."""
    from spadot_tpu.analyze.core import analyze

    ad = _latent_adata(rng, n_per_tp=60, n_tp=1)
    path = str(tmp_path / "latent.h5ad")
    ad.write_h5ad(path)
    analyze(SimpleNamespace(data=path, output_dir=str(tmp_path), prefix="",
                            n_clusters=[3]))
    assert (tmp_path / "0_domains.png").exists()
    assert not any(f.startswith("transition") for f in os.listdir(tmp_path))
