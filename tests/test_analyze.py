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


def test_device_backend_matches_sklearn(rng, tmp_path):
    """The accelerator KMeans backend must find the same partitions and the
    same elbow k as sklearn on separated data (labels compared by ARI — the
    two backends' label ORDER is arbitrary)."""
    from sklearn.metrics import adjusted_rand_score

    from spadot_tpu.analyze.clustering import adaptive_clustering, kmeans_clustering

    ad = _latent_adata(rng, k=4)
    out_sk = kmeans_clustering(ad, [4, 4], backend="sklearn")
    out_dev = kmeans_clustering(ad, [4, 4], backend="device")
    for tp in (0, 1):
        rows = (out_sk.obs["timepoint"] == tp).to_numpy()
        ari = adjusted_rand_score(
            out_sk.obs["kmeans"].to_numpy()[rows],
            out_dev.obs["kmeans"].to_numpy()[rows],
        )
        assert ari > 0.99, ari
    # WSS-curve equivalence drives the elbow: both backends must trace the
    # same inertia curve (the elbow RULE itself is the reference's and is
    # noise-sensitive where the curve is flat, so curves are the invariant)
    from spadot_tpu.analyze.clustering import _fit

    X = ad.toarray()[(ad.obs["timepoint"] == 0).to_numpy()]
    for k in range(4, 10):
        w_sk = _fit(X, k, "sklearn")[1]
        w_dev = _fit(X, k, "device")[1]
        assert abs(w_sk - w_dev) / w_sk < 0.02, (k, w_sk, w_dev)


def test_padded_kmeans_matches_plain(rng):
    """kmeans_fit_padded (traced k padded to k_max + masked row padding, the
    single-executable elbow path) must find the same partitions and the same
    inertia curve as the per-k kmeans_fit."""
    import jax
    import jax.numpy as jnp
    from sklearn.metrics import adjusted_rand_score

    from spadot_tpu.ops.kmeans import kmeans_fit, kmeans_fit_padded

    z, k_true = 6, 5
    centers = rng.normal(0, 8, size=(k_true, z))
    lab = rng.integers(0, k_true, 400)
    X = (centers[lab] + rng.normal(0, 0.3, size=(400, z))).astype(np.float32)
    n_pad = 512
    Xp = np.zeros((n_pad, z), np.float32)
    Xp[:400] = X
    mask = np.zeros((n_pad,), np.float32)
    mask[:400] = 1.0

    for k in (3, 5, 8):
        c_p, l_p, i_p = kmeans_fit_padded(
            jax.random.PRNGKey(0), jnp.asarray(Xp), jnp.asarray(k, jnp.int32),
            10, mask=jnp.asarray(mask), n_init=10, n_iter=100,
        )
        l_p = np.asarray(l_p)[:400]
        assert l_p.max() < k  # inactive clusters never assigned
        _, l_f, i_f = kmeans_fit(
            jax.random.PRNGKey(0), jnp.asarray(X), k, n_init=10, n_iter=100
        )
        # same partition quality: inertia within 2% (kmeans++ streams differ)
        assert abs(float(i_p) - float(i_f)) / float(i_f) < 0.02, (k, i_p, i_f)
        if k == k_true:
            ari = adjusted_rand_score(lab, l_p)
            assert ari > 0.99, ari


def test_device_elbow_single_executable(rng, tmp_path):
    """The device adaptive sweep pads k to max_clusters: every fit of the
    17-k sweep must hit ONE jit cache entry (the remote-compile cost that
    made the device backend slower than sklearn at 102k spots)."""
    from spadot_tpu.analyze.clustering import adaptive_clustering
    from spadot_tpu.ops.kmeans import kmeans_fit_padded

    ad = _latent_adata(rng, k=5)
    args = SimpleNamespace(output_dir=str(tmp_path), prefix="dev_")
    before = kmeans_fit_padded._cache_size()
    out = adaptive_clustering(args, ad, backend="device")
    added = kmeans_fit_padded._cache_size() - before
    assert added <= 1, added  # one executable for all ks and both tps
    for tp in (0, 1):
        rows = (out.obs["timepoint"] == tp).to_numpy()
        n_found = len(set(out.obs["kmeans"].to_numpy()[rows]))
        assert 4 <= n_found <= 7


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


def _wot_transition_oracle(R, labels0, labels1, sets0, sets1):
    """Literal per-cell transcription of the wot transition-table pipeline
    the reference drives at _analyze_utils.py:128-137 (the same transcription
    technique tests/test_sinkhorn.py uses for the OT solver; wot itself is
    not installable here):

      population_from_ids: p_i uniformly distributed over set S_i's cells;
      push_forward(..., normalize=False): pushed_i = p_i @ R;
      transition_table:    T[i, j] = sum(pushed_i * q_j).
    """
    out = np.zeros((len(sets0), len(sets1)))
    for i, s0 in enumerate(sets0):
        p = (labels0 == s0).astype(np.float64)
        p = p / p.sum()
        pushed = p @ R
        for j, s1 in enumerate(sets1):
            q = (labels1 == s1).astype(np.float64)
            q = q / q.sum()
            out[i, j] = np.sum(pushed * q)
    return out


def _clustered_adata(rng, n_per_tp=50):
    """Latent AnnData with the kmeans labels ot_analysis consumes."""
    from spadot_tpu.analyze.clustering import kmeans_clustering

    ad = _latent_adata(rng, n_per_tp=n_per_tp)
    return kmeans_clustering(ad, [3, 3])


def test_transition_table_matches_wot_oracle(rng, tmp_path):
    """The written transition table must equal the transcribed wot pipeline
    applied to the written transport map — i.e. the table carries wot's
    uniform-population normalization, not raw set-to-set mass."""
    from spadot_tpu.analyze.transport import load_tmap, ot_analysis

    ad = _clustered_adata(rng)
    args = SimpleNamespace(output_dir=str(tmp_path), prefix="")
    ot_analysis(args, ad)
    tt = read_h5ad(str(tmp_path / "transition_table_0_1.h5ad"))
    R = load_tmap(str(tmp_path / "OT"), 0, 1).toarray().astype(np.float64)

    # reconstruct the cell sets exactly as ot_analysis builds them
    tp = ad.obs["timepoint"].to_numpy()
    labels = (
        ad.obs["timepoint"].astype(str) + "_" + ad.obs["kmeans"].astype(str)
    ).to_numpy()
    rows0, rows1 = np.where(tp == 0)[0], np.where(tp == 1)[0]
    sets0 = sorted(set(labels[rows0]))
    sets1 = sorted(set(labels[rows1]))
    oracle = _wot_transition_oracle(R, labels[rows0], labels[rows1], sets0, sets1)
    np.testing.assert_allclose(tt.toarray(), oracle, rtol=1e-5, atol=1e-12)
    assert list(tt.obs_names) == sets0 and list(tt.var_names) == sets1


def test_transition_table_factored_matches_dense(rng, tmp_path, monkeypatch):
    """Forcing the cost-matrix-free factored engine must reproduce the dense
    path's normalized transition table."""
    import importlib

    transport = importlib.import_module("spadot_tpu.analyze.transport")

    ad = _clustered_adata(rng, n_per_tp=48)
    dense_dir, fact_dir = tmp_path / "dense", tmp_path / "fact"
    for d in (dense_dir, fact_dir):
        d.mkdir()
    ot_analysis = transport.ot_analysis
    ot_analysis(SimpleNamespace(output_dir=str(dense_dir), prefix=""), ad)
    monkeypatch.setattr(transport, "DENSE_LIMIT", 10)
    ot_analysis(SimpleNamespace(output_dir=str(fact_dir), prefix=""), ad)
    td = read_h5ad(str(dense_dir / "transition_table_0_1.h5ad")).toarray()
    tf = read_h5ad(str(fact_dir / "transition_table_0_1.h5ad")).toarray()
    np.testing.assert_allclose(tf, td, rtol=2e-3, atol=1e-10)
    # the factored run persists dual potentials instead of a dense plan
    assert (fact_dir / "OT" / "tmaps_duals_0_1.npz").exists()


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
