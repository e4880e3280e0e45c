"""Multi-device mesh tests on the 8-way virtual CPU mesh: the sharded
training step must execute and match the single-device result."""
import numpy as np
import pytest

import jax

from _synthetic import make_synthetic_adata
from spadot_tpu.config import default_config
from spadot_tpu.data.pipeline import prepare_data
from spadot_tpu.parallel.mesh import make_mesh, shard_tp_data
from spadot_tpu.utils.rng import set_seed

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(mesh=None):
    from spadot_tpu.train.loop import Trainer

    adata = make_synthetic_adata(n_per_tp=128, n_genes=24, n_tp=2)
    cfg = default_config()
    cfg.update(
        input_dim=24, timepoints=[0, 1], maxiter=2, ot_epoch=1, batch_size=64,
        inducing_point_nums=30, gat_encoder_hidden=8, gat_attention_heads=2,
        svgp_encoder_layers=[16, 8], decoder_layers=[8, 16], n_clusters=3,
    )
    set_seed(1993)
    data = prepare_data(adata, cfg)
    return Trainer(cfg, data, mesh=mesh), cfg


def test_mesh_creation():
    mesh = make_mesh({"data": 8})
    assert mesh.shape["data"] == 8


def test_sharded_step_matches_single_device():
    set_seed(1993)
    t1, _ = _setup(mesh=None)
    v1, o1 = t1.init_state(jax.random.PRNGKey(0))
    km = {"centers": {}, "assign": {}}
    v1, o1, _, losses1 = t1.run_epoch(
        v1, o1, jax.random.PRNGKey(1), 0, km, {}, 0, 0, 0.5
    )

    mesh = make_mesh({"data": 8})
    set_seed(1993)
    t8, _ = _setup(mesh=mesh)
    v8, o8 = t8.init_state(jax.random.PRNGKey(0))
    km8 = {"centers": {}, "assign": {}}
    v8, o8, _, losses8 = t8.run_epoch(
        v8, o8, jax.random.PRNGKey(1), 0, km8, {}, 0, 0, 0.5
    )
    np.testing.assert_allclose(losses8, losses1, rtol=2e-4, atol=2e-4)
    # parameters after the epoch agree too
    p1 = jax.tree_util.tree_leaves(v1["params"])
    p8 = jax.tree_util.tree_leaves(v8["params"])
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_sharded_step_with_row_padding():
    """Spot counts NOT divisible by the mesh exercise row padding; padded
    GAT rows must carry a self-loop sentinel (an all-masked softmax row
    NaN-poisons the backward) and gradients/losses must stay finite AND
    match the unsharded run."""
    from spadot_tpu.train.loop import Trainer

    adata = make_synthetic_adata(n_per_tp=67, n_genes=16, n_tp=1, seed=7)
    cfg = default_config()
    cfg.update(
        input_dim=16, timepoints=[0], maxiter=2, ot_epoch=1, batch_size=32,
        inducing_point_nums=20, gat_encoder_hidden=8, gat_attention_heads=2,
        svgp_encoder_layers=[16, 8], decoder_layers=[8, 16], n_clusters=3,
    )
    results = {}
    for mesh in (None, make_mesh({"data": 8})):
        set_seed(1993)
        data = prepare_data(adata, cfg)
        t = Trainer(cfg, data, mesh=mesh)
        v, o = t.init_state(jax.random.PRNGKey(0))
        km = {"centers": {}, "assign": {}}
        for epoch in range(2):
            v, o, _, losses = t.run_epoch(
                v, o, jax.random.PRNGKey(1 + epoch), 0, km, {}, 0, epoch, 0.5
            )
        assert np.isfinite(np.asarray(losses)).all()
        for leaf in jax.tree_util.tree_leaves(v["params"]):
            assert np.isfinite(np.asarray(leaf)).all()
        results["mesh" if mesh else "single"] = np.asarray(losses)
    np.testing.assert_allclose(
        results["mesh"], results["single"], rtol=2e-3, atol=2e-3
    )


def _run_fused(mesh, epochs=3):
    """Three fused whole-epoch dispatches (KMeans refresh included) on
    unequal timepoint sizes NOT divisible by the mesh — exercises batch-table
    padding, row padding for sharding, and the sharded refresh."""
    from spadot_tpu.train.loop import Trainer

    # unequal timepoint sizes, neither a multiple of 8
    adata = make_synthetic_adata(n_per_tp=[90, 77], n_genes=24, n_tp=2)
    cfg = default_config()
    cfg.update(
        input_dim=24, timepoints=[0, 1], maxiter=epochs, ot_epoch=1,
        batch_size=32, inducing_point_nums=30, gat_encoder_hidden=8,
        gat_attention_heads=2, svgp_encoder_layers=[16, 8],
        decoder_layers=[8, 16], n_clusters=3,
    )
    set_seed(1993)
    data = prepare_data(adata, cfg)
    t = Trainer(cfg, data, mesh=mesh)
    assert t.fused
    v, o = t.init_state(jax.random.PRNGKey(0))
    km = {"centers": {}, "assign": {}, "_stacked": t._km_stacked, "_have": False}
    rng = jax.random.PRNGKey(1)
    for ep in range(epochs):
        v, o, rng, losses = t.run_epoch_fused(
            v, o, rng, jax.random.PRNGKey(10 + ep), [1, 0], km, ep, 0.5
        )
    t.sync_km_views(km)
    return np.asarray(losses), v, t, km


@pytest.mark.slow
def test_fused_epoch_on_mesh_matches_single_device():
    """The fused stacked-timepoint epoch must run spot-sharded over the mesh
    and reproduce the single-device trajectory (VERDICT r2 #1)."""
    l1, v1, _, km1 = _run_fused(None)
    l8, v8, _, km8 = _run_fused(make_mesh({"data": 8}))
    np.testing.assert_allclose(l8, l1, rtol=2e-3, atol=2e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(v1["params"]),
        jax.tree_util.tree_leaves(v8["params"]),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-4
        )
    for tp in (0, 1):
        c1 = np.sort(np.asarray(km1["centers"][tp]), axis=0)
        c8 = np.sort(np.asarray(km8["centers"][tp]), axis=0)
        np.testing.assert_allclose(c8, c1, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_sharded_latent_and_kmeans():
    mesh = make_mesh({"data": 8})
    t8, _ = _setup(mesh=mesh)
    v8, _ = t8.init_state(jax.random.PRNGKey(0))
    lat = np.asarray(t8.latent(v8, 0))
    assert lat.shape == (128, 20) and np.isfinite(lat).all()
    km = t8.update_kmeans(v8, jax.random.PRNGKey(5), {"centers": {}, "assign": {}})
    assert np.asarray(km["centers"][0]).shape == (3, 20)


@pytest.mark.slow
def test_sharded_factored_sinkhorn_matches_single_device(rng):
    from spadot_tpu.ops.sinkhorn_flash import (
        sinkhorn_factored,
        sinkhorn_factored_sharded,
    )

    X0 = rng.normal(0, 2, (64, 12)).astype(np.float32)
    X1 = rng.normal(0.5, 2, (72, 12)).astype(np.float32)
    G = rng.uniform(0.5, 2.0, 64)
    f1, g1, s1, e1 = sinkhorn_factored(
        X0, X1, G, return_plan=False, block=16, use_pallas=False,
    )
    mesh = make_mesh({"data": 8})
    f8, g8, s8, e8 = sinkhorn_factored_sharded(X0, X1, G, mesh=mesh, block=16)
    assert s1 == s8 and e1 == e8
    np.testing.assert_allclose(f8, f1, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(g8, g1, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("banded", ["false", "true"])
def test_exact_closures_on_mesh(banded):
    """Exact receptive-closure minibatch GAT (the default at scale) must run
    spot-sharded over the mesh — square AND banded closure masks — and
    reproduce the single-device losses (the closure gather Y[ext_idx]
    crosses shard boundaries; GSPMD inserts the collectives)."""
    from spadot_tpu.train.loop import Trainer

    adata = make_synthetic_adata(n_per_tp=150, n_genes=24, n_tp=1)
    cfg = default_config()
    cfg.update(
        input_dim=24, timepoints=[0], maxiter=1, ot_epoch=1, batch_size=32,
        inducing_point_nums=20, gat_encoder_hidden=8, gat_attention_heads=2,
        svgp_encoder_layers=[16, 8], decoder_layers=[8, 16], n_clusters=3,
        full_graph_gat=False, gat_exact_batches=True,
        gat_ext_banded=banded, gat_ext_band_ti=64,
        max_neighbors=5, knn_cutoff=6,
    )
    runs = []
    for mesh in (None, make_mesh({"data": 8})):
        set_seed(1993)
        data = prepare_data(adata, cfg)
        if banded == "true":
            d = data["tp_data"][0]
            assert "ext_adj" in d and d["ext_adj"].ndim == 4  # (nb, ni, TI, Wb)
        tr = Trainer(cfg, data, mesh=mesh)
        v, o = tr.init_state(jax.random.PRNGKey(0))
        v, o, _, losses = tr.run_epoch(
            v, o, jax.random.PRNGKey(1), 0,
            {"centers": {}, "assign": {}}, {}, 0, 0, 0.5,
        )
        runs.append(np.asarray(losses))
    np.testing.assert_allclose(runs[1], runs[0], rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_windowed_gat_on_mesh():
    """Windowed minibatch GAT + spot-sharded mesh combine correctly."""
    from spadot_tpu.train.loop import Trainer

    adata = make_synthetic_adata(n_per_tp=128, n_genes=24, n_tp=1)
    cfg = default_config()
    cfg.update(
        input_dim=24, timepoints=[0], maxiter=1, ot_epoch=1, batch_size=32,
        inducing_point_nums=20, gat_encoder_hidden=8, gat_attention_heads=2,
        svgp_encoder_layers=[16, 8], decoder_layers=[8, 16], n_clusters=3,
        full_graph_gat=False, gat_window=16, gat_exact_batches=False,
    )
    set_seed(1993)
    data = prepare_data(adata, cfg)
    mesh = make_mesh({"data": 8})
    tr = Trainer(cfg, data, mesh=mesh)
    v, o = tr.init_state(jax.random.PRNGKey(0))
    v, o, _, losses = tr.run_epoch(
        v, o, jax.random.PRNGKey(1), 0, {"centers": {}, "assign": {}}, {}, 0, 0, 0.5
    )
    assert np.isfinite(np.asarray(losses)).all()


@pytest.mark.slow
def test_resume_on_mesh_replays_uninterrupted_run(tmp_path):
    """Checkpoint/resume under a mesh: a run interrupted at epoch 2 and
    resumed from its checkpoint must replay the uninterrupted 4-epoch
    trajectory — params, optimizer, KMeans stack, gammas, jax RNG chain and
    the host python RNG (timepoint shuffle) all have to round-trip through
    the npz checkpoint with spot-sharded arrays."""
    from spadot_tpu.train.checkpoint import load_checkpoint
    from spadot_tpu.train.loop import _save_state, train_spadot

    adata = make_synthetic_adata(n_per_tp=128, n_genes=24, n_tp=2)

    def cfg_for(maxiter):
        cfg = default_config()
        cfg.update(
            input_dim=24, timepoints=[0, 1], maxiter=maxiter, ot_epoch=1,
            batch_size=64, inducing_point_nums=30, gat_encoder_hidden=8,
            gat_attention_heads=2, svgp_encoder_layers=[16, 8],
            decoder_layers=[8, 16], n_clusters=3,
        )
        cfg["ot_config"]["ot_epochs"] = 1
        return cfg

    mesh = make_mesh({"data": 8})

    # uninterrupted 4-epoch run
    cfg = cfg_for(4)
    set_seed(1993)
    data = prepare_data(adata, cfg)
    _, _, _, _, df_full = train_spadot(data, cfg, mesh=mesh)
    assert len(df_full) == 4

    # interrupted run: 2 epochs, checkpoint, then resume to 4 on the mesh
    set_seed(1993)
    data2 = prepare_data(adata, cfg_for(2))
    tr, v, o, host, df_half = train_spadot(data2, cfg_for(2), mesh=mesh)
    ckpt = str(tmp_path / "mesh_autosave.ckpt")
    tr.sync_km_views(host["km"])
    _save_state(ckpt, tr, v, o, host["km"], host["gammas"], host["rng"],
                host["last_epoch"], host["loss_rows"])
    resume_state = load_checkpoint(ckpt)
    _, _, _, _, df_res = train_spadot(
        data2, cfg_for(4), resume_state=resume_state, mesh=mesh
    )
    assert len(df_res) == 4
    # restored epochs are the saved rows verbatim; continued epochs replay
    # the uninterrupted run (state round-trips through host numpy exactly;
    # tolerance only covers accumulation-order noise on the virtual mesh)
    np.testing.assert_allclose(
        df_res.to_numpy(), df_full.to_numpy(), rtol=2e-3, atol=2e-3
    )


@pytest.mark.slow
def test_fused_epoch_collective_hygiene():
    """Sharding-regression guard (docs/scaling.md accounting): the fused
    whole-epoch program over the mesh must contain only the expected
    collective families — a handful of all-gathers/all-reduces (gradient
    psum + refresh bookkeeping), and never an all-to-all or a
    reduce-scatter, whose appearance would mean a sharding annotation
    regressed into a resharding cascade."""
    import re

    from spadot_tpu.train.loop import Trainer

    adata = make_synthetic_adata(n_per_tp=[90, 77], n_genes=24, n_tp=2)
    cfg = default_config()
    cfg.update(
        input_dim=24, timepoints=[0, 1], maxiter=1, ot_epoch=1,
        batch_size=32, inducing_point_nums=30, gat_encoder_hidden=8,
        gat_attention_heads=2, svgp_encoder_layers=[16, 8],
        decoder_layers=[8, 16], n_clusters=3,
    )
    set_seed(1993)
    data = prepare_data(adata, cfg)
    t = Trainer(cfg, data, mesh=make_mesh({"data": 8}))
    assert t.fused
    v, o = t.init_state(jax.random.PRNGKey(0))
    km = {"centers": {}, "assign": {}, "_stacked": t._km_stacked,
          "_have": False}

    captured = {}
    real = t._fused_jit

    def capture(*a):
        captured["args"] = a
        return real(*a)

    t._fused_jit = capture
    t.run_epoch_fused(v, o, jax.random.PRNGKey(1), jax.random.PRNGKey(2),
                      [1, 0], km, 1, 0.5)
    t._fused_jit = real
    hlo = real.lower(*captured["args"]).compile().as_text()
    counts = {
        kind: len(re.findall(rf"\s{kind}\(", hlo))
        for kind in ("all-reduce", "all-gather", "reduce-scatter",
                     "all-to-all", "collective-permute")
    }
    assert counts["all-to-all"] == 0, counts
    assert counts["reduce-scatter"] == 0, counts
    # gradient psum + KMeans refresh bookkeeping; generous headroom over
    # the measured 9 so benign partitioner changes don't flake the suite
    assert counts["all-reduce"] + counts["all-gather"] <= 32, counts


def test_collective_accounting_parser():
    """scripts/collective_accounting.py's HLO tally: op-site counting and
    result-shape byte arithmetic (incl. tuple shapes and -start forms) —
    the numbers docs/multichip.md quotes come from this parser."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "collective_accounting",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "collective_accounting.py"),
    )
    # the module sets env defaults at import; harmless under the conftest
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    hlo = "\n".join([
        "  %ar.1 = f32[10,20]{1,0} all-reduce(f32[10,20] %p), replica_groups={}",
        "  %ars = (f32[4]{0}, f32[8]{0}) all-reduce-start(%a, %b)",  # not counted: -start
        "  %ag.2 = (f32[16]{0}, f32[16]{0}) all-gather(%x, %y), dimensions={0}",
        "  %cp = u32[2]{0} collective-permute(%z), source_target_pairs={{0,1}}",
        "  ROOT %t = f32[1]{0} tuple(%ar.1)",
    ])
    stats = mod.account(hlo)
    assert stats["all-reduce"]["count"] == 1
    assert stats["all-reduce"]["bytes"] == 10 * 20 * 4
    assert stats["all-gather"]["count"] == 1
    assert stats["all-gather"]["bytes"] == (16 + 16) * 4
    assert stats["collective-permute"]["count"] == 1
    assert stats["collective-permute"]["bytes"] == 2 * 4
    assert stats["all-to-all"]["count"] == 0
