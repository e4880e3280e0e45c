"""End-to-end training smoke + domain-recovery test on synthetic data."""
import numpy as np
import pytest

from _synthetic import make_synthetic_adata
from spadot_tpu.config import default_config
from spadot_tpu.data.pipeline import make_batches, prepare_data, standardize_locations
from spadot_tpu.utils.rng import set_seed


def _tiny_config(adata, maxiter=3):
    cfg = default_config()
    cfg.update(
        input_dim=adata.n_vars,
        timepoints=sorted(adata.obs["timepoint"].unique().tolist()),
        maxiter=maxiter, ot_epoch=1, batch_size=64, inducing_point_nums=40,
        gat_encoder_hidden=16, gat_attention_heads=2,
        svgp_encoder_layers=[32, 16], decoder_layers=[16, 32], n_clusters=3,
    )
    cfg["ot_config"]["ot_epochs"] = 2
    return cfg


@pytest.fixture(scope="module")
def trained():
    from spadot_tpu.train.loop import train_spadot

    adata = make_synthetic_adata(n_per_tp=100, n_genes=30, n_tp=2)
    cfg = _tiny_config(adata)
    set_seed(1993)
    data = prepare_data(adata, cfg)
    trainer, variables, opt_state, host_state, loss_df = train_spadot(data, cfg)
    return adata, cfg, data, trainer, variables, host_state, loss_df


def test_loss_components_flow(trained):
    *_, loss_df = trained
    assert list(loss_df.columns) == [
        "elbo", "Recon", "SVGP_KL", "GAT_KL", "alignment", "KMeans", "OT"
    ]
    assert np.isfinite(loss_df.to_numpy()).all()
    assert (loss_df["KMeans"].iloc[1:] != 0).all()  # from epoch 1
    assert loss_df["OT"].iloc[2] != 0  # after first plan refresh
    assert (loss_df["SVGP_KL"] <= 0).all()  # sign trick


def test_latent_extraction(trained):
    adata, cfg, data, trainer, variables, host_state, _ = trained
    from spadot_tpu.train.loop import get_latent

    lat = get_latent(trainer, variables, data, adata)
    assert lat.shape == (adata.n_obs, cfg["z_dim"])
    assert np.isfinite(lat.toarray()).all()
    assert "spatial" in lat.obsm


def test_gammas_are_transport_plans(trained):
    *_, host_state, _ = trained[4:]
    host_state = trained[5]
    for key, g in host_state["gammas"].items():
        assert np.isfinite(g).all() and (g >= 0).all()


def test_standardize_locations():
    adata = make_synthetic_adata(n_per_tp=50, n_genes=10, n_tp=3)
    loc = standardize_locations(adata)
    assert loc.shape == (150, 2 + 3)
    tp = adata.obs["timepoint"].to_numpy()
    for t in range(3):
        sub = loc[tp == t, :2]
        np.testing.assert_allclose(sub.mean(0), 0, atol=1e-9)
        np.testing.assert_allclose(sub.std(0), 1, atol=1e-9)
    np.testing.assert_allclose(loc[:, 2:].sum(1), 1)


def test_make_batches_padding():
    idx, mask = make_batches(10, 4)
    assert idx.shape == (3, 4)
    assert mask.sum() == 10
    assert (idx < 10).all()


@pytest.mark.slow
def test_svgp_gemm_solves_flag_matches_solve_path():
    """`svgp_gemm_solves: false` restores the per-step solve_triangular
    SVGP path (ops/svgp.py fallback branch); trajectories must match the
    precomputed-constant gemm default to float roundoff."""
    from spadot_tpu.train.loop import train_spadot

    adata = make_synthetic_adata(n_per_tp=100, n_genes=25, n_tp=2, seed=9)
    out = {}
    for flag in (True, False):
        cfg = _tiny_config(adata)
        cfg["svgp_gemm_solves"] = flag
        set_seed(1993)
        data = prepare_data(adata, cfg)
        trainer, _, _, _, loss_df = train_spadot(data, cfg)
        if flag:
            assert "L_inv" in trainer._stacked or not trainer.fused
        elif trainer.fused:
            assert "L_inv" not in trainer._stacked
        out[flag] = loss_df.to_numpy(np.float64)
    rel = np.abs(out[True] - out[False]) / np.maximum(np.abs(out[True]), 1e-9)
    assert np.isfinite(out[False]).all()
    assert rel.max() < 1e-4


@pytest.mark.slow
def test_svgp_only_ablation_mode():
    """VAE-only encoder ablation (GAT off) — BASELINE.json config 2."""
    from spadot_tpu.train.loop import Trainer, get_latent, train_spadot

    adata = make_synthetic_adata(n_per_tp=80, n_genes=20, n_tp=1, seed=3)
    cfg = _tiny_config(adata, maxiter=2)
    cfg["encoder_mode"] = "svgp"
    set_seed(1993)
    data = prepare_data(adata, cfg)
    trainer, variables, _, host_state, loss_df = train_spadot(data, cfg)
    assert (loss_df["GAT_KL"] == 0).all()
    assert (loss_df["alignment"] == 0).all()
    assert (loss_df["SVGP_KL"] != 0).all()
    lat = get_latent(trainer, variables, data, adata)
    assert lat.shape == (80, cfg["z_dim"] // 2)


@pytest.mark.slow
def test_fused_epoch_matches_per_tp_path():
    """Fused stacked-timepoint epoch (one dispatch) vs the per-tp path on
    EQUAL shapes (no padding): identical math, identical rng stream — the
    first epoch's losses must agree to float roundoff and the full run stays
    close."""
    from spadot_tpu.train.loop import train_spadot

    adata = make_synthetic_adata(n_per_tp=96, n_genes=24, n_tp=2, seed=11)
    cfg = _tiny_config(adata, maxiter=3)
    cfg["equal_inducing_split"] = True

    runs = {}
    for mode in ("auto", "false"):
        c = dict(cfg)
        c["fused_epoch"] = mode
        set_seed(1993)
        data = prepare_data(adata, c)
        trainer, _, _, _, loss_df = train_spadot(data, c)
        assert trainer.fused == (mode == "auto")
        runs[mode] = loss_df
    np.testing.assert_allclose(
        runs["auto"].iloc[0].to_numpy(), runs["false"].iloc[0].to_numpy(),
        rtol=5e-3, atol=1e-4,
    )
    rel = np.abs(
        runs["auto"].to_numpy() - runs["false"].to_numpy()
    ) / np.maximum(np.abs(runs["false"].to_numpy()), 1e-3)
    assert np.nanmax(rel) < 0.2, rel


@pytest.mark.slow
def test_warm_kmeans_refresh_fused_matches_per_tp():
    """kmeans_refresh_warm: the warm-started refresh must be the SAME math in
    the fused and per-tp paths (prev centers come from the stacked state vs
    km['centers'] but carry identical values), and train finite with the
    normal loss-schedule structure."""
    from spadot_tpu.train.loop import train_spadot

    adata = make_synthetic_adata(n_per_tp=96, n_genes=24, n_tp=2, seed=11)
    cfg = _tiny_config(adata, maxiter=4)
    cfg["equal_inducing_split"] = True
    cfg["kmeans_refresh_warm"] = True

    runs = {}
    for mode in ("auto", "false"):
        c = dict(cfg)
        c["fused_epoch"] = mode
        set_seed(1993)
        data = prepare_data(adata, c)
        trainer, _, _, _, loss_df = train_spadot(data, c)
        assert trainer.fused == (mode == "auto")
        assert trainer.kmeans_warm
        assert np.isfinite(loss_df.to_numpy()).all()
        assert (loss_df["KMeans"].iloc[1:] > 0).all()
        runs[mode] = loss_df
    np.testing.assert_allclose(
        runs["auto"].iloc[0].to_numpy(), runs["false"].iloc[0].to_numpy(),
        rtol=5e-3, atol=1e-4,
    )
    rel = np.abs(
        runs["auto"].to_numpy() - runs["false"].to_numpy()
    ) / np.maximum(np.abs(runs["false"].to_numpy()), 1e-3)
    assert np.nanmax(rel) < 0.2, rel


@pytest.mark.slow
def test_fused_epoch_unequal_timepoint_sizes():
    """Row/batch/inducing padding path: unequal per-tp spot counts must train
    finite with correct loss-schedule structure, and the padded batches must
    commit nothing (losses comparable to the per-tp run)."""
    from spadot_tpu.train.loop import train_spadot

    adata = make_synthetic_adata(n_per_tp=[60, 130], n_genes=20, n_tp=2, seed=12)
    cfg = _tiny_config(adata, maxiter=4)

    set_seed(1993)
    data = prepare_data(adata, cfg)
    trainer, variables, _, host_state, fused_df = train_spadot(data, cfg)
    assert trainer.fused
    assert np.isfinite(fused_df.to_numpy()).all()
    assert (fused_df["KMeans"].iloc[1:] > 0).all()
    assert (fused_df["OT"].iloc[1:] > 0).any()
    # km views match the stacked state and have per-tp lengths
    km = host_state["km"]
    for i, tp in enumerate(trainer.timepoints):
        assert km["assign"][tp].shape[0] == trainer.tp_n[tp]

    c2 = dict(cfg)
    c2["fused_epoch"] = "false"
    set_seed(1993)
    data2 = prepare_data(adata, c2)
    _, _, _, _, pertp_df = train_spadot(data2, c2)
    # padding changes the rng stream, so equality is statistical: same
    # magnitudes at epoch 0
    r0 = fused_df.iloc[0].to_numpy()
    p0 = pertp_df.iloc[0].to_numpy()
    np.testing.assert_allclose(r0, p0, rtol=0.5, atol=1.0)


@pytest.mark.slow
def test_windowed_gat_mode_trains():
    """O(window) minibatch GAT (full_graph_gat: false) for large spot counts."""
    from spadot_tpu.train.loop import train_spadot

    adata = make_synthetic_adata(n_per_tp=120, n_genes=24, n_tp=1, seed=5)
    cfg = _tiny_config(adata, maxiter=2)
    # exact batches off: this test covers the Morton-window approximation
    # (exact-closure mode has its own suite, tests/test_exact_batches.py)
    cfg.update(full_graph_gat=False, gat_window=32, batch_size=48,
               gat_exact_batches=False)
    set_seed(1993)
    data = prepare_data(adata, cfg)
    trainer, variables, _, _, loss_df = train_spadot(data, cfg)
    assert np.isfinite(loss_df.to_numpy()).all()
    assert (loss_df["GAT_KL"] != 0).all()


@pytest.mark.slow
def test_windowed_dense_matches_windowed_lists():
    """The dense-window attention (scatter-built window adjacency) enumerates
    exactly the edges of the sliced neighbor-list graph, so both windowed
    variants must produce the same training trajectory to f32 roundoff."""
    from spadot_tpu.train.loop import train_spadot

    adata = make_synthetic_adata(n_per_tp=120, n_genes=24, n_tp=1, seed=6)
    base = _tiny_config(adata, maxiter=2)
    base.update(full_graph_gat=False, gat_window=32, batch_size=48,
                gat_exact_batches=False)
    runs = {}
    for dense_max, name in ((10000, "dense"), (0, "lists")):
        cfg = dict(base)
        cfg["gat_window_dense_max"] = dense_max
        set_seed(1993)
        data = prepare_data(adata, cfg)
        _, _, _, _, loss_df = train_spadot(data, cfg)
        runs[name] = loss_df.to_numpy()
    np.testing.assert_allclose(
        runs["dense"][0], runs["lists"][0], rtol=5e-3, atol=1e-4
    )
    rel = np.abs(runs["dense"] - runs["lists"]) / np.maximum(
        np.abs(runs["lists"]), 1e-3
    )
    assert np.nanmax(rel) < 0.2, rel


@pytest.mark.slow
def test_string_timepoints_end_to_end(tmp_path):
    """Real datasets carry non-numeric timepoint labels (e.g. 'D4')."""
    from spadot_tpu.train.loop import get_latent, train_spadot

    adata = make_synthetic_adata(n_per_tp=80, n_genes=20, n_tp=2, seed=9)
    adata.obs["timepoint"] = np.where(
        adata.obs["timepoint"].to_numpy() == 0, "D4", "D7"
    )
    cfg = _tiny_config(adata, maxiter=3)
    cfg["timepoints"] = sorted(adata.obs["timepoint"].unique().tolist())
    set_seed(1993)
    data = prepare_data(adata, cfg)
    trainer, variables, _, host_state, loss_df = train_spadot(data, cfg)
    assert np.isfinite(loss_df.to_numpy()).all()
    assert any(k == "D4_D7" for k in host_state["gammas"])
    lat = get_latent(trainer, variables, data, adata)
    assert set(lat.obs["timepoint"]) == {"D4", "D7"}

    # analyze stage with string timepoints
    from types import SimpleNamespace

    from spadot_tpu.analyze.core import analyze

    p = str(tmp_path / "lat.h5ad")
    lat.write_h5ad(p)
    analyze(SimpleNamespace(data=p, output_dir=str(tmp_path), prefix="",
                            n_clusters=[3, 3]))
    assert (tmp_path / "D4_domains.png").exists()
    assert (tmp_path / "transition_table_0_1.h5ad").exists()


@pytest.mark.slow
def test_float64_parity_mode_runs():
    """dtype: float64 — the reference's precision (SpaDOT/train.py:27)."""
    import jax

    from spadot_tpu.train.loop import train_spadot

    adata = make_synthetic_adata(n_per_tp=60, n_genes=16, n_tp=1, seed=2)
    cfg = _tiny_config(adata, maxiter=2)
    cfg["dtype"] = "float64"
    set_seed(1993)
    data = prepare_data(adata, cfg)
    try:
        trainer, variables, _, _, loss_df = train_spadot(data, cfg)
        assert np.isfinite(loss_df.to_numpy()).all()
        lat = trainer.latent(variables, 0)
        assert lat.dtype == np.float64
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_resume_mid_training_continues(tmp_path):
    """Interrupted-training resume: autosave at epoch N, resume completes the
    remaining epochs with the full loss history intact."""
    from spadot_tpu.train.loop import _save_state, train_spadot
    from spadot_tpu.train.checkpoint import load_checkpoint

    adata = make_synthetic_adata(n_per_tp=60, n_genes=16, n_tp=1, seed=4)
    cfg = _tiny_config(adata, maxiter=4)
    set_seed(1993)
    data = prepare_data(adata, cfg)

    # run the first phase manually and save a mid-training checkpoint
    import jax

    from spadot_tpu.train.loop import Trainer

    trainer = Trainer(cfg, data)
    variables, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    km = {"centers": {}, "assign": {}}
    rows = []
    rng = jax.random.PRNGKey(1)
    for epoch in range(2):
        variables, opt_state, rng, losses = trainer.run_epoch(
            variables, opt_state, rng, 0, km, {}, 0, epoch, 0.5
        )
        rows.append(np.asarray(losses))
        km = trainer.update_kmeans(variables, jax.random.PRNGKey(9 + epoch), km)
    ckpt = str(tmp_path / "auto.ckpt")
    _save_state(ckpt, trainer, variables, opt_state, km, {},
                jax.random.PRNGKey(2), 1, rows)

    # the checkpoint is a plain npz: loadable with allow_pickle=False (no
    # code execution on load) and carries a version field
    with np.load(ckpt, allow_pickle=False) as z:
        assert int(z["__ckpt_version__"]) == 2

    resume_state = load_checkpoint(ckpt)
    trainer2, v2, o2, host, loss_df = train_spadot(
        data, cfg, resume_state=resume_state
    )
    assert len(loss_df) == 4  # 2 restored + 2 new epochs
    assert np.isfinite(loss_df.to_numpy()).all()
    np.testing.assert_allclose(loss_df.iloc[0].to_numpy(), rows[0], rtol=1e-6)
    # restored params are bit-identical to what was saved
    import jax as _jax

    leaves_saved = _jax.tree_util.tree_leaves(variables)
    # rebuild through the same restore path train_spadot used
    from spadot_tpu.train.checkpoint import restore_model_state

    v_fresh, o_fresh = trainer.init_state(_jax.random.PRNGKey(123))
    v_rest, _ = restore_model_state(v_fresh, o_fresh, resume_state["model_state"])
    for a, b in zip(leaves_saved, _jax.tree_util.tree_leaves(v_rest)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_optimizer_state_trains_and_roundtrips(tmp_path):
    """optimizer_state_dtype: bfloat16 (train/optim.py) — Adam moments
    stored bf16, f32 math: training stays finite and close to the f32-state
    run at tiny scale, the moment buffers really are bf16, and the npz
    checkpoint round-trips them bit-exactly (the ::bf16 uint16-view
    encoding in train/checkpoint.py — plain npz turns bf16 into raw void
    bytes)."""
    import jax
    import jax.numpy as jnp

    from spadot_tpu.train.checkpoint import (
        load_checkpoint, restore_model_state)
    from spadot_tpu.train.loop import _save_state, Trainer

    adata = make_synthetic_adata(n_per_tp=60, n_genes=16, n_tp=1, seed=4)
    finals = {}
    trainers = {}
    states = {}
    for dt in ("float32", "bfloat16"):
        cfg = _tiny_config(adata, maxiter=3)
        cfg["optimizer_state_dtype"] = dt
        set_seed(1993)
        data = prepare_data(adata, cfg)
        t = Trainer(cfg, data)
        v, o = t.init_state(jax.random.PRNGKey(0))
        km = {"centers": {}, "assign": {}}
        rng = jax.random.PRNGKey(1)
        for epoch in range(3):
            v, o, rng, losses = t.run_epoch(
                v, o, rng, 0, km, {}, 0, epoch, 0.5
            )
            km = t.update_kmeans(v, jax.random.PRNGKey(9 + epoch), km)
        finals[dt] = np.asarray(losses)
        trainers[dt] = t
        states[dt] = (v, o)
        assert np.isfinite(finals[dt]).all()
    # the bf16 arm really stores bf16 moments (chain: clip -> adamw;
    # adamw chain: scale_by_adam -> decay -> scale)
    _, o_bf = states["bfloat16"]
    adam_state = o_bf[1][0]
    mu_leaves = jax.tree_util.tree_leaves(adam_state.mu)
    assert all(l.dtype == jnp.bfloat16 for l in mu_leaves)
    assert adam_state.count.dtype == jnp.int32
    # same trajectory up to bf16 storage rounding
    np.testing.assert_allclose(
        finals["bfloat16"], finals["float32"], rtol=0.05, atol=0.05
    )
    # checkpoint roundtrip is bit-exact on the bf16 moments
    t = trainers["bfloat16"]
    v, o = states["bfloat16"]
    ckpt = str(tmp_path / "bf16.ckpt")
    _save_state(ckpt, t, v, o, km, {}, jax.random.PRNGKey(2), 2, [])
    rs = load_checkpoint(ckpt)
    v_f, o_f = t.init_state(jax.random.PRNGKey(123))
    _, o_rest = restore_model_state(v_f, o_f, rs["model_state"])
    for a, b in zip(
        jax.tree_util.tree_leaves(o), jax.tree_util.tree_leaves(o_rest)
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(
            np.atleast_1d(a).view(np.uint8), np.atleast_1d(b).view(np.uint8)
        )


def test_reference_pth_artifact(tmp_path):
    """--save_model writes the reference's artifact name SpaDOT_model.pth
    (SpaDOT/train.py:40) as a genuine torch-loadable state dict."""
    import torch

    from spadot_tpu.train.loop import _save_reference_weights, Trainer

    adata = make_synthetic_adata(n_per_tp=60, n_genes=16, n_tp=1, seed=4)
    cfg = _tiny_config(adata, maxiter=1)
    set_seed(1993)
    data = prepare_data(adata, cfg)
    import jax

    trainer = Trainer(cfg, data)
    variables, _ = trainer.init_state(jax.random.PRNGKey(0))
    p = str(tmp_path / "SpaDOT_model.pth")
    _save_reference_weights(p, variables)
    sd = torch.load(p, weights_only=True)
    assert isinstance(sd, dict) and len(sd)
    n_params = sum(v.numel() for v in sd.values())
    import jax as _jax

    assert n_params == sum(
        int(np.prod(x.shape)) for x in _jax.tree_util.tree_leaves(variables)
    )


@pytest.mark.slow
@pytest.mark.parametrize("windowed", [False, True])
def test_rev_backward_full_model_grad_equality(windowed):
    """The scatter-free GAT backward (reverse padded lists) must produce the
    SAME loss and parameter gradients as plain autodiff, through the whole
    composite objective, in both full-graph and windowed-batch modes."""
    import jax
    import jax.numpy as jnp

    from spadot_tpu.models.model import build_net, forward_batch
    from spadot_tpu.train.loop import Trainer

    adata = make_synthetic_adata(n_per_tp=90, n_genes=20, n_tp=1, seed=11)
    cfg = _tiny_config(adata, maxiter=1)
    # fused mode skips staging the reverse lists (its epoch never reads
    # them); force the per-tp path this test exercises
    cfg["fused_epoch"] = "false"
    # the dense-adjacency path would shadow the gather+rev path under test
    cfg["gat_dense_max_n"] = 0
    if windowed:
        cfg.update(full_graph_gat=False, gat_window=24, batch_size=32,
                   gat_window_dense_max=0, gat_exact_batches=False)
    else:
        # the rev lists only exist on the full-graph gather path (the
        # exact-closure default never stages them)
        cfg["full_graph_gat"] = True
    set_seed(1993)
    data = prepare_data(adata, cfg)
    trainer = Trainer(cfg, data)
    variables, _ = trainer.init_state(jax.random.PRNGKey(0))
    tp_dev = trainer.tp_dev[0]
    assert "rev_src" in tp_dev  # pipeline must have wired the reverse lists
    tp_norev = {k: v for k, v in tp_dev.items() if not k.startswith("rev_")}
    idx, msk = trainer.tp_batches[0]
    rng = jax.random.PRNGKey(3)

    def loss_fn(params, td):
        losses, _, _ = forward_batch(
            trainer.net, {"params": params, "batch_stats": variables["batch_stats"]},
            rng, td, trainer.svgp_states[0], idx[0], msk[0],
            kernel_scale=trainer.kernel_scale, kernel_type=trainer.kernel_type,
            train=False, gat_window=trainer.gat_window,
            gat_window_dense_max=trainer.gat_window_dense_max,
        )
        return (
            losses["Recon"] + losses["GAT_KL"] + losses["SVGP_KL"]
            + losses["alignment"]
        )

    l_rev, g_rev = jax.value_and_grad(loss_fn)(variables["params"], tp_dev)
    l_ref, g_ref = jax.value_and_grad(loss_fn)(variables["params"], tp_norev)
    np.testing.assert_allclose(float(l_rev), float(l_ref), rtol=1e-6)
    flat_rev = jax.tree_util.tree_leaves_with_path(g_rev)
    flat_ref = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(g_ref)
    )
    for path, a in flat_rev:
        b = flat_ref[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_odd_z_dim():
    """z_dim=21 -> each branch emits 10 dims, latent is 20-wide (the
    reference's 'in case input z_dim is odd' convention, SpaDOT.py:34)."""
    from spadot_tpu.train.loop import get_latent, train_spadot

    adata = make_synthetic_adata(n_per_tp=60, n_genes=16, n_tp=1, seed=6)
    cfg = _tiny_config(adata, maxiter=2)
    cfg["z_dim"] = 21
    set_seed(1993)
    data = prepare_data(adata, cfg)
    trainer, variables, _, _, loss_df = train_spadot(data, cfg)
    assert np.isfinite(loss_df.to_numpy()).all()
    lat = get_latent(trainer, variables, data, adata)
    assert lat.shape == (60, 20)


def test_run_epoch_restages_mutated_gammas():
    """run_epoch must re-stage a transport plan whose content changed even
    when the caller mutated the SAME array object in place (a direct driver
    reusing one buffer per gkey) — the guard compares content, not object
    identity (train/loop.py)."""
    import jax

    from spadot_tpu.train.loop import Trainer

    adata = make_synthetic_adata(n_per_tp=60, n_genes=16, n_tp=2, seed=6)
    cfg = _tiny_config(adata)
    set_seed(1993)
    data = prepare_data(adata, cfg)
    trainer = Trainer(cfg, data)
    variables, opt_state = trainer.init_state(jax.random.PRNGKey(0))
    km = {"centers": {}, "assign": {}}
    k = int(cfg["n_clusters"])
    g = np.full((k, k), 1.0 / k, dtype=np.float64)  # rows already normalized
    gammas = {"0_1": g}
    rng = jax.random.PRNGKey(1)
    ep = int(cfg["ot_epoch"])
    tp = trainer.timepoints[1]
    variables, opt_state, rng, _ = trainer.run_epoch(
        variables, opt_state, rng, tp, km, gammas, 1, ep, 0.5
    )
    first = np.asarray(trainer._gamma_dev["0_1"])
    np.testing.assert_allclose(first, g)
    g[:] = 0.0
    g[:, 0] = 1.0  # in-place mutation of the SAME object
    trainer.run_epoch(variables, opt_state, rng, tp, km, gammas, 1, ep, 0.5)
    second = np.asarray(trainer._gamma_dev["0_1"])
    np.testing.assert_allclose(second, g)
    assert not np.allclose(first, second)


def test_update_ot_diagnoses_nonfinite_centroids():
    """Diverged training latents (NaN centroids) must fail at the OT refresh
    with a message naming the precision knobs, not as an opaque duality-gap
    overflow deep in the Sinkhorn engine (the failure mode the 2026-08-18b
    svgp-1-pass probes hit at every bench scale)."""
    from spadot_tpu.train.loop import Trainer

    adata = make_synthetic_adata(n_per_tp=80, n_genes=20, n_tp=2)
    cfg = _tiny_config(adata)
    data = prepare_data(adata, cfg)
    trainer = Trainer(cfg, data)
    km = {
        "centers": {0: np.full((3, 20), np.nan), 1: np.zeros((3, 20))},
        "assign": {},
    }
    with pytest.raises(FloatingPointError, match="svgp_matmul_precision"):
        trainer.update_ot(km, {})
