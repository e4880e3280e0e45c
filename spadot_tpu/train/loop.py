"""Training engine: jit-compiled epochs over per-timepoint spot batches.

Orchestration parity with SpaDOT/utils/_train_utils.py:155-236 (train_SpaDOT):
AdamW(lr) + global-norm grad clip 0.3, cyclic-linear beta1 annealing, shuffled
timepoint order per epoch, KMeans loss from epoch 1, OT loss from `ot_epoch`
for every chronologically-non-first timepoint, per-epoch KMeans centroid
refresh and transport-plan refresh every `ot_epochs` epochs, loss bookkeeping
into loss.csv with the reference's column names.

TPU-native structure: each (timepoint-)epoch is ONE jitted `lax.scan` over a
static (num_batches, batch_size) index table — model forward, losses,
gradients, and the optimizer update all stay on device; the KMeans refresh
runs as a vmapped device kernel (ops/kmeans.py); only the tiny k×k centroid
OT solve runs on host float64 (ops/sinkhorn.py numpy backend). Host↔device
traffic per epoch is a handful of scalars.
"""
import os
import random
from collections import OrderedDict

import numpy as np
import pandas as pd

from spadot_tpu.config import load_model_config, resolve_dtype
from spadot_tpu.utils.logging import logger
from spadot_tpu.utils.rng import enable_compilation_cache, set_seed

LOSS_NAMES = ["elbo", "Recon", "SVGP_KL", "GAT_KL", "alignment", "KMeans", "OT"]


class Trainer:
    """Holds the model, optimizer, per-timepoint device data and jitted fns."""

    def __init__(self, model_config, data, mesh=None):
        import jax
        import jax.numpy as jnp
        import optax

        from spadot_tpu.models.model import build_net
        from spadot_tpu.ops.svgp import svgp_shared

        self.jax, self.jnp = jax, jnp
        self.config = model_config
        self.mesh = mesh
        if mesh is not None:
            # Pallas kernels have no GSPMD partitioning rules — under a mesh
            # every attention path must be plain XLA so the partitioner can
            # shard it (and so 1-dev and N-dev runs trace the same program)
            model_config = dict(model_config)
            model_config["use_pallas"] = False
            self.config = model_config
        self.net = build_net(model_config)
        from spadot_tpu.train.optim import adamw as _adamw

        self.tx = optax.chain(
            optax.clip_by_global_norm(0.3),  # _train_utils.py:216
            # optimizer_state_dtype: bfloat16 stores Adam m/v in bf16 (f32
            # math) — the mouse-scale gene-dim update is HBM-roofline on
            # the f32 moment streams (train/optim.py); default float32
            _adamw(
                float(model_config["lr"]), weight_decay=0.01,
                state_dtype=model_config.get(
                    "optimizer_state_dtype", "float32"
                ),
            ),
        )
        self.timepoints = list(data["timepoints"])
        self.kernel_type = model_config["kernel_type"]
        self.kernel_scale = float(model_config["kernel_scale"])
        self.n_clusters = int(model_config["n_clusters"])
        self.z_dim = int(model_config["z_dim"])
        # latent width: each branch emits z_dim // 2 dims (odd z_dim rounds
        # down, matching the reference's SVGP_z+GAT_z decoder input)
        mode = str(model_config.get("encoder_mode", "dual"))
        half = self.z_dim // 2
        self.latent_dim = 2 * half if mode == "dual" else half
        # exact-minibatch receptive-closure tables (data/pipeline.py builds
        # them when full_graph_gat=false and gat_exact_batches allows)
        self.gat_ext = all(
            "ext_idx" in data["tp_data"][tp] for tp in self.timepoints
        )
        # GAT execution: ext closures when present (exact, ~half the FLOPs);
        # otherwise exact full graph (gat_window=0) — including when the
        # 'auto' closure build was rejected for size. The O(window)
        # approximation runs ONLY on explicit opt-in
        # (full_graph_gat=false + gat_exact_batches=false).
        exact_cfg = str(model_config.get("gat_exact_batches", "auto")).lower()
        self.gat_window = (
            int(model_config.get("gat_window", 512))
            if (
                not model_config.get("full_graph_gat", True)
                and not self.gat_ext
                and exact_cfg in ("false", "0", "off")
            )
            else 0
        )
        # windows up to this many rows run dense-adjacency attention
        self.gat_window_dense_max = int(
            model_config.get("gat_window_dense_max", 10000)
        )
        if self.gat_window > 0:
            n_big = max(
                int(data["tp_data"][tp]["Y"].shape[0])
                for tp in self.timepoints
            )
            if n_big > 25_000:
                logger.warning(
                    "windowed GAT (gat_exact_batches: false) at %d spots: "
                    "the approximation measurably diverged at 51k spots "
                    "(NaN ~epoch 81, docs/performance.md) — the default "
                    "exact receptive-closure mode is both edge-exact and "
                    "faster at this scale; remove gat_exact_batches to "
                    "use it", n_big,
                )
        # stage a bfloat16 copy of the expression matrix for the GAT-branch
        # row gathers (pure HBM traffic — 6.6 ms/step at atlas from f32;
        # bf16 halves it). The gather result is upcast immediately
        # (models/model.py:_gat_ext_forward), and under the production
        # 1-pass bf16 matmul precision the first GAT matmul rounds its
        # operands to bf16 anyway — bit-identical results. 'auto' = TPU
        # backend + a bf16-class gat_matmul_precision; CPU keeps f32 (its
        # matmuls don't round operands, so pre-rounding would change math).
        bf16g = str(model_config.get("gat_bf16_gather", "auto")).lower()
        gat_prec = str(
            model_config.get("gat_matmul_precision", "default")
        ).lower()
        self.gat_bf16_gather = (self.gat_ext or self.gat_window > 0) and (
            bf16g in ("true", "1")
            or (
                bf16g == "auto"
                and jax.default_backend() == "tpu"
                and gat_prec in ("default", "bfloat16", "fastest")
            )
        )

        # vmapped closure-batch latent extraction (models/model.py:
        # full_latent_ext vmap_chunk): the sequential per-closure scan is
        # dispatch-glue-bound at every scale (8.3/19.9/201 ms/ep CH/mouse/
        # atlas, profile_*_series.log); 'auto' batches as many closures per
        # step as the HBM budget allows, on TPU only
        self.gat_ext_vmap_cfg = model_config.get("gat_ext_vmap", "auto")
        self.gat_ext_vmap_budget_mb = float(
            model_config.get("gat_ext_vmap_budget_mb", 1536)
        )
        self.ext_vmap_chunk = 1  # resolved below once ext shapes are known
        # nb-BATCHED banded-kernel extraction (models/model.py:
        # full_latent_ext kernel_batch): the closure axis lives in the
        # flash3b kernel grid itself (ops/gat_flash.py flash3bb) instead of
        # jax-level vmap — the round-4 vmap arm REGRESSED on banded tables
        # (2x146 vs 201 ms/ep at atlas) from op-level batching glue; this
        # is the round-5 kernel-grid form the backlog named — measured
        # dead end at atlas (auto=off; see _resolve_ext_kernel_batch).
        self.gat_ext_kernel_batch_cfg = model_config.get(
            "gat_ext_kernel_batch", "auto"
        )
        self.ext_kernel_batch = 0  # resolved below once ext shapes are known
        # latent-extraction GAT mode (config.yaml latent_ext_mode):
        # "auto"/"closure" = closure-batched full_latent_ext when ext
        # tables exist (the default since round 3); "full" = one
        # full-graph pass per timepoint (full_latent — the windowed-gather
        # aggregation path at large n). The closure form re-projects
        # ~P/b x the rows (P=7680 per 4096-row batch at atlas), so the
        # full pass does ~1.9x less layer-1 GEMM work there — A/B arm.
        self.latent_ext_mode = str(
            model_config.get("latent_ext_mode", "auto")
        ).lower()
        if self.latent_ext_mode not in ("auto", "closure", "full"):
            raise ValueError(
                f"latent_ext_mode={self.latent_ext_mode!r} — expected "
                "auto | closure | full"
            )
        # precomputed K̃-constant gemm solves (ops/svgp.py:svgp_shared);
        # false = per-step solve_triangular fallback (config.yaml)
        self.svgp_gemm_solves = bool(model_config.get("svgp_gemm_solves", True))
        # warm-start the per-epoch KMeans refresh from the previous epoch's
        # centers (ops/kmeans.py:kmeans_refit); cold kmeans++ x10 on the
        # first refresh only (config.yaml: kmeans_refresh_warm)
        self.kmeans_warm = bool(model_config.get("kmeans_refresh_warm", False))
        # early-stopping cap for the warm refresh Lloyd (config.yaml:
        # kmeans_refresh_warm_iters) — each iteration is tiny FLOPs but a
        # sequential device while step; the per-epoch assignment drift is
        # small so a low cap converges identically most epochs
        self.kmeans_warm_iters = int(
            model_config.get("kmeans_refresh_warm_iters", 100)
        )
        # statically unroll the fused epoch's per-tp refresh map instead of
        # the sequential lax.map (whose while glue measured 13.9-334 ms/ep;
        # see _fused_epoch_impl). auto = on for realistic timepoint counts.
        unroll_cfg = str(
            model_config.get("kmeans_refresh_unroll", "auto")
        ).lower()
        self.kmeans_refresh_unroll = unroll_cfg in ("true", "1") or (
            unroll_cfg == "auto" and len(self.timepoints) <= 8
        )

        # float32 by default; `dtype: float64` (with jax x64 enabled by
        # resolve_dtype) runs the data/SVGP path in f64 for parity ablations
        # against the reference's float64 training (SpaDOT/train.py:27)
        name = str(model_config.get("dtype", "float32")).lower()
        dtype = jnp.float64 if name in ("float64", "f64", "double") else jnp.float32
        if dtype == jnp.float64 and not jax.config.jax_enable_x64:
            from spadot_tpu.config import resolve_dtype

            resolve_dtype(model_config)
        self.dtype = dtype
        # true (unpadded) spot counts — device arrays may be row-padded
        self.tp_n = {
            tp: int(data["tp_data"][tp]["Y"].shape[0]) for tp in self.timepoints
        }
        fused_cfg = str(model_config.get("fused_epoch", "auto")).lower()
        self.fused = (
            fused_cfg in ("auto", "true", "1")
            and (self.gat_window == 0 or self.gat_ext)
        )
        self.tp_dev = OrderedDict()
        self.svgp_states = OrderedDict()
        from spadot_tpu.parallel.mesh import shard_tp_data

        for tp in self.timepoints:
            d = data["tp_data"][tp]
            if self.fused:
                # ONE dataset upload: the per-tp device arrays are carved out
                # of the fused stack below as device-side slices (over the
                # remote tunnel the duplicate upload used to cost as much as
                # the stack itself at atlas scale)
                self.tp_dev[tp] = None
            else:
                dev = {
                    "Y": jnp.asarray(d["Y"], dtype),
                    "coords": jnp.asarray(d["coords"], dtype),
                    "nbr": jnp.asarray(d["nbr"]),
                    "nbr_mask": jnp.asarray(d["nbr_mask"], dtype),
                    "N_train": jnp.asarray(d["N_train"], dtype),
                }
                rev_cfg = model_config.get("gat_rev_backward", True)
                if ("rev_src" in d and rev_cfg not in (False, "off")
                        and "ext_idx" not in d):
                    # scatter-free GAT backward lists (ops/gat.py); ext mode
                    # never touches them (closure subgraphs run dense or
                    # gather attention)
                    dev["rev_src"] = jnp.asarray(d["rev_src"])
                    dev["rev_slot"] = jnp.asarray(d["rev_slot"])
                    dev["rev_mask"] = jnp.asarray(d["rev_mask"], dtype)
                if "adj" in d and mesh is None:
                    # dense small-n attention path (single-device only: on a
                    # mesh the row-sharded gather path is used so 1-dev and
                    # N-dev runs trace identically); int8 pad_adjacency mask
                    dev["adj"] = jnp.asarray(d["adj"])
                if self.gat_bf16_gather:
                    dev["Y_gat"] = jnp.asarray(d["Y"], jnp.bfloat16)
                if mesh is not None:
                    dev = shard_tp_data(dev, mesh)
                self.tp_dev[tp] = dev
            Z = jnp.asarray(data["inducing_points"][tp], dtype)
            self.svgp_states[tp] = svgp_shared(
                Z, self.kernel_type, self.kernel_scale
            )
            if not self.svgp_gemm_solves:
                # config A/B escape: drop the K̃ constants so ops/svgp.py
                # takes its per-step solve_triangular fallback
                self.svgp_states[tp] = {
                    k: v for k, v in self.svgp_states[tp].items()
                    if k in ("Z", "K_mm", "L_mm")
                }
        self.tp_batches = {
            tp: (
                jnp.asarray(data["tp_data"][tp]["batch_idx"]),
                jnp.asarray(data["tp_data"][tp]["batch_mask"], dtype),
            )
            for tp in self.timepoints
        }
        self.tp_ext = {}
        if self.gat_ext and not self.fused:
            for tp in self.timepoints:
                d = data["tp_data"][tp]
                self.tp_ext[tp] = {
                    "ext_idx": jnp.asarray(d["ext_idx"]),
                    "ext_mask": jnp.asarray(d["ext_mask"], dtype),
                    "loc_nbr": jnp.asarray(d["loc_nbr"]),
                    "loc_mask": jnp.asarray(d["loc_mask"], dtype),
                    "batch_pos": jnp.asarray(d["batch_pos"]),
                }
                if "ext_adj" in d:
                    # static closure adjacencies (graph.py:closure_adjacency)
                    self.tp_ext[tp]["ext_adj"] = jnp.asarray(d["ext_adj"])
        self.obs_rows = {tp: data["tp_data"][tp]["obs_rows"] for tp in self.timepoints}
        if self.gat_ext:
            self.ext_kernel_batch = self._resolve_ext_kernel_batch(data)
            if self.ext_kernel_batch <= 1:
                self.ext_vmap_chunk = self._resolve_ext_vmap_chunk(data)

        self._epoch_jit = jax.jit(self._epoch_impl, donate_argnums=(0, 1))
        self._latent_jit = jax.jit(self._latent_impl)
        self._refresh_jit = jax.jit(
            self._refresh_impl, static_argnames=("n", "tp_i")
        )
        # fused stacked-timepoint epoch: pad all per-tp shapes to a common
        # (T, ...) stack so a WHOLE epoch — every timepoint's batch scan plus
        # the KMeans refresh — is ONE dispatch, with the shuffled timepoint
        # order passed as data. Over the remote-TPU tunnel the per-epoch
        # round trips dominate wall clock (docs/performance.md), so this is
        # the single biggest latency lever. Under a mesh the stacked arrays
        # are spot-sharded (axis 1) with params/centroids replicated, so the
        # whole fused epoch partitions over the devices too.
        if self.fused:
            self._stacked = self._build_stacked(data)
            self._fused_jit = jax.jit(
                self._fused_epoch_impl, donate_argnums=(0, 1)
            )
            self._perm_cache = {}
            self._flag_cache = {}
            k, z = self.n_clusters, self.latent_dim
            T = len(self.timepoints)
            self._gamma_stack = self._replicate(jnp.zeros((T, k, k), dtype))
            self._km_stacked = (
                self._replicate(jnp.zeros((T, k, z), dtype)),
                self._replicate(
                    jnp.zeros((T, self._stacked["Y"].shape[1]), jnp.int32)
                ),
            )
            # per-tp device views carved from the stack (row-padded to n_max;
            # padded rows carry self-loop sentinels and row_mask 0, which
            # full_latent/forward_batch honor): the per-tp epoch, latent and
            # refresh paths stay fully functional without a second upload
            s = self._stacked
            for i, tp in enumerate(self.timepoints):
                dev = {
                    "Y": s["Y"][i], "coords": s["coords"][i],
                    "nbr": s["nbr"][i], "nbr_mask": s["nbr_mask"][i],
                    "row_mask": s["row_mask"][i],
                    "N_train": s["N_train"][i],
                }
                if "adj" in s:
                    dev["adj"] = s["adj"][i]
                if "Y_gat" in s:
                    dev["Y_gat"] = s["Y_gat"][i]
                self.tp_dev[tp] = dev
                if self.gat_ext:
                    from spadot_tpu.models.model import ext_keys_of

                    nb = data["tp_data"][tp]["batch_idx"].shape[0]
                    self.tp_ext[tp] = {
                        k2: s[k2][i, :nb] for k2 in ext_keys_of(s)
                    }
        # staged tiny device constants: over the remote-TPU tunnel every
        # host->device transfer costs a round trip, so the per-epoch scalars
        # (beta1, use_kmeans, use_ot), the zero placeholders and the
        # row-normalized transport plans are staged once and reused
        self._scalar_cache = {}
        self._zeros_kz = jnp.zeros((self.n_clusters, self.latent_dim), dtype)
        self._zeros_kk = jnp.zeros((self.n_clusters, self.n_clusters), dtype)
        self._zeros_assign = {
            tp: jnp.zeros((self.tp_n[tp],), jnp.int32) for tp in self.timepoints
        }
        self._gamma_dev = {}
        self._gamma_src = {}

    def _replicate(self, arr):
        """Explicitly replicated placement on the mesh (identity off-mesh) —
        centroid/plan stacks feed the fused jit every epoch and must not be
        left to default single-device placement."""
        if self.mesh is None:
            return arr
        from spadot_tpu.parallel.mesh import replicated

        return self.jax.device_put(arr, replicated(self.mesh))

    # -- initialization -----------------------------------------------------
    def init_state(self, key):
        jnp = self.jnp
        tp0 = self.timepoints[0]
        d = self.tp_dev[tp0]
        nbr_small = jnp.clip(d["nbr"][:8], 0, 7)
        variables = self.net.init(
            key, d["Y"][:8], nbr_small, d["nbr_mask"][:8], train=True
        )
        if "batch_stats" not in variables:
            variables = {"params": variables["params"], "batch_stats": {}}
        variables = dict(variables)
        # flax BatchNorm initializes running stats in float32 regardless of
        # param_dtype; align them so the scan carry dtype is stable in f64 mode
        variables["batch_stats"] = self.jax.tree_util.tree_map(
            lambda x: x.astype(self.dtype), variables["batch_stats"]
        )
        opt_state = self.tx.init(variables["params"])
        return variables, opt_state

    # -- jitted epoch over one timepoint ------------------------------------
    def _make_batch_step(
        self, tp_data, svgp_state, km_centers, km_assign, prev_centers,
        gamma_rn, beta1, use_kmeans, use_ot, gated=False,
    ):
        """Scan body for one optimizer step on one batch.

        Scan xs are a dict: always idx (b,) + msk (b,); gated=True adds
        `valid` — a 0-valid step (row padding of the fused stacked-timepoint
        epoch) computes everything but commits NOTHING — params, optimizer
        state and batch stats all keep their old values, so a padded batch is
        exactly a no-op (AdamW's weight decay and moment updates must not
        advance either). Exact-minibatch mode adds the per-batch
        receptive-closure tables (ext_idx/ext_mask/loc_nbr/loc_mask/
        batch_pos, data/graph.py:receptive_tables).
        """
        jax, jnp = self.jax, self.jnp
        import optax

        from spadot_tpu.models.model import forward_batch, kmeans_loss, ot_loss

        cfg = self.config
        lam1 = float(cfg["lambda1"])
        b2 = float(cfg["beta2"])
        o1, o2, o3 = float(cfg["omiga1"]), float(cfg["omiga2"]), float(cfg["omiga3"])

        def batch_step(carry, batch):
            variables, opt_state, rng = carry
            idx, msk = batch["idx"], batch["msk"]
            valid = batch["valid"] if gated else None
            ext = None
            y_ext = None
            if "ext_idx" in batch:
                from spadot_tpu.models.model import ext_xs

                ext = ext_xs(batch)
                y_ext = batch.get("Y_ext")
            rng, sub = jax.random.split(rng)

            def loss_fn(params):
                vars_in = {"params": params, "batch_stats": variables["batch_stats"]}
                losses, latent, new_state = forward_batch(
                    self.net, vars_in, sub, tp_data, svgp_state, idx, msk,
                    kernel_scale=self.kernel_scale, kernel_type=self.kernel_type,
                    train=True, gat_window=self.gat_window,
                    gat_window_dense_max=self.gat_window_dense_max,
                    ext=ext, y_ext=y_ext, y_b=batch.get("y_b"),
                )
                km = use_kmeans * kmeans_loss(
                    latent, idx, msk, km_assign, km_centers, self.latent_dim
                )
                otl = use_ot * ot_loss(
                    latent, idx, msk, km_assign, km_centers, prev_centers, gamma_rn
                )
                elbo = (
                    lam1 * losses["Recon"]
                    - beta1 * losses["SVGP_KL"]
                    + b2 * losses["GAT_KL"]
                    + o1 * losses["alignment"]
                    + o2 * km
                    + o3 * otl
                )
                return elbo, (losses, km, otl, new_state)

            (elbo, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                variables["params"]
            )
            losses, km, otl, new_state = aux
            updates, new_opt = self.tx.update(grads, opt_state, variables["params"])
            params = optax.apply_updates(variables["params"], updates)
            new_stats = (
                new_state.get("batch_stats", variables["batch_stats"])
                if new_state else variables["batch_stats"]
            )
            if gated:
                keep = lambda new, old: jax.tree_util.tree_map(
                    lambda a, b: jnp.where(valid > 0, a, b), new, old
                )
                params = keep(params, variables["params"])
                new_opt = keep(new_opt, opt_state)
                new_stats = keep(new_stats, variables["batch_stats"])
            new_vars = {"params": params, "batch_stats": new_stats}
            vec = jnp.stack(
                [elbo, losses["Recon"], losses["SVGP_KL"], losses["GAT_KL"],
                 losses["alignment"], km, otl]
            )
            if gated:
                vec = vec * valid
            return (new_vars, new_opt, rng), vec

        return batch_step

    def _epoch_impl(
        self, variables, opt_state, rng, tp_dev, svgp_state, batch_idx,
        batch_mask, ext_tables, km_centers, km_assign, prev_centers, gamma_rn,
        beta1, use_kmeans, use_ot,
    ):
        jax, jnp = self.jax, self.jnp

        batch_step = self._make_batch_step(
            tp_dev, svgp_state, km_centers, km_assign, prev_centers, gamma_rn,
            beta1, use_kmeans, use_ot,
        )
        xs = {"idx": batch_idx, "msk": batch_mask}
        if ext_tables:
            xs.update(ext_tables)
        (variables, opt_state, rng), vecs = jax.lax.scan(
            batch_step, (variables, opt_state, rng), xs
        )
        return variables, opt_state, rng, jnp.mean(vecs, axis=0)

    def _resolve_ext_vmap_chunk(self, data):
        """Closure batches per vmapped extraction step (gat_ext_vmap):
        'auto' = fit as many closures as `gat_ext_vmap_budget_mb` allows
        (estimate: gathered rows P·G f32 + 3 layers of (P, H·F) activations
        + the dense P² int8 adjacency when the closure runs dense), TPU
        only — on CPU the scan's dispatch glue is not the bottleneck and
        the multiplied working set can blow host RAM. An explicit integer
        forces that chunk on any backend (tests use this)."""
        val = str(self.gat_ext_vmap_cfg).lower()
        if val in ("0", "off", "false", "none", "1"):
            return 1
        nb_max = p_max = g_max = 0
        banded = False
        for tp in self.timepoints:
            d = data["tp_data"][tp]
            if "ext_idx" not in d:
                return 1
            nb_max = max(nb_max, int(d["ext_idx"].shape[0]))
            p_max = max(p_max, int(d["ext_idx"].shape[1]))
            g_max = max(g_max, int(d["Y"].shape[1]))
            if "ext_adj" in d and np.asarray(d["ext_adj"]).ndim == 4:
                banded = True
        if val != "auto":
            return max(1, min(int(self.gat_ext_vmap_cfg), nb_max))
        if self.jax.default_backend() != "tpu":
            return 1
        if banded:
            # one-window attribution at atlas scale (2026-08-20,
            # bench_atlas_{r4,extoff,vmapoff,unrolloff}.log): vmapping the
            # BANDED flash3b closure extraction costs ~2x the sequential
            # scan it replaces (two 146 ms/ep vmapped loops vs the 201
            # ms/ep scan, profile_atlas_r4.log) — atlas 1.7065 vmap-on vs
            # 1.5979 vmap-off (unroll on, both). Dense-closure scales keep
            # the vmap (-9.6% CH). Force with an explicit integer.
            logger.info(
                "gat_ext_vmap auto: OFF (banded closure tables — vmapped "
                "flash3b extraction measured 2x the sequential scan)"
            )
            return 1
        hf = int(self.net.gat_encoder_hidden) * int(self.net.gat_attention_heads)
        per = p_max * g_max * 4 + 3 * p_max * hf * 4
        if p_max <= self.gat_window_dense_max:
            per += p_max * p_max  # int8 closure adjacency
        c = int(self.gat_ext_vmap_budget_mb * 1e6 // max(per, 1))
        c = max(1, min(c, nb_max))
        # balance the chunks: nb=7, c=6 would scan 2 steps of 6 (5 sentinel
        # pads); 2 steps of 4 does the same work with 1 pad
        if c > 1:
            nc = -(-nb_max // c)
            c = -(-nb_max // nc)
        logger.info(
            "gat_ext_vmap auto: chunk=%d (nb=%d, P=%d, G=%d, ~%d MB/closure)",
            c, nb_max, p_max, g_max, per // 1_000_000,
        )
        return c

    def _resolve_ext_kernel_batch(self, data):
        """Closures per BATCHED-KERNEL extraction step
        (gat_ext_kernel_batch): banded static-adjacency tables run the nb
        axis inside the flash3b kernel grid
        (ops/gat_flash.py:gat_attention_banded_flash_batched) with the Wx
        projections as single large GEMMs. MEASURED DEAD END at the only
        scale with banded tables (see the auto comment below) — 'auto'
        resolves 0; an explicit integer forces the chunk (tests / A/B
        reproduction); 0/off disables (sequential scan or, for dense
        tables, the vmap path)."""
        val = str(self.gat_ext_kernel_batch_cfg).lower()
        if val in ("0", "off", "false", "none", "1"):
            return 0
        nb_max = 0
        for tp in self.timepoints:
            d = data["tp_data"][tp]
            if "ext_idx" not in d or "ext_adj" not in d:
                return 0
            if np.asarray(d["ext_adj"]).ndim != 4:
                return 0  # dense closures: the chunked vmap won at CH
            nb_max = max(nb_max, int(d["ext_idx"].shape[0]))
        if val != "auto":
            # explicit integer forces the chunk on any backend (the
            # GATLayer batched branch falls back to the vmapped XLA
            # banded path when the fused kernel is unsupported)
            return max(0, min(int(self.gat_ext_kernel_batch_cfg), nb_max))
        # auto = OFF, measured (2026-08-20, one window, atlas 2x102,400 /
        # batch 4096 / banded P=7680): kernel-batched extraction at the
        # auto chunk 4 measured 1.9259 s/ep vs 1.525 for the same code
        # with the sequential scan (bench_atlas_flash3bb.log vs
        # bench_atlas_kbatch0.log) — +25%, WORSE than even the vmap dead
        # end's ratio. Mechanism: the atlas extraction scan is WORK-bound
        # (closure gathers + first-layer GEMMs + banded kernels are ~90%
        # of its 100.7 ms/ep), not dispatch-glue-bound like the CH/mouse
        # dense scans, so batching only multiplies the live working set
        # (~363 MB/chunk-step) and degrades overlap. Banded tables only
        # exist at these scales, so auto never engages; an explicit
        # integer reproduces the arm.
        return 0

    def _latent_impl(self, variables, tp_dev, svgp_state, ext_tables=None):
        from spadot_tpu.models.model import full_latent, full_latent_ext

        # row_mask present when tp_dev is a row-padded view of the fused
        # stack: padded rows must not enter the SVGP posterior or n_eff
        if self.latent_ext_mode == "full":
            ext_tables = None  # full-graph pass (values identical)
        if ext_tables is not None:
            # receptive-closure GAT (proven equal to full-graph at the
            # batch rows) — the closures run the fused dense kernels where
            # the 100k-row full graph only has the gather path
            return full_latent_ext(
                self.net, variables, tp_dev, svgp_state, ext_tables,
                kernel_scale=self.kernel_scale, kernel_type=self.kernel_type,
                row_mask=tp_dev.get("row_mask"),
                gat_window_dense_max=self.gat_window_dense_max,
                vmap_chunk=self.ext_vmap_chunk,
                kernel_batch=self.ext_kernel_batch,
            )
        return full_latent(
            self.net, variables, tp_dev, svgp_state,
            kernel_scale=self.kernel_scale, kernel_type=self.kernel_type,
            row_mask=tp_dev.get("row_mask"),
        )

    # -- public API ---------------------------------------------------------
    def _scalar(self, value):
        """Device scalar, staged once per distinct value (tunnel round trips)."""
        key = float(value)
        dev = self._scalar_cache.get(key)
        if dev is None:
            dev = self.jnp.asarray(key, self.dtype)
            self._scalar_cache[key] = dev
        return dev

    def run_epoch(self, variables, opt_state, rng, tp, km, gammas, tp_i, epoch, beta1):
        """One timepoint's epoch. km: dict with centers/assign per tp."""
        have_km = km["centers"].get(tp) is not None
        use_kmeans = 1.0 if (epoch >= 1 and have_km) else 0.0
        centers = km["centers"][tp] if have_km else self._zeros_kz
        assign = km["assign"][tp] if have_km else self._zeros_assign[tp]
        prev_centers = self._zeros_kz
        gamma_rn = self._zeros_kk
        use_ot = 0.0
        if epoch >= int(self.config["ot_epoch"]) and tp_i != 0:
            prev_tp = self.timepoints[tp_i - 1]
            gkey = f"{prev_tp}_{tp}"
            if gkey in gammas and (
                gkey not in self._gamma_dev
                or not np.array_equal(
                    self._gamma_src.get(gkey), np.asarray(gammas[gkey])
                )
            ):
                # caller provided a plan that was never staged, or changed
                # the staged one — by replacement OR in-place mutation (a
                # direct run_epoch driver reusing one buffer per gkey) —
                # stage it so training never uses a stale plan silently.
                # Plans are centroid-level (k, k), so the content compare
                # is a few hundred elements per timepoint per epoch.
                self.stage_gammas({gkey: gammas[gkey]})
            if gkey in self._gamma_dev and km["centers"].get(prev_tp) is not None:
                gamma_rn = self._gamma_dev[gkey]
                prev_centers = km["centers"][prev_tp]
                use_ot = 1.0
        batch_idx, batch_mask = self.tp_batches[tp]
        variables, opt_state, rng, losses = self._epoch_jit(
            variables, opt_state, rng, self.tp_dev[tp], self.svgp_states[tp],
            batch_idx, batch_mask, self.tp_ext.get(tp), centers, assign,
            prev_centers, gamma_rn,
            self._scalar(beta1), self._scalar(use_kmeans), self._scalar(use_ot),
        )
        # losses stay on device — the caller syncs once per epoch at most
        return variables, opt_state, rng, losses

    def latent(self, variables, tp):
        lat = self._latent_jit(
            variables, self.tp_dev[tp], self.svgp_states[tp],
            self.tp_ext.get(tp),
        )
        return lat[: self.tp_n[tp]]

    def _refresh_impl(self, variables, tp_dev, svgp_state, key, ext_tables,
                      prev_centers=None, *, n, tp_i):
        """Latent extraction + KMeans refresh for one timepoint, fused into a
        single dispatch (the per-epoch refresh is tunnel-latency-bound).
        With `prev_centers`, warm-start Lloyd instead of the cold
        10-restart kmeans++ fit (kmeans_refresh_warm)."""
        from spadot_tpu.ops.kmeans import _kmeans_fit_impl, _warm_refit_impl

        jax = self.jax
        lat = self._latent_impl(variables, tp_dev, svgp_state, ext_tables)[:n]
        sub = jax.random.fold_in(key, tp_i)
        with jax.default_matmul_precision("highest"):
            if prev_centers is not None:
                centers, labels, _ = _warm_refit_impl(
                    lat, prev_centers, None, self.kmeans_warm_iters
                )
            else:
                centers, labels, _ = _kmeans_fit_impl(
                    sub, lat, self.n_clusters, None, 10, 100
                )
        return centers, labels

    def update_kmeans(self, variables, key, km):
        """Per-epoch centroid refresh (_train_utils.py:255-269), on device —
        one fused (latent + kmeans) dispatch per timepoint."""
        for i, tp in enumerate(self.timepoints):
            prev = km["centers"].get(tp) if self.kmeans_warm else None
            centers, labels = self._refresh_jit(
                variables, self.tp_dev[tp], self.svgp_states[tp], key,
                self.tp_ext.get(tp), prev, n=self.tp_n[tp], tp_i=i,
            )
            km["centers"][tp] = centers
            km["assign"][tp] = labels
        return km

    def stage_gammas(self, gammas):
        """Stage row-normalized transport plans on device (resume path)."""
        for gkey, gamma in gammas.items():
            # snapshot the staged content: run_epoch re-stages when a
            # caller's gammas[gkey] no longer matches it (replacement or
            # in-place mutation alike)
            self._gamma_src[gkey] = np.array(gamma, copy=True)
            g = np.asarray(gamma, np.float64)
            rs = g.sum(axis=1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                g = g / rs
            g = np.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0)
            self._gamma_dev[gkey] = self.jnp.asarray(g, self.dtype)
        if self.fused and gammas:
            # chrono stack: row i holds the (tp_{i-1} -> tp_i) plan, reusing
            # the already-normalized staged entries
            k = self.n_clusters
            stack = np.zeros((len(self.timepoints), k, k), np.float64)
            for i in range(1, len(self.timepoints)):
                gkey = f"{self.timepoints[i - 1]}_{self.timepoints[i]}"
                if gkey in self._gamma_dev:
                    stack[i] = np.asarray(self._gamma_dev[gkey])
            self._gamma_stack = self._replicate(
                self.jnp.asarray(stack, self.dtype)
            )

    # -- fused stacked-timepoint epoch ---------------------------------------
    def _build_stacked(self, data):
        """Pad every per-timepoint array to common shapes and stack to (T, ...)
        device arrays (chronological order). Padded ROWS carry a self-loop
        sentinel (so no attention softmax row is ever empty), padded BATCHES
        carry one sentinel row with zero step-validity (the gated batch step
        commits nothing), and padded INDUCING slots are exactly inert via
        `svgp_shared_padded`."""
        import jax.numpy as jnp

        from spadot_tpu.ops.svgp import svgp_shared_padded

        tps = self.timepoints
        T = len(tps)
        td = data["tp_data"]
        np_dt = np.float64 if self.dtype == jnp.float64 else np.float32
        n_max = max(self.tp_n[tp] for tp in tps)
        n_dev = 1
        if self.mesh is not None:
            # spot axis must divide the mesh for even row sharding; the extra
            # rows are ordinary padding (self-loop sentinel, row_mask 0)
            n_dev = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
            n_max = -(-n_max // n_dev) * n_dev
        # batch-row streaming (batch_rows_stream): batches are contiguous row
        # blocks, so padding the spot axis to exactly nb_max*B lets the fused
        # scan stream each step's y_b as a (B, G) slice of a free reshape
        # view of the stacked Y — replacing the per-step (B, G) row gather
        # (same latency-bound class as the Y_ext gather). Values at
        # tail/sentinel slots differ from the clamped gather's but both
        # paths mask them to exactly zero (models/model.py) — bit-identical
        # losses (tests/test_exact_batches.py). Off under a mesh (the spot
        # axis must divide n_dev instead).
        st_cfg = str(self.config.get("batch_rows_stream", "false")).lower()
        B0 = td[tps[0]]["batch_idx"].shape[1]
        nb_max0 = max(td[tp]["batch_idx"].shape[0] for tp in tps)
        st_want = st_cfg in ("true", "1") or (
            st_cfg == "auto" and self.jax.default_backend() == "tpu"
        )
        self._stream_y = st_want and self.mesh is None
        if st_want and self.mesh is not None:
            logger.info(
                "batch_rows_stream is OFF under a mesh (the spot axis must "
                "divide the device count, not nb*B) — the per-step y_b "
                "gather runs instead"
            )
        if self._stream_y:
            n_max = nb_max0 * B0  # >= max rows by construction
        # pregathered closure rows (gat_ext_pregather) — decided EARLY so the
        # bf16 Y_gat staging below can be skipped when nothing will read it
        # (with Y_ext present, training steps and the fused refresh never
        # gather from Y_gat; only the final latent extraction would, and it
        # simply falls back to the f32 rows). 'true' forces it wherever
        # feasible; under a mesh it is off either way (the (T, nb, P, G)
        # stack is not spot-sharded and would be replicated per device).
        pg_cfg = str(self.config.get("gat_ext_pregather", "false")).lower()
        pg_want = self.gat_ext and (
            pg_cfg in ("true", "1")
            or (pg_cfg == "auto" and self.jax.default_backend() == "tpu")
        )
        self._pregather_y = pg_want and self.mesh is None
        if pg_want and self.mesh is not None:
            logger.info(
                "gat_ext_pregather is OFF under a mesh (the (T, nb, P, G) "
                "stack would be replicated on every device) — the per-step "
                "closure gather runs instead"
            )
        if self._pregather_y:
            G0 = td[tps[0]]["Y"].shape[1]
            P_max0 = max(td[tp]["ext_idx"].shape[1] for tp in tps)
            pg_bytes = (
                T * nb_max0 * P_max0 * G0
                * (2 if self.gat_bf16_gather else 4)
            )
            if pg_cfg == "auto" and pg_bytes > 4 * 2**30:
                self._pregather_y = False
            elif pg_bytes > 2**30:
                logger.info(
                    "gat_ext_pregather stages %.1f GiB of closure rows in "
                    "HBM", pg_bytes / 2**30,
                )
        G = td[tps[0]]["Y"].shape[1]
        Cc = td[tps[0]]["coords"].shape[1]
        K_max = max(td[tp]["nbr"].shape[1] for tp in tps)
        Y = np.zeros((T, n_max, G), np_dt)
        C = np.zeros((T, n_max, Cc), np_dt)
        NB = np.zeros((T, n_max, K_max), np.int32)
        NM = np.zeros((T, n_max, K_max), np_dt)
        RM = np.zeros((T, n_max), np_dt)
        Ntr = np.zeros((T,), np_dt)
        have_adj = all("adj" in td[tp] for tp in tps)
        if have_adj:
            # per-tp adj is already lane-padded int8 (np_i, np_i); stack
            np_max = max(td[tp]["adj"].shape[0] for tp in tps)
            A = np.zeros((T, np_max, np_max), np.int8)
        else:
            A = None
        for i, tp in enumerate(tps):
            d = td[tp]
            n, k = d["Y"].shape[0], d["nbr"].shape[1]
            Y[i, :n] = d["Y"]
            C[i, :n] = d["coords"]
            NB[i, :n, :k] = d["nbr"]
            NM[i, :n, :k] = d["nbr_mask"]
            NB[i, n:, 0] = np.arange(n, n_max)
            NM[i, n:, 0] = 1.0
            RM[i, :n] = 1.0
            Ntr[i] = float(d["N_train"])
            if have_adj:
                np_i = d["adj"].shape[0]
                A[i, :np_i, :np_i] = d["adj"]
                pad_rows = np.arange(np_i, A.shape[1])
                A[i, pad_rows, pad_rows] = 1.0
        # padded SVGP states (exact — ops/svgp.py:svgp_shared_padded)
        m_max = max(len(data["inducing_points"][tp]) for tp in tps)
        Zs, Ks, Ls, MMs, KCs = [], [], [], [], []
        Lis, Cs, Ms, KTs, Fs, LCs = [], [], [], [], [], []
        for tp in tps:
            state, m_mask, kl_const = svgp_shared_padded(
                jnp.asarray(data["inducing_points"][tp], self.dtype), m_max,
                self.kernel_type, self.kernel_scale,
            )
            Zs.append(state["Z"])
            Ks.append(state["K_mm"])
            Ls.append(state["L_mm"])
            Lis.append(state["L_inv"])
            Cs.append(state["C"])
            Ms.append(state["M"])
            KTs.append(state["Kt_inv"])
            Fs.append(state["F"])
            LCs.append(state["logdet_CCj"])
            MMs.append(m_mask)
            KCs.append(kl_const)
        # batch tables: pad to nb_max with sentinel batches (valid = 0)
        nb_max = max(td[tp]["batch_idx"].shape[0] for tp in tps)
        B = td[tps[0]]["batch_idx"].shape[1]
        BI = np.zeros((T, nb_max, B), np.int32)
        BM = np.zeros((T, nb_max, B), np_dt)
        BV = np.zeros((T, nb_max), np_dt)
        for i, tp in enumerate(tps):
            bi, bm = td[tp]["batch_idx"], td[tp]["batch_mask"]
            nb = bi.shape[0]
            BI[i, :nb] = bi
            BM[i, :nb] = bm
            BV[i, :nb] = 1.0
            BM[i, nb:, 0] = 1.0  # sentinel row keeps masked BatchNorm finite
        stacked = {
            "Y": jnp.asarray(Y), "coords": jnp.asarray(C),
            "nbr": jnp.asarray(NB), "nbr_mask": jnp.asarray(NM),
            "row_mask": jnp.asarray(RM), "N_train": jnp.asarray(Ntr),
            "Z": jnp.stack(Zs), "K_mm": jnp.stack(Ks), "L_mm": jnp.stack(Ls),
            "m_mask": jnp.stack(MMs),
            "kl_const": jnp.asarray(np.asarray(KCs, np_dt)),
            "batch_idx": jnp.asarray(BI), "batch_mask": jnp.asarray(BM),
            "batch_valid": jnp.asarray(BV),
        }
        if self.svgp_gemm_solves:
            stacked.update(
                {"L_inv": jnp.stack(Lis), "C": jnp.stack(Cs),
                 "M": jnp.stack(Ms), "Kt_inv": jnp.stack(KTs),
                 "F": jnp.stack(Fs), "logdet_CCj": jnp.stack(LCs)}
            )
        if have_adj:
            stacked["adj"] = jnp.asarray(A)
        if self.gat_bf16_gather and not self._pregather_y:
            # with pregathered closure rows no step reads Y_gat — staging it
            # would hold a dead (T, n_max, G) bf16 copy in HBM (the final
            # latent extraction falls back to the f32 rows, strictly better)
            stacked["Y_gat"] = jnp.asarray(Y, jnp.bfloat16)
        if self.gat_ext:
            # stack the receptive-closure tables: pad nb -> nb_max with
            # sentinel batches and P/K to the cross-timepoint max; every
            # padded row keeps a self-loop so no softmax row is empty
            P_max = max(td[tp]["ext_idx"].shape[1] for tp in tps)
            K_ext = max(td[tp]["loc_nbr"].shape[2] for tp in tps)
            EI = np.zeros((T, nb_max, P_max), np.int32)
            EM = np.zeros((T, nb_max, P_max), np_dt)
            LN = np.zeros((T, nb_max, P_max, K_ext), np.int32)
            LM = np.zeros((T, nb_max, P_max, K_ext), np_dt)
            BP = np.zeros((T, nb_max, B), np.int32)
            # default: self-loop sentinel everywhere (covers sentinel batches
            # and the P padding band of real batches alike)
            LN[:, :, :, 0] = np.arange(P_max)[None, None, :]
            LM[:, :, :, 0] = 1.0
            for i, tp in enumerate(tps):
                d = td[tp]
                nb, p, kk = d["loc_nbr"].shape
                EI[i, :nb, :p] = d["ext_idx"]
                EM[i, :nb, :p] = d["ext_mask"]
                LN[i, :nb, :p, :] = 0
                LM[i, :nb, :p, :] = 0.0
                LN[i, :nb, :p, :kk] = d["loc_nbr"]
                LM[i, :nb, :p, :kk] = d["loc_mask"]
                BP[i, :nb] = d["batch_pos"]
            stacked.update(
                ext_idx=jnp.asarray(EI), ext_mask=jnp.asarray(EM),
                loc_nbr=jnp.asarray(LN), loc_mask=jnp.asarray(LM),
                batch_pos=jnp.asarray(BP),
            )
            ea_list = [td[tp].get("ext_adj") for tp in tps]
            ranks = {e.ndim for e in ea_list if e is not None}
            # the banded stack needs ONE strip height across timepoints; the
            # auto TI choice is per-tp (band/P dependent), so mixed heights —
            # or a banded/square mix — fall back to the per-step scatter
            # build (correct, just slower; _gat_ext_forward)
            same_ti = (
                ranks == {4}
                and len({e.shape[2] for e in ea_list if e is not None}) == 1
            )
            if all(e is not None for e in ea_list) and same_ti:
                # banded masks (nb, ni, TI, Wb): center-align each tp's band
                # inside the cross-tp max window; sentinel strips/batches get
                # the center diagonal (self-loop) — mirrors the LN sentinel
                ti_b = ea_list[0].shape[2]
                wb_max = max(e.shape[3] for e in ea_list)
                ni_max = P_max // ti_b
                EA = np.zeros((T, nb_max, ni_max, ti_b, wb_max), np.int8)
                r = np.arange(ti_b)
                EA[:, :, :, r, r + (wb_max - ti_b) // 2] = 1
                for i, tp in enumerate(tps):
                    e = td[tp]["ext_adj"]
                    nb, ni, _, wb = e.shape
                    dpad = (wb_max - wb) // 2
                    EA[i, :nb, :ni] = 0
                    EA[i, :nb, :ni, :, dpad:dpad + wb] = e
                stacked["ext_adj"] = jnp.asarray(EA)
            elif all(e is not None for e in ea_list) and ranks == {3}:
                # square static masks: self-loop diagonal everywhere
                # (sentinel batches and the P padding band), real blocks
                # copied in — mirrors the LN/LM sentinel convention
                EA = np.zeros((T, nb_max, P_max, P_max), np.int8)
                di = np.arange(P_max)
                EA[:, :, di, di] = 1
                for i, tp in enumerate(tps):
                    d = td[tp]
                    nb, p, _ = d["ext_adj"].shape
                    # real (p, p) blocks are exact (they carry their own
                    # self-loops); rows >= p keep the diagonal sentinel
                    EA[i, :nb, :p, :p] = d["ext_adj"]
                stacked["ext_adj"] = jnp.asarray(EA)
            elif any(e is not None for e in ea_list):
                logger.info(
                    "closure masks differ across timepoints (banded/square "
                    "mix or unequal strip heights); the fused epoch uses the "
                    "per-step adjacency build instead of a static stack"
                )
            # pre-gathered closure rows (gat_ext_pregather, decided above):
            # the per-step Y[ext_idx] gather measured LATENCY-bound, not
            # bandwidth-bound (6.6 ms for 91 MB at atlas = 14 GB/s on an
            # ~800 GB/s part — per-row descriptor latency). Gathering once
            # on the HOST and streaming the (nb, P, G) stack as scan xs
            # turns it into a contiguous block read XLA prefetches during
            # the previous step. Sentinel batches gather row 0, same as the
            # device gather they replace — bit-identical results. Built and
            # cast per timepoint so the float32 transient is bounded to
            # nb*P*G, not T times that.
            if self._pregather_y:
                if self.gat_bf16_gather:
                    import ml_dtypes

                    ye_dt = ml_dtypes.bfloat16
                else:
                    ye_dt = Y.dtype
                YE = np.empty((T, nb_max, P_max, G), ye_dt)
                for t in range(T):
                    YE[t] = Y[t][EI[t]]
                stacked["Y_ext"] = jnp.asarray(YE)
        if self.mesh is not None:
            # place the stack: spot-major arrays sharded on axis 1 over the
            # 'data' mesh axis, everything else (inducing state, batch
            # tables, scalars) replicated — XLA partitions the fused epoch
            # and inserts the collectives (all-gather of per-layer GAT
            # features, psums of batch reductions) over ICI
            import jax as _jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            from spadot_tpu.parallel.mesh import replicated

            s_spot = NamedSharding(self.mesh, P(None, "data"))
            s_rep = replicated(self.mesh)
            spot_keys = {"Y", "Y_gat", "coords", "nbr", "nbr_mask",
                         "row_mask"}
            stacked = {
                k: _jax.device_put(
                    v,
                    s_spot
                    if k in spot_keys
                    or (k == "adj" and v.shape[1] % n_dev == 0)
                    else s_rep,
                )
                for k, v in stacked.items()
            }
        # no padded batches anywhere -> the batch step can skip the commit
        # gating entirely (trace-time decision; saves 3 full param-tree
        # where-selects per step)
        self._fused_no_pad = bool(np.all(BV > 0))
        return stacked

    def _tp_slice(self, stacked, t):
        """Per-timepoint views of the stacked arrays at traced index t."""
        lax = self.jax.lax
        dyn = lambda a: lax.dynamic_index_in_dim(a, t, keepdims=False)
        tp_data = {
            "Y": dyn(stacked["Y"]), "coords": dyn(stacked["coords"]),
            "nbr": dyn(stacked["nbr"]), "nbr_mask": dyn(stacked["nbr_mask"]),
            "N_train": stacked["N_train"][t],
        }
        if "adj" in stacked:
            tp_data["adj"] = dyn(stacked["adj"])
        if "Y_gat" in stacked:
            tp_data["Y_gat"] = dyn(stacked["Y_gat"])
        svgp_state = {
            "Z": dyn(stacked["Z"]), "K_mm": dyn(stacked["K_mm"]),
            "L_mm": dyn(stacked["L_mm"]),
            "m_mask": dyn(stacked["m_mask"]),
            "kl_const": stacked["kl_const"][t],
        }
        if "L_inv" in stacked:  # svgp_gemm_solves (config.yaml)
            svgp_state.update(
                {"L_inv": dyn(stacked["L_inv"]), "C": dyn(stacked["C"]),
                 "M": dyn(stacked["M"]), "Kt_inv": dyn(stacked["Kt_inv"]),
                 "F": dyn(stacked["F"]),
                 "logdet_CCj": stacked["logdet_CCj"][t]}
            )
        return tp_data, svgp_state

    def _fused_epoch_impl(
        self, variables, opt_state, rng, km_key, stacked, perm, centers_s,
        assign_s, gamma_s, use_km_s, use_ot_s, beta1, warm_s,
    ):
        """One WHOLE epoch — every timepoint's gated batch scan (in the
        shuffled order `perm`) plus the per-timepoint KMeans refresh — as a
        single jitted computation.

        Returns (variables, opt_state, rng, losses_sum (7,), new centers_s,
        new assign_s)."""
        jax, jnp = self.jax, self.jnp
        lax = jax.lax
        T = len(self.timepoints)

        gated = not getattr(self, "_fused_no_pad", False)

        def tp_body(carry, j):
            variables, opt_state, rng = carry
            t = perm[j]
            tp_data, svgp_state = self._tp_slice(stacked, t)
            dyn = lambda a: lax.dynamic_index_in_dim(a, t, keepdims=False)
            t_prev = jnp.maximum(t - 1, 0)
            step = self._make_batch_step(
                tp_data, svgp_state, dyn(centers_s), dyn(assign_s),
                lax.dynamic_index_in_dim(centers_s, t_prev, keepdims=False),
                dyn(gamma_s), beta1, use_km_s[t], use_ot_s[t], gated=gated,
            )
            xs = {
                "idx": dyn(stacked["batch_idx"]),
                "msk": dyn(stacked["batch_mask"]),
            }
            if gated:
                xs["valid"] = dyn(stacked["batch_valid"])
            if "ext_idx" in stacked:
                from spadot_tpu.models.model import ext_keys_of

                for k in ext_keys_of(stacked):
                    xs[k] = dyn(stacked[k])
                if "Y_ext" in stacked:
                    xs["Y_ext"] = dyn(stacked["Y_ext"])
            if getattr(self, "_stream_y", False):
                nb, B = xs["idx"].shape
                y_tp = dyn(stacked["Y"])        # (nb*B, G) by construction
                xs["y_b"] = y_tp.reshape(nb, B, y_tp.shape[1])
            (variables, opt_state, rng), vecs = lax.scan(
                step, (variables, opt_state, rng), xs
            )
            if gated:
                w = dyn(stacked["batch_valid"])
                vec = jnp.sum(vecs, axis=0) / jnp.maximum(jnp.sum(w), 1.0)
            else:
                vec = jnp.mean(vecs, axis=0)
            return (variables, opt_state, rng), vec

        (variables, opt_state, rng), vec_tp = lax.scan(
            tp_body, (variables, opt_state, rng), jnp.arange(T)
        )
        losses_sum = jnp.sum(vec_tp, axis=0)

        # per-tp KMeans refresh (sequential lax.map bounds peak memory at one
        # timepoint's full-graph latents)
        from spadot_tpu.models.model import full_latent, full_latent_ext
        from spadot_tpu.ops.kmeans import _kmeans_fit_impl

        def refresh(i):
            tp_data, svgp_state = self._tp_slice(stacked, i)
            dyn = lambda a: lax.dynamic_index_in_dim(a, i, keepdims=False)
            row_mask = dyn(stacked["row_mask"])
            if "ext_idx" in stacked and self.latent_ext_mode != "full":
                # closure-batched GAT: the fused dense kernels instead of the
                # 100k-row gather path (identical latents — see
                # full_latent_ext); sentinel batches only write rows past
                # row_mask's support
                from spadot_tpu.models.model import ext_keys_of

                ext_tables = {k: dyn(stacked[k]) for k in ext_keys_of(stacked)}
                if "Y_ext" in stacked:
                    ext_tables["Y_ext"] = dyn(stacked["Y_ext"])
                lat = full_latent_ext(
                    self.net, variables, tp_data, svgp_state, ext_tables,
                    kernel_scale=self.kernel_scale,
                    kernel_type=self.kernel_type, row_mask=row_mask,
                    gat_window_dense_max=self.gat_window_dense_max,
                    vmap_chunk=self.ext_vmap_chunk,
                    kernel_batch=self.ext_kernel_batch,
                )
            else:
                lat = full_latent(
                    self.net, variables, tp_data, svgp_state,
                    kernel_scale=self.kernel_scale,
                    kernel_type=self.kernel_type,
                    row_mask=row_mask,
                )
            sub = jax.random.fold_in(km_key, i)
            with jax.default_matmul_precision("highest"):
                if self.kmeans_warm:
                    # warm-start Lloyd from the previous epoch's centers
                    # (ops/kmeans.py:kmeans_refit); cold 10-restart kmeans++
                    # only on the first refresh (warm_s = 0)
                    from spadot_tpu.ops.kmeans import _warm_refit_impl

                    def cold(_):
                        c, l, _i = _kmeans_fit_impl(
                            sub, lat, self.n_clusters, row_mask, 10, 100
                        )
                        return c, l

                    def warm(prev_c):
                        c, l, _i = _warm_refit_impl(
                            lat, prev_c, row_mask, self.kmeans_warm_iters
                        )
                        return c, l

                    centers, labels = lax.cond(
                        warm_s > 0, warm, cold,
                        lax.dynamic_index_in_dim(centers_s, i, keepdims=False),
                    )
                else:
                    centers, labels, _ = _kmeans_fit_impl(
                        sub, lat, self.n_clusters, row_mask, 10, 100
                    )
            return centers, labels.astype(jnp.int32)

        if self.kmeans_refresh_unroll:
            # static unroll (kmeans_refresh_unroll, default auto=on for
            # T <= 8): the sequential lax.map is while-glue-bound (the
            # while.199 refresh map measured 13.9/26.9/334 ms/ep at
            # CH/mouse/atlas, profile_*_series.log) and serializes the
            # per-tp extractions; unrolled, the dyn slices become static
            # and XLA may overlap timepoints. Peak live memory grows by up
            # to T-1 extra extraction working sets if XLA chooses to
            # overlap — the auto gate keeps this to small T.
            outs = [refresh(i) for i in range(T)]
            centers_new = jnp.stack([o[0] for o in outs])
            assign_new = jnp.stack([o[1] for o in outs])
        else:
            centers_new, assign_new = lax.map(refresh, jnp.arange(T))
        return variables, opt_state, rng, losses_sum, centers_new, assign_new

    def _staged_perm(self, order):
        key = tuple(order)
        dev = self._perm_cache.get(key)
        if dev is None:
            dev = self.jnp.asarray(np.asarray(order, np.int32))
            self._perm_cache[key] = dev
        return dev

    def _staged_flags(self, flags):
        key = tuple(flags)
        dev = self._flag_cache.get(key)
        if dev is None:
            dev = self.jnp.asarray(np.asarray(flags, np.float64), self.dtype)
            self._flag_cache[key] = dev
        return dev

    def run_epoch_fused(self, variables, opt_state, rng, km_key, order, km,
                        epoch, beta1):
        """Whole-epoch fused dispatch. `order` is the shuffled list of chrono
        timepoint indices for this epoch. Updates km['_stacked'] in place;
        call `sync_km_views` before host consumers read km['centers']."""
        centers_s, assign_s = km["_stacked"]
        have_km = bool(km.get("_have", False))
        use_km = [1.0 if (epoch >= 1 and have_km) else 0.0] * len(self.timepoints)
        ot_on = epoch >= int(self.config["ot_epoch"])
        use_ot = []
        for i, tp in enumerate(self.timepoints):
            gkey = f"{self.timepoints[i - 1]}_{tp}" if i else ""
            use_ot.append(
                1.0 if (ot_on and i != 0 and have_km and gkey in self._gamma_dev)
                else 0.0
            )
        out = self._fused_jit(
            variables, opt_state, rng, km_key, self._stacked,
            self._staged_perm(order), centers_s, assign_s, self._gamma_stack,
            self._staged_flags(use_km), self._staged_flags(use_ot),
            self._scalar(beta1),
            self._scalar(1.0 if (self.kmeans_warm and have_km) else 0.0),
        )
        variables, opt_state, rng, losses_sum, centers_s, assign_s = out
        km["_stacked"] = (centers_s, assign_s)
        km["_have"] = True
        return variables, opt_state, rng, losses_sum

    def sync_km_views(self, km):
        """Materialize per-tp views of the stacked KMeans state (host
        consumers: OT refresh, checkpointing, analyze)."""
        if not self.fused or km.get("_stacked") is None or not km.get("_have"):
            return km
        centers_s, assign_s = km["_stacked"]
        for i, tp in enumerate(self.timepoints):
            km["centers"][tp] = centers_s[i]
            km["assign"][tp] = assign_s[i][: self.tp_n[tp]]
        return km

    def update_ot(self, km, gammas):
        """Refresh transport plans between consecutive timepoints
        (_train_utils.py:309-321) using the float64 host Sinkhorn."""
        from spadot_tpu.ops.sinkhorn import compute_transport_map

        ot_cfg = self.config["ot_config"]
        # the training-path problems are tiny (k x k centroid matrices), so
        # the "jax" device backend would be pure dispatch overhead here —
        # map it to the float64 host engine; "cpu" (native .so) is honored
        backend = ot_cfg.get("backend", "numpy")
        if backend == "jax":
            backend = "numpy"
        for i in range(len(self.timepoints) - 1):
            cur, nxt = self.timepoints[i], self.timepoints[i + 1]
            if km["centers"].get(cur) is None or km["centers"].get(nxt) is None:
                continue
            # diagnose divergence at the source: non-finite centroids mean
            # the TRAINING latents went NaN (not an OT-solver problem).
            # Known triggers, in order of likelihood: (1) learning rate at
            # data scale — the summed-over-rows loss diverges N-driven
            # above ~50k total spots at the reference lr (docs/scaling.md;
            # lr: auto applies the measured-stable rule); (2) under-
            # precision linear algebra (svgp_matmul_precision below 'high'
            # is measured to do this at every bench scale; see
            # config.yaml). A collapsed latent dim at the variance clip
            # floor is NOT a trigger anymore — ops/svgp.py:_chol_guarded
            # rescues that case (2026-08-19). Without this check the
            # failure surfaces as an opaque duality-gap overflow deep in
            # the Sinkhorn engine.
            for tp, c in ((cur, km["centers"][cur]), (nxt, km["centers"][nxt])):
                if not np.all(np.isfinite(np.asarray(c))):
                    raise FloatingPointError(
                        f"KMeans centroids for timepoint {tp} are non-finite "
                        "at the OT refresh — training latents have diverged "
                        "(NaN/Inf). Likely causes: learning rate too high "
                        "for this data scale (set lr: auto — see "
                        "docs/scaling.md) or under-precision settings "
                        "(svgp_matmul_precision must be 'high' or "
                        "'highest'; consider precision_preset: parity)."
                    )
            gamma = compute_transport_map(
                np.asarray(km["centers"][cur], np.float64),
                np.asarray(km["centers"][nxt], np.float64),
                dict(ot_cfg), G=None, backend=backend,
            )
            gammas[f"{cur}_{nxt}"] = np.asarray(gamma)
        # stage the row-normalized plans on device once per refresh (the
        # epoch loop reads them every tp-epoch until the next refresh)
        self.stage_gammas(gammas)
        return gammas


def resolve_lr(lr, n_total):
    """Resolve the config `lr` value, supporting the opt-in `lr: auto`.

    'auto' applies the measured-stable scaling rule from docs/scaling.md:
    3e-4 (the reference default, SpaDOT/utils/config.yaml `lr`) scaled by
    10,000/total-spots beyond the reference's own ~10k data scale, capped
    at 3e-4 — never raised above the reference default for small data.
    Backed by the 2x102,400-spot study (docs/tpu_logs/atlasq_*.log,
    2026-08-19): 3e-4 diverges at every batch size there while the scaled
    value trains to completion. Numeric lr values pass through unchanged
    (the default remains the reference's exact behavior)."""
    if isinstance(lr, str):
        if lr.strip().lower() == "auto":
            return min(3e-4, 3e-4 * 10_000.0 / max(int(n_total), 1))
        try:
            # YAML 1.1 parses dot-less scientific notation ('3e-4') as a
            # string — keep accepting what float(config['lr']) always did
            return float(lr)
        except ValueError:
            raise ValueError(f"lr must be a number or 'auto', got {lr!r}")
    return float(lr)


def train_spadot(data, model_config, resume_state=None, checkpoint_path=None, mesh=None):
    """Full training run. Returns (trainer, variables, host_state, loss_df)."""
    import jax

    from spadot_tpu.train.schedules import beta_cycle_linear
    from spadot_tpu.train.checkpoint import save_checkpoint

    _n_total = sum(
        int(data["tp_data"][tp]["Y"].shape[0]) for tp in data["timepoints"]
    )
    if isinstance(model_config.get("lr"), str):
        model_config = dict(model_config)
        model_config["lr"] = resolve_lr(model_config["lr"], _n_total)
        logger.info(
            "lr: auto -> %.3g at %d total spots (docs/scaling.md rule)",
            model_config["lr"], _n_total,
        )
    trainer = Trainer(model_config, data, mesh=mesh)
    # effective-lr guard. Measured at 2x102,400 spots / 100 epochs
    # (docs/tpu_logs/atlasq_*.log, 2026-08-19): the reference lr 3e-4
    # diverges at BOTH batch 4096 (GAT_KL explodes ~epoch 10, NaN
    # centroids ~40) and batch 512 (same runaway, 8x more steps/epoch ->
    # NaN within epoch 1; per-step dissection: one latent dim's qnet_var
    # driven to the exp-clip floor), and an all-'highest'-precision arm
    # diverged identically — this is optimization at scale, not numerics.
    # lr ~3.75e-5 (=3e-4 x 10k/total-spots, the reference's data scale)
    # trained to completion (mean domain ARI 0.8525 at batch 4096). Warn
    # rather than silently rescale (opt in with lr: auto).
    _lr = float(model_config.get("lr", 3e-4))
    if _n_total > 50_000 and _lr >= 2.9e-4:
        logger.warning(
            "%d total spots with lr=%g: runs at the reference lr are "
            "measured to diverge beyond ~50k spots (any batch size; "
            "docs/scaling.md 'Large-scale learning rate'); consider "
            "lr ~%.2g (3e-4 x 10k/total_spots), or set lr: auto.",
            _n_total, _lr, 3e-4 * 10_000.0 / _n_total,
        )
    maxiter = int(model_config["maxiter"])
    seed = int(model_config["seed"])
    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)

    start_epoch = 0
    gammas = {}
    km = {"centers": {}, "assign": {}}
    if trainer.fused:
        km["_stacked"] = trainer._km_stacked
        km["_have"] = False
    loss_rows = []
    if resume_state is not None:
        import jax.numpy as jnp

        from spadot_tpu.train.checkpoint import restore_model_state

        # checkpoints store flat arrays only (no pickled pytree structure);
        # rebuild the structure from a fresh init and pour the arrays back in
        variables, opt_state = trainer.init_state(init_key)
        variables, opt_state = restore_model_state(
            variables, opt_state, resume_state["model_state"]
        )
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state)
        start_epoch = int(resume_state["meta"]["epoch"]) + 1
        gammas = {k: np.asarray(v) for k, v in resume_state["gammas"].items()}
        trainer.stage_gammas(gammas)
        for tp in trainer.timepoints:
            c = resume_state["kmeans_centers"].get(str(tp))
            a = resume_state["kmeans_assign"].get(str(tp))
            if c is not None:
                km["centers"][tp] = jnp.asarray(c)
                km["assign"][tp] = jnp.asarray(a)
        if trainer.fused and all(
            km["centers"].get(tp) is not None for tp in trainer.timepoints
        ):
            # restack the restored per-tp KMeans state (assignments row-padded
            # back to the stacked width)
            n_max = int(trainer._km_stacked[1].shape[1])
            centers_s = jnp.stack(
                [km["centers"][tp] for tp in trainer.timepoints]
            ).astype(trainer.dtype)
            assign_s = jnp.stack([
                jnp.pad(
                    jnp.asarray(km["assign"][tp], jnp.int32),
                    (0, n_max - trainer.tp_n[tp]),
                )
                for tp in trainer.timepoints
            ])
            km["_stacked"] = (
                trainer._replicate(centers_s), trainer._replicate(assign_s)
            )
            km["_have"] = True
        loss_rows = [np.asarray(r) for r in resume_state["loss_rows"]]
        key = jnp.asarray(resume_state["rng"])
        # restore the host python RNG (drives the per-epoch timepoint
        # shuffle) so a resumed run replays the uninterrupted trajectory
        if resume_state["meta"].get("py_random_state") is not None:
            random.setstate(resume_state["meta"]["py_random_state"])
        logger.info("resumed from epoch %d", start_epoch)
    else:
        variables, opt_state = trainer.init_state(init_key)

    beta1s = beta_cycle_linear(maxiter, stop=float(model_config["beta1"]))
    tp_indexed = list(enumerate(trainer.timepoints))
    ot_every = int(model_config["ot_config"]["ot_epochs"])

    logger.info("Training SpaDOT model...")
    import time as _time

    from spadot_tpu.utils.logging import maybe_profile

    t_train0 = _time.time()
    # SPADOT_PROFILE=1 wraps the epoch loop in a jax.profiler trace
    with maybe_profile():
        for epoch in range(start_epoch, maxiter):
            t0 = _time.time()
            key, ep_key, km_key = jax.random.split(key, 3)
            random.shuffle(tp_indexed)
            if trainer.fused:
                # whole epoch (all tps + KMeans refresh) = ONE device dispatch
                order = [tp_i for tp_i, _ in tp_indexed]
                variables, opt_state, _, losses_sum = trainer.run_epoch_fused(
                    variables, opt_state, ep_key, km_key, order, km, epoch,
                    beta1s[epoch],
                )
                epoch_losses = losses_sum  # device array; sync deferred
            else:
                rng = ep_key
                epoch_losses = None
                for tp_i, tp in tp_indexed:
                    variables, opt_state, rng, losses = trainer.run_epoch(
                        variables, opt_state, rng, tp, km, gammas, tp_i, epoch,
                        beta1s[epoch]
                    )
                    # device-side accumulation; no host sync here
                    epoch_losses = (
                        losses if epoch_losses is None else epoch_losses + losses
                    )
                km = trainer.update_kmeans(variables, km_key, km)
            if (epoch + 1) % ot_every == 0:
                trainer.sync_km_views(km)
                gammas = trainer.update_ot(km, gammas)
            # epoch_losses stays a device array: over the remote tunnel a
            # per-epoch materialization would serialize every epoch on a
            # host round trip; deferring it lets async dispatch pipeline
            # epochs back-to-back. Host syncs happen only at the log cadence
            # below, OT refreshes, checkpoints, and the end of training.
            loss_rows.append(epoch_losses)
            if epoch % 10 == 0:
                logger.info(
                    "Epoch %d: %.1fs, ELBO: %.6f, Recon: %.6f, SVGP_KL: %.6f, "
                    "GAT_KL: %.6f, align: %.6f, KMeans: %.6f, OT: %.6f",
                    epoch + 1, _time.time() - t0,
                    *np.asarray(epoch_losses, np.float64),
                )
            if checkpoint_path and (epoch + 1) % 25 == 0:
                trainer.sync_km_views(km)
                _save_state(checkpoint_path, trainer, variables, opt_state, km,
                            gammas, key, epoch, loss_rows)
    logger.info("Training finished in %ds.", int(_time.time() - t_train0))
    trainer.sync_km_views(km)
    loss_df = pd.DataFrame(
        np.asarray(loss_rows, dtype=np.float64).reshape(-1, len(LOSS_NAMES)),
        columns=LOSS_NAMES, index=range(len(loss_rows)),
    )
    host_state = {
        "km": km, "gammas": gammas, "rng": key,
        "loss_rows": loss_rows, "last_epoch": maxiter - 1,
    }
    return trainer, variables, opt_state, host_state, loss_df


def _save_state(path, trainer, variables, opt_state, km, gammas, key, epoch, loss_rows):
    from spadot_tpu.train.checkpoint import save_checkpoint

    save_checkpoint(
        path,
        {
            "variables": variables,
            "opt_state": opt_state,
            "kmeans_centers": {str(tp): km["centers"].get(tp) for tp in trainer.timepoints
                               if km["centers"].get(tp) is not None},
            "kmeans_assign": {str(tp): km["assign"].get(tp) for tp in trainer.timepoints
                              if km["assign"].get(tp) is not None},
            "gammas": gammas,
            "rng": key,
            "loss_rows": loss_rows,
            "meta": {"epoch": epoch, "py_random_state": random.getstate()},
        },
    )


def _save_reference_weights(path, variables):
    """Write the reference's model artifact name (SpaDOT/train.py:40 writes
    `SpaDOT_model.pth` via torch.save). A genuine torch-loadable state dict:
    flattened param/batch-stat paths -> torch tensors, so reference-era
    tooling that does `torch.load(...pth)` keeps working. The richer resumable
    state lives in the .ckpt next to it."""
    import jax
    import torch

    from flax import serialization

    sd = serialization.to_state_dict(
        jax.tree_util.tree_map(lambda x: np.asarray(x), variables)
    )
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}.{k}" if prefix else str(k), v)
        else:
            flat[prefix] = torch.from_numpy(np.asarray(node).copy())

    walk("", sd)
    torch.save(flat, path)


def get_latent(trainer, variables, data, adata):
    """Extract posterior-mean latents for all spots -> AnnData
    (parity with _train_utils.py:98-116)."""
    from spadot_tpu.io import AnnData, concat

    parts = []
    for tp in trainer.timepoints:
        lat = np.asarray(trainer.latent(variables, tp))
        rows = trainer.obs_rows[tp]
        sub = AnnData(
            lat,
            obs=adata.obs.iloc[rows],
            obsm={"spatial": np.asarray(adata.obsm["spatial"])[rows]},
        )
        parts.append(sub)
    return concat(parts)


def train(args):
    """Train-stage entry point (parity with SpaDOT/train.py:9-44)."""
    import jax

    from spadot_tpu.io import read_h5ad
    from spadot_tpu.data.pipeline import prepare_data, save_inducing_points

    from spadot_tpu.utils.platform import select_platform

    # e.g. --device tpu (the default) on a CPU-only host falls back to
    # whatever backend the installation provides
    select_platform(getattr(args, "device", None), logger)

    enable_compilation_cache()
    logger.info("Loading data...")
    data_dir = os.path.abspath(args.data)
    if not getattr(args, "output_dir", None):
        args.output_dir = os.path.dirname(data_dir)
    os.makedirs(args.output_dir, exist_ok=True)

    adata = read_h5ad(data_dir)
    model_config = load_model_config(args)
    model_config["input_dim"] = adata.n_vars
    tps = sorted(adata.obs["timepoint"].unique().tolist())
    model_config["timepoints"] = tps
    resolve_dtype(model_config)
    jax.config.update(
        "jax_default_matmul_precision", model_config.get("matmul_precision", "highest")
    )

    set_seed(int(model_config["seed"]))
    logger.info("Preparing data...")
    data = prepare_data(adata, model_config)
    save_inducing_points(args, data["inducing_points"])

    resume_state = None
    if getattr(args, "resume", None):
        from spadot_tpu.train.checkpoint import load_checkpoint

        resume_state = load_checkpoint(args.resume)
    ckpt_path = os.path.join(args.output_dir, args.prefix + "SpaDOT_autosave.ckpt")

    logger.info("Training model...")
    mesh = None
    mesh_shape = model_config.get("mesh_shape")
    if mesh_shape:
        from spadot_tpu.parallel.mesh import make_mesh

        need = int(np.prod(list(mesh_shape.values())))
        if len(jax.devices()) >= need:
            mesh = make_mesh(mesh_shape)
            logger.info("training on a %s mesh over %d devices", mesh_shape, need)
        else:
            logger.warning(
                "mesh_shape %s needs %d devices but only %d available; "
                "training single-device", mesh_shape, need, len(jax.devices()),
            )
    trainer, variables, opt_state, host_state, loss_df = train_spadot(
        data, model_config, resume_state=resume_state, checkpoint_path=ckpt_path,
        mesh=mesh
    )
    loss_df.to_csv(args.output_dir + os.sep + "loss.csv")
    if getattr(args, "save_model", False):
        _save_state(
            os.path.join(args.output_dir, "SpaDOT_model.ckpt"),
            trainer, variables, opt_state, host_state["km"], host_state["gammas"],
            host_state["rng"], host_state["last_epoch"], host_state["loss_rows"],
        )
        # reference artifact-name parity (SpaDOT/train.py:40)
        _save_reference_weights(
            os.path.join(args.output_dir, "SpaDOT_model.pth"), variables
        )
        logger.info("Model saved to %s", args.output_dir)
    latent_adata = get_latent(trainer, variables, data, adata)
    latent_adata.write_h5ad(args.output_dir + os.sep + args.prefix + "latent.h5ad")
    return latent_adata
