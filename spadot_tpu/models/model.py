"""The SpaDOT model: dual SVGP+GAT variational encoder, shared decoder, and
the composite training objective (ELBO + KMeans + OT coupling).

Semantics follow SpaDOT/model/SpaDOT.py:52-94 (forward & loss terms),
_train_utils.py:207-212 (loss weighting), :240-253 (KMeans loss) and
:272-307 (OT loss), re-expressed as pure JAX functions over flax modules:

- the per-latent-dim SVGP loop is vmapped (see ops/svgp.py);
- the GAT branch runs on the FULL per-timepoint graph (exact message
  passing — replaces the reference's sampled 2-hop NeighborLoader subgraphs,
  which only approximate the 3-layer receptive field);
- everything is mask-aware so padded batches keep shapes static under jit;
- the KL "sign trick" of SpaDOT.py:77 (force SVGP_KL = -|ce - inside_elbo|)
  is reproduced with jnp.abs, which is jit-compatible.
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn

from spadot_tpu.models.layers import Decoder, GATEncoder, SVGPEncoder
from spadot_tpu.ops.svgp import gauss_cross_entropy, svgp_batch_terms


class SpaDOTNet(nn.Module):
    """Container module holding the three trainable subnetworks."""

    input_dim: int
    z_dim: int
    svgp_encoder_layers: tuple
    gat_encoder_hidden: int
    gat_attention_heads: int
    decoder_layers: tuple
    use_pallas: bool = False
    # encoder_mode: 'dual' (reference), 'svgp' (VAE-only ablation,
    # BASELINE.json config 2), or 'gat' (graph-only ablation)
    encoder_mode: str = "dual"
    param_dtype: Any = None  # None -> float32
    # GAT execution policy (see models/layers.py:GATLayer docstring)
    gat_rev_mode: str = "auto"
    gat_pallas_min_n: int = 4500
    gat_rev_max_n: int = 3500
    # matmul precision for the GAT branch only (projections + attention).
    # The GLOBAL default is "highest" (6-pass bf16 ~ true f32) because the
    # SVGP Cholesky factors go non-PSD below it — but the GAT branch has no
    # such hazard, and on the MXU "default" (1-pass bf16) is ~6x the f32
    # rate, "high" (3-pass) ~2x. At 100k-spot scale the dense attention
    # matmuls ARE the epoch, so this is a first-order lever. Quality-gated
    # bf16 default (examples/precision_quality.py: 100-epoch mean domain ARI
    # 0.9514 vs 0.9559 at highest, same data/seed; set "highest" for
    # float64/parity studies).
    gat_matmul_precision: str = "default"
    # matmul precision for the TRAINING SVGP batch terms (ops/svgp.py). The
    # whitened B = I + ratio·UΛUᵀ Cholesky is unconditionally stable
    # (B ⪰ I), so "high" (3-pass bf16, ~2x MXU rate) is the quality-gated
    # default (100-epoch ARI 0.9534 vs 0.9581 at highest, finite throughout;
    # examples/svgp_precision_quality.py + docs/tpu_logs/svgp_quality.log).
    # Measured -7..-10% epoch time at CH/atlas/mouse scales. Parity runs pin
    # "highest"; latent-extraction / KMeans-refresh SVGP calls always run
    # "highest" — they feed artifacts.
    svgp_matmul_precision: str = "high"
    # matmul precision for the dense MLP GEMMs (SVGP-branch encoder +
    # decoder). "default" (1-pass bf16) is the quality-gated default
    # (2026-08-18: 100-epoch ARI 0.9534 vs 0.9531 at highest, finite —
    # docs/tpu_logs/mlp_quality.log; −1.8..−2.2% epoch time at all three
    # bench scales). Parity runs pin "highest". Latent extraction always
    # runs "highest" (train/loop.py scopes it) — artifacts unaffected.
    mlp_matmul_precision: str = "default"
    # triangular-inverse backend for the whitened-SVGP B/B̃ factors:
    # "auto" = the nilpotent log-series inverse (pure MXU matmuls,
    # ops/tri_inverse.py) on TPU, the XLA trsm elsewhere; "series"/"xla"
    # pin a backend (rationale + measured trsm latency in
    # ops/tri_inverse.py).
    svgp_chol_backend: str = "auto"
    # form B̃ from the shared per-dim W = (U·prec)Uᵀ gemm (E⁻¹WE⁻ᵀ) instead
    # of a second highest-pinned (m, b)·(b, m) gemm per latent dim —
    # mathematically identical (ops/svgp.py derivation). "auto" (default)
    # = shared iff b > 2m, the measured MAC crossover (atlas shared −5%,
    # CH shared +1.4%); True/False pin an arm.
    svgp_bt_shared: Any = "auto"

    def setup(self):
        self.svgp_z_dim = self.z_dim // 2
        self.gat_z_dim = self.z_dim // 2
        pdt = self.param_dtype if self.param_dtype is not None else jnp.float32
        self.svgp_encoder = SVGPEncoder(
            hidden_dims=tuple(self.svgp_encoder_layers), z_dim=self.svgp_z_dim,
            param_dtype=pdt,
        )
        self.gat_encoder = GATEncoder(
            hidden_dim=self.gat_encoder_hidden,
            num_heads=self.gat_attention_heads,
            z_dim=self.gat_z_dim,
            use_pallas=self.use_pallas,
            param_dtype=pdt,
            rev_mode=self.gat_rev_mode,
            pallas_min_n=self.gat_pallas_min_n,
            rev_max_n=self.gat_rev_max_n,
        )
        self.decoder = Decoder(
            hidden_dims=tuple(self.decoder_layers), output_dim=self.input_dim,
            param_dtype=pdt,
        )

    def encode_svgp(self, y, *, train: bool, mask=None):
        return self.svgp_encoder(y, train=train, mask=mask)

    def encode_gat(self, h, nbr, nbr_mask, rev=None, adj=None):
        return self.gat_encoder(h, nbr, nbr_mask, rev, adj)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, y, nbr, nbr_mask, *, train: bool):
        """Wiring-only call used for parameter initialization."""
        parts = []
        if self.encoder_mode in ("dual", "svgp"):
            mu_s, _ = self.encode_svgp(y, train=train)
            parts.append(mu_s)
        if self.encoder_mode in ("dual", "gat"):
            mu_g, _ = self.encode_gat(y, nbr, nbr_mask)
            parts.append(mu_g)
        z = jnp.concatenate(parts, axis=1)
        return self.decode(z)


def build_net(model_config: Dict[str, Any]) -> SpaDOTNet:
    mode = str(model_config.get("encoder_mode", "dual"))
    if mode not in ("dual", "svgp", "gat"):
        raise ValueError(
            f"encoder_mode must be one of 'dual', 'svgp', 'gat'; got {mode!r}"
        )
    dtype_name = str(model_config.get("dtype", "float32")).lower()
    f64 = dtype_name in ("float64", "f64", "double")
    use_pallas = bool(model_config.get("use_pallas", True)) and not f64
    if use_pallas:
        from spadot_tpu.ops.gat_pallas import pallas_gat_supported

        use_pallas = pallas_gat_supported()
    # gat_rev_backward: true/"auto" -> size-gated reverse-list backward;
    # "force" -> always when lists are present; false -> never
    rev_cfg = model_config.get("gat_rev_backward", True)
    rev_mode = (
        rev_cfg if rev_cfg in ("auto", "force", "off")
        else ("auto" if rev_cfg else "off")
    )
    return SpaDOTNet(
        input_dim=int(model_config["input_dim"]),
        z_dim=int(model_config["z_dim"]),
        svgp_encoder_layers=tuple(model_config["svgp_encoder_layers"]),
        gat_encoder_hidden=int(model_config["gat_encoder_hidden"]),
        gat_attention_heads=int(model_config["gat_attention_heads"]),
        decoder_layers=tuple(model_config["decoder_layers"]),
        use_pallas=use_pallas,
        encoder_mode=str(model_config.get("encoder_mode", "dual")),
        param_dtype=(jnp.float64 if f64 else jnp.float32),
        gat_rev_mode=rev_mode,
        gat_pallas_min_n=int(model_config.get("gat_pallas_min_n", 4500)),
        gat_rev_max_n=int(model_config.get("gat_rev_max_n", 3500)),
        gat_matmul_precision=str(
            model_config.get("gat_matmul_precision", "default")
        ),
        svgp_matmul_precision=str(
            model_config.get("svgp_matmul_precision", "high")
        ),
        mlp_matmul_precision=str(
            model_config.get("mlp_matmul_precision", "default")
        ),
        svgp_chol_backend=str(
            model_config.get("svgp_chol_backend", "auto")
        ),
        svgp_bt_shared=model_config.get("svgp_bt_shared", "auto"),
    )


def _apply_gat(net, variables, h, nbr, nbr_mask, rev=None, adj=None):
    """GAT branch application under the configured (scoped) matmul precision."""
    with jax.default_matmul_precision(net.gat_matmul_precision):
        return net.apply(
            variables, h, nbr, nbr_mask, rev, adj, method=SpaDOTNet.encode_gat
        )


# the receptive-table field order: every producer (data/pipeline.py via
# graph.py:receptive_tables), stager (train/loop.py), and the positional
# unpack in _gat_ext_forward below go through this ONE tuple — adding or
# reordering a field is a single-site edit. 'ext_adj' (the optional static
# closure adjacency) is appended LAST when present (ext_xs).
EXT_KEYS = ("ext_idx", "ext_mask", "loc_nbr", "loc_mask", "batch_pos")


def ext_keys_of(tables):
    """EXT_KEYS plus the optional trailing 'ext_adj' when `tables` has it."""
    return (
        EXT_KEYS + ("ext_adj",) if "ext_adj" in tables else EXT_KEYS
    )


def ext_xs(tables, index=None):
    """The positional ext tuple `_gat_ext_forward` consumes, in EXT_KEYS
    order (+ trailing ext_adj when present). `index` applies a callable to
    each field (e.g. a traced dynamic_index_in_dim for fused-stack slices)."""
    keys = ext_keys_of(tables)
    if index is None:
        return tuple(tables[k] for k in keys)
    return tuple(index(tables[k]) for k in keys)


def _gat_ext_forward_batched(net, vars_nostats, Y, ext, y_ext=None):
    """`_gat_ext_forward` over a leading closure-batch axis — banded static
    adjacencies only (ext_adj (c, ni, TI, Wb)): one batched fused-kernel
    launch (ops/gat_flash.py:gat_attention_banded_flash_batched) replaces c
    sequential closure forwards, and the Wx projections of all c closures
    run as single large MXU GEMMs. Values are the per-closure ones
    closure-for-closure (tests/test_exact_batches.py)."""
    ext_idx, ext_mask, loc_nbr, loc_mask, batch_pos = ext[:len(EXT_KEYS)]
    adj_ext = ext[len(EXT_KEYS)]
    Y_ext = Y[ext_idx] if y_ext is None else y_ext      # (c, P, G)
    if Y_ext.dtype == jnp.bfloat16:
        Y_ext = Y_ext.astype(jnp.float32)
    gat_mu_e, gat_var_e = _apply_gat(
        net, vars_nostats, Y_ext, None, None, None, adj_ext
    )
    pos = batch_pos[:, :, None]
    mu_b = jnp.take_along_axis(
        gat_mu_e, jnp.broadcast_to(pos, pos.shape[:2] + (gat_mu_e.shape[-1],)),
        axis=1,
    )
    return mu_b, None


def _gat_ext_forward(net, vars_nostats, Y, ext, gat_window_dense_max,
                     y_ext=None):
    """GAT over one batch's receptive closure, batch-row outputs extracted.

    ext is a receptive-table slice in EXT_KEYS order (ext_idx (P,),
    ext_mask (P,), loc_nbr (P, K), loc_mask (P, K), batch_pos (b,)) from
    data/graph.py:receptive_tables, optionally extended with a precomputed
    static (P, P) int8 closure adjacency (graph.py:closure_adjacency — skips
    the per-step mask scatter); the returned (mu, var) at the batch rows
    are EXACTLY the full-graph values (tests/test_exact_batches.py)."""
    ext_idx, ext_mask, loc_nbr, loc_mask, batch_pos = ext[:len(EXT_KEYS)]
    adj_ext = ext[len(EXT_KEYS)] if len(ext) > len(EXT_KEYS) else None
    P = loc_nbr.shape[0]
    # Y may be a staged bfloat16 copy (train/loop.py gat_bf16_gather: the
    # row gather is pure HBM traffic, ~6.6 ms/step at atlas from a float32
    # source; bf16 halves it). Upcast right after the gather: under the
    # production 1-pass bf16 matmul precision the first GAT matmul rounds
    # its operands to bf16 anyway, so results are bit-identical, and the
    # rest of the branch keeps float32 dtype flow. y_ext, when given, is
    # this step's HOST-pre-gathered (P, G) row block (train/loop.py
    # gat_ext_pregather — same values, streamed as scan xs instead of a
    # latency-bound device gather).
    Y_ext = Y[ext_idx] if y_ext is None else y_ext
    if Y_ext.dtype == jnp.bfloat16:
        Y_ext = Y_ext.astype(jnp.float32)
    if adj_ext is None and P <= int(gat_window_dense_max):
        rows_e = jnp.broadcast_to(jnp.arange(P)[:, None], loc_nbr.shape)
        adj_ext = jnp.zeros((P, P), jnp.int8)
        adj_ext = adj_ext.at[rows_e, loc_nbr].max(loc_mask.astype(jnp.int8))
    gat_mu_e, gat_var_e = _apply_gat(
        net, vars_nostats, Y_ext, loc_nbr, loc_mask, None, adj_ext
    )
    return gat_mu_e[batch_pos], gat_var_e[batch_pos]


def forward_batch(
    net: SpaDOTNet,
    variables,
    rng,
    tp_data: Dict[str, Any],
    svgp_state: Dict[str, Any],
    batch_idx,
    batch_mask,
    *,
    kernel_scale: float,
    kernel_type: str,
    jitter: float = 1e-2,
    train: bool = True,
    gat_window: int = 0,
    gat_window_dense_max: int = 10000,
    ext=None,
    y_ext=None,
    y_b=None,
):
    """One batch forward pass -> losses + latent (SpaDOT.py:52-94).

    ext, when given, is this step's receptive-field table slice
    (ext_idx (P,), ext_mask (P,), loc_nbr (P, K), loc_mask (P, K),
    batch_pos (b,)) from data/graph.py:receptive_tables: the GAT runs on the
    batch's 3-hop closure and the batch-row outputs are EXACTLY the
    full-graph values — the edge-exact O(closure) scaling mode. Takes
    precedence over gat_window.

    gat_window > 0 restricts GAT message passing to a contiguous row window
    around the batch (O(window) per step — approximate: boundary-crossing
    edges are dropped); 0 = exact full-graph. Windows/closures up to
    `gat_window_dense_max` rows run as dense-adjacency attention (mask
    scatter-built per step, amortized over the 3 layers); larger ones keep
    the neighbor-list paths.

    tp_data: dict with Y (n, G), coords (n, 2), nbr (n, K), nbr_mask (n, K),
      N_train (scalar).
    batch_idx: (b,) int32 rows of this batch; batch_mask: (b,) validity.

    Returns (losses dict, final_latent (b, z), new_batch_stats or None).
    """
    Y, coords = tp_data["Y"], tp_data["coords"]
    nbr, nbr_mask = tp_data["nbr"], tp_data["nbr_mask"]
    N_train = tp_data["N_train"]
    # reverse padded lists (data/graph.py:reverse_graph): present -> the GAT
    # backward is scatter-free (gather-only over the reverse graph)
    rev = (
        (tp_data["rev_src"], tp_data["rev_slot"], tp_data["rev_mask"])
        if "rev_src" in tp_data else None
    )
    # both branches emit z_dim // 2 dims (the encoders are built with that
    # width — SpaDOT.py:12-13's "in case z_dim is odd" convention)
    svgp_L = net.z_dim // 2
    gat_L = net.z_dim // 2

    # y_b may be streamed in as a contiguous scan-xs block (train/loop.py
    # batch_rows_stream: batches are contiguous row blocks, so the (B, G)
    # slice holds the same rows the gather would fetch; tail/sentinel slots
    # differ in value but are zeroed by the mask in BOTH paths)
    y_b = (Y[batch_idx] if y_b is None else y_b) * batch_mask[:, None]
    x_b = coords[batch_idx]
    b_eff = jnp.maximum(jnp.sum(batch_mask), 1.0)

    rng_svgp, rng_gat = jax.random.split(rng)
    mode = net.encoder_mode
    new_state = None
    vars_nostats = {"params": variables["params"]}
    zero = jnp.zeros((), Y.dtype)
    svgp_kl = gat_kl = align = zero
    svgp_sample = gat_sample = None

    if mode in ("dual", "svgp"):
        # --- SVGP branch (encoder on batch rows only, SpaDOT.py:54) ---
        mutable = ["batch_stats"] if train else []
        with jax.default_matmul_precision(net.mlp_matmul_precision):
            (qnet_mu, qnet_var), new_state = net.apply(
                variables, y_b, train=train, mask=batch_mask,
                method=SpaDOTNet.encode_svgp, mutable=mutable,
            )
        terms = svgp_batch_terms(
            x_b, qnet_mu, qnet_var, batch_mask, N_train,
            svgp_state["Z"], svgp_state["K_mm"], svgp_state["L_mm"],
            kernel_scale=kernel_scale, jitter=jitter, kernel_type=kernel_type,
            m_mask=svgp_state.get("m_mask"),
            kl_const=svgp_state.get("kl_const", 0.0),
            L_inv=svgp_state.get("L_inv"), C=svgp_state.get("C"),
            M=svgp_state.get("M"), Kt_inv=svgp_state.get("Kt_inv"),
            F=svgp_state.get("F"), logdet_CCj=svgp_state.get("logdet_CCj"),
            matmul_precision=net.svgp_matmul_precision,
            chol_backend=net.svgp_chol_backend,
            bt_shared=net.svgp_bt_shared,
        )
        inside_elbo = jnp.sum(terms["recon"]) - (b_eff / N_train) * jnp.sum(terms["kl"])
        ce = gauss_cross_entropy(terms["p_m"], terms["p_v"], qnet_mu, qnet_var)
        ce_term = jnp.sum(ce * batch_mask[:, None])
        # sign trick: SpaDOT.py:74-77 — always report a negative KL
        svgp_kl = -jnp.abs(ce_term - inside_elbo) / svgp_L
        eps_s = jax.random.normal(rng_svgp, terms["p_m"].shape, terms["p_m"].dtype)
        svgp_sample = terms["p_m"] + eps_s * jnp.sqrt(terms["p_v"])

    if mode in ("dual", "gat"):
        if ext is not None:
            # --- exact receptive-field minibatch GAT ---
            gat_mu, gat_var = _gat_ext_forward(
                net, vars_nostats, tp_data.get("Y_gat", Y), ext,
                gat_window_dense_max, y_ext=y_ext,
            )
        elif gat_window:
            # --- windowed minibatch GAT: message passing restricted to the
            # [batch_start - W, batch_end + W) row window. Spots are
            # Morton-ordered and batches contiguous (data/pipeline.py), so
            # the window covers the receptive field up to rare truncated
            # boundary edges — the deterministic analogue of the reference's
            # sampled 2-hop subgraphs, at O(window) instead of O(n) per step.
            n = Y.shape[0]
            b = batch_idx.shape[0]
            win_size = min(n, b + 2 * int(gat_window))
            win_start = jnp.clip(
                jnp.min(batch_idx) - int(gat_window), 0, n - win_size
            )
            Y_win = jax.lax.dynamic_slice_in_dim(
                tp_data.get("Y_gat", Y), win_start, win_size, 0
            )
            if Y_win.dtype == jnp.bfloat16:  # staged gather copy — see
                Y_win = Y_win.astype(jnp.float32)  # _gat_ext_forward
            nbr_win = jax.lax.dynamic_slice_in_dim(nbr, win_start, win_size, 0)
            msk_win = jax.lax.dynamic_slice_in_dim(nbr_mask, win_start, win_size, 0)
            rel = nbr_win - win_start
            inside = jnp.logical_and(rel >= 0, rel < win_size)
            rel = jnp.clip(rel, 0, win_size - 1)
            msk_win = jnp.where(inside, msk_win, 0.0)
            # dense window attention: build the window-local adjacency once
            # per step (one (win,K) scatter-max) and run the dense-adjacency
            # GAT — measured 12.8 ms/layer at 8.7k rows vs 38.4 for the
            # windowed-gather Pallas path (docs/performance.md). Same edges
            # as the sliced list graph, so numerically identical.
            dense_max = int(gat_window_dense_max)
            adj_win = None
            rev_win = None
            if win_size <= dense_max:
                rows_w = jnp.broadcast_to(
                    jnp.arange(win_size)[:, None], rel.shape
                )
                # int8 mask: the (win, win) zeros-init + scatter runs every
                # batch step — 1 byte/entry quarters that HBM traffic
                adj_win = jnp.zeros((win_size, win_size), jnp.int8)
                adj_win = adj_win.at[rows_w, rel].max(
                    msk_win.astype(jnp.int8)
                )
            elif rev is not None:
                # window-local reverse lists: slice rows (targets j), re-base
                # sources to window coordinates, and drop reverse edges whose
                # source row lies outside the window (their forward weight is
                # zero there anyway — the slice graph only has in-window rows)
                rsrc = jax.lax.dynamic_slice_in_dim(rev[0], win_start, win_size, 0)
                rslot = jax.lax.dynamic_slice_in_dim(rev[1], win_start, win_size, 0)
                rmask = jax.lax.dynamic_slice_in_dim(rev[2], win_start, win_size, 0)
                rsrc_rel = rsrc - win_start
                src_in = jnp.logical_and(rsrc_rel >= 0, rsrc_rel < win_size)
                rev_win = (
                    jnp.clip(rsrc_rel, 0, win_size - 1),
                    rslot,
                    jnp.where(src_in, rmask, 0.0),
                )
            gat_mu_w, gat_var_w = _apply_gat(
                net, vars_nostats, Y_win, rel, msk_win, rev_win, adj_win
            )
            pos = jnp.clip(batch_idx - win_start, 0, win_size - 1)
            gat_mu = gat_mu_w[pos]
            gat_var = gat_var_w[pos]
        else:
            # --- full-graph message passing, batch rows extracted ---
            # (adj present -> dense small-n MXU attention, ops/gat.py)
            gat_mu_full, gat_var_full = _apply_gat(
                net, vars_nostats, Y, nbr, nbr_mask, rev, tp_data.get("adj")
            )
            gat_mu = gat_mu_full[batch_idx]
            gat_var = gat_var_full[batch_idx]
        eps_g = jax.random.normal(rng_gat, gat_mu.shape, gat_mu.dtype)
        gat_sample = gat_mu + eps_g * jnp.sqrt(gat_var)
        gat_kl_el = 1.0 + jnp.log(gat_var) - gat_mu**2 - gat_var
        gat_kl = -0.5 * jnp.sum(gat_kl_el * batch_mask[:, None]) / gat_L

    # --- decode + reconstruction (SpaDOT.py:87-89) ---
    parts = [s for s in (svgp_sample, gat_sample) if s is not None]
    latent = jnp.concatenate(parts, axis=1)
    with jax.default_matmul_precision(net.mlp_matmul_precision):
        y_hat = net.apply(vars_nostats, latent, method=SpaDOTNet.decode)
    recon = jnp.sum(((y_b - y_hat) ** 2) * batch_mask[:, None]) / net.input_dim

    if mode == "dual":
        # --- alignment of branch norms (SpaDOT.py:91-93) ---
        norm_s = jnp.linalg.norm(svgp_sample, axis=1) / svgp_L
        norm_g = jnp.linalg.norm(gat_sample, axis=1) / gat_L
        align = jnp.sum(((norm_s - norm_g) ** 2) * batch_mask)

    losses = {
        "Recon": recon,
        "SVGP_KL": svgp_kl,
        "GAT_KL": gat_kl,
        "alignment": align,
    }
    return losses, latent, (new_state if train else None)


def kmeans_loss(latent, batch_idx, batch_mask, assignments, centers, z_dim):
    """KMeans pull toward frozen centroids (_train_utils.py:240-253).

    loss = ||latent - centers[assign]||_F^2 / z_dim / (#clusters present).
    """
    assign_b = assignments[batch_idx]
    diff2 = jnp.sum((latent - centers[assign_b]) ** 2, axis=1) * batch_mask
    k = centers.shape[0]
    onehot = jax.nn.one_hot(assign_b, k, dtype=latent.dtype) * batch_mask[:, None]
    n_present = jnp.maximum(jnp.sum(jnp.sum(onehot, axis=0) > 0), 1.0)
    return jnp.sum(diff2) / latent.shape[1] / n_present


def ot_loss(latent, batch_idx, batch_mask, assignments, centers, prev_centers, gamma_rownorm):
    """OT transport-cost pull between consecutive timepoints
    (_train_utils.py:272-307).

    Batch cluster centers = mean of batch latents per cluster, falling back to
    the stored full-data centroid for clusters absent from the batch; cost is
    the euclidean distance between previous-timepoint centroids and these
    centers; loss = mean(gamma ⊙ cost) with gamma row-normalized.
    """
    k = centers.shape[0]
    assign_b = assignments[batch_idx]
    onehot = jax.nn.one_hot(assign_b, k, dtype=latent.dtype) * batch_mask[:, None]
    counts = jnp.sum(onehot, axis=0)  # (k,)
    sums = onehot.T @ latent  # (k, z)
    batch_centers = jnp.where(
        counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
    )
    d2 = (
        jnp.sum(prev_centers**2, axis=1)[:, None]
        - 2.0 * prev_centers @ batch_centers.T
        + jnp.sum(batch_centers**2, axis=1)[None, :]
    )
    cost = jnp.sqrt(jnp.maximum(d2, 1e-30))
    return jnp.mean(gamma_rownorm * cost)


def full_latent_ext(
    net, variables, tp_data, svgp_state, ext_tables, *,
    kernel_scale, kernel_type, jitter=1e-2, row_mask=None,
    gat_window_dense_max=10000, vmap_chunk=1, kernel_batch=0,
):
    """`full_latent` with the GAT branch computed per receptive closure.

    ext_tables: the per-timepoint receptive tables (ext_idx (nb, P), ...,
    batch_pos (nb, b)) from data/graph.py:receptive_tables, whose batches
    are CONTIGUOUS row blocks (data/pipeline.py:make_batches) — so scanning
    closures and concatenating batch-row outputs reproduces the full-graph
    GAT exactly (tests/test_exact_batches.py) at ~1/4 the cost at 100k
    spots (the closure runs the fused dense kernels; the full graph only
    has the gather path).

    vmap_chunk > 1 runs the closure batches `vmap_chunk` at a time under
    jax.vmap instead of one per sequential scan step — the per-op profiles
    showed the extraction scan is dispatch-glue-bound (8.3 ms/ep CH /
    19.9 mouse / 201 atlas, profile_*_series.log), so batching the small
    closure kernels trades HBM working set (× chunk) for fewer, larger
    dispatches. Results are the same values batch-for-batch (vmap batches
    the identical per-closure computation; sentinel pad batches emit rows
    past n that the final slice drops). The Trainer resolves the chunk
    from the `gat_ext_vmap` config knob + a memory estimate
    (train/loop.py:_resolve_ext_vmap_chunk).

    kernel_batch > 1 (banded static-adjacency tables only; takes
    precedence over vmap_chunk) runs the closures `kernel_batch` at a time
    through the nb-BATCHED banded kernel
    (ops/gat_flash.py:gat_attention_banded_flash_batched): the closure
    axis lives in the kernel grid itself and the projections run as single
    large GEMMs, instead of vmap's op-by-op batching — the round-4 vmap
    arm REGRESSED at atlas (2 x 146 ms vs 201 ms sequential; dead end in
    CLAUDE.md) precisely because of the op-level batching glue this
    avoids. Resolved by the Trainer from `gat_ext_kernel_batch`
    (train/loop.py:_resolve_ext_kernel_batch).
    """
    Y, coords = tp_data["Y"], tp_data["coords"]
    n = Y.shape[0]
    mask = jnp.ones(n, Y.dtype) if row_mask is None else row_mask
    n_eff = jnp.asarray(n, Y.dtype) if row_mask is None else jnp.sum(row_mask)
    mode = net.encoder_mode
    parts = []
    if mode in ("dual", "svgp"):
        qnet_mu, qnet_var = net.apply(
            variables, Y, train=False, mask=None, method=SpaDOTNet.encode_svgp
        )
        terms = svgp_batch_terms(
            coords, qnet_mu, qnet_var, mask, n_eff,
            svgp_state["Z"], svgp_state["K_mm"], svgp_state["L_mm"],
            kernel_scale=kernel_scale, jitter=jitter, kernel_type=kernel_type,
            m_mask=svgp_state.get("m_mask"),
            kl_const=svgp_state.get("kl_const", 0.0),
            L_inv=svgp_state.get("L_inv"), C=svgp_state.get("C"),
            M=svgp_state.get("M"), Kt_inv=svgp_state.get("Kt_inv"),
            F=svgp_state.get("F"), logdet_CCj=svgp_state.get("logdet_CCj"),
            chol_backend=net.svgp_chol_backend,
            bt_shared=net.svgp_bt_shared,
        )
        parts.append(terms["p_m"])
    if mode in ("dual", "gat"):
        vars_nostats = {"params": variables["params"]}

        Y_gat = tp_data.get("Y_gat", Y)
        # optional host-pre-gathered (nb, P, G) closure rows (train/loop.py
        # gat_ext_pregather) appended LAST — same values as the per-closure
        # gather they replace
        ye = ext_tables.get("Y_ext")

        def one(xs_s):
            ext_s, y_b = (xs_s[:-1], xs_s[-1]) if ye is not None else (xs_s, None)
            mu_b, _ = _gat_ext_forward(
                net, vars_nostats, Y_gat, ext_s, gat_window_dense_max,
                y_ext=y_b,
            )
            return mu_b

        xs = ext_xs(ext_tables)
        if ye is not None:
            xs = xs + (ye,)
        nb = xs[0].shape[0]
        kb = int(kernel_batch)
        ea = ext_tables.get("ext_adj")
        if kb > 1 and ea is not None and ea.ndim == 4:
            c = min(kb, nb)
            nc = -(-nb // c)
            pad = nc * c - nb
            if pad:
                # sentinel closures: zero indices/adjacency — their output
                # rows land past row nb*b and are dropped by the [:n] slice
                xs = tuple(
                    jnp.concatenate(
                        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
                    )
                    for a in xs
                )
            xs_r = tuple(a.reshape((nc, c) + a.shape[1:]) for a in xs)

            def one_kb(xs_c):
                ext_c, y_c = (
                    (xs_c[:-1], xs_c[-1]) if ye is not None else (xs_c, None)
                )
                mu_cb, _ = _gat_ext_forward_batched(
                    net, vars_nostats, Y_gat, ext_c, y_ext=y_c
                )
                return mu_cb

            if nc == 1:
                mus = one_kb(tuple(a[0] for a in xs_r))     # (c, b, L)
            else:
                _, mus = jax.lax.scan(
                    lambda carry, xsc: (carry, one_kb(xsc)), None, xs_r
                )   # (nc, c, b, L)
            gat_mu = mus.reshape(-1, mus.shape[-1])
            if gat_mu.shape[0] < n:   # row-padded stacks (mesh mode)
                gat_mu = jnp.pad(
                    gat_mu, ((0, n - gat_mu.shape[0]), (0, 0))
                )
            parts.append(gat_mu[:n])
            return jnp.concatenate(parts, axis=1)
        c = max(1, min(int(vmap_chunk), nb))
        if c > 1:
            nc = -(-nb // c)
            pad = nc * c - nb
            if pad:
                # sentinel batches (zero indices/masks): their output rows
                # land past row nb*b and are dropped by the [:n] slice
                xs = tuple(
                    jnp.concatenate(
                        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
                    )
                    for a in xs
                )
            xs_r = tuple(a.reshape((nc, c) + a.shape[1:]) for a in xs)
            if nc == 1:
                mus = jax.vmap(one)(tuple(a[0] for a in xs_r))  # (c, b, L)
            else:
                _, mus = jax.lax.scan(
                    lambda carry, xsc: (carry, jax.vmap(one)(xsc)), None, xs_r
                )   # (nc, c, b, L)
        else:
            _, mus = jax.lax.scan(
                lambda carry, xs_s: (None, one(xs_s)), None, xs
            )   # (nb, b, L)
        gat_mu = mus.reshape(-1, mus.shape[-1])  # contiguous batches
        if gat_mu.shape[0] < n:   # row-padded stacks (mesh mode)
            gat_mu = jnp.pad(
                gat_mu, ((0, n - gat_mu.shape[0]), (0, 0))
            )
        parts.append(gat_mu[:n])
    return jnp.concatenate(parts, axis=1)


def full_latent(net, variables, tp_data, svgp_state, *, kernel_scale, kernel_type, jitter=1e-2, row_mask=None):
    """Posterior means over all spots of a timepoint (no sampling) —
    all_latent_samples (SpaDOT.py:96-123): SVGP posterior p_m concat GAT mu.

    Runs in eval mode (BatchNorm running stats) with the full data as the
    "batch" (N/b ratio = 1). row_mask marks real rows when the arrays are
    row-padded (fused stacked-timepoint mode); padded rows get arbitrary
    latents that callers must mask out.
    """
    Y, coords = tp_data["Y"], tp_data["coords"]
    n = Y.shape[0]
    mask = jnp.ones(n, Y.dtype) if row_mask is None else row_mask
    n_eff = jnp.asarray(n, Y.dtype) if row_mask is None else jnp.sum(row_mask)
    mode = net.encoder_mode
    parts = []
    if mode in ("dual", "svgp"):
        qnet_mu, qnet_var = net.apply(
            variables, Y, train=False, mask=None, method=SpaDOTNet.encode_svgp
        )
        terms = svgp_batch_terms(
            coords, qnet_mu, qnet_var, mask, n_eff,
            svgp_state["Z"], svgp_state["K_mm"], svgp_state["L_mm"],
            kernel_scale=kernel_scale, jitter=jitter, kernel_type=kernel_type,
            m_mask=svgp_state.get("m_mask"),
            kl_const=svgp_state.get("kl_const", 0.0),
            L_inv=svgp_state.get("L_inv"), C=svgp_state.get("C"),
            M=svgp_state.get("M"), Kt_inv=svgp_state.get("Kt_inv"),
            F=svgp_state.get("F"), logdet_CCj=svgp_state.get("logdet_CCj"),
            chol_backend=net.svgp_chol_backend,
            bt_shared=net.svgp_bt_shared,
        )
        parts.append(terms["p_m"])
    if mode in ("dual", "gat"):
        vars_nostats = {"params": variables["params"]}
        gat_mu, _ = _apply_gat(
            net, vars_nostats, Y, tp_data["nbr"], tp_data["nbr_mask"], None,
            tp_data.get("adj"),
        )
        parts.append(gat_mu)
    return jnp.concatenate(parts, axis=1)
