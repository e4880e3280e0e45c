"""Data preparation for training: per-timepoint device arrays, inducing
points, and static-shape batch index tables.

Mirrors prepare_dataloader (SpaDOT/utils/_train_utils.py:37-94) and
_obtain_tp_loc_info (:118-140): coordinates are standardized per timepoint,
concatenated with a one-hot timepoint encoding, and `inducing_point_nums`
rows are sampled globally then split per timepoint (keeping only x, y).
Instead of a PyG NeighborLoader the batches are precomputed contiguous index
blocks (NeighborLoader runs unshuffled in the reference) padded to a static
(num_batches, batch_size) table with a mask, so the whole epoch is one
`lax.scan`.
"""
import random
from collections import OrderedDict

import numpy as np

from spadot_tpu.data.graph import build_knn_graph, effective_k, reverse_graph


def standardize_locations(adata):
    """Per-timepoint StandardScaler on coords + one-hot timepoint columns.

    Returns loc (n, 2 + n_tp) float64 like _obtain_tp_loc_info.
    """
    tp_codes = adata.obs["timepoint"].astype("category").cat.codes.to_numpy()
    n_tp = int(tp_codes.max()) + 1
    onehot = np.zeros((len(tp_codes), n_tp))
    onehot[np.arange(len(tp_codes)), tp_codes] = 1.0
    loc = np.asarray(adata.obsm["spatial"], dtype=np.float64)
    loc_scaled = np.zeros_like(loc)
    for i in range(n_tp):
        rows = tp_codes == i
        sub = loc[rows]
        mean = sub.mean(axis=0)
        std = sub.std(axis=0)
        std[std == 0] = 1.0
        loc_scaled[rows] = (sub - mean) / std
    return np.concatenate([loc_scaled, onehot], axis=1)


def make_batches(n: int, batch_size: int):
    """Contiguous blocks of size batch_size, last block padded + masked."""
    nb = max(1, (n + batch_size - 1) // batch_size)
    idx = np.arange(nb * batch_size, dtype=np.int32)
    mask = (idx < n).astype(np.float32)
    idx = np.minimum(idx, n - 1)
    return idx.reshape(nb, batch_size), mask.reshape(nb, batch_size)


def prepare_data(adata, model_config):
    """Build per-timepoint arrays + inducing points.

    Returns dict:
      timepoints: sorted list,
      inducing_points: OrderedDict tp -> (m_tp, 2) float array,
      N_train: OrderedDict tp -> int,
      tp_data: OrderedDict tp -> dict(Y, coords, nbr, nbr_mask, N_train,
                                      batch_idx, batch_mask, obs_rows),
    """
    loc = standardize_locations(adata)
    n_total = loc.shape[0]
    timepoints = model_config["timepoints"]
    tp_to_idx = {tp: i for i, tp in enumerate(timepoints)}
    tp_assign = np.argmax(loc[:, 2:], axis=1)
    tp_values = adata.obs["timepoint"].to_numpy()

    inducing_points_dict, N_train_dict = OrderedDict(), OrderedDict()
    if model_config.get("equal_inducing_split"):
        # TPU-friendly variant: equal inducing counts per timepoint, so every
        # timepoint shares ONE compiled training step (the reference's global
        # sample gives per-timepoint counts proportional to timepoint sizes,
        # i.e. different SVGP shapes per timepoint)
        m_per = int(model_config["inducing_point_nums"]) // len(timepoints)
        for tp in timepoints:
            i = tp_to_idx[tp]
            rows = np.where(tp_assign == i)[0]
            pick = random.sample(range(len(rows)), min(m_per, len(rows)))
            inducing_points_dict[tp] = loc[rows[pick], :2].copy()
            N_train_dict[tp] = int(np.sum(tp_values == tp))
    else:
        inducing_idx = random.sample(
            range(n_total), int(model_config["inducing_point_nums"])
        )
        inducing_points = loc[inducing_idx, :]
        ind_tp = np.argmax(inducing_points[:, 2:], axis=1)
        for tp in timepoints:
            i = tp_to_idx[tp]
            inducing_points_dict[tp] = inducing_points[ind_tp == i, :2].copy()
            N_train_dict[tp] = int(np.sum(tp_values == tp))

    # copy=False: expression is usually already float32 — a forced astype
    # copy is seconds + an extra X-sized allocation at atlas scale
    X = np.asarray(adata.toarray(), dtype=np.float32)
    tp_data = OrderedDict()
    batch_size = int(model_config["batch_size"])
    # static closure masks (banded or square) are decided AFTER the loop,
    # from every timepoint together — a per-tp choice at unequal closure
    # sizes decides inconsistently (a banded/square mix, or mixed strip
    # heights), and one deviating mask makes the fused epoch drop the whole
    # static stack. ext_info collects the per-tp facts the global decision
    # needs; pending_static is the square-mask 'auto' budget list.
    ext_info = {}
    pending_static = []
    for tp in timepoints:
        i = tp_to_idx[tp]
        rows = np.where(tp_assign == i)[0]
        # spatial locality (Morton) ordering: neighbor indices become
        # near-diagonal, which the windowed Pallas attention kernel and
        # XLA gather locality both exploit (see data/graph.py)
        from spadot_tpu.data.graph import locality_order

        rows = rows[locality_order(np.asarray(adata.obsm["spatial"])[rows])]
        n = len(rows)
        coords_tp = loc[rows, :2].astype(np.float32)
        spatial_raw = np.asarray(adata.obsm["spatial"])[rows]
        k = effective_k(n, model_config["knn_cutoff"], model_config["max_neighbors"])
        nbr, nbr_mask = build_knn_graph(spatial_raw, k)
        # reverse padded lists -> scatter-free GAT backward (ops/gat.py)
        rev_src, rev_slot, rev_mask = reverse_graph(nbr, nbr_mask)
        batch_idx, batch_mask = make_batches(n, batch_size)
        tp_data[tp] = {
            "Y": X[rows],
            "coords": coords_tp,
            "nbr": nbr,
            "nbr_mask": nbr_mask,
            "rev_src": rev_src,
            "rev_slot": rev_slot,
            "rev_mask": rev_mask,
            "N_train": float(n),
            "batch_idx": batch_idx,
            "batch_mask": batch_mask,
            "obs_rows": rows,
        }
        if not model_config.get("full_graph_gat", True):
            # EXACT minibatch GAT: per-batch 3-hop receptive-field closures
            # (data/graph.py:receptive_tables). 'auto' uses them when every
            # closure fits the dense-attention gate; the contiguous-window
            # approximation (gat_window) is the fallback.
            exact_cfg = str(
                model_config.get("gat_exact_batches", "auto")
            ).lower()
            if exact_cfg in ("auto", "true", "1"):
                from spadot_tpu.data.graph import receptive_tables

                ext = receptive_tables(
                    nbr, nbr_mask, batch_idx, batch_mask, hops=3
                )
                P = ext["ext_idx"].shape[1]
                dense_max = int(model_config.get("gat_window_dense_max", 10000))
                # banded closures: RCM-relabel each closure so every edge
                # fits a small |i-j| band, then store the attention mask
                # as (nb, ni, TI, Wb) strips — exact, ~P/Wb x less
                # attention work than any dense-square path. Banding also
                # LIFTS the dense-size gate: a banded P > dense_max closure
                # costs P*Wb, not P^2. The band-vs-square CHOICE is made
                # after the loop, once, for every timepoint together: the
                # fused epoch can only stack static masks of one kind and
                # one strip height, so a per-tp choice at unequal closure
                # sizes silently costs all timepoints the static stack
                # (the 5.9 ms/step scatter returns).
                banded_cfg = str(
                    model_config.get("gat_ext_banded", "auto")
                ).lower()
                ti_cfg = str(
                    model_config.get("gat_ext_band_ti", "auto")
                ).lower()
                # strip-height candidates: lane-aligned heights dividing P
                # (the post-loop pick intersects these across timepoints)
                cand = (
                    [512, 256, 128] if ti_cfg == "auto" else [int(ti_cfg)]
                )
                cand = [t for t in cand if P % t == 0 and P >= 3 * t]
                band = None
                if banded_cfg in ("auto", "true", "1") and cand:
                    from spadot_tpu.data.graph import rcm_reorder_tables

                    # reorder unconditionally: a pure relabeling (identical
                    # outputs), valid for the square masks too if the
                    # post-loop choice lands there
                    ext, band = rcm_reorder_tables(ext)
                if (
                    exact_cfg in ("true", "1") or P <= dense_max
                    or band is not None
                ):
                    tp_data[tp].update(ext)
                    ext_info[tp] = {"P": P, "band": band, "cand": cand}
                else:
                    import logging

                    logging.getLogger("spadot").info(
                        "tp %s: receptive closure P=%d exceeds "
                        "gat_window_dense_max=%d; falling back to exact "
                        "full-graph GAT (set gat_exact_batches: false for "
                        "the windowed approximation)",
                        tp, P, dense_max,
                    )
    # dense (n, n) adjacency for the small-n MXU attention path
    # (ops/gat.py:gat_attention_dense) — below the gate where the n^2 mask
    # is a few MB. Built only where something consumes it: the full-graph /
    # windowed forward and the full_latent refresh path. In exact-closure
    # mode every GAT call (training, latent, refresh) routes through the
    # closure tables instead, so the n^2 host build + device upload would
    # be pure waste there — and ext mode is all-or-nothing across
    # timepoints (train/loop.py: gat_ext), so one rejected closure means
    # every tp runs full-graph and needs its mask back.
    ext_all = all("ext_idx" in tp_data[tp] for tp in timepoints)
    if ext_all and ext_info:
        # global band-vs-square choice (see the in-loop comment): ONE strip
        # height for every timepoint, or square masks for every timepoint —
        # never a mix, which would cost the fused epoch its static stack.
        banded_cfg = str(model_config.get("gat_ext_banded", "auto")).lower()
        static_cfg = str(
            model_config.get("gat_ext_static_adj", "auto")
        ).lower()
        dense_max = int(model_config.get("gat_window_dense_max", 10000))
        infos = [ext_info[tp] for tp in timepoints]
        # a tp above the dense gate was accepted BECAUSE it can band; the
        # square alternative does not exist for it
        must_band = any(i["P"] > dense_max for i in infos)
        bandable = all(i["band"] is not None for i in infos)
        common = (
            set.intersection(*(set(i["cand"]) for i in infos))
            if bandable else set()
        )
        plan = None  # (ti, {tp: bpad}) when banding every timepoint
        if common:
            # shared strip height: minimize the P-weighted strip cost.
            # Attention work scales with Wb = TI + 2*bpad (bpad rounds the
            # RCM band UP to a strip-height multiple — the fused banded
            # kernel needs TI-aligned windows); wx streaming with Wb/TI
            # (taller strips amortize band reads — flash3's measured
            # binding constraint); the 512 weight calibrates stream ~
            # compute at TI=512, per the flash3 roofline measurements.
            best = None
            for t in sorted(common, reverse=True):  # ties keep tallest TI
                bps = {
                    tp: max(t, -(-ext_info[tp]["band"] // t) * t)
                    for tp in timepoints
                }
                est = sum(
                    ext_info[tp]["P"] * (t + 2 * bps[tp]) * (1.0 + 512.0 / t)
                    for tp in timepoints
                )
                if best is None or est < best[0]:
                    best = (est, t, bps)
            _, ti_b, bps = best
            # 'auto' bands only on a clear aggregate work win (3x — the
            # square-mask flash kernels are faster per element), unless a
            # timepoint above the dense gate forces banding; force with
            # gat_ext_banded: true to A/B
            win = 3 * sum(
                ext_info[tp]["P"] * (ti_b + 2 * bps[tp]) for tp in timepoints
            ) <= sum(i["P"] ** 2 for i in infos)
            if banded_cfg in ("true", "1") or must_band or win:
                plan = (ti_b, bps)
        if plan is not None:
            from spadot_tpu.data.graph import banded_closure_adjacency

            ti_b, bps = plan
            for tp in timepoints:
                d = tp_data[tp]
                d["ext_adj"] = banded_closure_adjacency(
                    d["loc_nbr"], d["loc_mask"], ti_b, bps[tp]
                )
        elif must_band:
            # no shared strip height exists but some timepoint can only
            # stay exact by banding: band each bandable tp at its own best
            # height, square the rest — the fused epoch then falls back to
            # the per-step mask build (correct, slower), which it logs
            import logging

            logging.getLogger("spadot").info(
                "closure strip heights cannot be unified across timepoints "
                "(P=%s); building mixed static masks — the fused epoch "
                "will use the per-step adjacency build",
                [i["P"] for i in infos],
            )
            from spadot_tpu.data.graph import (
                banded_closure_adjacency, closure_adjacency,
            )

            for tp in timepoints:
                info, d = ext_info[tp], tp_data[tp]
                if info["band"] is not None and info["cand"]:
                    t = max(info["cand"])
                    bp = max(t, -(-info["band"] // t) * t)
                    d["ext_adj"] = banded_closure_adjacency(
                        d["loc_nbr"], d["loc_mask"], t, bp
                    )
                elif (
                    info["P"] <= dense_max
                    and static_cfg in ("true", "1", "auto")
                ):
                    d["ext_adj"] = closure_adjacency(
                        d["loc_nbr"], d["loc_mask"]
                    )
        elif static_cfg in ("true", "1"):
            from spadot_tpu.data.graph import closure_adjacency

            for tp in timepoints:
                tp_data[tp]["ext_adj"] = closure_adjacency(
                    tp_data[tp]["loc_nbr"], tp_data[tp]["loc_mask"]
                )
        elif static_cfg == "auto":
            pending_static = list(timepoints)
    if ext_all and pending_static:
        # 'auto' square static masks: one consistent decision for every
        # deferred timepoint, from the TRUE summed whole-run size
        total_bytes = sum(
            tp_data[tp]["loc_nbr"].shape[0]
            * tp_data[tp]["ext_idx"].shape[1] ** 2
            for tp in pending_static
        )
        budget = float(
            model_config.get("gat_ext_static_budget_gb", 4.0)
        ) * 2**30
        if total_bytes <= budget:
            from spadot_tpu.data.graph import closure_adjacency

            for tp in pending_static:
                tp_data[tp]["ext_adj"] = closure_adjacency(
                    tp_data[tp]["loc_nbr"], tp_data[tp]["loc_mask"]
                )
    dense_max_n = int(model_config.get("gat_dense_max_n", 10000))
    for tp in timepoints:
        d = tp_data[tp]
        n = d["Y"].shape[0]
        if not ext_all and n <= dense_max_n:
            from spadot_tpu.ops.gat import dense_adjacency
            from spadot_tpu.ops.gat_flash import pad_adjacency

            # lane-aligned padded mask: ready for the fused flash kernel,
            # and the XLA dense path handles n_pad >= n transparently; the
            # model's actual (F, H) decide the tiled-kernel alignment band
            d["adj"] = pad_adjacency(
                dense_adjacency(d["nbr"], d["nbr_mask"]),
                F=int(model_config.get("gat_encoder_hidden", 512)),
                H=int(model_config.get("gat_attention_heads", 4)),
            )
    return {
        "timepoints": timepoints,
        "inducing_points": inducing_points_dict,
        "N_train": N_train_dict,
        "tp_data": tp_data,
    }


def save_inducing_points(args, inducing_points_dict):
    """Write inducing_points.csv (parity with _utils.py:102-118)."""
    import os
    import pandas as pd

    frames = []
    for tp, pts in inducing_points_dict.items():
        df = pd.DataFrame(pts, columns=["norm-pixel_x", "norm-pixel_y"])
        df["timepoint"] = tp
        frames.append(df)
    out = pd.concat(frames, ignore_index=True)
    out.to_csv(args.output_dir + os.sep + args.prefix + "inducing_points.csv", index=False)
