"""Graph attention over padded fixed-degree neighbor lists (XLA path).

Replaces torch_geometric's GATConv + NeighborLoader sampling
(SpaDOT/model/encoder.py:41-46, SpaDOT/utils/_train_utils.py:80-85) with a
TPU-native formulation: the spatial k-NN graph is stored as a dense (n, K)
int32 neighbor-index array plus a (n, K) mask (self-loop in slot 0), so
attention is a masked softmax over a static K axis — no scatter ops, no
dynamic shapes, no dense n×n adjacency (the reference builds one at
SpaDOT/utils/_utils.py:98-99; we never do).

Memory design: the (n, K, H·F) gathered-neighbor tensor is never
materialized. Attention logits need only the (n, H) per-node scores, and the
weighted aggregation runs as a `lax.scan` over the K neighbor slots with an
(n, H·F) accumulator — O(n·K·H) + O(n·H·F) live memory instead of O(n·K·H·F).
A fused Pallas kernel for this op lives in `gat_pallas.py`.

Backward design: autodiff of the neighbor gathers would emit scatter-adds
(slow on TPU — serialized HBM read-modify-write). With the host-precomputed
REVERSE padded lists (data/graph.py:reverse_graph) every cotangent is itself
a padded GATHER:

    dWx[j]    = sum_{(i,k): nbr[i,k]=j} w[i,k]·g[i]
              = sum_r rev_mask[j,r] · w[rev_src[j,r], rev_slot[j,r]]
                                    · g[rev_src[j,r]]

so both `gather_rows` and `nbr_aggregate` carry custom VJPs that scan the
reverse lists — the backward pass has the same gather-only structure (and
cost) as the forward. Callers that lack reverse lists (rev=None) fall back
to plain autodiff.
"""

import functools

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# scatter-free primitives (custom VJP over reverse padded lists)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def gather_rows(x, nbr, rev_src, rev_slot, rev_mask):
    """x[nbr] with a gather-only backward.

    x: (n, H); nbr: (n, K) int32 -> (n, K, H).
    Backward: dx[j, h] = sum_r rev_mask[j,r] · g[rev_src[j,r], rev_slot[j,r], h].
    """
    return x[nbr]


def _gather_rows_fwd(x, nbr, rev_src, rev_slot, rev_mask):
    return x[nbr], (nbr, rev_src, rev_slot, rev_mask, x.shape)


def _gather_rows_bwd(res, g):
    nbr, rev_src, rev_slot, rev_mask, x_shape = res
    Kr = rev_src.shape[1]

    def body(acc, r):
        src, slot, m = rev_src[:, r], rev_slot[:, r], rev_mask[:, r]
        # gather g at the (src, slot) edge positions: one flat row gather
        contrib = g[src, slot] * m[:, None]
        return acc + contrib, None

    dx, _ = jax.lax.scan(
        body, jnp.zeros(x_shape, g.dtype), jnp.arange(Kr)
    )
    return dx, None, None, None, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@jax.custom_vjp
def nbr_aggregate(Wx, w, nbr, rev_src, rev_slot, rev_mask):
    """out[i] = sum_k w[i, k, :, None] * Wx[nbr[i, k]] — all heads in one scan.

    Wx: (n, H, F); w: (n, K, H) (already masked). Backward is gather-only:
    d_w by a forward-shaped scan over K, d_Wx by a scan over the reverse
    lists (Kr slots).
    """
    return _aggregate_scan(Wx, w, nbr)


def _aggregate_scan(Wx, w, nbr):
    n, H, F = Wx.shape

    def body(acc, k):
        contrib = w[:, k, :, None] * Wx[nbr[:, k]]
        return acc + contrib, None

    acc0 = jnp.zeros((n, H, F), Wx.dtype)
    out, _ = jax.lax.scan(body, acc0, jnp.arange(nbr.shape[1]))
    return out


def _nbr_aggregate_fwd(Wx, w, nbr, rev_src, rev_slot, rev_mask):
    out = _aggregate_scan(Wx, w, nbr)
    return out, (Wx, w, nbr, rev_src, rev_slot, rev_mask)


def _nbr_aggregate_bwd(res, g):
    Wx, w, nbr, rev_src, rev_slot, rev_mask = res
    K = nbr.shape[1]
    Kr = rev_src.shape[1]

    # d_w[i,k,h] = <g[i,h,:], Wx[nbr[i,k],h,:]> — forward-shaped gather scan
    def dw_body(_, k):
        return None, jnp.einsum("nhf,nhf->nh", g, Wx[nbr[:, k]])

    _, dw_t = jax.lax.scan(dw_body, None, jnp.arange(K))  # (K, n, H)
    dw = dw_t.transpose(1, 0, 2)

    # d_Wx[j] = sum_r rev_mask · w[rev_src, rev_slot] · g[rev_src]
    def dwx_body(acc, r):
        src, slot, m = rev_src[:, r], rev_slot[:, r], rev_mask[:, r]
        wr = w[src, slot] * m[:, None]  # (n, H)
        return acc + wr[:, :, None] * g[src], None

    dWx, _ = jax.lax.scan(dwx_body, jnp.zeros_like(Wx), jnp.arange(Kr))
    return dWx, dw, None, None, None, None


nbr_aggregate.defvjp(_nbr_aggregate_fwd, _nbr_aggregate_bwd)


# ---------------------------------------------------------------------------
# dense-adjacency path (small n): attention as H batched (n, n) MXU matmuls
# ---------------------------------------------------------------------------

def dense_adjacency(nbr, nbr_mask, dtype=jnp.float32):
    """Host-side (n, n) {0,1} adjacency from the padded neighbor lists.

    Intended to be called ONCE per timepoint on numpy inputs (data/pipeline);
    at the small n where the dense path wins the n^2 mask is a few MB.
    """
    import numpy as np

    nbr = np.asarray(nbr)
    msk = np.asarray(nbr_mask) > 0
    n = nbr.shape[0]
    adj = np.zeros((n, n), dtype=np.float32)
    rows = np.repeat(np.arange(n), nbr.shape[1]).reshape(n, -1)
    adj[rows[msk], nbr[msk]] = 1.0
    return adj.astype(dtype)


def gat_attention_dense(
    h, adj_mask, W, att_src, att_dst, bias, *, concat=True, negative_slope=0.2
):
    """One multi-head GAT layer over a dense (n, n) adjacency mask.

    Same semantics as `gat_attention` (the (n, K) slots enumerate exactly the
    adjacency entries), but every gather disappears: logits are a rank-1
    broadcast, softmax is a masked dense row softmax, and aggregation is H
    batched (n, n) @ (n, F) matmuls — pure MXU work whose autodiff backward
    is also matmuls (dWx = alpha^T @ g, dalpha = g @ Wx^T). On TPU this wins
    below ~4k rows where the scan-gather path is HBM-latency-bound (measured
    in docs/performance.md); above that the n^2 terms lose to O(n*K).

    adj_mask: (n_pad, n_pad) {0,1} with n_pad >= n rows of h, self-loops on
    the diagonal INCLUDING padded rows (so no softmax row is ever empty —
    an empty row would poison the backward with NaN cotangents). Outputs are
    sliced back to h's n rows. `ops/gat_flash.py:pad_adjacency` builds the
    lane-aligned padded mask once per timepoint.
    """
    n = h.shape[0]
    n_pad = adj_mask.shape[0]
    if n_pad != n:
        h = jnp.pad(h, ((0, n_pad - n), (0, 0)))
    HF = W.shape[1]
    H = att_src.shape[0]
    F = HF // H
    Wx = (h @ W).reshape(n_pad, H, F)
    e_src = jnp.einsum("nhf,hf->nh", Wx, att_src)  # neighbor-side scores
    e_dst = jnp.einsum("nhf,hf->nh", Wx, att_dst)  # center-side scores
    # (H, n_center, n_neighbor) logits
    e = e_dst.T[:, :, None] + e_src.T[:, None, :]
    e = jax.nn.leaky_relu(e, negative_slope)
    keep = adj_mask[None, :, :] > 0
    e = jnp.where(keep, e, -jnp.inf)
    alpha = jax.nn.softmax(e, axis=2)
    alpha = jnp.where(keep, alpha, 0.0)
    out = jnp.einsum("hij,jhf->ihf", alpha, Wx)[:n]
    if concat:
        out = out.reshape(n, H * F)
    else:
        out = jnp.mean(out, axis=1)
    return out + bias


def gat_attention_banded(
    h, band_adj, W, att_src, att_dst, bias, *, concat=True, negative_slope=0.2
):
    """One multi-head GAT layer over a BANDED adjacency (exact).

    For RCM-reordered receptive closures every edge's |i - j| offset is
    bounded by a small bandwidth B (measured <= 508 at atlas scale vs
    P = 8192 — data/graph.py:rcm_reorder_tables), so each 512-row strip of
    centers only attends within a (TI + 2*Bpad)-column window. That turns
    the dense (H, P, P) attention — whose HBM-streamed n^2 tensors are what
    the dense path pays for — into ni batched (TI, Wb) strips: ~P/Wb times
    less logits/softmax/aggregation traffic AND compute, still pure MXU
    matmuls, still exact (the band covers every edge by construction).

    band_adj: (ni, TI, Wb) int8 — strip s's rows are closure rows
    [s*TI, (s+1)*TI) and its columns are closure rows
    [s*TI - Bpad, s*TI + TI + Bpad) where Bpad = (Wb - TI) // 2, clipped by
    zero-padding at the array edges; every row carries >= 1 valid slot.
    h: (P, F_in) with P = ni * TI (closure arrays are TI-aligned).
    """
    ni, TI, Wb = band_adj.shape
    bpad = (Wb - TI) // 2
    P = h.shape[0]
    HF = W.shape[1]
    H = att_src.shape[0]
    F = HF // H
    Wx = (h @ W).reshape(P, H, F)
    e_src = jnp.einsum("nhf,hf->nh", Wx, att_src)
    e_dst = jnp.einsum("nhf,hf->nh", Wx, att_dst)
    # strip views of the neighbor-side arrays, zero-padded by Bpad rows so
    # strip s starts at padded row s*TI (static gather indices)
    wxp = jnp.pad(Wx, ((bpad, bpad), (0, 0), (0, 0)))
    esp = jnp.pad(e_src, ((bpad, bpad), (0, 0)))
    idx = (jnp.arange(ni) * TI)[:, None] + jnp.arange(Wb)[None, :]
    wx_s = wxp[idx]                      # (ni, Wb, H, F)
    es_s = esp[idx]                      # (ni, Wb, H)
    ed_s = e_dst.reshape(ni, TI, H)
    e = ed_s[:, :, None, :] + es_s[:, None, :, :]     # (ni, TI, Wb, H)
    e = jax.nn.leaky_relu(e, negative_slope)
    keep = band_adj[:, :, :, None] > 0
    e = jnp.where(keep, e, -jnp.inf)
    alpha = jax.nn.softmax(e, axis=2)
    alpha = jnp.where(keep, alpha, 0.0)
    out = jnp.einsum("siwh,swhf->sihf", alpha, wx_s).reshape(P, H, F)
    if concat:
        out = out.reshape(P, H * F)
    else:
        out = jnp.mean(out, axis=1)
    return out + bias


# ---------------------------------------------------------------------------
# the GAT layer
# ---------------------------------------------------------------------------

def gat_attention(
    h, nbr, nbr_mask, W, att_src, att_dst, bias, *, concat=True,
    negative_slope=0.2, rev=None,
):
    """One multi-head GAT layer.

    Args:
      h: (n, F_in) node features.
      nbr: (n, K) int32 neighbor indices (self included); padded slots point
        anywhere valid and are masked out.
      nbr_mask: (n, K) 1.0/0.0 validity mask.
      W: (F_in, H*F) projection.
      att_src/att_dst: (H, F) attention vectors (PyG convention: src=neighbor
        j contribution, dst=center i contribution).
      bias: (H*F,) if concat else (F,).
      concat: concatenate heads (layers 1-2 of the reference) or average
        (layer 3, encoder.py:45 concat=False).
      rev: optional (rev_src, rev_slot, rev_mask) reverse padded lists
        (data/graph.py:reverse_graph) — enables the scatter-free backward.

    Returns (n, H*F) if concat else (n, F).
    """
    n = h.shape[0]
    HF = W.shape[1]
    H = att_src.shape[0]
    F = HF // H
    Wx = (h @ W).reshape(n, H, F)
    e_src = jnp.einsum("nhf,hf->nh", Wx, att_src)  # neighbor-side scores
    e_dst = jnp.einsum("nhf,hf->nh", Wx, att_dst)  # center-side scores

    # logits over the K neighbor slots: (n, K, H)
    if rev is not None:
        e_src_nbr = gather_rows(e_src, nbr, *rev)
    else:
        e_src_nbr = e_src[nbr]
    e = e_dst[:, None, :] + e_src_nbr
    e = jax.nn.leaky_relu(e, negative_slope)
    e = jnp.where(nbr_mask[:, :, None] > 0, e, -jnp.inf)
    alpha = jax.nn.softmax(e, axis=1)
    alpha = jnp.where(nbr_mask[:, :, None] > 0, alpha, 0.0)

    # weighted aggregation over neighbor slots, (n, H, F) accumulator
    if rev is not None:
        out = nbr_aggregate(Wx, alpha, nbr, *rev)
    else:
        out = _aggregate_scan(Wx, alpha, nbr)

    if concat:
        out = out.reshape(n, H * F)
    else:
        out = jnp.mean(out, axis=1)
    return out + bias
