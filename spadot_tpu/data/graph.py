"""Spatial k-NN graph construction as padded fixed-degree neighbor lists.

Reference builds a DENSE (n, n) adjacency with self-loops
(SpaDOT/utils/_utils.py:52-100) and feeds it through dense_to_sparse +
NeighborLoader. Here the graph goes straight from the sklearn k-NN query to a
static (n, K+1) int32 neighbor-index array (slot 0 = self-loop) plus a
validity mask — O(n·K) memory, jit-friendly, and the exact degree rule of the
reference is preserved: k = min(max_neighbors, knn_cutoff * round(n/1000))
(_train_utils.py:69).
"""
import numpy as np
from sklearn.neighbors import NearestNeighbors


def reverse_graph(nbr: np.ndarray, nbr_mask: np.ndarray):
    """Reverse padded adjacency: for each node j, the (i, k) pairs with
    nbr[i, k] == j, padded to the max in-degree.

    Returns (rev_src (n, Kr) int32: the i's, rev_slot (n, Kr) int32: the k's,
    rev_mask (n, Kr) float32). Used to express the GAT aggregation backward
    dWx[j] = sum_{(i,k): nbr[i,k]=j} w[i,k]·g[i] as a plain padded GATHER
    over the reverse lists instead of K sequential scatter-adds.
    """
    n, K = nbr.shape
    ii, kk = np.nonzero(nbr_mask > 0)
    jj = nbr[ii, kk]
    order = np.argsort(jj, kind="stable")
    ii, kk, jj = ii[order], kk[order], jj[order]
    counts = np.bincount(jj, minlength=n)
    Kr = max(int(counts.max()) if len(jj) else 1, 1)
    rev_src = np.zeros((n, Kr), np.int32)
    rev_slot = np.zeros((n, Kr), np.int32)
    rev_mask = np.zeros((n, Kr), np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # vectorized fill: position of each edge within its target's bucket
    pos = np.arange(len(jj)) - starts[jj]
    rev_src[jj, pos] = ii
    rev_slot[jj, pos] = kk
    rev_mask[jj, pos] = 1.0
    return rev_src, rev_slot, rev_mask


def effective_k(n_obs: int, knn_cutoff: int, max_neighbors: int) -> int:
    k = min(int(max_neighbors), int(knn_cutoff) * int(round(n_obs / 1000.0)))
    return max(k, 1)


def locality_order(
    coords: np.ndarray, cell_bits: int = 8, method: str = "morton"
) -> np.ndarray:
    """Spatial locality permutation over a 2^bits grid.

    Reordering spots so that spatial neighbors are index-neighbors turns the
    GAT's random-row gathers into near-diagonal accesses — the windowed
    Pallas attention kernel (ops/gat_pallas.py) relies on this, and XLA's
    gather locality improves too. Returns `perm` such that coords[perm] is
    curve-ordered.

    method: "morton" (Z-order, default) or "hilbert". Measured (102k uniform
    + 20k clustered spots, K=32): Hilbert's continuity does NOT buy tighter
    neighbor lists here — mean neighbor index spread 511 vs Morton's 421 and
    window-drop 2.17% vs 2.07% at 102k — so Morton stays the default.
    """
    c = np.asarray(coords, dtype=np.float64)
    mins = c.min(axis=0)
    spans = np.maximum(c.max(axis=0) - mins, 1e-12)
    grid = ((c - mins) / spans * (2**cell_bits - 1)).astype(np.uint64)
    x, y = grid[:, 0], grid[:, 1]
    if method == "hilbert":
        code = _hilbert_code(x, y, cell_bits)
    else:
        code = (_morton_spread(x) << np.uint64(1)) | _morton_spread(y)
    return np.argsort(code, kind="stable")


def _morton_spread(v):
    v = v & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def _hilbert_code(x, y, bits: int):
    """Vectorized Hilbert curve index (the classic xy2d rotate-and-fold walk,
    one iteration per grid level, applied to whole numpy arrays)."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate the quadrant: when ry == 0, flip (if rx == 1) then swap x/y
        flip = (ry == 0) & (rx == 1)
        x = np.where(flip, s - 1 - x, x)
        y = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x2 = np.where(swap, y, x)
        y2 = np.where(swap, x, y)
        x, y = x2, y2
        s >>= 1
    return d


def receptive_tables(nbr, nbr_mask, batch_idx, batch_mask, hops=3, pad_to=128):
    """Static per-batch receptive-field tables for EXACT minibatch GAT.

    For each batch, the `hops`-hop closure of its rows is precomputed so a
    training step can run the full L-layer GAT on that subgraph and read off
    batch-row outputs that are EXACTLY the full-graph values: h^(1) is exact
    on every row within hops-1 of the batch (all its in-edges' sources lie in
    the closure), so by induction h^(L) is exact on the batch rows. This is
    the deterministic, edge-exact replacement for both the reference's
    sampled 2-hop NeighborLoader subgraphs (_train_utils.py:80-85,
    subgraph_type="induced" — which DOES drop edges) and the contiguous
    Morton-window approximation (models/model.py gat_window), which drops
    the 1-2% of edges crossing the window boundary.

    Returns dict of arrays, all padded to a common P (multiple of `pad_to`
    for TPU lane alignment of the dense (P, P) attention):
      ext_idx  (nb, P) int32   rows of the closure (sorted; padded slots
                               repeat row 0 with mask 0)
      ext_mask (nb, P) f32     1 for real closure rows
      loc_nbr  (nb, P, K) int32 neighbor lists relabeled to closure-local
                               indices; out-of-closure targets masked (these
                               only occur on rows exactly `hops` away, whose
                               outputs are never read)
      loc_mask (nb, P, K) f32
      batch_pos(nb, b) int32   batch rows' positions within the closure
    """
    n, K = nbr.shape
    nb, b = batch_idx.shape
    valid_edges = nbr_mask > 0
    exts = []
    for bi in range(nb):
        rows = batch_idx[bi][batch_mask[bi] > 0]
        in_set = np.zeros(n, bool)
        in_set[rows] = True
        for _ in range(int(hops)):
            members = np.nonzero(in_set)[0]
            tgt = nbr[members][valid_edges[members]]
            in_set[tgt] = True
        exts.append(np.nonzero(in_set)[0])
    P = max(len(e) for e in exts)
    P = -(-P // pad_to) * pad_to
    if P <= 1536:
        # small closures: align to 256 so the fused flash kernel can run at
        # TILE=256 (half the grid steps; 1536 = largest 256-multiple inside
        # ops/gat_flash.py:flash_dense_max_n(tile=256)'s VMEM budget)
        P = -(-P // 256) * 256
    elif P > 2560:
        # large closures: align to the head-fused tiled kernel's i tile
        # (ops/gat_flash.py:TILE3_I) — measured 9.9 vs 18.1 ms/layer fwd+bwd
        # at P=7680 over the XLA dense path; <= 7% extra rows
        P = -(-P // 512) * 512
    ext_idx = np.zeros((nb, P), np.int32)
    ext_mask = np.zeros((nb, P), np.float32)
    loc_nbr = np.zeros((nb, P, K), np.int32)
    loc_mask = np.zeros((nb, P, K), np.float32)
    batch_pos = np.zeros((nb, b), np.int32)
    pos = np.full(n, -1, np.int64)
    for bi, ext in enumerate(exts):
        p = len(ext)
        ext_idx[bi, :p] = ext
        ext_mask[bi, :p] = 1.0
        pos[:] = -1
        pos[ext] = np.arange(p)
        ln = pos[nbr[ext]]
        lm = nbr_mask[ext] * (ln >= 0)
        loc_nbr[bi, :p] = np.maximum(ln, 0)
        loc_mask[bi, :p] = lm
        # padded closure rows: self-loop sentinel keeps every softmax row
        # non-empty (an all-masked row NaN-poisons the backward)
        loc_nbr[bi, p:, 0] = np.arange(p, P)
        loc_mask[bi, p:, 0] = 1.0
        batch_pos[bi] = np.maximum(pos[batch_idx[bi]], 0).astype(np.int32)
    return {
        "ext_idx": ext_idx, "ext_mask": ext_mask,
        "loc_nbr": loc_nbr, "loc_mask": loc_mask, "batch_pos": batch_pos,
    }


def rcm_reorder_tables(ext):
    """Reverse-Cuthill-McKee reorder each closure's LOCAL labeling in place.

    Morton-ordered closures have long-range local edges at Morton
    discontinuities (p99 |i-j| ~ P/2), but RCM on the closure graph brings
    the maximum bandwidth down to a few hundred (measured <= 508 at
    P = 8192 / K = 31 / batch 4096 — atlas scale), unlocking the exact
    banded attention path (ops/gat.py:gat_attention_banded). The reorder is
    a pure relabeling: same graph, same batch rows, identical outputs.

    Returns (ext, band) where band is the max |i - j| over all real edges
    after reordering. Padding rows (mask 0, self-loop sentinel) keep their
    positions at the tail — bandwidth 0.
    """
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    ext_idx, ext_mask = ext["ext_idx"], ext["ext_mask"]
    loc_nbr, loc_mask = ext["loc_nbr"], ext["loc_mask"]
    batch_pos = ext["batch_pos"]
    nb, P, K = loc_nbr.shape
    band = 0
    for bi in range(nb):
        p = int(ext_mask[bi].sum())
        rows = np.repeat(np.arange(p), K)
        data = loc_mask[bi, :p].ravel() > 0
        cols = loc_nbr[bi, :p].ravel()
        A = sp.coo_matrix(
            (data[data], (rows[data], cols[data])), shape=(p, p)
        ).tocsr()
        perm = reverse_cuthill_mckee(A + A.T, symmetric_mode=True)
        perm = np.asarray(perm, np.int64)
        inv = np.empty(P, np.int64)
        inv[perm] = np.arange(p)
        inv[p:] = np.arange(p, P)  # padding rows stay put
        full_perm = np.concatenate([perm, np.arange(p, P)])
        ext_idx[bi] = ext_idx[bi][full_perm]
        ext_mask[bi] = ext_mask[bi][full_perm]
        loc_nbr[bi] = inv[loc_nbr[bi][full_perm]]
        loc_mask[bi] = loc_mask[bi][full_perm]
        batch_pos[bi] = inv[batch_pos[bi]]
        r = np.broadcast_to(np.arange(P)[:, None], (P, K))
        off = np.abs(loc_nbr[bi] - r)[loc_mask[bi] > 0]
        if off.size:
            band = max(band, int(off.max()))
    return ext, band


def banded_closure_adjacency(loc_nbr, loc_mask, ti, bpad):
    """Static (nb, ni, TI, Wb) int8 banded closure masks (Wb = TI + 2*bpad).

    Strip s of closure bi covers center rows [s*TI, (s+1)*TI); its columns
    map to closure rows [s*TI - bpad, s*TI + TI + bpad), zero (masked)
    outside the valid range. Requires every edge's |i - j| <= bpad
    (rcm_reorder_tables' band) — asserted here."""
    nb, P, K = loc_nbr.shape
    assert P % ti == 0, (P, ti)
    ni = P // ti
    wb = ti + 2 * bpad
    adj = np.zeros((nb, ni, ti, wb), np.int8)
    rows = np.broadcast_to(np.arange(P)[None, :, None], (nb, P, K))
    off = loc_nbr - rows  # signed offset, |off| <= bpad for real edges
    valid = loc_mask > 0
    assert np.abs(off[valid]).max() <= bpad, "band smaller than an edge"
    s = rows // ti                       # strip of each center row
    r_in = rows % ti                     # row within strip
    c_in = off + (rows - s * ti) + bpad  # column within strip window
    b_idx = np.broadcast_to(np.arange(nb)[:, None, None], (nb, P, K))
    np.maximum.at(
        adj,
        (b_idx[valid], s[valid], r_in[valid], c_in[valid]),
        np.ones(int(valid.sum()), np.int8),
    )
    return adj


def closure_adjacency(loc_nbr, loc_mask):
    """Static (nb, P, P) int8 closure adjacencies from receptive tables.

    The closure tables never change during training, so building the dense
    attention mask once on the host removes the per-step (P, P) scatter
    from the batch scan (measured 5.9 ms/step at P=7680 — ~0.3 s/epoch at
    atlas scale). Storage is the caller's trade: nb * P^2 bytes per
    timepoint (int8), gated by `gat_ext_static_adj` in the pipeline."""
    nb, P, K = loc_nbr.shape
    adj = np.zeros((nb, P, P), np.int8)
    rows = np.broadcast_to(np.arange(P)[None, :, None], (nb, P, K))
    bi = np.broadcast_to(np.arange(nb)[:, None, None], (nb, P, K))
    np.maximum.at(adj, (bi, rows, loc_nbr), (loc_mask > 0).astype(np.int8))
    return adj


def build_knn_graph(coords: np.ndarray, k: int):
    """Return (nbr (n, k+1) int32, nbr_mask (n, k+1) float32).

    Slot 0 is the self-loop (torch_geometric GATConv adds one by default;
    the reference also adds one to its adjacency at _utils.py:99).
    """
    n = coords.shape[0]
    k = min(k, n - 1)
    nbrs = NearestNeighbors(n_neighbors=k + 1, algorithm="auto").fit(coords)
    _, indices = nbrs.kneighbors(coords)
    # drop the query point explicitly by IDENTITY, not by assuming it sits in
    # column 0 — with duplicate coordinates sklearn breaks the distance-0 tie
    # arbitrarily, and positional dropping would discard a true neighbor
    # while duplicating the self-loop
    rows = np.arange(n)
    is_self = indices == rows[:, None]
    # keep the first k non-self entries of each row (stable order)
    keep_order = np.argsort(is_self, axis=1, kind="stable")  # non-self first
    indices = np.take_along_axis(indices, keep_order, axis=1)[:, :k]
    nbr = np.concatenate([rows[:, None], indices], axis=1)
    mask = np.ones_like(nbr, dtype=np.float32)
    return nbr.astype(np.int32), mask
