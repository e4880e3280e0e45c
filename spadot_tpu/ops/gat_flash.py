"""Flash-style fused dense-adjacency GAT attention (Pallas TPU kernel).

The XLA dense path (ops/gat.py:gat_attention_dense) materializes the
(H, n, n) logits and softmax tensors in HBM several times per layer —
measured HBM-bound at ~2.7 ms/layer fwd+bwd at n=2500 (docs/performance.md).
This kernel computes logits -> leaky_relu -> masked softmax -> alpha @ Wx
entirely in VMEM per (head, center-row-tile) grid step, so HBM traffic drops
to adj + Wx + outputs (~25x less). The backward recomputes the softmax from
the same tiles (flash-attention style) and accumulates dWx / d_scores across
row tiles in revisited output blocks.

Scope: one (n_pad, n_pad) adjacency tile row fits VMEM alongside one head of
Wx, i.e. n_pad*F*4 + Ti*n_pad*4 within ~12 MB -> n up to ~3k at F=512 (the
ChickenHeart regime; larger n takes the XLA dense or windowed paths).
Replaces: reference GATConv dense pass (SpaDOT/model/encoder.py:41-46,
dense adjacency at SpaDOT/utils/_utils.py:98-99).
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
_SLOPE = 0.2  # PyG GATConv default negative_slope (encoder.py uses default)
TILE = 128
# tests flip this to run the kernels in the Pallas interpreter on CPU
INTERPRET = False


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fwd_kernel(ed_ref, es_ref, adj_ref, wx_ref, out_ref):
    """One (head, center-tile) step: full-row masked softmax + aggregation."""
    ed = ed_ref[0]            # (Ti, 1)
    es = es_ref[0]            # (1, n_pad)
    # int8 mask in HBM; compare in f32 (v5e Mosaic lacks int8 compares)
    adj = adj_ref[:].astype(jnp.float32)   # (Ti, n_pad)
    logits = ed + es          # (Ti, n_pad)
    logits = jnp.where(logits >= 0, logits, _SLOPE * logits)
    keep = adj > 0
    logits = jnp.where(keep, logits, NEG)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.where(keep, jnp.exp(logits - m), 0.0)
    s = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
    alpha = p / s
    out_ref[0] = jax.lax.dot_general(
        alpha, wx_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(ed_ref, es_ref, adj_ref, wx_ref, g_ref,
                ded_ref, des_ref, dwx_ref):
    """Backward for one (head, center-tile): recompute softmax, emit
    d_e_dst (per tile) and accumulate d_e_src / dWx across tiles."""
    i = pl.program_id(1)
    ed = ed_ref[0]
    es = es_ref[0]
    adj = adj_ref[:].astype(jnp.float32)
    raw = ed + es
    logits = jnp.where(raw >= 0, raw, _SLOPE * raw)
    keep = adj > 0
    logits = jnp.where(keep, logits, NEG)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.where(keep, jnp.exp(logits - m), 0.0)
    s = jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
    alpha = p / s             # (Ti, n_pad)

    g = g_ref[0]              # (Ti, F)
    wx = wx_ref[0]            # (n_pad, F)
    # dalpha = g @ Wx^T  (contract F)
    dalpha = jax.lax.dot_general(
        g, wx, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t = jnp.sum(dalpha * alpha, axis=1, keepdims=True)
    dp = (dalpha - t) * alpha            # softmax backward
    dlog = jnp.where(raw >= 0, dp, _SLOPE * dp)  # leaky_relu backward

    ded_ref[0] = jnp.sum(dlog, axis=1, keepdims=True)          # (Ti, 1)

    @pl.when(i == 0)
    def _():
        des_ref[0] = jnp.zeros_like(des_ref[0])
        dwx_ref[0] = jnp.zeros_like(dwx_ref[0])

    des_ref[0] += jnp.sum(dlog, axis=0, keepdims=True)          # (1, n_pad)
    # dWx += alpha^T @ g  (contract Ti)
    dwx_ref[0] += jax.lax.dot_general(
        alpha, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


_FLASH_CORES = {}


def _flash_core_for(tile):
    """Tile-parametrized flash core (custom_vjp), cached per tile size.

    TILE=128 is the universal default; at small n_pad (the receptive-closure
    operating point, P ≈ 1.2k) the per-step VMEM working set also fits at
    tile 256, halving the grid-step count — the 2560-row TILE=256 VMEM
    blow-up recorded in docs/performance.md is a SIZE-dependent limit, not
    a kernel one (see flash_dense_max_n's budget arithmetic)."""
    if tile in _FLASH_CORES:
        return _FLASH_CORES[tile]

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def core(ed, es, adj, wx):
        """(H, n_pad, 1), (H, 1, n_pad), (n_pad, n_pad), (H, n_pad, F) ->
        (H, n_pad, F) aggregated outputs."""
        out, _ = fwd(ed, es, adj, wx)
        return out

    def fwd(ed, es, adj, wx):
        H, n_pad, F = wx.shape
        grid = (H, n_pad // tile)
        out = pl.pallas_call(
            _fwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile, 1), lambda h, i: (h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_pad), lambda h, i: (h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n_pad), lambda h, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, F), lambda h, i: (h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile, F), lambda h, i: (h, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, n_pad, F), jnp.float32),
            interpret=INTERPRET,
            cost_estimate=pl.CostEstimate(
                flops=2 * H * n_pad * n_pad * F,
                transcendentals=H * n_pad * n_pad,
                bytes_accessed=H * n_pad * (n_pad + 8 * F),
            ),
        )(ed, es, adj, wx)
        return out, (ed, es, adj, wx)

    def bwd(res, g):
        ed, es, adj, wx = res
        H, n_pad, F = wx.shape
        grid = (H, n_pad // tile)
        ded, des, dwx = pl.pallas_call(
            _bwd_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, tile, 1), lambda h, i: (h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_pad), lambda h, i: (h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, n_pad), lambda h, i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, F), lambda h, i: (h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, F), lambda h, i: (h, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tile, 1), lambda h, i: (h, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_pad), lambda h, i: (h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_pad, F), lambda h, i: (h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((H, n_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((H, 1, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((H, n_pad, F), jnp.float32),
            ],
            interpret=INTERPRET,
            cost_estimate=pl.CostEstimate(
                flops=6 * H * n_pad * n_pad * F,
                transcendentals=H * n_pad * n_pad,
                bytes_accessed=2 * H * n_pad * (n_pad + 8 * F),
            ),
        )(ed, es, adj, wx, g)
        return ded, des, None, dwx

    core.defvjp(fwd, bwd)
    _FLASH_CORES[tile] = core
    return core


# the universal-default core keeps its historical name (probes use it)
_flash_core = _flash_core_for(TILE)


def flash_dense_max_n(F=512, H=4, budget_bytes=10 * 2**20 + 2**19, tile=TILE):
    """Largest n_pad whose per-step VMEM working set fits at this tile.

    The BACKWARD is the binding constraint: it holds wx (n*F*4) AND the dwx
    accumulator block (n*F*4 again) plus g, the adj tile and the softmax
    recompute temporaries (~4·tile rows' worth). H is accepted for interface
    symmetry with the callers' (F, H) config but deliberately unused: the
    grid iterates one head per step, so per-step VMEM depends only on F and
    the tile. The budget is calibrated to the largest size measured to
    lower AND run fwd+bwd on a v5e (n_pad = 2560 at F = 512, H = 4,
    tile = 128 — scripts/bench_gat_paths.py); n_pad = 3072 is untested and
    may exhaust VMEM at lowering time."""
    del H  # per-step working set is per-head (grid splits over heads)
    n = budget_bytes // (4 * (F + 4 * tile))
    return (n // tile) * tile


def flash_tile_for(n_pad, F=512, H=4):
    """Largest eligible tile for this shape: 256 halves the grid-step count
    when the closure is small enough for its VMEM budget; 128 otherwise."""
    for tile in (256, TILE):
        if n_pad % tile == 0 and n_pad <= flash_dense_max_n(F, H, tile=tile):
            return tile
    return None


def gat_attention_dense_flash(
    h, adj_pad, W, att_src, att_dst, bias, *, concat=True, n=None
):
    """Drop-in fused-kernel variant of `gat_attention_dense`.

    adj_pad: (n_pad, n_pad) adjacency already padded to a multiple of 128
    (padded rows/cols all-zero; host builds this once per timepoint).
    h may be (n, F_in) with n <= n_pad; rows are zero-padded here.
    Returns (n, H*F) / (n, F) like the XLA path.
    """
    n = h.shape[0] if n is None else n
    n_pad = adj_pad.shape[0]
    HF = W.shape[1]
    H = att_src.shape[0]
    F = HF // H
    Wx = (h @ W).reshape(-1, H, F)
    if Wx.shape[0] < n_pad:
        Wx = jnp.pad(Wx, ((0, n_pad - Wx.shape[0]), (0, 0), (0, 0)))
    e_src = jnp.einsum("nhf,hf->nh", Wx, att_src)
    e_dst = jnp.einsum("nhf,hf->nh", Wx, att_dst)
    wx_h = Wx.transpose(1, 0, 2).astype(jnp.float32)       # (H, n_pad, F)
    ed = e_dst.T[:, :, None].astype(jnp.float32)           # (H, n_pad, 1)
    es = e_src.T[:, None, :].astype(jnp.float32)           # (H, 1, n_pad)
    tile = flash_tile_for(n_pad, F, H) or TILE
    if tile != TILE and not flash1_tile_supported(tile, F, H):
        tile = TILE  # unprobed/failed larger tile degrades, never crashes
    out = _flash_core_for(tile)(ed, es, adj_pad, wx_h)
    out = out.transpose(1, 0, 2)[:n]                       # (n, H, F)
    if concat:
        out = out.reshape(n, H * F)
    else:
        out = jnp.mean(out, axis=1)
    return (out + bias).astype(h.dtype)


# ---------------------------------------------------------------------------
# tiled variant (FlashAttention-2 structure): online softmax over j tiles, so
# VMEM holds only (TILE_I, TILE_J) work tiles. Despite having no VMEM n cap,
# it only WINS in the 2.5k-5k band (FLASH2_MAX_N below): beyond that its
# (H, n/TILE_I, n/TILE_J) grid-step count dominates and the XLA dense path
# streams its (H, n, n) tensors faster (measured 16.1 vs 12.7 ms at 8704).
# In-kernel dots use the DEFAULT matmul precision deliberately: it matches
# the XLA dense path's numerics, and forcing HIGHEST (6-pass bf16) measured
# 40% slower (docs/performance.md "dead ends").
# ---------------------------------------------------------------------------

TILE_I = 256
TILE_J = 512


def _flash2_fwd_kernel(ed_ref, es_ref, adj_ref, wx_ref,
                       out_ref, m_ref, l_ref, acc, m_s, l_s):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, NEG)
        l_s[:] = jnp.zeros_like(l_s)

    ed = ed_ref[0]                       # (TILE_I, 1)
    es = es_ref[0]                       # (1, TILE_J)
    adj = adj_ref[:].astype(jnp.float32)
    raw = ed + es
    logits = jnp.where(raw >= 0, raw, _SLOPE * raw)
    keep = adj > 0
    logits = jnp.where(keep, logits, NEG)

    m_prev = m_s[:]                      # (TILE_I, 1)
    m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    scale = jnp.exp(m_prev - m_cur)
    p = jnp.where(keep, jnp.exp(logits - m_cur), 0.0)
    l_s[:] = l_s[:] * scale + jnp.sum(p, axis=1, keepdims=True)
    m_s[:] = m_cur
    acc[:] = acc[:] * scale + jax.lax.dot_general(
        p, wx_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nj - 1)
    def _():
        l = jnp.maximum(l_s[:], 1e-30)
        out_ref[0] = acc[:] / l
        m_ref[0] = m_s[:]
        l_ref[0] = l


def _flash2_dq_kernel(ed_ref, es_ref, adj_ref, wx_ref, g_ref, m_ref, l_ref,
                      d_ref, ded_ref):
    """ded[i] = sum_j dlogit[i, j]; grid (h, i, j), j fastest, accumulate."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        ded_ref[0] = jnp.zeros_like(ded_ref[0])

    ed = ed_ref[0]
    es = es_ref[0]
    adj = adj_ref[:].astype(jnp.float32)
    raw = ed + es
    logits = jnp.where(raw >= 0, raw, _SLOPE * raw)
    keep = adj > 0
    logits = jnp.where(keep, logits, NEG)
    alpha = jnp.where(keep, jnp.exp(logits - m_ref[0]), 0.0) / l_ref[0]
    dalpha = jax.lax.dot_general(
        g_ref[0], wx_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = (dalpha - d_ref[0]) * alpha     # D_i = rowsum(dO . O), from XLA
    dlog = jnp.where(raw >= 0, dp, _SLOPE * dp)
    ded_ref[0] += jnp.sum(dlog, axis=1, keepdims=True)


def _flash2_dkv_kernel(ed_ref, es_ref, adj_ref, wx_ref, g_ref, m_ref, l_ref,
                       d_ref, des_ref, dwx_ref):
    """des[j] / dwx[j] accumulated over i; grid (h, j, i), i fastest."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        des_ref[0] = jnp.zeros_like(des_ref[0])
        dwx_ref[0] = jnp.zeros_like(dwx_ref[0])

    ed = ed_ref[0]                       # (TILE_I, 1)
    es = es_ref[0]                       # (1, TILE_J)
    adj = adj_ref[:].astype(jnp.float32) # (TILE_I, TILE_J)
    raw = ed + es
    logits = jnp.where(raw >= 0, raw, _SLOPE * raw)
    keep = adj > 0
    logits = jnp.where(keep, logits, NEG)
    alpha = jnp.where(keep, jnp.exp(logits - m_ref[0]), 0.0) / l_ref[0]
    dalpha = jax.lax.dot_general(
        g_ref[0], wx_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = (dalpha - d_ref[0]) * alpha
    dlog = jnp.where(raw >= 0, dp, _SLOPE * dp)
    des_ref[0] += jnp.sum(dlog, axis=0, keepdims=True)
    dwx_ref[0] += jax.lax.dot_general(
        alpha, g_ref[0], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@jax.custom_vjp
def _flash2_core(ed, es, adj, wx):
    out, _ = _flash2_fwd(ed, es, adj, wx)
    return out


def _flash2_fwd(ed, es, adj, wx):
    H, n_pad, F = wx.shape
    grid = (H, n_pad // TILE_I, n_pad // TILE_J)
    out, m, l = pl.pallas_call(
        _flash2_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_I, 1), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_J), lambda h, i, j: (h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_I, TILE_J), lambda h, i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_J, F), lambda h, i, j: (h, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_I, F), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_I, 1), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_I, 1), lambda h, i, j: (h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, n_pad, F), jnp.float32),
            jax.ShapeDtypeStruct((H, n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((H, n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_I, F), jnp.float32),
            pltpu.VMEM((TILE_I, 1), jnp.float32),
            pltpu.VMEM((TILE_I, 1), jnp.float32),
        ],
        interpret=INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * H * n_pad * n_pad * F,
            transcendentals=H * n_pad * n_pad,
            bytes_accessed=H * n_pad * n_pad + 8 * H * n_pad * F,
        ),
    )(ed, es, adj, wx)
    return out, (ed, es, adj, wx, m, l, out)


def _flash2_bwd(res, g):
    ed, es, adj, wx, m, l, out = res
    H, n_pad, F = wx.shape
    # D_i = rowsum(dO . O) — the FlashAttention-2 trick that removes the
    # full-row softmax-backward reduction from the kernels
    d = jnp.sum(g * out, axis=2, keepdims=True)  # (H, n_pad, 1)
    common_in = [ed, es, adj, wx, g, m, l, d]
    iospec = [
        pl.BlockSpec((1, TILE_I, 1), lambda h, i, j: (h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, TILE_J), lambda h, i, j: (h, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_I, TILE_J), lambda h, i, j: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_J, F), lambda h, i, j: (h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_I, F), lambda h, i, j: (h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_I, 1), lambda h, i, j: (h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_I, 1), lambda h, i, j: (h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_I, 1), lambda h, i, j: (h, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    ded = pl.pallas_call(
        _flash2_dq_kernel,
        grid=(H, n_pad // TILE_I, n_pad // TILE_J),
        in_specs=iospec,
        out_specs=pl.BlockSpec((1, TILE_I, 1), lambda h, i, j: (h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, n_pad, 1), jnp.float32),
        interpret=INTERPRET,
    )(*common_in)
    # dkv grid iterates (h, j, i): remap the block index lambdas
    iospec_kv = [
        pl.BlockSpec((1, TILE_I, 1), lambda h, j, i: (h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, TILE_J), lambda h, j, i: (h, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_I, TILE_J), lambda h, j, i: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_J, F), lambda h, j, i: (h, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_I, F), lambda h, j, i: (h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_I, 1), lambda h, j, i: (h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_I, 1), lambda h, j, i: (h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TILE_I, 1), lambda h, j, i: (h, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    des, dwx = pl.pallas_call(
        _flash2_dkv_kernel,
        grid=(H, n_pad // TILE_J, n_pad // TILE_I),
        in_specs=iospec_kv,
        out_specs=[
            pl.BlockSpec((1, 1, TILE_J), lambda h, j, i: (h, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_J, F), lambda h, j, i: (h, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((H, n_pad, F), jnp.float32),
        ],
        interpret=INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=4 * H * n_pad * n_pad * F,
            transcendentals=H * n_pad * n_pad,
            bytes_accessed=H * n_pad * n_pad + 8 * H * n_pad * F,
        ),
    )(*common_in)
    return ded, des, None, dwx


_flash2_core.defvjp(_flash2_fwd, _flash2_bwd)


def flash2_tile():
    """(TILE_I, TILE_J) of the tiled kernel — n_pad must divide TILE_J."""
    return TILE_I, TILE_J


# measured crossover (v5e, F=512, H=4, fwd+bwd): flash2 4.52 ms vs XLA dense
# 4.93 at n=4000, parity at 5000 (6.87 vs 6.71), LOSES at 8704 (16.1 vs 12.7
# — grid-step overhead: (H, n/TILE_I, n/TILE_J) steps dominate); beyond this
# the XLA dense path streams its (H, n, n) tensors well enough to win
FLASH2_MAX_N = 5120


def gat_attention_dense_flash2(
    h, adj_pad, W, att_src, att_dst, bias, *, concat=True
):
    """Tiled (FA2-style) fused dense-GAT layer; same contract as
    `gat_attention_dense_flash` but with no VMEM n cap — adj_pad must be a
    multiple of lcm(TILE_I, TILE_J) = TILE_J."""
    n = h.shape[0]
    n_pad = adj_pad.shape[0]
    HF = W.shape[1]
    H = att_src.shape[0]
    F = HF // H
    Wx = (h @ W).reshape(-1, H, F)
    if Wx.shape[0] < n_pad:
        Wx = jnp.pad(Wx, ((0, n_pad - Wx.shape[0]), (0, 0), (0, 0)))
    e_src = jnp.einsum("nhf,hf->nh", Wx, att_src)
    e_dst = jnp.einsum("nhf,hf->nh", Wx, att_dst)
    wx_h = Wx.transpose(1, 0, 2).astype(jnp.float32)
    ed = e_dst.T[:, :, None].astype(jnp.float32)
    es = e_src.T[:, None, :].astype(jnp.float32)
    out = _flash2_core(ed, es, adj_pad, wx_h)
    out = out.transpose(1, 0, 2)[:n]
    if concat:
        out = out.reshape(n, H * F)
    else:
        out = jnp.mean(out, axis=1)
    return (out + bias).astype(h.dtype)


# ---------------------------------------------------------------------------
# head-fused tiled variant ("flash3"): FlashAttention-2 structure like
# flash2, but engineered for the wx-streaming roofline that actually binds
# beyond ~5k rows (measured: an (i, j)-gridded head loop alone ties flash2
# at 14.9 ms/layer at P=7680 — grid-step count was NOT the constraint):
#   - grid (i, j) with ALL H heads per step: the adjacency tile is DMA'd and
#     cast once per (i, j) instead of once per (h, i, j);
#   - TALL i tiles (TILE3_I=512): per-layer wx traffic is ni full sweeps of
#     the (H, n, F) wx — halving ni halves the dominant HBM term;
#   - wx/g blocks stream in bfloat16 when the ambient matmul precision is
#     'default' (the quality-gated production mode): the MXU consumes bf16
#     operands anyway, so this halves the dominant traffic with NO numeric
#     change to the dots; at 'high'/'highest' everything stays f32;
#   - ONE backward kernel: des/dwx accumulate over i (FA2 dkv), and the
#     row-sums of dlog stream out as (i, j) partials that XLA reduces to ded
#     — the separate dq kernel (a full extra sweep recomputing the same
#     dlog) is gone.
# ---------------------------------------------------------------------------

# Tile choices are VMEM-driven (16M scoped limit, and the H-unrolled head
# loop keeps ~H x live-tensors x (TI, TJ) f32 temporaries on the stack):
#   fwd: TALL thin tiles — wx traffic is ni full sweeps, so TI is maxed;
#        TJ=128 keeps the per-head temporaries small (TI=512, TJ=256
#        measured 2.26M over the limit);
#   bwd: the cotangent g streams once per j tile, so TJ is as large as the
#        f32 dwx accumulator + double-buffered wx/g blocks allow.
# n_pad must be a multiple of TILE3_I.
TILE3_I = 512
TILE3_J = 256
TILE3_J_BWD = 512
TILE3_I_BWD = 256
# v5e has 128 MiB of physical VMEM; the compiler's default 16M scoped limit
# is what forced flash1/flash2's small tiles. flash3 requests more and
# spends it on tall tiles (fewer wx/g sweeps = less HBM traffic).
_VMEM_LIMIT = 64 * 2**20


def _fa2_fwd_heads(keep, ed_ref, es_ref, wx_ref, out_ref, m_s, l_s):
    """Shared online-softmax head loop of the flash3/flash3b forwards: one
    adjacency cast (`keep`) serves every head; out_ref doubles as the
    accumulator (revisited block, stays in VMEM across the j sweep) — no
    (H, TI, F) scratch needed. The head loop is a static Python unroll
    (Mosaic has no dynamic indexing on the head axis)."""
    for h in range(ed_ref.shape[0]):
        raw = ed_ref[h] + es_ref[h]         # (TI, 1) + (1, TJ)
        logits = jnp.where(raw >= 0, raw, _SLOPE * raw)
        logits = jnp.where(keep, logits, NEG)
        m_prev = m_s[h]
        m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
        scale = jnp.exp(m_prev - m_cur)
        p = jnp.where(keep, jnp.exp(logits - m_cur), 0.0)
        l_s[h] = l_s[h] * scale + jnp.sum(p, axis=1, keepdims=True)
        m_s[h] = m_cur
        out_ref[h] = out_ref[h] * scale + jax.lax.dot_general(
            p.astype(wx_ref.dtype), wx_ref[h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _fa2_bwd_heads(keep, ed_ref, es_ref, wx_ref, g_ref, m_ref, l_ref, d_ref,
                   des_ref, dwx_ref, store_dedp, valid=None):
    """Shared softmax-recompute head loop of the flash3/flash3b backwards:
    alpha from the saved (m, l), softmax + leaky-relu backward, des/dwx
    accumulated in-place, dlog row-sums handed to `store_dedp(h, val)` (the
    callers' partial-stream layouts differ). `valid` (flash3b window edges)
    scales alpha so out-of-range candidate strips contribute exactly 0."""
    for h in range(ed_ref.shape[0]):
        raw = ed_ref[h] + es_ref[h]
        logits = jnp.where(raw >= 0, raw, _SLOPE * raw)
        logits = jnp.where(keep, logits, NEG)
        alpha = jnp.where(keep, jnp.exp(logits - m_ref[h]), 0.0) / l_ref[h]
        if valid is not None:
            alpha = alpha * valid
        dalpha = jax.lax.dot_general(
            g_ref[h], wx_ref[h], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = (dalpha - d_ref[h]) * alpha
        dlog = jnp.where(raw >= 0, dp, _SLOPE * dp)
        des_ref[h] += jnp.sum(dlog, axis=0, keepdims=True)
        dwx_ref[h] += jax.lax.dot_general(
            alpha.astype(g_ref.dtype), g_ref[h],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        store_dedp(h, jnp.sum(dlog, axis=1, keepdims=True))


def _flash3_fwd_kernel(ed_ref, es_ref, adj_ref, wx_ref,
                       out_ref, m_ref, l_ref, m_s, l_s):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        m_s[:] = jnp.full_like(m_s, NEG)
        l_s[:] = jnp.zeros_like(l_s)

    keep = adj_ref[:].astype(jnp.float32) > 0  # once per (i, j) step
    _fa2_fwd_heads(keep, ed_ref, es_ref, wx_ref, out_ref, m_s, l_s)

    @pl.when(j == nj - 1)
    def _():
        l = jnp.maximum(l_s[:], 1e-30)
        out_ref[:] = out_ref[:] / l
        m_ref[:] = m_s[:]
        l_ref[:] = l


def _flash3_bwd_kernel(ed_ref, es_ref, adj_ref, wx_ref, g_ref, m_ref, l_ref,
                       d_ref, des_ref, dwx_ref, dedp_ref):
    """One backward sweep, grid (j, i) with i fastest: des/dwx accumulate
    across i per j tile; the dlog row-sums stream out as per-(i, j) partials
    (dedp) that XLA reduces — replacing a whole separate dq kernel."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        des_ref[:] = jnp.zeros_like(des_ref)
        dwx_ref[:] = jnp.zeros_like(dwx_ref)

    keep = adj_ref[:].astype(jnp.float32) > 0

    def store_dedp(h, val):
        dedp_ref[0, h] = val

    _fa2_bwd_heads(keep, ed_ref, es_ref, wx_ref, g_ref, m_ref, l_ref, d_ref,
                   des_ref, dwx_ref, store_dedp)


def _flash3_specs(H, F, kv_grid=False, ti=TILE3_I, tj=TILE3_J):
    """Block specs shared by the flash3 kernels. Index maps take (i, j) for
    the fwd/dq grids and (j, i) for the dkv grid (kv_grid=True)."""
    if kv_grid:
        I = lambda j, i: i  # noqa: E731, E741
        J = lambda j, i: j  # noqa: E731
    else:
        I = lambda i, j: i  # noqa: E731, E741
        J = lambda i, j: j  # noqa: E731
    return {
        "ed": pl.BlockSpec((H, ti, 1), lambda a, b: (0, I(a, b), 0),
                           memory_space=pltpu.VMEM),
        "es": pl.BlockSpec((H, 1, tj), lambda a, b: (0, 0, J(a, b)),
                           memory_space=pltpu.VMEM),
        "adj": pl.BlockSpec((ti, tj),
                            lambda a, b: (I(a, b), J(a, b)),
                            memory_space=pltpu.VMEM),
        "wx": pl.BlockSpec((H, tj, F), lambda a, b: (0, J(a, b), 0),
                           memory_space=pltpu.VMEM),
        "gi": pl.BlockSpec((H, ti, F), lambda a, b: (0, I(a, b), 0),
                           memory_space=pltpu.VMEM),
        "ri": pl.BlockSpec((H, ti, 1), lambda a, b: (0, I(a, b), 0),
                           memory_space=pltpu.VMEM),
        "rj": pl.BlockSpec((H, 1, tj), lambda a, b: (0, 0, J(a, b)),
                           memory_space=pltpu.VMEM),
        "wj": pl.BlockSpec((H, tj, F), lambda a, b: (0, J(a, b), 0),
                           memory_space=pltpu.VMEM),
    }


_FLASH3_CORE_CACHE = {}


def _flash3_core_for(ti):
    """Tile-parametrized flash3 core (custom_vjp), cached per forward i-tile
    height. TILE3_I=512 is the measured production default; ti=1024 (halving
    the wx full-sweep count, the measured binding stream) is the queued
    experiment for 1024-aligned shapes (SPADOT_FLASH3_TI=1024 +
    scripts/tpu_session.sh A/B) — the backward tiles are independent of ti
    (its binding stream is per-j, not per-i)."""
    if ti in _FLASH3_CORE_CACHE:
        return _FLASH3_CORE_CACHE[ti]

    @jax.custom_vjp
    def core(ed, es, adj, wx):
        out, _ = fwd(ed, es, adj, wx)
        return out

    def fwd(ed, es, adj, wx):
        H, n_pad, F = wx.shape
        s = _flash3_specs(H, F, ti=ti)
        grid = (n_pad // ti, n_pad // TILE3_J)
        out, m, l = pl.pallas_call(
            _flash3_fwd_kernel,
            grid=grid,
            in_specs=[s["ed"], s["es"], s["adj"], s["wx"]],
            out_specs=[s["gi"], s["ri"], s["ri"]],
            out_shape=[
                jax.ShapeDtypeStruct((H, n_pad, F), jnp.float32),
                jax.ShapeDtypeStruct((H, n_pad, 1), jnp.float32),
                jax.ShapeDtypeStruct((H, n_pad, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((H, ti, 1), jnp.float32),
                pltpu.VMEM((H, ti, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=INTERPRET,
            cost_estimate=pl.CostEstimate(
                flops=2 * H * n_pad * n_pad * F,
                transcendentals=H * n_pad * n_pad,
                bytes_accessed=n_pad * n_pad + 8 * H * n_pad * F,
            ),
        )(ed, es, adj, wx)
        return out, (ed, es, adj, wx, m, l, out)

    def bwd(res, g):
        ed, es, adj, wx, m, l, out = res
        H, n_pad, F = wx.shape
        # D_i = rowsum(dO . O) — the FlashAttention-2 trick that removes the
        # full-row softmax-backward reduction from the kernel
        d = jnp.sum(g * out, axis=2, keepdims=True)  # (H, n_pad, 1)
        g = g.astype(wx.dtype)  # stream the cotangents at the wx width
        nj = n_pad // TILE3_J_BWD
        skv = _flash3_specs(H, F, kv_grid=True, ti=TILE3_I_BWD,
                            tj=TILE3_J_BWD)
        in_specs_kv = [skv["ed"], skv["es"], skv["adj"], skv["wx"],
                       skv["gi"], skv["ri"], skv["ri"], skv["ri"]]
        # (nj, H, n_pad, 1) so the block's trailing dims satisfy Mosaic's
        # (8, 128)-or-full tiling rule (the array's last dim IS 1)
        dedp_spec = pl.BlockSpec(
            (1, H, TILE3_I_BWD, 1), lambda j, i: (j, 0, i, 0),
            memory_space=pltpu.VMEM,
        )
        des, dwx, dedp = pl.pallas_call(
            _flash3_bwd_kernel,
            grid=(nj, n_pad // TILE3_I_BWD),
            in_specs=in_specs_kv,
            out_specs=[skv["rj"], skv["wj"], dedp_spec],
            out_shape=[
                jax.ShapeDtypeStruct((H, 1, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((H, n_pad, F), jnp.float32),
                jax.ShapeDtypeStruct((nj, H, n_pad, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT
            ),
            interpret=INTERPRET,
            cost_estimate=pl.CostEstimate(
                flops=4 * H * n_pad * n_pad * F,
                transcendentals=H * n_pad * n_pad,
                bytes_accessed=n_pad * n_pad + 8 * H * n_pad * F,
            ),
        )(ed, es, adj, wx, g, m, l, d)
        ded = jnp.sum(dedp, axis=0)  # (H, n_pad, 1)
        return ded, des, None, dwx.astype(wx.dtype)

    core.defvjp(fwd, bwd)
    _FLASH3_CORE_CACHE[ti] = core
    return core


def flash3_ti():
    """Forward i-tile height for flash3: the measured 512 default, or the
    experimental 1024 (env SPADOT_FLASH3_TI=1024; pending TPU measurement —
    scripts/tpu_session.sh). 1024-misaligned shapes always use 512."""
    import os

    if os.environ.get("SPADOT_FLASH3_TI") == "1024":
        return 1024
    return TILE3_I

_BF16_PRECISIONS = (None, "default", "bfloat16", "fastest")


def gat_attention_dense_flash3(
    h, adj_pad, W, att_src, att_dst, bias, *, concat=True
):
    """Head-fused tiled dense-GAT layer; contract of
    `gat_attention_dense_flash2`. adj_pad must be a multiple of
    max(TILE3_I, TILE3_J). Under the ambient 'default' matmul precision the
    wx / cotangent streams run in bfloat16 (identical dot numerics to the
    XLA dense path's 1-pass bf16, half the dominant HBM traffic); any other
    precision keeps full float32 streams."""
    n = h.shape[0]
    n_pad = adj_pad.shape[0]
    HF = W.shape[1]
    H = att_src.shape[0]
    F = HF // H
    Wx = (h @ W).reshape(-1, H, F)
    if Wx.shape[0] < n_pad:
        Wx = jnp.pad(Wx, ((0, n_pad - Wx.shape[0]), (0, 0), (0, 0)))
    e_src = jnp.einsum("nhf,hf->nh", Wx, att_src)
    e_dst = jnp.einsum("nhf,hf->nh", Wx, att_dst)
    prec = jax.config.jax_default_matmul_precision
    wx_dt = jnp.bfloat16 if prec in _BF16_PRECISIONS else jnp.float32
    wx_h = Wx.transpose(1, 0, 2).astype(wx_dt)
    ed = e_dst.T[:, :, None].astype(jnp.float32)
    es = e_src.T[:, None, :].astype(jnp.float32)
    ti = flash3_ti()
    if ti != TILE3_I and (
        n_pad % ti != 0 or not (INTERPRET or flash3_ti_supported(ti, F, H))
    ):
        ti = TILE3_I  # misaligned/unprobed tall tile degrades, never crashes
    out = _flash3_core_for(ti)(ed, es, adj_pad, wx_h)
    out = out.transpose(1, 0, 2)[:n]
    if concat:
        out = out.reshape(n, H * F)
    else:
        out = jnp.mean(out, axis=1)
    return (out + bias).astype(h.dtype)


# ---------------------------------------------------------------------------
# banded head-fused variant ("flash3b"): flash3's FA2 structure restricted to
# the RCM band of a receptive closure (data/graph.py:rcm_reorder_tables). The
# XLA banded path (ops/gat.py:gat_attention_banded) already cuts the
# attention FLOPs to P*Wb, but it materializes the (ni, Wb, H, F) strip views
# and the (ni, TI, Wb, H) logits/alpha tensors in HBM (~200 MB/layer at atlas
# shapes). Here each (strip, j-tile) grid step DMAs its blocks straight out
# of the bpad-padded Wx — no strip views, no HBM softmax tensors — and the
# per-layer wx traffic drops from flash3's ni full sweeps of (H, n, F) to ni
# band sweeps of (H, Wb, F): Wb/P (~5x at atlas) less of the stream that
# measured as flash3's binding constraint.
#
# Layout contract (asserted in the wrapper; data/pipeline.py builds tables
# to match): strips of TI rows with TI % 128 == 0, band padding
# bpad = (Wb - TI)/2 a MULTIPLE OF TI, so strip s's window starts at padded
# row s*TI exactly and the backward's column blocks of size TI tile the
# window. Forward grid (ni, Wb/TJ) reuses flash3's online-softmax body; the
# single backward kernel runs on a (g, k) grid over global padded column
# blocks g x the nw = Wb/TI candidate strips that can see block g
# (i = g - (nw-1) + k; out-of-range candidates are zeroed in-kernel from the
# program ids), with des/dwx accumulated over consecutive k and the dlog
# row-sums streamed out as per-(g, k) partials that XLA segment-sums back to
# strips (flash3's dedp trick, banded).
# ---------------------------------------------------------------------------


def _flash3b_fwd_kernel(ed_ref, es_ref, adj_ref, wx_ref,
                        out_ref, m_ref, l_ref, m_s, l_s, j_axis=1):
    """flash3's forward body over a banded adjacency block (1, TI, TJ).

    j_axis: grid position of the j (window-column) sweep — 1 for the
    per-closure grid (ni, nj), 2 for the batched grid (nb, ni, nj); the
    batched grid's leading closure axis changes nothing else in the body
    (every block index already distinguishes closures)."""
    j = pl.program_id(j_axis)
    nj = pl.num_programs(j_axis)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
        m_s[:] = jnp.full_like(m_s, NEG)
        l_s[:] = jnp.zeros_like(l_s)

    keep = adj_ref[0].astype(jnp.float32) > 0  # (TI, TJ), shared by heads
    _fa2_fwd_heads(keep, ed_ref, es_ref, wx_ref, out_ref, m_s, l_s)

    @pl.when(j == nj - 1)
    def _():
        l = jnp.maximum(l_s[:], 1e-30)
        out_ref[:] = out_ref[:] / l
        m_ref[:] = m_s[:]
        l_ref[:] = l


def _flash3b_bwd_kernel(ed_ref, es_ref, adj_ref, wx_ref, g_ref, m_ref, l_ref,
                        d_ref, des_ref, dwx_ref, dedp_ref, *, ni,
                        gk_axes=(0, 1)):
    """One banded backward sweep, grid (g, k) with k (candidate strip)
    fastest: des/dwx accumulate over k per global column block g; the dlog
    row-sums stream out as per-(g, k) partials. Candidate strip
    i = g - (nw-1) + k can fall outside [0, ni) at the window edges — those
    steps read clamped (wrong) blocks, so their contribution is multiplied
    by 0 (validity recomputed here from the program ids). gk_axes: grid
    positions of (g, k) — (0, 1) per-closure, (1, 2) under the batched
    leading-closure grid."""
    gidx = pl.program_id(gk_axes[0])
    k = pl.program_id(gk_axes[1])
    nw = pl.num_programs(gk_axes[1])

    @pl.when(k == 0)
    def _():
        des_ref[:] = jnp.zeros_like(des_ref)
        dwx_ref[:] = jnp.zeros_like(dwx_ref)

    i_raw = gidx - (nw - 1) + k
    vf = jnp.where((i_raw >= 0) & (i_raw < ni), 1.0, 0.0)
    keep = adj_ref[0].astype(jnp.float32) > 0  # (TI, TJB)

    def store_dedp(h, val):
        dedp_ref[0, 0, h] = val

    _fa2_bwd_heads(keep, ed_ref, es_ref, wx_ref, g_ref, m_ref, l_ref, d_ref,
                   des_ref, dwx_ref, store_dedp, valid=vf)


@jax.custom_vjp
def _flash3b_core(ed, esp, adjb, wxp):
    out, _ = _flash3b_fwd(ed, esp, adjb, wxp)
    return out


def _flash3b_fwd(ed, esp, adjb, wxp):
    H, P, _ = ed.shape
    F = wxp.shape[2]
    ni, TI, Wb = adjb.shape
    TJ = TI if TI <= 256 else TI // 2
    r = TI // TJ
    grid = (ni, Wb // TJ)
    out, m, l = pl.pallas_call(
        _flash3b_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((H, TI, 1), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 1, TJ), lambda i, j: (0, 0, i * r + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TI, TJ), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, TJ, F), lambda i, j: (0, i * r + j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((H, TI, F), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, TI, 1), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, TI, 1), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, P, F), jnp.float32),
            jax.ShapeDtypeStruct((H, P, 1), jnp.float32),
            jax.ShapeDtypeStruct((H, P, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, TI, 1), jnp.float32),
            pltpu.VMEM((H, TI, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * H * P * Wb * F,
            transcendentals=H * P * Wb,
            bytes_accessed=ni * TI * Wb + 2 * H * ni * Wb * F + 6 * H * P * F,
        ),
    )(ed, esp, adjb, wxp)
    return out, (ed, esp, adjb, wxp, m, l, out)


def _flash3b_bwd(res, g):
    ed, esp, adjb, wxp, m, l, out = res
    H, P, _ = ed.shape
    Pp = wxp.shape[1]
    F = wxp.shape[2]
    ni, TI, Wb = adjb.shape
    nw = Wb // TI
    ngb = Pp // TI
    d = jnp.sum(g * out, axis=2, keepdims=True)  # (H, P, 1) FA2 D_i
    g = g.astype(wxp.dtype)

    # (g, k) -> candidate strip, clamped for the block DMA (the kernel
    # zeroes out-of-range contributions, so the XLA reduction below can
    # include every partial). Index maps get traced grid indices — the
    # clamping runs as scalar arithmetic at grid-index evaluation time.
    def _strip_of(gi, k):
        return jnp.clip(gi - (nw - 1) + k, 0, ni - 1)

    def _adj_idx(gi, k):
        ic = _strip_of(gi, k)
        return (ic, 0, jnp.clip(gi - ic, 0, nw - 1))

    strip_spec = lambda last: pl.BlockSpec(            # noqa: E731
        (H, TI, last), lambda gi, k: (0, _strip_of(gi, k), 0),
        memory_space=pltpu.VMEM,
    )
    des, dwx, dedp = pl.pallas_call(
        functools.partial(_flash3b_bwd_kernel, ni=ni),
        grid=(ngb, nw),
        in_specs=[
            strip_spec(1),                                        # ed
            pl.BlockSpec((H, 1, TI), lambda gi, k: (0, 0, gi),    # esp
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TI, TI), _adj_idx,                   # adjb
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, TI, F), lambda gi, k: (0, gi, 0),    # wxp
                         memory_space=pltpu.VMEM),
            strip_spec(F),                                        # g
            strip_spec(1),                                        # m
            strip_spec(1),                                        # l
            strip_spec(1),                                        # d
        ],
        out_specs=[
            pl.BlockSpec((H, 1, TI), lambda gi, k: (0, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, TI, F), lambda gi, k: (0, gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H, TI, 1), lambda gi, k: (gi, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, 1, Pp), jnp.float32),
            jax.ShapeDtypeStruct((H, Pp, F), jnp.float32),
            jax.ShapeDtypeStruct((ngb, nw, H, TI, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=4 * H * P * Wb * F,
            transcendentals=H * P * Wb,
            bytes_accessed=ni * TI * Wb + 4 * H * ni * Wb * F + 8 * H * P * F,
        ),
    )(ed, esp, adjb, wxp, g, m, l, d)
    # segment-sum the per-(g, k) ded partials back to strips (invalid
    # candidates were zeroed in-kernel, so every partial can be added at its
    # clamped strip)
    i_map = np.clip(
        np.arange(ngb)[:, None] - (nw - 1) + np.arange(nw)[None, :],
        0, ni - 1,
    ).ravel()
    flat = dedp.reshape(ngb * nw, H, TI, 1)
    ded = jnp.zeros((ni, H, TI, 1), jnp.float32).at[
        jnp.asarray(i_map)
    ].add(flat)
    ded = ded.transpose(1, 0, 2, 3).reshape(H, P, 1)
    return ded, des, None, dwx.astype(wxp.dtype)


_flash3b_core.defvjp(_flash3b_fwd, _flash3b_bwd)


# ---------------------------------------------------------------------------
# nb-batched flash3b ("flash3bb"): the closure-batch axis built INTO the
# kernel grid. The closure-batched latent extraction / KMeans refresh
# (models/model.py:full_latent_ext) runs the SAME banded attention over
# nb = ceil(n/b) receptive closures per timepoint; the sequential lax.scan
# form costs 2 x 100.7 ms/ep at atlas (profile_atlas_final.log) and the
# jax-level vmap form measured WORSE (2 x 146 ms — recorded round-4 dead
# end: vmap batches every surrounding op with layout-hostile transposes).
# Here only the kernel grid grows a leading closure axis — grid
# (nb, ni, nj) — and each block index picks its closure via a `None`-
# squeezed leading BlockSpec dim, so the kernel BODIES are the per-closure
# ones unchanged (j/g/k program-id positions parametrized). The surrounding
# GEMMs batch into single large MXU calls by construction (wrapper below),
# not by vmap. Replaces the reference's O(n^2) full-data extraction
# (SpaDOT/utils/_train_utils.py:108-116, model/SpaDOT.py:96-123) at
# closure-exact values.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _flash3b_core_batched(ed, esp, adjb, wxp):
    out, _ = _flash3b_fwd_batched(ed, esp, adjb, wxp)
    return out


def _flash3b_fwd_batched(ed, esp, adjb, wxp):
    nb, H, P, _ = ed.shape
    F = wxp.shape[3]
    _, ni, TI, Wb = adjb.shape
    TJ = TI if TI <= 256 else TI // 2
    r = TI // TJ
    grid = (nb, ni, Wb // TJ)
    out, m, l = pl.pallas_call(
        functools.partial(_flash3b_fwd_kernel, j_axis=2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, H, TI, 1), lambda b, i, j: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, 1, TJ), lambda b, i, j: (b, 0, 0, i * r + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, TI, TJ), lambda b, i, j: (b, i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, TJ, F), lambda b, i, j: (b, 0, i * r + j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, H, TI, F), lambda b, i, j: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, TI, 1), lambda b, i, j: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, TI, 1), lambda b, i, j: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, H, P, F), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, P, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, P, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, TI, 1), jnp.float32),
            pltpu.VMEM((H, TI, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * H * P * Wb * F,
            transcendentals=nb * H * P * Wb,
            bytes_accessed=nb * (
                ni * TI * Wb + 2 * H * ni * Wb * F + 6 * H * P * F
            ),
        ),
    )(ed, esp, adjb, wxp)
    return out, (ed, esp, adjb, wxp, m, l, out)


def _flash3b_bwd_batched(res, g):
    ed, esp, adjb, wxp, m, l, out = res
    nb, H, P, _ = ed.shape
    Pp = wxp.shape[2]
    F = wxp.shape[3]
    _, ni, TI, Wb = adjb.shape
    nw = Wb // TI
    ngb = Pp // TI
    d = jnp.sum(g * out, axis=3, keepdims=True)  # (nb, H, P, 1) FA2 D_i
    g = g.astype(wxp.dtype)

    def _strip_of(b, gi, k):
        return jnp.clip(gi - (nw - 1) + k, 0, ni - 1)

    def _adj_idx(b, gi, k):
        ic = _strip_of(b, gi, k)
        return (b, ic, 0, jnp.clip(gi - ic, 0, nw - 1))

    strip_spec = lambda last: pl.BlockSpec(            # noqa: E731
        (None, H, TI, last), lambda b, gi, k: (b, 0, _strip_of(b, gi, k), 0),
        memory_space=pltpu.VMEM,
    )
    des, dwx, dedp = pl.pallas_call(
        functools.partial(_flash3b_bwd_kernel, ni=ni, gk_axes=(1, 2)),
        grid=(nb, ngb, nw),
        in_specs=[
            strip_spec(1),                                        # ed
            pl.BlockSpec((None, H, 1, TI), lambda b, gi, k: (b, 0, 0, gi),
                         memory_space=pltpu.VMEM),                # esp
            pl.BlockSpec((None, 1, TI, TI), _adj_idx,             # adjb
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, TI, F), lambda b, gi, k: (b, 0, gi, 0),
                         memory_space=pltpu.VMEM),                # wxp
            strip_spec(F),                                        # g
            strip_spec(1),                                        # m
            strip_spec(1),                                        # l
            strip_spec(1),                                        # d
        ],
        out_specs=[
            pl.BlockSpec((None, H, 1, TI), lambda b, gi, k: (b, 0, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, TI, F), lambda b, gi, k: (b, 0, gi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, 1, H, TI, 1),
                         lambda b, gi, k: (b, gi, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, H, 1, Pp), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, Pp, F), jnp.float32),
            jax.ShapeDtypeStruct((nb, ngb, nw, H, TI, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=4 * nb * H * P * Wb * F,
            transcendentals=nb * H * P * Wb,
            bytes_accessed=nb * (
                ni * TI * Wb + 4 * H * ni * Wb * F + 8 * H * P * F
            ),
        ),
    )(ed, esp, adjb, wxp, g, m, l, d)
    i_map = np.clip(
        np.arange(ngb)[:, None] - (nw - 1) + np.arange(nw)[None, :],
        0, ni - 1,
    ).ravel()
    flat = dedp.reshape(nb, ngb * nw, H, TI, 1)
    ded = jnp.zeros((nb, ni, H, TI, 1), jnp.float32).at[
        :, jnp.asarray(i_map)
    ].add(flat)
    ded = ded.transpose(0, 2, 1, 3, 4).reshape(nb, H, P, 1)
    return ded, des, None, dwx.astype(wxp.dtype)


_flash3b_core_batched.defvjp(_flash3b_fwd_batched, _flash3b_bwd_batched)


def gat_attention_banded_flash_batched(
    h, band_adj, W, att_src, att_dst, bias, *, concat=True
):
    """`gat_attention_banded_flash` over a leading closure-batch axis:
    h (nb, P, F_in), band_adj (nb, ni, TI, Wb) — one kernel launch for all
    nb closures, one large MXU GEMM for all Wx projections. Same math,
    closure for closure, as the per-closure wrapper (differentially tested
    in tests/test_pallas.py)."""
    nb, ni, TI, Wb = band_adj.shape
    assert banded_flash_eligible(band_adj.shape[1:]), band_adj.shape
    bpad = (Wb - TI) // 2
    P = ni * TI
    assert h.shape[0] == nb and h.shape[1] == P, (h.shape, band_adj.shape)
    HF = W.shape[1]
    H = att_src.shape[0]
    F = HF // H
    Wx = (h.reshape(nb * P, -1) @ W).reshape(nb, P, H, F)
    e_src = jnp.einsum("bnhf,hf->bnh", Wx, att_src)
    e_dst = jnp.einsum("bnhf,hf->bnh", Wx, att_dst)
    prec = jax.config.jax_default_matmul_precision
    wx_dt = jnp.bfloat16 if prec in _BF16_PRECISIONS else jnp.float32
    wxp = jnp.pad(Wx, ((0, 0), (bpad, bpad), (0, 0), (0, 0)))
    wxp = wxp.transpose(0, 2, 1, 3).astype(wx_dt)           # (nb, H, Pp, F)
    esp = jnp.pad(e_src, ((0, 0), (bpad, bpad), (0, 0)))
    esp = esp.transpose(0, 2, 1)[:, :, None, :]             # (nb, H, 1, Pp)
    esp = esp.astype(jnp.float32)
    ed = e_dst.transpose(0, 2, 1)[:, :, :, None]            # (nb, H, P, 1)
    ed = ed.astype(jnp.float32)
    out = _flash3b_core_batched(ed, esp, band_adj, wxp)
    out = out.transpose(0, 2, 1, 3)                         # (nb, P, H, F)
    if concat:
        out = out.reshape(nb, P, H * F)
    else:
        out = jnp.mean(out, axis=2)
    return (out + bias).astype(h.dtype)


_FLASH3BB_CACHE = {}


def flash3b_batched_gat_supported(TI=TILE3_I, Wb=3 * TILE3_I, F=512, H=4):
    """Probe whether the nb-batched banded FORWARD compiles and computes
    the per-closure kernel's values on this backend at THIS band shape
    (the `None`-squeezed leading block dim and the 3-d grid must lower; a
    failure degrades the extraction to the sequential per-closure scan,
    never a mid-training crash). Forward-only by design: the batched
    kernel's sole consumer is the latent extraction / KMeans refresh,
    which never differentiates through it (train/loop.py), so a
    backward-only lowering failure must not veto the forward win — the
    backward math itself is certified in interpret mode
    (tests/test_pallas.py:test_flash3b_batched_matches_per_closure).
    Mirrors `flash3b_gat_supported`; nb is fixed small — per-step VMEM is
    nb-independent."""
    backend = jax.default_backend()
    key = (backend, TI, Wb, F, H)
    if key in _FLASH3BB_CACHE:
        return _FLASH3BB_CACHE[key]
    if backend != "tpu":
        _FLASH3BB_CACHE[key] = False
        return False
    try:
        nb, ni = 2, 4
        bpad = (Wb - TI) // 2
        P = ni * TI
        Pp = P + 2 * bpad
        # nonzero deterministic inputs: the probe ALSO cross-checks the
        # batched kernel's values against the per-closure kernel on this
        # backend (a lowering that compiles but miscomputes — the failure
        # mode the blocked-Cholesky Pallas attempt hit via approximate VPU
        # rsqrt — must degrade to the scan, not corrupt extraction)
        rs = np.random.RandomState(0)
        ed = jnp.asarray(rs.normal(size=(nb, H, P, 1)) * 0.3, jnp.float32)
        esp = jnp.asarray(rs.normal(size=(nb, H, 1, Pp)) * 0.3, jnp.float32)
        adjb = (rs.uniform(size=(nb, ni, TI, Wb)) < 0.05).astype(np.int8)
        adjb[:, :, np.arange(TI), bpad + np.arange(TI)] = 1
        adjb = jnp.asarray(adjb)
        for dt in (jnp.bfloat16, jnp.float32):
            wxp = jnp.asarray(rs.normal(size=(nb, H, Pp, F)), dt)
            out_b = jax.jit(_flash3b_core_batched)(ed, esp, adjb, wxp)
            jax.block_until_ready(out_b)
            out_s = jnp.stack([
                jax.jit(_flash3b_core)(ed[b], esp[b], adjb[b], wxp[b])
                for b in range(nb)
            ])
            err = float(jnp.max(jnp.abs(out_b - out_s)))
            ref = float(jnp.max(jnp.abs(out_s)))
            if not np.isfinite(err) or err > 1e-4 * max(ref, 1.0):
                _FLASH3BB_CACHE[key] = False
                return False
        _FLASH3BB_CACHE[key] = True
    except Exception:
        _FLASH3BB_CACHE[key] = False
    return _FLASH3BB_CACHE[key]


def banded_flash_eligible(band_adj_shape):
    """Shape gate for the banded fused kernel: TI lane-aligned and the band
    padding a multiple of TI (data/pipeline.py builds tables to satisfy
    this; direct callers with odd shapes fall back to the XLA banded path)."""
    ni, TI, Wb = band_adj_shape
    bpad = (Wb - TI) // 2
    return (
        TI % 128 == 0 and Wb == TI + 2 * bpad and bpad % TI == 0 and bpad > 0
    )


def gat_attention_banded_flash(
    h, band_adj, W, att_src, att_dst, bias, *, concat=True
):
    """Fused-kernel variant of `ops/gat.py:gat_attention_banded` — same
    banded (ni, TI, Wb) contract, same math, no HBM strip views. Under the
    ambient 'default' matmul precision the wx / cotangent streams run in
    bfloat16 (matching flash3 / the XLA paths' 1-pass bf16 dots); any other
    precision keeps full float32 streams."""
    ni, TI, Wb = band_adj.shape
    assert banded_flash_eligible(band_adj.shape), band_adj.shape
    bpad = (Wb - TI) // 2
    P = ni * TI
    assert h.shape[0] == P, (h.shape, band_adj.shape)
    HF = W.shape[1]
    H = att_src.shape[0]
    F = HF // H
    Wx = (h @ W).reshape(P, H, F)
    e_src = jnp.einsum("nhf,hf->nh", Wx, att_src)
    e_dst = jnp.einsum("nhf,hf->nh", Wx, att_dst)
    prec = jax.config.jax_default_matmul_precision
    wx_dt = jnp.bfloat16 if prec in _BF16_PRECISIONS else jnp.float32
    wxp = jnp.pad(Wx, ((bpad, bpad), (0, 0), (0, 0)))
    wxp = wxp.transpose(1, 0, 2).astype(wx_dt)              # (H, Pp, F)
    esp = jnp.pad(e_src, ((bpad, bpad), (0, 0)))
    esp = esp.T[:, None, :].astype(jnp.float32)             # (H, 1, Pp)
    ed = e_dst.T[:, :, None].astype(jnp.float32)            # (H, P, 1)
    out = _flash3b_core(ed, esp, band_adj, wxp)
    out = out.transpose(1, 0, 2)                            # (P, H, F)
    if concat:
        out = out.reshape(P, H * F)
    else:
        out = jnp.mean(out, axis=1)
    return (out + bias).astype(h.dtype)


_FLASH3B_CACHE = {}


def flash3b_gat_supported(TI=TILE3_I, Wb=3 * TILE3_I, F=512, H=4):
    """Probe whether the banded fused kernels compile AND run fwd+bwd on
    this backend at THIS band shape (strip height TI, window Wb, both
    stream widths). The auto strip-height choice admits TI ∈ {128, 256,
    512} (data/pipeline.py) and per-step VMEM scales with TI·Wb·F, so each
    distinct shape gets its own probe — a TI that fails at lowering must
    degrade to the XLA banded path, not crash mid-training. Mirrors
    `flash3_gat_supported`; probe executables land in the persistent
    compile cache. Per-step VMEM is ni-independent, so ni is fixed small."""
    backend = jax.default_backend()
    key = (backend, TI, Wb, F, H)
    if key in _FLASH3B_CACHE:
        return _FLASH3B_CACHE[key]
    if backend != "tpu":
        _FLASH3B_CACHE[key] = False
        return False
    try:
        ni = 4
        bpad = (Wb - TI) // 2
        P = ni * TI
        ed = jnp.zeros((H, P, 1), jnp.float32)
        esp = jnp.zeros((H, 1, P + 2 * bpad), jnp.float32)
        adjb = np.zeros((ni, TI, Wb), np.int8)
        adjb[:, np.arange(TI), bpad + np.arange(TI)] = 1  # in-band self-loops
        adjb = jnp.asarray(adjb)
        for dt in (jnp.bfloat16, jnp.float32):
            wxp = jnp.zeros((H, P + 2 * bpad, F), dt)

            def loss(ed, esp, wxp):
                return jnp.sum(_flash3b_core(ed, esp, adjb, wxp))

            grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(ed, esp, wxp)
            jax.block_until_ready(grads)
        _FLASH3B_CACHE[key] = True
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"banded fused flash GAT kernel (TI={TI}, Wb={Wb}) unavailable "
              f"on {backend}: {type(e).__name__}; using the XLA banded path")
        _FLASH3B_CACHE[key] = False
    return _FLASH3B_CACHE[key]


def pad_adjacency(adj, multiple=None, F=512, H=4):
    """Host-side: pad an (n, n) {0,1} adjacency to a lane-aligned square.

    Default alignment: 128 (TILE) — except when the 128-aligned size lands
    in the tiled-kernel band (flash_dense_max_n(F, H), FLASH2_MAX_N], where
    the mask is aligned to TILE_J so `gat_attention_dense_flash2` is
    eligible. (F, H) must be the model's actual per-head width / head count
    — GATLayer gates with `flash_dense_max_n(self.out_features, heads)`, so
    a mismatched default here could leave mid-size graphs aligned for
    neither fused kernel. Graphs above the band keep the tight 128
    alignment (512-aligning an n=9700 graph would add ~11% to every
    XLA-dense n² pass for a kernel that can never run there).

    Padded rows get a diagonal self-loop: an all-masked softmax row would be
    NaN in the XLA dense path's backward (NaN·0 cotangents leak into dW), so
    every row keeps at least one valid slot. Padded outputs are sliced away
    by the callers. Stored int8 — the mask is pure HBM traffic (read once
    per head per pass), so 1 byte/entry quarters it vs float32."""
    n = adj.shape[0]
    if multiple is None:
        n128 = _round_up(n, TILE)
        # above the flash1 band everything up to FLASH3_MAX_N goes to the
        # head-fused tiled kernel (or flash2 as its fallback) — both need
        # 512 alignment (TILE3_I == TILE_J); the <= 7% extra rows cost far
        # less than the measured ~1.8x kernel win (flash3 vs XLA dense)
        in_tiled_band = flash_dense_max_n(F, H) < n128 <= FLASH3_MAX_N
        multiple = TILE3_I if in_tiled_band else TILE
    n_pad = _round_up(n, multiple)
    out = np.zeros((n_pad, n_pad), np.int8)
    out[:n, :n] = np.asarray(adj) > 0
    pad_rows = np.arange(n, n_pad)
    out[pad_rows, pad_rows] = 1
    return out


def flash_gat_supported():
    """Runtime probe mirroring ops/gat_pallas.py:pallas_gat_supported."""
    from spadot_tpu.ops.gat_pallas import pallas_gat_supported

    return pallas_gat_supported()


_FLASH1_CACHE = {}


def flash1_tile_supported(tile, F=512, H=4):
    """Probe whether the fused dense kernel at THIS tile size compiles AND
    runs fwd+bwd on this backend, at the tile's own gate bound
    (flash_dense_max_n(..., tile=tile)). `gat_attention_dense_flash` picks
    its tile per shape (flash_tile_for: 256 at closure sizes, 128
    otherwise), so every tile the dispatcher can select needs its own probe
    — a toolchain where the 128-tile core lowers but the 256-tile working
    set fails at lowering would otherwise crash mid-training instead of
    degrading to the 128 tile. Probe executables land in the persistent
    compile cache, so warm restarts pay nothing."""
    backend = jax.default_backend()
    key = (backend, F, tile)
    if key in _FLASH1_CACHE:
        return _FLASH1_CACHE[key]
    if backend != "tpu":
        _FLASH1_CACHE[key] = False
        return False
    try:
        n_pad = flash_dense_max_n(F, H, tile=tile)
        if n_pad < tile:
            _FLASH1_CACHE[key] = False
            return False
        ed = jnp.zeros((H, n_pad, 1), jnp.float32)
        es = jnp.zeros((H, 1, n_pad), jnp.float32)
        adj = jnp.eye(n_pad, dtype=jnp.int8)
        wx = jnp.zeros((H, n_pad, F), jnp.float32)
        core = _flash_core_for(tile)

        def loss(ed, es, wx):
            return jnp.sum(core(ed, es, adj, wx))

        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(ed, es, wx)
        jax.block_until_ready(grads)
        _FLASH1_CACHE[key] = True
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"fused flash GAT kernel (tile={tile}) unavailable on "
              f"{backend}: {type(e).__name__}; falling back")
        _FLASH1_CACHE[key] = False
    return _FLASH1_CACHE[key]


def flash1_gat_supported(F=512, H=4):
    """Path-admission probe: the universal 128 tile must work (it is the
    fallback tile every shape can run); larger tiles degrade per-shape
    inside `gat_attention_dense_flash` via their own probes."""
    return flash1_tile_supported(TILE, F, H)


_FLASH2_CACHE = {}


# measured (v5e, F=512, H=4, fwd+bwd, K=31 edges/row): flash3 9.9 ms vs
# 18.1 XLA dense at P=7680, 11.7 vs 18.4 at 8192, 5.5 vs 7.2 at 4608 — it
# wins the whole band above flash1; the bound below only caps the probe
# shape (the dense-path gates, gat_window_dense_max / gat_dense_max_n,
# bind first in practice)
FLASH3_MAX_N = 16384

_FLASH3_CACHE = {}


def flash3_ti_supported(ti, F=512, H=4):
    """Probe whether the flash3 core at THIS forward tile height compiles
    AND runs fwd+bwd on this backend, at a multi-tile shape and both stream
    widths. (F, H) are part of the probe shape AND the cache key: the
    unrolled head loop's scoped-VMEM working set scales with H and F, so a
    non-default config must get its own verdict — a shape that fails at
    lowering degrades to flash2/XLA dense instead of crashing mid-training.
    Probe executables land in the persistent compile cache, so warm
    restarts pay nothing."""
    backend = jax.default_backend()
    key = (backend, ti, F, H)
    if key in _FLASH3_CACHE:
        return _FLASH3_CACHE[key]
    if backend != "tpu":
        _FLASH3_CACHE[key] = False
        return False
    try:
        n_pad = 2 * ti
        ed = jnp.zeros((H, n_pad, 1), jnp.float32)
        es = jnp.zeros((H, 1, n_pad), jnp.float32)
        adj = jnp.eye(n_pad, dtype=jnp.int8)
        core = _flash3_core_for(ti)
        # probe BOTH stream widths (bf16 is the production default;
        # f32 is the parity mode and has the larger VMEM footprint)
        for dt in (jnp.bfloat16, jnp.float32):
            wx = jnp.zeros((H, n_pad, F), dt)

            def loss(ed, es, wx):
                return jnp.sum(core(ed, es, adj, wx))

            grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(ed, es, wx)
            jax.block_until_ready(grads)
        _FLASH3_CACHE[key] = True
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"head-fused tiled flash GAT kernel (ti={ti}) unavailable on "
              f"{backend}: {type(e).__name__}; falling back")
        _FLASH3_CACHE[key] = False
    return _FLASH3_CACHE[key]


def flash3_gat_supported(F=512, H=4):
    """Path-admission probe (mirrors `flash2_gat_supported`): the default
    TILE3_I core must work at the model's configured (F, H); taller
    experimental tiles degrade per-shape inside
    `gat_attention_dense_flash3` via their own probes."""
    return flash3_ti_supported(TILE3_I, F, H)


def flash2_gat_supported(F=512, H=4):
    """Probe whether the tiled kernels compile AND run on this backend —
    forward and both backward kernels, at the production shape (the gate's
    upper bound): a forward-only or tiny-shape probe would pass while the
    dq/dkv lowering or a per-step VMEM limit fails mid-training. (F, H)
    are probed and keyed like `flash3_ti_supported`. The probe executables
    land in the persistent compile cache, so warm restarts pay nothing."""
    backend = jax.default_backend()
    key = (backend, F, H)
    if key in _FLASH2_CACHE:
        return _FLASH2_CACHE[key]
    if backend != "tpu":
        _FLASH2_CACHE[key] = False
        return False
    try:
        n_pad = FLASH2_MAX_N
        ed = jnp.zeros((H, n_pad, 1), jnp.float32)
        es = jnp.zeros((H, 1, n_pad), jnp.float32)
        adj = jnp.eye(n_pad, dtype=jnp.int8)
        wx = jnp.zeros((H, n_pad, F), jnp.float32)

        def loss(ed, es, wx):
            return jnp.sum(_flash2_core(ed, es, adj, wx))

        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(ed, es, wx)
        jax.block_until_ready(grads)
        _FLASH2_CACHE[key] = True
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"tiled flash GAT kernel unavailable on {backend}: "
              f"{type(e).__name__}; using the XLA dense path")
        _FLASH2_CACHE[key] = False
    return _FLASH2_CACHE[key]
