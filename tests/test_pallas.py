"""Pallas kernels (interpret mode on CPU) vs their XLA references."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spadot_tpu.ops.gat import gat_attention
from spadot_tpu.ops.gat_pallas import (
    aggregate_reference,
    aggregate_windowed,
    gat_attention_pallas,
)
from spadot_tpu.ops.sinkhorn_pallas import lse_rows_reference, make_lse_rows_pallas


def test_lse_rows_kernel_matches_reference(rng):
    I, J, d = 100, 150, 24
    X0 = jnp.asarray(rng.normal(size=(I, d)), jnp.float32)
    X1 = jnp.asarray(rng.normal(size=(J, d)), jnp.float32)
    sq0 = jnp.sum(X0**2, 1)
    add = jnp.asarray(rng.normal(size=J), jnp.float32)
    fn = make_lse_rows_pallas(3.7, block_i=32, block_j=64, interpret=True)
    got = fn(X0, sq0, X1, add)
    want = lse_rows_reference(X0, sq0, X1, add, 3.7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_windowed_aggregation_matches_reference(rng):
    n, K, F = 300, 7, 16
    Wx = jnp.asarray(rng.normal(size=(n, F)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(size=(n, K)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, n, size=(n, K)), jnp.int32)
    mask = jnp.asarray(rng.uniform(size=(n, K)) > 0.2, jnp.float32)
    ref = aggregate_reference(Wx, alpha * mask, nbr, jnp.ones_like(mask))
    # narrow window forces heavy use of the out-of-window correction
    got = aggregate_windowed(Wx, alpha, nbr, mask, 64, 16, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_windowed_aggregation_gradients(rng):
    n, K, F = 200, 5, 8
    Wx = jnp.asarray(rng.normal(size=(n, F)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(size=(n, K)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, n, size=(n, K)), jnp.int32)
    mask = jnp.ones((n, K), jnp.float32)

    def loss_p(Wx, alpha):
        return jnp.sum(aggregate_windowed(Wx, alpha, nbr, mask, 64, 32, True) ** 2)

    def loss_r(Wx, alpha):
        return jnp.sum(aggregate_reference(Wx, alpha * mask, nbr, jnp.ones_like(mask)) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(Wx, alpha)
    gr = jax.grad(loss_r, argnums=(0, 1))(Wx, alpha)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1] * mask), atol=1e-4)


def test_windowed_aggregation_rev_gradients(rng):
    """aggregate_windowed_rev (scatter-free backward over reverse lists,
    kernel-accelerated) == autodiff of the dense reference."""
    from spadot_tpu.data.graph import reverse_graph
    from spadot_tpu.ops.gat_pallas import aggregate_windowed_rev

    n, K, F = 200, 5, 8
    Wx = jnp.asarray(rng.normal(size=(n, F)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(size=(n, K)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, n, size=(n, K)), jnp.int32)
    mask = jnp.asarray(rng.uniform(size=(n, K)) > 0.2, jnp.float32)
    rev = tuple(map(jnp.asarray, reverse_graph(np.asarray(nbr), np.asarray(mask))))

    def loss_p(Wx, alpha):
        # narrow window: both the forward and the reverse-backward kernel
        # must lean on their sparse corrections
        return jnp.sum(
            aggregate_windowed_rev(Wx, alpha, nbr, mask, *rev, 64, 16, True) ** 2
        )

    def loss_r(Wx, alpha):
        return jnp.sum(aggregate_reference(Wx, alpha * mask, nbr, jnp.ones_like(mask)) ** 2)

    got = aggregate_windowed_rev(Wx, alpha, nbr, mask, *rev, 64, 16, True)
    ref = aggregate_reference(Wx, alpha * mask, nbr, jnp.ones_like(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    gp = jax.grad(loss_p, argnums=(0, 1))(Wx, alpha)
    gr = jax.grad(loss_r, argnums=(0, 1))(Wx, alpha)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1] * mask), atol=1e-4)


def test_full_gat_layer_pallas_matches_xla(rng):
    n, K, H, Fh, Fin = 150, 6, 2, 8, 12
    h = jnp.asarray(rng.normal(size=(n, Fin)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, n, size=(n, K)), jnp.int32).at[:, 0].set(
        jnp.arange(n)
    )
    mask = jnp.asarray(rng.uniform(size=(n, K)) > 0.1, jnp.float32).at[:, 0].set(1.0)
    W = jnp.asarray(rng.normal(size=(Fin, H * Fh)), jnp.float32)
    a_s = jnp.asarray(rng.normal(size=(H, Fh)), jnp.float32)
    a_d = jnp.asarray(rng.normal(size=(H, Fh)), jnp.float32)
    for concat in (True, False):
        b = jnp.asarray(rng.normal(size=(H * Fh,) if concat else (Fh,)), jnp.float32)
        o_xla = gat_attention(h, nbr, mask, W, a_s, a_d, b, concat=concat)
        o_pls = gat_attention_pallas(
            h, nbr, mask, W, a_s, a_d, b, concat=concat,
            tile=64, window=32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(o_pls), np.asarray(o_xla), atol=2e-5
        )


def test_flash_dense_gat_matches_xla(rng):
    """Fused flash dense-GAT kernel (interpret mode) vs the XLA dense path:
    outputs AND gradients (input, projection, attention vectors), including
    a row-padded adjacency."""
    from spadot_tpu.ops import gat_flash
    from spadot_tpu.ops.gat import dense_adjacency, gat_attention_dense
    from spadot_tpu.data.graph import build_knn_graph

    n, F_in, H, F = 100, 12, 2, 128  # n_pad = 128 > n exercises padding
    xy = rng.uniform(0, 10, size=(n, 2))
    nbr, msk = build_knn_graph(xy, 6)
    adj_pad = jnp.asarray(gat_flash.pad_adjacency(dense_adjacency(nbr, msk)))
    h = jnp.asarray(rng.normal(size=(n, F_in)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(F_in, H * F)) * 0.2, jnp.float32)
    a_s = jnp.asarray(rng.normal(size=(H, F)) * 0.2, jnp.float32)
    a_d = jnp.asarray(rng.normal(size=(H, F)) * 0.2, jnp.float32)

    gat_flash.INTERPRET = True
    try:
        for concat in (True, False):
            bias = jnp.asarray(
                rng.normal(size=(H * F,) if concat else (F,)), jnp.float32
            )

            def loss_x(h, W, a_s, a_d):
                out = gat_attention_dense(
                    h, adj_pad, W, a_s, a_d, bias, concat=concat
                )
                return jnp.sum(out**2), out

            def loss_f(h, W, a_s, a_d):
                out = gat_flash.gat_attention_dense_flash(
                    h, adj_pad, W, a_s, a_d, bias, concat=concat
                )
                return jnp.sum(out**2), out

            (_, o_ref), g_ref = jax.value_and_grad(
                loss_x, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
            (_, o_fl), g_fl = jax.value_and_grad(
                loss_f, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
            np.testing.assert_allclose(
                np.asarray(o_fl), np.asarray(o_ref), rtol=2e-4, atol=2e-4
            )
            for a, b in zip(g_fl, g_ref):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
                )
    finally:
        gat_flash.INTERPRET = False


def test_flash2_tiled_dense_gat_matches_xla(rng):
    """Tiled FA2-style dense-GAT kernels (online softmax over j tiles,
    split dq/dkv backward) vs the XLA dense path — outputs and all
    gradients, with n spanning multiple j tiles and row padding."""
    from spadot_tpu.ops import gat_flash
    from spadot_tpu.ops.gat import dense_adjacency, gat_attention_dense
    from spadot_tpu.data.graph import build_knn_graph

    n, F_in, H, F = 700, 10, 2, 128  # n_pad = 1024 = 2 j-tiles, 4 i-tiles
    xy = rng.uniform(0, 10, size=(n, 2))
    nbr, msk = build_knn_graph(xy, 6)
    # explicit TILE_J alignment: the auto rule 128-aligns sizes below the
    # flash2 band, but this test drives the tiled kernel directly
    adj_pad = jnp.asarray(
        gat_flash.pad_adjacency(dense_adjacency(nbr, msk), multiple=512)
    )
    assert adj_pad.shape[0] == 1024
    h = jnp.asarray(rng.normal(size=(n, F_in)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(F_in, H * F)) * 0.2, jnp.float32)
    a_s = jnp.asarray(rng.normal(size=(H, F)) * 0.2, jnp.float32)
    a_d = jnp.asarray(rng.normal(size=(H, F)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H * F,)), jnp.float32)

    gat_flash.INTERPRET = True
    try:
        def loss_x(h, W, a_s, a_d):
            out = gat_attention_dense(h, adj_pad, W, a_s, a_d, bias)
            return jnp.sum(out**2), out

        def loss_f(h, W, a_s, a_d):
            out = gat_flash.gat_attention_dense_flash2(
                h, adj_pad, W, a_s, a_d, bias
            )
            return jnp.sum(out**2), out

        (_, o_ref), g_ref = jax.value_and_grad(
            loss_x, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
        (_, o_fl), g_fl = jax.value_and_grad(
            loss_f, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
        np.testing.assert_allclose(
            np.asarray(o_fl), np.asarray(o_ref), rtol=2e-4, atol=2e-4
        )
        for a, b in zip(g_fl, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
            )
    finally:
        gat_flash.INTERPRET = False


def test_flash3_headfused_dense_gat_matches_xla(rng):
    """Head-fused tiled dense-GAT kernels (flash3: grid (i, j), all heads
    per step, adjacency tile cast once) vs the XLA dense path — outputs and
    all gradients, with n spanning multiple tiles and row padding."""
    from spadot_tpu.ops import gat_flash
    from spadot_tpu.ops.gat import dense_adjacency, gat_attention_dense
    from spadot_tpu.data.graph import build_knn_graph

    n, F_in, H, F = 700, 10, 4, 128  # n_pad = 1024 = 2 i tiles, 4 j tiles
    xy = rng.uniform(0, 10, size=(n, 2))
    nbr, msk = build_knn_graph(xy, 6)
    adj_pad = jnp.asarray(
        gat_flash.pad_adjacency(dense_adjacency(nbr, msk), multiple=512)
    )
    assert adj_pad.shape[0] == 1024
    h = jnp.asarray(rng.normal(size=(n, F_in)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(F_in, H * F)) * 0.2, jnp.float32)
    a_s = jnp.asarray(rng.normal(size=(H, F)) * 0.2, jnp.float32)
    a_d = jnp.asarray(rng.normal(size=(H, F)) * 0.2, jnp.float32)

    gat_flash.INTERPRET = True
    try:
        for concat in (True, False):
            bias = jnp.asarray(
                rng.normal(size=(H * F,) if concat else (F,)), jnp.float32
            )

            def loss_x(h, W, a_s, a_d):
                out = gat_attention_dense(
                    h, adj_pad, W, a_s, a_d, bias, concat=concat
                )
                return jnp.sum(out**2), out

            def loss_f(h, W, a_s, a_d):
                out = gat_flash.gat_attention_dense_flash3(
                    h, adj_pad, W, a_s, a_d, bias, concat=concat
                )
                return jnp.sum(out**2), out

            # at 'highest' the kernel streams full f32 — exact match
            with jax.default_matmul_precision("highest"):
                (_, o_ref), g_ref = jax.value_and_grad(
                    loss_x, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
                (_, o_fl), g_fl = jax.value_and_grad(
                    loss_f, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
            np.testing.assert_allclose(
                np.asarray(o_fl), np.asarray(o_ref), rtol=2e-4, atol=2e-4
            )
            for a, b in zip(g_fl, g_ref):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
                )
            # at 'default' the wx/cotangent streams are bf16 (the production
            # mode) — same result within bf16 rounding
            with jax.default_matmul_precision("default"):
                (_, o_bf), g_bf = jax.value_and_grad(
                    loss_f, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
            # scale-relative: bf16 rounding errors are a fraction of the
            # tensor's magnitude, not of each (possibly tiny) element
            err = np.abs(np.asarray(o_bf) - np.asarray(o_ref)).max()
            assert err <= 5e-3 * np.abs(np.asarray(o_ref)).max() + 1e-3
            for a, b in zip(g_bf, g_ref):
                a, b = np.asarray(a), np.asarray(b)
                assert np.abs(a - b).max() <= 5e-3 * np.abs(b).max() + 1e-3
    finally:
        gat_flash.INTERPRET = False


def test_flash3b_banded_gat_matches_xla_banded(rng):
    """Banded fused kernel (flash3b, interpret mode) vs the XLA banded path
    (ops/gat.py:gat_attention_banded): outputs and all gradients, over real
    RCM-banded receptive-closure tables (window-edge clamping, multi-strip
    band, closure padding rows), at both stream precisions."""
    from spadot_tpu.ops import gat_flash
    from spadot_tpu.ops.gat import gat_attention_banded
    from spadot_tpu.data.graph import (
        banded_closure_adjacency, build_knn_graph, receptive_tables,
        rcm_reorder_tables,
    )
    from spadot_tpu.data.pipeline import make_batches

    TI = 128
    n, F_in, H, F = 500, 10, 4, 128
    xy = rng.uniform(0, 10, size=(n, 2))
    nbr, msk = build_knn_graph(xy, 6)
    bidx, bmask = make_batches(n, 128)
    ext = receptive_tables(nbr, msk, bidx, bmask, hops=3, pad_to=TI)
    ext, band = rcm_reorder_tables(ext)
    bpad = max(TI, -(-band // TI) * TI)
    banded = banded_closure_adjacency(
        ext["loc_nbr"], ext["loc_mask"], TI, bpad
    )
    adjb = jnp.asarray(banded[0])
    assert gat_flash.banded_flash_eligible(adjb.shape)
    assert adjb.shape[2] // TI >= 3  # multi-strip band exercises the k grid
    P = adjb.shape[0] * TI
    h = jnp.asarray(rng.normal(size=(P, F_in)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(F_in, H * F)) * 0.2, jnp.float32)
    a_s = jnp.asarray(rng.normal(size=(H, F)) * 0.2, jnp.float32)
    a_d = jnp.asarray(rng.normal(size=(H, F)) * 0.2, jnp.float32)

    gat_flash.INTERPRET = True
    try:
        for concat in (True, False):
            bias = jnp.asarray(
                rng.normal(size=(H * F,) if concat else (F,)), jnp.float32
            )

            def loss_x(h, W, a_s, a_d):
                out = gat_attention_banded(
                    h, adjb, W, a_s, a_d, bias, concat=concat
                )
                return jnp.sum(out**2), out

            def loss_f(h, W, a_s, a_d):
                out = gat_flash.gat_attention_banded_flash(
                    h, adjb, W, a_s, a_d, bias, concat=concat
                )
                return jnp.sum(out**2), out

            with jax.default_matmul_precision("highest"):
                (_, o_ref), g_ref = jax.value_and_grad(
                    loss_x, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
                (_, o_fl), g_fl = jax.value_and_grad(
                    loss_f, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
            np.testing.assert_allclose(
                np.asarray(o_fl), np.asarray(o_ref), rtol=2e-4, atol=2e-4
            )
            for a, b in zip(g_fl, g_ref):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
                )
            with jax.default_matmul_precision("default"):
                (_, o_bf), g_bf = jax.value_and_grad(
                    loss_f, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
            err = np.abs(np.asarray(o_bf) - np.asarray(o_ref)).max()
            assert err <= 5e-3 * np.abs(np.asarray(o_ref)).max() + 1e-3
            for a, b in zip(g_bf, g_ref):
                a, b = np.asarray(a), np.asarray(b)
                assert np.abs(a - b).max() <= 5e-3 * np.abs(b).max() + 1e-3
    finally:
        gat_flash.INTERPRET = False


@pytest.mark.slow  # default-off path (gat_ext_kernel_batch auto=off — measured dead end)
def test_flash3b_batched_matches_per_closure(rng):
    """nb-batched banded kernel (flash3bb, interpret mode) vs a python loop
    of the per-closure fused wrapper: outputs bit-identical, gradients to
    f32 reduction-order tolerance (the batched W grad reduces one large
    GEMM where the loop sums per-closure GEMMs)."""
    from spadot_tpu.ops import gat_flash

    TI = 128
    ni, nw = 4, 5
    Wb = nw * TI
    bpad = (Wb - TI) // 2
    P = ni * TI
    nb, F_in, H, F = 3, 10, 2, 128
    assert gat_flash.banded_flash_eligible((ni, TI, Wb))
    adjb = np.zeros((nb, ni, TI, Wb), np.int8)
    adjb[:] = rng.uniform(size=(nb, ni, TI, Wb)) < 0.05
    adjb[:, :, np.arange(TI), bpad + np.arange(TI)] = 1  # self loops
    adjb = jnp.asarray(adjb)
    h = jnp.asarray(rng.normal(size=(nb, P, F_in)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(F_in, H * F)) * 0.2, jnp.float32)
    a_s = jnp.asarray(rng.normal(size=(H, F)) * 0.2, jnp.float32)
    a_d = jnp.asarray(rng.normal(size=(H, F)) * 0.2, jnp.float32)

    gat_flash.INTERPRET = True
    try:
        for concat in (True, False):
            bias = jnp.asarray(
                rng.normal(size=(H * F,) if concat else (F,)), jnp.float32
            )

            def loss_b(h, W, a_s, a_d):
                out = gat_flash.gat_attention_banded_flash_batched(
                    h, adjb, W, a_s, a_d, bias, concat=concat
                )
                return jnp.sum(out**2), out

            def loss_s(h, W, a_s, a_d):
                out = jnp.stack([
                    gat_flash.gat_attention_banded_flash(
                        h[b], adjb[b], W, a_s, a_d, bias, concat=concat
                    )
                    for b in range(adjb.shape[0])
                ])
                return jnp.sum(out**2), out

            with jax.default_matmul_precision("highest"):
                (_, o_b), g_b = jax.value_and_grad(
                    loss_b, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
                (_, o_s), g_s = jax.value_and_grad(
                    loss_s, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
            np.testing.assert_array_equal(np.asarray(o_b), np.asarray(o_s))
            for a, b in zip(g_b, g_s):
                a, b = np.asarray(a), np.asarray(b)
                assert np.abs(a - b).max() <= 5e-6 * max(np.abs(b).max(), 1.0)
    finally:
        gat_flash.INTERPRET = False


def test_multihead_aggregation_and_gradients(rng):
    from spadot_tpu.ops.gat_pallas import aggregate_windowed_mh

    n, K, H, F = 200, 5, 3, 8
    Wx = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)
    alpha = jnp.asarray(rng.uniform(size=(n, K, H)), jnp.float32)
    nbr = jnp.asarray(rng.integers(0, n, size=(n, K)), jnp.int32)
    mask = jnp.asarray(rng.uniform(size=(n, K)) > 0.2, jnp.float32)

    def ref(Wx, alpha):
        out = jnp.zeros_like(Wx)
        for k in range(K):
            w = alpha[:, k, :] * mask[:, k][:, None]
            out = out + w[:, :, None] * Wx[nbr[:, k]]
        return out

    got = aggregate_windowed_mh(Wx, alpha, nbr, mask, 64, 16, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(Wx, alpha)), atol=2e-5)

    gp = jax.grad(lambda W, a: jnp.sum(
        aggregate_windowed_mh(W, a, nbr, mask, 64, 16, True) ** 2), argnums=(0, 1)
    )(Wx, alpha)
    gr = jax.grad(lambda W, a: jnp.sum(ref(W, a) ** 2), argnums=(0, 1))(Wx, alpha)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gp[1]), np.asarray(gr[1] * mask[:, :, None]), atol=2e-4
    )


def test_flash3_ti1024_matches_xla(rng, monkeypatch):
    """The experimental tall-tile flash3 core (SPADOT_FLASH3_TI=1024,
    interpret mode) must match the XLA dense path like the default core —
    same wrapper, taller forward i tiles (fewer wx sweeps)."""
    import jax
    import jax.numpy as jnp

    from spadot_tpu.data.graph import build_knn_graph
    from spadot_tpu.ops import gat_flash
    from spadot_tpu.ops.gat import dense_adjacency, gat_attention_dense

    monkeypatch.setenv("SPADOT_FLASH3_TI", "1024")
    n, F_in, H, F = 700, 10, 4, 128  # n_pad = 1024 = ONE tall i tile
    xy = rng.uniform(0, 10, size=(n, 2))
    nbr, msk = build_knn_graph(xy, 6)
    adj_pad = jnp.asarray(
        gat_flash.pad_adjacency(dense_adjacency(nbr, msk), multiple=1024)
    )
    assert adj_pad.shape[0] == 1024 and gat_flash.flash3_ti() == 1024
    h = jnp.asarray(rng.normal(size=(n, F_in)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(F_in, H * F)) * 0.2, jnp.float32)
    a_s = jnp.asarray(rng.normal(size=(H, F)) * 0.2, jnp.float32)
    a_d = jnp.asarray(rng.normal(size=(H, F)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H * F,)), jnp.float32)

    gat_flash.INTERPRET = True
    try:
        def loss_x(h, W, a_s, a_d):
            out = gat_attention_dense(h, adj_pad, W, a_s, a_d, bias)
            return jnp.sum(out**2), out

        def loss_f(h, W, a_s, a_d):
            out = gat_flash.gat_attention_dense_flash3(
                h, adj_pad, W, a_s, a_d, bias
            )
            return jnp.sum(out**2), out

        with jax.default_matmul_precision("highest"):
            (_, o_ref), g_ref = jax.value_and_grad(
                loss_x, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
            (_, o_fl), g_fl = jax.value_and_grad(
                loss_f, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_s, a_d)
        np.testing.assert_allclose(
            np.asarray(o_fl), np.asarray(o_ref), rtol=2e-4, atol=2e-4
        )
        for a, b in zip(g_fl, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
            )
    finally:
        gat_flash.INTERPRET = False


def test_tri_inverse_series_matches_trsm(rng):
    """The log-series triangular inverse (ops/tri_inverse.py) must
    reproduce triangular_solve(L, I) at training shapes, including
    non-128-multiple m (padding is inert) — pure XLA, runs everywhere."""
    from spadot_tpu.ops.tri_inverse import tri_inverse_batched

    for m in (321, 128, 65):
        A = rng.normal(size=(4, m, 96)).astype(np.float32)
        B = jnp.asarray(
            np.eye(m, dtype=np.float32)[None]
            + A @ A.transpose(0, 2, 1)
        )
        Lref = jnp.linalg.cholesky(B)
        X = tri_inverse_batched(Lref)
        Xref = jax.lax.linalg.triangular_solve(
            Lref, jnp.broadcast_to(jnp.eye(m, dtype=B.dtype), B.shape),
            left_side=True, lower=True)
        np.testing.assert_allclose(
            np.asarray(X), np.asarray(Xref), rtol=2e-4, atol=2e-4)


def test_tri_inverse_series_collapsed_dim_accuracy(rng):
    """Series accuracy at the guard's worst case: a collapsed latent dim
    (prec = e^15) drives ||B|| to ~1e10; the series residual must stay at
    trsm grade (it differs only in summation order)."""
    from spadot_tpu.ops.tri_inverse import tri_inverse_batched

    m = 200
    U = rng.normal(0, 0.3, size=(m, 512)).astype(np.float32)
    prec = (rng.uniform(0.5, 4.0, size=(512,)) * 3.3e6).astype(np.float32)
    B = np.eye(m, dtype=np.float32) + 4.9 * (U * prec) @ U.T
    B = jnp.asarray(np.broadcast_to(B, (2, m, m)))
    L = jnp.linalg.cholesky(B)
    X = tri_inverse_batched(L)
    resid = jnp.max(jnp.abs(
        jnp.matmul(X, L, precision=jax.lax.Precision.HIGHEST)
        - jnp.eye(m, dtype=jnp.float32)))
    assert float(resid) < 1e-5


def test_chol_inv_guarded_ls_rescues(rng):
    """The series-backed guard must rescue an indefinite slot exactly like
    the XLA-backed one (the probe-and-rescue runs on the XLA Cholesky
    BEFORE the inverse sees the factor)."""
    from spadot_tpu.ops.svgp import _chol_guarded, _chol_inv_guarded_ls

    m = 40
    Q, _ = np.linalg.qr(rng.normal(size=(m, m)))
    eigs = np.geomspace(1e6, 1.0, m)
    eigs[-1] = -1e2
    B_bad = ((Q * eigs) @ Q.T).astype(np.float32)
    B_bad = (B_bad + B_bad.T) / 2
    B_ok = (np.eye(m, dtype=np.float32) * 2.0)
    eye = jnp.eye(m, dtype=jnp.float32)
    B_all = jnp.asarray(np.stack([B_ok, B_bad]))
    L, X = _chol_inv_guarded_ls(B_all, eye)
    assert np.isfinite(np.asarray(L)).all()
    assert np.isfinite(np.asarray(X)).all()
    np.testing.assert_array_equal(
        np.asarray(L), np.asarray(_chol_guarded(B_all, eye)))
    np.testing.assert_allclose(
        np.asarray(jnp.matmul(X, L)),
        np.broadcast_to(np.eye(m, dtype=np.float32), (2, m, m)),
        atol=5e-3)


def test_svgp_batch_terms_series_backend_matches_xla(rng):
    """svgp_batch_terms(chol_backend='series') must match the 'xla'
    backend in values AND encoder gradients (the series only swaps the
    guarded factorization forward; the all-GEMM backward is shared)."""
    from spadot_tpu.ops.svgp import svgp_batch_terms, svgp_shared

    m, b, L = 40, 96, 3
    Z = jnp.asarray(rng.uniform(0, 10, (m, 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 10, (b, 2)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(b, L)), jnp.float32)
    logv = jnp.asarray(rng.normal(scale=0.3, size=(b, L)), jnp.float32)
    mask = jnp.ones(b, jnp.float32)
    st = svgp_shared(Z)
    consts = dict(L_inv=st["L_inv"], C=st["C"], M=st["M"],
                  Kt_inv=st["Kt_inv"], F=st["F"],
                  logdet_CCj=st["logdet_CCj"])

    def scalar(mu_, logv_, backend):
        out = svgp_batch_terms(
            x, mu_, jnp.exp(logv_), mask, float(b) * 4.0,
            st["Z"], st["K_mm"], st["L_mm"], chol_backend=backend,
            **consts)
        return (jnp.sum(out["recon"]) + jnp.sum(out["kl"])
                + jnp.sum(out["p_m"] ** 2) + jnp.sum(out["p_v"]))

    vx = float(scalar(mu, logv, "xla"))
    vp = float(scalar(mu, logv, "series"))
    np.testing.assert_allclose(vp, vx, rtol=1e-4)
    gx = jax.grad(scalar, argnums=(0, 1))(mu, logv, "xla")
    gp = jax.grad(scalar, argnums=(0, 1))(mu, logv, "series")
    for a, c in zip(gx, gp):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=2e-3, atol=2e-4)


def test_blocked_cholesky_matches_xla(rng):
    """blocked_cholesky (per-128-block custom calls + series-gemm panels,
    ops/tri_inverse.py) must reproduce the XLA Cholesky at the training
    factor shapes, including non-128-multiple m (321 = CH inducing count,
    414 = mouse) where the identity padding must stay inert."""
    from spadot_tpu.ops.tri_inverse import blocked_cholesky

    for m in (321, 414, 256, 128, 65):
        A = rng.normal(size=(3, m, 80)).astype(np.float32)
        B = jnp.asarray(
            np.eye(m, dtype=np.float32)[None] + A @ A.transpose(0, 2, 1)
        )
        L = blocked_cholesky(B)
        Lref = jnp.linalg.cholesky(B)
        assert np.asarray(
            jnp.triu(L, 1) == 0
        ).all(), "blocked factor must be exactly lower-triangular"
        np.testing.assert_allclose(
            np.asarray(L), np.asarray(Lref), rtol=3e-4, atol=3e-4)


def test_blocked_cholesky_collapsed_dim_accuracy(rng):
    """Factor accuracy at the guard's worst case (||B|| ~ 1e10 from a
    collapsed latent dim): the gemm-panel association must stay at
    XLA-chol grade — checked via the reconstruction residual RELATIVE to
    ||B|| (absolute diffs scale with the 1e5 diagonal)."""
    from spadot_tpu.ops.tri_inverse import blocked_cholesky

    m = 321
    U = rng.normal(0, 0.3, size=(m, 512)).astype(np.float32)
    prec = (rng.uniform(0.5, 4.0, size=(512,)) * 3.3e6).astype(np.float32)
    B = np.eye(m, dtype=np.float32) + 4.9 * (U * prec) @ U.T
    B = jnp.asarray(np.broadcast_to(B, (2, m, m)))
    L = blocked_cholesky(B)
    assert np.isfinite(np.asarray(L)).all()
    resid = jnp.max(jnp.abs(
        jnp.matmul(L, jnp.swapaxes(L, -1, -2),
                   precision=jax.lax.Precision.HIGHEST) - B
    )) / jnp.max(jnp.abs(B))
    assert float(resid) < 1e-5


def test_blocked_cholesky_inv_matches_unfused(rng):
    """blocked_cholesky_inv (the folded L + L⁻¹ pass that reuses the
    panel loop's diagonal-block inverses) must match the two-call
    blocked_cholesky → tri_inverse_batched composition bit-for-bit at
    every block-count regime (K=1, K with remainder, exact multiple)."""
    from spadot_tpu.ops.tri_inverse import (
        blocked_cholesky, blocked_cholesky_inv, tri_inverse_batched)

    for m in (65, 128, 321, 414):
        A = rng.normal(size=(3, m, 80)).astype(np.float32)
        B = jnp.asarray(
            np.eye(m, dtype=np.float32)[None] + A @ A.transpose(0, 2, 1)
        )
        L, X = blocked_cholesky_inv(B)
        Lref = blocked_cholesky(B)
        Xref = tri_inverse_batched(Lref)
        np.testing.assert_array_equal(np.asarray(L), np.asarray(Lref))
        np.testing.assert_allclose(
            np.asarray(X), np.asarray(Xref), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jnp.matmul(X, L, precision=jax.lax.Precision.HIGHEST)),
            np.broadcast_to(np.eye(m, dtype=np.float32), (3, m, m)),
            atol=2e-4)


def test_blocked2_slim_cond_matches_blocked(rng):
    """'blocked2' (guard cond over (Lp, dinv) with the inverse assembled
    OUTSIDE the cond) must match 'blocked' bit-for-bit on the healthy path
    and rescue identically on an indefinite slot."""
    from spadot_tpu.ops.svgp import (
        _chol_inv_guarded_bc, _chol_inv_guarded_bc2)

    for m in (200, 321, 128):
        A = rng.normal(size=(3, m, 80)).astype(np.float32)
        B = jnp.asarray(
            np.eye(m, dtype=np.float32)[None] + A @ A.transpose(0, 2, 1)
        )
        eye = jnp.eye(m, dtype=jnp.float32)
        L1, X1 = _chol_inv_guarded_bc(B, eye)
        L2, X2 = _chol_inv_guarded_bc2(B, eye)
        np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
        np.testing.assert_array_equal(np.asarray(X1), np.asarray(X2))
    # rescue path: one indefinite slot
    m = 200
    Q, _ = np.linalg.qr(rng.normal(size=(m, m)))
    eigs = np.geomspace(1e6, 1.0, m)
    eigs[-1] = -1e2
    B_bad = ((Q * eigs) @ Q.T).astype(np.float32)
    B_bad = (B_bad + B_bad.T) / 2
    B_all = jnp.asarray(
        np.stack([np.eye(m, dtype=np.float32) * 2.0, B_bad])
    )
    eye = jnp.eye(m, dtype=jnp.float32)
    L1, X1 = _chol_inv_guarded_bc(B_all, eye)
    L2, X2 = _chol_inv_guarded_bc2(B_all, eye)
    assert np.isfinite(np.asarray(L2)).all()
    assert np.isfinite(np.asarray(X2)).all()
    np.testing.assert_array_equal(np.asarray(L1), np.asarray(L2))
    np.testing.assert_allclose(
        np.asarray(X1), np.asarray(X2), rtol=1e-5, atol=1e-6)


def test_resolve_chol_backend_rejects_typo():
    """A typo'd svgp_chol_backend (e.g. in a BENCH_CFG A/B arm) must
    raise, not silently fall back to 'xla' and corrupt a flip decision
    (round-3 advisor finding)."""
    import pytest

    from spadot_tpu.ops.svgp import _resolve_chol_backend

    assert _resolve_chol_backend("blocked") == "blocked"
    assert _resolve_chol_backend("auto") in ("series", "xla")
    with pytest.raises(ValueError, match="svgp_chol_backend"):
        _resolve_chol_backend("blockd")


def test_chol_inv_guarded_bc_rescues(rng):
    """The blocked-backed guard must rescue an indefinite slot exactly
    like the XLA/series guards: blocked_cholesky propagates the NaN
    diagonal into later blocks, so the finite-diagonal probe fires and
    the jittered re-factorization returns finite (L, X)."""
    from spadot_tpu.ops.svgp import _chol_inv_guarded_bc

    m = 200
    Q, _ = np.linalg.qr(rng.normal(size=(m, m)))
    eigs = np.geomspace(1e6, 1.0, m)
    eigs[-1] = -1e2
    B_bad = ((Q * eigs) @ Q.T).astype(np.float32)
    B_bad = (B_bad + B_bad.T) / 2
    B_ok = np.eye(m, dtype=np.float32) * 2.0
    eye = jnp.eye(m, dtype=jnp.float32)
    B_all = jnp.asarray(np.stack([B_ok, B_bad]))
    L, X = _chol_inv_guarded_bc(B_all, eye)
    assert np.isfinite(np.asarray(L)).all()
    assert np.isfinite(np.asarray(X)).all()
    np.testing.assert_allclose(
        np.asarray(jnp.matmul(X, L)),
        np.broadcast_to(np.eye(m, dtype=np.float32), (2, m, m)),
        atol=5e-3)


def test_svgp_batch_terms_blocked_backend_matches_xla(rng):
    """svgp_batch_terms(chol_backend='blocked') must match 'xla' in
    values AND encoder gradients (the backend only swaps the guarded
    factorization forward; the all-GEMM backward is shared). m=168 spans
    two 128-blocks so the gemm panel path is exercised."""
    from spadot_tpu.ops.svgp import svgp_batch_terms, svgp_shared

    m, b, L = 168, 96, 3
    Z = jnp.asarray(rng.uniform(0, 10, (m, 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 10, (b, 2)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(b, L)), jnp.float32)
    logv = jnp.asarray(rng.normal(scale=0.3, size=(b, L)), jnp.float32)
    mask = jnp.ones(b, jnp.float32)
    st = svgp_shared(Z)
    consts = dict(L_inv=st["L_inv"], C=st["C"], M=st["M"],
                  Kt_inv=st["Kt_inv"], F=st["F"],
                  logdet_CCj=st["logdet_CCj"])

    def scalar(mu_, logv_, backend):
        out = svgp_batch_terms(
            x, mu_, jnp.exp(logv_), mask, float(b) * 4.0,
            st["Z"], st["K_mm"], st["L_mm"], chol_backend=backend,
            **consts)
        return (jnp.sum(out["recon"]) + jnp.sum(out["kl"])
                + jnp.sum(out["p_m"] ** 2) + jnp.sum(out["p_v"]))

    vx = float(scalar(mu, logv, "xla"))
    vb = float(scalar(mu, logv, "blocked"))
    np.testing.assert_allclose(vb, vx, rtol=1e-4)
    gx = jax.grad(scalar, argnums=(0, 1))(mu, logv, "xla")
    gb = jax.grad(scalar, argnums=(0, 1))(mu, logv, "blocked")
    for a, c in zip(gx, gb):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(a), rtol=2e-3, atol=2e-4)
