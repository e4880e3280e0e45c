"""GAT attention vs a naive per-node loop; device KMeans sanity."""
import numpy as np
import jax.numpy as jnp

from spadot_tpu.ops.gat import gat_attention
from spadot_tpu.ops.kmeans import kmeans_fit


def _naive_gat(h, nbr, nbr_mask, W, a_src, a_dst, bias, concat, slope=0.2):
    n, _ = h.shape
    H, F = a_src.shape
    Wx = (h @ W).reshape(n, H, F)
    es = np.einsum("nhf,hf->nh", Wx, a_src)
    ed = np.einsum("nhf,hf->nh", Wx, a_dst)
    out = np.zeros((n, H, F))
    for i in range(n):
        idx = [j for k, j in enumerate(nbr[i]) if nbr_mask[i, k] > 0]
        for hh in range(H):
            logits = np.array([ed[i, hh] + es[j, hh] for j in idx])
            logits = np.where(logits >= 0, logits, slope * logits)
            w = np.exp(logits - logits.max())
            w = w / w.sum()
            out[i, hh] = sum(wk * Wx[j, hh] for wk, j in zip(w, idx))
    if concat:
        return out.reshape(n, H * F) + bias
    return out.mean(axis=1) + bias


def test_gat_matches_naive(rng):
    n, F_in, H, F, K = 10, 6, 2, 4, 4
    h = rng.normal(size=(n, F_in))
    nbr = rng.integers(0, n, size=(n, K))
    nbr[:, 0] = np.arange(n)
    nbr_mask = (rng.uniform(size=(n, K)) > 0.2).astype(np.float64)
    nbr_mask[:, 0] = 1.0
    W = rng.normal(size=(F_in, H * F))
    a_src = rng.normal(size=(H, F))
    a_dst = rng.normal(size=(H, F))
    for concat in (True, False):
        bias = rng.normal(size=(H * F,) if concat else (F,))
        got = np.asarray(
            gat_attention(
                jnp.asarray(h), jnp.asarray(nbr), jnp.asarray(nbr_mask),
                jnp.asarray(W), jnp.asarray(a_src), jnp.asarray(a_dst),
                jnp.asarray(bias), concat=concat,
            )
        )
        want = _naive_gat(h, nbr, nbr_mask, W, a_src, a_dst, bias, concat)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gat_rev_backward_matches_autodiff(rng):
    """gat_attention with reverse lists (scatter-free custom VJP) must match
    plain autodiff in BOTH output and parameter/input gradients."""
    import jax

    from spadot_tpu.data.graph import reverse_graph

    n, F_in, H, F, K = 40, 6, 2, 4, 5
    h = jnp.asarray(rng.normal(size=(n, F_in)), jnp.float32)
    nbr = rng.integers(0, n, size=(n, K))
    nbr[:, 0] = np.arange(n)
    nbr_mask = (rng.uniform(size=(n, K)) > 0.2).astype(np.float32)
    nbr_mask[:, 0] = 1.0
    rev = tuple(map(jnp.asarray, reverse_graph(nbr, nbr_mask)))
    nbr_j, mask_j = jnp.asarray(nbr), jnp.asarray(nbr_mask)
    W = jnp.asarray(rng.normal(size=(F_in, H * F)), jnp.float32)
    a_src = jnp.asarray(rng.normal(size=(H, F)), jnp.float32)
    a_dst = jnp.asarray(rng.normal(size=(H, F)), jnp.float32)
    for concat in (True, False):
        bias = jnp.asarray(
            rng.normal(size=(H * F,) if concat else (F,)), jnp.float32
        )

        def loss(h, W, a_src, a_dst, rev=None):
            out = gat_attention(
                h, nbr_j, mask_j, W, a_src, a_dst, bias, concat=concat, rev=rev
            )
            return jnp.sum(out**2), out

        (l_ref, o_ref), g_ref = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_src, a_dst)
        (l_rev, o_rev), g_rev = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_src, a_dst, rev)
        np.testing.assert_allclose(np.asarray(o_rev), np.asarray(o_ref), atol=1e-5)
        for a, b in zip(g_rev, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )


def test_gat_dense_matches_gather(rng):
    """Dense-adjacency path (H batched n x n matmuls) must match the
    gather path in output AND gradients on a real (duplicate-free) kNN
    graph — the two enumerate exactly the same adjacency entries."""
    import jax

    from spadot_tpu.data.graph import build_knn_graph
    from spadot_tpu.ops.gat import dense_adjacency, gat_attention_dense

    n, F_in, H, F = 37, 6, 2, 4
    xy = rng.uniform(0, 10, size=(n, 2))
    nbr, nbr_mask = build_knn_graph(xy, 5)
    adj = jnp.asarray(dense_adjacency(nbr, nbr_mask))
    nbr_j, mask_j = jnp.asarray(nbr), jnp.asarray(jnp.float32(nbr_mask))
    h = jnp.asarray(rng.normal(size=(n, F_in)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(F_in, H * F)), jnp.float32)
    a_src = jnp.asarray(rng.normal(size=(H, F)), jnp.float32)
    a_dst = jnp.asarray(rng.normal(size=(H, F)), jnp.float32)
    for concat in (True, False):
        bias = jnp.asarray(
            rng.normal(size=(H * F,) if concat else (F,)), jnp.float32
        )

        def loss_gather(h, W, a_src, a_dst):
            out = gat_attention(
                h, nbr_j, mask_j, W, a_src, a_dst, bias, concat=concat
            )
            return jnp.sum(out**2), out

        def loss_dense(h, W, a_src, a_dst):
            out = gat_attention_dense(
                h, adj, W, a_src, a_dst, bias, concat=concat
            )
            return jnp.sum(out**2), out

        (_, o_ref), g_ref = jax.value_and_grad(
            loss_gather, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_src, a_dst)
        (_, o_d), g_d = jax.value_and_grad(
            loss_dense, argnums=(0, 1, 2, 3), has_aux=True)(h, W, a_src, a_dst)
        np.testing.assert_allclose(np.asarray(o_d), np.asarray(o_ref),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(g_d, g_ref):
            # f32 summation-order noise: dense softmax reduces over the full
            # masked row, the gather path over K slots
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )


def test_kmeans_recovers_blobs(rng):
    import jax

    centers_true = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    X = np.vstack([c + rng.normal(0, 0.3, size=(50, 2)) for c in centers_true])
    centers, labels, inertia = kmeans_fit(
        jax.random.PRNGKey(0), jnp.asarray(X, jnp.float32), 3
    )
    centers = np.asarray(centers)
    labels = np.asarray(labels)
    # every true blob maps to exactly one learned cluster
    for i in range(3):
        blob_labels = labels[i * 50 : (i + 1) * 50]
        assert len(set(blob_labels.tolist())) == 1
    # learned centers near true centers (in some order)
    d = np.linalg.norm(centers[:, None] - centers_true[None], axis=-1)
    assert (d.min(axis=0) < 0.2).all()


def test_kmeans_refit_warm_start(rng):
    """kmeans_refit (warm-start Lloyd) converges from perturbed centers to
    the blob solution WITHOUT permuting centroid indices — the property the
    per-epoch refresh relies on between OT plan refreshes."""
    import jax
    from spadot_tpu.ops.kmeans import kmeans_refit

    centers_true = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    X = np.vstack([c + rng.normal(0, 0.3, size=(50, 2)) for c in centers_true])
    Xj = jnp.asarray(X, jnp.float32)
    prev = jnp.asarray(centers_true + rng.normal(0, 0.5, size=(3, 2)), jnp.float32)
    centers, labels, inertia = kmeans_refit(Xj, prev)
    centers = np.asarray(centers)
    labels = np.asarray(labels)
    # index-stable: learned center i stays near the input center i
    assert (np.linalg.norm(centers - centers_true, axis=1) < 0.2).all()
    # labels follow the input index order exactly
    assert (labels == np.repeat([0, 1, 2], 50)).all()
    # matches the cold fit's quality
    _, _, cold_inertia = kmeans_fit(jax.random.PRNGKey(0), Xj, 3)
    assert float(inertia) <= float(cold_inertia) * 1.01


def test_kmeans_refit_masked_rows_ignored(rng):
    from spadot_tpu.ops.kmeans import kmeans_refit

    X = np.vstack(
        [np.zeros((20, 2)), np.ones((20, 2)) * 5, np.ones((4, 2)) * 1000]
    ).astype(np.float32)
    mask = jnp.asarray([1.0] * 40 + [0.0] * 4)
    prev = jnp.asarray([[0.5, 0.5], [4.0, 4.0]], jnp.float32)
    centers, _, _ = kmeans_refit(jnp.asarray(X), prev, mask=mask)
    assert np.abs(np.asarray(centers)).max() < 10


def test_kmeans_masked_rows_ignored(rng):
    import jax

    X = np.vstack(
        [np.zeros((20, 2)), np.ones((20, 2)) * 5, np.ones((4, 2)) * 1000]
    ).astype(np.float32)
    mask = jnp.asarray([1.0] * 40 + [0.0] * 4)
    centers, labels, _ = kmeans_fit(jax.random.PRNGKey(1), jnp.asarray(X), 2, mask=mask)
    assert np.abs(np.asarray(centers)).max() < 10  # outliers never selected


def test_hilbert_locality_order():
    """The vectorized Hilbert code is a bijection on a full grid and adjacent
    codes are grid-adjacent cells (unit Manhattan steps along the curve)."""
    from spadot_tpu.data.graph import _hilbert_code, locality_order

    b = 4
    xs, ys = np.meshgrid(np.arange(2**b), np.arange(2**b))
    codes = _hilbert_code(
        xs.ravel().astype(np.uint64), ys.ravel().astype(np.uint64), b
    )
    assert sorted(codes) == list(range(4**b))
    order = np.argsort(codes)
    px, py = xs.ravel()[order], ys.ravel()[order]
    steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert steps.max() == 1
    # both methods return permutations
    pts = np.random.default_rng(0).uniform(0, 1, size=(500, 2))
    for method in ("morton", "hilbert"):
        perm = locality_order(pts, method=method)
        assert sorted(perm) == list(range(500))


def test_knn_graph_duplicate_coordinates():
    """Duplicate spatial coordinates must not drop true neighbors or double
    the self-loop (sklearn breaks distance-0 ties arbitrarily)."""
    from spadot_tpu.data.graph import build_knn_graph

    coords = np.array([[0.0, 0.0], [0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    nbr, mask = build_knn_graph(coords, k=2)
    for i in range(4):
        assert nbr[i, 0] == i  # self in slot 0
        assert i not in nbr[i, 1:]  # and nowhere else
    # the duplicate pair must list each other as nearest neighbor
    assert 1 in nbr[0, 1:] and 0 in nbr[1, 1:]


def test_gat_stranded_rows_finite_gradients(rng):
    """Windowed-mode softmax safety (the 51k stress run's failure regime):
    when a boundary node's every NON-SELF neighbor falls outside the window
    (models/model.py zeroes those mask slots), its attention row must reduce
    to the self-loop — finite output AND finite gradients — on both the
    padded-list path and the dense-adjacency path. Slot 0 = self-loop
    (data/graph.py:281) is the structural invariant that makes an all-masked
    row impossible; this pins it against regressions in the mask plumbing.
    """
    import jax
    from spadot_tpu.ops.gat import gat_attention_dense

    n, F_in, H, F, K = 12, 5, 2, 4, 4
    h = jnp.asarray(rng.normal(size=(n, F_in)), jnp.float32)
    # duplicate-free rows (real lists are: self in slot 0, distinct others)
    nbr = np.stack([
        np.concatenate(([i], rng.permutation(np.delete(np.arange(n), i))[: K - 1]))
        for i in range(n)
    ])
    nbr_mask = np.ones((n, K), np.float32)
    # strand half the nodes: only the self slot survives the window clip
    nbr_mask[::2, 1:] = 0.0
    W = jnp.asarray(rng.normal(size=(F_in, H * F)), jnp.float32)
    a_src = jnp.asarray(rng.normal(size=(H, F)), jnp.float32)
    a_dst = jnp.asarray(rng.normal(size=(H, F)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(H * F,)), jnp.float32)

    adj = np.zeros((n, n), np.int8)
    adj[np.repeat(np.arange(n), K), nbr.ravel()] = (nbr_mask.ravel() > 0)

    def loss_list(hh):
        return gat_attention(
            hh, jnp.asarray(nbr), jnp.asarray(nbr_mask), W, a_src, a_dst,
            bias,
        ).sum()

    def loss_dense(hh):
        return gat_attention_dense(
            hh, jnp.asarray(adj), W, a_src, a_dst, bias
        ).sum()

    for fn in (loss_list, loss_dense):
        val, grad = jax.value_and_grad(fn)(h)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()
    # the two edge encodings agree on the stranded graph
    np.testing.assert_allclose(
        np.asarray(gat_attention(h, jnp.asarray(nbr), jnp.asarray(nbr_mask),
                                 W, a_src, a_dst, bias)),
        np.asarray(gat_attention_dense(h, jnp.asarray(adj), W, a_src, a_dst,
                                       bias)),
        rtol=2e-4, atol=2e-5,
    )
