"""Device-resident KMeans (kmeans++ init, Lloyd iterations, multi-restart).

Replaces the host sklearn.KMeans calls of the reference
(SpaDOT/utils/_train_utils.py:264-266, _analyze_utils.py:32,72,100) so the
per-epoch centroid refresh stays on the TPU: assignment is one (n, k) matmul
on the MXU, the update is a one-hot matmul segment-mean, and the sklearn
``n_init=10`` restart loop becomes a `vmap` over 10 seeded initializations
running in parallel.
"""
from functools import partial

import jax
import jax.numpy as jnp


def _plus_plus_init(key, X, k, mask):
    """kmeans++ D^2-sampling initialization. X: (n, d), mask: (n,)."""
    n = X.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, X.dtype)
    key, sub = jax.random.split(key)
    logits0 = jnp.where(mask > 0, 0.0, neg_inf)
    first = jax.random.categorical(sub, logits0)
    centers0 = jnp.zeros((k, X.shape[1]), X.dtype).at[0].set(X[first])
    d2_0 = jnp.sum((X - X[first]) ** 2, axis=1)

    def body(i, carry):
        key, centers, d2 = carry
        key, sub = jax.random.split(key)
        w = jnp.where(mask > 0, d2, 0.0)
        # guard: if all distances zero, fall back to uniform over valid rows
        safe = jnp.where(jnp.sum(w) > 0, w, mask)
        idx = jax.random.categorical(sub, jnp.log(safe + 1e-30) + logits0)
        centers = centers.at[i].set(X[idx])
        d2 = jnp.minimum(d2, jnp.sum((X - X[idx]) ** 2, axis=1))
        return key, centers, d2

    key, centers, _ = jax.lax.fori_loop(1, k, body, (key, centers0, d2_0))
    return centers


def _lloyd(X, centers, mask, n_iter):
    """Early-stopping Lloyd; masked rows carry zero weight.

    Runs until the assignment vector is a fixed point (at which point further
    iterations are identity — the result is bit-identical to a fixed
    ``n_iter`` scan) or ``n_iter`` is reached. A `lax.while_loop` with a
    data-dependent predicate is jit-legal and saves ~80% of the iterations at
    typical convergence (~10-20 rounds), which matters because this runs
    every epoch inside the centroid refresh.
    """

    def assign_of(centers):
        d2 = (
            jnp.sum(X * X, axis=1)[:, None]
            - 2.0 * X @ centers.T
            + jnp.sum(centers * centers, axis=1)[None, :]
        )
        # int32 regardless of x64 mode — the while carry dtype must be stable
        return jnp.argmin(d2, axis=1).astype(jnp.int32)

    def cond(carry):
        _, _, changed, it = carry
        return jnp.logical_and(changed, it < n_iter)

    def step(carry):
        centers, prev_assign, _, it = carry
        assign = assign_of(centers)
        onehot = jax.nn.one_hot(assign, centers.shape[0], dtype=X.dtype) * mask[:, None]
        counts = jnp.sum(onehot, axis=0)
        sums = onehot.T @ X
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )
        changed = jnp.any(assign != prev_assign)
        return new_centers, assign, changed, it + 1

    init = (centers, jnp.full((X.shape[0],), -1, jnp.int32), jnp.bool_(True),
            jnp.asarray(0, jnp.int32))
    centers, _, _, _ = jax.lax.while_loop(cond, step, init)
    # inertia of the RETURNED centers (the scan's last inertia lags one
    # update behind, which would bias the multi-restart selection)
    d2 = (
        jnp.sum(X * X, axis=1)[:, None]
        - 2.0 * X @ centers.T
        + jnp.sum(centers * centers, axis=1)[None, :]
    )
    inertia = jnp.sum(jnp.min(d2, axis=1) * mask)
    return centers, inertia


@partial(jax.jit, static_argnames=("n_iter",))
def kmeans_refit(X, centers, mask=None, n_iter=100):
    """Warm-start Lloyd from existing centers (no kmeans++, no restarts).

    The per-epoch centroid refresh re-clusters latents that moved by one
    optimizer epoch — the previous epoch's centers are an excellent init, so
    a single early-stopping Lloyd run converges in a handful of iterations
    where the cold `kmeans_fit` pays 10 restarts of kmeans++ + Lloyd from
    scratch every epoch (measured 387 ms/epoch of the 1.66 s atlas epoch,
    docs/tpu_logs/profile_atlas_lines.log). Warm-starting also keeps cluster
    INDICES stable across refreshes, which the OT loss implicitly relies on
    between its 10-epoch plan refreshes (the stored plan's rows/cols are
    matched to centroids by index — the reference's fresh sklearn fit per
    epoch can silently permute them mid-window, _train_utils.py:298-307).

    Returns (centers (k, d), labels (n,), inertia scalar) like `kmeans_fit`.
    """
    with jax.default_matmul_precision("highest"):
        return _warm_refit_impl(X, centers, mask, n_iter)


def _warm_refit_impl(X, centers, mask, n_iter):
    if mask is None:
        mask = jnp.ones(X.shape[0], X.dtype)
    mask = mask.astype(X.dtype)
    centers, inertia = _lloyd(X, centers.astype(X.dtype), mask, n_iter)
    d2 = (
        jnp.sum(X * X, axis=1)[:, None]
        - 2.0 * X @ centers.T
        + jnp.sum(centers * centers, axis=1)[None, :]
    )
    labels = jnp.argmin(d2, axis=1)
    return centers, labels, inertia


def _lloyd_active(X, centers, mask, n_iter, active):
    """`_lloyd` restricted to the clusters flagged in ``active`` (k_max,).

    Inactive columns are excluded from the assignment argmin (distance +inf)
    so they never receive points and their (garbage) center rows are inert.
    Identical to `_lloyd` when every cluster is active.
    """
    big = jnp.asarray(jnp.finfo(X.dtype).max, X.dtype)
    col_pen = jnp.where(active > 0, 0.0, big).astype(X.dtype)

    def assign_of(centers):
        d2 = (
            jnp.sum(X * X, axis=1)[:, None]
            - 2.0 * X @ centers.T
            + jnp.sum(centers * centers, axis=1)[None, :]
        )
        return jnp.argmin(d2 + col_pen[None, :], axis=1).astype(jnp.int32)

    def cond(carry):
        _, _, changed, it = carry
        return jnp.logical_and(changed, it < n_iter)

    def step(carry):
        centers, prev_assign, _, it = carry
        assign = assign_of(centers)
        onehot = jax.nn.one_hot(assign, centers.shape[0], dtype=X.dtype) * mask[:, None]
        counts = jnp.sum(onehot, axis=0)
        sums = onehot.T @ X
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )
        changed = jnp.any(assign != prev_assign)
        return new_centers, assign, changed, it + 1

    init = (centers, jnp.full((X.shape[0],), -1, jnp.int32), jnp.bool_(True),
            jnp.asarray(0, jnp.int32))
    centers, _, _, _ = jax.lax.while_loop(cond, step, init)
    d2 = (
        jnp.sum(X * X, axis=1)[:, None]
        - 2.0 * X @ centers.T
        + jnp.sum(centers * centers, axis=1)[None, :]
    )
    inertia = jnp.sum(jnp.min(d2 + col_pen[None, :], axis=1) * mask)
    return centers, inertia


@partial(jax.jit, static_argnames=("k_max", "n_init", "n_iter"))
def kmeans_fit_padded(key, X, k, k_max, mask=None, n_init=10, n_iter=300):
    """`kmeans_fit` with a TRACED cluster count ``k`` padded to static
    ``k_max`` — one compiled executable serves every k in [1, k_max].

    The analyze-stage elbow sweep fits k = 4..20 per timepoint
    (_analyze_utils.py:72); with per-k compilation the device backend spent
    ~110 s at atlas scale almost entirely in 17 remote compiles
    (docs/tpu_logs/analyze_atlas_device.log). Padding the center count makes
    the sweep ONE compile + 17 sub-second executions.

    kmeans++ draws the full k_max chain and activates the first k centers:
    each new center's D²-sampling conditions only on the centers BEFORE it,
    so the first k draws are distributed exactly as a k-cluster kmeans++ run.
    Inactive columns get +inf distance (never assigned, excluded from
    inertia). Returns (centers (k_max, d) — rows ≥ k are garbage, labels (n,)
    all < k, inertia scalar).
    """
    with jax.default_matmul_precision("highest"):
        if mask is None:
            mask = jnp.ones(X.shape[0], X.dtype)
        mask = mask.astype(X.dtype)
        active = (jnp.arange(k_max) < k).astype(X.dtype)
        keys = jax.random.split(key, n_init)

        def one(key):
            centers0 = _plus_plus_init(key, X, k_max, mask)
            return _lloyd_active(X, centers0, mask, n_iter, active)

        all_centers, all_inertia = jax.vmap(one)(keys)
        best = jnp.argmin(all_inertia)
        centers = all_centers[best]
        big = jnp.asarray(jnp.finfo(X.dtype).max, X.dtype)
        d2 = (
            jnp.sum(X * X, axis=1)[:, None]
            - 2.0 * X @ centers.T
            + jnp.sum(centers * centers, axis=1)[None, :]
        )
        d2 = d2 + jnp.where(active > 0, 0.0, big).astype(X.dtype)[None, :]
        labels = jnp.argmin(d2, axis=1)
        return centers, labels, all_inertia[best]


@partial(jax.jit, static_argnames=("k", "n_init", "n_iter"))
def kmeans_fit(key, X, k, mask=None, n_init=10, n_iter=50):
    """Run KMeans with `n_init` parallel restarts; return best by inertia.

    Returns (centers (k, d), labels (n,), inertia scalar). Distance matmuls
    run at full f32 precision (bf16 differences flip assignments).
    """
    with jax.default_matmul_precision("highest"):
        return _kmeans_fit_impl(key, X, k, mask, n_init, n_iter)


def _kmeans_fit_impl(key, X, k, mask, n_init, n_iter):
    if mask is None:
        mask = jnp.ones(X.shape[0], X.dtype)
    mask = mask.astype(X.dtype)
    keys = jax.random.split(key, n_init)

    def one(key):
        centers0 = _plus_plus_init(key, X, k, mask)
        return _lloyd(X, centers0, mask, n_iter)

    all_centers, all_inertia = jax.vmap(one)(keys)
    best = jnp.argmin(all_inertia)
    centers = all_centers[best]
    d2 = (
        jnp.sum(X * X, axis=1)[:, None]
        - 2.0 * X @ centers.T
        + jnp.sum(centers * centers, axis=1)[None, :]
    )
    labels = jnp.argmin(d2, axis=1)
    return centers, labels, all_inertia[best]
