"""Sparse Variational Gaussian Process: posterior + ELBO terms.

Math per SpaDOT/model/svgp.py:47-104 (Hensman-style inducing-point SVGP with
the minibatch N/b correction), re-designed for TPU:

- ``torch.linalg.inv`` (svgp.py:50,65,75) is replaced everywhere with jittered
  Cholesky factorizations + triangular solves (`cho_solve`) — better
  numerics and maps to XLA's batched TriangularSolve.
- The per-latent-dim Python loop (SpaDOT/model/SpaDOT.py:57-66) becomes a
  single `vmap` over the latent axis: one batched (L, m, m) Cholesky instead
  of L sequential (m, m) inversions.
- The O(b·m·m) lambda_mat tensor of the reference L3 trace term
  (svgp.py:99-101) is never materialized: tr(A K⁻¹ k kᵀ K⁻¹) = wᵀ A w with
  w = K⁻¹ k, computed row-wise with two (b, m) matmuls.
- Padded batches are supported through a row `mask`: masked rows get zero
  precision, so all shapes stay static under jit.

All public functions are pure; parameters arrive as arrays.
"""
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_solve, cholesky, solve_triangular

from spadot_tpu.ops.kernels import kernel_diag, kernel_matrix

# diagnostic A/B toggle: SPADOT_SVGP_XLAYOUT=1 reads the per-dim factors
# in their produced layout (t @ A forms) instead of the transposed ones —
# the round-5 bounded attempt at the CH (L, m, m) layout copies. MEASURED
# DEAD END at CH (2026-08-20 one-window factorial, bt_shared on in both):
# produced-layout 0.1124 vs transposed 0.1070 s/ep
# (bench_ch_r5head.log vs bench_ch_xlayout_off.log) — the t @ A rewrite
# changed which operand XLA re-lays-out and LOST ~5%; the ~10 ms/ep of
# copies named in profile_ch_final.log are cheaper than the alternative.
# Default stays the transposed pre-r5 forms; see per_dim comments.
_X_PRODUCED_LAYOUT = os.environ.get("SPADOT_SVGP_XLAYOUT", "0") == "1"

LOG_2PI = 1.8378770664093453


def _jittered_chol(mat, jitter):
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    return cholesky(mat + jitter * eye, lower=True)


@jax.custom_vjp
def _chol_guarded(B_all, eye_m):
    """Batched lower Cholesky of B ⪰ I matrices with a detected-failure
    rescue for rounding-induced indefiniteness.

    The whitened forms B = I + ratio·UΛUᵀ are PSD with eigenvalues ≥ 1 in
    exact arithmetic, but the Gram-forming error is RELATIVE to ‖B‖: when a
    latent dim's encoder variance collapses to the exp-clip floor
    (layers.py: clip(logvar, -15, 15) → prec = e¹⁵ ≈ 3.3e6), ‖B‖ reaches
    ~N·prec·O(U²) ≈ 1e9-1e10 and the ~√b·ε·‖B‖ float32 rounding error
    swamps the ⪰ I floor — chol(B) goes indefinite → NaN. No matmul
    precision can save this (it reproduces on CPU at exact f32); the
    reference only tolerates collapsed dims because it trains float64
    (SpaDOT/train.py:27, f64 ε leaves 1e-6 headroom at the same ‖B‖).

    Rescue: factor B plainly, and only when a dim's Cholesky actually
    produced NaN, re-factor with λ = 5%-of-max-diag jitter on exactly the
    failed dims (behind a real `lax.cond` — the healthy path is ONE
    Cholesky, bit-identical to an unguarded one). 0.05·‖B‖ dominates the
    worst-case forming error (b·ε·‖B‖ ≤ 0.012·‖B‖ even at b = 102 400),
    so the jittered factorization cannot fail. The jitter distorts only
    the collapsed dim's near-null directions, which carry no signal by
    construction.

    Gradient safety demands custom_vjp, not plain autodiff: two earlier
    revisions both cost a training failure or 20% of the epoch —
    (a) returning the in-graph plain chol from the healthy branch of a
    lax.cond routed a zero cotangent into the NaN-primal factorization's
    pullback whenever the rescue was taken (0·NaN = NaN → finite loss,
    NaN parameter grads; CPU-verified repro in tests/test_svgp.py), and
    (b) probing on `stop_gradient(B)` then always re-factoring B + λI
    doubled the per-step Cholesky count, measured +20% epoch time at
    ChickenHeart AND Mouse scale (bench_ch_gradfix.log 0.1679 vs 0.1374,
    bench_mouse_gradfix.log 0.2626 vs 0.2308). The custom backward
    applies the standard Cholesky pullback (Murray 2016, the same rule
    jax transposes) AT THE RETURNED FACTOR, which is finite by
    construction on both paths — so gradients are finite whenever the
    output is, with zero extra factorizations. λ is treated as a
    constant in the backward (the 5% jitter is a numerical rescue, not a
    modeling choice — matching the stop_gradient(λ) semantics of (b)).

    Root-caused 2026-08-19 on the MouseOrganogenesis-scale bench: one dim
    hit the var floor within epoch 0 → NaN posterior column → NaN KMeans
    centroids at the first OT refresh (docs/tpu_logs/bench_mouse_bpin.log;
    CPU repro /tmp probes; also the b512@102k NaN arms atlasq_b512_*.log).
    """
    L, _ = _chol_guarded_fwd(B_all, eye_m)
    return L


def _guarded_factor(B_all, eye_m, chol_fn=None):
    """The guarded forward factorization shared by every *_guarded op:
    ONE plain batched Cholesky, plus a cond-gated jittered re-factorization
    of exactly the slots whose plain factor went NaN (free when healthy).
    `chol_fn` swaps the factorization backend (default: the XLA custom
    call; the 'blocked' backend passes ops/tri_inverse.py:blocked_cholesky,
    whose NaN propagation preserves the finite-diagonal probe semantics)."""
    if chol_fn is None:
        chol_fn = lambda b: cholesky(b, lower=True)  # noqa: E731
    L0 = chol_fn(B_all)
    ok = jnp.all(
        jnp.isfinite(jnp.diagonal(L0, axis1=-2, axis2=-1)), axis=-1
    )  # (L,)

    def rescue(_):
        lam = jnp.where(
            ok,
            jnp.zeros((), B_all.dtype),
            0.05 * jnp.max(jnp.diagonal(B_all, axis1=-2, axis2=-1), axis=-1),
        )
        return chol_fn(B_all + lam[:, None, None] * eye_m[None])

    return jax.lax.cond(jnp.all(ok), lambda _: L0, rescue, operand=None)


def _guarded_factor_tree(B_all, eye_m, chol_fn):
    """`_guarded_factor` for a chol_fn that returns a PYTREE whose first
    leaf is the factor L (e.g. tri_inverse.blocked_cholesky_inv's (L, X)):
    the finite-diagonal probe reads L, the rescue re-runs the whole
    chol_fn on the jittered slots, and the cond selects the full tree.
    Semantics match probing L then computing the aux outputs from the
    returned factor — a non-finite diagonal block propagates NaN into
    every aux leaf, and the healthy path is bit-identical + free."""
    out0 = chol_fn(B_all)
    L0 = jax.tree_util.tree_leaves(out0)[0]
    ok = jnp.all(
        jnp.isfinite(jnp.diagonal(L0, axis1=-2, axis2=-1)), axis=-1
    )

    def rescue(_):
        lam = jnp.where(
            ok,
            jnp.zeros((), B_all.dtype),
            0.05 * jnp.max(jnp.diagonal(B_all, axis1=-2, axis2=-1), axis=-1),
        )
        return chol_fn(B_all + lam[:, None, None] * eye_m[None])

    return jax.lax.cond(jnp.all(ok), lambda _: out0, rescue, operand=None)


def _chol_guarded_fwd(B_all, eye_m):
    L = _guarded_factor(B_all, eye_m)
    return L, (L,)


def _chol_guarded_bwd(res, L_bar):
    """Cholesky reverse rule evaluated at the RETURNED factor L (finite on
    both guard paths): B̄ = L⁻ᵀ φ(Lᵀ L̄) L⁻¹ with φ(X) = tril(X), diagonal
    halved — the transpose of the Murray (2016) forward rule jax itself
    uses, so healthy-path gradients match plain-cholesky autodiff."""
    (L,) = res
    m = L.shape[-1]
    M = jnp.matmul(
        jnp.swapaxes(L, -1, -2), L_bar, precision=jax.lax.Precision.HIGHEST
    )
    P = jnp.tril(M) / (1.0 + jnp.eye(m, dtype=L.dtype))
    W = jax.lax.linalg.triangular_solve(
        L, P, left_side=True, lower=True, transpose_a=True
    )
    B_bar = jax.lax.linalg.triangular_solve(
        L, W, left_side=False, lower=True, transpose_a=False
    )
    return B_bar, jnp.zeros((m, m), L.dtype)


_chol_guarded.defvjp(_chol_guarded_fwd, _chol_guarded_bwd)


@jax.custom_vjp
def _chol_inv_guarded(B_all, eye_m):
    """Guarded batched Cholesky that ALSO returns the explicit inverse
    factor L⁻¹, with an all-GEMM backward.

    Rationale (ChickenHeart per-op profile, profile_ch_cvjp.log): the
    batched (L, m, m) Cholesky/TriangularSolve custom calls are ~31% of
    device time for ~2 GFLOP/epoch of math — latency-bound library calls.
    Plain autodiff of `chol → trsm(L, I)` emits SIX trsm-class calls per
    step on top of the two Choleskys (one vmapped trsm forward, one trsm in
    its transpose rule, two per Cholesky pullback). Materializing X = L⁻¹
    once in the forward lets the whole backward run as MXU gemms evaluated
    at the saved factors:

      trsm transpose:  L̄ += -tril(Xᵀ X̄ Xᵀ)          (dX = -X dL X)
      chol pullback:   B̄  = Xᵀ φ(Lᵀ L̄_tot) X         (Murray 2016)

    B ⪰ I bounds ‖X‖₂ ≤ 1, so the explicit-inverse products are as well-
    conditioned as the triangular solves they replace. The gemms run at
    'highest' (they replace f32 custom calls — same precedent as the U/V/B
    pins above). Healthy-path outputs are bit-identical to
    `_chol_guarded` + `solve_triangular`; gradients agree to fp tolerance
    (the pullback algebra is identical, only solve-vs-gemm association
    differs). Rescue semantics match `_chol_guarded`: backward at the
    RETURNED factor, λ frozen.
    """
    (L, X), _ = _chol_inv_guarded_fwd(B_all, eye_m)
    return L, X


def _chol_inv_guarded_fwd(B_all, eye_m):
    L = _guarded_factor(B_all, eye_m)
    X = jax.lax.linalg.triangular_solve(
        L, jnp.broadcast_to(eye_m, L.shape), left_side=True, lower=True
    )
    return (L, X), (L, X)


def _chol_inv_guarded_bwd(res, bars):
    L, X = res
    L_bar, X_bar = bars
    m = L.shape[-1]
    hp = jax.lax.Precision.HIGHEST
    Xt = jnp.swapaxes(X, -1, -2)
    L_tot = L_bar - jnp.tril(
        jnp.matmul(Xt, jnp.matmul(X_bar, Xt, precision=hp), precision=hp)
    )
    M = jnp.matmul(jnp.swapaxes(L, -1, -2), L_tot, precision=hp)
    P = jnp.tril(M) / (1.0 + jnp.eye(m, dtype=L.dtype))
    B_bar = jnp.matmul(Xt, jnp.matmul(P, X, precision=hp), precision=hp)
    return B_bar, jnp.zeros((m, m), L.dtype)


_chol_inv_guarded.defvjp(_chol_inv_guarded_fwd, _chol_inv_guarded_bwd)


@jax.custom_vjp
def _chol_logdet_guarded(B_all, eye_m):
    """Guarded batched log-determinant logdet(B) per slot, all-GEMM
    backward: ∂logdet(B)/∂B = B⁻¹ = XᵀX at the saved X = L⁻¹ (one extra
    forward trsm replaces the TWO trsms plain autodiff emits in the
    Cholesky pullback, and the fwd chol→trsm chain is independent of the
    B-side chain, so the calls overlap). Used for the determinant-lemma
    logdet(B̃) whose factor has no other consumer. Guard semantics as
    `_chol_inv_guarded`."""
    ld, _ = _chol_logdet_guarded_fwd(B_all, eye_m)
    return ld


def _chol_logdet_guarded_fwd(B_all, eye_m):
    L = _guarded_factor(B_all, eye_m)
    X = jax.lax.linalg.triangular_solve(
        L, jnp.broadcast_to(eye_m, L.shape), left_side=True, lower=True
    )
    ld = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
    )
    return ld, X


def _chol_logdet_guarded_bwd(X, ld_bar):
    m = X.shape[-1]
    hp = jax.lax.Precision.HIGHEST
    B_inv = jnp.matmul(jnp.swapaxes(X, -1, -2), X, precision=hp)
    return ld_bar[:, None, None] * B_inv, jnp.zeros((m, m), X.dtype)


_chol_logdet_guarded.defvjp(_chol_logdet_guarded_fwd, _chol_logdet_guarded_bwd)


def _guarded_factor_inv_ls(B_all, eye_m):
    """Guarded (L, L⁻¹) with the log-series triangular-inverse backend: the
    Cholesky stays on the XLA custom call (measured 0.023 ms at training
    shapes — already fast) with the usual probe-and-rescue; the inverse
    replaces the 1.33 ms trsm custom call with the nilpotent
    repeated-squaring series — pure MXU matmuls (ops/tri_inverse.py). The
    inverse runs AFTER the rescue cond, on the returned finite factor."""
    from spadot_tpu.ops.tri_inverse import tri_inverse_batched

    L = _guarded_factor(B_all, eye_m)
    X = tri_inverse_batched(L)
    return L, X


@jax.custom_vjp
def _chol_inv_guarded_ls(B_all, eye_m):
    """`_chol_inv_guarded` with the log-series inverse as the forward
    backend (same outputs, same all-GEMM backward). Selected by
    `svgp_batch_terms(chol_backend=)` — the TPU default."""
    (L, X), _ = _chol_inv_guarded_ls_fwd(B_all, eye_m)
    return L, X


def _chol_inv_guarded_ls_fwd(B_all, eye_m):
    L, X = _guarded_factor_inv_ls(B_all, eye_m)
    return (L, X), (L, X)


_chol_inv_guarded_ls.defvjp(_chol_inv_guarded_ls_fwd, _chol_inv_guarded_bwd)


@jax.custom_vjp
def _chol_logdet_guarded_ls(B_all, eye_m):
    """`_chol_logdet_guarded` on the log-series inverse backend."""
    ld, _ = _chol_logdet_guarded_ls_fwd(B_all, eye_m)
    return ld


def _chol_logdet_guarded_ls_fwd(B_all, eye_m):
    L, X = _guarded_factor_inv_ls(B_all, eye_m)
    ld = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
    )
    return ld, X


_chol_logdet_guarded_ls.defvjp(
    _chol_logdet_guarded_ls_fwd, _chol_logdet_guarded_bwd
)


def _guarded_factor_inv_bc(B_all, eye_m):
    """Guarded (L, L⁻¹) with BOTH the factorization and the inverse off
    the XLA custom-call path: `blocked_cholesky` keeps only the K
    per-128-block chol custom calls (panels = series-inverse gemms) and
    the log-series inverse then materializes X. The blocked-expander
    panel trsms + layout copies it replaces measured ~22 ms/ep at CH and
    ~45 ms/ep at mouse scale (profile_ch_series.log,
    profile_mouse_series.log). Guard semantics unchanged: blocked_cholesky
    propagates a non-finite diagonal block into every later block, so the
    finite-diagonal probe and the jittered rescue behave exactly as the
    XLA-chol guard. The factor and inverse come from the FOLDED
    `blocked_cholesky_inv` — the K per-128-block diagonal inverses the
    panel solves compute are reused by the back-substitution assembly
    instead of being recomputed by tri_inverse_batched (the round-3
    advisor's duplicated-work finding); the guard conds over the whole
    (L, X) pair."""
    from spadot_tpu.ops.tri_inverse import blocked_cholesky_inv

    L, X = _guarded_factor_tree(B_all, eye_m, blocked_cholesky_inv)
    return L, X


@jax.custom_vjp
def _chol_inv_guarded_bc(B_all, eye_m):
    """`_chol_inv_guarded` on the blocked-chol + log-series backend (same
    outputs, same all-GEMM backward)."""
    (L, X), _ = _chol_inv_guarded_bc_fwd(B_all, eye_m)
    return L, X


def _chol_inv_guarded_bc_fwd(B_all, eye_m):
    L, X = _guarded_factor_inv_bc(B_all, eye_m)
    return (L, X), (L, X)


_chol_inv_guarded_bc.defvjp(_chol_inv_guarded_bc_fwd, _chol_inv_guarded_bwd)


@jax.custom_vjp
def _chol_logdet_guarded_bc(B_all, eye_m):
    """`_chol_logdet_guarded` on the blocked-chol + log-series backend."""
    ld, _ = _chol_logdet_guarded_bc_fwd(B_all, eye_m)
    return ld


def _chol_logdet_guarded_bc_fwd(B_all, eye_m):
    L, X = _guarded_factor_inv_bc(B_all, eye_m)
    ld = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
    )
    return ld, X


_chol_logdet_guarded_bc.defvjp(
    _chol_logdet_guarded_bc_fwd, _chol_logdet_guarded_bwd
)


def _guarded_factor_inv_bc2(B_all, eye_m):
    """'blocked2': the blocked backend with the guard cond SLIMMED to
    (Lp_padded, dinv blocks) — the X = L⁻¹ assembly runs OUTSIDE the
    rescue cond (tri_inverse.py:blocked_cholesky_dinv /
    assemble_inv_from_dinv), so the assembly gemms can fuse with their
    consumers instead of materializing X through the conditional's layout
    boundary. Semantics identical to 'blocked': same factor, same inverse,
    same probe (padded diagonal is 1.0), same rescue; only the cond's
    operand tree differs. Experimental A/B variant targeting the ~10
    ms/ep of (10,321,321) layout copies at CH (profile_ch_blocked.log)."""
    from spadot_tpu.ops.tri_inverse import (
        assemble_inv_from_dinv, blocked_cholesky_dinv)

    m = B_all.shape[-1]
    Lp, dinv = _guarded_factor_tree(B_all, eye_m, blocked_cholesky_dinv)
    X = assemble_inv_from_dinv(Lp, dinv, m)
    L = Lp[:, :m, :m] if Lp.shape[-1] != m else Lp
    return L, X


@jax.custom_vjp
def _chol_inv_guarded_bc2(B_all, eye_m):
    """`_chol_inv_guarded` on the slim-cond blocked backend."""
    (L, X), _ = _chol_inv_guarded_bc2_fwd(B_all, eye_m)
    return L, X


def _chol_inv_guarded_bc2_fwd(B_all, eye_m):
    L, X = _guarded_factor_inv_bc2(B_all, eye_m)
    return (L, X), (L, X)


_chol_inv_guarded_bc2.defvjp(_chol_inv_guarded_bc2_fwd, _chol_inv_guarded_bwd)


@jax.custom_vjp
def _chol_logdet_guarded_bc2(B_all, eye_m):
    """`_chol_logdet_guarded` on the slim-cond blocked backend."""
    ld, _ = _chol_logdet_guarded_bc2_fwd(B_all, eye_m)
    return ld


def _chol_logdet_guarded_bc2_fwd(B_all, eye_m):
    L, X = _guarded_factor_inv_bc2(B_all, eye_m)
    ld = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
    )
    return ld, X


_chol_logdet_guarded_bc2.defvjp(
    _chol_logdet_guarded_bc2_fwd, _chol_logdet_guarded_bwd
)


_CHOL_OPS = {
    "xla": (_chol_inv_guarded, _chol_logdet_guarded),
    "series": (_chol_inv_guarded_ls, _chol_logdet_guarded_ls),
    "blocked": (_chol_inv_guarded_bc, _chol_logdet_guarded_bc),
    "blocked2": (_chol_inv_guarded_bc2, _chol_logdet_guarded_bc2),
}


def _resolve_chol_backend(chol_backend):
    """'series' | 'xla' | 'blocked' | 'auto'. auto = the blocked gemm-panel
    Cholesky + fused log-series inverse on TPU and the XLA custom calls
    elsewhere (CPU LAPACK chol/trsm are fast). The TPU default progression,
    all measured (docs/tpu_logs): xla -> series (trsm replaced by the
    nilpotent log-series inverse, CH 0.1245 -> 0.1142) -> blocked
    (factorization panels as series-inverse gemms, diagonal-block inverses
    shared with the assembly — one-window A/B 2026-08-20: CH -1.5% /
    mouse -3.5% / atlas -2.9% vs series, 5-seed quality gate green at
    0.9564±0.0033 vs 0.9549±0.0136, quality_blocked_5seed.log)."""
    if chol_backend in _CHOL_OPS:
        return chol_backend
    if chol_backend != "auto":
        # A typo (e.g. in a BENCH_CFG A/B arm) must not silently benchmark
        # the wrong backend and corrupt a flip decision.
        raise ValueError(
            f"svgp_chol_backend={chol_backend!r} — expected one of "
            f"{sorted(_CHOL_OPS)} or 'auto'"
        )
    if jax.default_backend() == "tpu":
        return "blocked"
    return "xla"


def svgp_shared(Z, kernel_type="Gaussian", kernel_scale=0.1, jitter=1e-2):
    """Precompute quantities shared across batches and latent dims for a
    fixed inducing set Z (the reference keeps Z non-trainable: svgp.py:24-25).

    Returns dict with K_mm, its jittered Cholesky L_mm (K̃ = K_mm + jI =
    L Lᵀ), and the K̃-derived CONSTANTS of the whitened batch terms:

      L_inv = L⁻¹,  C = L⁻¹ K_mm,  M = L⁻¹ K_mm L⁻ᵀ,  Kt_inv = K̃⁻¹,
      F = E⁻¹ L⁻¹ and logdet_CCj = logdet(CCᵀ + jI), where E Eᵀ = CCᵀ + jI.

    Materializing L⁻¹/K̃⁻¹ once turns the per-training-step triangular
    solves of `svgp_batch_terms` (U = L⁻¹K_mnᵀ with b right-hand sides, and
    the per-dim cho_solve for K̃⁻¹μ̂) into plain MXU gemms — measured ~35%
    of the ChickenHeart epoch was XLA's TriangularSolve/Cholesky
    custom-call chain (scripts/profile_epoch.py, 2026-08-18). The explicit
    inverse is at least as accurate as the reference, which materializes
    `torch.linalg.inv(K_mm + jitter·I)` directly (svgp.py:65-66); here the
    inverse still goes through the Cholesky and is computed once at
    "highest" precision.

    F/logdet_CCj drive the determinant-lemma form of the KL's jittered
    logdet (see `_svgp_batch_terms_impl`): per latent dim,
      logdet(A_hat + jI) = logdet_CCj + logdet(B̃) − logdet(B),
    which replaces the per-dim G = Lb⁻¹C / A_hat = GᵀG gemms and the
    SECOND, sequentially-dependent Cholesky (of A_hat + jI) with one more
    independent, unconditionally-stable B̃ ⪰ I factorization — exact same
    value (and exact same jitter semantics) by Sylvester's determinant
    identity: det(jI + CᵀB⁻¹C) = det(jB + CCᵀ)/det(B) and
    jB + CCᵀ = E(I + j·ratio·(E⁻¹U)Λ(E⁻¹U)ᵀ)Eᵀ.
    """
    with jax.default_matmul_precision("highest"):
        K_mm = kernel_matrix(Z, Z, kernel_type, kernel_scale)
        L_mm = _jittered_chol(K_mm, jitter)
        eye = jnp.eye(K_mm.shape[0], dtype=K_mm.dtype)
        L_inv = solve_triangular(L_mm, eye, lower=True)
        C = L_inv @ K_mm
        M = C @ L_inv.T
        Kt_inv = L_inv.T @ L_inv
        E = _jittered_chol(C @ C.T, jitter)
        logdet_CCj = 2.0 * jnp.sum(jnp.log(jnp.diagonal(E)))
        F = solve_triangular(E, L_inv, lower=True)
    return {"Z": Z, "K_mm": K_mm, "L_mm": L_mm, "L_inv": L_inv,
            "C": C, "M": M, "Kt_inv": Kt_inv, "F": F,
            "logdet_CCj": logdet_CCj}


def svgp_shared_padded(Z, m_max, kernel_type="Gaussian", kernel_scale=0.1,
                       jitter=1e-2):
    """`svgp_shared` padded to a static `m_max` inducing slots (the fused
    stacked-timepoint epoch needs one shape across timepoints).

    The padded block is chosen so every padded slot is EXACTLY inert given
    that K_nm's padded columns are zeroed by `m_mask`:

      K_mm -> blockdiag(K_mm, I),  L_mm -> blockdiag(L_mm, sqrt(1+jitter)·I)

    (consistent with the jittered Cholesky of I). Padded slots then
    contribute a closed-form constant to each latent dim's KL —
      0.5·pad·( log(1+j) − log(1/(1+j)+j) − 1 + 1/(1+j)² )
    (logdet_Kmm, logdet_A after its own jitter, the −m term, and
    tr(K̃⁻¹Â) respectively) — which `svgp_batch_terms(kl_const=...)`
    subtracts, so the padded ELBO equals the unpadded one exactly.

    Returns (state dict with padded Z/K_mm/L_mm, m_mask (m_max,), kl_const).
    """
    import numpy as np

    state = svgp_shared(Z, kernel_type, kernel_scale, jitter)
    m = int(Z.shape[0])
    pad = int(m_max) - m
    if pad < 0:
        raise ValueError(f"m_max {m_max} < m {m}")
    dt = np.asarray(state["K_mm"]).dtype
    K = np.eye(m_max, dtype=dt)
    K[:m, :m] = np.asarray(state["K_mm"])
    L = np.zeros((m_max, m_max), dtype=dt)
    L[:m, :m] = np.asarray(state["L_mm"])
    if pad:
        L[m:, m:] = np.sqrt(1.0 + jitter) * np.eye(pad, dtype=dt)
    Zp = np.zeros((m_max, Z.shape[1]), dtype=np.asarray(Z).dtype)
    Zp[:m] = np.asarray(Z)
    m_mask = np.zeros((m_max,), dtype=dt)
    m_mask[:m] = 1.0
    a = 1.0 / (1.0 + jitter)
    kl_const = 0.5 * pad * (
        np.log1p(jitter) - np.log(a + jitter) - 1.0 + a * a
    )

    def _blockdiag(real, pad_scale):
        out = np.zeros((m_max, m_max), dtype=dt)
        out[:m, :m] = np.asarray(real)
        if pad:
            out[m:, m:] = pad_scale * np.eye(pad, dtype=dt)
        return jnp.asarray(out)

    # padded blocks of the K̃-derived constants, consistent with the
    # blockdiag L above: L⁻¹ and C get 1/√(1+j)·I, M and K̃⁻¹ get 1/(1+j)·I;
    # E's padded block is √(a+j)·I (from CCᵀ+jI -> (a+j)·I), so
    # F = E⁻¹L⁻¹ gets 1/√((a+j)(1+j))·I and logdet_CCj grows by
    # pad·log(a+j) — exactly the per-slot logdet_A constant kl_const
    # subtracts, keeping the padded ELBO equal to the unpadded one.
    inv_sqrt = 1.0 / np.sqrt(1.0 + jitter)
    state_p = {
        "Z": jnp.asarray(Zp), "K_mm": jnp.asarray(K), "L_mm": jnp.asarray(L),
        "L_inv": _blockdiag(state["L_inv"], inv_sqrt),
        "C": _blockdiag(state["C"], inv_sqrt),
        "M": _blockdiag(state["M"], a),
        "Kt_inv": _blockdiag(state["Kt_inv"], a),
        "F": _blockdiag(state["F"], 1.0 / np.sqrt((a + jitter) * (1.0 + jitter))),
        "logdet_CCj": jnp.asarray(
            np.asarray(state["logdet_CCj"], dt) + pad * np.log(a + jitter)
        ),
    }
    return state_p, jnp.asarray(m_mask), float(kl_const)


@partial(jax.jit, static_argnames=(
    "kernel_type", "matmul_precision", "chol_backend", "bt_shared"))
def svgp_batch_terms(
    x, qnet_mu, qnet_var, mask, N_train, Z, K_mm, L_mm,
    kernel_scale=0.1, jitter=1e-2, kernel_type="Gaussian",
    m_mask=None, kl_const=0.0, matmul_precision="highest",
    L_inv=None, C=None, M=None, Kt_inv=None, F=None, logdet_CCj=None,
    chol_backend="auto", bt_shared="auto",
):
    """Posterior means/vars and ELBO terms for one batch, all latent dims.

    Args:
      x: (b, 2) spatial coords of the batch (padded rows arbitrary).
      qnet_mu, qnet_var: (b, L) encoder outputs per latent dim.
      mask: (b,) 1.0 for real rows, 0.0 for padding.
      N_train: scalar — number of training spots at this timepoint.
      Z/K_mm/L_mm: from `svgp_shared`.

    Returns dict with:
      p_m, p_v: (b, L) posterior mean/variance at x,
      recon: (L,) inside-ELBO reconstruction terms (svgp.py:96-104),
      kl: (L,) inside-ELBO KL terms (svgp.py:86-94).

    m_mask/kl_const: padded-inducing support for the fused stacked-timepoint
    epoch — zero columns of K_nm for padded slots and subtract their exact
    closed-form KL constant (see `svgp_shared_padded`).

    By default every matmul here runs at full float32 precision regardless
    of the global matmul default — 1-pass bf16 MXU products can make sigma_l
    numerically non-PSD and poison the whole model with NaNs (observed with
    the reference's direct chol(Σ); the whitened B ⪰ I form is far more
    tolerant). `matmul_precision` exposes the scoped setting: "high"
    (3-pass bf16, ~2x the f32 MXU rate) is a measured-safe speed lever for
    the (m, b) gemms since B's Cholesky is unconditionally stable; keep
    "highest" for parity/float64 studies.
    """
    with jax.default_matmul_precision(matmul_precision):
        return _svgp_batch_terms_impl(
            x, qnet_mu, qnet_var, mask, N_train, Z, K_mm, L_mm,
            kernel_scale, jitter, kernel_type, m_mask, kl_const,
            L_inv, C, M, Kt_inv, F, logdet_CCj,
            chol_mode=_resolve_chol_backend(str(chol_backend)),
            bt_shared=bt_shared,
        )


def _svgp_batch_terms_impl(
    x, qnet_mu, qnet_var, mask, N_train, Z, K_mm, L_mm,
    kernel_scale, jitter, kernel_type, m_mask=None, kl_const=0.0,
    L_inv=None, C=None, M=None, Kt_inv=None, F=None, logdet_CCj=None,
    chol_mode="xla", bt_shared="auto",
):
    # W-shared B̃ forming trades the direct (m, b)·(b, m) per-dim gemm for
    # two (m, m) gemms at the same 'highest' pin, so it wins on MACs iff
    # b > 2m — measured both ways one-window 2026-08-20/21: atlas
    # (b=4096, m=605) −5% in the shared bundle (bench_atlas_kbatch0.log
    # vs the 1.6049 baseline) but CH (b=512, m=321) +1.4% shared
    # (bench_ch_xlayout_off.log 0.1070 vs bench_ch_r4equiv.log 0.1055).
    # "auto" applies exactly that static-shape rule; booleans pin.
    if bt_shared == "auto":
        bt_shared = x.shape[0] > 2 * Z.shape[0]
    m = Z.shape[0]
    b_eff = jnp.maximum(jnp.sum(mask), 1.0)
    ratio = N_train / b_eff

    K_nm = kernel_matrix(x, Z, kernel_type, kernel_scale)  # (b, m)
    if m_mask is not None:
        K_nm = K_nm * m_mask[None, :]
    K_nn = kernel_diag(x, kernel_type, kernel_scale) * mask  # (b,)
    # whitened quantities (K̃ = K_mm + jitter·I = L Lᵀ). When the caller
    # passes the precomputed K̃ constants (svgp_shared), the wide
    # per-step triangular solves become MXU gemms — ~35% of the
    # ChickenHeart epoch was this TriangularSolve/Cholesky custom-call
    # chain (scripts/profile_epoch.py); the fallback solves keep direct
    # callers (tests, ad-hoc use) working unchanged.
    if L_inv is None:
        U = solve_triangular(L_mm, K_nm.T, lower=True)  # L⁻¹ K_mn (m, b)
        C = solve_triangular(L_mm, K_mm, lower=True)  # L⁻¹ K_mm (m, m)
        M = solve_triangular(L_mm, C.T, lower=True)  # L⁻¹ K_mm L⁻ᵀ (sym.)
        V = None
        E_inv = None
    else:
        # These gemms REPLACE f32 triangular-solve custom calls (which
        # ignored the ambient matmul precision), so they must not inherit
        # the training scope's 'high' 3-pass bf16: at atlas scale
        # (m=600, b=4096, ratio≈25) the extra error in U compounds through
        # B = I + ratio·UΛUᵀ and NaN'd the latents by the first OT refresh
        # (docs/tpu_logs/bench_atlas_svgpgemm.log, 2026-08-19). Scoping
        # them 'highest' restores custom-call-equivalent numerics; both
        # run once per step (not per latent dim), so the cost is noise.
        with jax.default_matmul_precision("highest"):
            U = L_inv @ K_nm.T  # L⁻¹ K_mn (m, b)
            # The determinant-lemma logdet_A (see svgp_shared) needs
            # B̃ = I + j·ratio·(VΛVᵀ) with V = E⁻¹L⁻¹K_mn = E⁻¹U. Since
            # (V·prec)Vᵀ = E⁻¹[(U·prec)Uᵀ]E⁻ᵀ = E⁻¹WE⁻ᵀ, B̃ can SHARE the
            # per-dim W = (U·prec)Uᵀ gemm that already forms B: two (m, m)
            # gemms per dim replace a second highest-pinned (m, b)·(b, m)
            # gemm per dim — at atlas (m=605, b=4096) that drops ~1/3 of
            # the per-dim whitened-gemm family's FLOP·pass product (the
            # round-4 verdict's 'factor sharing' lever, Next #2).
            # E⁻¹ = F·L̃ (F = E⁻¹L⁻¹, L̃ = L_mm): one (m, m) gemm per step,
            # no new state keys — padded-state blocks compose correctly
            # (F_pad·L_pad = 1/sqrt(a+j)·I, the padded E⁻¹).
            E_inv = (F @ L_mm) if (F is not None and bt_shared) else None
            # fallback (bt_shared=False A/B arm): V formed directly
            V = F @ K_nm.T if (F is not None and E_inv is None) else None
    diag_Qnn = jnp.sum(U * U, axis=0)  # diag(K_nm K̃⁻¹ K_mn)

    logdet_Kmm = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_mm)))
    eye_m = jnp.eye(m, dtype=K_mm.dtype)

    # Σ + jI = K̃ + ratio·K_mn Λ K_nm = L (I + ratio·U Λ Uᵀ) Lᵀ = L B Lᵀ.
    # B has eigenvalues >= 1, so its UNJITTERED Cholesky is numerically
    # robust at any data scale — the direct chol(Σ) the reference inverts
    # (svgp.py:74-75) goes indefinite in float32 once ratio·b·prec is
    # large (observed at batch 4096, m 600). B ⪰ I also bounds
    # ‖Lb⁻¹‖₂ ≤ 1, so materializing Lb⁻¹ once is numerically safe and
    # turns every downstream triangular solve into an MXU gemm.
    # The B-forming gemm must run at true-f32 'highest': the ⪰ I floor
    # only protects the Cholesky while the gemm error is ≪ 1, and the
    # error is RELATIVE to ‖B‖ ≈ ratio·max(prec)·b·O(U²). Measured at
    # ratio = N/b = 200 (batch 512 at 102,400 spots): ‖B‖ ~ 1e6 and the
    # ambient 'high' 3-pass bf16 product had min eig -0.098 → chol NaN
    # at epoch 1 (docs/tpu_logs/atlasq_b512.log; /tmp-probe dissection
    # 2026-08-19). One (m,b)·(b,m) gemm per latent dim — noise-level
    # cost next to the S/R/T2 gemms that stay at the ambient precision.
    # The B/Bt factorizations live OUTSIDE the per-dim vmap so their
    # collapsed-dim rescue (`_chol_guarded`) is one real lax.cond over the
    # whole (L, m, m) batch — free on the healthy path, finite-gradient
    # on the rescue path (custom_vjp at the returned factor).
    prec_all = mask[:, None] / qnet_var  # masked precision (b, L)
    chol_inv_op, chol_logdet_op = _CHOL_OPS[chol_mode]
    have_bt = E_inv is not None or V is not None
    if E_inv is not None:
        # W-shared forming (see the E_inv derivation above): ONE
        # highest-pinned (m, b)·(b, m) gemm per dim feeds both B and B̃
        def _form_W(prec):
            with jax.default_matmul_precision("highest"):
                return (U * prec[None, :]) @ U.T

        W_all = jax.vmap(_form_W, in_axes=1)(prec_all)  # (L, m, m)
        B_all = eye_m + ratio * W_all

        def _form_Bt_w(W):
            with jax.default_matmul_precision("highest"):
                return eye_m + (jitter * ratio) * (E_inv @ W @ E_inv.T)

        Bt_all = jax.vmap(_form_Bt_w)(W_all)
    else:
        def _form_B(prec):
            with jax.default_matmul_precision("highest"):
                return eye_m + ratio * (U * prec[None, :]) @ U.T

        B_all = jax.vmap(_form_B, in_axes=1)(prec_all)  # (L, m, m)
        if V is not None:
            # same ⪰ I stability argument as B above (scale is
            # jitter·ratio — 100× smaller, but one unlucky batch
            # suffices), and the same collapsed-dim rescue
            def _form_Bt(prec):
                with jax.default_matmul_precision("highest"):
                    return eye_m + (jitter * ratio) * (
                        (V * prec[None, :]) @ V.T
                    )

            Bt_all = jax.vmap(_form_Bt, in_axes=1)(prec_all)
    Lb_all, Lbinv_all = chol_inv_op(B_all, eye_m)
    if have_bt:
        ld_bt_all = chol_logdet_op(Bt_all, eye_m)

    def per_dim(y_l, var_l, Lb, Lb_inv, *maybe_ldbt):
        prec = mask / var_l  # masked precision (b,)

        # Everything below uses Σ̃⁻¹ = L⁻ᵀ Lb⁻ᵀ Lb⁻¹ L⁻¹ so that the batch
        # axis is touched by exactly THREE (m, b)-sized gemms per latent dim
        # (B above, S, and R @ U) — the naive form (four triangular solves
        # over an (m, b) RHS plus W @ A_hat) costs 2× the FLOPs and runs as
        # TPU-hostile wide triangular solves.
        S = Lb_inv @ U  # (m, b): diag(K_nm Σ̃⁻¹ K_mn) = colsum(S²)
        R = Lb_inv @ M  # (m, m)
        t = Lb_inv @ (U @ (y_l * prec))  # Lb⁻¹ L⁻¹ K_mn Λ y (m,)
        # posterior at x (svgp.py:76-79)
        # read S and X = Lb⁻¹ in their PRODUCED layout (t @ A == Aᵀ @ t for
        # a vector t): the round-4 CH profile attributes ~10 ms/ep of
        # (L, m, m) layout copies to {0,2,1}-transposed consumers of X
        # around the guard conds (profile_ch_final.log; the cond-slim
        # 'blocked2' attempt did NOT remove them). Same dot, same
        # precision scope — only the HLO dimension numbers change.
        # SPADOT_SVGP_XLAYOUT=0 restores the transposed forms (A/B arm).
        if _X_PRODUCED_LAYOUT:
            p_m = ratio * (t @ S)
        else:
            p_m = ratio * (S.T @ t)
        diag_Snn = jnp.sum(S * S, axis=0)
        p_v = K_nn - diag_Qnn + diag_Snn
        p_v = jnp.maximum(p_v, 1e-10)  # guard for the sqrt in sampling
        # mu_hat (svgp.py:81-82); A_hat = Cᵀ B⁻¹ C
        if _X_PRODUCED_LAYOUT:
            # (t @ Lb_inv) @ C == C.T @ (Lb_invᵀ @ t), X read row-major
            mu_hat = ratio * ((t @ Lb_inv) @ C)
        else:
            mu_hat = ratio * (C.T @ (Lb_inv.T @ t))  # ratio·K_mm Σ̃⁻¹ rhs
        # KL term (svgp.py:86-94); tr(K̃⁻¹ A_hat) = tr(M B⁻¹ M) = ‖R‖²_F
        if have_bt:
            # determinant-lemma form of the reference's jittered logdet
            # (exact same value — Sylvester: det(jI + CᵀB⁻¹C) =
            # det(jB + CCᵀ)/det(B), and jB + CCᵀ = E B̃ Eᵀ with
            # B̃ = I + j·ratio·VΛVᵀ ⪰ I): replaces the G = Lb⁻¹C and
            # A_hat = GᵀG gemms plus the SECOND, Lb-dependent Cholesky
            # with one more independent, unconditionally-stable
            # factorization — the serial chol→trsm→gemm→chol chain
            # becomes chol ∥ chol → trsm.
            (ld_bt,) = maybe_ldbt
            logdet_A = (
                logdet_CCj
                + ld_bt
                - 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lb)))
            )
        else:
            G = Lb_inv @ C
            A_hat = G.T @ G  # PSD by construction
            L_A = _jittered_chol(A_hat, jitter)
            logdet_A = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L_A)))
        if Kt_inv is None:
            Kmm_inv_mu = cho_solve((L_mm, True), mu_hat)
        else:
            # replaces a cho_solve custom call — keep custom-call-grade
            # precision (see the U/V scope above); (m, m)·(m,) per dim
            with jax.default_matmul_precision("highest"):
                Kmm_inv_mu = Kt_inv @ mu_hat
        kl = 0.5 * (
            logdet_Kmm - logdet_A - m
            + jnp.sum(R * R)
            + jnp.sum(mu_hat * Kmm_inv_mu)
        ) - kl_const
        # L3 reconstruction term (svgp.py:96-104):
        # diag(W A_hat Wᵀ) = colsum((R U)²) since L⁻¹ A_hat L⁻ᵀ = M B⁻¹ M.
        mean_vector = K_nm @ Kmm_inv_mu  # (b,)
        K_tilde = prec * (K_nn - diag_Qnn)
        T2 = R @ U  # (m, b)
        trace_terms = prec * jnp.sum(T2 * T2, axis=0)
        recon = -0.5 * (
            jnp.sum(K_tilde)
            + jnp.sum(trace_terms)
            + jnp.sum(mask * jnp.log(var_l))
            + b_eff * LOG_2PI
            + jnp.sum(prec * (y_l - mean_vector) ** 2)
        )
        return p_m, p_v, recon, kl

    dim_args = (qnet_mu, qnet_var, Lb_all, Lbinv_all)
    in_axes = (1, 1, 0, 0)
    if have_bt:
        dim_args += (ld_bt_all,)
        in_axes += (0,)
    p_m, p_v, recon, kl = jax.vmap(
        per_dim, in_axes=in_axes, out_axes=(1, 1, 0, 0)
    )(*dim_args)
    return {"p_m": p_m, "p_v": p_v, "recon": recon, "kl": kl}


def gauss_cross_entropy(mu1, var1, mu2, var2):
    """E_{N(mu1,var1)}[log N(.|mu2,var2)], elementwise.

    Reference: SpaDOT/model/SpaDOT.py:125-142.
    """
    term2 = (var1 + mu1**2 - 2.0 * mu1 * mu2 + mu2**2) / var2
    return -0.5 * (LOG_2PI + jnp.log(var2) + term2)
