"""Batched lower-triangular inversion as pure MXU matmuls (no custom
calls, no sequential substitution).

Why this exists (measured on the v5e, scripts/bench_chol.py 2026-08-20):
at the whitened-SVGP training shapes (NB=10 latent dims, m=321 inducing)
the batched Cholesky custom call costs **0.023 ms**, but the batched
`triangular_solve(L, I)` that materializes L⁻¹ costs **1.33 ms** — ~50×
the factorization — and the training step needs TWO of them (B and B̃).
XLA's TriangularSolve lowers to a blocked `InvertDiagonalBlocks` routine
plus while-loop glue whose per-call latency dominates at these sizes; a
Pallas forward-substitution kernel was measured WORSE (2.1 ms — ~5 µs of
per-iteration overhead × 384 sequential steps; see the dead-ends note in
CLAUDE.md).

The trick that removes the sequential recurrence entirely: writing a
diagonal (P, P) block as L = D(I + Ñ) with D = diag(L) and Ñ = D⁻¹·strict
lower part, Ñ is NILPOTENT (Ñᴾ = 0), so

    L⁻¹ = (I + Ñ)⁻¹ D⁻¹ = [Σₖ₌₀^{P−1} (−Ñ)ᵏ] D⁻¹
        = [Π_{j=0}^{log₂P − 1} (I + Ā^{2ʲ})] D⁻¹ ,   Ā = −Ñ

— exactly log₂(128) = 7 repeated-squaring levels of batched (·,128,128)
MXU matmuls instead of 128 substitution steps. The identity is EXACT
(finite series, not an approximation); f32 accuracy matches the trsm to
~1e-7 residual even at collapsed-dim conditioning (‖B‖ ~ 1e10 — the
validation in tests/test_pallas.py covers the guard's worst case). The
off-diagonal blocks of the full (M, M) inverse are then assembled by
block back-substitution — a handful more batched gemms (`_assemble`).

Everything is plain XLA, so it works on every backend; it is the default
on TPU (`ops/svgp.py:_resolve_chol_backend`) where the trsm custom call
is the slow path, and off elsewhere (CPU LAPACK trsm is fast).

Reference parity note: replaces the triangular-solve backend of the
terms defined at SpaDOT/model/svgp.py:74-94; numerics differ from the
trsm only in summation order (same-magnitude rounding, see tests).
"""
import math

import jax
import jax.numpy as jnp

PB = 128  # diagonal block size: MXU-native, 7 squaring levels
_HP = jax.lax.Precision.HIGHEST


def _refined_recip(d):
    """1/d with a Newton refinement — full f32 accuracy even where the
    hardware reciprocal is approximate."""
    r = 1.0 / d
    return r * (2.0 - d * r)


def _series_inverse(Db):
    """(B, P, P) lower-triangular block inverse via the nilpotent
    repeated-squaring series; exact in exact arithmetic."""
    P = Db.shape[-1]
    d = jnp.diagonal(Db, axis1=-2, axis2=-1)
    r = _refined_recip(d)
    A = -(jnp.tril(Db, -1) * r[:, :, None])  # Ā = −D⁻¹N, nilpotent
    eye = jnp.eye(P, dtype=Db.dtype)
    S = eye + A
    Q = A
    for _ in range(1, int(math.ceil(math.log2(P)))):
        Q = jnp.matmul(Q, Q, precision=_HP)
        S = S + jnp.matmul(S, Q, precision=_HP)
    return S * r[:, None, :]  # right-multiply by D⁻¹ = column scaling


def _assemble(Lp, dinv_blocks):
    """X = L⁻¹ from inverted diagonal blocks by block back-substitution:
    X_kk = Dinv_k and, down each block column,
    X_ij = −Dinv_i · Σ_{j≤p<i} L_ip X_pj — batched MXU gemms."""
    NB, M, _ = Lp.shape
    K = M // PB

    def blk(A, i, j):
        return A[:, i * PB:(i + 1) * PB, j * PB:(j + 1) * PB]

    X = [[None] * K for _ in range(K)]
    zero = jnp.zeros((NB, PB, PB), Lp.dtype)
    for k in range(K):
        X[k][k] = dinv_blocks[k]
    for j in range(K):
        for i in range(j + 1, K):
            acc = zero
            for p in range(j, i):
                acc = acc + jnp.matmul(blk(Lp, i, p), X[p][j], precision=_HP)
            X[i][j] = -jnp.matmul(dinv_blocks[i], acc, precision=_HP)
    rows = [
        jnp.concatenate(
            [X[i][j] if j <= i else zero for j in range(K)], axis=2
        )
        for i in range(K)
    ]
    return jnp.concatenate(rows, axis=1)


def _blocked_cholesky_impl(B, want_dinv):
    """Shared body of `blocked_cholesky` / `blocked_cholesky_inv`: factor
    with panels as series-inverse gemms; optionally keep the inverted
    diagonal blocks (ALL K of them, including the last, which the panel
    loop itself never needs) so the full inverse can reuse them."""
    NB, m, _ = B.shape
    K = -(-m // PB)
    M = K * PB
    if M != m:
        pad_diag = (jnp.arange(M) >= m).astype(B.dtype)
        Bp = jnp.pad(B, ((0, 0), (0, M - m), (0, M - m)))
        Bp = Bp + jnp.diag(pad_diag)[None]
    else:
        Bp = B
    if K == 1:
        Lp = jax.lax.linalg.cholesky(Bp)
        dinv = [_series_inverse(Lp)] if want_dinv else None
        return Lp, dinv, m, M

    def blk(A, i, j):
        return A[:, i * PB:(i + 1) * PB, j * PB:(j + 1) * PB]

    L = [[None] * K for _ in range(K)]
    dinv = [None] * K if want_dinv else None
    for j in range(K):
        S = blk(Bp, j, j)
        for p in range(j):
            S = S - jnp.matmul(
                L[j][p], jnp.swapaxes(L[j][p], -1, -2), precision=_HP
            )
        L[j][j] = jax.lax.linalg.cholesky(S)
        need_inv = want_dinv or j + 1 < K
        Xd = _series_inverse(L[j][j]) if need_inv else None
        if want_dinv:
            dinv[j] = Xd
        if j + 1 < K:
            Xd_t = jnp.swapaxes(Xd, -1, -2)
            for i in range(j + 1, K):
                S_ij = blk(Bp, i, j)
                for p in range(j):
                    S_ij = S_ij - jnp.matmul(
                        L[i][p], jnp.swapaxes(L[j][p], -1, -2), precision=_HP
                    )
                L[i][j] = jnp.matmul(S_ij, Xd_t, precision=_HP)
    zero = jnp.zeros((NB, PB, PB), B.dtype)
    rows = [
        jnp.concatenate(
            [L[i][j] if j <= i else zero for j in range(K)], axis=2
        )
        for i in range(K)
    ]
    Lp = jnp.concatenate(rows, axis=1)
    return Lp, dinv, m, M


def blocked_cholesky(B):
    """Batched Cholesky (NB, m, m) → L with panel solves as MXU gemms.

    XLA's CholeskyExpander lowers a batched chol into per-128-block
    custom calls PLUS per-panel triangular-solve custom calls plus
    layout copies — measured ~22 ms/ep at ChickenHeart scale and ~45
    ms/ep at MouseOrganogenesis scale (docs/tpu_logs/profile_ch_series.log,
    profile_mouse_series.log: each blocked call is ~0.1-0.15 ms of
    latency for microseconds of math). This routine keeps ONLY the
    unavoidable K diagonal-block (NB, 128, 128) chol custom calls and
    computes the panels as

        L_ij = (B_ij − Σ_{p<j} L_ip L_jpᵀ) · (L_jj⁻¹)ᵀ

    with L_jj⁻¹ from the exact nilpotent series (`_series_inverse`) —
    batched MXU gemms instead of trsm custom calls. m pads to K·128 with
    an identity diagonal (blockdiag(B, I) → blockdiag(L, I), inert,
    sliced away). Accuracy: the explicit-inverse panel product's error is
    O(cond(L_jj)·eps) — for the whitened SVGP factors B ⪰ I bounds it
    like the series inverse itself (validated to ‖B‖ ~ 1e10 in
    tests/test_pallas.py); a non-finite diagonal block propagates NaN to
    every later block, so the SVGP guard's finite-diagonal probe keeps
    its exact semantics (ops/svgp.py:_guarded_factor).

    Replaces the factorization behind SpaDOT/model/svgp.py:74-75 (the
    reference Cholesky-inverts Σ directly in f64).
    """
    Lp, _, m, M = _blocked_cholesky_impl(B, want_dinv=False)
    if M != m:
        return Lp[:, :m, :m]
    return Lp


def blocked_cholesky_inv(B):
    """Batched (L, X = L⁻¹) in ONE pass: `blocked_cholesky` with the
    inverted diagonal blocks KEPT and fed straight into the block
    back-substitution assembly, so the K (NB, 128, 128) series inverses
    that the panel solves already computed are not recomputed by
    `tri_inverse_batched` (which re-inverts all K diagonal blocks when
    called on a finished factor). This is the folded form CLAUDE.md's
    round-4 design calls for; per factor it removes K−1 series inverses
    (~7 squaring-level gemm chains each) relative to
    blocked_cholesky → tri_inverse_batched.

    Used by the 'blocked' SVGP chol backend
    (ops/svgp.py:_guarded_factor_inv_bc); the guard conds over the whole
    (L, X) pair, and a non-finite diagonal block propagates NaN into both
    outputs, preserving the finite-diagonal probe semantics."""
    Lp, dinv, m, M = _blocked_cholesky_impl(B, want_dinv=True)
    K = M // PB
    if K == 1:
        X = dinv[0]
    else:
        X = _assemble(Lp, dinv)
    if M != m:
        return Lp[:, :m, :m], X[:, :m, :m]
    return Lp, X


def blocked_cholesky_dinv(B):
    """`blocked_cholesky_inv` split at the guard boundary: returns the
    PADDED factor Lp (NB, M, M) plus the stacked inverted diagonal blocks
    (K, NB, PB, PB) WITHOUT assembling X = L⁻¹. The SVGP guard conds over
    this smaller tree (the padded factor + ~K·PB² of blocks instead of the
    full m² inverse) and `assemble_inv_from_dinv` builds X OUTSIDE the
    cond, so the assembly gemms fuse freely with their consumers instead
    of materializing X through the conditional's layout boundary (the
    (10,321,321) copies measured ~10 ms/ep at CH under the 'blocked'
    backend, profile_ch_blocked.log). Padded diagonal entries are 1.0, so
    the guard's finite-diagonal probe on Lp is equivalent to probing L."""
    Lp, dinv, m, M = _blocked_cholesky_impl(B, want_dinv=True)
    return Lp, jnp.stack(dinv, axis=0)


def assemble_inv_from_dinv(Lp, dinv, m):
    """X = L⁻¹ (NB, m, m) from `blocked_cholesky_dinv` outputs."""
    M = Lp.shape[-1]
    K = M // PB
    if K == 1:
        X = dinv[0]
    else:
        X = _assemble(Lp, [dinv[k] for k in range(K)])
    if M != m:
        return X[:, :m, :m]
    return X


def tri_inverse_batched(L):
    """X = L⁻¹ for a batch (NB, m, m) of lower-triangular factors, all MXU
    matmuls. m is padded to a multiple of 128 with an identity diagonal
    (inert — sliced away). A non-finite factor row yields non-finite
    inverse rows (the SVGP guard inverts only post-rescue factors)."""
    NB, m, _ = L.shape
    M = -(-m // PB) * PB
    if M != m:
        pad_diag = (jnp.arange(M) >= m).astype(L.dtype)
        Lp = jnp.pad(L, ((0, 0), (0, M - m), (0, M - m)))
        Lp = Lp + jnp.diag(pad_diag)[None]
    else:
        Lp = L
    K = M // PB
    if K == 1:
        X = _series_inverse(Lp)
    else:
        Db = jnp.stack(
            [Lp[:, k * PB:(k + 1) * PB, k * PB:(k + 1) * PB]
             for k in range(K)], axis=0,
        ).reshape(K * NB, PB, PB)
        dinv = _series_inverse(Db).reshape(K, NB, PB, PB)
        X = _assemble(Lp, [dinv[k] for k in range(K)])
    if M != m:
        return X[:, :m, :m]
    return X
