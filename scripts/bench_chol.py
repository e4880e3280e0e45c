"""Microbenchmark the SVGP batched Cholesky/triangular-solve complex.

The ChickenHeart-scale per-op profile (docs/tpu_logs/profile_ch_cvjp.log)
attributes ~35 ms/epoch (~31% of device time) to the batched (L, m, m)
Cholesky / TriangularSolve custom calls at L=10, m=321 — ~2 GFLOP/epoch of
actual work, i.e. latency-bound library calls, not FLOP-bound math. This
script times the candidate replacements in isolation on the real TPU:

  1. baseline        — jnp.linalg.cholesky / solve_triangular custom calls
                       at the training shapes, fwd and fwd+bwd;
  2. padded          — the same at m padded to 384 (3 full 128-blocks);
  3. stacked         — ONE (2L, m, m) call (isolated cost of the pair —
                       the full-step A/B showed stacking LOSES in context
                       by serializing overlappable chains; this isolates
                       how much of the pair cost is per-call latency);
  4. blocked-xla     — our own right-looking 128-blocking: small diagonal
                       chol custom calls + MXU gemms for the panel/syrk
                       (tests whether the library's internal blocking is
                       the bottleneck);
  5. inverse-free    — trsm(L, eye) vs the blocked triangular inversion
                       built from (128,128) diagonal trsms + gemms.

Usage: python scripts/bench_chol.py [reps]   (TPU by default)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def make_B(L=10, m=321, b=512, seed=0, dtype=jnp.float32):
    """A training-shaped whitened B = I + ratio.U Lambda U^T (PSD, >= I)."""
    rng = np.random.default_rng(seed)
    U = rng.normal(0, 0.3, size=(m, b)).astype(np.float32)
    out = []
    for l in range(L):
        prec = rng.uniform(0.5, 4.0, size=(b,)).astype(np.float32)
        out.append(np.eye(m, dtype=np.float32) + 4.9 * (U * prec) @ U.T)
    return jnp.asarray(np.stack(out), dtype)


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


# --- candidate 4: our own 128-blocked right-looking chol --------------------
def chol_blocked(B, nb=128):
    """Right-looking blocked Cholesky over (L, m, m); m % nb == 0.

    Diagonal blocks use the library chol at (L, nb, nb); the panel solve and
    trailing update are MXU gemms — so the sequential custom-call depth is
    m/nb small calls instead of one big one.
    """
    L_, m, _ = B.shape
    k = m // nb
    A = B
    cols = []
    for i in range(k):
        Aii = jax.lax.dynamic_slice(A, (0, i * nb, i * nb), (L_, nb, nb))
        Lii = jnp.linalg.cholesky(Aii)
        if i + 1 < k:
            rest = m - (i + 1) * nb
            A21 = jax.lax.dynamic_slice(
                A, (0, (i + 1) * nb, i * nb), (L_, rest, nb))
            # L21 = A21 Lii^-T  (batched trsm on a TALL thin RHS)
            L21 = solve_triangular(
                Lii, A21.swapaxes(1, 2), lower=True).swapaxes(1, 2)
            A22 = jax.lax.dynamic_slice(
                A, (0, (i + 1) * nb, (i + 1) * nb), (L_, rest, rest))
            A22 = A22 - jnp.einsum(
                "lik,ljk->lij", L21, L21, precision="highest")
            A = jax.lax.dynamic_update_slice(
                A, A22, (0, (i + 1) * nb, (i + 1) * nb))
            colblk = jnp.concatenate([Lii, L21], axis=1)
        else:
            colblk = Lii
        cols.append(jnp.pad(colblk, ((0, 0), (i * nb, 0), (0, 0))))
    Lout = jnp.concatenate(cols, axis=2)
    return jnp.tril(Lout)


def trinv_blocked(Lmat, nb=128):
    """L^-1 for batched lower-triangular L via 128-blocked back-substitution:
    diagonal (nb, nb) trsms + gemms for the off-diagonal blocks."""
    L_, m, _ = Lmat.shape
    k = m // nb
    eye = jnp.broadcast_to(jnp.eye(nb, dtype=Lmat.dtype), (L_, nb, nb))
    Dinv = []
    for i in range(k):
        Lii = jax.lax.dynamic_slice(
            Lmat, (0, i * nb, i * nb), (L_, nb, nb))
        Dinv.append(solve_triangular(Lii, eye, lower=True))
    # X_ij = -Dinv_i @ (sum_{j<=p<i} L_ip X_pj); build column-block by block
    blocks = [[None] * k for _ in range(k)]
    for i in range(k):
        blocks[i][i] = Dinv[i]
    for j in range(k):
        for i in range(j + 1, k):
            acc = 0.0
            for p in range(j, i):
                Lip = jax.lax.dynamic_slice(
                    Lmat, (0, i * nb, p * nb), (L_, nb, nb))
                acc = acc + jnp.einsum(
                    "lik,lkj->lij", Lip, blocks[p][j], precision="highest")
            blocks[i][j] = -jnp.einsum(
                "lik,lkj->lij", Dinv[i], acc, precision="highest")
    rows = []
    for i in range(k):
        row = [blocks[i][j] if j <= i else jnp.zeros_like(Dinv[0])
               for j in range(k)]
        rows.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(rows, axis=1)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    L, m, b = 10, 321, 512
    mp = 384
    print(f"backend: {jax.default_backend()}  shapes: L={L} m={m} (pad {mp})")

    B = make_B(L, m, b)
    Bp = make_B(L, mp, b)  # padded stand-in (same block count as 321 padded)
    B2 = jnp.concatenate([B, make_B(L, m, b, seed=1)], axis=0)
    eye_m = jnp.broadcast_to(jnp.eye(m, dtype=B.dtype), (L, m, m))
    eye_p = jnp.broadcast_to(jnp.eye(mp, dtype=B.dtype), (L, mp, mp))

    chol = jax.jit(jnp.linalg.cholesky)
    t = timeit(chol, B, reps=reps)
    print(f"chol custom-call   (10,{m},{m})  fwd: {t:8.3f} ms")
    t = timeit(chol, Bp, reps=reps)
    print(f"chol custom-call   (10,{mp},{mp})  fwd: {t:8.3f} ms")
    t = timeit(chol, B2, reps=reps)
    print(f"chol custom-call   (20,{m},{m})  fwd: {t:8.3f} ms")

    cb = jax.jit(chol_blocked)
    Lref = chol(Bp)
    Lblk = cb(Bp)
    err = float(jnp.max(jnp.abs(Lref - Lblk)))
    t = timeit(cb, Bp, reps=reps)
    print(f"chol blocked-xla   (10,{mp},{mp})  fwd: {t:8.3f} ms   "
          f"max|dL|={err:.2e}")

    ts = jax.jit(lambda Lm: solve_triangular(Lm, eye_m, lower=True))
    tsp = jax.jit(lambda Lm: solve_triangular(Lm, eye_p, lower=True))
    Lr = chol(B)
    Lp = chol(Bp)
    t = timeit(ts, Lr, reps=reps)
    print(f"trsm(L, I) call    (10,{m},{m})  fwd: {t:8.3f} ms")
    t = timeit(tsp, Lp, reps=reps)
    print(f"trsm(L, I) call    (10,{mp},{mp})  fwd: {t:8.3f} ms")

    ti = jax.jit(trinv_blocked)
    Iref = tsp(Lp)
    Iblk = ti(Lp)
    err = float(jnp.max(jnp.abs(Iref - Iblk)))
    t = timeit(ti, Lp, reps=reps)
    print(f"trinv blocked-xla  (10,{mp},{mp})  fwd: {t:8.3f} ms   "
          f"max|dX|={err:.2e}")

    # the actual training composite: chol + trsm + logdets, fwd+bwd
    def composite(Bm, Bt):
        Lb = jnp.linalg.cholesky(Bm)
        Lbt = jnp.linalg.cholesky(Bt)
        Lb_inv = solve_triangular(Lb, eye_m, lower=True)
        return (jnp.sum(Lb_inv * Lb_inv)
                + 2.0 * jnp.sum(jnp.log(
                    jnp.diagonal(Lbt, axis1=1, axis2=2)))
                - 2.0 * jnp.sum(jnp.log(
                    jnp.diagonal(Lb, axis1=1, axis2=2))))

    Bt = make_B(L, m, b, seed=2)
    comp = jax.jit(composite)
    grad = jax.jit(jax.grad(composite, argnums=(0, 1)))
    t = timeit(comp, B, Bt, reps=reps)
    print(f"composite          (10,{m},{m})  fwd: {t:8.3f} ms")
    t = timeit(grad, B, Bt, reps=reps)
    print(f"composite      (10,{m},{m})  fwd+bwd: {t:8.3f} ms")

    def composite_blocked(Bm, Bt):
        Bmp = jnp.pad(Bm, ((0, 0), (0, mp - m), (0, mp - m)))
        Btp = jnp.pad(Bt, ((0, 0), (0, mp - m), (0, mp - m)))
        pad_eye = jnp.arange(mp) >= m
        Bmp = Bmp + jnp.diag(pad_eye.astype(Bm.dtype))
        Btp = Btp + jnp.diag(pad_eye.astype(Bm.dtype))
        Lb = chol_blocked(Bmp)
        Lbt = chol_blocked(Btp)
        Lb_inv = trinv_blocked(Lb)[:, :m, :m]
        return (jnp.sum(Lb_inv * Lb_inv)
                + 2.0 * jnp.sum(jnp.log(
                    jnp.diagonal(Lbt, axis1=1, axis2=2)))
                - 2.0 * jnp.sum(jnp.log(
                    jnp.diagonal(Lb, axis1=1, axis2=2))))

    # --- candidate: custom_vjp ops with materialized inverse + gemm bwd ---
    # fwd: chol + trsm(I) per matrix (4 custom calls / step total);
    # bwd: pure gemms at the saved factors (0 custom calls), exploiting
    # B >= I  =>  ||L^-1|| <= 1 so the explicit-inverse products are
    # well-conditioned. Baseline AD emits chol+trsm fwd (3 calls) and
    # 2 trsms per chol pullback + 1 for the trsm transpose rule (5 calls).
    @jax.custom_vjp
    def chol_inv(Bm):
        return _chol_inv_fwd(Bm)[0]

    def _chol_inv_fwd(Bm):
        Lc = jnp.linalg.cholesky(Bm)
        X = jax.lax.linalg.triangular_solve(
            Lc, jnp.broadcast_to(jnp.eye(m, dtype=Bm.dtype), Bm.shape),
            left_side=True, lower=True)
        return (Lc, X), (Lc, X)

    def _chol_inv_bwd(res, bars):
        Lc, X = res
        L_bar, X_bar = bars
        hp = jax.lax.Precision.HIGHEST
        Xt = jnp.swapaxes(X, -1, -2)
        L_tot = L_bar - jnp.tril(
            jnp.matmul(Xt, jnp.matmul(X_bar, Xt, precision=hp),
                       precision=hp))
        Mm = jnp.matmul(jnp.swapaxes(Lc, -1, -2), L_tot, precision=hp)
        P = jnp.tril(Mm) / (1.0 + jnp.eye(m, dtype=Lc.dtype))
        return (jnp.matmul(Xt, jnp.matmul(P, X, precision=hp),
                           precision=hp),)

    chol_inv.defvjp(_chol_inv_fwd, _chol_inv_bwd)

    @jax.custom_vjp
    def chol_logdet(Bm):
        return _chol_logdet_fwd(Bm)[0]

    def _chol_logdet_fwd(Bm):
        Lc = jnp.linalg.cholesky(Bm)
        X = jax.lax.linalg.triangular_solve(
            Lc, jnp.broadcast_to(jnp.eye(m, dtype=Bm.dtype), Bm.shape),
            left_side=True, lower=True)
        ld = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(Lc, axis1=-2, axis2=-1)), axis=-1)
        return ld, X

    def _chol_logdet_bwd(X, ld_bar):
        hp = jax.lax.Precision.HIGHEST
        Binv = jnp.matmul(jnp.swapaxes(X, -1, -2), X, precision=hp)
        return (ld_bar[:, None, None] * Binv,)

    chol_logdet.defvjp(_chol_logdet_fwd, _chol_logdet_bwd)

    def composite_gemmbwd(Bm, Bt):
        Lb, Lb_inv = chol_inv(Bm)
        ld_t = chol_logdet(Bt)
        return (jnp.sum(Lb_inv * Lb_inv) + jnp.sum(ld_t)
                - 2.0 * jnp.sum(jnp.log(
                    jnp.diagonal(Lb, axis1=1, axis2=2))))

    compg = jax.jit(composite_gemmbwd)
    gradg = jax.jit(jax.grad(composite_gemmbwd, argnums=(0, 1)))
    ref = float(comp(B, Bt))
    gv = float(compg(B, Bt))
    ga, gb = jax.grad(composite, argnums=(0, 1))(B, Bt)
    gc, gd = gradg(B, Bt)
    gerr = max(float(jnp.max(jnp.abs(ga - gc))), float(jnp.max(jnp.abs(gb - gd))))
    t = timeit(compg, B, Bt, reps=reps)
    print(f"composite gemmbwd  (10,{m},{m})  fwd: {t:8.3f} ms   "
          f"|dv|={abs(ref - gv):.2e}")
    t = timeit(gradg, B, Bt, reps=reps)
    print(f"composite gbw  (10,{m},{m})  fwd+bwd: {t:8.3f} ms   "
          f"max|dgrad|={gerr:.2e}")

    # --- candidate: nilpotent log-series inverse (pure MXU matmuls) -------
    from spadot_tpu.ops.tri_inverse import tri_inverse_batched
    Lr_ = chol(B)
    pk = jax.jit(tri_inverse_batched)
    Xp_ = pk(Lr_)
    Xr_ = ts(Lr_)
    err = float(jnp.max(jnp.abs(Xp_ - Xr_)))
    t = timeit(pk, Lr_, reps=reps)
    print(f"series tri-inverse (10,{m},{m})  fwd: {t:8.3f} ms   "
          f"max|d|={err:.2e}")
    # the full per-step pair: chol + inverse for B and Bt
    pk2 = jax.jit(lambda Bm, Bt_: (
        tri_inverse_batched(jnp.linalg.cholesky(Bm)),
        tri_inverse_batched(jnp.linalg.cholesky(Bt_))))
    t = timeit(pk2, B, Bt, reps=reps)
    print(f"series chol+inv x2 (10,{m},{m})  fwd: {t:8.3f} ms")
    # stacked pair: ONE kernel over (2L, m, m) — at kernel level the
    # batch axis VECTORIZES (unlike the custom-call stacking dead end,
    # which serialized two library calls)
    pks = jax.jit(lambda Bm, Bt_: tri_inverse_batched(
        jnp.linalg.cholesky(jnp.concatenate([Bm, Bt_], 0))))
    t = timeit(pks, B, Bt, reps=reps)
    print(f"series stacked     (20,{m},{m})  fwd: {t:8.3f} ms")
    # atlas-scale shape
    Ba = make_B(10, 600, 1024, seed=3)
    La_ = jnp.linalg.cholesky(Ba)
    pka = jax.jit(tri_inverse_batched)
    t = timeit(pka, La_, reps=max(3, reps // 3))
    print(f"series tri-inverse (10,600,600)  fwd: {t:8.3f} ms")
    trsm_a = jax.jit(lambda Lm: jax.lax.linalg.triangular_solve(
        Lm, jnp.broadcast_to(jnp.eye(600, dtype=Lm.dtype), Lm.shape),
        left_side=True, lower=True))
    t = timeit(trsm_a, La_, reps=max(3, reps // 3))
    print(f"trsm(L, I) call    (10,600,600)  fwd: {t:8.3f} ms")

    compb = jax.jit(composite_blocked)
    gradb = jax.jit(jax.grad(composite_blocked, argnums=(0, 1)))
    ref = float(comp(B, Bt))
    blk = float(compb(B, Bt))
    t = timeit(compb, B, Bt, reps=reps)
    print(f"composite blocked  (10,{m},{m})  fwd: {t:8.3f} ms   "
          f"|dv|={abs(ref - blk):.2e}")
    t = timeit(gradb, B, Bt, reps=reps)
    print(f"composite blk  (10,{m},{m})  fwd+bwd: {t:8.3f} ms")
    print("STEP_DONE")


if __name__ == "__main__":
    main()
