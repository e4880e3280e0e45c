"""SVGP math vs a naive float64 reimplementation of the reference equations
(SpaDOT/model/svgp.py:47-104) with explicit jittered inverses."""
import numpy as np
import jax
import jax.numpy as jnp

from spadot_tpu.ops.kernels import kernel_matrix, sq_dist
from spadot_tpu.ops.svgp import gauss_cross_entropy, svgp_batch_terms, svgp_shared

JITTER = 1e-2
SCALE = 0.1


def _np_kernel(x, y):
    d2 = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return np.exp(-d2 / SCALE)


def _naive_reference(x, Z, y, noise, N_train):
    """Direct float64 transcription of the reference SVGP equations."""
    b, m = x.shape[0], Z.shape[0]
    K_mm = _np_kernel(Z, Z)
    K_mm_inv = np.linalg.inv(K_mm + JITTER * np.eye(m))
    K_nn = np.ones(b)
    K_nm = _np_kernel(x, Z)
    K_mn = K_nm.T

    sigma_l = K_mm + (N_train / b) * K_mn @ (K_nm / noise[:, None])
    sigma_l_inv = np.linalg.inv(sigma_l + JITTER * np.eye(m))
    mean_vector = (N_train / b) * K_nm @ (sigma_l_inv @ (K_mn @ (y / noise)))
    K_xm_Sig_K_mx = K_nm @ sigma_l_inv @ K_mn
    B = K_nn + np.diagonal(-K_nm @ K_mm_inv @ K_mn + K_xm_Sig_K_mx)
    mu_hat = (N_train / b) * K_mm @ sigma_l_inv @ (K_mn @ (y / noise))
    A_hat = K_mm @ sigma_l_inv @ K_mm

    # KL
    K_mm_chol = np.linalg.cholesky(K_mm + JITTER * np.eye(m))
    S_chol = np.linalg.cholesky(A_hat + JITTER * np.eye(m))
    K_mm_logdet = 2 * np.sum(np.log(np.diagonal(K_mm_chol)))
    S_logdet = 2 * np.sum(np.log(np.diagonal(S_chol)))
    KL = 0.5 * (
        K_mm_logdet - S_logdet - m
        + np.trace(K_mm_inv @ A_hat)
        + np.sum(mu_hat * (K_mm_inv @ mu_hat))
    )
    # L3
    precision = 1 / noise
    mean_vec2 = K_nm @ (K_mm_inv @ mu_hat)
    K_tilde = precision * (K_nn - np.diagonal(K_nm @ K_mm_inv @ K_mn))
    lam = K_nm[:, :, None] @ K_nm[:, None, :]
    lam = np.einsum("ij,bjk,kl->bil", K_mm_inv, lam, K_mm_inv)
    trace_terms = precision * np.einsum("bii->b", np.einsum("ij,bjk->bik", A_hat, lam))
    L3 = -0.5 * (
        K_tilde.sum() + trace_terms.sum() + np.log(noise).sum()
        + b * np.log(2 * np.pi) + (precision * (y - mean_vec2) ** 2).sum()
    )
    return mean_vector, B, L3, KL


def test_svgp_terms_match_naive(rng):
    b, m, L = 24, 10, 3
    x = rng.uniform(-1, 1, size=(b, 2))
    Z = rng.uniform(-1, 1, size=(m, 2))
    qnet_mu = rng.normal(size=(b, L))
    qnet_var = np.exp(rng.normal(size=(b, L)) * 0.3)
    N_train = 100.0

    shared = svgp_shared(jnp.asarray(Z), "Gaussian", SCALE, JITTER)
    out = svgp_batch_terms(
        jnp.asarray(x), jnp.asarray(qnet_mu), jnp.asarray(qnet_var),
        jnp.ones(b), N_train, shared["Z"], shared["K_mm"], shared["L_mm"],
        kernel_scale=SCALE, jitter=JITTER,
    )
    for l in range(L):
        p_m, p_v, recon, kl = _naive_reference(
            x, Z, qnet_mu[:, l], qnet_var[:, l], N_train
        )
        np.testing.assert_allclose(np.asarray(out["p_m"][:, l]), p_m, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(out["p_v"][:, l]), p_v, rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(float(out["recon"][l]), recon, rtol=2e-3)
        np.testing.assert_allclose(float(out["kl"][l]), kl, rtol=2e-3, atol=1e-3)


def test_svgp_padded_inducing_matches_unpadded(rng):
    """svgp_shared_padded + m_mask + kl_const must reproduce the unpadded
    terms EXACTLY (up to f32 roundoff) — the correctness core of the fused
    stacked-timepoint epoch."""
    from spadot_tpu.ops.svgp import svgp_shared_padded

    b, m, m_max, L = 24, 10, 17, 3
    x = rng.uniform(-1, 1, size=(b, 2))
    Z = rng.uniform(-1, 1, size=(m, 2))
    qnet_mu = rng.normal(size=(b, L))
    qnet_var = np.exp(rng.normal(size=(b, L)) * 0.3)
    N_train = 100.0

    shared = svgp_shared(jnp.asarray(Z), "Gaussian", SCALE, JITTER)
    ref = svgp_batch_terms(
        jnp.asarray(x), jnp.asarray(qnet_mu), jnp.asarray(qnet_var),
        jnp.ones(b), N_train, shared["Z"], shared["K_mm"], shared["L_mm"],
        kernel_scale=SCALE, jitter=JITTER,
    )
    padded, m_mask, kl_const = svgp_shared_padded(
        jnp.asarray(Z), m_max, "Gaussian", SCALE, JITTER
    )
    got = svgp_batch_terms(
        jnp.asarray(x), jnp.asarray(qnet_mu), jnp.asarray(qnet_var),
        jnp.ones(b), N_train, padded["Z"], padded["K_mm"], padded["L_mm"],
        kernel_scale=SCALE, jitter=JITTER, m_mask=m_mask, kl_const=kl_const,
    )
    for key in ("p_m", "p_v", "recon", "kl"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]), rtol=1e-4, atol=1e-4
        )
    # no-pad case degenerates to identity
    same, mm, kc = svgp_shared_padded(jnp.asarray(Z), m, "Gaussian", SCALE, JITTER)
    assert kc == 0.0 and np.all(np.asarray(mm) == 1.0)
    np.testing.assert_allclose(np.asarray(same["L_mm"]), np.asarray(shared["L_mm"]))


def test_svgp_mask_matches_smaller_batch(rng):
    """Padded rows with mask=0 must reproduce the unpadded computation."""
    b, m, L = 16, 8, 2
    x = rng.uniform(-1, 1, size=(b, 2)).astype(np.float32)
    Z = rng.uniform(-1, 1, size=(m, 2)).astype(np.float32)
    mu = rng.normal(size=(b, L)).astype(np.float32)
    var = np.exp(rng.normal(size=(b, L)) * 0.3).astype(np.float32)
    shared = svgp_shared(jnp.asarray(Z), "Gaussian", SCALE, JITTER)

    full = svgp_batch_terms(
        jnp.asarray(x[:12]), jnp.asarray(mu[:12]), jnp.asarray(var[:12]),
        jnp.ones(12), 50.0, shared["Z"], shared["K_mm"], shared["L_mm"],
        kernel_scale=SCALE, jitter=JITTER,
    )
    mask = jnp.asarray([1.0] * 12 + [0.0] * 4)
    padded = svgp_batch_terms(
        jnp.asarray(x), jnp.asarray(mu), jnp.asarray(var),
        mask, 50.0, shared["Z"], shared["K_mm"], shared["L_mm"],
        kernel_scale=SCALE, jitter=JITTER,
    )
    np.testing.assert_allclose(
        np.asarray(padded["p_m"][:12]), np.asarray(full["p_m"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(padded["recon"]), np.asarray(full["recon"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(padded["kl"]), np.asarray(full["kl"]), rtol=1e-4
    )


def test_gauss_cross_entropy_closed_form():
    mu1, var1, mu2, var2 = 0.3, 0.5, -0.1, 0.8
    got = float(gauss_cross_entropy(mu1, var1, mu2, var2))
    want = -0.5 * (
        np.log(2 * np.pi) + np.log(var2)
        + (var1 + mu1**2 - 2 * mu1 * mu2 + mu2**2) / var2
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_kernel_matrix_matches_cdist(rng):
    x = rng.normal(size=(7, 2))
    y = rng.normal(size=(5, 2))
    from scipy.spatial.distance import cdist

    d2 = cdist(x, y, "sqeuclidean")
    np.testing.assert_allclose(np.asarray(sq_dist(jnp.asarray(x), jnp.asarray(y))), d2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(kernel_matrix(jnp.asarray(x), jnp.asarray(y), "Gaussian", 0.1)),
        np.exp(-d2 / 0.1), atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(kernel_matrix(jnp.asarray(x), jnp.asarray(y), "Cauchy", 0.1)),
        1 / (1 + d2 / 0.1), atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(kernel_matrix(jnp.asarray(x), jnp.asarray(y), "Quadratic", 0.1)),
        1 - d2 / (d2 + 0.1), atol=1e-5, rtol=1e-5,
    )


def test_svgp_extreme_scale_stays_finite(rng):
    """Regression: chol(Sigma) went indefinite in f32 at large ratio*b*prec
    (batch 4096, m 600, heavy padding) — the whitened B = I + c U Lambda U^T
    factorization must stay finite at any scale."""
    b, m, L = 4096, 600, 10
    x = rng.uniform(-2, 2, size=(b, 2)).astype(np.float32)
    Z = rng.uniform(-2, 2, size=(m, 2)).astype(np.float32)
    mu = rng.normal(size=(b, L)).astype(np.float32)
    var = np.exp(rng.normal(-2, 2, size=(b, L))).astype(np.float32)  # small vars
    mask = np.zeros(b, np.float32)
    mask[:512] = 1.0  # heavily padded batch
    shared = svgp_shared(jnp.asarray(Z), "Gaussian", SCALE, JITTER)
    out = svgp_batch_terms(
        jnp.asarray(x), jnp.asarray(mu), jnp.asarray(var), jnp.asarray(mask),
        102400.0, shared["Z"], shared["K_mm"], shared["L_mm"],
        kernel_scale=SCALE, jitter=JITTER,
    )
    for k in ("p_m", "p_v", "recon", "kl"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_constant_fed_path_matches_fallback(rng):
    """The precomputed-constant fast path (L_inv/C/M/Kt_inv gemms + the
    determinant-lemma logdet via F/logdet_CCj) must equal the triangular-
    solve fallback to machine precision — values AND gradients. The lemma:
    det(jI + CᵀB⁻¹C) = det(jB + CCᵀ)/det(B) with jB + CCᵀ = E B̃ Eᵀ,
    B̃ = I + j·ratio·(E⁻¹U)Λ(E⁻¹U)ᵀ — same jitter semantics as the
    reference's chol(A_hat + jI) (svgp.py:88)."""
    from spadot_tpu.ops.svgp import svgp_shared_padded

    m, b, L = 37, 53, 4
    Z = jnp.asarray(rng.uniform(0, 10, (m, 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 10, (b, 2)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(b, L)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, (b, L)), jnp.float32)
    mask = jnp.asarray((rng.uniform(size=b) > 0.2).astype(np.float32))
    st = svgp_shared(Z)
    consts = dict(
        L_inv=st["L_inv"], C=st["C"], M=st["M"], Kt_inv=st["Kt_inv"],
        F=st["F"], logdet_CCj=st["logdet_CCj"],
    )
    old = svgp_batch_terms(x, mu, var, mask, 400.0,
                           st["Z"], st["K_mm"], st["L_mm"])
    new = svgp_batch_terms(x, mu, var, mask, 400.0,
                           st["Z"], st["K_mm"], st["L_mm"], **consts)
    for k in ("p_m", "p_v", "recon", "kl"):
        np.testing.assert_allclose(old[k], new[k], rtol=2e-5, atol=1e-5)

    # padded constants stay exactly inert
    stp, mm, kc = svgp_shared_padded(Z, m + 11)
    pad = svgp_batch_terms(
        x, mu, var, mask, 400.0, stp["Z"], stp["K_mm"], stp["L_mm"],
        m_mask=mm, kl_const=kc,
        L_inv=stp["L_inv"], C=stp["C"], M=stp["M"], Kt_inv=stp["Kt_inv"],
        F=stp["F"], logdet_CCj=stp["logdet_CCj"],
    )
    for k in ("recon", "kl"):
        np.testing.assert_allclose(old[k], pad[k], rtol=2e-5, atol=1e-4)

    def kl_sum(path_consts):
        def f(v):
            return jnp.sum(svgp_batch_terms(
                x, mu, v, mask, 400.0, st["Z"], st["K_mm"], st["L_mm"],
                **path_consts)["kl"])
        return jax.grad(f)(var)

    g_old, g_new = kl_sum({}), kl_sum(consts)
    np.testing.assert_allclose(g_old, g_new, rtol=5e-4, atol=5e-4)


def test_bt_shared_matches_direct_forming(rng):
    """svgp_bt_shared=True (B̃ = I + j·ratio·E⁻¹WE⁻ᵀ from B's shared
    W = (U·prec)Uᵀ gemm) must equal the direct V-forming arm
    (B̃ = I + j·ratio·(V·prec)Vᵀ, V = E⁻¹U) to float reassociation
    tolerance — values AND gradients; the two are the same matrix by
    construction (E⁻¹(UΛUᵀ)E⁻ᵀ = (E⁻¹U)Λ(E⁻¹U)ᵀ)."""
    m, b, L = 41, 67, 5
    Z = jnp.asarray(rng.uniform(0, 10, (m, 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 10, (b, 2)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(b, L)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.2, 3.0, (b, L)), jnp.float32)
    mask = jnp.asarray((rng.uniform(size=b) > 0.2).astype(np.float32))
    st = svgp_shared(Z)
    consts = dict(
        L_inv=st["L_inv"], C=st["C"], M=st["M"], Kt_inv=st["Kt_inv"],
        F=st["F"], logdet_CCj=st["logdet_CCj"],
    )

    def terms(bt_shared):
        return svgp_batch_terms(
            x, mu, var, mask, 900.0, st["Z"], st["K_mm"], st["L_mm"],
            bt_shared=bt_shared, **consts,
        )

    a, c = terms(True), terms(False)
    for k in ("p_m", "p_v", "recon", "kl"):
        np.testing.assert_allclose(a[k], c[k], rtol=2e-5, atol=2e-5,
                                   err_msg=k)

    def kl_grad(bt_shared):
        def f(v):
            return jnp.sum(svgp_batch_terms(
                x, mu, v, mask, 900.0, st["Z"], st["K_mm"], st["L_mm"],
                bt_shared=bt_shared, **consts)["kl"])
        return jax.grad(f)(var)

    np.testing.assert_allclose(
        kl_grad(True), kl_grad(False), rtol=5e-4, atol=5e-4
    )


def test_b_gemm_precision_pinned_highest(rng):
    """Regression (2026-08-19, docs/tpu_logs/atlasq_b512.log): the B- and
    B̃-forming gemms must stay pinned to true-f32 'highest' even when the
    caller scopes the training SVGP to 'high' (3-pass bf16). The B ⪰ I
    eigenvalue floor only protects the unjittered Cholesky while the gemm
    error is ≪ 1, and that error is relative to ‖B‖ ≈ ratio·max(1/σ²)·b:
    at ratio = N/b = 200 (batch 512 at 102,400 spots) ‖B‖ ~ 1e6 and the
    3-pass product measured min-eig −0.098 → chol NaN at epoch 1 on TPU.
    CPU matmuls cannot reproduce the bf16 passes, so assert on the traced
    program: the pinned dots carry Precision.HIGHEST under an ambient
    'high' scope (counts drop by 4 / 2 if the B/B̃ pins are removed)."""
    m, b, L = 37, 53, 4
    Z = jnp.asarray(rng.uniform(0, 10, (m, 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 10, (b, 2)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(b, L)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, (b, L)), jnp.float32)
    mask = jnp.ones(b, jnp.float32)
    st = svgp_shared(Z)
    consts = dict(L_inv=st["L_inv"], C=st["C"], M=st["M"], Kt_inv=st["Kt_inv"],
                  F=st["F"], logdet_CCj=st["logdet_CCj"])
    with jax.default_matmul_precision("high"):
        jx_gemm = jax.make_jaxpr(lambda: svgp_batch_terms(
            x, mu, var, mask, 400.0, st["Z"], st["K_mm"], st["L_mm"],
            **consts))()
        jx_solve = jax.make_jaxpr(lambda: svgp_batch_terms(
            x, mu, var, mask, 400.0, st["Z"], st["K_mm"], st["L_mm"]))()
    # measured: 30 with the B (+2) and B̃ (+2) pins, 26 without, on the
    # constant-fed path; 26 vs 24 on the solve fallback (B only)
    assert str(jx_gemm).count("HIGHEST") >= 30
    assert str(jx_solve).count("HIGHEST") >= 26


def test_chol_guarded_rescues_rounding_indefiniteness(rng):
    """Regression (2026-08-19, docs/tpu_logs/bench_mouse_bpin.log): when a
    latent dim's encoder variance collapses to the exp(-15) clip floor,
    ‖B‖ = ‖I + ratio·UΛUᵀ‖ reaches ~1e9-1e10 and f32 Gram-forming rounding
    (~√b·ε·‖B‖ ≫ 1) makes chol(B) indefinite — NO matmul precision fixes
    this (it reproduces on CPU at exact f32). `_chol_guarded` must (a) keep
    healthy slots bit-identical to a plain Cholesky and (b) rescue a slot
    whose indefiniteness is rounding-scale relative to its diagonal."""
    from spadot_tpu.ops.svgp import _chol_guarded

    m = 32
    Q, _ = np.linalg.qr(rng.normal(size=(m, m)))
    eigs = np.geomspace(1e9, 1.0, m)
    eigs[-1] = -1e3  # rounding-scale dip: ~1e-6 of ‖B‖
    B_bad = ((Q * eigs) @ Q.T).astype(np.float32)
    B_bad = (B_bad + B_bad.T) / 2
    B_ok = (np.eye(m) * 2.0).astype(np.float32)
    eye = jnp.eye(m, dtype=jnp.float32)
    Lb = np.asarray(_chol_guarded(jnp.asarray(np.stack([B_ok, B_bad])), eye))
    plain = np.asarray(jax.scipy.linalg.cholesky(jnp.asarray(B_ok), lower=True))
    assert np.isfinite(Lb).all()
    np.testing.assert_array_equal(Lb[0], plain)  # healthy slot untouched
    # rescued factor reconstructs B_bad to the documented 5% jitter
    rel = np.abs(Lb[1] @ Lb[1].T - B_bad).max() / np.abs(B_bad).max()
    assert rel < 0.06


def test_chol_guarded_gradients_finite_when_rescue_fires(rng):
    """Regression (2026-08-20 review): the first guard revision computed the
    probe `cholesky(B_all)` INSIDE the autodiff graph and returned it from
    the healthy branch of a lax.cond — when the rescue fired, the cond's
    VJP routed a zero cotangent into the NaN-primal probe's pullback
    (0·NaN = NaN), so the training step that needed the rescue produced a
    finite loss but NaN parameter gradients. The guard is differentiated in
    every training step (forward_batch → svgp_batch_terms), so the rescue
    must keep gradients finite — and must not perturb healthy-slot
    gradients."""
    from spadot_tpu.ops.svgp import _chol_guarded

    m = 32
    Q, _ = np.linalg.qr(rng.normal(size=(m, m)))
    eigs = np.geomspace(1e9, 1.0, m)
    eigs[-1] = -1e3
    B_bad = ((Q * eigs) @ Q.T).astype(np.float32)
    B_bad = (B_bad + B_bad.T) / 2
    B_ok = (np.eye(m) * 2.0 + 0.1).astype(np.float32)
    eye = jnp.eye(m, dtype=jnp.float32)
    B_all = jnp.asarray(np.stack([B_ok, B_bad]))

    # scale-normalized loss so the rescued slot's huge factor can't hide
    # a NaN behind an overflow
    def loss(B):
        Lb = _chol_guarded(B, eye)
        scale = jax.lax.stop_gradient(
            jnp.max(jnp.abs(Lb), axis=(-2, -1), keepdims=True)
        )
        return jnp.sum((Lb / scale) ** 2)

    g = np.asarray(jax.grad(loss)(B_all))
    assert np.isfinite(g).all()

    # healthy slot's gradient == plain-cholesky gradient (the custom
    # backward is the transpose of the same Murray-2016 rule jax uses;
    # only op association may differ in the last bits)
    def loss_plain(B):
        Lb = jax.scipy.linalg.cholesky(B, lower=True)
        scale = jax.lax.stop_gradient(jnp.max(jnp.abs(Lb)))
        return jnp.sum((Lb / scale) ** 2)

    g_plain = np.asarray(jax.grad(loss_plain)(jnp.asarray(B_ok)))
    np.testing.assert_allclose(g[0], g_plain, rtol=1e-5, atol=1e-6)


def test_collapsed_dim_stays_finite(rng):
    """A latent dim at the variance clip floor (prec = e¹⁵) must yield
    finite posterior/ELBO terms on every path — the NaN column it used to
    produce poisoned the KMeans refresh and took down the whole model
    (mouse-scale benches + the b512@102k quality arms, 2026-08-19)."""
    m, b, L = 48, 256, 4
    Z = jnp.asarray(rng.uniform(0, 10, (m, 2)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 10, (b, 2)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(b, L)), jnp.float32)
    var = np.ones((b, L), np.float32)
    var[:, 1] = np.exp(-15.0)  # collapsed dim
    mask = jnp.ones(b, jnp.float32)
    st = svgp_shared(Z)
    consts = dict(L_inv=st["L_inv"], C=st["C"], M=st["M"], Kt_inv=st["Kt_inv"],
                  F=st["F"], logdet_CCj=st["logdet_CCj"])
    for path in ({}, consts):
        out = svgp_batch_terms(
            x, mu, jnp.asarray(var), mask, float(b) * 6.6,
            st["Z"], st["K_mm"], st["L_mm"], **path)
        for k in ("p_m", "p_v", "recon", "kl"):
            assert np.isfinite(np.asarray(out[k])).all(), (k, path.keys())


def test_chol_inv_guarded_matches_plain_and_rescues(rng):
    """`_chol_inv_guarded` must (a) return the SAME factor as
    `_chol_guarded` plus its exact triangular inverse on both guard paths,
    and (b) produce healthy-slot gradients equal to plain autodiff through
    `chol → solve_triangular` — its all-GEMM backward is the same pullback
    algebra evaluated at the materialized inverse (ops/svgp.py rationale:
    the trsm custom calls it removes were ~31% of the ChickenHeart-scale
    device epoch, profile_ch_cvjp.log)."""
    from spadot_tpu.ops.svgp import _chol_guarded, _chol_inv_guarded

    m = 32
    Q, _ = np.linalg.qr(rng.normal(size=(m, m)))
    eigs = np.geomspace(1e9, 1.0, m)
    eigs[-1] = -1e3  # rounding-scale dip -> plain chol NaNs, rescue fires
    B_bad = ((Q * eigs) @ Q.T).astype(np.float32)
    B_bad = (B_bad + B_bad.T) / 2
    B_ok = (np.eye(m) * 2.0 + 0.1).astype(np.float32)
    eye = jnp.eye(m, dtype=jnp.float32)
    B_all = jnp.asarray(np.stack([B_ok, B_bad]))

    Lb, X = _chol_inv_guarded(B_all, eye)
    Lg = _chol_guarded(B_all, eye)
    np.testing.assert_array_equal(np.asarray(Lb), np.asarray(Lg))
    X_ref = jax.lax.linalg.triangular_solve(
        Lg, jnp.broadcast_to(eye, Lg.shape), left_side=True, lower=True)
    np.testing.assert_array_equal(np.asarray(X), np.asarray(X_ref))
    assert np.isfinite(np.asarray(X)).all()

    # gradients: finite on the rescue slot, plain-AD-equal on the healthy
    def loss(B):
        L, Xi = _chol_inv_guarded(B, eye)
        s = jax.lax.stop_gradient(jnp.max(jnp.abs(L), axis=(-2, -1),
                                          keepdims=True))
        return jnp.sum((L / s) ** 2) + jnp.sum(Xi ** 2)

    g = np.asarray(jax.grad(loss)(B_all))
    assert np.isfinite(g).all()

    def loss_plain(B):
        L = jax.scipy.linalg.cholesky(B, lower=True)
        Xi = jax.scipy.linalg.solve_triangular(L, jnp.eye(m, dtype=B.dtype),
                                               lower=True)
        s = jax.lax.stop_gradient(jnp.max(jnp.abs(L)))
        return jnp.sum((L / s) ** 2) + jnp.sum(Xi ** 2)

    g_plain = np.asarray(jax.grad(loss_plain)(jnp.asarray(B_ok)))
    np.testing.assert_allclose(g[0], g_plain, rtol=2e-4, atol=1e-5)


def test_chol_logdet_guarded_matches_plain(rng):
    """`_chol_logdet_guarded` must equal 2·Σ log diag chol(B) with gradient
    B⁻¹ (plain-AD-equal on healthy slots; finite when the rescue fires)."""
    from spadot_tpu.ops.svgp import _chol_logdet_guarded

    m = 32
    Q, _ = np.linalg.qr(rng.normal(size=(m, m)))
    eigs = np.geomspace(1e9, 1.0, m)
    eigs[-1] = -1e3
    B_bad = ((Q * eigs) @ Q.T).astype(np.float32)
    B_bad = (B_bad + B_bad.T) / 2
    B_ok = (np.eye(m) * 2.0 + 0.1).astype(np.float32)
    eye = jnp.eye(m, dtype=jnp.float32)
    B_all = jnp.asarray(np.stack([B_ok, B_bad]))

    ld = np.asarray(_chol_logdet_guarded(B_all, eye))
    assert np.isfinite(ld).all()
    ld_ok = 2.0 * np.sum(np.log(np.diag(np.linalg.cholesky(B_ok))))
    np.testing.assert_allclose(ld[0], ld_ok, rtol=1e-6)

    g = np.asarray(jax.grad(
        lambda B: jnp.sum(_chol_logdet_guarded(B, eye)))(B_all))
    assert np.isfinite(g).all()
    np.testing.assert_allclose(
        g[0], np.linalg.inv(B_ok), rtol=2e-4, atol=1e-5)


def test_batch_terms_gradients_match_pre_geminv_formulation(rng):
    """End-to-end guard: the `_chol_inv_guarded`/`_chol_logdet_guarded`
    rewiring of `_svgp_batch_terms_impl` must leave svgp_batch_terms VALUES
    bit-close and parameter GRADIENTS fp-close to the reference formulation
    (per-dim solve_triangular + plain-AD chol pullbacks) — the same
    contract `test_constant_fed_path_matches_fallback` asserts for values."""
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

    def scalar(mu_, logv_):
        out = svgp_batch_terms(
            x, mu_, jnp.exp(logv_), mask, float(b) * 4.0,
            st["Z"], st["K_mm"], st["L_mm"], **consts)
        return (jnp.sum(out["recon"]) + jnp.sum(out["kl"])
                + jnp.sum(out["p_m"] ** 2) + jnp.sum(out["p_v"]))

    g_mu, g_lv = jax.grad(scalar, argnums=(0, 1))(mu, logv)
    assert np.isfinite(np.asarray(g_mu)).all()
    assert np.isfinite(np.asarray(g_lv)).all()

    # reference formulation: finite differences on the scalar itself
    # (checks the custom backward against the VALUE function, catching any
    # algebra slip in the all-GEMM pullbacks)
    eps = 1e-2
    r = np.zeros_like(np.asarray(logv))
    r[: b // 4, :] = 1.0
    r = jnp.asarray(r)
    fd = (scalar(mu, logv + eps * r) - scalar(mu, logv - eps * r)) / (2 * eps)
    an = jnp.sum(g_lv * r)
    np.testing.assert_allclose(float(an), float(fd), rtol=5e-2, atol=5e-2)
