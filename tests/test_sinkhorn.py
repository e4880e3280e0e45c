"""Sinkhorn engine: differential tests between the log-domain backends and a
direct transcription of the reference's scaled-variable algorithm with
absorption (ot_solvers.py:164-449 semantics) — the same cross-check the
reference itself performs between its Python and C paths (ot_solvers.py:387,412).
"""
import numpy as np
import pytest

from spadot_tpu.ops.sinkhorn import (
    compute_transport_map,
    sinkhorn_duality_gap_jax,
    sinkhorn_duality_gap_np,
)

PARAMS = dict(
    lambda1=0.1, lambda2=5.0, epsilon=0.05, batch_size=5,
    tolerance=1e-8, epsilon0=1, max_iter=10_000_000,
)


def scaled_domain_reference(C, G, lambda1, lambda2, epsilon, epsilon0,
                            batch_size, tolerance, tau=1000, **ignored):
    """The reference algorithm verbatim: scaled a/b vars + tau absorption."""
    I, J = C.shape
    dx, dy = np.ones(I) / I, np.ones(J) / J
    p, q = np.asarray(G, float), np.ones(J) * np.average(G)
    u, v = np.zeros(I), np.zeros(J)
    a, b = np.ones(I), np.ones(J)
    sf = np.exp(-np.log(epsilon) / 5)
    eps_i = epsilon0 * sf
    K = None
    for e in range(6):
        gap = np.inf
        u += eps_i * np.log(a)
        v += eps_i * np.log(b)
        a, b = np.ones(I), np.ones(J)
        eps_i /= sf
        a1 = lambda1 / (lambda1 + eps_i)
        a2 = lambda2 / (lambda2 + eps_i)
        thr = tolerance if e == 5 else 1e-6
        K = np.exp((u[:, None] - C + v[None, :]) / eps_i)
        Kbar = np.exp(-C / eps_i)
        while gap > thr:
            for _ in range(batch_size if e == 5 else 5):
                old_a, old_b = a, b
                a = (p / (K.dot(b * dy))) ** a1 * np.exp(-u / (lambda1 + eps_i))
                b = (q / (K.T.dot(a * dx))) ** a2 * np.exp(-v / (lambda2 + eps_i))
                if max(np.abs(a).max(), np.abs(b).max()) > tau:
                    u += eps_i * np.log(a)
                    v += eps_i * np.log(b)
                    K = np.exp((u[:, None] - C + v[None, :]) / eps_i)
                    a, b = np.ones(I), np.ones(J)
            _a, _b = a * np.exp(u / eps_i), b * np.exp(v / eps_i)
            if e == 5:
                R = (K.T * a).T * b

                def fdiv(l, x, pp, dd):
                    return l * np.sum(dd * (x * np.log(x / pp) - x + pp))

                with np.errstate(divide="ignore", invalid="ignore"):
                    pri = (
                        fdiv(lambda1, R @ dy, p, dx) + fdiv(lambda2, R.T @ dx, q, dy)
                        + (eps_i * np.sum(R * np.nan_to_num(np.log(R)) - R + Kbar)
                           + np.sum(R * C)) / (I * J)
                    )
                dua = (
                    -lambda1 * np.sum(p * dx * (np.exp(-eps_i * np.log(_a) / lambda1) - 1))
                    - lambda2 * np.sum(q * dy * (np.exp(-eps_i * np.log(_b) / lambda2) - 1))
                    - eps_i * np.sum(R - Kbar) / (I * J)
                )
                gap = (pri - dua) / abs(pri)
            else:
                gap = max(
                    np.linalg.norm(_a - old_a * np.exp(u / eps_i)) / (1 + np.linalg.norm(_a)),
                    np.linalg.norm(_b - old_b * np.exp(v / eps_i)) / (1 + np.linalg.norm(_b)),
                )
    return ((K.T * a).T * b) / J


def _random_problem(rng, I=10, J=12, dim=20):
    a = rng.normal(0, 2, (I, dim))
    b = rng.normal(0.5, 2, (J, dim))
    from scipy.spatial.distance import cdist

    C = cdist(a, b, "sqeuclidean")
    return C / np.median(C)


def test_np_backend_matches_scaled_domain(rng):
    C = _random_problem(rng)
    G = np.ones(C.shape[0])
    R_ref = scaled_domain_reference(C, G, **PARAMS)
    R = sinkhorn_duality_gap_np(C, G, **PARAMS)
    np.testing.assert_allclose(R, R_ref, rtol=1e-8)


def test_np_backend_nonuniform_growth(rng):
    C = _random_problem(rng)
    G = rng.uniform(0.5, 2.0, C.shape[0])
    R_ref = scaled_domain_reference(C, G, **PARAMS)
    R = sinkhorn_duality_gap_np(C, G, **PARAMS)
    np.testing.assert_allclose(R, R_ref, rtol=1e-7)


def test_jax_backend_matches_np(rng):
    C = _random_problem(rng)
    G = np.ones(C.shape[0])
    R_np = sinkhorn_duality_gap_np(C, G, **PARAMS)
    R_jax = np.asarray(sinkhorn_duality_gap_jax(C, G, **PARAMS))
    # f32 accumulations: modest tolerance
    np.testing.assert_allclose(R_jax, R_np, rtol=5e-3, atol=1e-7)


@pytest.mark.parametrize("max_iter", [3, 7, 23])
def test_jax_backend_max_iter_exhaustion_matches_np(rng, max_iter):
    """When the iteration budget dies in an EARLY epsilon stage, the plan must
    be exponentiated at that stage's epsilon (numpy backend :103-106), not the
    final ladder epsilon — differential check at tiny max_iter."""
    C = _random_problem(rng)
    G = np.ones(C.shape[0])
    params = dict(PARAMS, max_iter=max_iter)
    R_np = sinkhorn_duality_gap_np(C, G, **params)
    R_jax = np.asarray(sinkhorn_duality_gap_jax(C, G, **params))
    np.testing.assert_allclose(R_jax, R_np, rtol=5e-3, atol=1e-7)
    # and the exhausted plan differs materially from the converged one,
    # i.e. this test would catch the old wrong-epsilon exponentiation
    R_full = sinkhorn_duality_gap_np(C, G, **PARAMS)
    assert np.abs(R_np - R_full).max() > 1e-3


def test_marginal_penalties_behave(rng):
    """Row marginal is loosely constrained (lambda1=0.1), column tightly
    (lambda2=5): column sums should track q much closer than rows track p."""
    C = _random_problem(rng)
    G = np.ones(C.shape[0])
    R = sinkhorn_duality_gap_np(C, G, **PARAMS)
    I, J = C.shape
    col = (R * J).sum(axis=0) / I  # transported column marginal wrt dy measure
    # tight lambda2 keeps columns near 1
    assert np.abs(col - 1).mean() < 0.3


def test_compute_transport_map_shape_and_finite(rng):
    a = rng.normal(size=(8, 5))
    b = rng.normal(size=(9, 5))
    cfg = dict(PARAMS, growth_iters=3)
    R = compute_transport_map(a, b, cfg)
    assert R.shape == (8, 9)
    assert np.isfinite(R).all() and (R >= 0).all()


def test_degenerate_near_duplicate_clouds(rng):
    """Early-training centroid collapse: near-identical point clouds must not
    overflow (regression for the bench failure: median cost ~ 0)."""
    base = rng.normal(size=(6, 4))
    a = base + rng.normal(scale=1e-9, size=base.shape)
    b = np.vstack([base + rng.normal(scale=1e-9, size=base.shape),
                   base[:2] + 5.0])  # a couple of far points
    R = compute_transport_map(a, b, dict(PARAMS, growth_iters=3))
    assert np.isfinite(R).all() and (R >= 0).all()


def test_fixed_iters_variant_close_to_duality_gap(rng):
    from spadot_tpu.ops.sinkhorn import sinkhorn_fixed_iters

    C = _random_problem(rng)
    G = np.ones(C.shape[0])
    R_dg = sinkhorn_duality_gap_np(C, G, **PARAMS)
    R_fx = sinkhorn_fixed_iters(
        C, G, lambda1=0.1, lambda2=5.0, epsilon=0.05, epsilon0=1.0,
        scaling_iter=3000, inner_iter_max=50, extra_iter=1000,
    )
    # both converge to the same fixed point of the final-epsilon problem
    np.testing.assert_allclose(R_fx, R_dg, rtol=1e-4, atol=1e-10)


def test_balanced_sinkhorn_marginals(rng):
    from spadot_tpu.ops.sinkhorn import sinkhorn_balanced

    C = _random_problem(rng, 8, 11)
    R = sinkhorn_balanced(C, epsilon=0.1)
    np.testing.assert_allclose(R.sum(axis=1), 1 / 8, rtol=1e-6)
    np.testing.assert_allclose(R.sum(axis=0), 1 / 11, rtol=1e-6)


def test_emd_lp_matches_balanced_limit(rng):
    from spadot_tpu.ops.sinkhorn import compute_transport_map_pot

    a = rng.normal(size=(6, 3))
    b = rng.normal(size=(7, 3))
    R = compute_transport_map_pot(a, b, {"method": "emd"})
    np.testing.assert_allclose(R.sum(axis=1), 1 / 6, atol=1e-9)
    np.testing.assert_allclose(R.sum(axis=0), 1 / 7, atol=1e-9)
    # EMD cost must lower-bound any entropic plan's cost
    from scipy.spatial.distance import cdist

    C = cdist(a, b, "sqeuclidean")
    R_e = compute_transport_map_pot(a, b, {"method": "sinkhorn", "epsilon": 0.05})
    assert (R * C).sum() <= (R_e * C).sum() + 1e-9


def test_solve_ot_and_total_loss(rng):
    from spadot_tpu.ops.sinkhorn import (
        compute_transport_map,
        get_total_ot_loss,
        solve_ot,
    )

    feats = [rng.normal(size=(9, 4)) for _ in range(3)]
    gammas = {}
    solve_ot(feats, lambda a, b, cfg, G: compute_transport_map(a, b, cfg, G=G),
             dict(PARAMS, growth_iters=1), gammas, days=[0, 1, 2],
             g_est=[np.ones(9)] * 2)
    assert set(gammas) == {"0_1", "1_2"}
    stacked = np.stack(feats, axis=1)  # (9, 3, 4)
    idx = np.tile(np.arange(9)[:, None], (1, 3))
    loss = get_total_ot_loss(stacked, idx, gammas)
    assert np.isfinite(loss) and loss > 0
