"""Unbalanced entropic optimal transport — one log-domain Sinkhorn engine.

Replaces BOTH native/OT paths of the reference with a single solver family:
the training-time centroid coupling (SpaDOT/utils/OT_loss/ot_solvers.py:95-121
+ the C++ libot.so inner loops, ot_func.cpp:587-930) and the analyze-stage
full-cell transport maps (the external `wot` package,
_analyze_utils.py:108-138).

Mathematical note (the TPU-native re-design). The reference iterates scaled
variables a, b with kernel K = exp((u ⊕ v − C)/ε) and absorbs a, b into the
duals u, v whenever they exceed τ (ot_func.cpp:792-819). Writing the true
duals f = u + ε·log a, g = v + ε·log b, its update

    a = (p / K(b·dy))^α1 · exp(−u/(λ1+ε)),  α1 = λ1/(λ1+ε)

collapses to the absorption-free log-domain recursion

    f = α1 · (ε·log p − lse_row),  lse_row_i = ε·logsumexp_j((g_j − C_ij)/ε + log dy_j)
    g = α2 · (ε·log q − lse_col),  lse_col_j = ε·logsumexp_i((f_i − C_ij)/ε + log dx_i)

(the u-dependence cancels because α1 + ε/(λ1+ε) = 1). The ε-scaling ladder,
duality-gap stopping rule on the final stage and dual-evolution proxy on
earlier stages (ot_solvers.py:217-262,421-424) are preserved exactly, so the
solver matches the reference's convergence semantics while every iteration is
two fused row/column logsumexp reductions — ideal for the VPU/MXU and for the
Pallas kernel in sinkhorn_pallas.py.

Three interchangeable backends (differentially tested against each other):
  - "numpy": float64 host reference (used for the tiny in-training centroid
    couplings, ~k×k, where device dispatch would dominate);
  - "jax": jitted XLA/Pallas path for large full-cell problems on TPU;
  - "cpu": the native C++ library (spadot_tpu/native), mirroring the
    reference's shipped-.so capability.
"""
import numpy as np

EPSILON_SCALINGS = 5


def _stage_epsilons(epsilon, epsilon0):
    scale_factor = np.exp(-np.log(epsilon) / EPSILON_SCALINGS)
    eps_i = epsilon0 * scale_factor
    out = []
    for _ in range(EPSILON_SCALINGS + 1):
        eps_i = eps_i / scale_factor
        out.append(eps_i)
    return out  # geometric ladder epsilon0 -> epsilon0*epsilon


# ---------------------------------------------------------------------------
# numpy float64 reference backend
# ---------------------------------------------------------------------------

def _lse_rows(M):
    m = np.max(M, axis=1, keepdims=True)
    return (m + np.log(np.sum(np.exp(M - m), axis=1, keepdims=True)))[:, 0]


def sinkhorn_duality_gap_np(
    C, G, lambda1, lambda2, epsilon, batch_size, tolerance, epsilon0,
    max_iter, profiling=False, **ignored,
):
    """float64 log-domain solver with the duality-gap guarantee.

    Mirrors optimal_transport_duality_gap (ot_solvers.py:164-449): same
    marginals (p = G, q = mean(G)·1), ε ladder, per-stage thresholds, and
    returns R / J.
    """
    C = np.asarray(C, dtype=np.float64)
    I, J = C.shape
    dx, dy = np.ones(I) / I, np.ones(J) / J
    p = np.asarray(G, dtype=np.float64)
    q = np.ones(J) * np.average(p)
    log_p, log_q = np.log(p), np.log(q)
    log_dx, log_dy = np.log(dx), np.log(dy)

    f = np.zeros(I)
    g = np.zeros(J)
    current_iter = 0
    R = None
    duality_gap = np.inf

    for e, eps_i in enumerate(_stage_epsilons(epsilon, epsilon0)):
        final = e == EPSILON_SCALINGS
        alpha1 = lambda1 / (lambda1 + eps_i)
        alpha2 = lambda2 / (lambda2 + eps_i)
        threshold = tolerance if final else 1e-6
        inner = batch_size if final else 5
        duality_gap = np.inf
        while duality_gap > threshold:
            for _ in range(inner):
                f_old, g_old = f, g
                f = alpha1 * (
                    eps_i * log_p
                    - eps_i * _lse_rows((g[None, :] - C) / eps_i + log_dy[None, :])
                )
                g = alpha2 * (
                    eps_i * log_q
                    - eps_i * _lse_rows(((f[:, None] - C) / eps_i + log_dx[:, None]).T)
                )
                f_prev, g_prev = f_old, g_old
                current_iter += 1
            if current_iter >= max_iter:
                print("Warning: reached max_iter with duality gap above threshold; returning")
                R = np.exp((f[:, None] + g[None, :] - C) / eps_i)
                return R / J
            if final:
                R = np.exp((f[:, None] + g[None, :] - C) / eps_i)
                duality_gap = _duality_gap_np(
                    C, R, f, g, p, q, dx, dy, eps_i, lambda1, lambda2
                )
            else:
                duality_gap = max(
                    _dual_evolution_gap_np(f, f_prev, eps_i),
                    _dual_evolution_gap_np(g, g_prev, eps_i),
                )
        if profiling:  # ot_config['profiling'] parity (ot_solvers.py:244-245)
            print(f"sinkhorn stage {e}: eps={eps_i:.4f} iters={current_iter} "
                  f"gap={duality_gap:.3e}")
    if np.isnan(duality_gap):
        import os, time

        dump = os.path.join("/tmp", f"spadot_ot_overflow_{int(time.time())}.npz")
        np.savez(dump, C=C, G=np.asarray(G), f=f, g=g)
        raise RuntimeError(
            f"Overflow encountered in duality gap computation (inputs: {dump})"
        )
    return R / J


def _dual_evolution_gap_np(f, f_prev, eps):
    """||e^{f/eps} - e^{f_prev/eps}|| / (1 + ||e^{f/eps}||), computed with the
    shared max subtracted from both exponents — identical value (numerator
    and denominator scale by the same e^{-m}), immune to overflow."""
    m = max(np.max(f), np.max(f_prev)) / eps
    ea = np.exp(f / eps - m)
    eo = np.exp(f_prev / eps - m)
    return np.linalg.norm(ea - eo) / (np.exp(-m) + np.linalg.norm(ea))


def _duality_gap_np(C, R, f, g, p, q, dx, dy, eps, lambda1, lambda2):
    """(primal - dual)/|primal| per ot_solvers.py:124-158 with _K=exp(-C/eps)."""
    I, J = C.shape
    Kbar = np.exp(-C / eps)
    with np.errstate(divide="ignore", invalid="ignore"):
        RlogR = R * np.nan_to_num(np.log(R))
    fdiv1 = lambda1 * np.sum(dx * (_xlogx_ratio(R @ dy, p)))
    fdiv2 = lambda2 * np.sum(dy * (_xlogx_ratio(R.T @ dx, q)))
    primal = fdiv1 + fdiv2 + (eps * np.sum(RlogR - R + Kbar) + np.sum(R * C)) / (I * J)
    dual = (
        -lambda1 * np.sum(p * dx * (np.exp(-f / lambda1) - 1.0))
        - lambda2 * np.sum(q * dy * (np.exp(-g / lambda2) - 1.0))
        - eps * np.sum(R - Kbar) / (I * J)
    )
    return (primal - dual) / abs(primal)


def _xlogx_ratio(x, pref):
    """x*log(x/p) - x + p, with 0*log 0 = 0."""
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(x > 0, x * np.log(x / pref), 0.0)
    return t - x + pref


# ---------------------------------------------------------------------------
# JAX backend
# ---------------------------------------------------------------------------

def _dual_evolution_gap_jnp(f, f_prev, eps):
    """Overflow-proof version of the early-stage proxy (see numpy twin)."""
    import jax.numpy as jnp

    m = jnp.maximum(jnp.max(f), jnp.max(f_prev)) / eps
    ea = jnp.exp(f / eps - m)
    eo = jnp.exp(f_prev / eps - m)
    return jnp.linalg.norm(ea - eo) / (jnp.exp(-m) + jnp.linalg.norm(ea))


def _jax_solver(C, p, q, lambda1, lambda2, epsilon, epsilon0, batch_size,
                tolerance, max_iter):
    import jax
    import jax.numpy as jnp
    from jax.scipy.special import logsumexp

    I, J = C.shape
    dtype = C.dtype
    dx = jnp.full((I,), 1.0 / I, dtype)
    dy = jnp.full((J,), 1.0 / J, dtype)
    log_p, log_q = jnp.log(p), jnp.log(q)
    log_dx, log_dy = jnp.log(dx), jnp.log(dy)
    # float32 cannot certify a 1e-8 relative duality gap; clamp per-dtype.
    eff_tol = max(float(tolerance), 1e-6) if dtype == jnp.float32 else float(tolerance)

    def half_updates(f, g, eps_i, alpha1, alpha2):
        lse_r = eps_i * logsumexp((g[None, :] - C) / eps_i + log_dy[None, :], axis=1)
        f = alpha1 * (eps_i * log_p - lse_r)
        lse_c = eps_i * logsumexp((f[:, None] - C) / eps_i + log_dx[:, None], axis=0)
        g = alpha2 * (eps_i * log_q - lse_c)
        return f, g

    def duality_gap_final(f, g, eps_i):
        logR = (f[:, None] + g[None, :] - C) / eps_i
        R = jnp.exp(logR)
        Kbar = jnp.exp(-C / eps_i)
        RlogR = R * logR  # stable: R->0 => R*logR->0
        rm = R @ dy
        cm = R.T @ dx
        t1 = jnp.where(rm > 0, rm * jnp.log(rm / p), 0.0) - rm + p
        t2 = jnp.where(cm > 0, cm * jnp.log(cm / q), 0.0) - cm + q
        primal = (
            lambda1 * jnp.sum(dx * t1)
            + lambda2 * jnp.sum(dy * t2)
            + (eps_i * jnp.sum(RlogR - R + Kbar) + jnp.sum(R * C)) / (I * J)
        )
        dual = (
            -lambda1 * jnp.sum(p * dx * (jnp.exp(-f / lambda1) - 1.0))
            - lambda2 * jnp.sum(q * dy * (jnp.exp(-g / lambda2) - 1.0))
            - eps_i * jnp.sum(R - Kbar) / (I * J)
        )
        return (primal - dual) / jnp.abs(primal)

    f = jnp.zeros((I,), dtype)
    g = jnp.zeros((J,), dtype)
    it0 = jnp.zeros((), jnp.int32)
    eps_ladder = _stage_epsilons(epsilon, epsilon0)
    # Plan epsilon: the final-stage value, unless the iteration budget dies in
    # an earlier stage — then the plan must be exponentiated at THAT stage's
    # epsilon (numpy twin :103-106; reference bail ot_func.cpp:821-824).
    eps_plan = jnp.asarray(eps_ladder[-1], dtype)
    exhausted = jnp.zeros((), bool)

    for e, eps_i in enumerate(eps_ladder):
        final = e == EPSILON_SCALINGS
        alpha1 = lambda1 / (lambda1 + eps_i)
        alpha2 = lambda2 / (lambda2 + eps_i)
        threshold = eff_tol if final else 1e-6
        inner = int(batch_size) if final else 5

        def cond(carry):
            _f, _g, gap, it = carry
            return jnp.logical_and(gap > threshold, it < max_iter)

        def body(carry, eps_i=eps_i, alpha1=alpha1, alpha2=alpha2, final=final, inner=inner):
            _f, _g, gap, it = carry

            def one(i, fg):
                fo, go, _, _ = fg
                fn, gn = half_updates(fo, go, eps_i, alpha1, alpha2)
                return (fn, gn, fo, go)

            fn, gn, fprev, gprev = jax.lax.fori_loop(0, inner, one, (_f, _g, _f, _g))
            if final:
                gap = duality_gap_final(fn, gn, eps_i)
            else:
                gap = jnp.maximum(
                    _dual_evolution_gap_jnp(fn, fprev, eps_i),
                    _dual_evolution_gap_jnp(gn, gprev, eps_i),
                )
            return (fn, gn, gap, it + inner)

        f, g, _, it0 = jax.lax.while_loop(
            cond, body, (f, g, jnp.asarray(jnp.inf, dtype), it0)
        )
        hit = jnp.logical_and(jnp.logical_not(exhausted), it0 >= max_iter)
        eps_plan = jnp.where(hit, jnp.asarray(eps_i, dtype), eps_plan)
        exhausted = jnp.logical_or(exhausted, hit)

    R = jnp.exp((f[:, None] + g[None, :] - C) / eps_plan)
    return R / J


_jax_solver_jit = None


def sinkhorn_duality_gap_jax(C, G, lambda1, lambda2, epsilon, batch_size,
                             tolerance, epsilon0, max_iter, **ignored):
    import jax
    import jax.numpy as jnp

    global _jax_solver_jit
    if _jax_solver_jit is None:
        _jax_solver_jit = jax.jit(
            _jax_solver,
            static_argnames=("lambda1", "lambda2", "epsilon", "epsilon0",
                             "batch_size", "tolerance", "max_iter"),
        )
    C = jnp.asarray(C)
    p = jnp.asarray(G, C.dtype)
    q = jnp.full((C.shape[1],), jnp.mean(p), C.dtype)
    return _jax_solver_jit(
        C, p, q,
        lambda1=float(lambda1), lambda2=float(lambda2), epsilon=float(epsilon),
        epsilon0=float(epsilon0), batch_size=int(batch_size),
        tolerance=float(tolerance), max_iter=int(max_iter),
    )


# ---------------------------------------------------------------------------
# Dispatcher (parity with compute_transport_map, ot_solvers.py:95-121)
# ---------------------------------------------------------------------------

def _robust_cost_scale(C):
    """Median cost (the reference's normalizer, ot_solvers.py:104), guarded
    against degenerate inputs: if the median is vanishingly small relative to
    the largest cost (near-duplicate point clouds — e.g. early-training
    centroid collapse), fall back to the mean so C/s stays bounded."""
    med = float(np.median(C))
    cmax = float(np.max(C))
    if cmax <= 0:
        return 1.0
    if med <= 1e-9 * cmax:
        mean = float(np.mean(C))
        return mean if mean > 0 else 1.0
    return med

def sinkhorn_fixed_iters(
    C, G, lambda1, lambda2, epsilon, epsilon0, scaling_iter=3000,
    inner_iter_max=50, extra_iter=1000, **ignored,
):
    """Fixed-iteration variant with warm-started exponential epsilon decay —
    the capability of the reference's transport_stablev2
    (ot_solvers.py:452-531): epsilon_i = (epsilon0-epsilon)*exp(-n) + epsilon
    advanced every `inner_iter_max` iterations, then `extra_iter` polish
    iterations at the final epsilon. Log-domain, so the tau-absorption
    bookkeeping of the original is unnecessary.
    """
    C = np.asarray(C, dtype=np.float64)
    I, J = C.shape
    dx, dy = np.ones(I) / I, np.ones(J) / J
    p = np.asarray(G, dtype=np.float64)
    q = np.ones(J) * np.average(p)
    log_p, log_q = np.log(p), np.log(q)
    log_dx, log_dy = np.log(dx), np.log(dy)
    f, g = np.zeros(I), np.zeros(J)

    def eps_at(n):
        return (epsilon0 - epsilon) * np.exp(-n) + epsilon

    eps_index = 0
    since_adjust = 0
    eps_i = epsilon0
    for _ in range(int(scaling_iter)):
        a1 = lambda1 / (lambda1 + eps_i)
        a2 = lambda2 / (lambda2 + eps_i)
        f = a1 * (eps_i * log_p - eps_i * _lse_rows((g[None, :] - C) / eps_i + log_dy[None, :]))
        g = a2 * (eps_i * log_q - eps_i * _lse_rows(((f[:, None] - C) / eps_i + log_dx[:, None]).T))
        since_adjust += 1
        if since_adjust == inner_iter_max:
            eps_index += 1
            since_adjust = 0
            eps_i = eps_at(eps_index)
    a1 = lambda1 / (lambda1 + eps_i)
    a2 = lambda2 / (lambda2 + eps_i)
    for _ in range(int(extra_iter)):
        f = a1 * (eps_i * log_p - eps_i * _lse_rows((g[None, :] - C) / eps_i + log_dy[None, :]))
        g = a2 * (eps_i * log_q - eps_i * _lse_rows(((f[:, None] - C) / eps_i + log_dx[:, None]).T))
    R = np.exp((f[:, None] + g[None, :] - C) / eps_i)
    return R / J


def sinkhorn_balanced(C, epsilon, n_iter=2000, tol=1e-9):
    """Plain balanced entropic OT between uniform marginals (the capability
    of the reference's POT 'sinkhorn' method, ot_solvers.py:82-83), solved in
    the log domain."""
    C = np.asarray(C, dtype=np.float64)
    I, J = C.shape
    log_a = np.full(I, -np.log(I))
    log_b = np.full(J, -np.log(J))
    f, g = np.zeros(I), np.zeros(J)
    for _ in range(int(n_iter)):
        f_new = epsilon * (log_a - _lse_rows((g[None, :] - C) / epsilon))
        g_new = epsilon * (log_b - _lse_rows(((f_new[:, None] - C) / epsilon).T))
        if max(np.abs(f_new - f).max(), np.abs(g_new - g).max()) < tol:
            f, g = f_new, g_new
            break
        f, g = f_new, g_new
    return np.exp((f[:, None] + g[None, :] - C) / epsilon)


def solve_ot(feats, ot_solver, ot_config, gammas, days, g_est):
    """Sequential transport over consecutive days (parity: ot_solvers.py:39-46):
    gamma_i couples feats[i] -> feats[i+1] with growth g_est[i]^delta_days."""
    for i in range(len(feats) - 1):
        delta_days = float(days[i + 1]) - float(days[i])
        g = np.power(np.asarray(g_est[i], dtype=np.float64), delta_days)
        gammas[f"{i}_{i + 1}"] = ot_solver(feats[i], feats[i + 1], ot_config, G=g)
    return gammas


def get_total_ot_loss(feats, indices, gammas):
    """Mean transport cost across consecutive-day pairs on sampled submatrices
    of the plans (parity: ot_solvers.py:49-69, without the torch/cuda detour).

    feats: (bsz, days, dim) array; indices: (bsz, days) int row indices into
    each day's plan axis.
    """
    feats = np.asarray(feats, dtype=np.float64)
    indices = np.asarray(indices)
    days = feats.shape[1]
    total = 0.0
    from scipy.spatial.distance import cdist

    for i in range(days - 1):
        gamma = np.asarray(gammas[f"{i}_{i+1}"], dtype=np.float64)
        sub = gamma[indices[:, i]][:, indices[:, i + 1]]
        with np.errstate(divide="ignore", invalid="ignore"):
            sub = sub / sub.sum(axis=1, keepdims=True)
        sub = np.nan_to_num(sub, nan=0.0, posinf=0.0, neginf=0.0)
        cost = cdist(feats[:, i], feats[:, i + 1], metric="euclidean")
        total += np.mean(sub * cost)
    return total / (days - 1)


def compute_transport_map_pot(a, b, config, C=None):
    """Method-switched plain-OT entry (capability of ot_solvers.py:72-92's
    POT path, self-contained): 'sinkhorn' = balanced entropic,
    'unbalanced' = the duality-gap engine, 'emd' = exact LP via scipy."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if C is None:
        from scipy.spatial.distance import cdist

        C = cdist(a, b, metric="sqeuclidean")
    method = config.get("method", "sinkhorn")
    if method == "sinkhorn":
        return sinkhorn_balanced(C, config["epsilon"])
    if method == "unbalanced":
        return sinkhorn_duality_gap_np(
            C / _robust_cost_scale(C), np.ones(C.shape[0]),
            lambda1=config.get("lambda", config.get("lambda1", 0.1)),
            lambda2=config.get("lambda", config.get("lambda2", 5.0)),
            epsilon=config["epsilon"], batch_size=config.get("batch_size", 5),
            tolerance=config.get("tolerance", 1e-8),
            epsilon0=config.get("epsilon0", 1),
            max_iter=config.get("max_iter", 1e7),
        )
    if method == "emd":
        return _emd_lp(C)
    raise ValueError(f"unknown OT method {method!r}")


def _emd_lp(C):
    """Exact earth-mover distance plan between uniform marginals via linprog."""
    from scipy.optimize import linprog
    from scipy.sparse import lil_matrix

    I, J = C.shape
    A = lil_matrix((I + J, I * J))
    for i in range(I):
        A[i, i * J : (i + 1) * J] = 1.0
    for j in range(J):
        A[I + j, j::J] = 1.0
    bvec = np.concatenate([np.full(I, 1.0 / I), np.full(J, 1.0 / J)])
    res = linprog(C.ravel(), A_eq=A.tocsr()[:-1], b_eq=bvec[:-1],
                  bounds=(0, None), method="highs")
    if not res.success:
        raise RuntimeError(f"EMD LP failed: {res.message}")
    return res.x.reshape(I, J)


def compute_transport_map(a, b, config, C=None, G=None, backend=None):
    """Transport plan between two point clouds (rows of a -> rows of b).

    Cost = squared euclidean distances normalized by their median
    (ot_solvers.py:100-104). Growth iterations re-estimate the row marginal
    from the previous plan's row sums; like the reference (ot_solvers.py:121,
    `return gammas[0]`) the FIRST iteration's plan — computed with the input
    growth vector — is the one returned, so subsequent iterations are not
    computed here at all.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if C is None:
        from scipy.spatial.distance import cdist

        C = cdist(a, b, metric="sqeuclidean")
        C = C / _robust_cost_scale(C)
    G = np.ones(C.shape[0]) if G is None else np.asarray(G, dtype=np.float64)
    backend = backend or config.get("backend", "numpy")
    kwargs = dict(
        lambda1=config["lambda1"], lambda2=config["lambda2"],
        epsilon=config["epsilon"], batch_size=config["batch_size"],
        tolerance=config["tolerance"], epsilon0=config["epsilon0"],
        max_iter=config["max_iter"],
    )
    if backend == "jax":
        return np.asarray(sinkhorn_duality_gap_jax(C, G, **kwargs))
    if backend == "cpu":
        from spadot_tpu.native.ot_cpu import sinkhorn_duality_gap_cpu

        return sinkhorn_duality_gap_cpu(C, G, **kwargs)
    return sinkhorn_duality_gap_np(
        C, G, profiling=bool(config.get("profiling", False)), **kwargs
    )
