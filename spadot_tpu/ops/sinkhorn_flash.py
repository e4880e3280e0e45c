"""Factored (flash-style) unbalanced Sinkhorn: cost-matrix-free transport.

For full-cell transport maps between large timepoints (analyze stage;
BASELINE.json config 5 targets 100k+ spots/timepoint) the (I, J) cost matrix
does not fit in HBM. Because the cost is a squared euclidean distance of
latent factors,

    C_ij = (|x_i|^2 + |y_j|^2 - 2 x_i . y_j) / s,

every Sinkhorn quantity is computable from X0 (I, d), X1 (J, d) in tiles:
each half-iteration streams column (row) blocks through a running
max/sum logsumexp — the same online-softmax recurrence flash attention
uses — with the block cost produced by one MXU matmul and fused into the
exponential. Memory is O(I + J + block^2); the full plan is never built
unless explicitly requested.

This file is the XLA implementation (lax.scan over blocks — XLA fuses the
matmul + exp + reduction per block); ops/sinkhorn_pallas.py provides the
hand-fused Pallas kernel for the same recurrence. Semantics (epsilon ladder,
thresholds, duality gap) match ops/sinkhorn.py exactly and are differentially
tested against it.
"""
import math

import numpy as np

from spadot_tpu.ops.sinkhorn import EPSILON_SCALINGS, _stage_epsilons


def cost_median_factored(X0, X1, scale_samples=1 << 21, seed=0):
    """Median of the pairwise sqeuclidean cost, exact when IJ is small,
    sampled (~2M pairs) otherwise — the reference normalizes C by its median
    (ot_solvers.py:102-104); at 100k x 100k an exact median would need the
    full matrix, so a sampled estimate (rel. error ~1e-3) is used."""
    from spadot_tpu.ops.sinkhorn import _robust_cost_scale

    I, J = X0.shape[0], X1.shape[0]
    if I * J <= scale_samples:
        from scipy.spatial.distance import cdist

        return _robust_cost_scale(cdist(X0, X1, "sqeuclidean"))
    rng = np.random.default_rng(seed)
    ii = rng.integers(0, I, size=scale_samples)
    jj = rng.integers(0, J, size=scale_samples)
    d = ((X0[ii] - X1[jj]) ** 2).sum(axis=1)
    return _robust_cost_scale(d)


def _block_lse_rows(X0, X1, g, log_dy, inv_eps_s, sq0, sq1, block):
    """lse_i = log sum_j exp((g_j - C_ij)/eps + log dy_j), streamed over
    column blocks with a running (max, sum) accumulator."""
    import jax
    import jax.numpy as jnp

    I = X0.shape[0]
    J = X1.shape[0]
    nb = (J + block - 1) // block
    Jp = nb * block
    pad = Jp - J
    X1p = jnp.pad(X1, ((0, pad), (0, 0)))
    addp = jnp.pad(g * 1.0 + log_dy - sq1 * inv_eps_s, (0, pad),
                   constant_values=-jnp.inf)
    X1b = X1p.reshape(nb, block, -1)
    addb = addp.reshape(nb, block)

    def body(carry, blk):
        m, s = carry
        X1_blk, add_blk = blk
        # (I, block) block logits: -C/eps + g/eps + log dy
        dot = X0 @ X1_blk.T  # MXU
        logits = (2.0 * inv_eps_s) * dot - inv_eps_s * sq0[:, None] + add_blk[None, :]
        bm = jnp.max(logits, axis=1)
        new_m = jnp.maximum(m, bm)
        s = s * jnp.exp(m - new_m) + jnp.sum(
            jnp.exp(logits - new_m[:, None]), axis=1
        )
        return (new_m, s), None

    m0 = jnp.full((I,), -jnp.inf, X0.dtype)
    s0 = jnp.zeros((I,), X0.dtype)
    (m, s), _ = jax.lax.scan(body, (m0, s0), (X1b, addb))
    return m + jnp.log(s)


def _make_solver(I, J, d, dtype, lambda1, lambda2, epsilon, epsilon0,
                 batch_size, tolerance, max_iter, block, use_pallas=False):
    import jax
    import jax.numpy as jnp

    eff_tol = max(float(tolerance), 1e-6) if dtype == np.float32 else float(tolerance)

    pallas_lse = {}
    if use_pallas:
        import os

        from spadot_tpu.ops.sinkhorn_pallas import make_lse_rows_pallas

        # tile shape of the fused LSE kernel: (256, 512) measured-safe
        # defaults; SPADOT_LSE_TILES="bi,bj" overrides for A/B runs (at
        # 102k x 102k the default grid is ~80k steps/sweep — taller tiles
        # amortize grid/DMA overhead exactly as they did for flash3)
        ti, tj = 256, 512
        env_tiles = os.environ.get("SPADOT_LSE_TILES")
        if env_tiles:
            ti, tj = (int(v) for v in env_tiles.split(","))
        for eps_i in _stage_epsilons(epsilon, epsilon0):
            pallas_lse[eps_i] = make_lse_rows_pallas(
                1.0 / eps_i, block_i=min(block, ti), block_j=min(block, tj)
            )

    def stage_chunk(X0, X1, p, q, inv_s, f, g, gp, it, it_hi, *, stage_e):
        """Run ONE epsilon stage's Sinkhorn loop for at most (it_hi - it)
        iterations (gap still checked every `inner` iterations — chunking
        moves dispatch boundaries, never semantics). The host driver in
        `sinkhorn_factored` loops this until the stage converges or the
        GLOBAL iteration budget `max_iter` is spent: a single unbounded
        while_loop dispatch at 100k x 100k ran for minutes and got the
        remote TPU worker killed ('TPU worker process crashed',
        docs/tpu_logs/analyze_atlas_ot.log) while a 60-iteration bounded
        dispatch of the same program completes in ~1 min — long-running
        single XLA executions are the failure mode, not the kernel."""
        sq0 = jnp.sum(X0 * X0, axis=1)
        sq1 = jnp.sum(X1 * X1, axis=1)
        # factors pre-scaled by sqrt(inv_s): the cost becomes a plain
        # sqeuclidean of the scaled factors, so per-stage kernel scalars
        # (1/eps) are static
        rs = jnp.sqrt(inv_s)
        X0s, X1s = X0 * rs, X1 * rs
        sq0s, sq1s = sq0 * inv_s, sq1 * inv_s
        log_p = jnp.log(p)
        log_q = jnp.log(q)
        log_dx = jnp.full((I,), -math.log(I), dtype)
        log_dy = jnp.full((J,), -math.log(J), dtype)

        def half(f, g, eps_i, a1, a2):
            inv_eps = 1.0 / eps_i
            if use_pallas:
                lse = pallas_lse[eps_i]
                add_r = g * inv_eps + log_dy - sq1s * inv_eps
                lse_r = lse(X0s, sq0s, X1s, add_r)
                f = a1 * (eps_i * log_p - eps_i * lse_r)
                add_c = f * inv_eps + log_dx - sq0s * inv_eps
                lse_c = lse(X1s, sq1s, X0s, add_c)
                g = a2 * (eps_i * log_q - eps_i * lse_c)
                return f, g
            lse_r = _block_lse_rows(
                X0s, X1s, g * inv_eps, log_dy, inv_eps, sq0s, sq1s, block
            )
            f = a1 * (eps_i * log_p - eps_i * lse_r)
            lse_c = _block_lse_rows(
                X1s, X0s, f * inv_eps, log_dx, inv_eps, sq1s, sq0s, block
            )
            g = a2 * (eps_i * log_q - eps_i * lse_c)
            return f, g

        def gap_blocks(f, g, eps_i):
            """duality-gap ingredients streamed over row blocks."""
            inv_eps_s = inv_s / eps_i
            nb = (I + block - 1) // block
            Ip = nb * block
            pad = Ip - I
            X0p = jnp.pad(X0, ((0, pad), (0, 0)))
            fp = jnp.pad(f, (0, pad), constant_values=-jnp.inf)
            sq0p = jnp.pad(sq0, (0, pad))
            valid = jnp.pad(jnp.ones((I,), dtype), (0, pad))
            X0b = X0p.reshape(nb, block, -1)
            fb = fp.reshape(nb, block)
            sq0b = sq0p.reshape(nb, block)
            validb = valid.reshape(nb, block)

            def body(carry, blk):
                ent_a, cost_a, rk_a, colm = carry
                Xb, f_blk, sqb, v_blk = blk
                dot = Xb @ X1.T  # (block, J)
                Cb = (sqb[:, None] + sq1[None, :] - 2.0 * dot) * inv_s
                logR = (f_blk[:, None] + g[None, :] - Cb) / eps_i
                R = jnp.exp(logR)
                Kb = jnp.exp(-Cb / eps_i) * v_blk[:, None]  # mask padded rows
                ent_a += jnp.sum(jnp.where(R > 0, R * logR, 0.0) - R + Kb)
                cost_a += jnp.sum(R * Cb)
                rk_a += jnp.sum(R - Kb)
                colm = colm + R.sum(axis=0) / I
                rowm_b = R.sum(axis=1) / J
                return (ent_a, cost_a, rk_a, colm), rowm_b

            init = (
                jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.zeros((), dtype),
                jnp.zeros((J,), dtype),
            )
            (ent, cost, rk, colm), rowm_b = jax.lax.scan(
                body, init, (X0b, fb, sq0b, validb)
            )
            rowm = rowm_b.reshape(-1)[:I]
            return ent, cost, rk, colm, rowm

        def gap_final(f, g, eps_i):
            ent, cost, rk, colm, rowm = gap_blocks(f, g, eps_i)
            t1 = jnp.where(rowm > 0, rowm * jnp.log(rowm / p), 0.0) - rowm + p
            t2 = jnp.where(colm > 0, colm * jnp.log(colm / q), 0.0) - colm + q
            # float: at 100k x 100k the entry count (~1e10) overflows the
            # int32 a python-int operand would be parsed as under jit
            IJ = float(I) * float(J)
            primal = (
                lambda1 * jnp.sum(t1) / I
                + lambda2 * jnp.sum(t2) / J
                + (eps_i * ent + cost) / IJ
            )
            dual = (
                -lambda1 * jnp.sum(p * (jnp.exp(-f / lambda1) - 1.0)) / I
                - lambda2 * jnp.sum(q * (jnp.exp(-g / lambda2) - 1.0)) / J
                - eps_i * rk / IJ
            )
            return (primal - dual) / jnp.abs(primal)

        eps_i, threshold, final = stage_params[stage_e]
        a1 = lambda1 / (lambda1 + eps_i)
        a2 = lambda2 / (lambda2 + eps_i)
        inner = int(batch_size) if final else 5

        def cond(c):
            _f, _g, gp_c, it_c = c
            return jnp.logical_and(gp_c > threshold, it_c < it_hi)

        def body(c):
            _f, _g, gp_c, it_c = c

            def one(i, fg):
                fo, go, _, _ = fg
                fn, gn = half(fo, go, eps_i, a1, a2)
                return (fn, gn, fo, go)

            fn, gn, fprev, gprev = jax.lax.fori_loop(
                0, inner, one, (_f, _g, _f, _g)
            )
            if final:
                gp_n = gap_final(fn, gn, eps_i)
            else:
                from spadot_tpu.ops.sinkhorn import _dual_evolution_gap_jnp

                gp_n = jnp.maximum(
                    _dual_evolution_gap_jnp(fn, fprev, eps_i),
                    _dual_evolution_gap_jnp(gn, gprev, eps_i),
                )
            return (fn, gn, gp_n, it_c + inner)

        return jax.lax.while_loop(cond, body, (f, g, gp, it))

    # (eps_i, convergence threshold, is-final-stage) per epsilon-ladder stage;
    # the iteration counter is carried ACROSS stages (max_iter is a global
    # budget, matching the single-dispatch semantics this replaces)
    stage_params = [
        (eps_i, eff_tol if e == EPSILON_SCALINGS else 1e-6,
         e == EPSILON_SCALINGS)
        for e, eps_i in enumerate(_stage_epsilons(epsilon, epsilon0))
    ]
    return stage_chunk, stage_params


def _drive_chunks(stage_chunk, stage_params, X0d, X1d, pd, qd, invs_d, *,
                  dtype, I, J, max_iter, chunk_iters=None, out_shardings=None,
                  f0=None, g0=None, verbose=None):
    """Host loop over bounded stage dispatches (see stage_chunk's docstring:
    unbounded single dispatches at 100k x 100k get the remote TPU worker
    killed). `chunk_iters=None` sizes one dispatch by the problem area so a
    chunk stays ~tens of seconds; the gap/iteration scalars sync to host
    once per chunk — negligible next to the chunk itself. Convergence
    semantics are the single-dispatch while_loop's exactly: the gap is
    checked every `inner` iterations, max_iter is a global budget carried
    across epsilon stages, and a non-finite gap stops the stage (NaN fails
    the `gp > threshold` cond both in-device and on host).

    f0/g0 warm-start the dual potentials (growth iterations re-solve with a
    new row marginal only — the previous duals are near the new fixed point
    and the gap criterion guarantees the same answer). `verbose` (default:
    the SPADOT_OT_VERBOSE env) prints one stderr line per chunk so a
    multi-hour 100k x 100k solve is observable.

    Plateau bail: the final stage's relative duality gap is a (primal −
    dual)/|primal| difference of large near-cancelling f32 sums — at
    100k × 100k its floor is ~3e-4, far above the 1e-6 threshold, and the
    measured stall is a bitwise f32 fixed point (gap frozen at 3.340e-04
    from iteration 125 through 16 000+, docs/tpu_logs/analyze_atlas_ot2.log
    — an hour of wasted device time before the step timeout). When the gap
    fails to improve by ≥0.1 % relative over SPADOT_OT_PLATEAU_CHUNKS
    consecutive chunks (default 8; 0 disables), the stage bails with a
    warning and the duals at the fixed point are accepted — they ARE the
    f32 optimum; only the threshold was unreachable."""
    import functools
    import os
    import sys
    import time

    import jax
    import jax.numpy as jnp

    if verbose is None:
        verbose = bool(int(os.environ.get("SPADOT_OT_VERBOSE", "0") or 0))
    if chunk_iters is None:
        chunk_iters = int(
            min(10_000, max(25, 3.0e11 / (float(I) * float(J) + 1.0)))
        )
    jit_kw = {} if out_shardings is None else {"out_shardings": out_shardings}
    fns = [
        jax.jit(functools.partial(stage_chunk, stage_e=e), **jit_kw)
        for e in range(len(stage_params))
    ]
    f = jnp.zeros((I,), dtype) if f0 is None else jnp.asarray(f0, dtype)
    g = jnp.zeros((J,), dtype) if g0 is None else jnp.asarray(g0, dtype)
    # AOT-precompile the ladder's stage executables CONCURRENTLY: lazily,
    # the 102k x 102k cold start compiles 6 near-identical programs in
    # sequence at ~3 min each over the remote-TPU tunnel (~18 min before
    # the first Sinkhorn iteration runs — docs/tpu_logs analyze_atlas_ot2
    # cold window). Compilation is server/network-bound and releases the
    # GIL, so a thread pool overlaps it. Single-device path only: the
    # sharded variant's input shardings are committed on the arrays, and
    # AOT-from-ShapeDtypeStruct would compile for the default placement.
    if (
        len(fns) > 1 and out_shardings is None and f0 is None and g0 is None
        and os.environ.get("SPADOT_OT_PARALLEL_COMPILE", "1") != "0"
    ):
        try:
            import concurrent.futures as _cf

            sds = jax.ShapeDtypeStruct
            arg_shapes = (
                [sds(a.shape, a.dtype) for a in (X0d, X1d, pd, qd, invs_d)]
                + [sds((I,), dtype), sds((J,), dtype), sds((), dtype),
                   sds((), jnp.int32), sds((), jnp.int32)]
            )
            with _cf.ThreadPoolExecutor(max_workers=len(fns)) as ex:
                fns = list(
                    ex.map(lambda fn: fn.lower(*arg_shapes).compile(), fns)
                )
        except Exception as exc:  # pragma: no cover - fall back to lazy jit
            print(
                f"[sinkhorn_factored] parallel stage compile failed "
                f"({type(exc).__name__}: {exc}) — compiling lazily",
                file=sys.stderr, flush=True,
            )
    if out_shardings is not None:
        f = jax.device_put(f, out_shardings[0])
        g = jax.device_put(g, out_shardings[1])
    it = jnp.zeros((), jnp.int32)
    t_start = time.time()
    # the epsilon ladder is pure continuation (each stage warm-starts the
    # next; the optimum of the FINAL stage is what's returned, and the
    # unbalanced problem's optimum is unique) — with caller-provided duals
    # near that optimum, running the early large-eps stages would drag the
    # iterate back toward their fixed points, so skip straight to the last
    stages = (
        list(enumerate(stage_params))
        if f0 is None and g0 is None
        else [(len(stage_params) - 1, stage_params[-1])]
    )
    plateau_chunks = int(os.environ.get("SPADOT_OT_PLATEAU_CHUNKS", "8") or 0)
    for e, (eps_i, threshold, _final) in stages:
        gp = jnp.asarray(jnp.inf, dtype)
        best_gap, since_improve = float("inf"), 0
        while int(it) < max_iter:
            it_hi = jnp.asarray(
                min(int(it) + int(chunk_iters), max_iter), jnp.int32
            )
            t0 = time.time()
            f, g, gp, it = fns[e](X0d, X1d, pd, qd, invs_d, f, g, gp, it, it_hi)
            gp_h, it_h = float(gp), int(it)
            if verbose:
                print(
                    f"[sinkhorn_factored] stage {e}/{len(stage_params) - 1} "
                    f"eps={eps_i:.4g} it={it_h} gap={gp_h:.3e} "
                    f"(thr {threshold:.1e}) chunk {time.time() - t0:.1f}s "
                    f"total {time.time() - t_start:.0f}s",
                    file=sys.stderr, flush=True,
                )
            if not (gp_h > threshold):  # converged, or non-finite gap
                break
            if gp_h < best_gap * (1.0 - 1e-3):
                best_gap, since_improve = gp_h, 0
            else:
                since_improve += 1
                if plateau_chunks and since_improve >= plateau_chunks:
                    print(
                        f"[sinkhorn_factored] WARNING: stage {e} gap "
                        f"plateaued at {gp_h:.3e} (threshold {threshold:.1e} "
                        f"unreachable at this precision) — accepting the "
                        f"fixed-point duals after {since_improve} chunks / "
                        f"{it_h} iterations without ≥0.1% improvement",
                        file=sys.stderr, flush=True,
                    )
                    break
    return f, g


def sinkhorn_factored(
    X0, X1, G=None, *, lambda1=0.1, lambda2=5.0, epsilon=0.05, epsilon0=1.0,
    batch_size=5, tolerance=1e-8, max_iter=10_000_000, block=1024,
    dtype=np.float32, return_plan=True, use_pallas=None, chunk_iters=None,
    f0=None, g0=None,
    **ignored,
):
    """Cost-matrix-free unbalanced Sinkhorn between latent factor sets.

    Returns (R / J) like the dense engine when return_plan, else the dual
    potentials (f, g) and the cost scale — enough to reconstruct any block of
    the plan on demand: R_ij = exp((f_i + g_j - C_ij)/eps_final).
    f0/g0 warm-start the duals (see _drive_chunks).
    """
    import jax
    import jax.numpy as jnp

    X0 = np.asarray(X0, dtype=dtype)
    X1 = np.asarray(X1, dtype=dtype)
    I, J = X0.shape[0], X1.shape[0]
    s = cost_median_factored(X0, X1)
    G = np.ones(I) if G is None else np.asarray(G)
    q = np.full(J, G.mean())

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    stage_chunk, stage_params = _make_solver(
        I, J, X0.shape[1], dtype, float(lambda1), float(lambda2),
        float(epsilon), float(epsilon0), int(batch_size), float(tolerance),
        int(max_iter), int(block), use_pallas=bool(use_pallas),
    )
    f, g = _drive_chunks(
        stage_chunk, stage_params,
        jnp.asarray(X0), jnp.asarray(X1), jnp.asarray(G, dtype),
        jnp.asarray(q, dtype), jnp.asarray(1.0 / s, dtype),
        dtype=dtype, I=I, J=J, max_iter=int(max_iter),
        chunk_iters=chunk_iters, f0=f0, g0=g0,
    )
    eps_final = _stage_epsilons(epsilon, epsilon0)[-1]
    if not return_plan:
        return np.asarray(f), np.asarray(g), s, eps_final
    from scipy.spatial.distance import cdist

    C = cdist(X0, X1, "sqeuclidean") / s
    R = np.exp((np.asarray(f)[:, None] + np.asarray(g)[None, :] - C) / eps_final)
    return R / J


def sinkhorn_factored_sharded(
    X0, X1, G=None, *, mesh, lambda1=0.1, lambda2=5.0, epsilon=0.05,
    epsilon0=1.0, batch_size=5, tolerance=1e-8, max_iter=10_000_000,
    block=1024, dtype=np.float32, chunk_iters=None, f0=None, g0=None,
    **ignored,
):
    """Factored Sinkhorn with the source rows sharded over the mesh's `data`
    axis (SURVEY.md §5 "sharded Sinkhorn ... all-reduce of column marginals").

    The solver body is the same pure function as the single-device path;
    GSPMD partitions it: the row-logsumexp is embarrassingly row-parallel on
    the X0 shards, and the column-logsumexp's cross-shard combine lowers to
    the psum XLA inserts automatically. Returns the dual potentials
    (f, g, cost_scale, eps_final) — at sharded scales the plan is consumed
    through `plan_reductions`/`plan_block`.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    X0 = np.asarray(X0, dtype=dtype)
    X1 = np.asarray(X1, dtype=dtype)
    I, J = X0.shape[0], X1.shape[0]
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if I % n_dev:
        raise ValueError(f"row count {I} must divide the mesh size {n_dev}")
    s = cost_median_factored(X0, X1)
    G = np.ones(I) if G is None else np.asarray(G)
    q = np.full(J, G.mean())

    stage_chunk, stage_params = _make_solver(
        I, J, X0.shape[1], dtype, float(lambda1), float(lambda2),
        float(epsilon), float(epsilon0), int(batch_size), float(tolerance),
        int(max_iter), int(block), use_pallas=False,
    )
    axis = mesh.axis_names[0]
    row_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    X0_d = jax.device_put(jnp.asarray(X0), row_sh)
    X1_d = jax.device_put(jnp.asarray(X1), rep)
    p_d = jax.device_put(jnp.asarray(G, dtype), row_sh)
    q_d = jax.device_put(jnp.asarray(q, dtype), rep)
    f, g = _drive_chunks(
        stage_chunk, stage_params, X0_d, X1_d, p_d, q_d,
        jnp.asarray(1.0 / s, dtype),
        dtype=dtype, I=I, J=J, max_iter=int(max_iter),
        chunk_iters=chunk_iters, f0=f0, g0=g0,
        out_shardings=(row_sh, rep, rep, rep),
    )
    eps_final = _stage_epsilons(epsilon, epsilon0)[-1]
    return np.asarray(f), np.asarray(g), s, eps_final


def plan_reductions(f, g, X0, X1, s, eps_final, M1=None, block=1024):
    """Blockwise reductions over the implicit plan R/J: returns
    (row_sums (I,), col_sums (J,), agg (I, S) = (R/J) @ M1 if M1 given).

    Used for growth iterations and transition tables at scales where R
    cannot be materialized.
    """
    import jax
    import jax.numpy as jnp

    I, J = X0.shape[0], X1.shape[0]
    dtype = X0.dtype
    sq0 = jnp.sum(jnp.asarray(X0) ** 2, axis=1)
    sq1 = jnp.sum(jnp.asarray(X1) ** 2, axis=1)
    X1j = jnp.asarray(X1)
    gj = jnp.asarray(g)
    M1j = None if M1 is None else jnp.asarray(M1, dtype)

    nb = (I + block - 1) // block
    pad = nb * block - I
    X0p = jnp.pad(jnp.asarray(X0), ((0, pad), (0, 0)))
    fp = jnp.pad(jnp.asarray(f), (0, pad), constant_values=-jnp.inf)
    sq0p = jnp.pad(sq0, (0, pad))

    def body(carry, blk):
        colm = carry
        Xb, f_blk, sqb = blk
        dot = Xb @ X1j.T
        Cb = (sqb[:, None] + sq1[None, :] - 2.0 * dot) / s
        R = jnp.exp((f_blk[:, None] + gj[None, :] - Cb) / eps_final) / J
        out = (R.sum(axis=1), R @ M1j if M1j is not None else jnp.zeros((Xb.shape[0], 1), dtype))
        return colm + R.sum(axis=0), out

    colm0 = jnp.zeros((J,), dtype)
    colm, (rows_b, agg_b) = jax.lax.scan(
        body, colm0,
        (X0p.reshape(nb, block, -1), fp.reshape(nb, block), sq0p.reshape(nb, block)),
    )
    row_sums = rows_b.reshape(-1)[:I]
    agg = agg_b.reshape(nb * block, -1)[:I] if M1 is not None else None
    return np.asarray(row_sums), np.asarray(colm), (
        None if agg is None else np.asarray(agg)
    )


def plan_block(f_blk, g_blk, X0_blk, X1_blk, s, eps_final, J_total):
    """Reconstruct one block of the transport plan from the duals."""
    from scipy.spatial.distance import cdist

    C = cdist(X0_blk, X1_blk, "sqeuclidean") / s
    return np.exp((f_blk[:, None] + g_blk[None, :] - C) / eps_final) / J_total
