"""Full-cell optimal-transport analysis — replaces the external `wot`
dependency (Waddington-OT) used at SpaDOT/utils/_analyze_utils.py:108-138.

For every pair of consecutive days, an unbalanced entropic transport map
between ALL cells of the two timepoints is computed with the same Sinkhorn
engine used during training (ops/sinkhorn.py; epsilon=0.05, epsilon0=1,
lambda1=0.1, lambda2=5, growth_iters=3 — _analyze_utils.py:124). Growth
iterations re-estimate the source marginal from the plan's row sums and the
LAST plan is kept (the wot OTModel convention). Transport maps are written to
`<output_dir>/OT/tmaps_{d0}_{d1}.h5ad` and per-cell growth rates to
`OT/growth_rates_{d0}_{d1}.txt` (analogue of the reference's tmap directory
and OT_g.txt side artifact).

Transition tables follow wot's `transition_table` over
`population_from_cell_sets` semantics (the reference calls these at
_analyze_utils.py:128-137): each cell set becomes a population UNIFORMLY
distributed over its cells (p_i = 1_{S_i}/|S_i| — wot's population_from_ids
"constructs a population uniformly distributed among the ids"), populations
are pushed through the plan without re-normalization, and
table[i, j] = p_iᵀ R q_j — i.e. the raw set-to-set mass M0ᵀ R M1 scaled by
diag(1/|S_i|) on the left and diag(1/|T_j|) on the right. The two-sided
diagonal scaling is NOT a no-op downstream: the dotplot's
min(row-norm, col-norm) (_analyze_utils.py:184-193) changes under per-set
scaling (the col-norm term is not invariant to row scaling and vice versa),
so the written table must carry wot's normalization, not raw mass.
`transition_from_masses` holds the exact formula; tests/test_analyze.py
checks it against a literal per-cell transcription of the wot pipeline.
(wot itself is not installable here — the oracle transcribes wot 1.0.8's
population/push-forward semantics the same way tests/test_sinkhorn.py
transcribes the reference OT solver.)

These full-cell n×m problems (10^3-10^5 cells a side) are exactly where the
TPU Sinkhorn pays: each iteration is two fused logsumexp sweeps over the cost
matrix on the VPU, optionally sharded over the mesh rows.
"""
import os

import numpy as np
import pandas as pd
from scipy.spatial.distance import cdist

from spadot_tpu.io import AnnData


# above this many cost-matrix entries, switch to the cost-matrix-free
# factored engine (duals only; plan reductions streamed blockwise)
DENSE_LIMIT = int(os.environ.get("SPADOT_OT_DENSE_LIMIT", 32_000_000))


def _ot_kwargs(ot_config):
    return dict(
        lambda1=ot_config.get("lambda1", 0.1),
        lambda2=ot_config.get("lambda2", 5.0),
        epsilon=ot_config.get("epsilon", 0.05),
        batch_size=ot_config.get("batch_size", 5),
        tolerance=ot_config.get("tolerance", 1e-8),
        epsilon0=ot_config.get("epsilon0", 1),
        max_iter=ot_config.get("max_iter", 1e7),
    )


def _transport_map_growth(X0, X1, ot_config, growth_iters=3, backend="jax"):
    """Growth-iterated unbalanced transport map (dense path);
    returns (last plan, growths)."""
    from spadot_tpu.ops.sinkhorn import (
        sinkhorn_duality_gap_jax,
        sinkhorn_duality_gap_np,
    )

    C = cdist(X0, X1, metric="sqeuclidean")
    C = C / np.median(C)
    kwargs = _ot_kwargs(ot_config)
    solver = sinkhorn_duality_gap_jax if backend == "jax" else sinkhorn_duality_gap_np
    g = np.ones(C.shape[0])
    growths = [g]
    R = None
    for _ in range(int(growth_iters)):
        R = np.asarray(solver(C, g, **kwargs), dtype=np.float64)
        g = R.sum(axis=1)
        growths.append(g)
    return R, growths


def _transport_map_growth_factored(X0, X1, ot_config, growth_iters=3, M1=None):
    """Growth-iterated transport at scales where the plan cannot be
    materialized: the factored Sinkhorn returns dual potentials; row sums /
    set aggregations stream blockwise over the implicit plan.

    Returns (duals dict, growths, agg) with agg = (R/J) @ M1 when M1 given.
    """
    from spadot_tpu.ops.sinkhorn_flash import plan_reductions, sinkhorn_factored

    kwargs = _ot_kwargs(ot_config)
    g_vec = np.ones(X0.shape[0])
    growths = [g_vec]
    duals = None
    agg = None
    f0 = g0 = None
    for _ in range(int(growth_iters)):
        # warm-start each growth iteration from the previous duals: only the
        # row marginal changes between iterations, so the old (f, g) sit near
        # the new fixed point and the duality-gap criterion still certifies
        # the same converged answer — at 100k x 100k this cuts iterations
        # for growth passes 2..k by an order of magnitude
        f, gg, s, eps_final = sinkhorn_factored(
            X0, X1, g_vec, return_plan=False, f0=f0, g0=g0, **kwargs
        )
        f0, g0 = f, gg
        row_sums, col_sums, agg = plan_reductions(
            f, gg, np.asarray(X0, np.float32), np.asarray(X1, np.float32),
            s=s, eps_final=eps_final, M1=M1,
        )
        duals = {"f": f, "g": gg, "cost_scale": s, "eps_final": eps_final}
        g_vec = row_sums
        growths.append(g_vec)
    return duals, growths, agg


def transition_from_masses(raw, n0, n1):
    """wot-normalized transition table from a raw set-to-set mass matrix.

    raw[i, j] = Σ_{a∈S_i} Σ_{b∈T_j} R[a, b]  (= (M0ᵀ R M1)[i, j]);
    n0[i] = |S_i|, n1[j] = |T_j| — cells per set at the two timepoints.

    Returns diag(1/n0) · raw · diag(1/n1): the uniform-population inner
    products wot's transition_table computes (see module docstring). Empty
    sets cannot occur (sets are derived from observed labels) but a zero
    guard keeps degenerate inputs finite."""
    n0 = np.maximum(np.asarray(n0, np.float64), 1.0)
    n1 = np.maximum(np.asarray(n1, np.float64), 1.0)
    return np.asarray(raw, np.float64) / n0[:, None] / n1[None, :]


def load_tmap(tmap_dir, d0, d1):
    """Load a transport map from the OT/ directory written by ot_analysis
    (analogue of wot.tmap.TransportMapModel.from_directory,
    _analyze_utils.py:126). Returns an AnnData plan for dense maps, or a dict
    of dual potentials for factored (large-scale) maps."""
    from spadot_tpu.io import read_h5ad

    dense = os.path.join(tmap_dir, f"tmaps_{d0}_{d1}.h5ad")
    if os.path.exists(dense):
        return read_h5ad(dense)
    duals = os.path.join(tmap_dir, f"tmaps_duals_{d0}_{d1}.npz")
    if os.path.exists(duals):
        return dict(np.load(duals))
    raise FileNotFoundError(f"no transport map for {d0}->{d1} in {tmap_dir}")


def ot_analysis(args, adata, ot_config=None):
    """Compute all consecutive-day transport maps + transition tables
    (parity with OT_analysis, _analyze_utils.py:108-138)."""
    ot_config = dict(ot_config or {})
    ot_config.setdefault("epsilon", 0.05)
    ot_config.setdefault("epsilon0", 1)
    ot_config.setdefault("lambda1", 0.1)
    ot_config.setdefault("lambda2", 5.0)
    growth_iters = ot_config.get("growth_iters", 3)

    day_codes = adata.obs["timepoint"].astype("category").cat.codes.to_numpy()
    adata.obs["day"] = day_codes
    adata.obs["cell_growth_rate"] = 1
    adata.obs["SpaDOT_pred_labels"] = (
        adata.obs["timepoint"].astype(str) + "_" + adata.obs["kmeans"].astype(str)
    )
    tmap_dir = os.path.join(args.output_dir, "OT")
    os.makedirs(tmap_dir, exist_ok=True)

    days = np.sort(np.unique(day_codes))
    X = adata.toarray()
    labels = adata.obs["SpaDOT_pred_labels"].to_numpy()
    obs_names = adata.obs_names.to_numpy()

    backend = ot_config.get("backend", "jax")
    for tp_i in range(len(days) - 1):
        d0, d1 = days[tp_i], days[tp_i + 1]
        rows0 = np.where(day_codes == d0)[0]
        rows1 = np.where(day_codes == d1)[0]
        sets0 = sorted(set(labels[rows0]))
        sets1 = sorted(set(labels[rows1]))
        M0 = np.stack([(labels[rows0] == s).astype(np.float64) for s in sets0], axis=1)
        M1 = np.stack([(labels[rows1] == s).astype(np.float64) for s in sets1], axis=1)

        n0 = M0.sum(axis=0)
        n1 = M1.sum(axis=0)
        if len(rows0) * len(rows1) <= DENSE_LIMIT:
            R, growths = _transport_map_growth(
                X[rows0], X[rows1], ot_config, growth_iters=growth_iters,
                backend=backend,
            )
            table = transition_from_masses(M0.T @ R @ M1, n0, n1)
            # persist the transport map (tmap-directory analogue)
            tmap = AnnData(
                R.astype(np.float32),
                obs=pd.DataFrame(index=obs_names[rows0]),
                var=pd.DataFrame(index=obs_names[rows1]),
            )
            tmap.write_h5ad(os.path.join(tmap_dir, f"tmaps_{d0}_{d1}.h5ad"))
        else:
            duals, growths, agg = _transport_map_growth_factored(
                X[rows0], X[rows1], ot_config, growth_iters=growth_iters, M1=M1
            )
            table = transition_from_masses(M0.T @ agg, n0, n1)
            # too large to materialize: persist the dual potentials instead
            # (any plan block reconstructs via ops/sinkhorn_flash.plan_block)
            np.savez(
                os.path.join(tmap_dir, f"tmaps_duals_{d0}_{d1}.npz"), **duals
            )
        gdf = pd.DataFrame(
            {f"g{i}": g for i, g in enumerate(growths)}, index=obs_names[rows0]
        )
        gdf.to_csv(os.path.join(tmap_dir, f"growth_rates_{d0}_{d1}.txt"), sep="\t")
        tt = AnnData(
            table,
            obs=pd.DataFrame(index=pd.Index(sets0)),
            var=pd.DataFrame(index=pd.Index(sets1)),
        )
        tt.write_h5ad(
            os.path.join(args.output_dir, f"{args.prefix}transition_table_{d0}_{d1}.h5ad")
        )
