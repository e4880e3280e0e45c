"""Synthetic spatiotemporal dataset helpers shared by tests and bench."""
import numpy as np
import pandas as pd

from spadot_tpu.io import AnnData


def make_synthetic_adata(
    n_per_tp=120, n_genes=40, n_tp=2, n_domains=3, seed=0, counts=False
):
    """Spots on a 2-D grid with domain-structured expression per timepoint.

    n_per_tp: int, or a sequence of per-timepoint spot counts (unequal sizes
    exercise the row-padding of the fused stacked-timepoint epoch)."""
    rng = np.random.default_rng(seed)
    ns = (
        list(n_per_tp) if isinstance(n_per_tp, (list, tuple))
        else [n_per_tp] * n_tp
    )
    Xs, obs_tp, coords, doms = [], [], [], []
    for t, n_t in enumerate(ns):
        xy = rng.uniform(0, 10, size=(n_t, 2))
        dom = (xy[:, 0] * n_domains / 10).astype(int).clip(0, n_domains - 1)
        means = rng.normal(0, 1.5, size=(n_domains, n_genes))
        expr = means[dom] + rng.normal(0, 0.5, size=(n_t, n_genes))
        if counts:
            expr = rng.poisson(np.exp(expr * 0.5 + 1.0)).astype(np.float64)
        Xs.append(expr)
        obs_tp.extend([t] * n_t)
        coords.append(xy)
        doms.append(dom)
    X = np.vstack(Xs)
    obs = pd.DataFrame({"timepoint": obs_tp, "true_domain": np.concatenate(doms)})
    obs.index = [f"cell{i}" for i in range(len(obs_tp))]
    return AnnData(
        X, obs=obs, obsm={"spatial": np.vstack(coords)},
        var=pd.DataFrame(index=[f"g{j}" for j in range(n_genes)]),
    )
