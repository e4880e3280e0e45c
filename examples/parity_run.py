"""Golden loss-curve parity harness vs the reference's ChickenHeart run.

The reference ships a de-facto regression fixture:
/root/reference/examples/ChickenHeart_output/loss.csv — 100 epochs of the
published run (4 timepoints of 747/1966/1916/1967 spots — counts printed in
examples/ChickenHeart.ipynb — 2,954 SVGs, batch 512, 1200 inducing points,
float64, seed 1993). The real h5ads are not shipped, so exact replay is
impossible; the available proxy is a run at the EXACT reference shape on
synthetic unit-variance data (the preprocess stage leaves every gene
per-timepoint standardized, so the loss magnitudes are data-scale-determined)
and a comparison of per-component magnitudes at epoch 0 plus curve shape
(monotone trends, KMeans onset at epoch 1, OT onset at epoch 50).

Usage:
    python examples/parity_run.py [float32|float64] [maxiter]

Writes docs/parity/loss_<dtype>.csv and prints the anchor comparison table.
The committed CSVs are locked by tests/test_parity.py.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# exact ChickenHeart run shape (reference examples/ChickenHeart.ipynb cell 2
# output: "Timepoint: t, Number of cells: ...")
TP_SPOTS = (747, 1966, 1916, 1967)
N_GENES = 2954  # SVG_genes.txt line count

# reference anchors, examples/ChickenHeart_output/loss.csv rows 0 and 99
REF_EPOCH0 = dict(elbo=199.93, Recon=1980.31, SVGP_KL=-144.39,
                  GAT_KL=2619.27, alignment=16.36, KMeans=0.0, OT=0.0)
REF_EPOCH99 = dict(elbo=177.75, Recon=1731.22, SVGP_KL=-1.50,
                   GAT_KL=4999.30, alignment=2.20, KMeans=19.19, OT=0.646)


def make_reference_shape_adata(seed=0, n_domains=7):
    """Synthetic spatiotemporal data at the exact ChickenHeart shape, already
    'preprocessed': every gene standardized per timepoint (mean 0, sd 1) —
    the state in which the train stage receives real data."""
    import pandas as pd

    from spadot_tpu.io import AnnData

    rng = np.random.default_rng(seed)
    Xs, obs_tp, coords, doms = [], [], [], []
    for t, n in enumerate(TP_SPOTS):
        xy = rng.uniform(0, 10, size=(n, 2))
        dom = (xy[:, 0] * n_domains / 10).astype(int).clip(0, n_domains - 1)
        means = rng.normal(0, 1.5, size=(n_domains, N_GENES)).astype(np.float32)
        expr = means[dom] + rng.normal(0, 0.5, size=(n, N_GENES)).astype(np.float32)
        # per-timepoint standardization (ddof=1), like preprocess/norm.py
        expr = (expr - expr.mean(0)) / np.maximum(expr.std(0, ddof=1), 1e-12)
        Xs.append(expr.astype(np.float32))
        obs_tp.extend([t] * n)
        coords.append(xy)
        doms.append(dom)
    obs = pd.DataFrame(
        {"timepoint": obs_tp, "true_domain": np.concatenate(doms)}
    )
    obs.index = [f"cell{i}" for i in range(len(obs_tp))]
    return AnnData(
        np.vstack(Xs), obs=obs, obsm={"spatial": np.vstack(coords)},
        var=pd.DataFrame(index=[f"g{j}" for j in range(N_GENES)]),
    )


def main():
    dtype = sys.argv[1] if len(sys.argv) > 1 else "float32"
    maxiter = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/spadot_jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spadot_tpu.config import (
        apply_precision_preset, default_config, resolve_dtype)
    from spadot_tpu.data.pipeline import prepare_data
    from spadot_tpu.train.loop import train_spadot
    from spadot_tpu.utils.rng import set_seed

    adata = make_reference_shape_adata()
    cfg = default_config()
    cfg.update(
        input_dim=N_GENES, timepoints=[0, 1, 2, 3], maxiter=maxiter,
        dtype=dtype,
        # parity runs use the named parity preset (config.py:
        # _PRECISION_PRESETS — the ONE source of truth for the pin set):
        # true-f32 'highest' on every branch + the reference-shaped cold
        # KMeans refit. The committed docs/parity curves were produced
        # under exactly these pins; the bf16 production default is
        # quality-gated separately by examples/precision_quality.py.
        precision_preset="parity",
    )
    cfg = apply_precision_preset(cfg)
    if os.environ.get("SPADOT_PARITY_CFG"):
        # ad-hoc overrides, e.g. '{"gat_dense_max_n": 0}' to skip the dense
        # attention path on CPU f64 runs (n^2 f64 matmuls are slow there)
        import json

        cfg.update(json.loads(os.environ["SPADOT_PARITY_CFG"]))
    resolve_dtype(cfg)
    jax.config.update(
        "jax_default_matmul_precision", cfg.get("matmul_precision", "highest")
    )
    set_seed(int(cfg["seed"]))  # reference seed 1993 (config.yaml)
    data = prepare_data(adata, cfg)
    _, _, _, _, loss_df = train_spadot(data, cfg)

    out_dir = os.path.join(os.path.dirname(__file__), "..", "docs", "parity")
    os.makedirs(out_dir, exist_ok=True)
    out_csv = os.path.join(out_dir, f"loss_{dtype}.csv")
    loss_df.to_csv(out_csv)
    print(f"wrote {out_csv}")

    first, last = loss_df.iloc[0], loss_df.iloc[-1]
    print(f"\n{'component':<10}{'ours@0':>12}{'ref@0':>12}{'ratio':>8}"
          f"{'ours@last':>12}{'ref@99':>12}")
    for k in loss_df.columns:
        r0 = first[k] / REF_EPOCH0[k] if REF_EPOCH0[k] else float("nan")
        print(f"{k:<10}{first[k]:>12.2f}{REF_EPOCH0[k]:>12.2f}{r0:>8.2f}"
              f"{last[k]:>12.2f}{REF_EPOCH99[k]:>12.2f}")


if __name__ == "__main__":
    main()
