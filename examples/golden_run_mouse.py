"""MouseOrganogenesis-scale golden run: the reference's SECOND dataset shape
(examples/MouseOrganogenesis_output/ — 3 timepoints, SVG_genes.txt = 9,281
genes kept, ~3x ChickenHeart's 2,954; per-timepoint SVG lists of very
different sizes: 12,806 / 6,415 / 11,551 rows, exercising the union rule's
smallest-list + top-per-cluster contribution arithmetic,
SpaDOT/utils/_preprocess_utils.py:69-76).

Synthetic counts at that scale — ~14k input genes with per-timepoint ACTIVE
gene sets of deliberately unequal sizes, unequal spot counts — through the
COMPLETE pipeline: preprocess (SCTransform + SPARK-X + Louvain per tp, SVG
union) -> train (default config, 100 epochs) -> analyze. Scores domain ARI
per timepoint and writes a summary.json next to the artifacts.

    python examples/golden_run_mouse.py [output_dir]
"""
import json
import os
import sys
import time
from types import SimpleNamespace

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# per-timepoint spot counts (unequal, like the reference's per-tp CSVs) and
# ACTIVE spatial gene ranges; the SVG union of these drives the kept count
# toward the ~9.3k scale anchor
N_PER_TP = (4200, 2400, 3600)
N_GENES = 14000
ACTIVE = ((0, 9000), (2000, 7500), (1000, 9600))
N_DOMAINS = 7


def make_dataset(path, seed=23):
    from spadot_tpu.io import AnnData

    rng = np.random.default_rng(seed)
    base_means = rng.normal(0, 1.0, size=(N_DOMAINS, N_GENES))
    Xs, coords, tps, doms = [], [], [], []
    for t, n in enumerate(N_PER_TP):
        xy = rng.uniform(0, 10, size=(n, 2))
        ang = np.arctan2(xy[:, 1] - 5, xy[:, 0] - 5) + t * 0.4
        dom = ((ang % (2 * np.pi)) / (2 * np.pi) * N_DOMAINS).astype(int) % N_DOMAINS
        logits = base_means[dom] + rng.normal(0, 0.35, size=(n, N_GENES))
        # only the tp's ACTIVE gene range is spatially structured; the rest
        # is flat noise SPARK-X must reject
        a0, a1 = ACTIVE[t]
        flat = np.zeros((n, N_GENES))
        flat[:] = rng.normal(0, 0.35, size=(n, N_GENES))
        mask = np.zeros(N_GENES, bool)
        mask[a0:a1] = True
        logits = np.where(mask[None, :], logits, flat)
        Xs.append(rng.poisson(np.exp(0.5 * logits + 0.7)).astype(float))
        coords.append(xy)
        tps.extend([t] * n)
        doms.append(dom)
    adata = AnnData(
        np.vstack(Xs),
        obs=pd.DataFrame({"timepoint": tps, "true_domain": np.concatenate(doms)}),
        obsm={"spatial": np.vstack(coords)},
        var=pd.DataFrame(index=[f"gene{j}" for j in range(N_GENES)]),
    )
    adata.write_h5ad(path)


def main():
    import spadot_tpu
    from spadot_tpu.io import read_h5ad

    out = sys.argv[1] if len(sys.argv) > 1 else "golden_out_mouse"
    os.makedirs(out, exist_ok=True)
    raw = os.path.join(out, "synthetic_mouseorganogenesis.h5ad")

    t0 = time.time()
    print("[1/4] generating dataset ...", flush=True)
    make_dataset(raw)

    print("[2/4] preprocess (full feature selection, ~14k genes) ...", flush=True)
    t = time.time()
    spadot_tpu.preprocess(SimpleNamespace(
        data=raw, output_dir=out, prefix="preprocessed_", feature_selection=True,
    ))
    pre_s = time.time() - t
    print(f"    preprocess: {pre_s:.1f}s", flush=True)
    n_svgs = sum(1 for _ in open(os.path.join(out, "SVG_genes.txt")))
    print(f"    SVGs kept: {n_svgs} (reference MouseOrganogenesis: 9,281)",
          flush=True)

    print("[3/4] train (default config: 100 epochs, batch 512) ...", flush=True)
    t = time.time()
    cfg_path = os.path.join(out, "golden.yaml")
    with open(cfg_path, "w") as f:
        f.write("equal_inducing_split: true\n")
    spadot_tpu.train(SimpleNamespace(
        data=os.path.join(out, "preprocessed_synthetic_mouseorganogenesis.h5ad"),
        output_dir=out, prefix="", config=cfg_path, device=None,
        save_model=False, resume=None,
    ))
    train_s = time.time() - t
    print(f"    train: {train_s:.1f}s", flush=True)

    print("[4/4] analyze ...", flush=True)
    t = time.time()
    spadot_tpu.analyze(SimpleNamespace(
        data=os.path.join(out, "latent.h5ad"), output_dir=out, prefix="",
        n_clusters=[N_DOMAINS] * len(N_PER_TP),
    ))
    print(f"    analyze: {time.time()-t:.1f}s", flush=True)

    from sklearn.cluster import KMeans
    from sklearn.metrics import adjusted_rand_score

    raw_ad = read_h5ad(raw)
    lat = read_h5ad(os.path.join(out, "latent.h5ad"))
    truth_all = raw_ad.obs.loc[lat.obs_names, "true_domain"].to_numpy()
    aris = {}
    for tp in sorted(lat.obs["timepoint"].unique()):
        rows = (lat.obs["timepoint"] == tp).to_numpy()
        pred = KMeans(N_DOMAINS, random_state=1993, n_init=10).fit(
            lat.toarray()[rows]
        ).labels_
        aris[int(tp)] = float(adjusted_rand_score(truth_all[rows], pred))
        print(f"    timepoint {tp}: domain ARI = {aris[int(tp)]:.3f}", flush=True)
    loss = pd.read_csv(os.path.join(out, "loss.csv"), index_col=0)
    summary = {
        "n_svgs": n_svgs,
        "n_per_tp": list(N_PER_TP),
        "aris": aris,
        "mean_ari": float(np.mean(list(aris.values()))),
        "final_losses": {k: float(v) for k, v in loss.iloc[-1].items()},
        "preprocess_s": round(pre_s, 1),
        "train_s": round(train_s, 1),
        "total_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"TOTAL {summary['total_s']}s; SVGs {n_svgs}; "
          f"mean ARI {summary['mean_ari']:.3f}", flush=True)


if __name__ == "__main__":
    main()
