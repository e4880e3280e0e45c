"""Full-dress rehearsal at reference scale: synthetic ChickenHeart-like
dataset (4 timepoints x 2500 spots, ~3k genes of counts, ground-truth spatial
domains that drift across time), through the COMPLETE pipeline —
preprocess (SCTransform + SPARK-X + Louvain) -> train (default config,
100 epochs) -> analyze (domains + transition tables) — scoring domain
recovery (ARI) per timepoint at the end.

    python examples/golden_run.py [output_dir]
"""
import os
import sys
import time
from types import SimpleNamespace

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(path, n_per_tp=2500, n_genes=3000, n_tp=4, n_domains=6, seed=11):
    from spadot_tpu.io import AnnData

    rng = np.random.default_rng(seed)
    base_means = rng.normal(0, 1.0, size=(n_domains, n_genes))
    Xs, coords, tps, doms = [], [], [], []
    for t in range(n_tp):
        xy = rng.uniform(0, 10, size=(n_per_tp, 2))
        # domains are angular sectors that rotate over time (domain drift)
        ang = np.arctan2(xy[:, 1] - 5, xy[:, 0] - 5) + t * 0.4
        dom = ((ang % (2 * np.pi)) / (2 * np.pi) * n_domains).astype(int) % n_domains
        means = base_means + rng.normal(0, 0.15, size=base_means.shape)
        logits = means[dom] + rng.normal(0, 0.35, size=(n_per_tp, n_genes))
        Xs.append(rng.poisson(np.exp(0.55 * logits + 0.8)).astype(float))
        coords.append(xy)
        tps.extend([t] * n_per_tp)
        doms.append(dom)
    adata = AnnData(
        np.vstack(Xs),
        obs=pd.DataFrame({"timepoint": tps, "true_domain": np.concatenate(doms)}),
        obsm={"spatial": np.vstack(coords)},
        var=pd.DataFrame(index=[f"gene{j}" for j in range(n_genes)]),
    )
    adata.write_h5ad(path)


def main():
    import spadot_tpu
    from spadot_tpu.io import read_h5ad

    out = sys.argv[1] if len(sys.argv) > 1 else "golden_out"
    os.makedirs(out, exist_ok=True)
    raw = os.path.join(out, "synthetic_chickenheart.h5ad")

    t0 = time.time()
    print("[1/4] generating dataset ...", flush=True)
    make_dataset(raw)

    print("[2/4] preprocess (full feature selection) ...", flush=True)
    t = time.time()
    spadot_tpu.preprocess(SimpleNamespace(
        data=raw, output_dir=out, prefix="preprocessed_", feature_selection=True,
    ))
    print(f"    preprocess: {time.time()-t:.1f}s", flush=True)

    print("[3/4] train (default config: 100 epochs, batch 512) ...", flush=True)
    t = time.time()
    cfg_path = os.path.join(out, "golden.yaml")
    # SPADOT_GOLDEN_PRESET pins a named preset (config.py: fast / parity)
    # so a fixture set records WHICH supported configuration it certifies;
    # empty = the shipped defaults (== fast). SPADOT_GOLDEN_DEVICE=cpu
    # forces the CPU backend (the axon tunnel may be busy/down).
    preset = os.environ.get("SPADOT_GOLDEN_PRESET", "")
    with open(cfg_path, "w") as f:
        f.write("equal_inducing_split: true\n")
        if preset:
            f.write(f"precision_preset: {preset}\n")
    spadot_tpu.train(SimpleNamespace(
        data=os.path.join(out, "preprocessed_synthetic_chickenheart.h5ad"),
        output_dir=out, prefix="", config=cfg_path,
        device=os.environ.get("SPADOT_GOLDEN_DEVICE") or None,
        save_model=True, resume=None,
    ))
    print(f"    train: {time.time()-t:.1f}s", flush=True)

    print("[4/4] analyze (6 clusters per timepoint) ...", flush=True)
    t = time.time()
    spadot_tpu.analyze(SimpleNamespace(
        data=os.path.join(out, "latent.h5ad"), output_dir=out, prefix="",
        n_clusters=[6, 6, 6, 6],
        device=os.environ.get("SPADOT_GOLDEN_DEVICE") or None,
    ))
    print(f"    analyze: {time.time()-t:.1f}s", flush=True)

    from sklearn.metrics import adjusted_rand_score

    raw_ad = read_h5ad(raw)
    res = read_h5ad(os.path.join(out, "latent.h5ad"))
    # analyze() wrote kmeans labels into its own copy; recluster for scoring
    lat = read_h5ad(os.path.join(out, "latent.h5ad"))
    from sklearn.cluster import KMeans

    truth_all = raw_ad.obs.loc[lat.obs_names, "true_domain"].to_numpy()
    aris = []
    for tp in sorted(lat.obs["timepoint"].unique()):
        rows = (lat.obs["timepoint"] == tp).to_numpy()
        pred = KMeans(6, random_state=1993, n_init=10).fit(lat.toarray()[rows]).labels_
        ari = adjusted_rand_score(truth_all[rows], pred)
        aris.append(ari)
        print(f"    timepoint {tp}: domain ARI = {ari:.3f}", flush=True)
    loss = pd.read_csv(os.path.join(out, "loss.csv"), index_col=0)
    print(f"    final losses: {loss.iloc[-1].round(3).to_dict()}", flush=True)
    print(f"TOTAL {time.time()-t0:.1f}s; mean ARI {np.mean(aris):.3f}", flush=True)

    import json

    svgs = open(os.path.join(out, "SVG_genes.txt")).read().split()
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump({
            "preset": preset or "shipped_defaults",
            "n_svgs": len(svgs),
            "aris": {str(tp): float(a) for tp, a in
                     zip(sorted(lat.obs["timepoint"].unique()), aris)},
            "mean_ari": float(np.mean(aris)),
            "final_losses": {k: float(v) for k, v in
                             loss.iloc[-1].to_dict().items()},
        }, f, indent=1)


if __name__ == "__main__":
    main()
