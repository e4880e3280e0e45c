"""End-to-end quickstart on synthetic spatiotemporal data.

Generates a small 2-timepoint dataset with ground-truth spatial domains,
runs the full pipeline (preprocess -> train -> analyze), and reports the
adjusted Rand index of the recovered domains.

    python examples/quickstart.py [output_dir]

Runs on whatever JAX backend is default (TPU if available); pass
--device cpu semantics by setting JAX_PLATFORM_NAME=cpu.
"""
import os
import sys
from types import SimpleNamespace

import numpy as np
import pandas as pd

# allow running from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(path, n_per_tp=400, n_genes=120, n_tp=2, n_domains=4, seed=0):
    from spadot_tpu.io import AnnData

    rng = np.random.default_rng(seed)
    Xs, coords, tps, doms = [], [], [], []
    for t in range(n_tp):
        xy = rng.uniform(0, 10, size=(n_per_tp, 2))
        dom = (xy[:, 0] * n_domains / 10).astype(int).clip(0, n_domains - 1)
        means = rng.normal(0, 1.2, size=(n_domains, n_genes))
        logits = means[dom] + rng.normal(0, 0.4, size=(n_per_tp, n_genes))
        Xs.append(rng.poisson(np.exp(0.6 * logits + 1.0)).astype(float))
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
    return adata


def main():
    import spadot_tpu

    out = sys.argv[1] if len(sys.argv) > 1 else "quickstart_out"
    os.makedirs(out, exist_ok=True)
    raw = os.path.join(out, "synthetic.h5ad")
    print("1/4 generating synthetic data ...")
    make_dataset(raw)

    print("2/4 preprocess (SCTransform + SPARK-X + Louvain) ...")
    spadot_tpu.preprocess(SimpleNamespace(
        data=raw, output_dir=out, prefix="preprocessed_", feature_selection=True,
    ))

    print("3/4 train (small config for the demo) ...")
    cfg_path = os.path.join(out, "quickstart.yaml")
    with open(cfg_path, "w") as f:
        f.write(
            "maxiter: 30\not_epoch: 10\nbatch_size: 256\n"
            "inducing_point_nums: 120\nn_clusters: 4\n"
            "svgp_encoder_layers: [64, 32]\ndecoder_layers: [32, 64]\n"
            "gat_encoder_hidden: 64\ngat_attention_heads: 2\n"
            "ot_config: {ot_epochs: 5}\n"
        )
    spadot_tpu.train(SimpleNamespace(
        data=os.path.join(out, "preprocessed_synthetic.h5ad"), output_dir=out,
        prefix="", config=cfg_path, device=None, save_model=True, resume=None,
    ))

    print("4/4 analyze (domains + transitions) ...")
    spadot_tpu.analyze(SimpleNamespace(
        data=os.path.join(out, "latent.h5ad"), output_dir=out, prefix="",
        n_clusters=[4, 4],
    ))

    # score domain recovery
    from sklearn.metrics import adjusted_rand_score

    from spadot_tpu.io import read_h5ad

    raw_ad = read_h5ad(raw)
    lat = read_h5ad(os.path.join(out, "latent.h5ad"))
    truth = raw_ad.obs.loc[lat.obs_names, "true_domain"].to_numpy()
    from sklearn.cluster import KMeans

    for tp in sorted(lat.obs["timepoint"].unique()):
        rows = (lat.obs["timepoint"] == tp).to_numpy()
        pred = KMeans(4, random_state=0, n_init=10).fit(lat.toarray()[rows]).labels_
        print(f"  timepoint {tp}: domain ARI = "
              f"{adjusted_rand_score(truth[rows], pred):.3f}")
    print(f"done — artifacts in {out}/")


if __name__ == "__main__":
    main()
