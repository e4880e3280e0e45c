"""Atlas-scale training quality: domain-recovery ARI at 100k+ spots/tp.

The atlas bench (BENCH_MODE=atlas) measures per-epoch wall-clock at
2 x 102,400 spots but no quality number existed at that scale — the
largest quality study was the 1-timepoint 51k stress run
(docs/tpu_logs/windowed_quality_51k.log), which cannot exercise the OT
coupling loss between timepoints. This script trains the shipped atlas
configuration (exact receptive-closure minibatch GAT, batch 4096, speed
precision defaults) on synthetic multi-timepoint data with ground-truth
domains, then reports per-timepoint and mean KMeans-vs-truth ARI of the
final latents plus loss-trajectory finiteness.

Usage: python examples/atlas_quality.py [n_per_tp] [epochs] [genes] [n_tp]
Defaults mirror the atlas bench: 102400 x 2 tps x 2954 genes, 100 epochs.
QUALITY_CFG (JSON dict) overrides config keys.
SPADOT_SEEDS="1993,7,42" loops the whole train/eval over several training
seeds (data fixed) and reports mean ± std — the round-4 verdict (Next #4)
asked for >=3-seed evidence at this scale, where the only prior number was
the single-seed 0.8525 (atlasq_lrscaled.log).

Divergence ROOT CAUSE (2026-08-19 arms, docs/tpu_logs/atlasq_*.log): the
reference lr 3e-4 is unstable at this DATA SCALE, at every batch size —
batch 4096 diverges across epochs (GAT_KL explodes from epoch ~10, NaN
centroids by ~epoch 40; the all-highest parity-precision arm diverged the
same way, so precision is NOT the cause) and batch 512, running 8x more
steps per epoch, hits the same runaway within epoch 1 (per-step
dissection: GAT_KL 101 -> 3529 in 20 steps; one latent dim's qnet_var
driven to the exp-clip floor by step 23, atlasq_b512*.log). lr scaled to
3.75e-5 (= 3e-4 x 10k/total-spots) trained to completion with mean
domain ARI 0.8525 at batch 4096. The shipped default here is therefore
the scaled lr; pass QUALITY_CFG='{"lr": 3e-4}' to reproduce the
divergence. See docs/scaling.md "Large-scale learning rate".
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    genes = int(sys.argv[3]) if len(sys.argv) > 3 else 2954
    n_tp = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    import jax

    if os.environ.get("BENCH_DEVICE", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/spadot_jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from _synthetic import make_synthetic_adata
    from sklearn.metrics import adjusted_rand_score

    from spadot_tpu.config import default_config
    from spadot_tpu.data.pipeline import prepare_data
    from spadot_tpu.ops.kmeans import kmeans_fit
    from spadot_tpu.train.loop import get_latent, train_spadot
    from spadot_tpu.utils.rng import set_seed

    adata = make_synthetic_adata(
        n_per_tp=n, n_genes=genes, n_tp=n_tp, n_domains=7, seed=3
    )
    cfg = default_config()
    # the shipped atlas configuration (bench.py atlas mode)
    cfg.update(
        input_dim=genes, timepoints=list(range(n_tp)), maxiter=epochs,
        n_clusters=7, batch_size=4096, full_graph_gat=False, gat_window=2048,
        # effective-lr scaling for the summed-over-rows loss at batch 4096
        # (see module docstring; atlasq_lrscaled.log)
        lr=3e-4 * 512 / 4096,
    )
    if os.environ.get("QUALITY_CFG"):
        import json

        overrides = json.loads(os.environ["QUALITY_CFG"])
        cfg.update(overrides)
        print(f"# QUALITY_CFG overrides: {overrides}")
    seeds = [int(s) for s in os.environ.get(
        "SPADOT_SEEDS", str(cfg["seed"])).split(",")]

    if len(seeds) > 1:
        # one SUBPROCESS per seed: at 2x102k spots a second in-process
        # train hits TPU RESOURCE_EXHAUSTED (the first run's device
        # buffers outlive it through jit caches / allocator
        # fragmentation — observed 2026-08-20, quality_atlas_3seed.log
        # seed 2). Each child re-pays prepare_data but compiles warm from
        # the persistent cache; the parent parses and summarizes.
        import re
        import subprocess

        means, finites = [], []
        for seed in seeds:
            env = dict(os.environ)
            env["SPADOT_SEEDS"] = str(seed)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                env=env, capture_output=True, text=True,
            )
            sys.stdout.write(proc.stdout)
            sys.stderr.write(proc.stderr[-4000:])
            if proc.returncode != 0:
                print(f"seed {seed}: FAILED rc={proc.returncode}", flush=True)
                continue
            m = re.search(r"mean domain ARI: (-?[0-9.]+)", proc.stdout)
            f = re.search(r"finite: (True|False)", proc.stdout)
            if m:
                means.append(float(m.group(1)))
                finites.append(f and f.group(1) == "True")
        print(f"\n=== atlas-scale quality across {len(means)}/{len(seeds)} "
              f"seed(s) ({n_tp} tps x {n} spots, {genes} genes, {epochs} "
              f"epochs) ===")
        print(f"per-seed mean domain ARI: {np.round(means, 4).tolist()}   "
              f"all finite: {all(finites) if finites else False}")
        if len(means) > 1:
            print(f"mean ARI: {np.mean(means):.4f} ± "
                  f"{np.std(means, ddof=1):.4f}")
        sys.exit(0 if len(means) == len(seeds) else 1)

    def one_seed(seed):
        scfg = dict(cfg)
        scfg["seed"] = seed
        set_seed(seed)
        data = prepare_data(adata, scfg)
        t0 = time.time()
        trainer, variables, _, _, loss_df = train_spadot(data, scfg)
        wall = time.time() - t0
        lat = get_latent(trainer, variables, data, adata)

        aris = []
        for tp in trainer.timepoints:
            rows = lat.obs["timepoint"].to_numpy() == tp
            X = np.asarray(lat.X[rows])
            _, labels, _ = kmeans_fit(
                jax.random.PRNGKey(7), X, int(scfg["n_clusters"]),
                n_init=10, n_iter=100,
            )
            aris.append(
                adjusted_rand_score(
                    np.asarray(labels), lat.obs["true_domain"].to_numpy()[rows]
                )
            )
        finite = bool(np.isfinite(loss_df.to_numpy(dtype=np.float64)).all())
        print(f"\n--- seed {seed}: {n_tp} tps x {n} spots, {genes} genes, "
              f"{epochs} epochs ---")
        print(f"train wall: {wall:.0f}s   loss trajectory finite: {finite}")
        for tp, a in zip(trainer.timepoints, aris):
            print(f"  tp {tp}: ARI {a:.4f}")
        print(f"mean domain ARI: {np.mean(aris):.4f}", flush=True)
        print("final-epoch losses:")
        print(loss_df.tail(1).to_string(index=False), flush=True)
        return float(np.mean(aris)), finite

    means, finites = [], []
    for seed in seeds:
        m, f = one_seed(seed)
        means.append(m)
        finites.append(f)

    print(f"\n=== atlas-scale quality across {len(seeds)} seed(s) "
          f"({n_tp} tps x {n} spots, {genes} genes, {epochs} epochs) ===")
    print(f"per-seed mean domain ARI: {np.round(means, 4).tolist()}   "
          f"all finite: {all(finites)}")
    if len(means) > 1:
        print(f"mean ARI: {np.mean(means):.4f} ± {np.std(means, ddof=1):.4f}")


if __name__ == "__main__":
    main()
