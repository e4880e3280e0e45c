"""Analyze-stage wall-clock at atlas scale.

The analyze stage exists FOR the 100k+ regime the training stack supports
(BASELINE.json config 5), but until now only its small-n correctness was
tested — no phase of it had a measured number at the scale it was built
for. This bench times each phase on synthetic latents shaped like an atlas
run (n_tp timepoints x n_per_tp cells, 20-dim latents, 7 domains):

  1. fixed-k KMeans clustering per timepoint (reference semantics:
     SpaDOT/utils/_analyze_utils.py:10-39) on the chosen backend
     ('device' = ops/kmeans.py on the accelerator, 'sklearn' = host parity)
  2. adaptive elbow sweep (17 fits x n_init=10 per tp,
     _analyze_utils.py:42-105) — optional, pass elbow=1; this is the phase
     VERDICT r2 flagged as the 100k pipeline bottleneck on host
  3. domain scatter plots (_analyze_utils.py:140-164)
  4. full-cell OT analysis (_analyze_utils.py:108-138): at 102k x 102k the
     plan (1.05e10 entries) cannot be materialized -> factored Sinkhorn
     (ops/sinkhorn_flash.py), 3 growth iterations, duals persisted +
     blockwise set aggregation into the transition table
  5. transition dotplot (_analyze_utils.py:166-209)

Usage: python scripts/bench_analyze.py [n_per_tp] [n_tp] [backend] [elbow]
SPADOT_BENCH_PHASES (comma list of plots,ot — default both; clustering
always runs since its labels feed OT) skips phases, e.g. a host-sklearn
clustering comparison need not re-pay the OT phase. Prints one wall-clock
line per phase + a total; results are recorded in docs/performance.md.
"""
import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_latents(n_per_tp, n_tp, z_dim=20, n_domains=7, seed=0):
    """Synthetic trained-latent AnnData: per-domain Gaussian blobs in z-space
    with spatially contiguous domains (the shape get_latent emits)."""
    import pandas as pd

    from spadot_tpu.io import AnnData

    rng = np.random.default_rng(seed)
    Xs, coords, tps, doms = [], [], [], []
    for t in range(n_tp):
        xy = rng.uniform(0, 10, size=(n_per_tp, 2)).astype(np.float32)
        dom = (xy[:, 0] * n_domains / 10).astype(int)
        means = rng.normal(0, 2.0, size=(n_domains, z_dim)).astype(np.float32)
        Xs.append(means[dom] + rng.normal(0, 0.4, size=(n_per_tp, z_dim)).astype(np.float32))
        coords.append(xy)
        tps.extend([t] * n_per_tp)
        doms.append(dom)
    return AnnData(
        np.vstack(Xs),
        obs=pd.DataFrame({"timepoint": tps, "true_domain": np.concatenate(doms)}),
        obsm={"spatial": np.vstack(coords)},
    )


def main():
    n_per_tp = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
    n_tp = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    backend = sys.argv[3] if len(sys.argv) > 3 else "device"
    do_elbow = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False

    import jax

    # BENCH_DEVICE=cpu forces CPU (the sandbox force-sets JAX_PLATFORMS=
    # axon,cpu at startup, so the env var alone is ignored — CLAUDE.md)
    if os.environ.get("BENCH_DEVICE", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/spadot_jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from sklearn.metrics import adjusted_rand_score

    from spadot_tpu.analyze.clustering import adaptive_clustering, kmeans_clustering
    from spadot_tpu.analyze.plots import plot_domains, plot_ot
    from spadot_tpu.analyze.transport import ot_analysis

    latent = make_latents(n_per_tp, n_tp)
    out = tempfile.mkdtemp(prefix="spadot_analyze_bench_")
    args = argparse.Namespace(
        output_dir=out, prefix="", n_clusters=[7] * n_tp, analyze_backend=backend
    )
    print(f"# analyze bench: {n_tp} tps x {n_per_tp} cells, backend={backend}, "
          f"device={jax.devices()[0].device_kind}")

    walls = {}
    t0 = time.time()
    clustered = kmeans_clustering(latent, args.n_clusters, backend=backend)
    walls["kmeans_fixed_k"] = time.time() - t0
    aris = [
        adjusted_rand_score(
            clustered.obs.loc[clustered.obs["timepoint"] == tp, "kmeans"],
            clustered.obs.loc[clustered.obs["timepoint"] == tp, "true_domain"],
        )
        for tp in sorted(clustered.obs["timepoint"].unique())
    ]
    print(f"kmeans fixed-k (k=7/tp):      {walls['kmeans_fixed_k']:8.1f} s   "
          f"mean ARI vs truth {np.mean(aris):.3f}")

    if do_elbow:
        eargs = argparse.Namespace(
            output_dir=out, prefix="adaptive_", analyze_backend=backend
        )
        t0 = time.time()
        adaptive_clustering(eargs, latent, backend=backend)
        walls["elbow_sweep"] = time.time() - t0
        print(f"adaptive elbow (17 k x 10 init/tp): {walls['elbow_sweep']:6.1f} s")

    phases = set(
        os.environ.get("SPADOT_BENCH_PHASES", "cluster,plots,ot").split(",")
    )
    spatial = np.asarray(clustered.obsm["spatial"])
    clustered.obs["pixel_x"] = spatial[:, 0]
    clustered.obs["pixel_y"] = spatial[:, 1]

    if "plots" in phases:
        t0 = time.time()
        plot_domains(args, clustered)
        walls["plot_domains"] = time.time() - t0
        print(f"domain plots:                 {walls['plot_domains']:8.1f} s")

    if "ot" in phases:
        # chunk-level progress on stderr: at 102k x 102k the OT phase runs
        # for tens of minutes — without this the log is silent until done
        os.environ.setdefault("SPADOT_OT_VERBOSE", "1")
        t0 = time.time()
        ot_analysis(args, clustered)
        walls["ot_analysis"] = time.time() - t0
        print(f"full-cell OT + tables:        {walls['ot_analysis']:8.1f} s   "
              f"({n_tp - 1} pair(s), 3 growth iters, "
              f"{'factored' if n_per_tp * n_per_tp > 32_000_000 else 'dense'})")

        if "plots" in phases:
            t0 = time.time()
            plot_ot(args, clustered)
            walls["plot_ot"] = time.time() - t0
            print(f"transition dotplots:          {walls['plot_ot']:8.1f} s")

    print(f"TOTAL analyze stage:          {sum(walls.values()):8.1f} s   "
          f"(artifacts in {out})")


if __name__ == "__main__":
    main()
