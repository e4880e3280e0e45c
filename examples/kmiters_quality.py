"""Quality gate for capping the warm-refresh Lloyd iterations.

`kmeans_refresh_warm_iters` bounds the early-stopping Lloyd while_loop in
the per-epoch centroid refresh (ops/kmeans.py:_lloyd via kmeans_refit).
The refresh map measured 13.9 ms/ep of the 103.5 ms ChickenHeart device
epoch (docs/tpu_logs/profile_ch_series.log) and each Lloyd iteration is
sequential-dispatch-bound (~1 MFLOP of math), so a low cap buys wall time
if the warm refresh actually runs many iterations. Lloyd is an anytime
algorithm — a mid-flight stop returns valid (slightly less converged)
centroids — but the KMeans loss and OT plans consume them, so the flip
needs a trajectory-level gate, same protocol as the precision gates
(examples/precision_quality.py): identical data + seed, 100 epochs,
compare domain-recovery ARI and final losses.

A single seed is enough to RECORD a neutral A/B (the default was not
flipped — bench_ch_kmiters8.log measured iters=8 wall-neutral, so 100
stays); the repo's flip protocol (kmwarm/svgpgemm gates) is 5-seed, so any
future round that wants to LOWER the default must run the seed loop:

Usage: python examples/kmiters_quality.py [n_spots_per_tp] [epochs] [genes]
Env:   SPADOT_SEEDS="1993,7,42,2024,5" — multi-seed mode (paired per-seed
       deltas, same protocol as examples/quality_multiseed.py; default is
       the single documentation seed 1993).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    genes = int(sys.argv[3]) if len(sys.argv) > 3 else 2954

    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/spadot_jax_cache"
    )
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from _synthetic import make_synthetic_adata
    from windowed_quality import run

    from spadot_tpu.config import default_config

    adata = make_synthetic_adata(
        n_per_tp=n, n_genes=genes, n_tp=4, n_domains=7, seed=3
    )
    base = default_config()
    base.update(
        input_dim=genes, timepoints=[0, 1, 2, 3], maxiter=epochs,
        n_clusters=7,
    )
    seeds = [int(s) for s in os.environ.get("SPADOT_SEEDS", "1993").split(",")]
    aris = {100: [], 8: []}
    for seed in seeds:
        for iters in (100, 8):
            loss, ari, wall, _ = run(
                {"kmeans_refresh_warm_iters": iters}, adata, base, seed=seed
            )
            aris[iters].append(ari)
            last = loss.iloc[-1]
            print(
                f"seed {seed:5d} iters={iters:3d}: ARI {ari:.4f} "
                f"wall {wall:.1f}s final elbo {last['elbo']:.4f} "
                f"Recon {last['Recon']:.4f} KMeans {last['KMeans']:.4f} "
                f"OT {last['OT']:.4f} finite="
                f"{bool(np.isfinite(loss.to_numpy(dtype=float)).all())}",
                flush=True,
            )
    a, c = np.asarray(aris[100]), np.asarray(aris[8])
    d = a - c
    print(f"\niters=100: {a.mean():.4f} ± {a.std(ddof=1) if len(a) > 1 else 0:.4f}")
    print(f"iters=8:   {c.mean():.4f} ± {c.std(ddof=1) if len(c) > 1 else 0:.4f}")
    print(f"paired delta (100-8): {d.mean():+.4f}  per-seed "
          f"{np.round(d, 4).tolist()}")


if __name__ == "__main__":
    main()
