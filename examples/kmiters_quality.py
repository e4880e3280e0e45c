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

Usage: python examples/kmiters_quality.py [n_spots_per_tp] [epochs] [genes]
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
    loss_f, ari_f, wall_f, _ = run(
        {"kmeans_refresh_warm_iters": 100}, adata, base
    )
    loss_c, ari_c, wall_c, _ = run(
        {"kmeans_refresh_warm_iters": 8}, adata, base
    )
    print(f"iters=100: ARI {ari_f:.4f}  wall {wall_f:.1f}s")
    print(f"iters=8:   ARI {ari_c:.4f}  wall {wall_c:.1f}s")
    for name, df in (("iters=100", loss_f), ("iters=8", loss_c)):
        last = df.iloc[-1]
        print(
            f"{name} final: elbo {last['elbo']:.4f} Recon {last['Recon']:.4f}"
            f" KMeans {last['KMeans']:.4f} OT {last['OT']:.4f}"
            f" finite={bool(np.isfinite(df.to_numpy(dtype=float)).all())}"
        )


if __name__ == "__main__":
    main()
