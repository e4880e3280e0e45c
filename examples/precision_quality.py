"""GAT matmul-precision quality gate (round-3 perf work).

On TPU, `gat_matmul_precision: default` runs the GAT branch's matmuls as
single-pass bf16 (f32 accumulate) instead of the 3-pass `highest` emulation
— measured 0.234 -> 0.146 s/epoch at ChickenHeart scale and 3.24 -> 1.59
s/tp at atlas scale. The SVGP/KMeans linear algebra keeps its scoped
`highest` precision either way (ops/svgp.py, ops/kmeans.py — bf16 there
produced non-PSD covariances).

This script is the gate for flipping the default: train the SAME data +
seed under both precisions and compare domain-recovery ARI and loss
trajectories.

Usage: python examples/precision_quality.py [n_spots_per_tp] [epochs] [genes]
Results recorded in docs/performance.md.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from windowed_quality import run  # noqa: E402


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

    from spadot_tpu.config import default_config

    # ChickenHeart run shape: 4 timepoints, ~2.5k spots each, 2954 SVGs
    adata = make_synthetic_adata(
        n_per_tp=n, n_genes=genes, n_tp=4, n_domains=7, seed=3
    )
    base = default_config()
    base.update(
        input_dim=genes, timepoints=[0, 1, 2, 3], maxiter=epochs,
        n_clusters=7,
    )
    loss_h, ari_h, wall_h, _ = run(
        {"gat_matmul_precision": "highest"}, adata, base
    )
    loss_d, ari_d, wall_d, _ = run(
        {"gat_matmul_precision": "default"}, adata, base
    )

    print(f"\n=== GAT precision quality at n = {n} spots, {epochs} epochs ===")
    print("mode             mean ARI   wall")
    print(f"highest (3-pass): {ari_h:.4f}   ({wall_h:.0f}s)")
    print(f"default (bf16):   {ari_d:.4f}   ({wall_d:.0f}s)  "
          f"(ARI delta {ari_d - ari_h:+.4f})")
    cols = [c for c in loss_h.columns if c != "epoch"]
    print("mean per-epoch |rel delta| per loss component (default vs highest):")
    for c in cols:
        h = loss_h[c].to_numpy()
        d = loss_d[c].to_numpy()
        denom = np.maximum(np.abs(h), 1e-6)
        print(f"  {c:10s} {np.mean(np.abs(d - h) / denom):.4f}")


if __name__ == "__main__":
    main()
