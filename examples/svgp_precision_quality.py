"""SVGP matmul-precision quality gate (round-3 perf work).

The SVGP linear algebra is pinned to scoped `highest` precision
(ops/svgp.py) because full bf16 passes once drove the posterior covariance
non-PSD (NaN everywhere). The microbench (scripts/bench_atlas_step.py,
docs/tpu_logs/atlas_step.log) shows the intermediate `high` mode (3-pass
bf16, f32 accumulate) cuts the batch-terms fwd+bwd from 15.4 ms to 12.0 ms
at atlas shapes and stays finite — but finiteness on one shape is not a
quality gate. This script is the gate: train the SAME data + seed under
`highest` and `high` and compare domain-recovery ARI, loss trajectories,
and finiteness over a full run.

Usage: python examples/svgp_precision_quality.py [n_spots_per_tp] [epochs] [genes]
Results recorded in docs/performance.md.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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

    adata = make_synthetic_adata(
        n_per_tp=n, n_genes=genes, n_tp=4, n_domains=7, seed=3
    )
    base = default_config()
    base.update(
        input_dim=genes, timepoints=[0, 1, 2, 3], maxiter=epochs,
        n_clusters=7,
    )
    # generalized gate: SPADOT_PREC_KEY picks the scoped-precision config
    # key under test (svgp_matmul_precision, mlp_matmul_precision, ...),
    # SPADOT_SVGP_CAND the candidate mode ("high" 3-pass / "default" 1-pass)
    key = os.environ.get("SPADOT_PREC_KEY", "svgp_matmul_precision")
    cand = os.environ.get("SPADOT_SVGP_CAND", "high")
    loss_h, ari_h, wall_h, _ = run({key: "highest"}, adata, base)
    loss_3, ari_3, wall_3, _ = run({key: cand}, adata, base)

    print(f"\n=== {key} quality at n = {n} spots, {epochs} epochs ===")
    print("mode             mean ARI   wall")
    print(f"highest (6-pass): {ari_h:.4f}   ({wall_h:.0f}s)")
    print(f"{cand:7s} (cand.) : {ari_3:.4f}   ({wall_3:.0f}s)  "
          f"(ARI delta {ari_3 - ari_h:+.4f})")
    cols = [c for c in loss_h.columns if c != "epoch"]
    print("per-run finiteness:",
          bool(np.isfinite(loss_h[cols].to_numpy()).all()),
          bool(np.isfinite(loss_3[cols].to_numpy()).all()))
    print(f"mean per-epoch |rel delta| per loss component ({cand} vs highest):")
    for c in cols:
        h = loss_h[c].to_numpy()
        d = loss_3[c].to_numpy()
        denom = np.maximum(np.abs(h), 1e-6)
        print(f"  {c:10s} {np.mean(np.abs(d - h) / denom):.4f}")


if __name__ == "__main__":
    main()
