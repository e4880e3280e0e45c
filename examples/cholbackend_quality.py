"""SVGP triangular-inverse backend quality gate (round-3 perf work).

`svgp_chol_backend: auto` resolves to the BLOCKED backend on TPU since
round 4 (gemm-panel Cholesky + fused log-series inverse,
ops/tri_inverse.py:blocked_cholesky_inv — its own 5-seed gate is
quality_blocked_5seed.log via examples/quality_multiseed.py
SPADOT_AB_CFG; this script remains the xla-vs-series standing evidence
from round 3: CH bench 0.1245 -> 0.1142). The series is an EXACT
finite identity whose only numerical difference from the trsm it replaces
is summation order (residual ~1e-8 at training shapes, and still trsm-grade
at the collapsed-dim ||B|| ~ 1e10 worst case — tests/test_pallas.py), so
the expected quality delta is nil; this script is the standing evidence:
train the SAME data + seed under both backends and compare domain-recovery
ARI, loss trajectories, and finiteness over a full run.

Usage: python examples/cholbackend_quality.py [n_spots_per_tp] [epochs] [genes]
Env:   SPADOT_CHOL_ARMS="xla,blocked" — override the two compared backends
       (any pair of xla | series | blocked | blocked2).
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
    arm_a, arm_b = os.environ.get("SPADOT_CHOL_ARMS", "xla,series").split(",")
    loss_x, ari_x, wall_x, _ = run({"svgp_chol_backend": arm_a}, adata, base)
    loss_s, ari_s, wall_s, _ = run(
        {"svgp_chol_backend": arm_b}, adata, base
    )

    print(f"\n=== svgp_chol_backend quality at n = {n} spots,"
          f" {epochs} epochs ===")
    print("backend            mean ARI   wall")
    print(f"{arm_a:<18s}{ari_x:.4f}   ({wall_x:.0f}s)")
    print(f"{arm_b:<18s}{ari_s:.4f}   ({wall_s:.0f}s)  "
          f"(ARI delta {ari_s - ari_x:+.4f})")
    cols = [c for c in loss_x.columns if c != "epoch"]
    print(f"mean per-epoch |rel delta| per loss component ({arm_b} vs {arm_a}):")
    for c in cols:
        x = loss_x[c].to_numpy()
        s = loss_s[c].to_numpy()
        assert np.isfinite(s).all(), f"{arm_b} arm non-finite in {c}"
        denom = np.maximum(np.abs(x), 1e-6)
        print(f"  {c:10s} {np.mean(np.abs(s - x) / denom):.4f}")


if __name__ == "__main__":
    main()
