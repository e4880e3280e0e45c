"""Multi-seed composite-precision quality study.

Each scoped precision default (gat/svgp/mlp) cleared its own single-seed
quality gate, but the golden-run refresh under the COMPOSITE speed defaults
measured mean domain ARI 0.961 vs 0.982 for the high-precision fixtures
(docs/tpu_logs/golden_refresh.log) — one seed, so it could be run-to-run
noise or a real compounding cost. This study answers that: train the
`fast` and `parity` precision presets (config.py:_PRECISION_PRESETS) on the
SAME ChickenHeart-shaped data across several training seeds and compare the
paired per-seed ARI deltas to the across-seed spread.

Shapes are identical across seeds and arms, so after the first run per arm
every train is a persistent-compile-cache hit (~15 s each on the v5e).

Usage: python examples/quality_multiseed.py [n_per_tp] [epochs] [genes] [n_tp]
       (n_tp defaults to the ChickenHeart 4; the mouse-scale gate — round-4
       verdict Next #4 — runs `3400 100 9281 3`, the MouseOrganogenesis run
       shape per SURVEY §6)
Env:   SPADOT_SEEDS="1993,7,42,2024,5"  (training seeds; data seed fixed)
       SPADOT_AB_CFG='{"kmeans_refresh_warm": true}' — switch the study to
       arm A = shipped defaults vs arm B = defaults + these overrides
       (instead of the fast-vs-parity precision arms).
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
    n_tp = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    seeds = [int(s) for s in os.environ.get(
        "SPADOT_SEEDS", "1993,7,42,2024,5").split(",")]

    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/spadot_jax_cache"
    )
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from _synthetic import make_synthetic_adata

    from spadot_tpu.config import apply_precision_preset, default_config

    # default: ChickenHeart run shape — 4 timepoints, ~2.5k spots each
    adata = make_synthetic_adata(
        n_per_tp=n, n_genes=genes, n_tp=n_tp, n_domains=7, seed=3
    )
    base = default_config()
    base.update(
        input_dim=genes, timepoints=list(range(n_tp)), maxiter=epochs,
        n_clusters=7,
        # reference default (1200) at full scale; keep tiny smoke shapes valid
        inducing_point_nums=min(1200, 2 * n),
    )

    ab_json = os.environ.get("SPADOT_AB_CFG")
    if ab_json:
        import json

        overrides = json.loads(ab_json)
        print(f"# A/B arms: shipped defaults vs overrides {overrides}",
              flush=True)
        arm_a = apply_precision_preset(dict(base))
        arm_b = apply_precision_preset({**base, **overrides})
        arms = {"base": arm_a, "ab": arm_b}
        arm_names = ("base", "ab")
    else:
        arms = {}
        for preset in ("fast", "parity"):
            cfg = dict(base)
            cfg["precision_preset"] = preset
            arms[preset] = apply_precision_preset(cfg)
        arm_names = ("fast", "parity")

    results = {p: [] for p in arms}
    walls = {p: [] for p in arms}
    for seed in seeds:
        for preset, cfg in arms.items():
            _, ari, wall, _ = run({}, adata, cfg, seed=seed)
            results[preset].append(ari)
            walls[preset].append(wall)
            print(f"seed {seed:5d}  {preset:6s}: ARI {ari:.4f}  ({wall:.0f}s)",
                  flush=True)

    a_name, b_name = arm_names
    a = np.asarray(results[a_name])
    b = np.asarray(results[b_name])
    delta = a - b
    print(f"\n=== {a_name} vs {b_name} across {len(seeds)} seeds "
          f"(n={n}/tp, {n_tp} tps, {genes} genes, {epochs} epochs) ===")
    print(f"{a_name:6s}: {a.mean():.4f} ± {a.std(ddof=1):.4f}"
          f"   per-seed {np.round(a, 4).tolist()}")
    print(f"{b_name:6s}: {b.mean():.4f} ± {b.std(ddof=1):.4f}"
          f"   per-seed {np.round(b, 4).tolist()}")
    print(f"paired delta ({a_name}-{b_name}): {delta.mean():+.4f} ± "
          f"{delta.std(ddof=1):.4f}  per-seed {np.round(delta, 4).tolist()}")
    print(f"mean wall: {a_name} {np.mean(walls[a_name]):.0f}s, "
          f"{b_name} {np.mean(walls[b_name]):.0f}s")


if __name__ == "__main__":
    main()
