"""Windowed-GAT training-quality validation (VERDICT round-1 weak #2).

The windowed batch mode (full_graph_gat: false) restricts GAT message
passing to a contiguous Morton-ordered row window and drops the rare
out-of-window edges (models/model.py). This script quantifies the cost of
that approximation at a scale where the exact full-graph mode still fits:
train both modes on the SAME synthetic data + seed, then compare

  - domain-recovery ARI of the final latents (KMeans vs ground truth),
  - the loss trajectories (per-component relative deltas),
  - the fraction of edges the window drops.

Usage: python examples/windowed_quality.py [n_spots_per_tp] [epochs] [genes]
Appends a results block to stdout; numbers are recorded in
docs/performance.md. The reference's own sampled 2-hop NeighborLoader
subgraphs (_train_utils.py:80-85) are a far coarser approximation.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ari(a, b):
    """Adjusted Rand index (self-contained, no sklearn dependency needed)."""
    from sklearn.metrics import adjusted_rand_score

    return adjusted_rand_score(a, b)


def run(mode_cfg, adata, base_cfg, seed=1993):
    import jax

    from spadot_tpu.data.pipeline import prepare_data
    from spadot_tpu.ops.kmeans import kmeans_fit
    from spadot_tpu.train.loop import get_latent, train_spadot
    from spadot_tpu.utils.rng import set_seed

    cfg = dict(base_cfg)
    cfg.update(mode_cfg)
    set_seed(seed)
    data = prepare_data(adata, cfg)
    t0 = time.time()
    trainer, variables, _, _, loss_df = train_spadot(data, cfg)
    wall = time.time() - t0
    lat = get_latent(trainer, variables, data, adata)
    aris = []
    for tp in trainer.timepoints:
        rows = lat.obs["timepoint"].to_numpy() == tp
        X = np.asarray(lat.X[rows])
        _, labels, _ = kmeans_fit(
            jax.random.PRNGKey(7), X, int(cfg["n_clusters"]), n_init=10, n_iter=100
        )
        aris.append(ari(np.asarray(labels), lat.obs["true_domain"].to_numpy()[rows]))
    return loss_df, float(np.mean(aris)), wall, data


def dropped_edge_fraction(data, window, batch_size):
    """Fraction of graph edges outside the [batch-W, batch+W) training window
    (an upper bound on what windowed mode ignores per step)."""
    total, dropped = 0, 0
    for tp, d in data["tp_data"].items():
        nbr, mask = d["nbr"], d["nbr_mask"]
        n = nbr.shape[0]
        win = min(n, batch_size + 2 * window)
        for s in range(0, n, batch_size):
            start = min(max(s - window, 0), max(n - win, 0))
            rows = slice(s, min(s + batch_size, n))
            rel = nbr[rows] - start
            inside = (rel >= 0) & (rel < win)
            m = mask[rows] > 0
            total += m.sum()
            dropped += (m & ~inside).sum()
    return dropped / max(total, 1)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    genes = int(sys.argv[3]) if len(sys.argv) > 3 else 2954

    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/spadot_jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from _synthetic import make_synthetic_adata

    from spadot_tpu.config import default_config

    adata = make_synthetic_adata(
        n_per_tp=n, n_genes=genes, n_tp=1, n_domains=7, seed=3
    )
    base = default_config()
    base.update(
        input_dim=genes, timepoints=[0], maxiter=epochs, n_clusters=7,
        batch_size=4096,
    )

    window = 2048
    loss_f, ari_f, wall_f, data = run({"full_graph_gat": True}, adata, base)
    # exact receptive-closure mode: mathematically identical batch outputs
    # to full-graph (tests/test_exact_batches.py) — deltas here are pure
    # float roundoff + the KMeans refresh RNG path
    loss_e, ari_e, wall_e, _ = run(
        {"full_graph_gat": False, "gat_exact_batches": "true"}, adata, base
    )
    loss_w, ari_w, wall_w, _ = run(
        {"full_graph_gat": False, "gat_window": window,
         "gat_exact_batches": False}, adata, base
    )
    drop = dropped_edge_fraction(data, window, int(base["batch_size"]))

    rel_w = ((loss_w - loss_f).abs() / loss_f.abs().clip(lower=1e-9)).mean(axis=0)
    rel_e = ((loss_e - loss_f).abs() / loss_f.abs().clip(lower=1e-9)).mean(axis=0)
    print("\n=== minibatch-GAT quality at n =", n, "spots,", epochs, "epochs ===")
    print(f"full-graph ARI:  {ari_f:.4f}   ({wall_f:.0f}s)")
    print(f"exact-closure:   {ari_e:.4f}   ({wall_e:.0f}s)  "
          f"(edge-exact; ARI delta {abs(ari_f - ari_e):.4f})")
    print(f"windowed   ARI:  {ari_w:.4f}   ({wall_w:.0f}s)  window={window}  "
          f"(ARI delta {abs(ari_f - ari_w):.4f})")
    print(f"out-of-window edge fraction: {drop:.5f}")
    print("mean per-epoch |rel delta| per loss component (exact | window):")
    for k in rel_w.index:
        print(f"  {k:<10} {rel_e[k]:.4f} | {rel_w[k]:.4f}")


if __name__ == "__main__":
    main()
