"""Microbenchmark of the GAT layer execution paths (fwd+bwd, one layer).

Produces the numbers behind docs/performance.md "GAT path selection":
XLA scan-gather (autodiff), XLA + reverse-list backward, dense-adjacency
(H batched n x n MXU matmuls), and the Pallas windowed kernel.

Usage: python scripts/bench_gat_paths.py [n ...]   (default sweep)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from spadot_tpu.data.graph import build_knn_graph, effective_k, reverse_graph
from spadot_tpu.ops.gat import dense_adjacency, gat_attention, gat_attention_dense

H, F = 4, 512
F_IN = 2048


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def bench_n(n, rng):
    xy = rng.uniform(0, 10, size=(n, 2))
    k = effective_k(n, 6, 30)  # config.yaml defaults
    nbr, msk = build_knn_graph(xy, k)
    rev = reverse_graph(nbr, msk)
    h = jnp.asarray(rng.normal(size=(n, F_IN)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(F_IN, H * F)) * 0.02, jnp.float32)
    a_s = jnp.asarray(rng.normal(size=(H, F)) * 0.1, jnp.float32)
    a_d = jnp.asarray(rng.normal(size=(H, F)) * 0.1, jnp.float32)
    b = jnp.zeros((H * F,), jnp.float32)
    nbr, msk = jnp.asarray(nbr), jnp.asarray(msk)
    rev = tuple(jnp.asarray(r) for r in rev)

    def loss_gather(h, W, a_s, a_d, b, use_rev):
        out = gat_attention(h, nbr, msk, W, a_s, a_d, b,
                            rev=(rev if use_rev else None))
        return jnp.sum(out**2)

    adj = jnp.asarray(dense_adjacency(np.asarray(nbr), np.asarray(msk)))

    # adj passed as an ARGUMENT (as the train loop does) — closing over it
    # would embed an n^2 constant in the HLO (remote compile rejects >~100MB)
    def loss_dense(h, adj, W, a_s, a_d, b):
        out = gat_attention_dense(h, adj, W, a_s, a_d, b)
        return jnp.sum(out**2)

    g_auto = jax.jit(jax.grad(lambda *a: loss_gather(*a, False), argnums=(0, 1)))
    g_rev = jax.jit(jax.grad(lambda *a: loss_gather(*a, True), argnums=(0, 1)))
    g_dense = jax.jit(jax.grad(loss_dense, argnums=(0, 2)))

    r = {}
    r["xla_autodiff"] = timed(g_auto, h, W, a_s, a_d, b)
    r["xla_rev"] = timed(g_rev, h, W, a_s, a_d, b)
    r["dense"] = timed(g_dense, h, adj, W, a_s, a_d, b)

    from spadot_tpu.ops.gat_flash import (
        flash2_gat_supported, flash_dense_max_n, flash_gat_supported,
        gat_attention_dense_flash, gat_attention_dense_flash2, pad_adjacency,
    )

    adj_pad = jnp.asarray(pad_adjacency(np.asarray(
        dense_adjacency(np.asarray(nbr), np.asarray(msk)))))
    if flash_gat_supported() and adj_pad.shape[0] <= flash_dense_max_n(F, H):
        def loss_flash(h, adj_pad, W, a_s, a_d, b):
            out = gat_attention_dense_flash(h, adj_pad, W, a_s, a_d, b)
            return jnp.sum(out**2)

        g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 2)))
        r["flash"] = timed(g_flash, h, adj_pad, W, a_s, a_d, b)
    else:
        r["flash"] = float("nan")
    if flash2_gat_supported():
        def loss_flash2(h, adj_pad, W, a_s, a_d, b):
            out = gat_attention_dense_flash2(h, adj_pad, W, a_s, a_d, b)
            return jnp.sum(out**2)

        g_flash2 = jax.jit(jax.grad(loss_flash2, argnums=(0, 2)))
        r["flash2"] = timed(g_flash2, h, adj_pad, W, a_s, a_d, b)
    else:
        r["flash2"] = float("nan")

    # agreement check (dense vs gather forward)
    o1 = gat_attention(h, nbr, msk, W, a_s, a_d, b)
    o2 = gat_attention_dense(h, adj, W, a_s, a_d, b)
    r["max_abs_diff"] = float(jnp.max(jnp.abs(o1 - o2)))
    return k, r


def main():
    ns = [int(a) for a in sys.argv[1:]] or [1000, 2000, 2500, 3500, 4000, 5000]
    rng = np.random.default_rng(0)
    print(f"{'n':>6} {'K':>3} {'xla_auto':>10} {'xla_rev':>10} {'dense':>10}"
          f" {'flash':>10} {'flash2':>10} {'maxdiff':>10}")
    for n in ns:
        k, r = bench_n(n, rng)
        print(f"{n:>6} {k:>3} {r['xla_autodiff']:>10.2f} {r['xla_rev']:>10.2f}"
              f" {r['dense']:>10.2f} {r['flash']:>10.2f} {r['flash2']:>10.2f}"
              f" {r['max_abs_diff']:>10.2e}")


if __name__ == "__main__":
    main()
