"""Microbench: banded closure GAT paths at atlas shapes (fwd+bwd, 1 layer).

Compares, at the RCM-banded receptive-closure operating point
(P = ni*512 rows, band padding 512, Wb = 1536 — data/graph.py:
rcm_reorder_tables measured band <= 508 at atlas scale):

  - XLA banded (ops/gat.py:gat_attention_banded — materializes the
    (ni, Wb, H, F) strip views and (ni, TI, Wb, H) softmax tensors in HBM)
  - fused banded kernel (ops/gat_flash.py:gat_attention_banded_flash —
    flash3b: no strip views, band-local wx streaming)
  - head-fused dense kernel (gat_attention_dense_flash3 — the previous
    closure default, full P^2 sweep) as the baseline to beat

Usage: python scripts/bench_banded.py [P ...]  (default 4608 7680 8192)
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

H, F = 4, 512
F_IN = 2048
TI = 512


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def banded_mask(rng, ni, bpad, k=31):
    """Synthetic in-band adjacency: each row gets k neighbors within the
    band plus its self-loop (matches atlas K and band statistics)."""
    wb = TI + 2 * bpad
    P = ni * TI
    adj = np.zeros((ni, TI, wb), np.int8)
    rows = np.arange(P)
    offs = rng.integers(-bpad, bpad + 1, size=(P, k))
    offs = np.clip(offs, -rows[:, None], P - 1 - rows[:, None])
    s = rows // TI
    r_in = rows % TI
    c_in = offs + r_in[:, None] + bpad
    adj[np.repeat(s, k), np.repeat(r_in, k), c_in.ravel()] = 1
    adj[s, r_in, r_in + bpad] = 1  # self-loops
    return adj


def main():
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/spadot_jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spadot_tpu.ops.gat import gat_attention_banded, gat_attention_dense
    from spadot_tpu.ops import gat_flash

    sizes = [int(a) for a in sys.argv[1:]] or [4608, 7680, 8192]
    rng = np.random.default_rng(0)
    bpad = 512
    print(f"platform: {jax.devices()[0].platform}  "
          f"flash3b supported: {gat_flash.flash3b_gat_supported()}")

    for P in sizes:
        ni = P // TI
        assert P % TI == 0
        adjb = jnp.asarray(banded_mask(rng, ni, bpad))
        adj_sq = np.zeros((P, P), np.int8)
        # equivalent square mask for the dense baseline
        a = np.asarray(adjb)
        for s in range(ni):
            lo = s * TI - bpad
            for r in range(TI):
                cols = np.nonzero(a[s, r])[0] + lo
                cols = cols[(cols >= 0) & (cols < P)]
                adj_sq[s * TI + r, cols] = 1
        adj_sq = jnp.asarray(adj_sq)
        h = jnp.asarray(rng.normal(size=(P, F_IN)).astype(np.float32))
        W = jnp.asarray(rng.normal(size=(F_IN, H * F)).astype(np.float32) * 0.02)
        a_s = jnp.asarray(rng.normal(size=(H, F)).astype(np.float32) * 0.1)
        a_d = jnp.asarray(rng.normal(size=(H, F)).astype(np.float32) * 0.1)
        b = jnp.zeros((H * F,), jnp.float32)

        for prec in ("default", "highest"):
            def mk(fn, mask):
                def loss(h, W, a_s, a_d):
                    with jax.default_matmul_precision(prec):
                        return jnp.sum(fn(h, mask, W, a_s, a_d, b) ** 2)
                return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

            t_x = timed(mk(gat_attention_banded, adjb), h, W, a_s, a_d)
            row = [f"P={P:5d} prec={prec:8s} xla_banded={t_x:7.2f}"]
            if gat_flash.flash3b_gat_supported():
                t_f = timed(
                    mk(gat_flash.gat_attention_banded_flash, adjb),
                    h, W, a_s, a_d,
                )
                row.append(f"flash3b={t_f:7.2f}")
            if (jax.default_backend() == "tpu"
                    and gat_flash.flash3_gat_supported()):
                t_d = timed(
                    mk(gat_flash.gat_attention_dense_flash3, adj_sq),
                    h, W, a_s, a_d,
                )
                row.append(f"flash3_dense={t_d:7.2f}")
            else:
                t_d = timed(mk(gat_attention_dense, adj_sq), h, W, a_s, a_d)
                row.append(f"xla_dense={t_d:7.2f}")
            print("  ".join(row) + " ms")


if __name__ == "__main__":
    main()
