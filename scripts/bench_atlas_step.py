"""Decompose the atlas-scale training-step cost into its components.

The atlas epoch measures ~90 ms per batch step almost INDEPENDENT of the
GAT subgraph size (window 8192 / closure 7680 / closure 4864 all land at
90-110 ms/step — bench logs, round 3), which contradicts an
attention-FLOPs-bound model. This microbenchmark times each component of
one batch step in isolation at atlas shapes (fwd+bwd where applicable):

  - dense-adjacency GAT layer (ops/gat.py:gat_attention_dense) at the three
    subgraph sizes, at 'highest' and 'default' matmul precision;
  - the per-step window/closure adjacency scatter build;
  - the closure row gather Y[ext_idx];
  - svgp_batch_terms fwd+bwd at (batch, m) = (4096, 600) x 10 latent dims;
  - decoder + SVGP encoder fwd+bwd at batch 4096.

Usage: python scripts/bench_atlas_step.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/spadot_jax_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_matmul_precision", "highest")

    from spadot_tpu.ops.gat import gat_attention_dense

    rng = np.random.default_rng(0)
    H, F = 4, 512
    G = 2954

    # --- dense GAT layer at the three observed subgraph sizes -------------
    for P in (4864, 7680, 8192):
        h = jnp.asarray(rng.normal(size=(P, 2 * F)).astype(np.float32))
        W = jnp.asarray(rng.normal(size=(2 * F, H * F)).astype(np.float32) * 0.02)
        a_s = jnp.asarray(rng.normal(size=(H, F)).astype(np.float32) * 0.02)
        a_d = jnp.asarray(rng.normal(size=(H, F)).astype(np.float32) * 0.02)
        b = jnp.zeros((H * F,), jnp.float32)
        adj = np.zeros((P, P), np.int8)
        idx = rng.integers(0, P, size=(P, 31))
        adj[np.arange(P)[:, None], idx] = 1
        adj[np.arange(P), np.arange(P)] = 1
        adj = jnp.asarray(adj)

        for prec in ("highest", "default"):
            def loss(h, W, a_s, a_d):
                with jax.default_matmul_precision(prec):
                    return jnp.sum(
                        gat_attention_dense(h, adj, W, a_s, a_d, b) ** 2
                    )

            fwdbwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
            ms = timed(fwdbwd, h, W, a_s, a_d)
            print(f"dense GAT layer fwd+bwd  P={P:5d} prec={prec:8s}: {ms:7.2f} ms")

    # --- adjacency scatter build ------------------------------------------
    for P in (4864, 8192):
        loc_nbr = jnp.asarray(rng.integers(0, P, size=(P, 31)).astype(np.int32))
        loc_mask = jnp.ones((P, 31), jnp.float32)

        @jax.jit
        def build(loc_nbr, loc_mask):
            rows = jnp.broadcast_to(jnp.arange(P)[:, None], loc_nbr.shape)
            adj = jnp.zeros((P, P), jnp.int8)
            return adj.at[rows, loc_nbr].max(loc_mask.astype(jnp.int8))

        print(f"adj scatter build        P={P:5d}: "
              f"{timed(build, loc_nbr, loc_mask):7.2f} ms")

    # --- closure row gather ------------------------------------------------
    n = 102400
    Y = jnp.asarray(rng.normal(size=(n, G)).astype(np.float32))
    for P in (4864, 7680):
        ext = jnp.asarray(np.sort(rng.choice(n, P, replace=False)).astype(np.int32))
        g = jax.jit(lambda Y, ext: Y[ext])
        print(f"row gather (P, {G})      P={P:5d}: {timed(g, Y, ext):7.2f} ms")

    # --- SVGP batch terms --------------------------------------------------
    from spadot_tpu.ops.svgp import svgp_batch_terms, svgp_shared

    m, bsz, L = 600, 4096, 10
    Z = jnp.asarray(rng.uniform(-2, 2, size=(m, 2)).astype(np.float32))
    state = svgp_shared(Z, "Gaussian", 0.1)
    x_b = jnp.asarray(rng.uniform(-2, 2, size=(bsz, 2)).astype(np.float32))
    qm = jnp.asarray(rng.normal(size=(bsz, L)).astype(np.float32))
    qv = jnp.abs(jnp.asarray(rng.normal(size=(bsz, L)).astype(np.float32))) + 0.5
    msk = jnp.ones((bsz,), jnp.float32)

    for prec in ("highest", "high", "default"):
        def svgp_loss(qm, qv, _prec=prec):
            t = svgp_batch_terms(
                x_b, qm, qv, msk, 102400.0, state["Z"], state["K_mm"],
                state["L_mm"], kernel_scale=0.1, jitter=1e-2,
                kernel_type="Gaussian", matmul_precision=_prec,
            )
            return jnp.sum(t["recon"]) + jnp.sum(t["kl"]) + jnp.sum(t["p_m"] ** 2)

        fb = jax.jit(jax.grad(svgp_loss, argnums=(0, 1)))
        out = fb(qm, qv)
        finite = bool(jnp.all(jnp.isfinite(out[0])) & jnp.all(jnp.isfinite(out[1])))
        print(f"svgp_batch_terms fwd+bwd (b={bsz}, m={m}, L={L}) prec={prec:8s}: "
              f"{timed(fb, qm, qv):7.2f} ms  finite={finite}")

    # --- encoder/decoder at batch 4096 ------------------------------------
    import flax.linen as nn

    from spadot_tpu.models.layers import Decoder, SVGPEncoder

    enc = SVGPEncoder(hidden_dims=(256, 64), z_dim=10)
    dec = Decoder(hidden_dims=(64, 256), output_dim=G)
    y_b = jnp.asarray(rng.normal(size=(bsz, G)).astype(np.float32))
    z_b = jnp.asarray(rng.normal(size=(bsz, 20)).astype(np.float32))
    ev = enc.init(jax.random.PRNGKey(0), y_b, train=False)
    dv = dec.init(jax.random.PRNGKey(1), z_b)

    def enc_loss(p):
        mu, var = enc.apply({"params": p["params"],
                             "batch_stats": ev.get("batch_stats", {})},
                            y_b, train=False)
        return jnp.sum(mu ** 2) + jnp.sum(var)

    def dec_loss(p):
        return jnp.sum(dec.apply(p, z_b) ** 2)

    print(f"SVGP encoder fwd+bwd (b={bsz}, G={G}): "
          f"{timed(jax.jit(jax.grad(enc_loss)), ev):7.2f} ms")
    print(f"decoder fwd+bwd      (b={bsz}, G={G}): "
          f"{timed(jax.jit(jax.grad(dec_loss)), dv):7.2f} ms")


if __name__ == "__main__":
    main()
