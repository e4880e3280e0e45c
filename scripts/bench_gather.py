"""Microbench: batch-row staging strategies at atlas scale.

Measures the per-step cost of moving rows of the stacked expression matrix
into a training step (reference: SpaDOT/train.py feeds PyG NeighborLoader
batches; here batches are contiguous Morton blocks and closures are
precomputed index tables — data/pipeline.py, data/graph.py):

  a) gather of the (P,) receptive-closure rows, f32 source
  b) same gather from a bf16 copy (the GAT branch consumes these rows only
     through bf16 matmuls when gat_matmul_precision=default)
  c) gather of the contiguous (b,) batch rows (current forward_batch path)
  d) dynamic_slice of the same contiguous batch rows (DMA, no index math)
  e) closure staged as span dynamic_slice + span-local gather

Run on the real TPU: python scripts/bench_gather.py [n] [genes] [P] [b]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 2954
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 7680
    b = int(sys.argv[4]) if len(sys.argv) > 4 else 4096

    rng = np.random.default_rng(0)
    Y = jnp.asarray(rng.normal(size=(n, g)).astype(np.float32))
    Ybf = Y.astype(jnp.bfloat16)
    # closure-shaped indices: batch span plus Morton-local fringe
    start = min(4096 * 3, max(0, n - b))  # clamped for small-n smoke runs
    fringe = rng.integers(max(0, start - 4096), min(n, start + b + 4096), size=P - b)
    ext_idx = np.sort(np.concatenate([np.arange(start, start + b), fringe])).astype(np.int32)
    ext_idx_d = jnp.asarray(ext_idx)
    bidx = jnp.arange(start, start + b, dtype=jnp.int32)
    span = int(1 << int(np.ceil(np.log2(ext_idx.max() - ext_idx.min() + 1))))
    span = min(span, n)
    span_start = int(min(ext_idx.min(), n - span))
    loc_idx = jnp.asarray(ext_idx - span_start)

    gath = jax.jit(lambda A, i: A[i])
    dslice = jax.jit(lambda A, s: jax.lax.dynamic_slice_in_dim(A, s, b, 0))

    def span_gather(A, s, li):
        sp = jax.lax.dynamic_slice_in_dim(A, s, span, 0)
        return sp[li]

    span_g = jax.jit(span_gather)

    res = {
        "a_ext_gather_f32_ms": timeit(gath, Y, ext_idx_d),
        "b_ext_gather_bf16_ms": timeit(gath, Ybf, ext_idx_d),
        "c_batch_gather_f32_ms": timeit(gath, Y, bidx),
        "d_batch_dynslice_f32_ms": timeit(dslice, Y, start),
        "e_ext_span_slice_gather_ms": timeit(span_g, Y, span_start, loc_idx),
    }
    res["span_rows"] = span
    res["platform"] = jax.devices()[0].platform
    for k, v in res.items():
        print(f"{k}: {v if isinstance(v, (int, str)) else round(v, 3)}")


if __name__ == "__main__":
    main()
