"""Pallas TPU kernel for the factored Sinkhorn half-update.

Computes, without materializing the (I, J) cost matrix,

    lse_i = logsumexp_j( (g_j - C_ij)/eps + log dy_j ),
    C_ij  = (|x_i|^2 + |y_j|^2 - 2 x_i . y_j) * inv_s,

as one fused kernel: the grid walks (row tile, col tile); each step issues a
(TI, d) x (d, TJ) MXU matmul for the cost block and folds it into a running
online-softmax (max, sum) accumulator held in VMEM scratch — the same
recurrence flash attention uses for its denominator. The XLA formulation
(ops/sinkhorn_flash.py) materializes each block's logits in HBM between the
matmul and the reduction; here block logits never leave VMEM.

Interface mirrors _block_lse_rows and is differentially tested against it.
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lse_kernel(x0_ref, sq0_ref, x1_ref, add_ref, out_ref, m_ref, s_ref,
                *, inv_eps_s: float, n_col_tiles: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[:] = jnp.zeros_like(s_ref)

    # cost block via MXU: logits = 2*inv_eps_s * x0 @ x1^T - inv_eps_s*sq0 + add
    dot = jnp.dot(x0_ref[:], x1_ref[:].T, preferred_element_type=jnp.float32)
    logits = (2.0 * inv_eps_s) * dot - inv_eps_s * sq0_ref[:] + add_ref[:]
    bm = jnp.max(logits, axis=1, keepdims=True)  # (TI, 1)
    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, bm)
    s_ref[:] = s_ref[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True
    )
    m_ref[:] = m_new

    @pl.when(j == n_col_tiles - 1)
    def _finish():
        out_ref[:] = m_ref[:] + jnp.log(s_ref[:])


def make_lse_rows_pallas(inv_eps_s: float, block_i=256, block_j=512,
                         interpret=False):
    """Build the fused row-logsumexp for one (static) epsilon stage."""

    def run(X0, sq0, X1, add):
        I, d = X0.shape
        J = X1.shape[0]
        bi = min(block_i, max(8, I))
        bj = min(block_j, max(128, J))
        n_i = (I + bi - 1) // bi
        n_j = (J + bj - 1) // bj
        Ip, Jp = n_i * bi, n_j * bj
        # pad: rows with zeros (outputs sliced off), cols with -inf in `add`
        # so padded columns vanish from the logsumexp
        X0p = jnp.pad(X0, ((0, Ip - I), (0, 0)))
        sq0p = jnp.pad(sq0, (0, Ip - I))
        X1p = jnp.pad(X1, ((0, Jp - J), (0, 0)))
        addp = jnp.pad(add, (0, Jp - J), constant_values=-jnp.inf)

        kernel = functools.partial(
            _lse_kernel, inv_eps_s=float(inv_eps_s), n_col_tiles=n_j
        )
        out = pl.pallas_call(
            kernel,
            grid=(n_i, n_j),
            in_specs=[
                pl.BlockSpec((bi, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bi, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bj, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bj), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (bi, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Ip, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((bi, 1), jnp.float32),
                pltpu.VMEM((bi, 1), jnp.float32),
            ],
            interpret=interpret,
        )(X0p, sq0p[:, None], X1p, addp[None, :])
        return out[:I, 0]

    return run


def lse_rows_reference(X0, sq0, X1, add, inv_eps_s):
    """Plain-XLA reference of the same computation (for testing)."""
    dot = X0 @ X1.T
    logits = 2.0 * inv_eps_s * dot - inv_eps_s * sq0[:, None] + add[None, :]
    return jax.scipy.special.logsumexp(logits, axis=1)
