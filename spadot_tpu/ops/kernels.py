"""GP covariance kernels as pure JAX functions.

Reference semantics: SpaDOT/model/svgp.py:110-125 (Kernel over torch.cdist:
Gaussian exp(-d^2/scale), Cauchy 1/(1+d^2/scale), Quadratic 1-d^2/(d^2+scale)).

TPU-first design: the pairwise squared distance is computed via the
``|x|^2 + |y|^2 - 2<x,y>`` expansion so the dominant cost is a single MXU
matmul instead of a broadcasted (n, m, d) subtraction that XLA cannot tile.
"""
import jax.numpy as jnp


def sq_dist(x, y):
    """Pairwise squared Euclidean distances. x: (n, d), y: (m, d) -> (n, m)."""
    x2 = jnp.sum(x * x, axis=-1)[:, None]
    y2 = jnp.sum(y * y, axis=-1)[None, :]
    d2 = x2 + y2 - 2.0 * (x @ y.T)
    return jnp.maximum(d2, 0.0)


def kernel_matrix(x, y, kernel_type="Gaussian", scale=0.1):
    d2 = sq_dist(x, y)
    if kernel_type == "Gaussian":
        return jnp.exp(-d2 / scale)
    if kernel_type == "Cauchy":
        return 1.0 / (1.0 + d2 / scale)
    if kernel_type == "Quadratic":
        return 1.0 - d2 / (d2 + scale)
    raise ValueError(f"unknown kernel_type {kernel_type!r}")


def kernel_diag(x, kernel_type="Gaussian", scale=0.1):
    """diag K(x, x) — identically 1 for all three supported kernels."""
    del kernel_type, scale
    return jnp.ones(x.shape[0], dtype=x.dtype)
