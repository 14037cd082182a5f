"""GP kernels (pure functions).

The reference uses sklearn's ``RBF()`` (``BayesianOptimization.py:154``) and
gpytorch's ``RBFKernel`` (``gp_regression.py:166``): both
``k(a, b) = s² · exp(-½ ‖a-b‖²/ℓ²)``. A Jaccard-distance RBF over mask
overlap is defined but never wired in by the reference
(``BayesianOptimization.py:239-324``, RBF chosen at ``:154``); we provide a
vectorized equivalent for completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def sq_dists(x1: Array, x2: Array) -> Array:
    """Pairwise squared distances [N, M] between [N, D] and [M, D].

    The cross-term matmul runs at HIGHEST precision: TPU matmuls default to
    bf16 inputs, and a bf16-noisy gram matrix loses positive-definiteness,
    NaN-ing the downstream Cholesky (observed at 224² scale).
    """
    a = jnp.sum(x1 * x1, axis=1)[:, None]
    b = jnp.sum(x2 * x2, axis=1)[None, :]
    cross = jnp.matmul(x1, x2.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a + b - 2.0 * cross, 0.0)


def rbf_kernel(
    x1: Array, x2: Array, lengthscale: Array, outputscale: Array = 1.0
) -> Array:
    """Squared-exponential kernel, sklearn/gpytorch convention."""
    d2 = sq_dists(x1 / lengthscale, x2 / lengthscale)
    return outputscale * jnp.exp(-0.5 * d2)


def rbf_kernel_1d(grid: Array, lengthscale: Array, outputscale: Array = 1.0) -> Array:
    """RBF gram matrix of a 1-D coordinate vector (for Kronecker grids).

    The separable 2-D RBF factorizes: K((i,j),(i',j')) = K1(i,i')·K2(j,j')
    with outputscale folded into one factor.
    """
    d = grid[:, None] - grid[None, :]
    return outputscale * jnp.exp(-0.5 * (d / lengthscale) ** 2)


def jaccard_rbf_kernel(
    masks1: Array, masks2: Array, lengthscale: Array, outputscale: Array = 1.0
) -> Array:
    """RBF with Euclidean distance replaced by Jaccard distance between mask
    keep-areas — the reference's dormant ``JaccardDistRBF``
    (``BayesianOptimization.py:194-324``), vectorized: the O(n²·H·W) Python
    pixel loops become two einsums.

    Args:
      masks1: bool[N, H, W]; masks2: bool[M, H, W].
    """
    f1 = masks1.reshape(masks1.shape[0], -1).astype(jnp.float32)
    f2 = masks2.reshape(masks2.shape[0], -1).astype(jnp.float32)
    inter = f1 @ f2.T
    area1 = jnp.sum(f1, axis=1)[:, None]
    area2 = jnp.sum(f2, axis=1)[None, :]
    union = area1 + area2 - inter
    jaccard_dist = 1.0 - inter / jnp.maximum(union, 1.0)
    return outputscale * jnp.exp(-0.5 * jaccard_dist / (lengthscale**2))
