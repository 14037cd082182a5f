"""Acquisition functions (closed form, vectorized, on device).

Reference: ``BayesianOptimization.py:16-54`` computes EI point-by-point under
scipy, then maximizes it with an L-BFGS-B run *per integer start point*
(``:85-90``) — hundreds of host optimizer calls per BO step for a 1-D integer
search space. Here EI is evaluated for ALL candidate indices in one
vectorized GP posterior call and the argmax is exact.

The reference's ``expected_improvement[sigma == 0.0] == 0.0`` no-op bug
(``:52``) is implemented as the intended assignment.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from network_interpretation_imagenet_tpu.gp import exact

Array = jax.Array


def expected_improvement(
    mu: Array, sigma: Array, evaluated_loss: Array, greater_is_better: bool = False
) -> Array:
    """Closed-form EI given GP posterior (μ, σ) at candidate points.

    Sign conventions follow the reference: returns the (positive) expected
    improvement; maximizing it proposes the next sample.
    """
    loss_optimum = jnp.where(
        greater_is_better, jnp.max(evaluated_loss), jnp.min(evaluated_loss)
    )
    scale = jnp.where(greater_is_better, 1.0, -1.0)
    safe_sigma = jnp.where(sigma > 0, sigma, 1.0)
    z = scale * (mu - loss_optimum) / safe_sigma
    ei = scale * (mu - loss_optimum) * jax.scipy.stats.norm.cdf(
        z
    ) + safe_sigma * jax.scipy.stats.norm.pdf(z)
    # Intended semantics of the reference's no-op line (BO.py:52).
    return jnp.where(sigma > 0, ei, 0.0)


def ei_over_candidates(
    fit: exact.GPFit,
    candidates: Array,
    evaluated_loss: Array,
    greater_is_better: bool = True,
) -> Array:
    """EI at every candidate (one vectorized posterior evaluation)."""
    mu, sigma = exact.predict(fit, candidates)
    return expected_improvement(mu, sigma, evaluated_loss, greater_is_better)
