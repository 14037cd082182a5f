"""Exact GP regression on device (Cholesky), sklearn-compatible semantics.

Serves the BO surrogate: the reference fits
``GaussianProcessRegressor(RBF(), alpha=1e-5, n_restarts_optimizer=10,
normalize_y=True)`` on ≤13 points per image
(``BayesianOptimization.py:149-166``). Restart-based hyperparameter search
becomes a *vectorized* marginal-likelihood sweep over a lengthscale grid
(one vmapped Cholesky batch — deterministic, no host round-trips).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from network_interpretation_imagenet_tpu.gp.kernels import rbf_kernel

Array = jax.Array


class GPParams(NamedTuple):
    lengthscale: Array   # scalar
    outputscale: Array   # scalar (signal variance)
    noise: Array         # scalar or [N] (alpha — observation noise variance;
                         # a vector enables per-point noise, e.g. masking
                         # padded observations out of a fixed-size BO buffer
                         # with noise=1e10)


class GPFit(NamedTuple):
    """Posterior state after conditioning on (x, y)."""

    params: GPParams
    x: Array             # [N, D]
    chol: Array          # [N, N] lower Cholesky of K + noise·I
    alpha: Array         # [N] (K+noise·I)^{-1} (y - y_mean) / y_std
    y_mean: Array        # scalar normalization (sklearn normalize_y)
    y_std: Array


def _train_matrices(params: GPParams, x: Array, y: Array, normalize_y: bool):
    y_mean = jnp.where(normalize_y, jnp.mean(y), 0.0)
    y_std_raw = jnp.std(y)
    y_std = jnp.where(
        normalize_y, jnp.where(y_std_raw > 0, y_std_raw, 1.0), 1.0
    )
    yn = (y - y_mean) / y_std
    k = rbf_kernel(x, x, params.lengthscale, params.outputscale)
    noise_diag = jnp.broadcast_to(params.noise, (x.shape[0],))
    k = k + jnp.diag(noise_diag)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), yn)
    return chol, alpha, yn, y_mean, y_std


def fit(
    params: GPParams, x: Array, y: Array, normalize_y: bool = True
) -> GPFit:
    chol, alpha, _, y_mean, y_std = _train_matrices(params, x, y, normalize_y)
    return GPFit(params, x, chol, alpha, y_mean, y_std)


def log_marginal_likelihood(
    params: GPParams, x: Array, y: Array, normalize_y: bool = True
) -> Array:
    chol, alpha, yn, _, _ = _train_matrices(params, x, y, normalize_y)
    n = x.shape[0]
    return (
        -0.5 * jnp.dot(yn, alpha)
        - jnp.sum(jnp.log(jnp.diagonal(chol)))
        - 0.5 * n * jnp.log(2.0 * jnp.pi)
    )


def predict(fit_state: GPFit, x_test: Array) -> Tuple[Array, Array]:
    """Posterior mean and *std* at test points (sklearn ``return_std=True``
    convention, de-normalized)."""
    p = fit_state.params
    k_star = rbf_kernel(x_test, fit_state.x, p.lengthscale, p.outputscale)
    mean_n = k_star @ fit_state.alpha
    v = jax.scipy.linalg.solve_triangular(
        fit_state.chol, k_star.T, lower=True
    )
    var_n = p.outputscale - jnp.sum(v * v, axis=0)
    var_n = jnp.maximum(var_n, 0.0)
    mean = mean_n * fit_state.y_std + fit_state.y_mean
    std = jnp.sqrt(var_n) * fit_state.y_std
    return mean, std


def fit_lengthscale_sweep(
    x: Array,
    y: Array,
    lengthscale_grid: Array,
    noise: float = 1e-5,
    outputscale: float = 1.0,
    normalize_y: bool = True,
) -> GPFit:
    """Pick the MLL-argmax lengthscale from a candidate grid (vmapped), then
    condition. TPU-native replacement for sklearn's 10-restart L-BFGS
    hyperparameter optimization (``BayesianOptimization.py:156-159``)."""

    def mll_of(ls):
        return log_marginal_likelihood(
            GPParams(ls, jnp.asarray(outputscale), jnp.asarray(noise)),
            x, y, normalize_y,
        )

    mlls = jax.vmap(mll_of)(lengthscale_grid)
    best = jnp.nanargmax(mlls)
    params = GPParams(
        lengthscale_grid[best], jnp.asarray(outputscale), jnp.asarray(noise)
    )
    return fit(params, x, y, normalize_y)
