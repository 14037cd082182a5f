"""Exact GP regression on device (Cholesky), sklearn-compatible semantics.

Serves the BO surrogate: the reference fits
``GaussianProcessRegressor(RBF(), alpha=1e-5, n_restarts_optimizer=10,
normalize_y=True)`` on ≤13 points per image
(``BayesianOptimization.py:149-166``). Restart-based hyperparameter search
becomes a *vectorized* marginal-likelihood sweep over a lengthscale grid
(one vmapped Cholesky batch — deterministic, no host round-trips).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from network_interpretation_imagenet_tpu.gp.kernels import rbf_kernel

Array = jax.Array


class GPParams(NamedTuple):
    lengthscale: Array   # scalar
    outputscale: Array   # scalar (signal variance)
    noise: Array         # scalar or [N] (alpha — observation noise variance;
                         # a vector enables per-point noise, e.g. muting
                         # padded slots of a fixed-size buffer with 1e10 —
                         # the fused BO loop instead uses the incremental
                         # state below with identity padding)


class GPFit(NamedTuple):
    """Posterior state after conditioning on (x, y)."""

    params: GPParams
    x: Array             # [N, D]
    chol: Array          # [N, N] lower Cholesky of K + noise·I
    alpha: Array         # [N] (K+noise·I)^{-1} (y - y_mean) / y_std
    y_mean: Array        # scalar normalization (sklearn normalize_y)
    y_std: Array


def _highest_matmul(fn):
    """Build this function's ops at HIGHEST matmul precision: TPU f32
    matmuls default to bf16 multiplies, and the GP solve/predict matvecs
    (tiny, latency-bound — never throughput-relevant) lose the accuracy
    class the near-singular large-lengthscale regime depends on
    (docs/PERFORMANCE.md carried-inverse note; same rule as
    kernels.sq_dists' gram matmul)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


@_highest_matmul
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


@_highest_matmul
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


@_highest_matmul
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


# ---------------------------------------------------------------------------
# Incremental (carried-inverse) exact GP — the fused-BO hot-loop variant
# ---------------------------------------------------------------------------
#
# The fused BO loop (``bo/loop.py``) refits the GP every iteration. A
# Cholesky + triangular solve at n≤23 lowers on TPU to O(n) *sequential*
# vector steps each — measured at ~24 ms/iteration of pure per-op latency
# inside the loop (docs/PERFORMANCE.md round-3 slope analysis). The kernel
# matrix depends only on the observed x positions, so the loop can instead
# carry the INVERSE CHOLESKY FACTOR L⁻¹ and log|K| per lengthscale and
# append each new observation in closed form: the Cholesky–Banachiewicz
# factorization builds L row by row and never revisits previous rows, so a
# bordered append (l₂₁ = L⁻¹b via matvec, l₂₂ = √(1+α−‖l₂₁‖²), one new
# L⁻¹ row) IS a fresh factorization numerically — a handful of batched
# matvec/outer-product ops, no linalg primitives at all. Carrying L⁻¹
# (norm ~ √cond(K)) instead of K⁻¹ (norm ~ cond(K)) is what keeps the
# near-singular large-lengthscale regime (K ≈ all-ones + 1e-5·I) at the
# f32 Cholesky's accuracy class — a carried-K⁻¹ Woodbury variant was
# measured 100× worse there and rejected.
#
# Padding convention (differs from the huge-noise trick used by the
# Cholesky path): not-yet-active buffer slots hold identity rows in K
# (diag 1, off-diag 0) and yn = 0, so L⁻¹ is exactly identity there, the
# padded slots contribute 0 to the MLL quadratic and log-determinant, and
# k* columns are masked to zero. The valid-block posterior and MLL argmax
# over a lengthscale grid match the Cholesky path to f32 tolerance
# (pinned by tests/test_gp.py incremental-vs-Cholesky parity tests).


class IncrementalGPState(NamedTuple):
    """Carried inverse-Cholesky state for ONE lengthscale over a fixed-size
    observation buffer. Batch over lengthscales (and images) with vmap."""

    linv: Array     # [M, M] lower-triangular inverse Cholesky factor of the
                    # identity-padded K + noise·I
    logdet: Array   # scalar log|valid block of K + noise·I|


def incremental_init(max_obs: int) -> IncrementalGPState:
    return IncrementalGPState(jnp.eye(max_obs), jnp.asarray(0.0))


@_highest_matmul
def incremental_add(
    state: IncrementalGPState,
    xs: Array,          # f32[M] observation buffer (AFTER writing x_new)
    slot: Array,        # int32 index just written
    x_new: Array,       # scalar f32, == xs[slot]
    lengthscale: Array,
    noise: float,
) -> IncrementalGPState:
    """Activate buffer slot ``slot``: border the factorization with the RBF
    couplings to the previously-active slots (those before ``slot`` in the
    buffer) and diagonal 1 + noise (outputscale fixed at 1).

    For block-triangular L' = [[L, 0], [l₂₁ᵀ, l₂₂]] the inverse is
    [[L⁻¹, 0], [−l₂₁ᵀL⁻¹/l₂₂, 1/l₂₂]] — slot i's identity row of the
    carried L⁻¹ is replaced in one outer-product update. Rounding can push
    the Schur complement 1+α−‖l₂₁‖² negative in the near-singular regime;
    it is clamped (≥1e-12), matching Cholesky's behavior of a tiny pivot."""
    m = xs.shape[0]
    idx = jnp.arange(m)
    prior = (idx < slot).astype(xs.dtype)    # previously-active slots
    b = jnp.exp(-0.5 * ((x_new - xs) / lengthscale) ** 2) * prior
    e_i = (idx == slot).astype(xs.dtype)
    l21 = state.linv @ b
    schur = (1.0 + noise) - jnp.dot(l21, l21)
    l22 = jnp.sqrt(jnp.maximum(schur, 1e-12))
    new_row = (e_i - l21 @ state.linv) / l22
    linv = state.linv + jnp.outer(e_i, new_row - e_i)
    return IncrementalGPState(linv, state.logdet + 2.0 * jnp.log(l22))


@_highest_matmul
def incremental_mll(
    state: IncrementalGPState, yn: Array, n_valid: Array,
    u: Optional[Array] = None,
) -> Array:
    """Log marginal likelihood of the valid block (yn zero on padded
    slots). Same argmax semantics as :func:`log_marginal_likelihood` with
    per-point noise padding — constant offsets per observation count drop
    out of the lengthscale selection.

    ``u`` optionally supplies the whitened targets ``linv @ yn`` when the
    caller already computed them (the fused loop shares one per-lengthscale
    matvec between MLL and prediction)."""
    if u is None:
        u = state.linv @ yn
    return (
        -0.5 * jnp.dot(u, u)
        - 0.5 * state.logdet
        - 0.5 * n_valid * jnp.log(2.0 * jnp.pi)
    )


@_highest_matmul
def incremental_predict(
    state: IncrementalGPState,
    xs: Array,           # f32[M]
    valid: Array,        # f32[M] 1/0 active mask
    yn: Array,           # f32[M] normalized targets (0 on padding)
    x_test: Array,       # f32[C]
    lengthscale: Array,
    u: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Posterior mean and std at test points, in normalized-y space
    (outputscale 1; caller de-normalizes). ``u`` as in
    :func:`incremental_mll`."""
    k_star = (
        jnp.exp(-0.5 * ((x_test[:, None] - xs[None, :]) / lengthscale) ** 2)
        * valid[None, :]
    )
    if u is None:
        u = state.linv @ yn
    alpha = state.linv.T @ u                 # = K⁻¹ yn
    mean = k_star @ alpha
    v = k_star @ state.linv.T                # [C, M]; σ² = 1 − ‖L⁻¹k*‖²
    var = 1.0 - jnp.sum(v * v, axis=1)
    return mean, jnp.sqrt(jnp.maximum(var, 0.0))


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
