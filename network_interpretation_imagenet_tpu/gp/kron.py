"""Exact GP over the full H×W pixel grid via Kronecker eigenstructure.

The reference approximates the 224² = 50k-point pixel surrogate with KISS-GP
grid interpolation (``gp_regression.py:167-168`` grid 30;
``gp_superpixel_data_imagenet.py:414`` grid 300) because a dense 50k-point
Cholesky is O(n³)=1.3e14 FLOPs. On a regular grid the separable RBF kernel
factorizes K = K_h ⊗ K_w, so eigendecomposing two 224×224 matrices gives the
EXACT posterior mean, variance, and marginal likelihood in a handful of
H×H/W×W matmuls (MXU work) — an exact solve cheaper than the reference's
approximation:

  K_h = Q_h Λ_h Q_hᵀ,  K_w = Q_w Λ_w Q_wᵀ,  λ_ab = λ_h[a]·λ_w[b]
  ỹ   = Q_hᵀ Y Q_w
  α̃   = ỹ / (λ + σ²)
  mean = Q_h (λ ⊙ α̃) Q_wᵀ                        (at the training grid)
  var  = k(0) − (Q_h∘Q_h) [λ²/(λ+σ²)] (Q_w∘Q_w)ᵀ
  −2·MLL = Σ ỹ²/(λ+σ²) + Σ log(λ+σ²) + n·log 2π

Hyperparameters (lengthscale, outputscale, noise, constant mean) train with
Adam exactly as the reference's 20×lr-0.1 loop (``gp_regression.py:179-224``),
but against the exact MLL.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from network_interpretation_imagenet_tpu.gp.kernels import rbf_kernel_1d

Array = jax.Array


class KronGPParams(NamedTuple):
    log_lengthscale: Array
    log_outputscale: Array
    log_noise: Array
    mean_const: Array


def init_params(
    lengthscale: float = 20.0,
    outputscale: float = 1.0,
    noise: float = 0.1,
    mean_const: float = 0.0,
) -> KronGPParams:
    return KronGPParams(
        jnp.log(jnp.asarray(lengthscale, jnp.float32)),
        jnp.log(jnp.asarray(outputscale, jnp.float32)),
        jnp.log(jnp.asarray(noise, jnp.float32)),
        jnp.asarray(mean_const, jnp.float32),
    )


def _eigs(params: KronGPParams, h: int, w: int):
    ls = jnp.exp(params.log_lengthscale)
    os_ = jnp.exp(params.log_outputscale)
    # outputscale folded into the H factor; W factor unit-scale.
    kh = rbf_kernel_1d(jnp.arange(h, dtype=jnp.float32), ls, os_)
    kw = rbf_kernel_1d(jnp.arange(w, dtype=jnp.float32), ls, 1.0)
    lam_h, qh = jnp.linalg.eigh(kh)
    lam_w, qw = jnp.linalg.eigh(kw)
    lam = jnp.maximum(lam_h[:, None] * lam_w[None, :], 0.0)  # [H, W]
    return qh, qw, lam


def neg_mll(params: KronGPParams, y_grid: Array) -> Array:
    """Exact negative log marginal likelihood of the grid observations."""
    h, w = y_grid.shape
    qh, qw, lam = _eigs(params, h, w)
    noise = jnp.exp(params.log_noise)
    yc = y_grid - params.mean_const
    yt = qh.T @ yc @ qw
    denom = lam + noise
    quad = jnp.sum(yt * yt / denom)
    logdet = jnp.sum(jnp.log(denom))
    n = h * w
    return 0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))


def posterior(params: KronGPParams, y_grid: Array) -> Tuple[Array, Array]:
    """Exact posterior mean and variance at every training-grid point."""
    h, w = y_grid.shape
    qh, qw, lam = _eigs(params, h, w)
    noise = jnp.exp(params.log_noise)
    os_ = jnp.exp(params.log_outputscale)
    yc = y_grid - params.mean_const
    yt = qh.T @ yc @ qw
    denom = lam + noise
    alpha_t = yt / denom
    mean = qh @ (lam * alpha_t) @ qw.T + params.mean_const
    m = lam * lam / denom  # λ²/(λ+σ²)
    var = os_ - (qh * qh) @ m @ (qw * qw).T
    var = jnp.maximum(var, 1e-12)
    return mean, var


def fit_adam(
    y_grid: Array,
    params: KronGPParams | None = None,
    iters: int = 20,
    lr: float = 0.1,
) -> Tuple[KronGPParams, Array]:
    """Adam hyperparameter optimization of the exact MLL (reference trains 20
    iters of Adam(0.1) on the gpytorch MLL, ``gp_regression.py:179-224``).

    Returns (params, per-iter loss history). Fully jitted: the optimizer loop
    is a `lax.scan`.
    """
    if params is None:
        params = init_params()
    opt = optax.adam(lr)

    @jax.jit
    def run(p0, y):
        state0 = opt.init(p0)

        def step(carry, _):
            p, s = carry
            loss, grads = jax.value_and_grad(neg_mll)(p, y)
            updates, s = opt.update(grads, s)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (p_final, _), losses = jax.lax.scan(step, (p0, state0), None, length=iters)
        return p_final, losses

    return run(params, jnp.asarray(y_grid, jnp.float32))


def predict_offgrid(
    params: KronGPParams, y_grid: Array, points: Array
) -> Array:
    """Posterior mean at arbitrary (row, col) float points.

    Uses the separable cross-kernel: k*(t) = k_h(t_r, ·) ⊗ k_w(t_c, ·),
    mean*(t) = k_h(t_r) · A · k_w(t_c)ᵀ with A = unvec((K+σ²I)⁻¹ y).
    """
    h, w = y_grid.shape
    qh, qw, lam = _eigs(params, h, w)
    noise = jnp.exp(params.log_noise)
    ls = jnp.exp(params.log_lengthscale)
    os_ = jnp.exp(params.log_outputscale)
    yc = y_grid - params.mean_const
    yt = qh.T @ yc @ qw
    alpha_grid = qh @ (yt / (lam + noise)) @ qw.T  # [H, W] = unvec(α)

    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    kr = os_ * jnp.exp(-0.5 * ((points[:, 0:1] - rows[None, :]) / ls) ** 2)
    kc = jnp.exp(-0.5 * ((points[:, 1:2] - cols[None, :]) / ls) ** 2)
    mean = jnp.einsum("ph,hw,pw->p", kr, alpha_grid, kc)
    return mean + params.mean_const
