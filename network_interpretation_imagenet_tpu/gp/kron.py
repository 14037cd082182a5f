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

Work split (TPU-first): the two H×H eigendecompositions are tiny serial
LAPACK work — they run on HOST (cached per lengthscale); everything that
scales with the grid (the Q-basis matmuls, MLL reductions, Adam updates)
runs jitted on device. XLA's eigh both compiles slowly and differentiates
pathologically for near-singular RBF grams, so it is kept out of jit
entirely.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from network_interpretation_imagenet_tpu.gp.kernels import rbf_kernel_1d

Array = jax.Array


@functools.lru_cache(maxsize=64)
def _host_eigs(ls_key: float, size: int):
    """Host eigendecomposition of the unit-outputscale 1-D RBF gram."""
    grid = np.arange(size, dtype=np.float64)
    d = grid[:, None] - grid[None, :]
    k = np.exp(-0.5 * (d / float(ls_key)) ** 2)
    lam, q = np.linalg.eigh(k)
    return (
        np.maximum(lam, 0.0).astype(np.float32),
        q.astype(np.float32),
    )


def _host_factored(ls: float, h: int, w: int):
    ls_key = round(float(ls), 6)
    lam_h, qh = _host_eigs(ls_key, h)
    lam_w, qw = _host_eigs(ls_key, w)
    lam_hat = np.maximum(np.outer(lam_h, lam_w), 0.0)
    return qh, qw, lam_hat


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
    """jnp-traced eigendecomposition — retained for fully-traced exactness
    tests; production paths use the host eigs + device cores below."""
    ls = jnp.exp(params.log_lengthscale)
    os_ = jnp.exp(params.log_outputscale)
    kh = rbf_kernel_1d(jnp.arange(h, dtype=jnp.float32), ls, os_)
    kw = rbf_kernel_1d(jnp.arange(w, dtype=jnp.float32), ls, 1.0)
    lam_h, qh = jnp.linalg.eigh(kh)
    lam_w, qw = jnp.linalg.eigh(kw)
    lam = jnp.maximum(lam_h[:, None] * lam_w[None, :], 0.0)  # [H, W]
    return qh, qw, lam


@jax.jit
def _mll_core(qh, qw, lam_hat, y, os_, noise, mean_const):
    # HIGHEST matmul precision: bf16-default TPU matmuls corrupt the
    # eigenbasis projections enough to break the MLL/posterior math.
    with jax.default_matmul_precision("highest"):
        n = y.shape[0] * y.shape[1]
        denom = os_ * lam_hat + noise
        yt = qh.T @ (y - mean_const) @ qw
        quad = jnp.sum(yt * yt / denom)
        logdet = jnp.sum(jnp.log(denom))
        return 0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))


@jax.jit
def _posterior_core(qh, qw, lam_hat, y, os_, noise, mean_const):
    with jax.default_matmul_precision("highest"):
        lam = os_ * lam_hat
        denom = lam + noise
        yt = qh.T @ (y - mean_const) @ qw
        mean = qh @ (lam * yt / denom) @ qw.T + mean_const
        m = lam * lam / denom
        var = os_ - (qh * qh) @ m @ (qw * qw).T
        return mean, jnp.maximum(var, 1e-12)


def _unpack(params: KronGPParams):
    return (
        float(jnp.exp(params.log_lengthscale)),
        jnp.exp(params.log_outputscale).astype(jnp.float32),
        jnp.exp(params.log_noise).astype(jnp.float32),
        jnp.asarray(params.mean_const, jnp.float32),
    )


def neg_mll(params: KronGPParams, y_grid: Array) -> Array:
    """Exact negative log marginal likelihood of the grid observations."""
    h, w = y_grid.shape
    ls, os_, noise, mc = _unpack(params)
    qh, qw, lam_hat = _host_factored(ls, h, w)
    return _mll_core(
        jnp.asarray(qh), jnp.asarray(qw), jnp.asarray(lam_hat),
        jnp.asarray(y_grid, jnp.float32), os_, noise, mc,
    )


def posterior(params: KronGPParams, y_grid: Array) -> Tuple[Array, Array]:
    """Exact posterior mean and variance at every training-grid point."""
    h, w = y_grid.shape
    ls, os_, noise, mc = _unpack(params)
    qh, qw, lam_hat = _host_factored(ls, h, w)
    return _posterior_core(
        jnp.asarray(qh), jnp.asarray(qw), jnp.asarray(lam_hat),
        jnp.asarray(y_grid, jnp.float32), os_, noise, mc,
    )


def fit_adam(
    y_grid: Array,
    params: KronGPParams | None = None,
    iters: int = 20,
    lr: float = 0.1,
    lengthscale_grid: Tuple[float, ...] = (2.0, 4.0, 8.0, 16.0, 32.0, 64.0),
) -> Tuple[KronGPParams, Array]:
    """Hyperparameter fit against the exact MLL, reference training-loop
    shape (20 Adam(0.1) iters, ``gp_regression.py:179-224``):

    1. lengthscale by exact-MLL sweep over a candidate grid (host eigh per
       candidate, cached; MLL evaluated on device);
    2. Adam on (log_outputscale, log_noise, mean_const) in the FIXED
       eigenbasis of the winning lengthscale — gradients there are exact
       because Q and λ̂ do not depend on those parameters, and XLA never has
       to differentiate (or even compile) an eigendecomposition.

    Selection caveat (deliberate): the step-1 sweep scores each candidate
    at INITIAL outputscale/noise/mean — var(y), 0.1·var(y), mean(y) — not
    at per-candidate optima, so a pathological y scaling biases only the
    amount of residual the Adam phase must absorb, not correctness: init at
    data moments makes the comparison scale-equivariant (multiplying y by c
    scales every candidate's quad and logdet terms identically), which
    ``tests/test_gp.py::test_kron_lengthscale_selection_scale_invariant``
    pins at y×100 / y×0.01. Reference analogue: the sklearn loop's
    ``normalize_y=True`` + restarts (``BayesianOptimization.py:156-159``).

    Returns (params, per-Adam-iter loss history).
    """
    del params  # lengthscale comes from the sweep
    y = jnp.asarray(y_grid, jnp.float32)
    h, w = y.shape

    # Host: eigendecompose every candidate (cached across calls).
    qh_all, qw_all, lam_all = zip(
        *[_host_factored(float(ls), h, w) for ls in lengthscale_grid]
    )
    qh_all = jnp.asarray(np.stack(qh_all))
    qw_all = jnp.asarray(np.stack(qw_all))
    lam_all = jnp.asarray(np.stack(lam_all))

    run = _fit_core(int(iters), float(lr))
    best, pf, losses = run(qh_all, qw_all, lam_all, y)
    log_os, log_noise, mean = pf
    ls_best = float(lengthscale_grid[int(best)])
    return (
        KronGPParams(
            jnp.log(jnp.asarray(ls_best, jnp.float32)), log_os, log_noise, mean
        ),
        losses,
    )


def _build_fit_run(iters: int, lr: float):
    """Raw (unjitted) Adam-fit body shared by the single and vmapped cores."""
    opt = optax.adam(lr)

    def run(qh_all, qw_all, lam_all, y):
      with jax.default_matmul_precision("highest"):
          n = y.shape[0] * y.shape[1]
          y_mean0 = jnp.mean(y)
          y_var0 = jnp.maximum(jnp.var(y), 1e-6)

          def factored_mll(yt, ones_t, lam_hat, log_os, log_noise, mean):
              denom = jnp.exp(log_os) * lam_hat + jnp.exp(log_noise)
              yc = yt - mean * ones_t
              quad = jnp.sum(yc * yc / denom)
              logdet = jnp.sum(jnp.log(denom))
              return 0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))

          def eval_ls(qh, qw, lam_hat):
              yt = qh.T @ y @ qw
              ones_t = jnp.outer(jnp.sum(qh, axis=0), jnp.sum(qw, axis=0))
              mll0 = factored_mll(
                  yt, ones_t, lam_hat,
                  jnp.log(y_var0), jnp.log(0.1 * y_var0), y_mean0,
              )
              return mll0, yt, ones_t

          losses_ls, yt_all, ones_all = jax.vmap(eval_ls)(qh_all, qw_all, lam_all)
          best = jnp.argmin(losses_ls)
          yt = yt_all[best]
          ones_t = ones_all[best]
          lam_hat = lam_all[best]

          p0 = (jnp.log(y_var0), jnp.log(0.1 * y_var0), y_mean0)
          s0 = opt.init(p0)

          def step(carry, _):
              p, s = carry
              loss, grads = jax.value_and_grad(
                  lambda pp: factored_mll(yt, ones_t, lam_hat, *pp)
              )(p)
              updates, s = opt.update(grads, s)
              p = optax.apply_updates(p, updates)
              return (p, s), loss

          (pf, _), losses = jax.lax.scan(step, (p0, s0), None, length=iters)
          return best, pf, losses

    return run


@functools.lru_cache(maxsize=16)
def _fit_core(iters: int, lr: float):
    """Jitted Adam-fit core, cached per (iters, lr): repeat fits in one
    process (e.g. a val-set sweep of per-image pixel-GPs) reuse the traced
    executable instead of re-tracing the whole scan per call."""
    return jax.jit(_build_fit_run(iters, lr))


@functools.lru_cache(maxsize=16)
def _fit_core_batch(iters: int, lr: float):
    """vmapped fit core: N images' GPs fit in ONE program. The
    per-lengthscale eigenbases are image-independent, so they broadcast
    (in_axes=None) while the heat grids map over the leading axis."""
    return jax.jit(
        jax.vmap(_build_fit_run(iters, lr), in_axes=(None, None, None, 0))
    )


def predict_offgrid(
    params: KronGPParams, y_grid: Array, points: Array
) -> Array:
    """Posterior mean at arbitrary (row, col) float points.

    Uses the separable cross-kernel: k*(t) = k_h(t_r, ·) ⊗ k_w(t_c, ·),
    mean*(t) = k_h(t_r) · A · k_w(t_c)ᵀ with A = unvec((K+σ²I)⁻¹ y).
    """
    h, w = y_grid.shape
    ls_f, os_, noise, mc = _unpack(params)
    qh, qw, lam_hat = _host_factored(ls_f, h, w)
    qh, qw, lam_hat = jnp.asarray(qh), jnp.asarray(qw), jnp.asarray(lam_hat)
    lam = os_ * lam_hat
    y = jnp.asarray(y_grid, jnp.float32)
    yt = qh.T @ (y - mc) @ qw
    alpha_grid = qh @ (yt / (lam + noise)) @ qw.T  # [H, W] = unvec(alpha)

    ls = jnp.asarray(ls_f, jnp.float32)
    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    kr = os_ * jnp.exp(-0.5 * ((points[:, 0:1] - rows[None, :]) / ls) ** 2)
    kc = jnp.exp(-0.5 * ((points[:, 1:2] - cols[None, :]) / ls) ** 2)
    mean = jnp.einsum("ph,hw,pw->p", kr, alpha_grid, kc)
    return mean + mc


@jax.jit
def _posterior_batch_core(qh_all, qw_all, lam_all, best, y, os_, noise, mc):
    def one(bi, yi, osi, ni, mi):
        return _posterior_core(qh_all[bi], qw_all[bi], lam_all[bi],
                               yi, osi, ni, mi)

    return jax.vmap(one)(best, y, os_, noise, mc)


@functools.lru_cache(maxsize=8)
def _fit_posterior_sharded(iters: int, lr: float, mesh, data_axis: str):
    """shard_map'd fit+posterior: the image axis of the batch shards over
    the mesh's data axis while the per-lengthscale eigenbases REPLICATE
    (``in_specs=P()`` — they are image-independent and tiny next to the
    per-image scans). Each device runs its slice's vmapped sweep + Adam
    scan + posterior in ONE program; no collectives are needed."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    run = _build_fit_run(iters, lr)

    def local(qh_all, qw_all, lam_all, y_local):
        best, (log_os, log_noise, mean), losses = jax.vmap(
            run, in_axes=(None, None, None, 0)
        )(qh_all, qw_all, lam_all, y_local)
        os_, noise = jnp.exp(log_os), jnp.exp(log_noise)

        def one(bi, yi, osi, ni, mi):
            return _posterior_core(
                qh_all[bi], qw_all[bi], lam_all[bi], yi, osi, ni, mi
            )

        means, vars_ = jax.vmap(one)(best, y_local, os_, noise, mean)
        return best, log_os, log_noise, mean, losses, means, vars_

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(data_axis)),
        out_specs=tuple(P(data_axis) for _ in range(7)),
        check_vma=False,
    ))


def fit_posterior_batch(
    y_grids: Array,
    iters: int = 20,
    lr: float = 0.1,
    lengthscale_grid: Tuple[float, ...] = (2.0, 4.0, 8.0, 16.0, 32.0, 64.0),
    mesh=None,
    data_axis: str = "data",
):
    """Fit N pixel-GPs and compute their exact posteriors in TWO programs.

    TPU-first extension of :func:`fit_adam` (reference fits one image per
    process, ``gp_superpixel_data_imagenet.py:578-663``): the candidate
    eigenbases are image-independent, so they broadcast into a vmapped
    (sweep + Adam scan) over the image axis — N fits cost ~one fit's wall
    time plus N tiny scans, and compile once per (iters, lr).

    With ``mesh`` (>1 device on ``data_axis``), the image axis additionally
    shards over the mesh (eigenbases replicate) — an N-image GP-heatmap
    pass scales with devices. N pads to a multiple of the axis size with
    repeats of the first grid; outputs trim.

    Returns (params_list[N], means [N,H,W], vars [N,H,W], losses [N,iters]).
    """
    y = jnp.asarray(y_grids, jnp.float32)
    n, h, w = y.shape
    qh_all, qw_all, lam_all = zip(
        *[_host_factored(float(ls), h, w) for ls in lengthscale_grid]
    )
    qh_all = jnp.asarray(np.stack(qh_all))
    qw_all = jnp.asarray(np.stack(qw_all))
    lam_all = jnp.asarray(np.stack(lam_all))

    if mesh is not None and int(mesh.shape[data_axis]) > 1:
        n_data = int(mesh.shape[data_axis])
        pad = (-n) % n_data
        if pad:
            y = jnp.concatenate([y, jnp.repeat(y[:1], pad, axis=0)])
        srun = _fit_posterior_sharded(int(iters), float(lr), mesh, data_axis)
        best, log_os, log_noise, mean, losses, means, vars_ = srun(
            qh_all, qw_all, lam_all, y
        )
        best, log_os, log_noise = best[:n], log_os[:n], log_noise[:n]
        mean, losses = mean[:n], losses[:n]
        means, vars_ = means[:n], vars_[:n]
    else:
        vrun = _fit_core_batch(int(iters), float(lr))
        best, (log_os, log_noise, mean), losses = vrun(
            qh_all, qw_all, lam_all, y
        )
        means, vars_ = _posterior_batch_core(
            qh_all, qw_all, lam_all, best,
            y, jnp.exp(log_os), jnp.exp(log_noise), mean,
        )
    ls_grid_np = np.asarray(lengthscale_grid, np.float32)
    best_np = np.asarray(best)
    params = [
        KronGPParams(
            jnp.log(jnp.asarray(ls_grid_np[int(best_np[i])], jnp.float32)),
            log_os[i], log_noise[i], mean[i],
        )
        for i in range(n)
    ]
    return params, means, vars_, losses
