"""Grid-inducing variational GP with Bernoulli (probit) likelihood.

On-device counterpart of the reference's classification surrogate:
``GridInducingVariationalGP(grid_size=10)`` + ``BernoulliLikelihood`` +
``VariationalMarginalLogLikelihood``, trained 30 Adam(0.1) iters
(``gp_classification.py:139-217``). Inducing points are a g×g grid over the
pixel square; q(u) = N(m, L Lᵀ) is optimized against the sparse-GP ELBO with
a closed-form probit expectation (no MC), so every training step is pure
matmuls + erf:

  q(f_i) = N(μ_i, s_i²),  μ = A m,  s² = k_ii − a_iᵀ(K_uu − S)a_i,
  A = K_fu K_uu⁻¹;  E[log p(y|f)] via Gauss-Hermite; predictive
  p(y=1|x) = Φ(μ/√(1+s²)).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from network_interpretation_imagenet_tpu.gp.kernels import rbf_kernel

Array = jax.Array

_GH_DEG = 20


class VGPParams(NamedTuple):
    log_lengthscale: Array
    log_outputscale: Array
    var_mean: Array       # [M] variational mean m
    var_chol_raw: Array   # [M, M] raw lower-tri (diag softplus'd) for L


class VGPModel(NamedTuple):
    params: VGPParams
    inducing: Array       # [M, 2]


def make_grid_inducing(n: int, grid_size: int = 10) -> Array:
    """g×g inducing grid over [0, n)² (reference grid_bounds=[(0,n),(0,n)],
    ``gp_classification.py:141``)."""
    g = jnp.linspace(0.0, float(n - 1), grid_size)
    yy, xx = jnp.meshgrid(g, g, indexing="ij")
    return jnp.stack([yy.ravel(), xx.ravel()], axis=1)


def init_model(n: int, grid_size: int = 10, lengthscale: float = 20.0) -> VGPModel:
    m = grid_size * grid_size
    params = VGPParams(
        jnp.log(jnp.asarray(lengthscale, jnp.float32)),
        jnp.asarray(0.0, jnp.float32),
        jnp.zeros((m,), jnp.float32),
        jnp.eye(m, dtype=jnp.float32) * _softplus_inv(1.0),
    )
    return VGPModel(params, make_grid_inducing(n, grid_size))


def _softplus(x):
    return jax.nn.softplus(x)


def _softplus_inv(y: float) -> float:
    return float(np.log(np.expm1(y)))


def _chol_from_raw(raw: Array) -> Array:
    lower = jnp.tril(raw, -1)
    diag = _softplus(jnp.diagonal(raw))
    return lower + jnp.diag(diag)


def _marginals(params: VGPParams, inducing: Array, x: Array):
    """q(f) marginals μ, s² at inputs x (HIGHEST matmul precision — bf16
    TPU-default matmuls break the PSD-ness this math depends on)."""
    with jax.default_matmul_precision("highest"):
        return _marginals_impl(params, inducing, x)


def _marginals_impl(params: VGPParams, inducing: Array, x: Array):
    ls = jnp.exp(params.log_lengthscale)
    os_ = jnp.exp(params.log_outputscale)
    jitter = 1e-4
    m_ind = inducing.shape[0]
    kuu = rbf_kernel(inducing, inducing, ls, os_) + jitter * jnp.eye(m_ind)
    kfu = rbf_kernel(x, inducing, ls, os_)
    luu = jnp.linalg.cholesky(kuu)
    # A = K_fu K_uu^{-1}  (solve through Cholesky)
    a_t = jax.scipy.linalg.cho_solve((luu, True), kfu.T)  # [M, N]
    mu = a_t.T @ params.var_mean
    s_chol = _chol_from_raw(params.var_chol_raw)
    # s² = k_ii - a K_uu a + a S a   (S = s_chol s_cholᵀ)
    v1 = luu.T @ a_t                 # [M, N]; a K_uu aᵀ diag = Σ v1²
    v2 = s_chol.T @ a_t              # a S aᵀ diag = Σ v2²
    s2 = os_ - jnp.sum(v1 * v1, axis=0) + jnp.sum(v2 * v2, axis=0)
    return mu, jnp.maximum(s2, 1e-8), luu, s_chol


def _kl(params: VGPParams, luu: Array, s_chol: Array) -> Array:
    """KL(q(u) ‖ p(u)) for p = N(0, K_uu)."""
    m = params.var_mean.shape[0]
    w = jax.scipy.linalg.solve_triangular(luu, s_chol, lower=True)
    trace = jnp.sum(w * w)
    mahal_v = jax.scipy.linalg.solve_triangular(luu, params.var_mean, lower=True)
    mahal = jnp.sum(mahal_v * mahal_v)
    logdet_p = 2.0 * jnp.sum(jnp.log(jnp.diagonal(luu)))
    logdet_q = 2.0 * jnp.sum(jnp.log(jnp.diagonal(s_chol)))
    return 0.5 * (trace + mahal - m + logdet_p - logdet_q)


_GH_X, _GH_W = np.polynomial.hermite_e.hermegauss(_GH_DEG)


def _expected_log_probit(mu: Array, s2: Array, y_pm1: Array) -> Array:
    """E_{f~N(μ,s²)}[log Φ(y·f)] by Gauss-Hermite quadrature (probit)."""
    x = jnp.asarray(_GH_X, jnp.float32)[None, :]
    w = jnp.asarray(_GH_W, jnp.float32)[None, :] / jnp.sqrt(2.0 * jnp.pi)
    f = mu[:, None] + jnp.sqrt(s2)[:, None] * x
    log_phi = jax.scipy.stats.norm.logcdf(y_pm1[:, None] * f)
    return jnp.sum(w * log_phi, axis=1)


def neg_elbo(params: VGPParams, inducing: Array, x: Array, y01: Array) -> Array:
    mu, s2, luu, s_chol = _marginals(params, inducing, x)
    y_pm1 = 2.0 * y01 - 1.0
    ell = jnp.sum(_expected_log_probit(mu, s2, y_pm1))
    return -(ell - _kl(params, luu, s_chol))


def _elbo_scan(p0, inducing, opt, x, y, iters: int):
    """``iters`` Adam steps of the negative ELBO as one ``lax.scan`` —
    THE fit body, shared by the single and batched drivers."""
    s0 = opt.init(p0)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(neg_elbo)(p, inducing, x, y)
        updates, s = opt.update(grads, s)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (pf, _), losses = jax.lax.scan(step, (p0, s0), None, length=iters)
    return pf, losses


@functools.lru_cache(maxsize=16)
def _fit_core(iters: int, lr: float):
    """Jitted ELBO-fit core, cached per (iters, lr) so repeat fits in one
    process reuse the traced executable (inducing points are an operand)."""
    opt = optax.adam(lr)

    @jax.jit
    def run(p0, inducing, xx, yy):
        return _elbo_scan(p0, inducing, opt, xx, yy, iters)

    return run


def fit_adam(
    model: VGPModel, x: Array, y01: Array, iters: int = 30, lr: float = 0.1
) -> Tuple[VGPModel, Array]:
    """Reference training loop semantics: 30 Adam(0.1) full-batch iterations
    (``gp_classification.py:176-217``), here a jitted `lax.scan`."""
    run = _fit_core(int(iters), float(lr))
    pf, losses = run(model.params, model.inducing, jnp.asarray(x),
                     jnp.asarray(y01, jnp.float32))
    return VGPModel(pf, model.inducing), losses


def _predict_proba_params(params: VGPParams, inducing: Array, x: Array) -> Array:
    """p(y=1|x) = Φ(μ/√(1+s²)) — closed-form probit predictive
    (the reference's BernoulliLikelihood mean, ``gp_classification.py:372``)."""
    mu, s2, _, _ = _marginals(params, inducing, x)
    return jax.scipy.stats.norm.cdf(mu / jnp.sqrt(1.0 + s2))


def predict_proba(model: VGPModel, x: Array) -> Array:
    """See :func:`_predict_proba_params` (public model-object wrapper)."""
    return _predict_proba_params(model.params, model.inducing, x)


# ---------------------------------------------------------------------------
# Sweep-scale batched fits (TPU-first; no reference analogue — the reference
# fits one image's classification GP per process, gp_classification.py:374)
# ---------------------------------------------------------------------------


def _fit_predict_one(iters: int):
    """ELBO fit + probit predictive for ONE label vector (un-jitted core —
    vmapped/shard_mapped by the batch drivers below)."""

    def one(p0, inducing, opt, x, y, xt):
        pf, losses = _elbo_scan(p0, inducing, opt, x, y, iters)
        probs = _predict_proba_params(pf, inducing, xt)
        return pf, probs, losses

    return one


@functools.lru_cache(maxsize=8)
def _fit_predict_batch_core(iters: int, lr: float):
    opt = optax.adam(lr)
    one = _fit_predict_one(iters)

    @jax.jit
    def run(p0, inducing, x, ys, xt):
        return jax.vmap(
            lambda y: one(p0, inducing, opt, x, y, xt)
        )(ys)

    return run


@functools.lru_cache(maxsize=8)
def _fit_predict_batch_sharded(iters: int, lr: float, mesh, data_axis: str):
    """shard_map'd batch fit: the image (label-vector) axis shards over the
    mesh's data axis; coords, inducing grid, and the initial params
    REPLICATE (image-independent). Each device runs its slice's vmapped
    ELBO scans in one program; no collectives."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    opt = optax.adam(lr)
    one = _fit_predict_one(iters)

    def local(p0, inducing, x, ys_local, xt):
        return jax.vmap(
            lambda y: one(p0, inducing, opt, x, y, xt)
        )(ys_local)

    return jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(data_axis), P()),
        out_specs=(P(data_axis), P(data_axis), P(data_axis)),
        check_vma=False,
    ))


def fit_predict_batch(
    model: VGPModel,
    x: Array,
    ys01: Array,
    x_test: Array = None,
    iters: int = 30,
    lr: float = 0.1,
    mesh=None,
    data_axis: str = "data",
    return_models: bool = True,
):
    """Fit N variational classification GPs — shared coords ``x`` [P, 2] and
    inducing grid, per-image labels ``ys01`` [N, P] — and evaluate their
    probit predictives at ``x_test`` (default: the training coords) as ONE
    vmapped program; the classification twin of
    :func:`gp.kron.fit_posterior_batch`.

    With ``mesh`` (>1 device on ``data_axis``), the image axis shards over
    the mesh (coords/inducing/init replicate); N pads to a multiple of the
    axis size with repeats of the first label vector and outputs trim.

    Returns (models: list[VGPModel] of length N — or None with
    ``return_models=False``, sparing N per-leaf device slices when the
    caller only wants the probability maps — probs [N, T], losses
    [N, iters]).
    """
    x = jnp.asarray(x, jnp.float32)
    ys = jnp.asarray(ys01, jnp.float32)
    n = ys.shape[0]
    xt = x if x_test is None else jnp.asarray(x_test, jnp.float32)

    if mesh is not None and int(mesh.shape[data_axis]) > 1:
        n_data = int(mesh.shape[data_axis])
        pad = (-n) % n_data
        if pad:
            ys = jnp.concatenate([ys, jnp.repeat(ys[:1], pad, axis=0)])
        srun = _fit_predict_batch_sharded(
            int(iters), float(lr), mesh, data_axis
        )
        pf, probs, losses = srun(model.params, model.inducing, x, ys, xt)
        pf = jax.tree.map(lambda a: a[:n], pf)
        probs, losses = probs[:n], losses[:n]
    else:
        run = _fit_predict_batch_core(int(iters), float(lr))
        pf, probs, losses = run(model.params, model.inducing, x, ys, xt)
    if not return_models:
        return None, probs, losses
    models = [
        VGPModel(jax.tree.map(lambda a: a[i], pf), model.inducing)
        for i in range(n)
    ]
    return models, probs, losses
