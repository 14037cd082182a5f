"""BO-loop statistical parity vs the reference's sklearn loop.

The oracle below re-implements the REFERENCE loop semantics as a test-only
fixture (``BayesianOptimization.py:99-192``: ``GaussianProcessRegressor(RBF,
alpha=1e-5, n_restarts_optimizer=10, normalize_y=True)``; L-BFGS-B proposal
started from every integer in bounds ``:85-90``; duplicate → random integer
resample ``:178-180``; ``int()`` rounding of the continuous proposal inside
the loss, ``bayesian_active_learning_imagenet.py:283``), so the JAX loop's
*sampling behavior* — best-found value over seeds — can be compared
distributionally against what the reference would do on the same objective.

The JAX loop replaces sklearn's continuous ML-II lengthscale fit with a
vectorized MLL grid sweep and the L-BFGS-B sweep with an exact EI argmax
over all integer candidates — these tests pin that the approximation does
not lose optimization quality.
"""

import random

import numpy as np
import pytest

from network_interpretation_imagenet_tpu.bo import bayesian_optimize

sklearn_gp = pytest.importorskip("sklearn.gaussian_process")


def sklearn_reference_bo(objective, upper, n_pre_samples=3, n_iters=10, seed=0):
    """Reference-loop oracle. ``objective(int) -> float``. Returns sampled ys."""
    from scipy.optimize import minimize
    from scipy.stats import norm

    rng = random.Random(seed)
    np.random.seed(seed)  # the reference leaves sklearn on global np.random
    xs, ys = [], []
    for _ in range(n_pre_samples):
        x = rng.randint(0, upper)  # Python randint: inclusive (BO.py:137)
        xs.append([float(x)])
        ys.append(objective(x))

    model = sklearn_gp.GaussianProcessRegressor(
        kernel=sklearn_gp.kernels.RBF(),
        alpha=1e-5,
        n_restarts_optimizer=10,
        normalize_y=True,
    )

    for _ in range(n_iters):
        xp, yp = np.array(xs), np.array(ys)
        model.fit(xp, yp)

        def neg_ei(x):
            mu, sigma = model.predict(np.asarray(x).reshape(-1, 1), return_std=True)
            loss_opt = yp.max()
            with np.errstate(divide="ignore", invalid="ignore"):
                z = (mu - loss_opt) / sigma
                ei = (mu - loss_opt) * norm.cdf(z) + sigma * norm.pdf(z)
            # The reference's sigma==0 guard is a no-op comparison (BO.py:52)
            # — replicated by NOT fixing it here.
            return -ei

        best_x, best_val = None, 1.0  # init 1, exactly as BO.py:80
        for start in range(0, upper):  # every integer start (BO.py:85)
            res = minimize(
                neg_ei, x0=[float(start)], bounds=np.array([[0.0, float(upper)]]),
                method="L-BFGS-B",
            )
            if res.fun < best_val:
                best_val = float(res.fun)
                best_x = res.x
        nxt = best_x
        if nxt is None or np.any(np.abs(nxt - xp) <= 1e-7):
            nxt = [float(rng.randint(0, upper))]  # BO.py:178-180
        xs.append([float(nxt[0])])
        ys.append(objective(int(nxt[0])))  # int() rounding (bal_imagenet.py:283)
    return np.array(ys)


_SKL_CACHE = {}


def sklearn_reference_bo_cached(objective_key, objective, upper, seed):
    """The sklearn loop is expensive on a 1-core host; both tests share the
    bimodal runs through this cache."""
    k = (objective_key, upper, seed)
    if k not in _SKL_CACHE:
        _SKL_CACHE[k] = sklearn_reference_bo(objective, upper, seed=seed)
    return _SKL_CACHE[k]


def _unimodal(upper):
    c, w = 0.7 * upper, 0.15 * upper
    return lambda x: float(np.exp(-((x - c) / w) ** 2))


def _bimodal(upper):
    c1, w1, c2, w2 = 0.25 * upper, 0.08 * upper, 0.8 * upper, 0.06 * upper
    return lambda x: float(
        0.6 * np.exp(-((x - c1) / w1) ** 2) + 1.0 * np.exp(-((x - c2) / w2) ** 2)
    )


def _run_jax(objective, upper, seed):
    def batched(indices):
        vals = np.array([objective(int(i)) for i in indices], np.float32)
        return vals, vals > 0.5

    return bayesian_optimize(batched, upper=upper, n_pre_samples=3,
                             n_iters=10, seed=seed).yp


@pytest.mark.parametrize("name,objective_fn,upper",
                         [("unimodal", _unimodal, 24), ("bimodal", _bimodal, 24)])
def test_jax_loop_matches_sklearn_reference_best_found(name, objective_fn, upper):
    """Best-found-value distribution over seeds: the JAX loop must not lose
    more than 0.05 (objective scale [0,1]) to the sklearn reference loop.
    (The full 20-seed study lives in docs/BO_PARITY.md; 8 seeds here keep the
    1-core CI budget sane.)"""
    objective = objective_fn(upper)
    seeds = range(8)
    best_jax = np.array([_run_jax(objective, upper, s).max() for s in seeds])
    best_skl = np.array(
        [sklearn_reference_bo_cached(name, objective, upper, s).max() for s in seeds]
    )
    assert best_jax.mean() >= best_skl.mean() - 0.05, (
        best_jax.mean(), best_skl.mean()
    )
    # Both should actually optimize (beat the expectation of 13 random draws
    # materially on the unimodal/bimodal shapes).
    assert best_jax.mean() > 0.8


def test_jax_loop_cumulative_regret_competitive():
    """Mean per-sample simple regret after the BO phase: JAX ≤ sklearn + 0.05."""
    upper = 24
    objective = _bimodal(upper)
    f_best = max(objective(i) for i in range(upper + 1))
    seeds = range(8)

    def mean_regret(run):
        tail = np.array([np.maximum.accumulate(run(s))[3:] for s in seeds])
        return float(np.mean(f_best - tail))

    r_jax = mean_regret(lambda s: _run_jax(objective, upper, s))
    r_skl = mean_regret(
        lambda s: sklearn_reference_bo_cached("bimodal", objective, upper, s)
    )
    assert r_jax <= r_skl + 0.05, (r_jax, r_skl)


def _run_fused(objective, upper, seed):
    """Drive the FUSED on-device loop on a scalar objective.

    Encoding: one pixel per segment with value = its index, width 1 — the
    masked image's sum IS the start index, so a toy ``logits_fn`` can look
    the objective value up in a table and emit logits whose softmax
    reproduces it exactly. This pins the fused loop's carried-L⁻¹ GP
    numerics (gp/exact.py incremental_*) to the same statistical bar as
    the host loop, not just the unit-level accuracy-class bounds.
    """
    import jax
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.bo.loop import fused_window_bo

    c = upper + 1
    table = np.clip([objective(i) for i in range(c)], 1e-6, 1 - 1e-6)
    table = jnp.asarray(table, jnp.float32)
    image = np.arange(c, dtype=np.float32).reshape(1, c, 1)
    segments = np.arange(c, dtype=np.int32).reshape(1, c)

    def logits_fn(imgs):
        idx = jnp.round(jnp.sum(imgs, axis=(1, 2, 3))).astype(jnp.int32)
        val = jnp.take(table, jnp.clip(idx, 0, c - 1))
        return jnp.stack([jnp.zeros_like(val), jnp.log(val / (1 - val))], 1)

    _, ys, _, count = fused_window_bo(
        logits_fn, jnp.asarray(image), jnp.asarray(segments),
        jnp.int32(1), jnp.int32(1), jnp.int32(upper),
        max_candidates=32, n_pre_samples=3, n_iters=10,
        key=jax.random.PRNGKey(seed),
    )
    return np.asarray(ys)[: int(count)]


@pytest.mark.parametrize("name,objective_fn,upper",
                         [("unimodal", _unimodal, 24), ("bimodal", _bimodal, 24)])
def test_fused_loop_matches_sklearn_reference_best_found(name, objective_fn, upper):
    """The fused loop (incremental carried-L⁻¹ GP) must clear the same
    statistical bar as the host loop vs the reference oracle."""
    objective = objective_fn(upper)
    seeds = range(8)
    best_fused = np.array([_run_fused(objective, upper, s).max() for s in seeds])
    best_skl = np.array(
        [sklearn_reference_bo_cached(name, objective, upper, s).max() for s in seeds]
    )
    assert best_fused.mean() >= best_skl.mean() - 0.05, (
        best_fused.mean(), best_skl.mean(),
    )
    assert best_fused.mean() > 0.8
