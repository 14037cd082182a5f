"""GP-EI Bayesian optimization over the mask start-index.

Reference driver: ``BayesianOptimization.bayesian_optimisation``
(``BayesianOptimization.py:99-192``) — sklearn GP refit per iteration, EI
maximized by per-integer L-BFGS-B sweeps, every sample a fresh walk over the
val dataset (``bayesian_active_learning_imagenet.py:126-129``).

Two TPU-native drivers:

  * :func:`bayesian_optimize` — host loop (10-ish iterations) over a
    user-supplied batched objective; GP fit + vectorized EI are jitted. Fully
    general (matches the reference's callback structure).
  * :func:`fused_window_bo` — the ENTIRE active-learning loop in ONE jit:
    observations live in a fixed-size on-device buffer (padded slots muted
    with huge per-point noise), each `lax.fori_loop` iteration refits the GP,
    takes an exact EI argmax over all integer candidates, applies the
    reference's duplicate-rejection-→-random-resample rule, builds the
    chosen window mask, and runs the classifier forward — zero host
    round-trips between BO steps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.bo.acquisition import (
    ei_over_candidates,
    expected_improvement,
)
from network_interpretation_imagenet_tpu.gp import exact
from network_interpretation_imagenet_tpu.ops import masking

Array = jax.Array


@dataclasses.dataclass
class BOResult:
    xp: np.ndarray        # [n_obs] sampled start indices (order of evaluation)
    yp: np.ndarray        # [n_obs] objective values (target-class prob)
    survived: np.ndarray  # bool[n_obs] per-sample survive labels


# ---------------------------------------------------------------------------
# Host-driven general loop
# ---------------------------------------------------------------------------


def bayesian_optimize(
    objective: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]],
    upper: int,
    n_pre_samples: int = 3,
    n_iters: int = 10,
    seed: int = 0,
    alpha: float = 1e-5,
    epsilon: float = 1e-7,
    lengthscale_grid=(0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0),
) -> BOResult:
    """Maximize ``objective`` over integer starts in [0, upper] (inclusive,
    reference bounds semantics ``bayesian_active_learning_imagenet.py:467,478``).

    ``objective(indices int[K]) -> (scores f32[K], survived bool[K])`` — the
    pre-samples are evaluated as ONE batch (the reference runs them serially).
    """
    rng = np.random.RandomState(seed)
    pre = rng.randint(0, upper + 1, size=n_pre_samples)
    scores, survived = objective(pre)
    xs = list(pre.tolist())
    ys = list(np.asarray(scores, np.float64).tolist())
    labels = list(np.asarray(survived, bool).tolist())

    candidates = jnp.arange(upper + 1, dtype=jnp.float32)[:, None]
    ls_grid = jnp.asarray(lengthscale_grid, jnp.float32)

    @jax.jit
    def propose(x_obs, y_obs):
        fit = exact.fit_lengthscale_sweep(
            x_obs[:, None], y_obs, ls_grid, noise=alpha, normalize_y=True
        )
        ei = ei_over_candidates(fit, candidates, y_obs, greater_is_better=True)
        return jnp.argmax(ei)

    for _ in range(n_iters):
        nxt = int(
            propose(jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32))
        )
        # Duplicate → random resample (reference BO.py:178-180).
        if np.any(np.abs(np.asarray(xs) - nxt) <= epsilon):
            nxt = int(rng.randint(0, upper + 1))
        s, lab = objective(np.asarray([nxt]))
        xs.append(nxt)
        ys.append(float(s[0]))
        labels.append(bool(lab[0]))

    return BOResult(
        xp=np.asarray(xs), yp=np.asarray(ys), survived=np.asarray(labels)
    )


# ---------------------------------------------------------------------------
# Fully-fused on-device loop
# ---------------------------------------------------------------------------


class _FusedState(NamedTuple):
    xs: Array        # f32[max_obs] observed starts
    ys: Array        # f32[max_obs] observed scores
    survived: Array  # bool[max_obs]
    count: Array     # int32 number of valid observations
    key: Array


def fused_window_bo(
    logits_fn: Callable[[Array], Array],
    image: Array,
    segments: Array,
    width: Array,
    target: Array,
    upper: Array,
    max_candidates: int,
    n_pre_samples: int = 3,
    n_iters: int = 10,
    key: Optional[Array] = None,
    alpha: float = 1e-5,
    epsilon: float = 1e-7,
    lengthscale_grid=(0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0),
):
    """One-jit BO over window starts. ``logits_fn(images[B,H,W,C]) -> [B,K]``
    must close over model variables. ``upper`` (traced) bounds candidates to
    [0, upper]; ``max_candidates`` is the static buffer size (≥ upper+1).

    Returns (xs, ys, survived, count): fixed-size arrays with `count` valid
    leading... entries are in evaluation order.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    max_obs = n_pre_samples + n_iters
    ls_grid = jnp.asarray(lengthscale_grid, jnp.float32)
    cand = jnp.arange(max_candidates, dtype=jnp.float32)
    cand_ok = cand <= upper

    def eval_start(first: Array) -> Tuple[Array, Array]:
        mask = masking.window_masks(segments, first[None].astype(jnp.int32), width)
        img = (image[None] * mask[0][None, :, :, None].astype(image.dtype))
        logits = logits_fn(img).astype(jnp.float32)[0]
        prob = jax.nn.softmax(logits)[target]
        return prob, jnp.argmax(logits) == target

    def masked_norm(ys, valid):
        cnt = jnp.maximum(jnp.sum(valid), 1.0)
        mean = jnp.sum(ys * valid) / cnt
        var = jnp.sum(valid * (ys - mean) ** 2) / cnt
        std = jnp.sqrt(jnp.maximum(var, 1e-12))
        std = jnp.where(std > 0, std, 1.0)
        return mean, std

    def fit_and_propose(state: _FusedState) -> Array:
        valid = (jnp.arange(max_obs) < state.count).astype(jnp.float32)
        mean, std = masked_norm(state.ys, valid)
        yn = (state.ys - mean) / std * valid
        # Padded slots: huge noise → zero posterior influence.
        noise_vec = jnp.where(valid > 0, alpha, 1e10)

        def mll(ls):
            p = exact.GPParams(ls, jnp.asarray(1.0), noise_vec)
            return exact.log_marginal_likelihood(
                p, state.xs[:, None], yn, normalize_y=False
            )

        mlls = jax.vmap(mll)(ls_grid)
        params = exact.GPParams(
            ls_grid[jnp.nanargmax(mlls)], jnp.asarray(1.0), noise_vec
        )
        fit = exact.fit(params, state.xs[:, None], yn, normalize_y=False)
        mu, sigma = exact.predict(fit, cand[:, None])
        y_obs_masked = jnp.where(valid > 0, yn, -jnp.inf)  # max over valid only
        ei = expected_improvement(mu, sigma, y_obs_masked, greater_is_better=True)
        ei = jnp.where(cand_ok, ei, -jnp.inf)
        return jnp.argmax(ei).astype(jnp.float32)

    def record(state: _FusedState, x: Array) -> _FusedState:
        prob, surv = eval_start(x)
        i = state.count
        return _FusedState(
            state.xs.at[i].set(x),
            state.ys.at[i].set(prob),
            state.survived.at[i].set(surv),
            state.count + 1,
            state.key,
        )

    @jax.jit
    def run(key):
        key, sub = jax.random.split(key)
        pre = jax.random.randint(
            sub, (n_pre_samples,), 0, upper.astype(jnp.int32) + 1
        ).astype(jnp.float32)
        state = _FusedState(
            jnp.zeros(max_obs), jnp.zeros(max_obs),
            jnp.zeros(max_obs, bool), jnp.int32(0), key,
        )

        def pre_body(i, st):
            return record(st, pre[i])

        state = jax.lax.fori_loop(0, n_pre_samples, pre_body, state)

        def bo_body(_, st: _FusedState) -> _FusedState:
            proposal = fit_and_propose(st)
            valid = jnp.arange(max_obs) < st.count
            dup = jnp.any(valid & (jnp.abs(proposal - st.xs) <= epsilon))
            key, sub = jax.random.split(st.key)
            rand_x = jax.random.randint(
                sub, (), 0, upper.astype(jnp.int32) + 1
            ).astype(jnp.float32)
            x = jnp.where(dup, rand_x, proposal)
            st = st._replace(key=key)
            return record(st, x)

        state = jax.lax.fori_loop(0, n_iters, bo_body, state)
        return state.xs, state.ys, state.survived, state.count

    return run(key)
