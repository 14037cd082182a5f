"""Learned-mask saliency (Fong & Vedaldi, ICCV 2017 "meaningful
perturbations").

The differentiable generalization of the reference's minimal-mask
threshold search (`/root/reference/generate_gp_training_data_imagenet.py:396-487`
binary-searches a LEVEL of a precomputed heatmap; here the mask itself
is the optimization variable): find the smallest soft mask whose
deletion destroys the target prediction,

    min_m  λ₁·mean(1−m) + λ_tv·TV_β(m) + E_shift[ p_target(Φ(x, m)) ]

with m = sigmoid(p) on a LOW-RES grid (its upsampling is the natural
smoothness prior), Φ(x, m) = m·x + (1−m)·baseline (Gaussian-blurred x,
the paper's choice, or the framework's zero-mask convention), and the
expectation over ``jitter`` random integer shifts of the upsampled mask
(the paper's defense against adversarial speckle).

TPU shape: the ENTIRE optimization is one jitted ``lax.fori_loop`` —
optax Adam state, the PRNG chain, and the mask logits are loop carries;
each step is one batched forward+backward over the ``jitter`` shifted
perturbations. Nothing leaves the device until the final mask readback.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jax.Array


def gaussian_blur(image: Array, sigma: float) -> Array:
    """Separable Gaussian blur of f32[H, W, C] (SAME padding, kernel
    truncated at 2σ) — the perturbation baseline of the paper."""
    image = jnp.asarray(image, jnp.float32)
    radius = max(int(round(2.0 * sigma)), 1)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    # [H, W, C] → depthwise 1-D convs along H then W via moveaxis+conv.
    img = jnp.moveaxis(image, -1, 0)[:, None]  # [C, 1, H, W]
    kh = k[None, None, :, None]
    kw = k[None, None, None, :]
    out = jax.lax.conv_general_dilated(img, kh, (1, 1), "SAME")
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), "SAME")
    return jnp.moveaxis(out[:, 0], 0, -1)


@dataclass(frozen=True)
class LearnedMaskResult:
    heatmap: np.ndarray        # f32[H, W] = 1 − m_up: deleted = important
    mask_lowres: np.ndarray    # f32[mask_size, mask_size], keep-fraction m
    prob_original: float       # p_target(x)
    prob_masked: float         # p_target(Φ(x, m)) at the learned mask
    final_loss: float


# (logits_fn, static hyperparams) → jitted optimizer program.
_CORE_CACHE: dict = {}


def learned_mask_saliency(
    logits_fn: Callable,
    variables: Any,
    image: Array,
    target: int,
    mask_size: int = 28,
    iters: int = 150,
    lr: float = 0.1,
    l1: float = 0.05,
    tv: float = 0.1,
    tv_beta: float = 3.0,
    jitter: int = 4,
    max_shift: int = 4,
    baseline: str = "blur",
    blur_sigma: float = 10.0,
    seed: int = 0,
    compute_dtype: Any = jnp.float32,
) -> LearnedMaskResult:
    """Optimize a low-res deletion mask for one image (see module doc).

    ``jitter`` shifted copies are evaluated per step (``jitter=0`` →
    one unshifted forward); ``baseline`` is ``"blur"`` (paper) or
    ``"zero"`` (this framework's masked-pixel convention, matching
    ``ops.masking.apply_masks``)."""
    if mask_size <= 0 or iters <= 0:
        raise ValueError(f"mask_size/iters must be positive, got "
                         f"{mask_size}/{iters}")
    if jitter < 0 or max_shift < 0:
        # A negative max_shift would reach jax.random.randint with
        # minval > maxval, which JAX does not validate — silent garbage
        # shifts instead of an error.
        raise ValueError(f"jitter/max_shift must be >= 0, got "
                         f"{jitter}/{max_shift}")
    if baseline not in ("blur", "zero"):
        raise ValueError(f"baseline must be 'blur' or 'zero', got "
                         f"{baseline!r}")
    image = jnp.asarray(image, jnp.float32)
    h, w, _ = image.shape
    base_img = (gaussian_blur(image, blur_sigma) if baseline == "blur"
                else jnp.zeros_like(image))
    run = _learned_mask_core(
        logits_fn, int(mask_size), int(iters), float(lr), float(l1),
        float(tv), float(tv_beta), max(int(jitter), 1)
        if jitter else 1, int(max_shift) if jitter else 0, h, w,
        jnp.dtype(compute_dtype).name)
    m, p_orig, p_masked, loss = run(
        variables, image, base_img, jnp.int32(target),
        jax.random.PRNGKey(seed))
    m_up = jax.image.resize(m, (h, w), method="bilinear")
    return LearnedMaskResult(
        heatmap=np.asarray(1.0 - m_up, np.float32),
        mask_lowres=np.asarray(m, np.float32),
        prob_original=float(p_orig),
        prob_masked=float(p_masked),
        final_loss=float(loss),
    )


def _learned_mask_core(logits_fn, mask_size: int, iters: int, lr: float,
                       l1: float, tv: float, tv_beta: float, jitter: int,
                       max_shift: int, h: int, w: int, dtype: str):
    key_t = (logits_fn, mask_size, iters, lr, l1, tv, tv_beta, jitter,
             max_shift, h, w, dtype)
    if key_t not in _CORE_CACHE:
        compute_dtype = jnp.dtype(dtype)
        opt = optax.adam(lr)

        def prob_target(variables, img, tgt):
            logits = logits_fn(variables, img[None].astype(compute_dtype))
            if isinstance(logits, tuple):
                logits = logits[-1]
            return jax.nn.softmax(logits.astype(jnp.float32), -1)[0, tgt]

        @jax.jit
        def run(variables, image, base_img, target, key):
            def masked_prob(p, shifts):
                m = jax.nn.sigmoid(p)
                m_up = jax.image.resize(m, (h, w), method="bilinear")

                def one(shift):
                    ms = jnp.roll(m_up, shift, axis=(0, 1))[:, :, None]
                    return prob_target(
                        variables, ms * image + (1.0 - ms) * base_img,
                        target)

                return jnp.mean(jax.vmap(one)(shifts)), m

            def loss_fn(p, shifts):
                prob, m = masked_prob(p, shifts)
                del_term = jnp.mean(1.0 - m)
                dy = jnp.abs(jnp.diff(m, axis=0)) ** tv_beta
                dx = jnp.abs(jnp.diff(m, axis=1)) ** tv_beta
                # Mean-normalized like the deletion term, so λ's don't
                # rescale with mask_size (a summed TV at default weights
                # dominates the per-cell deletion cost and smears the
                # mask).
                tv_term = (jnp.sum(dy) + jnp.sum(dx)) / (dy.size + dx.size)
                return prob + l1 * del_term + tv * tv_term

            p0 = jnp.zeros((mask_size, mask_size), jnp.float32) + 2.0
            state0 = opt.init(p0)

            def step(i, carry):
                p, state, key, _ = carry
                key, sub = jax.random.split(key)
                shifts = jax.random.randint(
                    sub, (jitter, 2), -max_shift, max_shift + 1)
                loss, g = jax.value_and_grad(loss_fn)(p, shifts)
                updates, state = opt.update(g, state, p)
                return optax.apply_updates(p, updates), state, key, loss

            p, _, _, loss = jax.lax.fori_loop(
                0, iters, step, (p0, state0, key, jnp.float32(0.0)))
            m = jax.nn.sigmoid(p)
            p_orig = prob_target(variables, image, target)
            p_masked, _ = masked_prob(p, jnp.zeros((1, 2), jnp.int32))
            return m, p_orig, p_masked, loss

        _CORE_CACHE[key_t] = run
    return _CORE_CACHE[key_t]


# (static hyperparams, bucket, mesh) → jitted N-image program.
_BATCH_CACHE: dict = {}


def learned_mask_batch_dispatch(
    logits_fn: Callable,
    variables: Any,
    images,
    targets,
    mask_size: int = 28,
    iters: int = 150,
    lr: float = 0.1,
    l1: float = 0.05,
    tv: float = 0.1,
    tv_beta: float = 3.0,
    jitter: int = 4,
    max_shift: int = 4,
    baseline: str = "blur",
    blur_sigma: float = 10.0,
    seeds=None,
    mesh=None,
    data_axis: str = "data",
    compute_dtype: Any = jnp.float32,
):
    """N learned-mask optimizations as ONE device program (async).

    One per-image Adam loop is ``jitter`` forwards+backwards per step —
    far below chip saturation for a low-res mask — so the image axis is
    the right batching axis, exactly the fused-BO argument
    (``bo/loop.py`` image batching). The batched program vmaps the SAME
    jitted single-image core (bit-comparable results), pads N to the next
    pow-2 bucket (trimmed back), and with ``mesh`` shards the image axis
    over ``data_axis`` via ``shard_map`` (weights replicate).

    Returns device arrays ``(heatmaps f32[N,H,W], masks f32[N,s,s],
    prob_orig f32[N], prob_masked f32[N], loss f32[N])`` — dispatch is
    async, so callers overlap host work before fetching (the sweep's
    depth-2 flush pipeline). ``seeds`` (default zeros) match the
    single-image ``learned_mask_saliency(seed=...)`` PRNG streams.
    """
    from network_interpretation_imagenet_tpu.saliency.gradient import (
        _image_batch_scaffold,
        _jit_image_batched,
    )

    if mask_size <= 0 or iters <= 0:
        raise ValueError(f"mask_size/iters must be positive, got "
                         f"{mask_size}/{iters}")
    if jitter < 0 or max_shift < 0:
        raise ValueError(f"jitter/max_shift must be >= 0, got "
                         f"{jitter}/{max_shift}")
    if baseline not in ("blur", "zero"):
        raise ValueError(f"baseline must be 'blur' or 'zero', got "
                         f"{baseline!r}")
    # min_bucket=1: a pad lane here costs a FULL iters-step Adam loop
    # (unlike a single pad backward), so a lone image must not pay for 8.
    # Cost: per-image results may drift in low-order bits across flush
    # compositions that land in different buckets (parity tests use atol).
    images, targets, seeds, n, _ = _image_batch_scaffold(
        images, targets, seeds, mesh, data_axis, min_bucket=1)
    h, w = int(images.shape[1]), int(images.shape[2])
    if n == 0:
        ms = int(mask_size)
        z = jnp.zeros((0,), jnp.float32)
        return (jnp.zeros((0, h, w), jnp.float32),
                jnp.zeros((0, ms, ms), jnp.float32), z, z, z)

    # Normalize jitter/max_shift like the single-image path keys its core
    # cache — (0, 4) and (0, 0) are the same math and must share one
    # compiled N-image program.
    jitter_n = max(int(jitter), 1) if jitter else 1
    shift_n = int(max_shift) if jitter else 0
    key = (logits_fn, int(mask_size), int(iters), float(lr), float(l1),
           float(tv), float(tv_beta), jitter_n, shift_n,
           baseline, float(blur_sigma), h, w,
           jnp.dtype(compute_dtype).name, int(images.shape[0]), mesh,
           data_axis)
    if key not in _BATCH_CACHE:
        run = _learned_mask_core(
            logits_fn, int(mask_size), int(iters), float(lr), float(l1),
            float(tv), float(tv_beta), jitter_n, shift_n, h, w,
            jnp.dtype(compute_dtype).name)

        def one(vs, image, target, seed):
            base = (gaussian_blur(image, blur_sigma) if baseline == "blur"
                    else jnp.zeros_like(image))
            m, p_orig, p_masked, loss = run(
                vs, image, base, target, jax.random.PRNGKey(seed))
            m_up = jax.image.resize(m, (h, w), method="bilinear")
            return 1.0 - m_up, m, p_orig, p_masked, loss

        _BATCH_CACHE[key] = _jit_image_batched(one, mesh, data_axis)
    outs = _BATCH_CACHE[key](variables, images, targets, seeds)
    return tuple(o[:n] for o in outs)


def learned_mask_saliency_batch(
    logits_fn: Callable,
    variables: Any,
    images,
    targets,
    **kwargs,
) -> list:
    """N images' :class:`LearnedMaskResult`s from ONE device program
    (:func:`learned_mask_batch_dispatch` + one batched fetch)."""
    heats, ms, p_orig, p_masked, losses = learned_mask_batch_dispatch(
        logits_fn, variables, images, targets, **kwargs)
    heats, ms, p_orig, p_masked, losses = jax.device_get(
        (heats, ms, p_orig, p_masked, losses))
    return [
        LearnedMaskResult(
            heatmap=np.asarray(heats[i], np.float32),
            mask_lowres=np.asarray(ms[i], np.float32),
            prob_original=float(p_orig[i]),
            prob_masked=float(p_masked[i]),
            final_loss=float(losses[i]),
        )
        for i in range(len(heats))
    ]
