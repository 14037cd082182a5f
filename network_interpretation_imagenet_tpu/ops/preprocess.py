"""Fused image preprocessing: resize → center-crop → normalize, on device.

Replaces the reference's host-side torchvision transform stack
(``bayesian_active_learning_imagenet.py:402-415``: ``Resize(224) →
CenterCrop(224) → ToTensor → Normalize``) with XLA ops so decode is the only
host step. All functions operate on HWC float arrays and are jittable.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def resize_shorter_side(img: Array, size: int) -> Array:
    """torchvision ``Resize(size)`` semantics: scale so the *shorter* side
    equals ``size``, preserving aspect ratio (bilinear). The long side is
    ``int(size * long / short)`` — truncation, exactly as torchvision's
    ``_compute_resized_output_size`` (500×375 → 298×224, not 299).

    Note: output shape depends on input shape — run un-jitted or pad; the
    standard pipeline immediately center-crops to a static size.
    """
    h, w = img.shape[0], img.shape[1]
    if h <= w:
        new_h, new_w = size, max(1, int(size * w / h))
    else:
        new_h, new_w = max(1, int(size * h / w)), size
    return jax.image.resize(img, (new_h, new_w) + img.shape[2:], method="bilinear")


def resize_to(img: Array, hw: Tuple[int, int]) -> Array:
    """Exact-size bilinear resize (torchvision ``Resize((h, w))``,
    used by the localization dataset at ``dataset.py:100``)."""
    return jax.image.resize(img, tuple(hw) + img.shape[2:], method="bilinear")


def center_crop(img: Array, size: int) -> Array:
    """torchvision ``CenterCrop(size)``: crop offsets ``round((dim-size)/2)``
    per side; pads with zeros when the image is smaller."""
    h, w = img.shape[0], img.shape[1]
    if h < size or w < size:
        pad_h, pad_w = max(0, size - h), max(0, size - w)
        img = jnp.pad(
            img,
            ((pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2))
            + ((0, 0),) * (img.ndim - 2),
        )
        h, w = img.shape[0], img.shape[1]
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return img[top : top + size, left : left + size]


def normalize(img: Array, mean: Sequence[float], std: Sequence[float]) -> Array:
    """Per-channel ``(x - mean) / std`` on a [0, 1]-scaled HWC image
    (torchvision ``Normalize``)."""
    mean_a = jnp.asarray(mean, img.dtype)
    std_a = jnp.asarray(std, img.dtype)
    return (img - mean_a) / std_a


def denormalize(img: Array, mean: Sequence[float], std: Sequence[float]) -> Array:
    """Inverse of :func:`normalize`."""
    mean_a = jnp.asarray(mean, img.dtype)
    std_a = jnp.asarray(std, img.dtype)
    return img * std_a + mean_a


def to_display_uint8(img: Array) -> Array:
    """The reference's ``img_show`` idiom
    (``bayesian_active_learning_imagenet.py:140-143``): min-max scale a
    *normalized* HWC image to uint8 [0, 255]. This is the image the reference
    feeds to Felzenszwalb — reproduced exactly so segmentation parity holds.
    """
    x = img.astype(jnp.float32)
    x = x - x.min()
    x = x / jnp.maximum(x.max(), jnp.finfo(jnp.float32).tiny)
    return (x * 255.0).astype(jnp.uint8)


def standard_eval_pipeline(
    img_u8: Array, size: int, mean: Sequence[float], std: Sequence[float]
) -> Array:
    """uint8 HWC → normalized f32 HWC at ``size``²: the full reference eval
    transform (Resize(shorter=size) → CenterCrop(size) → /255 → Normalize)."""
    img = img_u8.astype(jnp.float32) / 255.0
    img = resize_shorter_side(img, size)
    img = center_crop(img, size)
    return normalize(img, mean, std)
