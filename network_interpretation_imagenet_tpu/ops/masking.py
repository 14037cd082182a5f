"""Superpixel mask construction — pure, jit-static, batched.

The reference builds each mask with a Python loop over segment IDs
(``bayesian_active_learning_imagenet.py:182-185``::

    mask = np.zeros(...); for segVal in window: mask[segments == segVal] = 1

and evaluates one mask per forward. Here a whole *bank* of masks is a single
broadcast comparison against the segment label map, so mask construction is a
VPU-friendly elementwise op and the masked forwards batch onto the MXU.

Key observation: Felzenszwalb/SLIC label maps are relabeled to contiguous
``0..S-1``, and the reference's "window" keeps ``np.unique(segments)[first :
first+width]``. With contiguous IDs the window mask at pixel p is just
``first <= segments[p] < first + width`` — no gather, no loop, no unique().

All functions are shape-static: ``segments`` may contain fewer than
``max_segments`` distinct labels; callers pass the *actual* segment count as a
traced scalar so everything stays jittable across images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def window_masks(segments: Array, firsts: Array, width: Array) -> Array:
    """Build contiguous-window superpixel masks.

    Reference semantics (``bayesian_active_learning_imagenet.py:178-185``):
    keep superpixels with IDs in ``[first, first+width)``; numpy slicing clips
    windows that run past the last segment, which the comparison reproduces
    automatically.

    Args:
      segments: int32[H, W] contiguous superpixel labels ``0..S-1``.
      firsts: int32[K] window start indices (one mask per entry).
      width: int32 scalar (or [K]) window length, typically ``int(0.4*S)``.

    Returns:
      bool[K, H, W] mask bank; True = pixel kept.
    """
    firsts = jnp.asarray(firsts, jnp.int32)
    width = jnp.asarray(width, jnp.int32)  # scalar or [K]; broadcasting covers both
    seg = segments[None, :, :]
    lo = firsts[:, None, None]
    hi = (firsts + width)[:, None, None]
    return (seg >= lo) & (seg < hi)


def knockout_masks(segments: Array, knock_ids: Array) -> Array:
    """Build knockout masks: zero the listed segments, keep everything else.

    Reference semantics (``generate_gp_training_data_mnist.py:218-223``):
    ``mask.fill(255); mask[segments == segVal] = 0`` for each sampled segment.

    Args:
      segments: int32[H, W] labels.
      knock_ids: int32[K, M] — per mask, M segment IDs to knock out. Use an
        out-of-range sentinel (e.g. -1) to knock out fewer than M.

    Returns:
      bool[K, H, W]; True = pixel kept.
    """
    knock_ids = jnp.asarray(knock_ids, jnp.int32)
    # [K, M, H, W] equality collapsed over M.
    hit = jnp.any(segments[None, None, :, :] == knock_ids[:, :, None, None], axis=1)
    return ~hit


def single_mask_from_window(segments: Array, first: Array, width: Array) -> Array:
    """One window mask (bool[H, W]) — convenience for BO's per-iteration mask."""
    return window_masks(segments, jnp.asarray([first], jnp.int32), width)[0]


def apply_masks(image: Array, masks: Array) -> Array:
    """Apply a mask bank to one image: out[k] = image * masks[k].

    The reference multiplies the *normalized* image by the binary mask
    (``bayesian_active_learning_imagenet.py:187``), so masked-out pixels hold
    value 0 in normalized space (not the dataset mean). We reproduce that.

    Args:
      image: f[H, W, C] (normalized, NHWC — TPU-friendly layout).
      masks: bool[K, H, W].

    Returns:
      f[K, H, W, C] masked image batch (same dtype as ``image``).
    """
    return image[None] * masks[:, :, :, None].astype(image.dtype)


def masked_fraction(masks: Array) -> Array:
    """Fraction of pixels kept per mask: f32[K]."""
    k = masks.shape[0]
    return jnp.mean(masks.reshape(k, -1).astype(jnp.float32), axis=1)


def sample_window_starts(
    key: Array, num: int, total_segments: Array, width: Array
) -> Array:
    """Random window starts, reference-distribution-compatible.

    Reference (``generate_gp_training_data_imagenet.py:227``):
    ``firstIndex = randint(1, S - width)`` — Python's inclusive randint over
    ``[1, S - width]``.

    Args:
      key: PRNG key.
      num: number of samples K (static).
      total_segments: traced int32 scalar S.
      width: traced int32 scalar window length.

    Returns:
      int32[K] starts in ``[1, S - width]``.
    """
    hi = jnp.maximum(total_segments - width, 1)  # guard tiny S
    # randint's upper bound is exclusive → +1 for Python-randint inclusivity.
    return jax.random.randint(key, (num,), 1, hi + 1, dtype=jnp.int32)


def sample_window_starts_host(
    seed: int, num: int, total_segments: int, width: int
):
    """Host-side (numpy) twin of :func:`sample_window_starts`.

    Same distribution — Python-randint-inclusive uniform over
    ``[1, S - width]`` (``generate_gp_training_data_imagenet.py:227``) — but
    sampled on the host so the sweep's dispatch path never blocks on a
    device round-trip. Different PRNG stream than the jax version; the sweep
    uses this one everywhere so its code paths stay comparable.
    """
    import numpy as np

    hi = max(int(total_segments) - int(width), 1)
    rng = np.random.RandomState(seed)
    return rng.randint(1, hi + 1, size=num).astype(np.int32)


def sample_knockout_ids(
    key: Array, num: int, m: int, total_segments: Array, max_s: int = 4096
) -> Array:
    """Random knockout segment IDs, K masks × M segments each.

    Reference (``generate_gp_training_data_mnist.py:215``):
    ``sample(range(uniq[0], uniq[-1]), M)`` — M *distinct* IDs drawn from
    ``[0, S-1)`` (the last segment is never knocked out — a reference quirk we
    preserve for parity).

    Distinctness within a mask matters only when M > 1 (CIFAR M=5); we draw
    without replacement via per-mask random permutation scores.

    Returns:
      int32[K, M] segment IDs in ``[0, S-1)``.
    """
    hi = jnp.maximum(total_segments - 1, 1)  # exclusive upper bound, ≥1
    if m == 1:
        return jax.random.randint(key, (num, 1), 0, hi, dtype=jnp.int32)
    # Without replacement from a traced-size range: rank random scores that are
    # +inf outside [0, hi) and take the M smallest indices. ``max_s`` is the
    # jit-static ID bound — callers with S possibly > 4096 must pass a larger
    # (pow-2 bucketed) cap or high IDs are never sampled.
    scores = jax.random.uniform(key, (num, int(max_s)))
    idx = jnp.arange(int(max_s))[None, :]
    scores = jnp.where(idx < hi, scores, jnp.inf)
    _, picked = jax.lax.top_k(-scores, m)  # M smallest scores
    # Degenerate images (fewer than M eligible segments): +inf-scored pad
    # indices can be picked — clamp into the valid range (duplicates, like
    # knocking out fewer segments) instead of returning phantom IDs.
    picked = jnp.minimum(picked, hi - 1)
    return picked.astype(jnp.int32)


def sample_knockout_ids_host(
    seed: int, num: int, m: int, total_segments: int
):
    """Host-side (numpy) twin of :func:`sample_knockout_ids` — the knockout
    sweep's dispatch path samples here so it never blocks on a device round
    trip (mirrors :func:`sample_window_starts_host` for the window sweep).

    Same distribution: M distinct IDs uniform over ``[0, S-1)`` per mask
    (reference ``generate_gp_training_data_mnist.py:215`` /
    ``generate_gp_training_data_cifar.py:308`` — the last segment is never
    knocked out).

    Returns int32[num, m].
    """
    import numpy as np

    hi = max(int(total_segments) - 1, 1)
    rng = np.random.RandomState(seed)
    if m == 1:
        return rng.randint(0, hi, size=(num, 1)).astype(np.int32)
    m_eff = min(m, hi)  # degenerate images: fewer eligible segments than M
    ids = np.empty((num, m), np.int32)
    # argpartition of per-mask uniform scores = without-replacement draw,
    # vectorized over the K axis (K can be 1000+; a Python sample() loop
    # would serialize the sweep's host side).
    scores = rng.rand(num, hi)
    picked = np.argpartition(scores, m_eff - 1, axis=1)[:, :m_eff]
    ids[:, :m_eff] = picked
    if m_eff < m:  # pad with duplicates (same effect as fewer knockouts)
        ids[:, m_eff:] = picked[:, :1]
    return ids
