"""Label aggregation: mask bank + per-mask labels → per-pixel saliency.

The reference aggregates by re-reading every mask PNG and walking all pixels
in Python dicts (``bayesian_active_learning_imagenet.py:321-334`` — an
O(K·H·W) interpreter loop). Here the whole aggregation is one einsum on
device: ``heat = Σ_k labels[k] · masks[k]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def summed_label_heatmap(masks: Array, labels: Array) -> Array:
    """Per-pixel summed mask labels.

    Matches reference ``plot_summed_heatmap`` semantics
    (``bayesian_active_learning_imagenet.py:321-344``): each pixel accumulates
    the label (1 = prediction survived, 0 = died) of every mask covering it.
    Pixels covered by no mask stay 0 (the reference's dict default).

    Args:
      masks: bool[K, H, W] mask bank.
      labels: [K] float/int per-mask survive labels.

    Returns:
      f32[H, W] summed-label heatmap.
    """
    return jnp.einsum(
        "khw,k->hw", masks.astype(jnp.float32), labels.astype(jnp.float32)
    )


def summed_superpixel_labels(
    segments: Array, firsts: Array, width: Array, labels: Array,
    s_cap: int = 4096,
) -> Array:
    """Equivalent heatmap computed from window parameters without a mask bank.

    Mirrors ``gp_superpixel_data_imagenet.py:316-326`` (only *surviving*
    masks accumulate there — pass ``labels`` already zeroed for dead masks,
    which ``summed_label_heatmap`` also expects). Memory-lean path for very
    large K: accumulates per-segment counts [S] then gathers through the
    label map instead of materializing [K, H, W].

    Args:
      segments: int32[H, W] contiguous labels 0..S-1.
      firsts: int32[K] window starts.
      width: int32 scalar window length.
      labels: [K] per-mask labels.

    Returns:
      f32[H, W].
    """
    # s_cap is the jit-static bound on segment IDs. Callers that know S must
    # pass s_cap >= S (pow-2 bucketed to bound compiled shapes) — IDs above
    # the cap would silently lose heat and gather-clamp to the top row.
    # Outside a trace the inputs are concrete, so over-cap IDs fail loudly
    # here instead of producing a silently-truncated heatmap.
    if not isinstance(segments, jax.core.Tracer):
        s_max = int(jnp.max(segments))
        if s_max >= int(s_cap):
            raise ValueError(
                f"summed_superpixel_labels: segment id {s_max} >= s_cap "
                f"{int(s_cap)}; pass s_cap >= num_segments (pow-2 bucketed)"
            )
    seg_ids = jnp.arange(int(s_cap), dtype=jnp.int32)
    # in_window[k, s] = first[k] <= s < first[k]+width
    in_window = (seg_ids[None, :] >= firsts[:, None]) & (
        seg_ids[None, :] < (firsts + width)[:, None]
    )
    per_segment = jnp.einsum(
        "ks,k->s", in_window.astype(jnp.float32), labels.astype(jnp.float32)
    )
    return per_segment[segments]


def summed_superpixel_labels_np(segments, firsts, width, labels):
    """Host (numpy) twin of :func:`summed_superpixel_labels` — the sweep's
    collect path uses it so heatmap aggregation never enqueues device work
    behind the next image's mask batch. O(K·S + H·W)."""
    import numpy as np

    segments = np.asarray(segments, np.int64)
    firsts = np.asarray(firsts, np.int64)
    labels = np.asarray(labels, np.float32)
    s = int(segments.max()) + 1
    seg_ids = np.arange(s)
    in_window = (seg_ids[None, :] >= firsts[:, None]) & (
        seg_ids[None, :] < (firsts + int(width))[:, None]
    )
    per_segment = in_window.astype(np.float32).T @ labels
    return per_segment[segments]


def normalize_to_uint8(x: Array) -> Array:
    """Min-max scale to [0, 255] uint8 (reference ``img_show`` idiom,
    e.g. ``bayesian_active_learning_imagenet.py:140-143``)."""
    x = x.astype(jnp.float32)
    x = x - x.min()
    denom = jnp.maximum(x.max(), jnp.finfo(jnp.float32).tiny)
    return (x / denom * 255.0).astype(jnp.uint8)


_NORM_U8_BATCH = None


def normalize_to_uint8_batch(x: Array) -> Array:
    """Per-image :func:`normalize_to_uint8` over a batch, ON DEVICE (jitted
    vmap). Sweeps use this to derive SLIC's display input from an
    already-uploaded image batch instead of uploading a second host-built
    uint8 copy (each flush-sized upload costs ~100 ms through a tunnel)."""
    global _NORM_U8_BATCH
    if _NORM_U8_BATCH is None:
        import jax

        _NORM_U8_BATCH = jax.jit(jax.vmap(normalize_to_uint8))
    return _NORM_U8_BATCH(x)


def normalize_to_uint8_np(x) -> "np.ndarray":
    """Host twin of :func:`normalize_to_uint8` — used on latency-critical
    paths where a device dispatch+fetch would cost a tunnel round-trip."""
    import numpy as np

    x = np.asarray(x, np.float32)
    x = x - x.min()
    denom = max(float(x.max()), float(np.finfo(np.float32).tiny))
    return (x / denom * 255.0).astype(np.uint8)


def distinct_sorted_levels(heat: Array, k_max: int) -> tuple[Array, Array]:
    """Sorted distinct heatmap values, padded to a static length.

    Replaces the reference's ``sorted(set(dict_pixel.values()))``
    (``generate_gp_training_data_imagenet.py:394``). Summed labels take at
    most K+1 distinct integer values (0..K), so ``k_max`` = num_masks + 1
    is a tight static bound.

    Returns:
      (levels f32[k_max] ascending with +inf padding, count int32 scalar).
    """
    flat = heat.reshape(-1)
    # Integer-valued heat: histogram over 0..k_max-1 marks which levels occur.
    idx = jnp.clip(flat.astype(jnp.int32), 0, k_max - 1)
    present = jnp.zeros((k_max,), jnp.bool_).at[idx].set(True)
    levels_all = jnp.arange(k_max, dtype=jnp.float32)
    levels = jnp.where(present, levels_all, jnp.inf)
    order = jnp.argsort(levels)
    sorted_levels = levels[order]
    count = jnp.sum(present.astype(jnp.int32))
    return sorted_levels, count


def threshold_mask(heat: Array, threshold: Array) -> Array:
    """Binary keep-mask of pixels with heat >= threshold.

    Reference ``generate_new_mask`` (``generate_gp_training_data_imagenet.py:550-565``)
    keeps pixels whose summed label meets the threshold.
    """
    return heat >= threshold


def summed_knockout_labels_np(segments, knock_ids, labels):
    """Host twin of ``summed_label_heatmap(knockout_masks(...), labels)``
    without materializing the [K, H, W] bank.

    A knockout mask keeps every pixel except its knocked segments, so pixel
    p in segment s accumulates ``total − Σ_{k: s ∈ ids_k} labels[k]``.
    O(K·M + H·W) — the knockout sweep's collect path.
    """
    import numpy as np

    segments = np.asarray(segments, np.int64)
    knock_ids = np.asarray(knock_ids, np.int64)
    labels = np.asarray(labels, np.float32)
    s = int(segments.max()) + 1
    minus = np.zeros(s, np.float32)
    k, m = knock_ids.shape
    w = np.repeat(labels, m)
    flat = knock_ids.reshape(-1)
    # Duplicate ids within one mask (degenerate-image padding) must count
    # once — dedupe per row before the scatter-add.
    if m > 1:
        first_occurrence = np.ones((k, m), bool)
        sorted_idx = np.argsort(knock_ids, axis=1, kind="stable")
        sorted_ids = np.take_along_axis(knock_ids, sorted_idx, axis=1)
        dup = np.zeros((k, m), bool)
        dup[:, 1:] = sorted_ids[:, 1:] == sorted_ids[:, :-1]
        np.put_along_axis(first_occurrence, sorted_idx, ~dup, axis=1)
        keep = first_occurrence.reshape(-1)
        flat, w = flat[keep], w[keep]
    valid = (flat >= 0) & (flat < s)
    np.add.at(minus, flat[valid], w[valid])
    return (labels.sum() - minus)[segments]
