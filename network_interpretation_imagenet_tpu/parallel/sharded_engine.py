"""Mask-parallel masked-forward evaluation over a device mesh.

The mask-sample axis is this workload's scaling dimension (SURVEY.md §5):
K masks shard over the "data" axis; each device builds its local mask chunk
from the replicated segment map and runs the local batched forward; per-mask
outputs come back sharded (no collective needed — metrics reductions use
``psum`` inside `shard_map` when requested).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from network_interpretation_imagenet_tpu.ops import masking

Array = jax.Array


def sharded_window_eval(
    mesh: Mesh,
    logits_fn: Callable[[Any, Array], Array],
    variables: Any,
    image: Array,
    segments: Array,
    firsts: np.ndarray,
    width: int,
    target: int,
    compute_dtype: Any = jnp.bfloat16,
    data_axis: str = "data",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Evaluate K window masks sharded over the mesh's data axis.

    Returns (survived bool[K], prob_target f32[K], global_survive_count) —
    the count is computed with an on-device ``psum`` across shards.

    K is padded to a multiple of the data-axis size; callers get trimmed
    outputs.
    """
    n_data = mesh.shape[data_axis]
    firsts = np.asarray(firsts, np.int32)
    k = len(firsts)
    pad = (-k) % n_data
    if pad:
        firsts = np.concatenate([firsts, np.zeros(pad, np.int32)])
    valid = np.arange(len(firsts)) < k

    def local_eval(variables, image, segments, f_local, valid_local):
        masks = masking.window_masks(segments, f_local, jnp.int32(width))
        imgs = masking.apply_masks(image, masks).astype(compute_dtype)
        logits = logits_fn(variables, imgs).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        survived = (preds == target) & valid_local
        count = jax.lax.psum(jnp.sum(survived.astype(jnp.int32)), data_axis)
        return survived, probs[:, target], count

    spec_data = P(data_axis)
    spec_rep = P()
    fn = shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(spec_rep, spec_rep, spec_rep, spec_data, spec_data),
        out_specs=(spec_data, spec_data, spec_rep),
        check_vma=False,
    )
    survived, probs, count = jax.jit(fn)(
        variables,
        jnp.asarray(image),
        jnp.asarray(segments),
        jnp.asarray(firsts),
        jnp.asarray(valid),
    )
    return (
        np.asarray(survived)[:k],
        np.asarray(probs)[:k],
        int(np.asarray(count).reshape(-1)[0]),
    )


def sharded_window_eval_multi(
    mesh: Mesh,
    logits_fn: Callable[[Any, Array], Array],
    variables: Any,
    images: np.ndarray,
    segments: np.ndarray,
    firsts: np.ndarray,
    widths: np.ndarray,
    targets: np.ndarray,
    compute_dtype: Any = jnp.bfloat16,
    data_axis: str = "data",
) -> Tuple[np.ndarray, np.ndarray]:
    """N images × K window masks sharded over the mesh's data axis.

    The N·K grid flattens to (image_idx, first) pairs (the same layout as
    the single-device ``SaliencyEngine.eval_window_masks_multi``); each
    device gathers its slice of pairs against the replicated image/segment
    stacks — the val-set sweep's multi-image path composed with the mesh.

    Returns (survived bool[N, K], prob_target f32[N, K]).
    """
    images = np.asarray(images, np.float32)
    segments = np.asarray(segments, np.int32)
    firsts = np.asarray(firsts, np.int32)
    widths = np.asarray(widths, np.int32)
    targets = np.asarray(targets, np.int32)
    n, k = firsts.shape
    n_data = mesh.shape[data_axis]

    pairs = np.stack(
        [np.repeat(np.arange(n, dtype=np.int32), k), firsts.reshape(-1)], axis=1
    )
    total = n * k
    pad = (-total) % n_data
    if pad:
        pairs = np.concatenate([pairs, np.zeros((pad, 2), np.int32)])

    def local_eval(variables, images, segments, widths, targets, pairs_local):
        img_idx = pairs_local[:, 0]
        f = pairs_local[:, 1]
        seg = segments[img_idx]
        lo = f[:, None, None]
        hi = lo + widths[img_idx][:, None, None]
        masks = (seg >= lo) & (seg < hi)
        imgs = (images[img_idx] * masks[..., None].astype(images.dtype)).astype(
            compute_dtype
        )
        logits = logits_fn(variables, imgs).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        preds = jnp.argmax(logits, axis=-1)
        t = targets[img_idx]
        p_t = jnp.take_along_axis(probs, t[:, None], axis=1)[:, 0]
        return preds == t, p_t

    fn = shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis)),
        check_vma=False,
    )
    survived, p_t = jax.jit(fn)(
        variables,
        jnp.asarray(images),
        jnp.asarray(segments),
        jnp.asarray(widths),
        jnp.asarray(targets),
        jnp.asarray(pairs),
    )
    survived = np.asarray(survived)[:total].reshape(n, k)
    p_t = np.asarray(p_t)[:total].reshape(n, k)
    return survived, p_t
