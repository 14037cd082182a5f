"""Mask-parallel masked-forward evaluation over a device mesh.

The mask-sample axis is this workload's scaling dimension (SURVEY.md §5):
K masks shard over the "data" axis; each device builds its local mask chunk
from the replicated segment map and runs the local batched forward; per-mask
outputs come back sharded (no collective needed — metrics reductions use
``psum`` inside `shard_map` when requested).

The jitted shard_map wrappers are cached per (mesh, logits_fn, dtype, axis):
``target``/``width`` enter as traced scalars, so a val-set sweep over many
images reuses ONE compiled executable per mask-count bucket instead of
re-tracing (and, with per-image target classes baked in, re-compiling) the
whole model forward per image.
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

# (kind, mesh, logits_fn, dtype-name, data_axis) → jitted shard_map wrapper.
# Bound methods hash by (instance, function), Mesh and dtypes are hashable,
# so repeat calls with the same engine/bundle hit the same entry; jit's own
# cache then keys on operand shapes.
_FN_CACHE: dict = {}


def _single_eval_fn(mesh, logits_fn, compute_dtype, data_axis):
    key = ("single", mesh, logits_fn, jnp.dtype(compute_dtype).name, data_axis)
    if key not in _FN_CACHE:

        def local_eval(variables, image, segments, width, target, f_local,
                       valid_local):
            masks = masking.window_masks(segments, f_local, width)
            imgs = masking.apply_masks(image, masks).astype(compute_dtype)
            logits = logits_fn(variables, imgs).astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            preds = jnp.argmax(logits, axis=-1)
            survived = (preds == target) & valid_local
            count = jax.lax.psum(jnp.sum(survived.astype(jnp.int32)), data_axis)
            return survived, probs[:, target], count

        _FN_CACHE[key] = jax.jit(shard_map(
            local_eval,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(data_axis), P(data_axis)),
            out_specs=(P(data_axis), P(data_axis), P()),
            check_vma=False,
        ))
    return _FN_CACHE[key]


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

    fn = _single_eval_fn(mesh, logits_fn, compute_dtype, data_axis)
    survived, probs, count = fn(
        variables,
        jnp.asarray(image),
        jnp.asarray(segments),
        jnp.int32(width),
        jnp.int32(target),
        jnp.asarray(firsts),
        jnp.asarray(valid),
    )
    return (
        np.asarray(survived)[:k],
        np.asarray(probs)[:k],
        int(np.asarray(count).reshape(-1)[0]),
    )


def _multi_eval_fn(mesh, logits_fn, compute_dtype, data_axis):
    key = ("multi", mesh, logits_fn, jnp.dtype(compute_dtype).name, data_axis)
    if key not in _FN_CACHE:

        def local_eval(variables, images, segments, widths, targets,
                       pairs_local):
            img_idx = pairs_local[:, 0]
            f = pairs_local[:, 1]
            seg = segments[img_idx]
            lo = f[:, None, None]
            hi = lo + widths[img_idx][:, None, None]
            masks = (seg >= lo) & (seg < hi)
            imgs = (images[img_idx]
                    * masks[..., None].astype(images.dtype)).astype(compute_dtype)
            logits = logits_fn(variables, imgs).astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            preds = jnp.argmax(logits, axis=-1)
            t = targets[img_idx]
            p_t = jnp.take_along_axis(probs, t[:, None], axis=1)[:, 0]
            return preds == t, p_t

        _FN_CACHE[key] = jax.jit(shard_map(
            local_eval,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(data_axis)),
            out_specs=(P(data_axis), P(data_axis)),
            check_vma=False,
        ))
    return _FN_CACHE[key]


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

    fn = _multi_eval_fn(mesh, logits_fn, compute_dtype, data_axis)
    survived, p_t = fn(
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


def _single_knockout_fn(mesh, logits_fn, compute_dtype, data_axis):
    key = ("knockout", mesh, logits_fn, jnp.dtype(compute_dtype).name,
           data_axis)
    if key not in _FN_CACHE:

        def local_eval(variables, image, segments, target, ids_local,
                       valid_local):
            masks = masking.knockout_masks(segments, ids_local)
            imgs = masking.apply_masks(image, masks).astype(compute_dtype)
            logits = logits_fn(variables, imgs).astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            preds = jnp.argmax(logits, axis=-1)
            survived = (preds == target) & valid_local
            count = jax.lax.psum(jnp.sum(survived.astype(jnp.int32)), data_axis)
            return survived, probs[:, target], count

        _FN_CACHE[key] = jax.jit(shard_map(
            local_eval,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(data_axis), P(data_axis)),
            out_specs=(P(data_axis), P(data_axis), P()),
            check_vma=False,
        ))
    return _FN_CACHE[key]


def sharded_knockout_eval(
    mesh: Mesh,
    logits_fn: Callable[[Any, Array], Array],
    variables: Any,
    image: Array,
    segments: Array,
    knock_ids: np.ndarray,
    target: int,
    compute_dtype: Any = jnp.bfloat16,
    data_axis: str = "data",
) -> Tuple[np.ndarray, np.ndarray, int]:
    """K knockout masks (int32[K, M] ids) sharded over the data axis — the
    knockout twin of :func:`sharded_window_eval` (reference MNIST/CIFAR
    1000-mask semantics, ``generate_gp_training_data_mnist.py:203-269``)."""
    n_data = mesh.shape[data_axis]
    knock_ids = np.asarray(knock_ids, np.int32)
    k = len(knock_ids)
    pad = (-k) % n_data
    if pad:
        knock_ids = np.concatenate(
            [knock_ids, np.full((pad, knock_ids.shape[1]), -1, np.int32)]
        )
    valid = np.arange(len(knock_ids)) < k

    fn = _single_knockout_fn(mesh, logits_fn, compute_dtype, data_axis)
    survived, probs, count = fn(
        variables,
        jnp.asarray(image),
        jnp.asarray(segments),
        jnp.int32(target),
        jnp.asarray(knock_ids),
        jnp.asarray(valid),
    )
    return (
        np.asarray(survived)[:k],
        np.asarray(probs)[:k],
        int(np.asarray(count).reshape(-1)[0]),
    )


def _multi_knockout_fn(mesh, logits_fn, compute_dtype, data_axis):
    key = ("multi_knockout", mesh, logits_fn, jnp.dtype(compute_dtype).name,
           data_axis)
    if key not in _FN_CACHE:

        def local_eval(variables, images, segments, targets, rows_local):
            img_idx = rows_local[:, 0]
            ids = rows_local[:, 1:]
            seg = segments[img_idx]
            hit = jnp.any(
                seg[:, None, :, :] == ids[:, :, None, None], axis=1
            )
            imgs = (images[img_idx]
                    * (~hit)[..., None].astype(images.dtype)).astype(compute_dtype)
            logits = logits_fn(variables, imgs).astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            preds = jnp.argmax(logits, axis=-1)
            t = targets[img_idx]
            p_t = jnp.take_along_axis(probs, t[:, None], axis=1)[:, 0]
            return preds == t, p_t

        _FN_CACHE[key] = jax.jit(shard_map(
            local_eval,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(data_axis)),
            out_specs=(P(data_axis), P(data_axis)),
            check_vma=False,
        ))
    return _FN_CACHE[key]


def sharded_knockout_eval_multi(
    mesh: Mesh,
    logits_fn: Callable[[Any, Array], Array],
    variables: Any,
    images: np.ndarray,
    segments: np.ndarray,
    knock_ids: np.ndarray,
    targets: np.ndarray,
    compute_dtype: Any = jnp.bfloat16,
    data_axis: str = "data",
) -> Tuple[np.ndarray, np.ndarray]:
    """N images × K knockout masks (int32[N, K, M]) sharded over the data
    axis; returns (survived bool[N, K], prob_target f32[N, K]) — the
    knockout twin of :func:`sharded_window_eval_multi`."""
    images = np.asarray(images, np.float32)
    segments = np.asarray(segments, np.int32)
    knock_ids = np.asarray(knock_ids, np.int32)
    targets = np.asarray(targets, np.int32)
    n, k, m = knock_ids.shape
    n_data = mesh.shape[data_axis]

    rows = np.concatenate(
        [
            np.repeat(np.arange(n, dtype=np.int32), k)[:, None],
            knock_ids.reshape(n * k, m),
        ],
        axis=1,
    )
    total = n * k
    pad = (-total) % n_data
    if pad:
        fill = np.full((pad, m + 1), 0, np.int32)
        fill[:, 1:] = -1  # image 0, knock nothing — trimmed below
        rows = np.concatenate([rows, fill])

    fn = _multi_knockout_fn(mesh, logits_fn, compute_dtype, data_axis)
    survived, p_t = fn(
        variables,
        jnp.asarray(images),
        jnp.asarray(segments),
        jnp.asarray(targets),
        jnp.asarray(rows),
    )
    survived = np.asarray(survived)[:total].reshape(n, k)
    p_t = np.asarray(p_t)[:total].reshape(n, k)
    return survived, p_t
