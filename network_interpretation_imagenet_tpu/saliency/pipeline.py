"""Per-image saliency pipelines: random-window, knockout, threshold search.

End-to-end in-memory equivalents of the reference's script flows:
  * random-window sampling + heatmap —
    ``generate_gp_training_data_imagenet.py:152-273``,
    ``gp_superpixel_data_imagenet.py:186-356``;
  * single/multi-segment knockout (MNIST/CIFAR) —
    ``generate_gp_training_data_mnist.py:153-278``,
    ``generate_gp_training_data_cifar.py:236-349``;
  * minimal-mask threshold search —
    ``generate_gp_training_data_imagenet.py:334-487`` (binary search over
    distinct summed-label levels; here all levels are evaluated in ONE
    batched forward and the reference's decision procedure replays on the
    result array — fewer device round-trips, identical output);
  * bbox + IOU scoring — ``bayesian_active_learning_imagenet.py:369-377``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.ops import aggregate, masking, metrics
from network_interpretation_imagenet_tpu.saliency.engine import (
    MaskEvalResult,
    SaliencyEngine,
)


@dataclasses.dataclass
class SaliencyOutput:
    """Everything the reference writes to ./masks + heatmaps, in memory."""

    segments: np.ndarray          # int32[H, W]
    num_segments: int
    eval: MaskEvalResult          # per-mask outcomes
    heatmap: np.ndarray           # f32[H, W] summed-label heatmap
    firsts: Optional[np.ndarray] = None      # window starts (window mode)
    width: Optional[int] = None
    knock_ids: Optional[np.ndarray] = None   # knockout mode
    masks: Optional[np.ndarray] = None       # bool[K, H, W] when materialized


def random_window_saliency(
    engine: SaliencyEngine,
    image,
    segments: np.ndarray,
    num_samples: int,
    window_fraction: float = 0.4,
    seed: int = 0,
    target: Optional[int] = None,
) -> SaliencyOutput:
    """Random contiguous-window mask sampling + summed-label heatmap.

    Heatmap counts only surviving masks (``gp_superpixel_data_imagenet.py:316-326``).
    """
    segments = np.asarray(segments, np.int32)
    s = int(segments.max()) + 1
    width = int(window_fraction * s)
    if target is None:
        target, _ = engine.predict_one(image)
    key = jax.random.PRNGKey(seed)
    firsts = np.asarray(
        masking.sample_window_starts(key, num_samples, jnp.int32(s), jnp.int32(width))
    )
    result = engine.eval_window_masks(image, segments, firsts, width, target)
    # Host aggregation (parity-tested twin of the device einsum): an extra
    # device dispatch+fetch here costs ~90 ms of tunnel round-trips per image
    # against ~1 ms of numpy.
    heat = aggregate.summed_superpixel_labels_np(
        segments, firsts, width, result.survived
    )
    return SaliencyOutput(
        segments=segments, num_segments=s, eval=result, heatmap=heat,
        firsts=firsts, width=width,
    )


def knockout_saliency(
    engine: SaliencyEngine,
    image,
    segments: np.ndarray,
    num_samples: int,
    num_knockout: int = 1,
    seed: int = 0,
    target: Optional[int] = None,
) -> SaliencyOutput:
    """Knockout-mask sampling (MNIST: 1 segment, CIFAR: 5 segments).

    The heatmap follows the reference's PNG aggregation semantics: kept
    pixels (mask==255) accumulate the survive label
    (``gp_regression.py:87-94`` over knockout masks).
    """
    segments = np.asarray(segments, np.int32)
    s = int(segments.max()) + 1
    if target is None:
        target, _ = engine.predict_one(image)
    key = jax.random.PRNGKey(seed)
    knock_ids = np.asarray(
        masking.sample_knockout_ids(
            key, num_samples, num_knockout, jnp.int32(s),
            # pow-2 bucketed static ID bound: correct for any S, and images
            # with different (large) segment counts share compiled shapes.
            max_s=max(4096, 1 << (s - 1).bit_length()),
        )
    )
    result = engine.eval_knockout_masks(image, segments, knock_ids, target)
    masks = np.asarray(
        masking.knockout_masks(jnp.asarray(segments), jnp.asarray(knock_ids))
    )
    heat = np.asarray(
        aggregate.summed_label_heatmap(jnp.asarray(masks), jnp.asarray(result.survived))
    )
    return SaliencyOutput(
        segments=segments, num_segments=s, eval=result, heatmap=heat,
        knock_ids=knock_ids, masks=masks,
    )


def minimal_mask_search(
    engine: SaliencyEngine,
    image,
    heatmap: np.ndarray,
    target: int,
    max_levels: Optional[int] = None,
) -> Tuple[Optional[float], np.ndarray, np.ndarray]:
    """Find the summed-label threshold of the minimal prediction-keeping mask.

    Reference (``generate_gp_training_data_imagenet.py:396-487``): binary
    search over sorted distinct heatmap levels, two masked forwards per
    probe, stopping where threshold t keeps the prediction and t_next kills
    it. Here all ≤K+1 level masks are evaluated in one batched forward and
    the identical decision procedure replays over the boolean array.

    Returns (threshold or None, keep_flags per level, levels).
    """
    heat = np.asarray(heatmap)
    levels = np.unique(heat)
    if max_levels is not None and len(levels) > max_levels:
        levels = levels[np.linspace(0, len(levels) - 1, max_levels).astype(int)]
    masks = heat[None, :, :] >= levels[:, None, None]
    result = engine.eval_mask_bank(image, masks, target)
    keep = result.survived

    first, last = 0, len(levels) - 1
    while first <= last:
        mid = (first + last) // 2
        if keep[mid]:
            if mid + 1 >= len(levels) or not keep[mid + 1]:
                return float(levels[mid]), keep, levels
            first = mid + 1
        else:
            last = mid - 1
    return None, keep, levels


def localization_score(
    heatmap: np.ndarray,
    gt_bbox_xywh,
    bbox_threshold: int = 180,
    ref_compat: bool = False,
) -> Tuple[float, np.ndarray]:
    """Heatmap → uint8 → threshold → largest-component bbox → IOU vs gt.

    Reference flow ``bayesian_active_learning_imagenet.py:369-377`` with the
    ``[x,y,x,y]`` bbox bug fixed by default (``ref_compat=True`` reproduces
    reference arithmetic end-to-end for parity studies).
    """
    gray = aggregate.normalize_to_uint8_np(heatmap)
    pred_xywh = metrics.generate_boundingbox(gray, bbox_threshold, ref_compat=ref_compat)
    if ref_compat:
        pred = np.array(
            [pred_xywh[0], pred_xywh[1], pred_xywh[2] + pred_xywh[0],
             pred_xywh[3] + pred_xywh[1]]
        )
        gt = np.array(
            [gt_bbox_xywh[0], gt_bbox_xywh[1], gt_bbox_xywh[2] + gt_bbox_xywh[0],
             gt_bbox_xywh[3] + gt_bbox_xywh[1]]
        )
        return metrics.iou_ref_compat(pred, gt), pred_xywh
    # 4-float box math on host — jnp here costs a tunnel round-trip per call.
    def corners(b):
        b = np.asarray(b, np.float64)
        return np.array([b[0], b[1], b[0] + b[2], b[1] + b[3]])

    pred, gt = corners(pred_xywh), corners(gt_bbox_xywh)
    xa, ya = max(pred[0], gt[0]), max(pred[1], gt[1])
    xb, yb = min(pred[2], gt[2]), min(pred[3], gt[3])
    inter = max(0.0, xb - xa + 1) * max(0.0, yb - ya + 1)
    area_p = (pred[2] - pred[0] + 1) * (pred[3] - pred[1] + 1)
    area_g = (gt[2] - gt[0] + 1) * (gt[3] - gt[1] + 1)
    return float(inter / (area_p + area_g - inter)), pred_xywh
