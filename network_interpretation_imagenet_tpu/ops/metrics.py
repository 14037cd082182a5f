"""Localization & classification metrics: bbox extraction, IOU, top-k.

Reference: ``utils.py:96-142`` (bbox + IOU — with two bugs we fix by default
and reproduce behind ``ref_compat``), ``generate_gp_training_data_imagenet.py:306-319``
(top-1/top-5 accuracy), ``dataset.py:114-120`` (bbox intersection).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Bounding boxes. Boxes are [x, y, w, h] unless noted; corner form is
# [x0, y0, x1, y1].
# ---------------------------------------------------------------------------


def bbox_from_mask(mask: Array) -> Array:
    """Tight bbox [x, y, w, h] of the True region of ``mask`` (bool[H, W]).

    TPU-native replacement for the reference's OpenCV contour scan
    (``utils.py:100-108``): a pure max-extent reduction. Note the reference
    keeps the *largest single contour*; for multi-blob masks the extent box is
    the union instead — callers wanting contour semantics use
    ``largest_component_bbox`` (host, exact parity).

    Returns int32[4]; all-zero box if the mask is empty.
    """
    mask = mask.astype(jnp.bool_)
    h, w = mask.shape
    any_row = jnp.any(mask, axis=1)  # [H]
    any_col = jnp.any(mask, axis=0)  # [W]
    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)
    big = jnp.int32(10**9)
    y0 = jnp.min(jnp.where(any_row, rows, big))
    y1 = jnp.max(jnp.where(any_row, rows, -1))
    x0 = jnp.min(jnp.where(any_col, cols, big))
    x1 = jnp.max(jnp.where(any_col, cols, -1))
    empty = ~jnp.any(mask)
    box = jnp.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1]).astype(jnp.int32)
    return jnp.where(empty, jnp.zeros(4, jnp.int32), box)


def largest_component_bbox(mask: np.ndarray) -> np.ndarray:
    """Bbox [x, y, w, h] of the largest 8-connected component (host, numpy).

    Stand-in for the reference's ``cv2.findContours`` + largest
    ``boundingRect`` (``utils.py:100-108``); 8-connectivity matches
    findContours' treatment of diagonally-touching foreground. Runs once per
    image on a 224² boolean mask — negligible host cost.
    """
    from scipy import ndimage

    mask = np.asarray(mask, bool)
    # 8-connected components in C (a Python flood fill here costs ~0.2-1 s
    # per 224² mask — 10-40× the per-image device budget on the sweep path).
    lab, n = ndimage.label(mask, structure=np.ones((3, 3), int))
    if n == 0:
        return np.zeros(4, np.int32)
    best = (0, 0, 0, 0)
    best_size = 0
    # find_objects returns bboxes in label order = raster order of each
    # component's first pixel, matching the reference's scan order; strict >
    # keeps the first-found box on area ties (utils.py:103-107 keeps the
    # largest w*h area).
    for sl in ndimage.find_objects(lab):
        y0, y1 = sl[0].start, sl[0].stop - 1
        x0, x1 = sl[1].start, sl[1].stop - 1
        bw, bh = x1 - x0 + 1, y1 - y0 + 1
        if bw * bh > best_size:
            best = (x0, y0, bw, bh)
            best_size = bw * bh
    return np.array(best, np.int32)


def generate_boundingbox(
    gray: np.ndarray, threshold: float, ref_compat: bool = False
) -> np.ndarray:
    """Threshold a uint8 heatmap and box the largest component.

    Reference ``utils.generate_boundingbox`` (``utils.py:96-109``) — which
    returns ``[x, y, x, y]`` instead of ``[x, y, w, h]`` (bug at
    ``utils.py:109``). Default returns the intended ``[x, y, w, h]``;
    ``ref_compat=True`` reproduces the bug for parity testing.
    """
    binary = np.asarray(gray) > threshold  # cv2.THRESH_BINARY: > threshold
    x, y, w, h = largest_component_bbox(binary)
    if ref_compat:
        return np.array([x, y, x, y], np.int32)
    return np.array([x, y, w, h], np.int32)


def xywh_to_corners(box: Array) -> Array:
    """[x, y, w, h] → [x0, y0, x1, y1] (the in-place += idiom of
    ``bayesian_active_learning_imagenet.py:371-375``)."""
    box = jnp.asarray(box)
    return jnp.stack([box[0], box[1], box[0] + box[2], box[1] + box[3]])


def iou(box_a: Array, box_b: Array) -> Array:
    """IOU of two corner-form boxes, +1-pixel-inclusive convention.

    Matches reference ``generate_IOU`` arithmetic (``utils.py:114-133``)
    including the ``+1`` pixel-area convention, but clamps the intersection at
    0 for disjoint boxes (the reference lets ``interArea`` go negative).
    """
    box_a = jnp.asarray(box_a, jnp.float32)
    box_b = jnp.asarray(box_b, jnp.float32)
    xa = jnp.maximum(box_a[0], box_b[0])
    ya = jnp.maximum(box_a[1], box_b[1])
    xb = jnp.minimum(box_a[2], box_b[2])
    yb = jnp.minimum(box_a[3], box_b[3])
    inter = jnp.maximum(xb - xa + 1.0, 0.0) * jnp.maximum(yb - ya + 1.0, 0.0)
    area_a = (box_a[2] - box_a[0] + 1.0) * (box_a[3] - box_a[1] + 1.0)
    area_b = (box_b[2] - box_b[0] + 1.0) * (box_b[3] - box_b[1] + 1.0)
    return inter / (area_a + area_b - inter)


def iou_ref_compat(box_a: np.ndarray, box_b: np.ndarray) -> float:
    """Bit-for-bit reference ``generate_IOU`` (``utils.py:114-133``): no
    clamp, so disjoint boxes can yield negative/garbage IOU. Parity only."""
    xa = max(box_a[0], box_b[0])
    ya = max(box_a[1], box_b[1])
    xb = min(box_a[2], box_b[2])
    yb = min(box_a[3], box_b[3])
    inter = (xb - xa + 1) * (yb - ya + 1)
    area_a = (box_a[2] - box_a[0] + 1) * (box_a[3] - box_a[1] + 1)
    area_b = (box_b[2] - box_b[0] + 1) * (box_b[3] - box_b[1] + 1)
    return inter / float(area_a + area_b - inter)


def bbox_intersection(a: Array, b: Array) -> Array:
    """Intersection of two [x, y, w, h] boxes; zeros if disjoint.

    Reference ``dataset.bbox_intersection`` (``dataset.py:114-120``), used by
    the gt-bbox coordinate transform.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    x = jnp.maximum(a[0], b[0])
    y = jnp.maximum(a[1], b[1])
    w = jnp.minimum(a[0] + a[2], b[0] + b[2]) - x
    h = jnp.minimum(a[1] + a[3], b[1] + b[3]) - y
    box = jnp.stack([x, y, w, h])
    return jnp.where((w < 0) | (h < 0), jnp.zeros(4), box)


# ---------------------------------------------------------------------------
# Classification metrics
# ---------------------------------------------------------------------------


def topk_correct(logits: Array, labels: Array, ks: Tuple[int, ...] = (1, 5)) -> Tuple[Array, ...]:
    """Top-k correctness counts (reference ``accuracy``,
    ``generate_gp_training_data_imagenet.py:306-319``).

    Returns one int32 scalar per k: number of samples whose label is within
    the top-k logits.
    """
    max_k = max(ks)
    _, top_idx = jax.lax.top_k(logits, max_k)  # [B, max_k]
    hit = top_idx == labels[:, None]
    out = []
    for k in ks:
        out.append(jnp.sum(jnp.any(hit[:, :k], axis=1).astype(jnp.int32)))
    return tuple(out)
