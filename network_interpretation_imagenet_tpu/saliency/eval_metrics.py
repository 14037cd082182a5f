"""Saliency-fidelity metrics: deletion/insertion curves + pointing game.

Beyond-parity addition (the reference scores saliency only by bbox IOU,
``utils.py:114-142``): the standard causal-fidelity protocol — delete (or
insert) the most-salient pixels first and integrate the target-probability
curve (RISE, Petsiuk et al. 2018), plus the pointing game (does the heatmap
argmax land in the gt box).

TPU-first shape: one curve is ONE batched forward over the (steps+1)
progressively-masked images — the per-step masks are rank-threshold
compares against a precomputed rank map, built on device and fused into the
forward's input, exactly like the window-mask engine.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _rank_map(heatmap: np.ndarray) -> np.ndarray:
    """rank2d[y, x] = position of pixel (y, x) in descending-saliency order
    (0 = most salient; ties broken in raster order, deterministically)."""
    flat = np.asarray(heatmap, np.float64).ravel()
    order = np.argsort(-flat, kind="stable")
    rank = np.empty(flat.size, np.int32)
    rank[order] = np.arange(flat.size, dtype=np.int32)
    return rank.reshape(np.asarray(heatmap).shape)


def _curve_probs(engine, image, rank2d, counts, target, mode: str):
    """probs f32[steps+1] for one curve; shares the caller's rank map."""
    import jax.numpy as jnp

    ranks = jnp.asarray(rank2d)[None]
    cuts = jnp.asarray(counts)[:, None, None]
    salient = ranks < cuts
    keep = ~salient if mode == "deletion" else salient
    imgs = jnp.asarray(image)[None] * keep[..., None].astype(jnp.float32)
    logits = np.asarray(engine.predict_logits_device(imgs))
    z = logits - logits.max(axis=-1, keepdims=True)
    return (np.exp(z) / np.exp(z).sum(axis=-1, keepdims=True))[:, int(target)]


def fidelity_curve(
    engine,
    image: np.ndarray,
    heatmap: np.ndarray,
    target: int,
    steps: int = 32,
    mode: str = "deletion",
) -> Tuple[np.ndarray, float]:
    """Target-probability curve as the top-k salient pixels are removed
    ("deletion") or revealed onto a zero baseline ("insertion").

    Returns (probs f32[steps+1], auc float). Good saliency → LOW deletion
    AUC (removing what it marks kills the prediction fast) and HIGH
    insertion AUC. The whole curve is one batched forward.
    """
    if mode not in ("deletion", "insertion"):
        raise ValueError(mode)
    image = np.asarray(image, np.float32)
    n = image.shape[0] * image.shape[1]
    rank2d = _rank_map(np.asarray(heatmap))
    counts = np.round(np.linspace(0, n, steps + 1)).astype(np.int32)
    probs = _curve_probs(engine, image, rank2d, counts, target, mode)
    auc = float(np.trapezoid(probs, dx=1.0 / steps))
    return probs.astype(np.float32), auc


def deletion_insertion_auc(
    engine, image, heatmap, target: int, steps: int = 32
) -> dict:
    """Both curves in ONE batched forward (shared rank map, the 2·(steps+1)
    variants stacked); returns {"deletion_auc", "insertion_auc", curves}."""
    import jax.numpy as jnp

    image = np.asarray(image, np.float32)
    n = image.shape[0] * image.shape[1]
    rank2d = _rank_map(np.asarray(heatmap))
    counts = np.round(np.linspace(0, n, steps + 1)).astype(np.int32)

    ranks = jnp.asarray(rank2d)[None]
    cuts = jnp.asarray(counts)[:, None, None]
    salient = ranks < cuts  # [steps+1, H, W]
    keep = jnp.concatenate([~salient, salient])  # deletion ‖ insertion
    imgs = jnp.asarray(image)[None] * keep[..., None].astype(jnp.float32)
    logits = np.asarray(engine.predict_logits_device(imgs))
    z = logits - logits.max(axis=-1, keepdims=True)
    probs = (np.exp(z) / np.exp(z).sum(axis=-1, keepdims=True))[:, int(target)]
    del_probs = probs[: steps + 1].astype(np.float32)
    ins_probs = probs[steps + 1:].astype(np.float32)
    return {
        "deletion_auc": float(np.trapezoid(del_probs, dx=1.0 / steps)),
        "insertion_auc": float(np.trapezoid(ins_probs, dx=1.0 / steps)),
        "deletion_curve": del_probs,
        "insertion_curve": ins_probs,
    }


def pointing_game(
    heatmap: np.ndarray, gt_bbox_xywh, tolerance: int = 0
) -> bool:
    """True iff the heatmap's argmax falls inside the gt box (± tolerance
    pixels) — the localization 'pointing game' hit criterion."""
    heatmap = np.asarray(heatmap)
    y, x = np.unravel_index(int(np.argmax(heatmap)), heatmap.shape)
    bx, by, bw, bh = [float(v) for v in gt_bbox_xywh]
    # Half-open convention (x in [bx, bx+bw)): correct for BOTH producers —
    # transform_gt_bbox's float boxes are exclusive-width (w = x1·r − x0·r),
    # while ops.metrics' integer boxes are inclusive-width (w = x1 − x0 + 1,
    # so x < bx+bw still admits the last covered column x1). The previous
    # inclusive test shrank float boxes by ~1px at the right/bottom edges.
    return (
        bx - tolerance <= x < bx + bw + tolerance
        and by - tolerance <= y < by + bh + tolerance
    )
