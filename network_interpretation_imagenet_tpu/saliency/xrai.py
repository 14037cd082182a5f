"""XRAI region-based attribution (Kapishnikov et al., ICCV 2019).

Composes two primitives this framework already owns: batched
integrated-gradients path backwards (``saliency.gradient``) and
superpixel oversegmentation (``segment.felzenszwalb`` — the same
segmenter the reference drives for its mask windows,
``/root/reference/bayesian_active_learning_imagenet.py:150``). XRAI
greedily grows a set of superpixel regions in order of attribution
*density* (gain per uncovered pixel), producing a saliency map whose
level sets are coherent regions instead of per-pixel speckle — a
natural beyond-parity member of the attribution family, since regions
ARE this framework's masking currency.

TPU split: the expensive half (|baselines|·steps classifier backwards)
runs as ONE vmapped device program; the greedy ranking is host numpy
BY DESIGN — each pixel is claimed exactly once, so with per-scale
disjoint segment maps the total bookkeeping is O(scales·H·W) bincounts
plus an O(S) argmax per step (≪ a millisecond at 224²; data-dependent
selection order would force a serial ``lax.while_loop`` with nothing
for the MXU to do).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..segment.felzenszwalb import felzenszwalb_ladder
from .gradient import _target_logit_fn

Array = jax.Array

#: Felzenszwalb scales for the multi-level oversegmentation (the XRAI
#: paper's dilation ladder; min_size grows with scale so coarse levels
#: stay coarse). Tuned for 224² natural images — use
#: :func:`adaptive_scales` (the ``scales=None`` default everywhere) to
#: map them to other resolutions.
DEFAULT_SCALES = (50.0, 100.0, 150.0, 250.0, 500.0)

#: The image area DEFAULT_SCALES are calibrated for.
_REF_AREA = 224 * 224


def adaptive_scales(height: int, width: int,
                    base: Sequence[float] = DEFAULT_SCALES):
    """``base`` scales mapped from 224² to an ``height×width`` image.

    Felzenszwalb's ``scale`` (k) is a merge-threshold with pixel-count
    units — τ(C) = k/|C| — so a ladder tuned for 50k-pixel images
    over-merges small inputs: on a smooth 32×32 photograph every
    DEFAULT_SCALES level yields ONE region, which collapses the greedy
    ranking to a constant (information-free) heatmap — caught by the
    round-5 method study's degenerate-row accounting on the real-JPEG
    table. Scaling k by the area ratio keeps the ladder's region
    granularity roughly resolution-invariant; the floor keeps the finest
    level meaningful on tiny inputs."""
    ratio = (int(height) * int(width)) / float(_REF_AREA)
    return tuple(max(1.0, float(s) * ratio) for s in base)


def xrai_attribution(
    logits_fn: Callable,
    variables: Any,
    image: Array,
    target: int,
    steps: int = 16,
    baselines: Optional[Sequence[Array]] = None,
    step_batch: Optional[int] = None,
) -> Array:
    """SIGNED per-pixel integrated-gradients attribution, averaged over
    ``baselines`` — f32[H, W].

    Differs from :func:`gradient.integrated_gradients` (which returns a
    magnitude map) in two paper-mandated ways: the channel-sum keeps its
    SIGN (XRAI ranks regions by signed gain, so negative-evidence
    regions sort last), and the attribution is the MEAN over a baseline
    set (default: black + white in the image's own value range, the
    paper's pair). All |baselines|·steps backwards run as one vmapped
    device program; ``step_batch`` bounds live activations via the exact
    scan accumulation of :func:`gradient._grad_mean` (per baseline),
    for N-image batched sweeps.
    """
    from .gradient import _grad_mean

    image = jnp.asarray(image, jnp.float32)
    if baselines is None:
        lo = jnp.full_like(image, jnp.min(image))
        hi = jnp.full_like(image, jnp.max(image))
        baselines = (lo, hi)
    base = jnp.stack([jnp.broadcast_to(jnp.asarray(b, jnp.float32),
                                       image.shape) for b in baselines])
    alphas = (jnp.arange(steps, dtype=jnp.float32) + 0.5) / steps
    grad_one = jax.grad(_target_logit_fn(logits_fn, variables, target))
    if step_batch is None:
        # [B, S, H, W, C] straight paths, one flat batched backward.
        path = base[:, None] + alphas[None, :, None, None, None] * (
            image[None, None] - base[:, None])
        flat = path.reshape(-1, *image.shape)
        grads = jax.vmap(grad_one)(flat).reshape(base.shape[0], steps,
                                                 *image.shape)
        avg = jnp.mean(grads, axis=1)  # [B, H, W, C]
    else:
        # Per-baseline scan accumulation (gradients combine linearly, so
        # this is exact) — live memory bounded at step_batch backwards.
        avg = jnp.stack([
            _grad_mean(grad_one,
                       base[b][None] + alphas[:, None, None, None]
                       * (image - base[b])[None],
                       step_batch)
            for b in range(base.shape[0])
        ])
    ig = (image[None] - base) * avg  # [B, H, W, C]
    return jnp.sum(jnp.mean(ig, axis=0), axis=-1)


def xrai_attribution_batch(
    logits_fn: Callable,
    variables: Any,
    images,
    targets,
    steps: int = 16,
    step_batch: Optional[int] = None,
    mesh=None,
    data_axis: str = "data",
) -> Array:
    """N images' signed XRAI attributions in ONE device program →
    f32[N, H, W] (default black/white per-image baselines). Shares the
    image-batch scaffolding of ``gradient.attribute_batch`` (pow-2
    buckets, optional mesh shard_map); pair with ``step_batch`` — an
    unchunked N×2×S batched IG holds N·2·S backwards' activations live.
    The greedy region ranking stays per-image host work
    (:func:`greedy_region_ranking`)."""
    from .gradient import _image_batch_scaffold, _jit_image_batched

    images, targets, seeds, n, bucket = _image_batch_scaffold(
        images, targets, None, mesh, data_axis)
    if n == 0:
        return jnp.zeros((0,) + images.shape[1:3], jnp.float32)
    key = ("xrai", logits_fn, int(steps), step_batch, bucket,
           images.shape[1:], mesh, data_axis)
    if key not in _XRAI_BATCH_CACHE:
        def one(v, img, t, s):
            return xrai_attribution(logits_fn, v, img, t, steps=steps,
                                    step_batch=step_batch)

        _XRAI_BATCH_CACHE[key] = _jit_image_batched(one, mesh, data_axis)
    return _XRAI_BATCH_CACHE[key](variables, images, targets, seeds)[:n]


# (steps, step_batch, bucket, shape, mesh) → jitted vmapped signed-IG core.
_XRAI_BATCH_CACHE: dict = {}


def greedy_region_ranking(
    attr: np.ndarray,
    segment_maps: Sequence[np.ndarray],
    min_area: int = 4,
    backend: str = "auto",
) -> tuple[np.ndarray, int]:
    """Greedy XRAI core: rank regions by attribution density.

    ``attr``: f32[H, W] signed attribution. ``segment_maps``: one int
    label map per oversegmentation scale (disjoint WITHIN a map, freely
    overlapping across maps). Repeatedly selects the segment with the
    highest gain density ``sum(attr over its uncovered pixels) /
    uncovered-area``, claims those pixels, and updates every scale's
    per-segment numerator/denominator over just the newly claimed
    pixels — each pixel is claimed once, so the whole loop costs
    O(scales·H·W) plus an O(S) argmax per step.

    ``backend``: ``"auto"`` uses the C++ kernel when the toolchain is
    available (``native/felzenszwalb.cc xrai_greedy_rank`` — a one-time
    CSR of per-segment pixel lists replaces the numpy path's per-claim
    full-image rescans; BIT-EXACT: it replicates the numpy float64
    accumulation order, argmax tie rule, and min_area filtering, pinned
    by ``test_xrai.py``), falling back to ``"numpy"``; ``"native"``
    requires the kernel.

    Returns ``(heat, num_regions)``: ``heat`` is f32[H, W] holding each
    pixel's selection rank mapped to (0, 1], strictly decreasing in
    claim order (earlier/denser regions higher). Rank values — rather
    than the paper-figure gain values — keep the map strictly monotone
    in the greedy order, which is what downstream argsort consumers
    (deletion/insertion AUC, top-k% masks) actually use. Segments whose
    uncovered remainder falls below ``min_area`` are skipped (the
    reference implementation's area floor), and pixels never claimed
    (only possible via that floor) stay at 0.
    """
    if backend not in ("auto", "native", "numpy"):
        raise ValueError(f"backend must be auto|native|numpy, "
                         f"got {backend!r}")
    attr = np.asarray(attr, np.float64)
    h, w = attr.shape
    flat_attr = attr.reshape(-1)
    ids = []
    counts = []
    for sm in segment_maps:
        sm = np.asarray(sm).reshape(-1)
        if sm.shape != flat_attr.shape:
            raise ValueError(
                f"segment map shape {sm.shape} != attribution {attr.shape}")
        sm = sm - sm.min()
        ids.append(sm.astype(np.int64))
        counts.append(int(sm.max()) + 1)
    if not ids:
        raise ValueError("need at least one segment map")

    if backend != "numpy":
        from network_interpretation_imagenet_tpu.segment.felzenszwalb import (
            _load_native,
        )

        lib = _load_native()
        if lib is not None:
            import ctypes

            flat = np.ascontiguousarray(flat_attr)
            stacked = np.ascontiguousarray(
                np.stack(ids).astype(np.int32))
            out = np.empty(h * w, np.float32)
            n = lib.xrai_greedy_rank(
                flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                stacked.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.c_int32(len(ids)), ctypes.c_int32(h * w),
                ctypes.c_int32(int(min_area)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if n < 0:
                raise RuntimeError("xrai_greedy_rank failed")
            return out.reshape(h, w), int(n)
        if backend == "native":
            raise RuntimeError(
                "backend='native' but the C++ kernel is unavailable "
                "(g++/make missing?)")

    offsets = np.cumsum([0] + counts[:-1])
    s_total = int(np.sum(counts))
    num = np.zeros(s_total, np.float64)
    den = np.zeros(s_total, np.float64)
    for m, (sm, c) in enumerate(zip(ids, counts)):
        num[offsets[m]:offsets[m] + c] = np.bincount(
            sm, weights=flat_attr, minlength=c)
        den[offsets[m]:offsets[m] + c] = np.bincount(sm, minlength=c)

    covered = np.zeros(h * w, bool)
    heat = np.zeros(h * w, np.float64)
    alive = den >= min_area
    rank = 0
    while alive.any():
        gains = np.where(alive, num / np.maximum(den, 1.0), -np.inf)
        best = int(np.argmax(gains))
        m = int(np.searchsorted(offsets, best, side="right")) - 1
        new = (ids[m] == best - offsets[m]) & ~covered
        alive[best] = False
        if not new.any():
            continue
        covered |= new
        rank += 1
        heat[new] = rank
        # Remove the claimed pixels from every scale's tallies.
        idx = np.nonzero(new)[0]
        for mm, (sm, c) in enumerate(zip(ids, counts)):
            seg = sm[idx]
            num[offsets[mm]:offsets[mm] + c] -= np.bincount(
                seg, weights=flat_attr[idx], minlength=c)
            den[offsets[mm]:offsets[mm] + c] -= np.bincount(
                seg, minlength=c)
        alive &= den >= min_area
    # Rank r (1 = densest) → (num_regions - r + 1) / num_regions ∈ (0, 1].
    out = np.where(heat > 0, (rank - heat + 1) / max(rank, 1), 0.0)
    return out.reshape(h, w).astype(np.float32), rank


@dataclass(frozen=True)
class XraiResult:
    heatmap: np.ndarray      # f32[H, W], rank-valued, higher = denser
    attribution: np.ndarray  # f32[H, W], signed IG (mean over baselines)
    num_regions: int


def xrai_saliency(
    logits_fn: Callable,
    variables: Any,
    image: Array,
    target: int,
    display: np.ndarray,
    steps: int = 16,
    scales: Optional[Sequence[float]] = None,
    baselines: Optional[Sequence[Array]] = None,
    min_area: int = 4,
    segment_backend: str = "auto",
) -> XraiResult:
    """End-to-end XRAI: multi-baseline IG on device, multi-scale
    felzenszwalb oversegmentation of the DISPLAY image (denormalized
    uint8, same convention as the masking pipelines), greedy density
    ranking. ``min_size`` tracks each scale so coarse levels stay coarse
    (the :func:`felzenszwalb_ladder` default); the ladder shares one edge
    build+sort across scales — bit-exact with per-scale calls, ~3× less
    host time. ``scales=None`` → :func:`adaptive_scales` for the display
    resolution (DEFAULT_SCALES at 224², area-scaled elsewhere)."""
    attr = np.asarray(
        xrai_attribution(logits_fn, variables, image, target,
                         steps=steps, baselines=baselines))
    if scales is None:
        scales = adaptive_scales(display.shape[0], display.shape[1])
    seg_maps = felzenszwalb_ladder(display, scales, sigma=0.5,
                                   backend=segment_backend)
    heat, n = greedy_region_ranking(attr, seg_maps, min_area=min_area)
    return XraiResult(heatmap=heat, attribution=attr, num_regions=n)
