"""BO-driven saliency — the reference's flagship path, fully on device.

Reproduces ``bayesian_active_learning_imagenet.main``
(``bayesian_active_learning_imagenet.py:379-498``): segment the image, bound
the search space to ``[0, 0.6·S]``, run GP-EI BO over window start indices
(3 pre-samples + 10 iterations), aggregate the evaluated masks' survive
labels into the summed heatmap, then bbox + IOU.

Where the reference walks the entire val dataset and re-segments the image
for EVERY BO sample (``:126-150``), here the image and segments are device-
resident and the whole active-learning loop is one jit
(:func:`bo.loop.fused_window_bo`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import weakref

from network_interpretation_imagenet_tpu.bo.loop import (
    BOResult,
    bayesian_optimize,
    make_fused_window_bo,
    next_pow2,
)
from network_interpretation_imagenet_tpu.config import BOConfig
from network_interpretation_imagenet_tpu.ops import aggregate
from network_interpretation_imagenet_tpu.saliency.engine import SaliencyEngine
from network_interpretation_imagenet_tpu.saliency.pipeline import SaliencyOutput


# Fused-BO runners, cached per engine instance then per static config.
# max_candidates is bucketed to powers of two (next_pow2), so a sweep over
# images with varying segment counts compiles O(log S) times, not O(images)
# — the fused loop costs ~minutes per compile (docs/PERFORMANCE.md).
_FUSED_RUNNERS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def fused_runner(
    engine: SaliencyEngine, max_candidates: int, cfg: BOConfig, q: int,
    mesh=None, data_axis: str = "data", batch_images: bool = False,
):
    """Compile-once fused-BO runner for this engine + static config."""
    per_engine = _FUSED_RUNNERS.setdefault(engine, {})
    key = (
        max_candidates, cfg.n_pre_samples, cfg.n_iters, cfg.alpha,
        cfg.epsilon, tuple(cfg.lengthscale_grid), q, mesh, data_axis,
        batch_images,
    )
    if key not in per_engine:
        bundle, dtype = engine.bundle, engine.compute_dtype

        def apply_fn(variables, imgs):
            return bundle.logits(variables, imgs.astype(dtype))

        per_engine[key] = make_fused_window_bo(
            apply_fn,
            max_candidates,
            n_pre_samples=cfg.n_pre_samples,
            n_iters=cfg.n_iters,
            alpha=cfg.alpha,
            epsilon=cfg.epsilon,
            lengthscale_grid=cfg.lengthscale_grid,
            proposals_per_iter=q,
            mesh=mesh,
            data_axis=data_axis,
            batch_images=batch_images,
        )
    return per_engine[key]


def _assemble_output(segments, num_segments, width, target, bo_res):
    """Heatmap + SaliencyOutput from one image's BO trace (host twins only).

    Aggregation mirrors the reference's plot_summed_heatmap reading all
    BO-written mask PNGs (``bayesian_active_learning_imagenet.py:312-344``).
    """
    from network_interpretation_imagenet_tpu.saliency.engine import MaskEvalResult

    heat = aggregate.summed_superpixel_labels_np(
        segments, bo_res.xp.astype(np.int32), width, bo_res.survived
    )
    return SaliencyOutput(
        segments=segments,
        num_segments=num_segments,
        eval=MaskEvalResult(
            survived=bo_res.survived,
            preds=np.where(bo_res.survived, target, -1),
            prob_target=bo_res.yp.astype(np.float32),
            prob_max=np.full_like(bo_res.yp, np.nan, dtype=np.float32),
        ),
        heatmap=heat,
        firsts=bo_res.xp.astype(np.int32),
        width=width,
    )


def bo_window_saliency(
    engine: SaliencyEngine,
    image,
    segments: np.ndarray,
    cfg: BOConfig = BOConfig(),
    window_fraction: float = 0.4,
    seed: int = 0,
    target: Optional[int] = None,
    fused: bool = True,
    proposals_per_iter: int = 1,
    mesh=None,
) -> Tuple[SaliencyOutput, BOResult]:
    """Run BO saliency for one image; returns the aggregate output + BO trace.

    ``fused=True`` runs the one-jit on-device loop; ``fused=False`` uses the
    host-driven loop (same math, easier to introspect). With ``mesh``
    (fused only), the per-iteration proposal batch shards over the mesh's
    data axis — pair with ``proposals_per_iter >= n_devices``.
    """
    segments = np.asarray(segments, np.int32)
    s = int(segments.max()) + 1
    width = int(window_fraction * s)
    upper = int(0.6 * s)  # reference firstIndex_upperbound (:467)
    if target is None:
        target, _ = engine.predict_one(image)

    if fused:
        run = fused_runner(
            engine, next_pow2(upper + 1), cfg, proposals_per_iter, mesh=mesh
        )
        xs, ys, survived, count = run(
            engine.variables,
            jnp.asarray(image),
            jnp.asarray(segments),
            jnp.int32(width),
            jnp.int32(target),
            jnp.int32(upper),
            jax.random.PRNGKey(seed),
        )
        n = int(count)
        bo_res = BOResult(
            xp=np.asarray(xs)[:n].astype(int),
            yp=np.asarray(ys)[:n],
            survived=np.asarray(survived)[:n],
        )
    else:

        def objective(indices: np.ndarray):
            res = engine.eval_window_masks(image, segments, indices, width, target)
            return res.prob_target, res.survived

        bo_res = bayesian_optimize(
            objective,
            upper=upper,
            n_pre_samples=cfg.n_pre_samples,
            n_iters=cfg.n_iters,
            seed=seed,
            alpha=cfg.alpha,
            epsilon=cfg.epsilon,
            lengthscale_grid=cfg.lengthscale_grid,
        )

    return _assemble_output(segments, s, width, target, bo_res), bo_res


def _multi_geometry(segments_list, window_fraction: float):
    """Per-image window geometry shared by the live and serving multi-BO
    paths: segment maps as int32, segment counts, window widths, and EI
    candidate uppers (the reference's 0.6·S formula). ONE definition so
    the AOT artifact cannot drift from ``bo_window_saliency_multi``."""
    segs = [np.asarray(s, np.int32) for s in segments_list]
    ss = [int(s.max()) + 1 for s in segs]
    widths = np.asarray([int(window_fraction * s) for s in ss], np.int32)
    uppers = np.asarray([int(0.6 * s) for s in ss], np.int32)
    return segs, ss, widths, uppers


def _pad_multi_operands(n: int, n_pad: int, images, segs, widths, uppers,
                        targets=None):
    """Pad the multi-BO image axis to ``n_pad`` by repeating entry 0
    (device image batches pad without a fetch). ``targets=None`` passes
    through so a caller can infer them on the PADDED batch (the serving
    path's exported predict head has the padded shape)."""
    segs_arr = np.stack(segs)
    if targets is not None:
        targets = np.asarray(targets, np.int32)
    if n_pad > n:
        reps = n_pad - n
        xp = jnp if isinstance(images, jax.Array) else np
        images = xp.concatenate([images, xp.repeat(images[:1], reps, axis=0)])
        pad = lambda a: np.concatenate([a, np.repeat(a[:1], reps, axis=0)])
        widths, uppers, segs_arr = pad(widths), pad(uppers), pad(segs_arr)
        if targets is not None:
            targets = pad(targets)
    return images, segs_arr, widths, uppers, targets


def _segs_to_device(segs_arr: np.ndarray):
    """u8 segment wire (upload half): contiguous label maps are tiny ints,
    so when they fit in uint8 they ship at 1/4 the int32 bytes and widen
    back to int32 ON DEVICE — the program operand is identical. Pays off
    through a tunnel (a 16×224² int32 upload is ~80 ms at ~40 MB/s)."""
    if (segs_arr.dtype == np.int32 and segs_arr.size
            and segs_arr.min() >= 0 and segs_arr.max() < 256):
        return jnp.asarray(segs_arr.astype(np.uint8)).astype(jnp.int32)
    return jnp.asarray(segs_arr)


def _multi_keys(n: int, n_pad: int, seed: int, per_image_seeds):
    """Per-image PRNG keys, derived from the ORIGINAL image count so
    results are invariant to padding (and to whether a mesh widened the
    pad). With ``per_image_seeds`` image j's key is ``PRNGKey(seeds[j])``
    — bit-identical to independent single-image calls."""
    if per_image_seeds is not None:
        if len(per_image_seeds) != n:
            raise ValueError(
                f"per_image_seeds length {len(per_image_seeds)} != "
                f"image count {n}")
        keys = jnp.stack(
            [jax.random.PRNGKey(int(s)) for s in per_image_seeds]
        )
    else:
        keys = jax.random.split(jax.random.PRNGKey(seed), n)
    if n_pad > n:
        keys = jnp.concatenate(
            [keys, jnp.repeat(keys[:1], n_pad - n, axis=0)]
        )
    return keys


def _collect_multi_outputs(xs_d, ys_d, survived_d, counts_d, segs, ss,
                           widths, targets, n: int) -> list:
    """ONE batched device→host fetch (four separate np.asarray calls would
    each pay a round trip), trimmed to the true observation counts and
    assembled into N (SaliencyOutput, BOResult) pairs."""
    xs, ys, survived, counts = jax.device_get(
        (xs_d, ys_d, survived_d, counts_d)
    )
    outs = []
    for i in range(n):
        c = int(counts[i])
        bo_res = BOResult(
            xp=np.asarray(xs[i, :c]).astype(int),
            yp=np.asarray(ys[i, :c]),
            survived=np.asarray(survived[i, :c]),
        )
        out = _assemble_output(
            segs[i], ss[i], int(widths[i]), int(targets[i]), bo_res
        )
        outs.append((out, bo_res))
    return outs


def bo_window_saliency_multi_async(
    engine: SaliencyEngine,
    images,
    segments_list,
    cfg: BOConfig = BOConfig(),
    window_fraction: float = 0.4,
    seed: int = 0,
    targets=None,
    mesh=None,
    data_axis: str = "data",
    proposals_per_iter: int = 1,
    per_image_seeds=None,
):
    """Dispatch :func:`bo_window_saliency_multi`'s fused program and return
    a ``collect()`` closure that blocks on the results.

    JAX dispatch is asynchronous — the N vmapped active-learning loops run
    on device between the dispatch and the ``collect()`` call, so a sweep
    can finalize flush i-1 (heatmaps, IOU, rows — host work) and decode
    flush i+1 while flush i's BO program churns (the same depth-2 pipeline
    the window sweep uses).

    TPU-first extension of the reference's one-image flagship path
    (``bayesian_active_learning_imagenet.py:379-498``): the whole
    active-learning loop vmaps over the image axis, so every BO iteration's
    classifier forward batches N·q masked images on the MXU instead of q.
    With ``mesh``, the image axis additionally shards over the mesh's data
    axis (each chip runs its slice of loops — no collectives).

    ``collect()`` returns a list of N (SaliencyOutput, BOResult) pairs. With
    ``per_image_seeds`` (int[N]), image j's key is ``PRNGKey(seeds[j])`` —
    bit-identical to N independent :func:`bo_window_saliency` calls with
    those seeds, and invariant to how a sweep batches images into flushes
    (derive the seeds from dataset indices). Without it, keys derive from
    ``jax.random.split(PRNGKey(seed), N)`` (position-dependent).
    """
    segs, ss, widths, uppers = _multi_geometry(segments_list,
                                                window_fraction)
    n = len(segs)
    if isinstance(images, jax.Array):
        # Already-stacked device batch (sweeps upload a flush ONCE and reuse
        # it for SLIC display, predict, and this program — a second 16-image
        # f32 upload costs ~240 ms through a tunnel). Stays on device.
        images = images.astype(jnp.float32)
        assert images.shape[0] == n, (images.shape, n)
    else:
        images = np.asarray(np.stack(images), np.float32)
    if targets is None:
        targets = np.asarray(engine.predict(images).argmax(axis=1), np.int32)
    else:
        targets = np.asarray(targets, np.int32)

    # Pad the image axis to a power of two: one compiled program per
    # (bucket, config). With a mesh, pad further to a multiple of the data
    # axis (lcm handles non-pow-2 device counts, e.g. a 6-device axis).
    n_pad = 1 << max(n - 1, 0).bit_length()
    if mesh is not None:
        import math

        n_pad = math.lcm(n_pad, int(mesh.shape[data_axis]))
    images, segs_arr, widths, uppers, targets = _pad_multi_operands(
        n, n_pad, images, segs, widths, uppers, targets)

    run = fused_runner(
        engine, next_pow2(int(uppers.max()) + 1), cfg, proposals_per_iter,
        mesh=mesh, data_axis=data_axis, batch_images=True,
    )
    keys = _multi_keys(n, n_pad, seed, per_image_seeds)
    xs_d, ys_d, survived_d, counts_d = run(
        engine.variables, jnp.asarray(images), _segs_to_device(segs_arr),
        jnp.asarray(widths), jnp.asarray(targets), jnp.asarray(uppers), keys,
    )

    def collect():
        return _collect_multi_outputs(
            xs_d, ys_d, survived_d, counts_d, segs, ss, widths, targets, n)

    return collect


def bo_window_saliency_multi(
    engine: SaliencyEngine,
    images,
    segments_list,
    cfg: BOConfig = BOConfig(),
    window_fraction: float = 0.4,
    seed: int = 0,
    targets=None,
    mesh=None,
    data_axis: str = "data",
    proposals_per_iter: int = 1,
    per_image_seeds=None,
):
    """Fused BO saliency over N same-shape images in ONE program —
    dispatch + immediate collect (see :func:`bo_window_saliency_multi_async`
    for the semantics and the pipelined variant). Returns a list of N
    (SaliencyOutput, BOResult) pairs."""
    return bo_window_saliency_multi_async(
        engine, images, segments_list, cfg,
        window_fraction=window_fraction, seed=seed, targets=targets,
        mesh=mesh, data_axis=data_axis,
        proposals_per_iter=proposals_per_iter,
        per_image_seeds=per_image_seeds,
    )()
