"""Val-set saliency sweep — many images, data-parallel over the mesh.

BASELINE.json config 5: "ImageNet DenseNet full val-set saliency sweep,
data-parallel over v5e pod". The per-image work (segment → masked forwards →
heatmap → IOU) runs through the batched engine; the *image axis* parallelizes
two ways:

  * single-host: images stream through one engine whose mask batches already
    saturate the chip, in a one-deep pipeline — image i's masked forwards are
    *dispatched* (JAX async) and their outcomes fetched only after image
    i+1's host-side segmentation finishes, so the chip and the host CPU
    overlap instead of alternating;
  * multi-device: the mask batch of each image shards over the mesh's data
    axis (`parallel.sharded_engine`), and metric reductions ride ``psum``.

The reference aborts the whole run on the first misclassified image
(``bayesian_active_learning_imagenet.py:221``); the sweep skips and records
them (SURVEY §5 failure-handling plan).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.config import SegmentConfig
from network_interpretation_imagenet_tpu.saliency.engine import SaliencyEngine
from network_interpretation_imagenet_tpu.saliency.pipeline import (
    localization_score,
)
from network_interpretation_imagenet_tpu.segment import (
    segment_image,
    segment_image_batch,
)
from network_interpretation_imagenet_tpu.utils.logging import PhaseLogger
from network_interpretation_imagenet_tpu.utils.meters import AverageMeter


@dataclasses.dataclass
class SweepResult:
    images_total: int = 0
    images_explained: int = 0
    images_skipped_misclassified: int = 0
    images_failed: int = 0
    mean_iou: float = 0.0
    mean_survival: float = 0.0
    # Per-image "seconds" rows (and this pooled p50) measure the
    # enqueue→finalize SPAN through the async pipeline — they include
    # overlap with other images' host work, so they are an upper bound on
    # isolated per-image latency (bench.py's one_image measures that);
    # throughput (`evals_per_sec`) is the sweep's primary metric.
    p50_latency_s: float = 0.0
    evals_per_sec: float = 0.0
    # Populated (from per-image rows) when the sweep runs with
    # fidelity_steps > 0: faithfulness at dataset scale. Good saliency →
    # LOW deletion AUC, HIGH insertion AUC, high pointing-game accuracy.
    mean_deletion_auc: float = 0.0
    mean_insertion_auc: float = 0.0
    pointing_game_acc: float = 0.0
    per_image: list = dataclasses.field(default_factory=list)
    # index → f32[H, W] summed-label heatmap; populated only when the sweep
    # runs with keep_heatmaps=True (e.g. for a batched GP-surrogate pass).
    heatmaps: dict = dataclasses.field(default_factory=dict)


def _fidelity_row_fields(engine, image, heat, target: int, gt_bbox,
                         steps: int) -> dict:
    """Per-image faithfulness fields (one batched forward for both curves,
    host pointing-game check when a gt box exists)."""
    from network_interpretation_imagenet_tpu.saliency import eval_metrics

    d = eval_metrics.deletion_insertion_auc(
        engine, image, heat, int(target), steps=steps
    )
    fields = {"deletion_auc": round(d["deletion_auc"], 6),
              "insertion_auc": round(d["insertion_auc"], 6)}
    if gt_bbox is not None:
        fields["pointing"] = bool(eval_metrics.pointing_game(heat, gt_bbox))
    return fields


def _finalize_fidelity_means(res: "SweepResult") -> None:
    """Aggregate fidelity means from per-image rows (rows are the source of
    truth so journal-restored and multihost-merged results aggregate the
    same way)."""
    dels = [r["deletion_auc"] for r in res.per_image if "deletion_auc" in r]
    inss = [r["insertion_auc"] for r in res.per_image if "insertion_auc" in r]
    pts = [r["pointing"] for r in res.per_image if "pointing" in r]
    res.mean_deletion_auc = float(np.mean(dels)) if dels else 0.0
    res.mean_insertion_auc = float(np.mean(inss)) if inss else 0.0
    res.pointing_game_acc = float(np.mean(pts)) if pts else 0.0


def _unpack_item(item):
    """(image, label?, gt_bbox?) from a 2- or 3-element dataset item.

    Accepts any sequence type (tuple/list), so a malformed item fails inside
    the caller's per-image try block instead of aborting the whole sweep."""
    seq = tuple(item)
    if len(seq) == 2:
        return seq[0], seq[1], None
    return seq[0], seq[1], seq[2]


def _sharded_window_saliency(
    engine: SaliencyEngine, mesh, image, segments, num_samples: int,
    window_fraction: float, seed: int, target: int, firsts=None,
):
    """Mask-parallel variant of random_window_saliency over a device mesh."""
    from network_interpretation_imagenet_tpu.ops import aggregate, masking
    from network_interpretation_imagenet_tpu.parallel import sharded_window_eval
    from network_interpretation_imagenet_tpu.saliency.engine import MaskEvalResult
    from network_interpretation_imagenet_tpu.saliency.pipeline import SaliencyOutput

    segments = np.asarray(segments, np.int32)
    s = int(segments.max()) + 1
    width = int(window_fraction * s)
    if firsts is None:
        firsts = masking.sample_window_starts_host(seed, num_samples, s, width)
    firsts = np.asarray(firsts, np.int32)
    survived, probs, _ = sharded_window_eval(
        mesh, engine.bundle.logits, engine.variables, image, segments,
        firsts, width, target, compute_dtype=engine.compute_dtype,
    )
    # Host twin: exact for any S (the device path is s_cap-bounded) and
    # keeps aggregation off the device queue.
    heat = aggregate.summed_superpixel_labels_np(
        segments, firsts, width, np.asarray(survived)
    )
    return SaliencyOutput(
        segments=segments, num_segments=s,
        eval=MaskEvalResult(
            survived=survived,
            preds=np.where(survived, target, -1),
            prob_target=probs,
            prob_max=np.full_like(probs, np.nan),
        ),
        heatmap=heat, firsts=firsts, width=width,
    )


def _sharded_knockout_saliency(
    engine: SaliencyEngine, mesh, image, segments, knock_ids, target: int,
):
    """Knockout twin of :func:`_sharded_window_saliency` (reference
    MNIST/CIFAR 1000-mask semantics over the mesh)."""
    from network_interpretation_imagenet_tpu.ops import aggregate
    from network_interpretation_imagenet_tpu.parallel import sharded_knockout_eval
    from network_interpretation_imagenet_tpu.saliency.engine import MaskEvalResult
    from network_interpretation_imagenet_tpu.saliency.pipeline import SaliencyOutput

    segments = np.asarray(segments, np.int32)
    s = int(segments.max()) + 1
    knock_ids = np.asarray(knock_ids, np.int32)
    survived, probs, _ = sharded_knockout_eval(
        mesh, engine.bundle.logits, engine.variables, image, segments,
        knock_ids, target, compute_dtype=engine.compute_dtype,
    )
    heat = aggregate.summed_knockout_labels_np(
        segments, knock_ids, np.asarray(survived)
    )
    return SaliencyOutput(
        segments=segments, num_segments=s,
        eval=MaskEvalResult(
            survived=survived,
            preds=np.where(survived, target, -1),
            prob_target=probs,
            prob_max=np.full_like(probs, np.nan),
        ),
        heatmap=heat, knock_ids=knock_ids,
    )


def saliency_sweep(
    engine: SaliencyEngine,
    dataset: Iterable,
    seg_cfg: SegmentConfig,
    num_mask_samples: int = 100,
    window_fraction: float = 0.4,
    bbox_threshold: int = 180,
    max_images: Optional[int] = None,
    seed: int = 0,
    logger: Optional[PhaseLogger] = None,
    mesh=None,
    image_batch: int = 1,
    keep_heatmaps: bool = False,
    dataset_indices=None,
    mode: str = "window",
    num_knockout: int = 1,
    journal=None,
    fidelity_steps: int = 0,
) -> SweepResult:
    """Sweep (image, label, gt_bbox?) triples; returns aggregate metrics.

    ``mode="knockout"`` swaps the per-image mask family for the reference's
    MNIST/CIFAR semantics — each of the K masks zeros ``num_knockout``
    random segments (``generate_gp_training_data_mnist.py:218-223``, M=1;
    ``generate_gp_training_data_cifar.py:307-342``, M=5) — through the SAME
    machinery: async pipelined dispatch, multi-image flat N·K grids, and
    mesh sharding.

    ``dataset`` yields ``(normalized f32 HWC image, int label, gt_bbox|None)``.
    With ``mesh`` (>1 device), each image's mask batch shards over the data
    axis via `parallel.sharded_engine` and survival counts psum across chips.
    With ``image_batch`` > 1 (same-shape images), up to that many images'
    mask banks evaluate in ONE forward (``eval_window_masks_multi``) so small
    per-image K still fills the chip. Both together compose: the flat N·K
    grid shards over the mesh (``sharded_window_eval_multi``).

    ``dataset_indices`` maps enumerate position → GLOBAL dataset index
    (per-image seeds, result rows). A multi-host run passes its
    ``process_strided_indices`` stride here so every process derives the
    SAME per-image PRNG streams a single-process sweep would, and merged
    rows keep their dataset identity.

    ``journal`` (a :class:`saliency.journal.SweepJournal`) appends each
    image's terminal outcome as it finalizes and, when constructed with
    ``resume=True``, restores finished images into the result and skips
    them — crash-safe resume for hours-long sweeps (the reference loses
    everything on interruption). Per-image seeds derive from dataset
    indices, so a resumed sweep's remaining images produce byte-identical
    results to an uninterrupted run. ``evals_per_sec`` counts only THIS
    run's new work.

    ``fidelity_steps`` > 0 additionally scores every explained image's
    heatmap for faithfulness at collect time — deletion/insertion AUC (one
    batched forward per image, 2·(steps+1) variants) and, where a gt box
    exists, the pointing game — rolling up into ``mean_deletion_auc`` /
    ``mean_insertion_auc`` / ``pointing_game_acc``.
    """
    import collections

    from network_interpretation_imagenet_tpu.ops import aggregate, masking

    if mode not in ("window", "knockout"):
        raise ValueError(f"unknown sweep mode {mode!r}")
    is_knockout = mode == "knockout"

    def sample_plan(seed_i: int, s: int) -> dict:
        """Per-image mask parameters, sampled on the HOST (both families)
        so dispatch never blocks on a device round-trip."""
        if is_knockout:
            return {"ids": masking.sample_knockout_ids_host(
                seed_i, num_mask_samples, num_knockout, s)}
        width = int(window_fraction * s)
        return {"firsts": masking.sample_window_starts_host(
            seed_i, num_mask_samples, s, width), "width": width}

    def aggregate_plan(seg, plan: dict, survived) -> np.ndarray:
        if is_knockout:
            return aggregate.summed_knockout_labels_np(
                seg, plan["ids"], survived)
        return aggregate.summed_superpixel_labels_np(
            seg, plan["firsts"], plan["width"], survived)

    log = logger or PhaseLogger(enabled=False)
    res = SweepResult()
    iou_m, surv_m = AverageMeter(), AverageMeter()
    latencies = []
    done = ()
    if journal is not None:
        from network_interpretation_imagenet_tpu.saliency.journal import (
            JournalingLogger,
        )

        journal.restore_into(res, iou_m, surv_m, latencies, keep_heatmaps)
        done = journal.done
        log = JournalingLogger(log, journal)
    total_evals = 0
    t_start = time.perf_counter()

    def finish_image(i, target, seg, s, heat, survived, t0, image=None):
        nonlocal total_evals
        total_evals += num_mask_samples
        row = {
            "index": i,
            "target": target,
            "num_segments": s,
            "survival": float(np.mean(survived)),
        }
        surv_m.update(row["survival"])
        gt_bbox = gt_by_index.get(i)
        if gt_bbox is not None:
            iou, _ = localization_score(heat, gt_bbox, bbox_threshold)
            row["iou"] = float(iou)
            iou_m.update(float(iou))
        if fidelity_steps > 0 and image is not None:
            row.update(_fidelity_row_fields(
                engine, image, heat, target, gt_bbox, fidelity_steps
            ))
        res.images_explained += 1
        if keep_heatmaps:
            res.heatmaps[i] = np.asarray(heat)
        if journal is not None and keep_heatmaps:
            journal.save_heatmap(i, heat)  # before the row marks it done
        latencies.append(time.perf_counter() - t0)
        row["seconds"] = round(latencies[-1], 4)
        res.per_image.append(row)
        log.emit({"event": "image_done", **row})

    gt_by_index = {}
    pending = []  # batched path: (i, image, display, label, t0)
    inflight = collections.deque()  # streaming path: dispatched, unfetched
    inflight_batch = None  # batched path: one dispatched, unfetched flush

    def collect_one():
        """Fetch the oldest in-flight image's outcomes and finalize it.
        The skip-misclassified decision is deferred to here — the dispatch
        path never blocks on the prediction fetch, so the device queue
        never drains (a misclassified image wastes one mask batch; the
        reference aborts the whole run instead,
        ``bayesian_active_learning_imagenet.py:221``)."""
        if not inflight:
            return
        fl = inflight.popleft()
        try:
            r = engine.collect(fl["handle"])
            pred = int(np.asarray(fl["logits"])[0].argmax())
            label = fl["label"]
            if label is not None and pred != int(label):
                res.images_skipped_misclassified += 1
                log.emit({"event": "skip_misclassified", "index": fl["i"],
                          "pred": pred, "label": int(label)})
                return
            heat = aggregate_plan(fl["seg"], fl["plan"], r.survived)
            finish_image(fl["i"], pred, fl["seg"], fl["s"], heat,
                         r.survived, fl["t0"], image=fl["image"])
        except Exception as e:
            res.images_failed += 1
            log.emit({"event": "image_failed", "index": fl["i"],
                      "error": repr(e)})

    def collect_batch():
        """Finalize the in-flight flush: fetch outcomes, decide per-image
        skip from the batched prediction (deferred, like the streaming
        path), aggregate heatmaps on host. A failure marks only that
        flush's images failed; the sweep goes on."""
        nonlocal inflight_batch
        if inflight_batch is None:
            return
        fb, inflight_batch = inflight_batch, None
        try:
            preds = np.asarray(fb["logits"]).argmax(axis=1)
            if fb["handle"] is not None:
                results = engine.collect_multi(fb["handle"], fb["n"], fb["k"])
                survived_per_image = [r.survived for r in results]
            else:
                survived_per_image = fb["survived_per_image"]
        except Exception as e:
            # Whole-flush failure (nothing finalized yet): all images failed.
            res.images_failed += len(fb["metas"])
            log.emit({"event": "batch_failed",
                      "indices": [m[0] for m in fb["metas"]],
                      "error": repr(e)})
            return
        for j, meta in enumerate(fb["metas"]):
            i, seg, s, plan, label, t0, img = meta
            try:
                pred = int(preds[j])
                if label is not None and pred != int(label):
                    res.images_skipped_misclassified += 1
                    log.emit({"event": "skip_misclassified", "index": i,
                              "pred": pred, "label": int(label)})
                    continue
                surv = survived_per_image[j]
                heat = aggregate_plan(seg, plan, surv)
                finish_image(i, pred, seg, s, heat, surv, t0, image=img)
            except Exception as e:  # per-image: never double-count the rest
                res.images_failed += 1
                log.emit({"event": "image_failed", "index": i,
                          "error": repr(e)})

    def flush_pending():
        """Dispatch the pending image batch (one batched predict + one
        flat-grid mask eval, targets left as device scalars) and collect the
        PREVIOUS flush while this one runs — the batched path's equivalent
        of the streaming pipeline."""
        nonlocal inflight_batch
        if not pending:
            collect_batch()
            return
        batch = list(pending)
        pending.clear()
        try:
            import jax

            idxs, imgs, disps, labels, t0s = zip(*batch)
            # ONE image upload per flush, reused by the SLIC display, the
            # predict, and the masked-forward grid (a second flush-sized
            # f32 upload costs ~240 ms through a tunnel).
            images_np = np.stack(imgs)
            imgs_dev = jax.device_put(images_np.astype(np.float32))
            # Segment the whole flush at once (SLIC: one vmapped device
            # dispatch instead of a serialized round trip per image).
            with log.phase("segment_batch", count=len(batch)):
                if seg_cfg.method == "slic":
                    disp_dev = aggregate.normalize_to_uint8_batch(imgs_dev)
                    if disp_dev.ndim == 4 and disp_dev.shape[-1] == 1:
                        disp_dev = disp_dev[..., 0]
                    seg_in = disp_dev
                else:
                    seg_in = disps
                segs = [
                    np.asarray(s, np.int32)
                    for s in segment_image_batch(seg_in, seg_cfg)
                ]
            ss = [int(s.max()) + 1 for s in segs]
            plans = [sample_plan(seed + idxs[j], ss[j])
                     for j in range(len(batch))]
            # pow-2 padded predict: the tail flush reuses a compiled shape
            logits_dev = engine.predict_logits_device(imgs_dev)
            targets_dev = jnp.argmax(logits_dev, axis=1).astype(jnp.int32)
            metas = list(zip(idxs, segs, ss, plans, labels, t0s, imgs))
            on_mesh = mesh is not None and np.prod(list(mesh.shape.values())) > 1
            if on_mesh:
                # Image-batching AND mask-sharding compose: the flat N·K grid
                # shards over the mesh's data axis (synchronous — the mesh
                # path's collectives already keep every chip busy).
                from network_interpretation_imagenet_tpu.parallel import (
                    sharded_knockout_eval_multi,
                    sharded_window_eval_multi,
                )

                if is_knockout:
                    survived_nk, _ = sharded_knockout_eval_multi(
                        mesh, engine.bundle.logits, engine.variables,
                        images_np, np.stack(segs),
                        np.stack([p["ids"] for p in plans]),
                        np.asarray(targets_dev, np.int32),
                        compute_dtype=engine.compute_dtype,
                    )
                else:
                    survived_nk, _ = sharded_window_eval_multi(
                        mesh, engine.bundle.logits, engine.variables,
                        images_np, np.stack(segs),
                        np.stack([p["firsts"] for p in plans]),
                        np.asarray([p["width"] for p in plans], np.int32),
                        np.asarray(targets_dev, np.int32),
                        compute_dtype=engine.compute_dtype,
                    )
                fb = {"handle": None, "n": len(batch), "k": num_mask_samples,
                      "logits": logits_dev, "metas": metas,
                      "survived_per_image": list(survived_nk)}
            elif is_knockout:
                handle, n, k = engine.eval_knockout_masks_multi_async(
                    imgs_dev, np.stack(segs),
                    np.stack([p["ids"] for p in plans]), targets_dev,
                )
                fb = {"handle": handle, "n": n, "k": k,
                      "logits": logits_dev, "metas": metas}
            else:
                handle, n, k = engine.eval_window_masks_multi_async(
                    imgs_dev, np.stack(segs),
                    np.stack([p["firsts"] for p in plans]),
                    np.asarray([p["width"] for p in plans], np.int32),
                    targets_dev,
                )
                fb = {"handle": handle, "n": n, "k": k,
                      "logits": logits_dev, "metas": metas}
            collect_batch()  # previous flush drains while this one computes
            inflight_batch = fb
        except Exception as e:
            res.images_failed += len(batch)
            log.emit({"event": "batch_failed", "indices": [b[0] for b in batch],
                      "error": repr(e)})

    streaming = image_batch <= 1 and (
        mesh is None or np.prod(list(mesh.shape.values())) <= 1
    )

    for pos, item in enumerate(dataset):
        if max_images is not None and pos >= max_images:
            break
        i = int(dataset_indices[pos]) if dataset_indices is not None else pos
        if i in done:  # journaled terminal outcome from a previous run
            continue
        res.images_total += 1
        t0 = time.perf_counter()
        try:
            image, label, gt_bbox = _unpack_item(item)
            gt_by_index[i] = gt_bbox
            # Host segmentation runs FIRST so it overlaps the device
            # evaluating the in-flight image's masks (streaming path). The
            # display conversion is the numpy twin for the same reason — a
            # device round-trip here would serialize the pipeline. SLIC
            # flushes derive the display ON DEVICE from the flush's one
            # image upload, so skip the dead host work there.
            if image_batch > 1 and seg_cfg.method == "slic":
                disp = None
            else:
                disp = aggregate.normalize_to_uint8_np(image)
                if disp.ndim == 3 and disp.shape[2] == 1:
                    disp = disp[:, :, 0]
            if image_batch > 1:
                # No per-image segment/predict here — flush_pending batch-
                # segments and runs ONE batched predict; the skip decision
                # defers to collect.
                pending.append((i, np.asarray(image), disp, label, t0))
                if len(pending) >= image_batch:
                    flush_pending()
                continue
            with log.phase("segment", index=i):
                seg = np.asarray(segment_image(disp, seg_cfg), np.int32)
            s = int(seg.max()) + 1

            plan = sample_plan(seed + i, s)
            if streaming:
                # Dispatch everything — unmasked forward, argmax (stays a
                # device scalar so the mask batch needn't wait for a fetch),
                # masked forwards — and collect one image behind, so the
                # device queue never drains while the host segments ahead.
                logits_dev = engine._predict(
                    engine.variables, jnp.asarray(np.asarray(image))[None]
                )
                target_dev = jnp.argmax(logits_dev[0]).astype(jnp.int32)
                if is_knockout:
                    handle = engine.eval_knockout_masks_async(
                        image, seg, plan["ids"], target_dev
                    )
                else:
                    handle = engine.eval_window_masks_async(
                        image, seg, plan["firsts"], plan["width"], target_dev
                    )
                inflight.append(
                    {"i": i, "label": label, "logits": logits_dev,
                     "seg": seg, "s": s, "plan": plan,
                     "handle": handle, "t0": t0, "image": image}
                )
                while len(inflight) > 1:
                    collect_one()
                continue
            pred, _ = engine.predict_one(image)
            if label is not None and pred != int(label):
                res.images_skipped_misclassified += 1
                log.emit({"event": "skip_misclassified", "index": i,
                          "pred": int(pred), "label": int(label)})
                continue
            target = int(label) if label is not None else pred
            with log.phase("masked_forwards", index=i, k=num_mask_samples):
                if is_knockout:
                    out = _sharded_knockout_saliency(
                        engine, mesh, image, seg, plan["ids"], target,
                    )
                else:
                    out = _sharded_window_saliency(
                        engine, mesh, image, seg, num_mask_samples,
                        window_fraction, seed + i, target, plan["firsts"],
                    )
            finish_image(i, target, seg, out.num_segments, out.heatmap,
                         out.eval.survived, t0, image=image)
        except Exception as e:  # per-image failure isolation
            res.images_failed += 1
            log.emit({"event": "image_failed", "index": i, "error": repr(e)})

    while inflight:
        collect_one()
    flush_pending()  # dispatch the tail flush (and drain the previous one)
    collect_batch()
    wall = time.perf_counter() - t_start
    res.mean_iou = iou_m.avg
    res.mean_survival = surv_m.avg
    res.p50_latency_s = float(np.median(latencies)) if latencies else 0.0
    res.evals_per_sec = total_evals / wall if wall > 0 else 0.0
    _finalize_fidelity_means(res)  # rows are the source (journal/merge too)
    return res



# NOTE: saliency_sweep (window/knockout) keeps its own driver instead of
# this one because its structure genuinely differs: per-image mask GRIDS
# (image i contributes K_i masks, flat N·K dispatch through the engine's
# bucketed chunks) and misclassification decided at COLLECT time from the
# same batched forward (a device scalar rides along so dispatch never
# blocks) — here the skip decision must happen BEFORE dispatch because
# the whole flush is one program over the kept images only.
# (mean, std) → jitted u8→normalized-f32 fn (jit retraces per shape).
_U8_NORM_CACHE: dict = {}


def _u8_norm_key(normalize):
    mean, std = normalize
    return (tuple(float(m) for m in np.ravel(mean)),
            tuple(float(s) for s in np.ravel(std)))


def _u8_normalize_device(u8_dev, normalize):
    """Device half of the uint8 wire: /255 then (x-mean)/std, all f32 on
    device — the upload carries raw bytes (4× smaller than f32)."""
    import jax

    from network_interpretation_imagenet_tpu.ops import preprocess

    key = _u8_norm_key(normalize)
    if key not in _U8_NORM_CACHE:
        mean, std = normalize
        _U8_NORM_CACHE[key] = jax.jit(
            lambda u8: preprocess.normalize(
                u8.astype(jnp.float32) / 255.0, mean, std))
    return _U8_NORM_CACHE[key](u8_dev)


_HEAT_QUANT_JIT = None


def _quantize_heats_device(heats):
    """Device half of the ``heatmap_wire="u8"`` option: per-image min-max
    quantization of f32 [N, H, W] heatmaps to (u8, lo, span) — the fetch
    shrinks 4×; the host reconstructs ``lo + q·span/255``. Downstream
    bbox/IOU is EXACT (localization min-max-normalizes to u8 anyway, and
    quantization is a monotonic affine map); fidelity ranks coarsen to
    256 levels."""
    global _HEAT_QUANT_JIT
    if _HEAT_QUANT_JIT is None:
        import jax

        def one(h):
            lo = h.min()
            span = jnp.maximum(h.max() - lo, jnp.finfo(jnp.float32).tiny)
            q = jnp.round((h - lo) / span * 255.0).astype(jnp.uint8)
            return q, lo, span

        _HEAT_QUANT_JIT = jax.jit(jax.vmap(one))
    return _HEAT_QUANT_JIT(heats)


def _u8_normalize_host(u8: np.ndarray, normalize) -> np.ndarray:
    """Host twin of :func:`_u8_normalize_device` (same f32 op order) for
    the few per-image host consumers (fidelity forwards)."""
    mean, std = normalize
    x = u8.astype(np.float32) / np.float32(255.0)
    return ((x - np.asarray(mean, np.float32))
            / np.asarray(std, np.float32))


def _batched_flush_sweep(
    engine: SaliencyEngine,
    dataset: Iterable,
    *,
    image_batch: int,
    max_images: Optional[int],
    log,
    res: SweepResult,
    iou_m: AverageMeter,
    surv_m: AverageMeter,
    latencies: list,
    done,
    journal,
    keep_heatmaps: bool,
    dataset_indices,
    bbox_threshold: int,
    fidelity_steps: int,
    evals_per_image: int,
    enqueue_display,
    dispatch,
    collect,
    normalize=None,
    prepare=None,
) -> int:
    """Shared driver for the image-batched sweep family (fused-BO and
    attribution): staged flush pipeline (upload/prepare(k) →
    dispatch(k-1) → finalize(k-2)), batched predict + misclassification
    skip, per-image IOU/fidelity/heatmap/journal rows.

    The per-flush compute is the only part that differs between drivers,
    so it arrives as hooks:

    * ``enqueue_display(image) -> disp|None`` — enqueue-time host work
      (e.g. uint8 display for host Felzenszwalb);
    * ``dispatch(imgs_dev, disps, keep, idxs, preds, prep) -> state`` —
      launch the flush's device program over the KEPT images (async:
      return without fetching); raising marks the kept images failed;
    * ``collect(state) -> [(heatmap, extra_row_fields)]`` aligned with
      ``keep`` — fetch results; a ``"survival"`` key in the extra fields
      feeds the survival meter.

    Misclassified images are skipped BEFORE dispatch (one batched predict
    per flush), so no device budget is wasted on them. Returns the total
    eval count (``evals_per_image`` per explained-or-failed kept image;
    may be a callable of the image shape for shape-dependent counts like
    occlusion's position grid).

    ``prepare(imgs_dev, disps, keep) -> prep_state`` (optional hook) lets
    a lane ISSUE device work + async device→host copies for a flush as
    soon as its images are uploaded, while the PREVIOUS flush's
    host-heavy ``dispatch`` (which then receives ``prep_state``) is still
    running — a second pipeline stage in front of the dispatch/collect
    one, so tunnel transfers stream underneath host CPU work instead of
    serializing with it (the BO lane's SLIC fetch rides this). The hook
    must not block.

    ``normalize=(mean, std)`` enables the uint8 wire: datasets may yield
    RAW uint8 HWC images (the form JPEG decode produces), which upload at
    1/4 the bytes of pre-normalized f32 and are scaled (/255) + normalized
    ON DEVICE — the fused decode→normalize path BASELINE.md mandates, and
    the main lever for these per-image-cheap lanes, whose end-to-end rate
    is transfer-bound (docs/PERFORMANCE.md attribution-lane roofline).
    The dataset must be homogeneous (all uint8 or all float — a mixed
    flush would silently promote raw pixels to float and skip their
    normalization, so it errors instead); uint8 without ``normalize`` is
    an error too (raw pixels explained as if normalized are garbage).
    """
    import jax

    total_evals = 0
    pending = []  # (i, image, display, label, gt, t0)
    # Depth-2 flush pipeline: `inflight` holds at most one dispatched (but
    # not yet fetched) device program — its finalize (heatmaps, IOU, rows:
    # host work) runs while the NEXT flush's program churns on device.
    inflight = []

    def finalize():
        nonlocal total_evals
        if not inflight:
            return
        state, keep, idxs, preds, gts, t0s, imgs = inflight.pop(0)
        # Deferred-predict flushes carry DEVICE preds (int32 [B]); one bulk
        # fetch here (64 B, the program is long done) instead of a blocking
        # round trip before dispatch.
        preds = np.asarray(preds)
        try:
            results = collect(state)
        except Exception as e:
            # Errors inside the device program surface at fetch time; only
            # the dispatched (kept) images count as failed.
            failed = [idxs[j] for j in keep]
            res.images_failed += len(failed)
            log.emit({"event": "batch_failed", "indices": failed,
                      "error": repr(e)})
            return
        for pos, j in enumerate(keep):
            try:
                # Callable form: per-image eval count depends on the image
                # shape (occlusion's position grid) — resolved per row.
                total_evals += (evals_per_image(imgs[j].shape)
                                if callable(evals_per_image)
                                else evals_per_image)
                heat, extra = results[pos]
                heat = np.asarray(heat)
                row = {"index": idxs[j], "target": int(preds[j]), **extra}
                if "survival" in extra:
                    surv_m.update(float(extra["survival"]))
                if gts[j] is not None:
                    iou, _ = localization_score(heat, gts[j], bbox_threshold)
                    row["iou"] = float(iou)
                    iou_m.update(float(iou))
                if fidelity_steps > 0:
                    img_j = imgs[j]
                    if img_j.dtype == np.uint8:  # uint8 wire: host twin of
                        img_j = _u8_normalize_host(img_j, normalize)
                    row.update(_fidelity_row_fields(
                        engine, img_j, heat, int(preds[j]), gts[j],
                        fidelity_steps,
                    ))
                res.images_explained += 1
                if keep_heatmaps:
                    res.heatmaps[idxs[j]] = heat
                if journal is not None and keep_heatmaps:
                    journal.save_heatmap(idxs[j], heat)
                latencies.append(time.perf_counter() - t0s[j])
                row["seconds"] = round(latencies[-1], 4)
                res.per_image.append(row)
                log.emit({"event": "image_done", **row})
            except Exception as e:
                res.images_failed += 1
                log.emit({"event": "image_failed", "index": idxs[j],
                          "error": repr(e)})

    # Staged flushes: uploaded + prepared (device work issued, async copies
    # streaming) but not yet dispatched — at most one, so the pipeline is
    # upload/prepare(k) → dispatch(k-1) → finalize(k-2).
    staged = []

    def dispatch_staged():
        if not staged:
            return
        imgs_dev, disps, keep, idxs, preds, gts, t0s, imgs, prep = \
            staged.pop(0)
        try:
            state = dispatch(imgs_dev, disps, keep, idxs, preds, prep)
        except Exception as e:
            failed = [idxs[j] for j in keep]
            res.images_failed += len(failed)
            log.emit({"event": "batch_failed", "indices": failed,
                      "error": repr(e)})
            return
        inflight.append((state, keep, idxs, preds, gts, t0s, imgs))
        # Finalize the PREVIOUS flush now that this one is on the device.
        while len(inflight) > 1:
            finalize()

    def flush():
        if not pending:
            return
        batch = list(pending)
        pending.clear()
        keep = None  # None until the skip decision lands (predict can fail)
        try:
            idxs, imgs, disps, labels, gts, t0s = zip(*batch)
            # ONE image upload per flush, reused by the predict, the
            # dispatch hook's device work (display/segments for BO), and
            # the main program (through a tunnel each 16-image f32 upload
            # costs ~240 ms; the uint8 wire cuts it 4×).
            dtypes = {im.dtype for im in imgs}
            if np.dtype(np.uint8) in dtypes and len(dtypes) > 1:
                # np.stack would silently promote the uint8 images to
                # float RAW pixel values and skip their normalization.
                raise ValueError(
                    f"flush mixes uint8 and float images ({dtypes}); the "
                    "uint8 wire needs a homogeneous dataset")
            arr = np.stack(imgs)
            if arr.dtype == np.uint8:
                # normalize=None already rejected at intake.
                imgs_dev = _u8_normalize_device(
                    jax.device_put(arr), normalize)
            else:
                imgs_dev = jax.device_put(arr.astype(np.float32))
            if all(lab is None for lab in labels):
                # Deferred-predict path (no skip decision to make): targets
                # stay ON DEVICE as int32 [B] — dispatch hooks feed them to
                # their programs without the blocking logits round trip the
                # labeled path needs; finalize() fetches them for the rows
                # once the program is done. Device argmax == host argmax
                # (same logits, same lowest-index tie break).
                preds = jnp.argmax(
                    engine.predict_logits_device(imgs_dev), axis=1)
                keep = list(range(len(batch)))
            else:
                preds = engine.predict(imgs_dev).argmax(axis=1)
                keep = [
                    j for j in range(len(batch))
                    if labels[j] is None or int(preds[j]) == int(labels[j])
                ]
                for j in range(len(batch)):
                    if j not in keep:
                        res.images_skipped_misclassified += 1
                        log.emit({"event": "skip_misclassified",
                                  "index": idxs[j], "pred": int(preds[j]),
                                  "label": int(labels[j])})
                if not keep:
                    return
            # Issue the lane's device front half + async copies NOW (must
            # not block); its results are consumed by dispatch() one stage
            # later, with the copies having streamed under the host work.
            prep = prepare(imgs_dev, disps, keep) if prepare else None
        except Exception as e:
            # Skipped images are already accounted for; only the kept
            # (or, pre-predict, the whole) set counts as failed.
            failed = [b[0] for b in batch] if keep is None else \
                [batch[j][0] for j in keep]
            res.images_failed += len(failed)
            log.emit({"event": "batch_failed", "indices": failed,
                      "error": repr(e)})
            return
        staged.append((imgs_dev, disps, keep, idxs, preds, gts, t0s, imgs,
                       prep))
        # Dispatch the PREVIOUS staged flush (its async copies have been
        # streaming while this one decoded + uploaded).
        while len(staged) > 1:
            dispatch_staged()

    for pos, item in enumerate(dataset):
        if max_images is not None and pos >= max_images:
            break
        i = int(dataset_indices[pos]) if dataset_indices is not None else pos
        if i in done:  # journaled terminal outcome from a previous run
            continue
        res.images_total += 1
        t0 = time.perf_counter()
        try:
            image, label, gt_bbox = _unpack_item(item)
            image = np.asarray(image)
        except Exception as e:
            res.images_failed += 1
            log.emit({"event": "image_failed", "index": i, "error": repr(e)})
            continue
        if image.dtype == np.uint8 and normalize is None:
            # Config error, not a per-image failure: fail the sweep loudly
            # instead of logging every image as failed.
            raise ValueError(
                "dataset yielded uint8 images; pass normalize=(mean, std) "
                "so the sweep can scale + normalize them on device")
        try:
            pending.append((i, image, enqueue_display(image), label,
                            gt_bbox, t0))
            if len(pending) >= image_batch:
                flush()
        except Exception as e:
            res.images_failed += 1
            log.emit({"event": "image_failed", "index": i, "error": repr(e)})
    flush()
    while staged:
        dispatch_staged()
    while inflight:
        finalize()
    return total_evals


def _sweep_scaffold(journal, logger, keep_heatmaps):
    """(res, iou_m, surv_m, latencies, done, log) with journaled work
    restored — the common preamble of the flush-driven sweeps."""
    log = logger or PhaseLogger(enabled=False)
    res = SweepResult()
    iou_m, surv_m = AverageMeter(), AverageMeter()
    latencies = []
    done = ()
    if journal is not None:
        from network_interpretation_imagenet_tpu.saliency.journal import (
            JournalingLogger,
        )

        journal.restore_into(res, iou_m, surv_m, latencies, keep_heatmaps)
        done = journal.done
        log = JournalingLogger(log, journal)
    return res, iou_m, surv_m, latencies, done, log


def _finish_sweep(res, iou_m, surv_m, latencies, total_evals, wall):
    res.mean_iou = iou_m.avg
    res.mean_survival = surv_m.avg
    res.p50_latency_s = float(np.median(latencies)) if latencies else 0.0
    res.evals_per_sec = total_evals / wall if wall > 0 else 0.0
    _finalize_fidelity_means(res)  # rows are the source (journal/merge too)
    return res


def _attr_evals_per_image(method: str, *, steps, samples, lm, rise_masks,
                          mask_batch, patch, stride, scorecam_channels):
    """Per-image device-eval count for :func:`attribution_sweep`'s
    ``evals_per_sec``: backward passes for the gradient family, masked
    forwards for the mask-batched family. Occlusion's count depends on
    the image shape (position grid), so it returns a callable the flush
    driver resolves per row."""
    if method == "meaningful":
        return int(lm.get("iters", 150))
    if method == "rise":
        chunk = 250 if mask_batch is None else int(mask_batch)
        return -(-int(rise_masks) // chunk) * chunk  # rounds up, like rise_map
    if method == "occlusion":
        def n_positions(shape):
            h, w = int(shape[0]), int(shape[1])
            return (max(0, (h - patch) // stride + 1)
                    * max(0, (w - patch) // stride + 1))

        return n_positions
    if method == "scorecam":
        return int(scorecam_channels)
    return {"integrated": int(steps), "smoothgrad": int(samples),
            "xrai": 2 * int(steps)}.get(method, 1)


def bo_saliency_sweep(
    engine: SaliencyEngine,
    dataset: Iterable,
    seg_cfg: SegmentConfig,
    bo_cfg=None,
    window_fraction: float = 0.4,
    bbox_threshold: int = 180,
    image_batch: int = 16,
    max_images: Optional[int] = None,
    seed: int = 0,
    logger: Optional[PhaseLogger] = None,
    mesh=None,
    proposals_per_iter: int = 1,
    keep_heatmaps: bool = False,
    dataset_indices=None,
    journal=None,
    fidelity_steps: int = 0,
    normalize=None,
) -> SweepResult:
    """Val-set sweep driven by the FLAGSHIP path: GP-EI BO per image
    (``bayesian_active_learning_imagenet.py:379-498``), batched — every
    ``image_batch`` images run as ONE vmapped fused-BO program
    (``bo_window_saliency_multi``, ~25 ms/image ResNet-101 vs ~135 ms one
    at a time), optionally image-sharded over ``mesh``.

    Misclassified images are skipped BEFORE dispatch (one batched predict
    per flush), so no BO budget is wasted on them; segmentation also runs
    only on the kept images.

    NOTE on ``p50_latency_s``: per-image "seconds" rows span enqueue→flush-
    finalize, so with ``image_batch`` > 1 they include the whole flush's
    batched BO program (and, since the flushes pipeline at depth 3, up to two
    additional in-flight flushes) — an upper bound shared by up to
    ``image_batch`` images, NOT isolated per-image latency (bench.py
    measures that; ~120 ms for ResNet-101). Throughput (``evals_per_sec``,
    or images/s from ``images_explained``/wall) is this sweep's primary
    metric.

    ``journal``: see :func:`saliency_sweep` — same crash-safe resume
    semantics (per-image PRNG keys derive from dataset indices, so resumed
    images match an uninterrupted run exactly). ``fidelity_steps``: same
    per-image deletion/insertion AUC + pointing-game scoring.

    ``normalize=(mean, std)``: uint8 wire — datasets may yield raw uint8
    images, uploaded at 1/4 the f32 bytes and normalized on device (see
    ``_batched_flush_sweep``). With ``seg_cfg.method == "slic"`` displays
    still derive from the NORMALIZED batch on device — bit-identical to
    the f32 path fed the same normalized array; a HOST-numpy normalize
    twin differs by 1-2 ulp (XLA compiles the fused (x/255-m)/s
    differently), which can move one SLIC boundary pixel and hence fork
    this discrete lane's BO trajectory. With host felzenszwalb the
    display min-max stretches the raw uint8 instead of the normalized
    image.
    """
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.ops import aggregate
    from network_interpretation_imagenet_tpu.saliency.bo_pipeline import (
        bo_window_saliency_multi_async,
    )

    bo_cfg = bo_cfg or BOConfig()
    res, iou_m, surv_m, latencies, done, log = _sweep_scaffold(
        journal, logger, keep_heatmaps)
    t_start = time.perf_counter()

    def enqueue_display(image):
        if seg_cfg.method == "slic":
            return None  # the dispatch hook derives displays ON DEVICE
        disp = aggregate.normalize_to_uint8_np(image)
        if disp.ndim == 3 and disp.shape[2] == 1:
            disp = disp[:, :, 0]
        return disp

    def prepare(imgs_dev, disps, keep):
        """Issue the SLIC front half (device display derive + vmapped
        k-means + async u8 copy) as soon as the flush's images land —
        the segment fetch then streams UNDER the previous flush's host
        postpass/dispatch instead of serializing after it."""
        if seg_cfg.method != "slic":
            return None  # Felzenszwalb is host work in dispatch
        from network_interpretation_imagenet_tpu.segment import (
            slic_batch_device,
        )

        keep_imgs = (imgs_dev if len(keep) == int(imgs_dev.shape[0]) else
                     jnp.take(imgs_dev, jnp.asarray(keep), axis=0))
        # Display batch derived ON DEVICE (vmapped twin of the host
        # normalize_to_uint8_np used at enqueue time).
        disp_dev = aggregate.normalize_to_uint8_batch(keep_imgs)
        if disp_dev.ndim == 4 and disp_dev.shape[-1] == 1:
            disp_dev = disp_dev[..., 0]
        segs_dev = slic_batch_device(disp_dev, seg_cfg)
        segs_dev.copy_to_host_async()
        return keep_imgs, segs_dev

    def dispatch(imgs_dev, disps, keep, idxs, preds, prep):
        from network_interpretation_imagenet_tpu.segment import (
            slic_postpass_host,
        )

        if prep is not None:  # SLIC: device half already issued + streamed
            keep_imgs, segs_dev = prep
            with log.phase("segment_batch", count=len(keep)):
                segs = slic_postpass_host(np.asarray(segs_dev), seg_cfg)
        else:
            keep_imgs = (imgs_dev if len(keep) == int(imgs_dev.shape[0])
                         else jnp.take(imgs_dev, jnp.asarray(keep), axis=0))
            with log.phase("segment_batch", count=len(keep)):
                segs = [
                    np.asarray(s, np.int32)
                    for s in segment_image_batch(
                        [disps[j] for j in keep], seg_cfg)
                ]
        ss = [int(s.max()) + 1 for s in segs]
        # Per-image seeds derive from DATASET indices, so each image's
        # PRNG stream is invariant to flush composition (--image-batch
        # value, skip patterns) and matches a single-image
        # bo_window_saliency(seed=seed+index) call exactly.
        # Deferred-predict flushes hand preds as a DEVICE int32 [B]
        # (keep == all there): it rides into the runner as-is, whose
        # operand padding materializes it AFTER the slic fetch above —
        # the predict round trip leaves the dispatch critical path.
        collect_fn = bo_window_saliency_multi_async(
            engine, keep_imgs, segs, bo_cfg,
            window_fraction=window_fraction,
            per_image_seeds=[seed + int(idxs[j]) for j in keep],
            targets=(preds if not isinstance(preds, np.ndarray)
                     else [int(preds[j]) for j in keep]), mesh=mesh,
            proposals_per_iter=proposals_per_iter,
        )
        return collect_fn, ss

    def collect(state):
        collect_fn, ss = state
        return [
            (out.heatmap, {
                "num_segments": ss[pos],
                "survival": float(np.mean(out.eval.survived)),
                "best_start": int(trace.xp[np.argmax(trace.yp)]),
            })
            for pos, (out, trace) in enumerate(collect_fn())
        ]

    total_evals = _batched_flush_sweep(
        engine, dataset,
        image_batch=image_batch, max_images=max_images, log=log, res=res,
        iou_m=iou_m, surv_m=surv_m, latencies=latencies, done=done,
        journal=journal, keep_heatmaps=keep_heatmaps,
        dataset_indices=dataset_indices, bbox_threshold=bbox_threshold,
        fidelity_steps=fidelity_steps,
        evals_per_image=bo_cfg.n_pre_samples
        + bo_cfg.n_iters * proposals_per_iter,
        enqueue_display=enqueue_display, dispatch=dispatch, collect=collect,
        normalize=normalize, prepare=prepare,
    )
    return _finish_sweep(res, iou_m, surv_m, latencies, total_evals,
                         time.perf_counter() - t_start)


def attribution_sweep(
    engine: SaliencyEngine,
    dataset: Iterable,
    method: str = "gradient",
    bbox_threshold: int = 180,
    image_batch: int = 16,
    max_images: Optional[int] = None,
    seed: int = 0,
    logger: Optional[PhaseLogger] = None,
    mesh=None,
    keep_heatmaps: bool = False,
    dataset_indices=None,
    journal=None,
    fidelity_steps: int = 0,
    steps: int = 16,
    samples: int = 16,
    noise_sigma: float = 0.15,
    magnitude: bool = False,
    gradcam_layer: Optional[str] = None,
    step_batch: Optional[int] = None,
    sample_batch: Optional[int] = None,
    lm_cfg: Optional[dict] = None,
    xrai_scales=None,
    normalize=None,
    heatmap_wire: str = "f32",
    # None = occlusion_map's resolution-adaptive defaults.
    patch: "int | None" = None,
    stride: "int | None" = None,
    rise_masks: int = 1000,
    rise_grid: int = 7,
    rise_keep_prob: float = 0.5,
    mask_batch: Optional[int] = None,
    scorecam_channels: int = 64,
) -> SweepResult:
    """Val-set sweep driven by the gradient-family attribution path: every
    ``image_batch`` images' backward passes run as ONE vmapped program
    (``gradient.attribute_batch``), optionally image-sharded over ``mesh``
    — the attribution twin of :func:`bo_saliency_sweep` (same flush
    driver). No segmentation step: these methods attribute pixels
    directly. ``mean_survival`` stays 0 — there is no survival concept in
    this family.

    ``method`` ∈ ``gradient.BATCHABLE_METHODS`` (gradient / grad_input /
    integrated / smoothgrad / gradcam), ``"meaningful"`` (Fong-Vedaldi
    learned deletion masks: N Adam loops as ONE vmapped program,
    ``learned_mask.learned_mask_batch_dispatch``; hyperparameters via
    ``lm_cfg``, rows additionally carry prob_original/prob_masked), or
    ``"xrai"`` (the batched signed-IG program per flush +
    per-image host felzenszwalb-ladder greedy ranking at collect time —
    host ranking overlaps the NEXT flush's device work in the staged
    pipeline; ``xrai_scales`` sets the ladder, rows carry num_regions).
    Stochastic seeds derive from
    DATASET indices (``seed + index``), so per-image results are invariant
    to flush composition and journal resume matches an uninterrupted run.
    ``evals_per_sec`` counts backward passes (``steps`` per image for
    integrated, ``samples`` for smoothgrad, the Adam ``iters`` for
    meaningful, 1 otherwise); images/s =
    ``images_explained`` / wall is the companion metric.
    ``step_batch``/``sample_batch`` bound the flush's live activation
    memory at image_batch·chunk concurrent backwards (exact scan
    accumulation) — required headroom for deep models at image_batch≥16.

    ``normalize=(mean, std)``: uint8 wire — the dataset yields raw uint8
    images, uploaded at 1/4 the f32 bytes and /255-normalized on device
    (see ``_batched_flush_sweep``); for ``method="xrai"`` the raw uint8
    image doubles as the felzenszwalb-ladder display.

    ``heatmap_wire`` (gradient-family and mask-batched methods — xrai's
    signed attributions and meaningful's tuple state keep f32): the
    flush's [N, H, W] heatmap fetch is the lane's largest transfer
    (3.2 MB f32 at N=16/224²; docs/PERFORMANCE.md). ``"f16"`` halves it
    (heatmaps reconstruct to f32 with ≤2⁻¹¹ relative rounding); ``"u8"``
    quarters it via per-image min-max quantization (bbox/IOU rows are
    EXACT — localization min-max-normalizes to u8 anyway and quantization
    is a monotonic affine map; fidelity AUC ranks coarsen to 256 levels,
    measured drift <1e-3). Default ``"f32"`` is lossless.

    The mask-batched per-image methods (``"occlusion"`` / ``"rise"`` /
    ``"scorecam"``, :data:`gradient.MASK_BATCHED_METHODS`) run each flush
    as ONE ``lax.map`` program over the kept images (sequential per
    image — their mask chunks already fill the chip, so an N-way vmap
    would multiply memory, not throughput; per-image dispatch would pay
    a tunnel RTT per launch), and share everything else in the lane:
    one upload per flush, batched/deferred predict, async heatmap
    collect, journal resume, fidelity rows, and the uint8/heatmap wires.
    Hyperparameters: ``patch``/``stride`` (occlusion),
    ``rise_masks``/``rise_grid``/``rise_keep_prob`` (rise),
    ``scorecam_channels``/``gradcam_layer`` (scorecam), ``mask_batch``
    (the per-image forward chunk; None keeps each method's one-shot
    default — for rise this is part of the RNG stream, see
    :func:`gradient.mask_method_one_fn`). RISE seeds derive from dataset
    indices like every stochastic lane. ``evals_per_sec`` counts masked
    forwards (rise's rounded-up mask count, occlusion's position grid,
    scorecam's scored channels). ``mesh`` shards the image axis for the
    gradient family (vmapped) AND the mask-batched family (each device
    lax.maps its shard sequentially).
    """
    if heatmap_wire not in ("f32", "f16", "u8"):
        raise ValueError(f"heatmap_wire must be f32|f16|u8, "
                         f"got {heatmap_wire!r}")
    if method == "meaningful" and heatmap_wire != "f32":
        raise ValueError(
            f"heatmap_wire={heatmap_wire!r}: 'meaningful' keeps its f32 "
            f"tuple state (heatmaps + per-image probabilities)")
    if method == "xrai" and heatmap_wire == "u8":
        raise ValueError(
            "heatmap_wire='u8': per-image min-max quantization destroys "
            "the SIGN of xrai's attributions; use 'f16' (sign-preserving, "
            "<=2^-11 relative rounding) or 'f32'")
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.saliency import gradient as gmod

    extra_methods = ("meaningful", "xrai")
    all_methods = (gmod.BATCHABLE_METHODS + extra_methods
                   + gmod.MASK_BATCHED_METHODS)
    if method not in all_methods:
        raise ValueError(f"unknown attribution method {method!r}; choose "
                         f"from {all_methods}")
    res, iou_m, surv_m, latencies, done, log = _sweep_scaffold(
        journal, logger, keep_heatmaps)
    t_start = time.perf_counter()

    lm = dict(lm_cfg or {})

    def enqueue_display(image):
        if method != "xrai":
            return None  # gradient/learned-mask methods need no segmentation
        from network_interpretation_imagenet_tpu.ops import aggregate

        if image.dtype == np.uint8:
            # uint8 wire: the raw image IS the display (what a JPEG
            # pipeline would hand xrai_saliency directly).
            disp = image
            if disp.ndim == 3 and disp.shape[2] == 1:
                disp = disp[:, :, 0]
            return disp
        disp = aggregate.normalize_to_uint8_np(image)
        if disp.ndim == 3 and disp.shape[2] == 1:
            disp = disp[:, :, 0]
        return disp

    def dispatch(imgs_dev, disps, keep, idxs, preds, prep):
        keep_imgs = (imgs_dev if len(keep) == int(imgs_dev.shape[0]) else
                     jnp.take(imgs_dev, jnp.asarray(keep), axis=0))
        # Deferred-predict flushes (unlabeled datasets) hand preds as a
        # DEVICE int32 [B] with keep == all: targets feed the program
        # without ANY host round trip — this lane's dispatch then has
        # zero syncs (the labeled path fetched logits for the skip
        # decision already, so host ints cost nothing extra there).
        kept_targets = (preds if not isinstance(preds, np.ndarray) else
                        np.asarray([int(preds[j]) for j in keep], np.int32))
        kept_seeds = np.asarray([seed + int(idxs[j]) for j in keep],
                                np.int32)
        if method == "meaningful":
            from network_interpretation_imagenet_tpu.saliency import (
                learned_mask,
            )

            return learned_mask.learned_mask_batch_dispatch(
                engine.bundle.logits, engine.variables, keep_imgs,
                kept_targets, seeds=kept_seeds, mesh=mesh, **lm,
            )
        if method == "xrai":
            from network_interpretation_imagenet_tpu.saliency import xrai

            attr_dev = xrai.xrai_attribution_batch(
                engine.bundle.logits, engine.variables, keep_imgs,
                kept_targets, steps=steps, step_batch=step_batch, mesh=mesh,
            )
            # The signed-attribution stack is this lane's largest fetch;
            # f16 halves it and PRESERVES SIGN (only u8 min-max is lossy
            # for signed data) — the region ranking sums ~10²-10⁵-pixel
            # regions, so 2⁻¹¹ relative rounding is far below the
            # between-region gaps it ranks.
            if heatmap_wire == "f16":
                attr_dev = attr_dev.astype(jnp.float16)
            # Stream the attribution stack host-ward as soon as the
            # program finishes — collect's fetch then finds it local
            # instead of blocking the tunnel after the ladder host work.
            attr_dev.copy_to_host_async()
            return attr_dev, [disps[j] for j in keep]
        if method in gmod.MASK_BATCHED_METHODS:
            # ONE program per flush that lax.maps the per-image body (NOT
            # an N-way vmap — memory stays at one image's mask chunk; NOT
            # per-image dispatch — each eager launch pays a tunnel RTT,
            # measured 10× the program cost on a remote-attached chip).
            heats_dev = gmod.mask_method_batch(
                engine.bundle.logits, engine.variables, keep_imgs,
                kept_targets, method, bundle=engine.bundle,
                seeds=kept_seeds, mesh=mesh,
                patch=patch, stride=stride, rise_masks=rise_masks,
                rise_grid=rise_grid, rise_keep_prob=rise_keep_prob,
                mask_batch=mask_batch, gradcam_layer=gradcam_layer,
                scorecam_channels=scorecam_channels,
            )
            if heatmap_wire == "f16":
                heats_dev = heats_dev.astype(jnp.float16)
            elif heatmap_wire == "u8":
                heats_dev = _quantize_heats_device(heats_dev)
            for leaf in (heats_dev if isinstance(heats_dev, tuple)
                         else (heats_dev,)):
                leaf.copy_to_host_async()
            return heats_dev
        heats_dev = gmod.attribute_batch(
            engine.bundle.logits, engine.variables, keep_imgs,
            kept_targets, method, bundle=engine.bundle, steps=steps,
            samples=samples, noise_sigma=noise_sigma, magnitude=magnitude,
            gradcam_layer=gradcam_layer, seeds=kept_seeds,
            mesh=mesh, step_batch=step_batch, sample_batch=sample_batch,
        )
        if heatmap_wire == "f16":
            heats_dev = heats_dev.astype(jnp.float16)
        elif heatmap_wire == "u8":
            heats_dev = _quantize_heats_device(heats_dev)
        # Async host-ward copy: the collect fetch streams while the
        # previous flush's rows finalize instead of blocking after them.
        for leaf in (heats_dev if isinstance(heats_dev, tuple)
                     else (heats_dev,)):
            leaf.copy_to_host_async()
        return heats_dev

    def collect(state):
        import jax

        if method == "xrai":
            from network_interpretation_imagenet_tpu.saliency import xrai

            attrs, kept_disps = state
            # ONE device→host fetch; f16 wires reconstruct to f32 for the
            # ladder math.
            attrs = np.asarray(attrs).astype(np.float32)
            # None → area-adaptive ladder (DEFAULT_SCALES is a 224²
            # calibration; on small inputs it over-merges to one region
            # and the ranking degenerates to a constant map).
            scales = (xrai.adaptive_scales(*kept_disps[0].shape[:2])
                      if xrai_scales is None else xrai_scales)
            out = []
            for pos in range(len(attrs)):
                # The same scale→min_size ladder as xrai_saliency; ONE
                # edge build+sort shared across scales (bit-exact with
                # per-scale calls, ~3× less host time per image).
                from network_interpretation_imagenet_tpu.segment import (
                    felzenszwalb_ladder,
                )

                seg_maps = felzenszwalb_ladder(kept_disps[pos], scales,
                                               sigma=0.5)
                heat, n_regions = xrai.greedy_region_ranking(
                    attrs[pos], seg_maps)
                out.append((heat, {"method": method,
                                   "num_regions": int(n_regions)}))
            return out
        if method == "meaningful":
            heats, _, p_orig, p_masked, _ = jax.device_get(state)
            return [
                (heats[pos], {"method": method,
                              "prob_original": round(float(p_orig[pos]), 6),
                              "prob_masked": round(float(p_masked[pos]), 6)})
                for pos in range(len(heats))
            ]
        if heatmap_wire == "u8":
            q, lo, span = jax.device_get(state)  # ONE batched fetch
            heats = (lo[:, None, None]
                     + q.astype(np.float32) * (span[:, None, None] / 255.0))
        else:  # f32 (lossless) or f16 (reconstructs with rounding)
            heats = np.asarray(state).astype(np.float32)
        return [(heats[pos], {"method": method})
                for pos in range(len(heats))]

    total_evals = _batched_flush_sweep(
        engine, dataset,
        image_batch=image_batch, max_images=max_images, log=log, res=res,
        iou_m=iou_m, surv_m=surv_m, latencies=latencies, done=done,
        journal=journal, keep_heatmaps=keep_heatmaps,
        dataset_indices=dataset_indices, bbox_threshold=bbox_threshold,
        fidelity_steps=fidelity_steps,
        evals_per_image=_attr_evals_per_image(
            method, steps=steps, samples=samples, lm=lm,
            rise_masks=rise_masks, mask_batch=mask_batch, patch=patch,
            stride=stride, scorecam_channels=scorecam_channels),
        enqueue_display=enqueue_display, dispatch=dispatch,
        collect=collect, normalize=normalize,
    )
    return _finish_sweep(res, iou_m, surv_m, latencies, total_evals,
                         time.perf_counter() - t_start)
