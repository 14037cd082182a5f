"""BO-guided saliency CLI — the reference's flagship path
(``bayesian_active_learning_imagenet.py:379-498``): GP-EI Bayesian
optimization over superpixel-window masks, summed-label heatmap, bbox + IOU.

The whole active-learning loop runs on device (one jit) instead of the
reference's per-sample dataset walk.
"""

from __future__ import annotations

import os
import time

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.config import BOConfig
from network_interpretation_imagenet_tpu.saliency.bo_pipeline import bo_window_saliency
from network_interpretation_imagenet_tpu.saliency.pipeline import localization_score
from network_interpretation_imagenet_tpu.saliency.viz import mark_boundaries, save_panels


def main(argv=None):
    p = common.build_parser(__doc__)
    common.add_bo_flags(p)
    p.add_argument("--bbox_threshold", type=int, default=180)
    p.add_argument("--proposals-per-iter", type=int, default=1,
                   help="q-batched BO: evaluate top-q EI proposals per "
                        "iteration in one forward (1 = reference behavior)")
    p.add_argument("--fidelity", action="store_true",
                   help="also report deletion/insertion AUC (+ pointing game "
                        "with gt boxes) for the produced heatmap")
    p.add_argument("--num-images", type=int, default=1,
                   help=">1: explain N consecutive images with the vmapped "
                        "image-batched fused loop (~6x per-image vs one at "
                        "a time; docs/PERFORMANCE.md)")
    args = p.parse_args(argv)
    common.apply_debug_flags(args)

    if args.num_images > 1:
        return _run_batched(args)

    start = time.time()
    image, disp, label, gt_bbox = common.resolve_image(args)
    engine = common.build_engine(args)
    pred, _ = engine.predict_one(image)
    if label is not None and pred != label:
        # Reference raises here (:221); we degrade gracefully (SURVEY §5).
        print(f"[warn] wrong prediction (pred={pred}, label={label}); "
              "explaining the predicted class instead")
    target = pred  # when pred == label this IS the label; else explain the prediction

    seg = common.segment_display(disp, common.segment_config(args))
    print(f"{common.segment_config(args).method} number of segments: {seg.max() + 1}")

    cfg = BOConfig(n_iters=args.n_iters, n_pre_samples=args.n_pre_samples)
    out, trace = bo_window_saliency(
        engine, image, seg, cfg, window_fraction=args.window_fraction,
        seed=args.seed, target=target, fused=args.fused,
        proposals_per_iter=args.proposals_per_iter,
    )
    duration = time.time() - start

    common.write_heatmap_png(os.path.join(args.out, "heatmap.png"), out.heatmap)
    save_panels(
        os.path.join(args.out, f"index_{args.eval_img_index}.png"),
        [disp, mark_boundaries(disp, seg), out.heatmap],
        ["Org_img", "Superpixels", "Summed label training heatmap"],
    )
    if args.save_pngs:
        from network_interpretation_imagenet_tpu.ops import masking
        import jax.numpy as jnp

        masks = np.asarray(masking.window_masks(
            jnp.asarray(seg), jnp.asarray(out.firsts), jnp.int32(out.width)))
        common.save_mask_pngs(os.path.join(args.out, "masks"), masks, out.eval.labels)

    payload = {
        "eval_img_index": args.eval_img_index,
        "target": int(target),
        "num_segments": out.num_segments,
        "bo_xp": trace.xp.tolist(),
        "bo_yp": [round(float(v), 5) for v in trace.yp],
        "survived": int(out.eval.survived.sum()),
        "time_duration_s": round(duration, 3),
    }
    if gt_bbox is not None:
        iou, pred_box = localization_score(out.heatmap, gt_bbox, args.bbox_threshold)
        payload["IOU"] = round(float(iou), 4)
        payload["pred_box_xywh"] = [int(v) for v in pred_box]
        payload["gt_box_xywh"] = [float(v) for v in gt_bbox]
    if args.fidelity:
        from network_interpretation_imagenet_tpu.saliency import (
            deletion_insertion_auc,
            pointing_game,
        )

        fm = deletion_insertion_auc(engine, image, out.heatmap, int(target))
        payload["deletion_auc"] = round(fm["deletion_auc"], 4)
        payload["insertion_auc"] = round(fm["insertion_auc"], 4)
        if gt_bbox is not None:
            payload["pointing_game_hit"] = bool(
                pointing_game(out.heatmap, gt_bbox)
            )
    common.emit_result(args.out, "bo_result.json", payload)


def _run_batched(args):
    """N-image batched fused BO (TPU-first extension of the one-image
    reference flow): one vmapped program explains all N images."""
    import copy

    from network_interpretation_imagenet_tpu.saliency.bo_pipeline import (
        bo_window_saliency_multi,
    )

    # The batched path is inherently the fused (vmapped one-jit) loop; the
    # host-driven loop cannot batch images.
    if not args.fused:
        print("[note] --num-images > 1 always uses the fused vmapped loop "
              "(--no-fused applies to single-image runs only)")

    start = time.time()
    engine = common.build_engine(args)
    seg_cfg = common.segment_config(args)
    images, disps, labels, gts = [], [], [], []
    for i in range(args.num_images):
        a = copy.copy(args)  # argparse Namespace: vary only the index
        a.eval_img_index = args.eval_img_index + i
        image, disp, label, gt_bbox = common.resolve_image(a)
        images.append(np.asarray(image))
        disps.append(disp)
        labels.append(label)
        gts.append(gt_bbox)
    # One dispatch segments all N images when the segmenter is SLIC.
    from network_interpretation_imagenet_tpu.segment import segment_image_batch

    segs = segment_image_batch(disps, seg_cfg)

    # Mirror the single-image path's wrong-prediction warning (reference
    # raises at bayesian_active_learning_imagenet.py:221); the predicted
    # class is explained either way.
    preds = np.asarray(engine.predict(np.stack(images)).argmax(axis=1))
    for i, label in enumerate(labels):
        if label is not None and int(preds[i]) != int(label):
            print(f"[warn] wrong prediction at index "
                  f"{args.eval_img_index + i} (pred={int(preds[i])}, "
                  f"label={label}); explaining the predicted class instead")

    cfg = BOConfig(n_iters=args.n_iters, n_pre_samples=args.n_pre_samples)
    results = bo_window_saliency_multi(
        engine, images, segs, cfg, window_fraction=args.window_fraction,
        seed=args.seed, targets=preds.tolist(),
        proposals_per_iter=args.proposals_per_iter,
    )
    duration = time.time() - start

    rows = []
    for i, (out, trace) in enumerate(results):
        row = {
            "eval_img_index": args.eval_img_index + i,
            "target": int(preds[i]),
            "num_segments": out.num_segments,
            "survived": int(out.eval.survived.sum()),
            "best_start": int(trace.xp[np.argmax(trace.yp)]),
        }
        if gts[i] is not None:
            iou, _ = localization_score(out.heatmap, gts[i], args.bbox_threshold)
            row["IOU"] = round(float(iou), 4)
        if args.fidelity:
            from network_interpretation_imagenet_tpu.saliency import (
                deletion_insertion_auc,
                pointing_game,
            )

            fm = deletion_insertion_auc(
                engine, images[i], out.heatmap, int(preds[i])
            )
            row["deletion_auc"] = round(fm["deletion_auc"], 4)
            row["insertion_auc"] = round(fm["insertion_auc"], 4)
            if gts[i] is not None:
                row["pointing_game_hit"] = bool(
                    pointing_game(out.heatmap, gts[i])
                )
        rows.append(row)
        common.write_heatmap_png(
            os.path.join(args.out, f"heatmap_{args.eval_img_index + i}.png"),
            out.heatmap,
        )
        save_panels(
            os.path.join(args.out, f"index_{args.eval_img_index + i}.png"),
            [disps[i], mark_boundaries(disps[i], out.segments), out.heatmap],
            ["Org_img", "Superpixels", "Summed label training heatmap"],
        )
        if args.save_pngs:
            from network_interpretation_imagenet_tpu.ops import masking
            import jax.numpy as jnp

            masks = np.asarray(masking.window_masks(
                jnp.asarray(out.segments), jnp.asarray(out.firsts),
                jnp.int32(out.width)))
            common.save_mask_pngs(
                os.path.join(args.out, f"masks_{args.eval_img_index + i}"),
                masks, out.eval.labels,
            )
    common.emit_result(args.out, "bo_result.json", {
        "num_images": args.num_images,
        "per_image": rows,
        "time_duration_s": round(duration, 3),
        "ms_per_image": round(duration / args.num_images * 1000, 1),
    })


if __name__ == "__main__":
    main()
