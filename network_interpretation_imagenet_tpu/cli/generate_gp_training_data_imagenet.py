"""Random-mask GP-training-data generator + minimal-mask search CLI
(reference ``generate_gp_training_data_imagenet.py``): N random window masks
→ classifier verdicts → summed heatmap; then the binary-search for the
minimal summed-label threshold whose mask keeps the prediction
(``:396-487``) — here all threshold levels are evaluated in one batched
forward.
"""

from __future__ import annotations

import os

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.saliency.pipeline import (
    localization_score,
    minimal_mask_search,
    random_window_saliency,
)
from network_interpretation_imagenet_tpu.saliency.viz import mark_boundaries, save_panels


def main(argv=None):
    p = common.build_parser(__doc__)
    p.add_argument("--bbox_threshold", type=int, default=180)
    p.add_argument("--skip-threshold-search", action="store_true")
    p.add_argument("--fidelity", action="store_true",
                   help="also report deletion/insertion AUC (+ pointing game "
                        "with gt boxes) for the produced heatmap")
    args = p.parse_args(argv)
    common.apply_debug_flags(args)

    image, disp, label, gt_bbox = common.resolve_image(args)
    engine = common.build_engine(args)
    pred, _ = engine.predict_one(image)
    target = pred  # when pred == label this IS the label; else explain the prediction
    if label is not None and pred != label:
        print(f"[warn] wrong prediction (pred={pred}, label={label})")

    seg = common.segment_display(disp, common.segment_config(args))
    print(f"number of segments: {seg.max() + 1}")

    out = random_window_saliency(
        engine, image, seg, num_samples=args.num_mask_samples,
        window_fraction=args.window_fraction, seed=args.seed, target=target,
    )
    correct = int(out.eval.survived.sum())
    print(f"{args.num_mask_samples} samples, the correct prediction number: {correct}")

    common.write_heatmap_png(os.path.join(args.out, "heatmap.png"), out.heatmap)
    common.save_mask_npz(
        os.path.join(args.out, "masks.npz"),
        segments=seg, firsts=out.firsts, width=np.asarray(out.width),
        labels=out.eval.labels, prob_target=out.eval.prob_target,
        heatmap=out.heatmap, target=np.asarray(target),
    )
    if args.save_pngs:
        import jax.numpy as jnp

        from network_interpretation_imagenet_tpu.ops import masking

        masks = np.asarray(masking.window_masks(
            jnp.asarray(seg), jnp.asarray(out.firsts), jnp.int32(out.width)))
        common.save_mask_pngs(os.path.join(args.out, "masks"), masks, out.eval.labels)

    payload = {
        "eval_img_index": args.eval_img_index,
        "target": int(target),
        "num_segments": out.num_segments,
        "num_mask_samples": args.num_mask_samples,
        "correct_pred_count": correct,
        "masks_npz": os.path.join(args.out, "masks.npz"),
    }
    if not args.skip_threshold_search:
        thr, keep, levels = minimal_mask_search(engine, image, out.heatmap, target)
        payload["mask_threshold"] = thr
        payload["levels"] = levels.tolist()
        payload["keeps_prediction"] = keep.astype(int).tolist()
        if thr is not None:
            mask1 = out.heatmap >= thr
            save_panels(
                os.path.join(args.out,
                             f"index_{args.eval_img_index}_threshold_{thr:g}.png"),
                [disp, mark_boundaries(disp, seg), mask1.astype(float),
                 np.asarray(disp) * mask1[..., None] if disp.ndim == 3 else disp * mask1],
                [f"original_img_label_{target}", "Superpixel",
                 f"Mask threshold_{thr:g}", "Org_img_with_mask"],
            )
    if gt_bbox is not None:
        iou, pred_box = localization_score(out.heatmap, gt_bbox, args.bbox_threshold)
        payload["IOU"] = round(float(iou), 4)
        payload["pred_box_xywh"] = [int(v) for v in pred_box]
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
    common.emit_result(args.out, "gp_training_data_result.json", payload)


if __name__ == "__main__":
    main()
