"""Occlusion / gradient saliency CLI (BASELINE.json config 3: "ImageNet
ResNet-18 occlusion/gradient saliency, 224×224 batched masks").

Methods: ``occlusion`` (patch-sweep probability drop, batched masked
forwards), ``gradient`` (input gradient — the reference's commented-out
oracle, ``gp_superpixel_data_imagenet.py:235-251``), ``grad_input``,
``integrated`` (integrated gradients), ``smoothgrad`` (noise-averaged
input gradient, one vmapped backward; ``--sg-squared`` for SmoothGrad²),
``rise`` (random upsampled soft masks, probability-weighted average —
all mask generation and forwards on device), ``gradcam`` (feature-map
weighted activation map, architecture-generic via flax interceptors;
``--gradcam-layer list`` prints the per-model layer menu), ``scorecam``
(gradient-free CAM: top-K activation channels become soft masks scored
by batched masked forwards; shares ``--gradcam-layer``), ``xrai``
(region-ranked integrated gradients over a multi-scale felzenszwalb
oversegmentation; ``--xrai-scales`` sets the segmentation ladder),
``meaningful`` (Fong-Vedaldi learned deletion mask — the whole Adam
optimization runs as ONE jitted fori_loop on device; ``--lm-*`` flags).
"""

from __future__ import annotations

import os

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.saliency import gradient as grad_mod
from network_interpretation_imagenet_tpu.saliency.pipeline import localization_score
from network_interpretation_imagenet_tpu.saliency.viz import save_panels


def main(argv=None):
    p = common.build_parser(__doc__)
    p.add_argument("--method", default="occlusion",
                   choices=["occlusion", "gradient", "grad_input", "xrai", "meaningful",
                            "integrated", "smoothgrad", "rise", "gradcam",
                            "scorecam"])
    common.add_method_flags(p, rise_masks=1000)
    p.add_argument("--bbox_threshold", type=int, default=180)
    args = p.parse_args(argv)
    common.apply_debug_flags(args)

    image, disp, label, gt_bbox = common.resolve_image(args)
    engine = common.build_engine(args)
    pred, _ = engine.predict_one(image)
    target = pred  # when pred == label this IS the label; else explain the prediction

    logits_fn = engine.bundle.logits
    variables = engine.variables
    if args.method == "occlusion":
        heat = grad_mod.occlusion_map(
            logits_fn, variables, image, target,
            patch=args.patch, stride=args.stride, batch=args.mask_batch,
            compute_dtype=engine.compute_dtype,
        )
    elif args.method == "gradient":
        heat = grad_mod.input_gradient(logits_fn, variables, image, target)
    elif args.method == "grad_input":
        heat = grad_mod.grad_times_input(logits_fn, variables, image, target)
    elif args.method == "smoothgrad":
        heat = grad_mod.smoothgrad(
            logits_fn, variables, image, target, samples=args.sg_samples,
            noise_sigma=args.sg_sigma, seed=args.seed,
            magnitude=args.sg_squared,
        )
    elif args.method == "rise":
        heat = grad_mod.rise_map(
            logits_fn, variables, image, target, num_masks=args.rise_masks,
            grid=args.rise_grid, keep_prob=args.rise_keep,
            batch=args.mask_batch, seed=args.seed,
            compute_dtype=engine.compute_dtype,
        )
    elif args.method in ("gradcam", "scorecam"):
        if args.gradcam_layer == "list":
            for name, shape in grad_mod.gradcam_target_layers(
                    engine.bundle, variables, image):
                print(f"{name}  {shape}")
            return 0
        if args.method == "gradcam":
            heat = grad_mod.gradcam(engine.bundle, variables, image, target,
                                    layer=args.gradcam_layer)
        else:
            heat = grad_mod.scorecam(
                engine.bundle, variables, image, target,
                layer=args.gradcam_layer, channels=args.scorecam_channels,
                batch=args.mask_batch, compute_dtype=engine.compute_dtype)
    elif args.method == "xrai":
        from network_interpretation_imagenet_tpu.saliency import xrai
        res = xrai.xrai_saliency(
            logits_fn, variables, image, target, disp,
            steps=args.ig_steps,
            scales=common.parse_xrai_scales(args.xrai_scales))
        heat = res.heatmap
        num_regions = res.num_regions
    elif args.method == "meaningful":
        from network_interpretation_imagenet_tpu.saliency import learned_mask
        lm_res = learned_mask.learned_mask_saliency(
            logits_fn, variables, image, target,
            mask_size=args.lm_mask_size, iters=args.lm_iters,
            l1=args.lm_l1, tv=args.lm_tv, jitter=args.lm_jitter,
            baseline=args.lm_baseline, seed=args.seed,
            compute_dtype=engine.compute_dtype)
        heat = lm_res.heatmap
    else:
        heat = grad_mod.integrated_gradients(
            logits_fn, variables, image, target, steps=args.ig_steps
        )
    heat = np.asarray(heat)

    common.write_heatmap_png(os.path.join(args.out, f"{args.method}_heatmap.png"), heat)
    save_panels(
        os.path.join(args.out, f"{args.method}_result.png"),
        [disp, heat],
        ["Original image", f"{args.method} saliency"],
    )
    payload = {
        "method": args.method,
        "target": int(target),
        "heat_range": [float(heat.min()), float(heat.max())],
    }
    if args.method == "xrai":
        payload["num_regions"] = int(num_regions)
    if args.method == "meaningful":
        payload["prob_original"] = round(lm_res.prob_original, 6)
        payload["prob_masked"] = round(lm_res.prob_masked, 6)
    if gt_bbox is not None:
        iou, pred_box = localization_score(heat, gt_bbox, args.bbox_threshold)
        payload["IOU"] = round(float(iou), 4)
        payload["pred_box_xywh"] = [int(v) for v in pred_box]
    common.emit_result(args.out, f"{args.method}_result.json", payload)


if __name__ == "__main__":
    main()
