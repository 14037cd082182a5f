"""Rank attribution methods by faithfulness on a val-set slice.

Beyond-parity evaluation tool: run EVERY attribution method this framework
ships — the reference's superpixel-window family plus the standard
baselines — over the same images, score each heatmap with the fidelity
metrics (deletion AUC ↓ / insertion AUC ↑, one batched forward per curve;
pointing game where gt boxes exist), and print a ranking. Answers "which
explanation method is most faithful for THIS model?" quantitatively
instead of by eyeballing heatmaps.

Methods: ``window`` (reference random superpixel windows), ``knockout``,
``bo`` (the flagship fused BO loop), ``occlusion``, ``gradient``,
``grad_input``, ``integrated``, ``smoothgrad``, ``rise``, ``gradcam``,
``scorecam``, ``xrai``, ``meaningful``.

    python -m network_interpretation_imagenet_tpu.cli.compare_saliency_methods \
        --arch resnet18 --ckpt weights.msgpack --data <imagenet> \
        --num-images 16 --methods window,bo,integrated,rise,gradcam
"""

from __future__ import annotations

import time

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.saliency import (
    bo_pipeline,
    eval_metrics,
    pipeline,
)
from network_interpretation_imagenet_tpu.saliency import gradient as grad_mod

METHODS = ("window", "knockout", "bo", "occlusion", "gradient",
           "grad_input", "integrated", "smoothgrad", "rise", "gradcam",
           "scorecam", "xrai", "meaningful")


def _heatmap(method: str, engine, image, disp, segments, target: int, args):
    """One method's heatmap for one image (all paths share the engine)."""
    from network_interpretation_imagenet_tpu.config import BOConfig

    logits_fn = engine.bundle.logits
    variables = engine.variables
    if method == "window":
        return pipeline.random_window_saliency(
            engine, image, segments, num_samples=args.num_mask_samples,
            window_fraction=args.window_fraction, seed=args.seed,
            target=target,
        ).heatmap
    if method == "knockout":
        return pipeline.knockout_saliency(
            engine, image, segments, num_samples=args.num_mask_samples,
            num_knockout=args.num_masked_superpixels, seed=args.seed,
            target=target,
        ).heatmap
    if method == "bo":
        out, _ = bo_pipeline.bo_window_saliency(
            engine, image, segments,
            BOConfig(n_iters=args.n_iters, n_pre_samples=args.n_pre_samples),
            window_fraction=args.window_fraction, seed=args.seed,
            target=target, fused=args.fused,
        )
        return out.heatmap
    if method == "occlusion":
        return grad_mod.occlusion_map(
            logits_fn, variables, image, target, patch=args.patch,
            stride=args.stride, batch=args.mask_batch,
            compute_dtype=engine.compute_dtype,
        )
    if method == "gradient":
        return grad_mod.input_gradient(logits_fn, variables, image, target)
    if method == "grad_input":
        return grad_mod.grad_times_input(logits_fn, variables, image, target)
    if method == "integrated":
        return grad_mod.integrated_gradients(
            logits_fn, variables, image, target, steps=args.ig_steps)
    if method == "smoothgrad":
        return grad_mod.smoothgrad(
            logits_fn, variables, image, target, samples=args.sg_samples,
            noise_sigma=args.sg_sigma, seed=args.seed,
            magnitude=args.sg_squared)
    if method == "rise":
        return grad_mod.rise_map(
            logits_fn, variables, image, target, num_masks=args.rise_masks,
            grid=args.rise_grid, keep_prob=args.rise_keep,
            batch=args.mask_batch, seed=args.seed,
            compute_dtype=engine.compute_dtype,
        )
    if method == "gradcam":
        return grad_mod.gradcam(engine.bundle, variables, image, target,
                                layer=args.gradcam_layer)
    if method == "scorecam":
        return grad_mod.scorecam(
            engine.bundle, variables, image, target,
            layer=args.gradcam_layer, channels=args.scorecam_channels,
            batch=args.mask_batch, compute_dtype=engine.compute_dtype)
    if method == "xrai":
        from network_interpretation_imagenet_tpu.saliency import xrai
        return xrai.xrai_saliency(
            logits_fn, variables, image, target, disp,
            steps=args.ig_steps,
            scales=[float(s) for s in args.xrai_scales.split(",")],
        ).heatmap
    if method == "meaningful":
        from network_interpretation_imagenet_tpu.saliency import learned_mask
        return learned_mask.learned_mask_saliency(
            logits_fn, variables, image, target,
            mask_size=args.lm_mask_size, iters=args.lm_iters,
            l1=args.lm_l1, tv=args.lm_tv,
            jitter=args.lm_jitter, baseline=args.lm_baseline,
            seed=args.seed, compute_dtype=engine.compute_dtype,
        ).heatmap
    raise ValueError(f"unknown method {method!r}")


def main(argv=None):
    p = common.build_parser(__doc__)
    p.add_argument("--methods", default=",".join(METHODS),
                   help=f"comma list from {','.join(METHODS)}")
    p.add_argument("--num-images", type=int, default=8)
    p.add_argument("--fidelity-steps", type=int, default=32)
    common.add_method_flags(p)
    common.add_bo_flags(p)
    args = p.parse_args(argv)
    common.apply_debug_flags(args)

    methods = list(dict.fromkeys(
        m.strip() for m in args.methods.split(",") if m.strip()))
    unknown = [m for m in methods if m not in METHODS]
    if unknown:
        p.error(f"unknown methods {unknown}; choose from {METHODS}")

    engine = common.build_engine(args)
    seg_cfg = common.segment_config(args)

    rows = {m: [] for m in methods}
    times = {m: 0.0 for m in methods}
    used = 0
    # --eval_img_index is the 1-based START of the slice (reference flag
    # semantics, common.resolve_image does ds[idx-1]); iterate base + i like
    # the sibling CLIs so image 0 isn't double-counted by the idx-1 clamp.
    base_index = args.eval_img_index
    for i in range(args.num_images):
        args.eval_img_index = base_index + i
        image, disp, label, gt_bbox = common.resolve_image(args)
        target, _ = engine.predict_one(image)
        if label is not None and int(target) != int(label):
            continue  # reference semantics: explain correct predictions
        segments = common.segment_display(disp, seg_cfg)
        used += 1
        for m in methods:
            t0 = time.perf_counter()
            heat = np.asarray(_heatmap(m, engine, image, disp, segments,
                                       int(target), args))
            times[m] += time.perf_counter() - t0
            d = eval_metrics.deletion_insertion_auc(
                engine, image, heat, int(target), steps=args.fidelity_steps)
            row = {"deletion_auc": float(d["deletion_auc"]),
                   "insertion_auc": float(d["insertion_auc"])}
            if gt_bbox is not None:
                row["pointing_hit"] = bool(
                    eval_metrics.pointing_game(heat, gt_bbox))
            rows[m].append(row)

    if not used:
        print("no correctly-classified images in the slice")
        return 1

    summary = {}
    for m in methods:
        rs = rows[m]
        entry = {
            "images": len(rs),
            "mean_deletion_auc": round(
                float(np.mean([r["deletion_auc"] for r in rs])), 5),
            "mean_insertion_auc": round(
                float(np.mean([r["insertion_auc"] for r in rs])), 5),
            "seconds_per_image": round(times[m] / max(len(rs), 1), 3),
        }
        hits = [r["pointing_hit"] for r in rs if "pointing_hit" in r]
        if hits:
            entry["pointing_game_acc"] = round(float(np.mean(hits)), 4)
        summary[m] = entry

    # Rank by the combined fidelity margin (insertion − deletion, higher
    # is better on both axes).
    order = sorted(methods, key=lambda m: summary[m]["mean_insertion_auc"]
                   - summary[m]["mean_deletion_auc"], reverse=True)
    header = f"{'method':>12}  {'del_auc↓':>9}  {'ins_auc↑':>9}  {'s/img':>7}"
    if any("pointing_game_acc" in summary[m] for m in methods):
        header += f"  {'point':>6}"
    print(header)
    for m in order:
        s = summary[m]
        line = (f"{m:>12}  {s['mean_deletion_auc']:>9.4f}  "
                f"{s['mean_insertion_auc']:>9.4f}  "
                f"{s['seconds_per_image']:>7.2f}")
        if "pointing_game_acc" in s:
            line += f"  {s['pointing_game_acc']:>6.2f}"
        print(line)

    common.emit_result(args.out, "method_comparison.json", {
        "images_used": used,
        "fidelity_steps": args.fidelity_steps,
        "ranking": order,
        "methods": summary,
    })
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
