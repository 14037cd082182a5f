"""Rank attribution methods by faithfulness on a val-set slice.

Beyond-parity evaluation tool: run EVERY attribution method this framework
ships — the reference's superpixel-window family plus the standard
baselines — over the same images, score each heatmap with the fidelity
metrics (deletion AUC ↓ / insertion AUC ↑, one batched forward per curve;
pointing game where gt boxes exist), and print a ranking. Answers "which
explanation method is most faithful for THIS model?" quantitatively
instead of by eyeballing heatmaps.

Methods: ``window`` (reference random superpixel windows), ``knockout``,
``bo`` (the flagship fused BO loop), ``gp`` (window labels smoothed by the
exact Kronecker pixel-GP posterior mean — the reference's KISS-GP
regression surrogate, ``gp_superpixel_data_imagenet.py:407-523``),
``gp_cls`` (grid-inducing Bernoulli GP survive-probability map,
``gp_classification.py:139-264``), ``occlusion``, ``gradient``,
``grad_input``, ``integrated``, ``smoothgrad``, ``rise``, ``gradcam``,
``scorecam``, ``xrai``, ``meaningful``.

Ranking comes with paired-bootstrap 95% CIs over images: methods are
grouped into tiers, and a tier boundary is drawn only where the paired
bootstrap separates adjacent methods (P(margin_A > margin_B) ≥ the
``--tier-sep`` threshold). Point-estimate ranks inside a tier are noise.

    python -m network_interpretation_imagenet_tpu.cli.compare_saliency_methods \
        --arch resnet18 --ckpt weights.msgpack --data <imagenet> \
        --num-images 16 --methods window,bo,integrated,rise,gradcam
"""

from __future__ import annotations

import os
import time

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.saliency import (
    bo_pipeline,
    eval_metrics,
    pipeline,
)
from network_interpretation_imagenet_tpu.saliency import gradient as grad_mod

METHODS = ("window", "knockout", "bo", "field", "gp", "gp_cls", "occlusion",
           "gradient", "grad_input", "integrated", "smoothgrad", "rise",
           "gradcam", "scorecam", "xrai", "meaningful")


def _field_info(engine, image, segments, target: int, args,
                kind: "str | None" = None,
                soft: "bool | None" = None):
    """``(field, degenerate)`` — the summed-mask-label field that is the
    GP surrogates' training data and the ``window`` method's heatmap.

    ``kind``: ``"window"`` (contiguous 40%-window masks, the reference's
    ImageNet field) or ``"knockout"`` (remove ``--num_masked_superpixels``
    segments per mask, the reference's CIFAR/MNIST GP field,
    ``generate_gp_training_data_cifar.py:307-342``); ``None`` follows
    ``--gp-field``. Cached per image (``args._field_cache``, reset by the
    image loop): ``window``, ``gp`` and ``gp_cls`` train on the SAME
    field, so each kind is computed once, not three times — the first
    consumer in method order pays the mask evals.

    ``degenerate`` is judged on the LABELS, not the summed field: when
    every mask gets the same label (all die — the synthetic-image window
    norm — or all survive), the summed field carries only mask-coverage
    counts, i.e. zero model signal. An all-survive knockout field still
    has ptp>0 (coverage noise), which a field-ptp check would miss."""
    from network_interpretation_imagenet_tpu.ops import aggregate

    kind = kind or getattr(args, "gp_field", "window")
    if soft is None:
        soft = getattr(args, "gp_labels", "hard") == "soft"
    ck = (kind, soft)
    cache = getattr(args, "_field_cache", None)
    if cache is not None and ck in cache:
        return cache[ck]
    if kind == "knockout":
        out = pipeline.knockout_saliency(
            engine, image, segments, num_samples=args.num_mask_samples,
            num_knockout=args.num_masked_superpixels, seed=args.seed,
            target=target,
        )
        if soft:
            # Soft labels (beyond-reference extension, RISE-style): weight
            # each mask by the target-class probability instead of the
            # binary survive bit — the field keeps carrying signal even
            # when NO mask flips the argmax (the hard-label degeneracy).
            import jax.numpy as jnp

            field = np.asarray(aggregate.summed_label_heatmap(
                jnp.asarray(out.masks),
                jnp.asarray(out.eval.prob_target))).astype(np.float32)
        else:
            field = out.heatmap.astype(np.float32)
    else:
        out = pipeline.random_window_saliency(
            engine, image, segments, num_samples=args.num_mask_samples,
            window_fraction=args.window_fraction, seed=args.seed,
            target=target,
        )
        if soft:
            field = aggregate.summed_superpixel_labels_np(
                out.segments, out.firsts, out.width,
                out.eval.prob_target).astype(np.float32)
        else:
            field = out.heatmap.astype(np.float32)
    labels = out.eval.prob_target if soft else out.eval.labels
    info = (field, bool(np.ptp(np.asarray(labels)) == 0))
    if cache is not None:
        cache[ck] = info
    return info


def _field_heat(engine, image, segments, target: int, args,
                kind: "str | None" = None,
                soft: "bool | None" = None) -> np.ndarray:
    return _field_info(engine, image, segments, target, args, kind, soft)[0]


def _heatmap(method: str, engine, image, disp, segments, target: int, args):
    """One method's heatmap for one image (all paths share the engine)."""
    from network_interpretation_imagenet_tpu.config import BOConfig

    logits_fn = engine.bundle.logits
    variables = engine.variables
    if method == "window":
        # The reference method itself: always hard labels, window masks.
        return _field_heat(engine, image, segments, target, args,
                           kind="window", soft=False)
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
    if method == "field":
        # The RAW training field under --gp-field/--gp-labels, as a
        # saliency map. This is the ablation baseline for the GP rows:
        # gp trains on exactly this array, so margin(gp) − margin(field)
        # isolates what GP smoothing itself contributes — the reference's
        # central untested hypothesis (gp_superpixel_data_imagenet.py:
        # 407-523 smooths this field and claims a better map).
        return _field_heat(engine, image, segments, target, args)
    if method == "gp":
        # The reference's distinctive move: smooth the summed mask-label
        # field with a pixel-grid GP and read the posterior MEAN as the
        # saliency map (gp_superpixel_data_imagenet.py:407-523,
        # gp_regression.py:227-282). Here the KISS-GP approximation is
        # replaced by the exact Kronecker-eigen solve (gp/kron.py).
        from network_interpretation_imagenet_tpu.gp import kron

        heat = _field_heat(engine, image, segments, target, args)
        params, _ = kron.fit_adam(heat, iters=args.gp_iters, lr=args.gp_lr)
        mean, _ = kron.posterior(params, heat)
        return np.asarray(mean)
    if method == "gp_cls":
        # Bernoulli-likelihood variant (gp_classification.py:139-264):
        # median-binarized labels, grid-inducing variational GP, probit
        # survive-probability map as the heatmap.
        from network_interpretation_imagenet_tpu.gp import variational as vgp

        heat = _field_heat(engine, image, segments, target, args)
        h, w = heat.shape
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        coords = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float32)
        flat = heat.ravel()
        y01 = (flat > np.median(flat)).astype(np.float32)
        train_idx = np.arange(len(flat))
        if len(train_idx) > args.gp_train_subsample:
            rng = np.random.RandomState(args.seed)
            train_idx = rng.choice(
                train_idx, args.gp_train_subsample, replace=False)
        model = vgp.init_model(max(h, w), grid_size=args.gp_grid_size)
        model, _ = vgp.fit_adam(
            model, coords[train_idx], y01[train_idx],
            iters=args.gp_cls_iters, lr=args.gp_lr)
        probs = np.asarray(vgp.predict_proba(model, coords))
        return probs.reshape(h, w)
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
            scales=common.parse_xrai_scales(args.xrai_scales),
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
    g = p.add_argument_group("gp surrogate methods")
    g.add_argument("--gp_iters", type=int, default=20,
                   help="gp: Adam iters for the Kronecker pixel-GP "
                        "(reference gp_regression.py:179-224)")
    g.add_argument("--gp_lr", type=float, default=0.1)
    g.add_argument("--gp-cls-iters", type=int, default=30,
                   help="gp_cls: ELBO Adam iters "
                        "(reference gp_classification.py:176)")
    g.add_argument("--gp-grid-size", type=int, default=10,
                   help="gp_cls: inducing grid side "
                        "(reference gp_classification.py:141)")
    g.add_argument("--gp-train-subsample", type=int, default=4096,
                   help="gp_cls: max training pixels")
    g.add_argument("--gp-labels", default="hard",
                   choices=["hard", "soft"],
                   help="mask labels the gp/gp_cls training field sums: "
                        "'hard' is the reference's binary survive bit; "
                        "'soft' (beyond-reference, RISE-style) weights "
                        "each mask by the target-class probability, so "
                        "the field keeps carrying signal on images where "
                        "no mask flips the argmax (see the 'deg' column)")
    g.add_argument("--gp-field", default="window",
                   choices=["window", "knockout"],
                   help="mask family the gp/gp_cls surrogates train on: "
                        "'window' mirrors the reference's ImageNet "
                        "pipelines (contiguous 40%% windows), 'knockout' "
                        "its CIFAR/MNIST GP pipelines (remove "
                        "--num_masked_superpixels segments per mask, "
                        "generate_gp_training_data_cifar.py:307-342) — "
                        "knockout labels stay informative on images where "
                        "no window mask survives")
    p.add_argument("--jpeg-dir", default=None, metavar="DIR",
                   help="score real JPEG/PNG files (recursive) instead of "
                        "--synthetic/--data: each image is resized + "
                        "center-cropped to the dataset's input size "
                        "(torchvision eval arithmetic) and normalized "
                        "with the dataset's statistics; targets are the "
                        "model's own argmax (no labels, no skip rule). "
                        "Meant as a SECONDARY table on real photographs "
                        "— e.g. the committed tests/fixtures/imagenet_loc "
                        "JPEGs through the trained CIFAR ResNet-56 — not "
                        "as the primary in-domain ranking")
    p.add_argument("--skip-degenerate", action="store_true",
                   help="skip images where the --gp-field label field is "
                        "constant (e.g. no sampled mask preserved the "
                        "prediction): on such images the field-trained "
                        "methods emit a CONSTANT heatmap and score the "
                        "pixel-index-order baseline, not the method. "
                        "Scanning continues past --num-images (up to 4x) "
                        "until --num-images informative images are found")
    g = p.add_argument_group("statistics")
    g.add_argument("--bootstrap", type=int, default=2000,
                   help="paired bootstrap resamples over images for the "
                        "margin CIs and tier separation (0 disables)")
    g.add_argument("--tier-sep", type=float, default=0.975,
                   help="P(margin_A > margin_B) needed to draw a tier "
                        "boundary between adjacent methods")
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

    jpegs: list = []
    if args.jpeg_dir:
        import glob as _glob

        from network_interpretation_imagenet_tpu.config import DATASETS

        exts = ("*.JPEG", "*.jpeg", "*.jpg", "*.png")
        jpegs = sorted(
            f for e in exts
            for f in _glob.glob(os.path.join(args.jpeg_dir, "**", e),
                                recursive=True))
        if not jpegs:
            p.error(f"--jpeg-dir {args.jpeg_dir!r}: no JPEG/PNG files found")
        spec = DATASETS[args.dataset]

        def _load_jpeg(path):
            from PIL import Image

            from network_interpretation_imagenet_tpu.data.transform import (
                pil_eval_transform,
            )
            from network_interpretation_imagenet_tpu.ops import preprocess

            import jax.numpy as jnp

            pil = Image.open(path).convert("RGB")
            img = pil_eval_transform(pil, crop=spec.image_size,
                                     mean=spec.mean, std=spec.std)
            if spec.channels == 1:
                img = img.mean(axis=2, keepdims=True).astype(np.float32)
            disp = np.asarray(preprocess.to_display_uint8(jnp.asarray(img)))
            if spec.channels == 1:
                disp = disp[:, :, 0]
            return img, disp

    rows = {m: [] for m in methods}
    times = {m: 0.0 for m in methods}
    used = 0
    # --eval_img_index is the 1-based START of the slice (reference flag
    # semantics, common.resolve_image does ds[idx-1]); iterate base + i like
    # the sibling CLIs so image 0 isn't double-counted by the idx-1 clamp.
    base_index = args.eval_img_index
    n_images = (min(args.num_images, len(jpegs)) if jpegs
                else args.num_images)
    # With --skip-degenerate, keep scanning (bounded at 4x the request)
    # until n_images INFORMATIVE images are scored.
    scan_limit = (min(4 * n_images, len(jpegs)) if jpegs else 4 * n_images
                  ) if args.skip_degenerate else n_images
    skipped_degenerate = 0
    for i in range(scan_limit):
        if used >= n_images:
            break
        args.eval_img_index = base_index + i
        if jpegs:
            image, disp = _load_jpeg(jpegs[i])
            label, gt_bbox = None, None
        else:
            image, disp, label, gt_bbox = common.resolve_image(args)
        target, _ = engine.predict_one(image)
        if label is not None and int(target) != int(label):
            continue  # reference semantics: explain correct predictions
        segments = common.segment_display(disp, seg_cfg)
        args._field_cache = {}  # per-image cache for window/gp/gp_cls
        if args.skip_degenerate:
            # Applicability filter (analogous to the reference's
            # skip-misclassified rule): the mask-label family measures
            # nothing on images where NO sampled window preserves the
            # prediction (summed labels identically zero -> constant
            # heatmap -> pixel-index-order fidelity baseline). Condition
            # the study on images with mask signal so mask-family ranks
            # (and the GP-smoothing question) are measured, not defaulted.
            if _field_info(engine, image, segments, int(target), args)[1]:
                skipped_degenerate += 1
                continue
        used += 1
        for m in methods:
            t0 = time.perf_counter()
            heat = np.asarray(_heatmap(m, engine, image, disp, segments,
                                       int(target), args))
            times[m] += time.perf_counter() - t0
            d = eval_metrics.deletion_insertion_auc(
                engine, image, heat, int(target), steps=args.fidelity_steps)
            row = {"deletion_auc": float(d["deletion_auc"]),
                   "insertion_auc": float(d["insertion_auc"]),
                   # A CONSTANT heatmap carries no information: its
                   # fidelity curve is the pixel-index-order baseline.
                   # The mask-label family degenerates this way whenever
                   # NO sampled mask preserves the prediction (summed
                   # labels identically zero — common on synthetic
                   # images, where a 40%-window crop rarely survives),
                   # and a GP smoothed over a zero field is still zero.
                   # Count it so the table can say which rows measured
                   # the METHOD and which measured the baseline. For the
                   # field-trained trio the TRAINING LABELS decide
                   # (_field_info): gp_cls on a constant-label field
                   # emits a near-constant probit map whose float noise
                   # dodges the exact-ptp check but is equally
                   # uninformative, and an all-survive field has ptp>0
                   # (mask-coverage counts) while still carrying zero
                   # model signal.
                   "degenerate": bool(np.ptp(heat) == 0) or (
                       m in ("field", "gp", "gp_cls")
                       and _field_info(engine, image, segments,
                                       int(target), args)[1]) or (
                       m == "window"
                       and _field_info(engine, image, segments,
                                       int(target), args,
                                       kind="window", soft=False)[1])}
            if gt_bbox is not None:
                row["pointing_hit"] = bool(
                    eval_metrics.pointing_game(heat, gt_bbox))
            rows[m].append(row)

    if not used:
        if skipped_degenerate:
            print(f"no scoreable images: {skipped_degenerate} scanned "
                  "images all lacked mask signal (--skip-degenerate) "
                  "or were misclassified")
        else:
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
            "degenerate_images": int(sum(r["degenerate"] for r in rs)),
        }
        hits = [r["pointing_hit"] for r in rs if "pointing_hit" in r]
        if hits:
            entry["pointing_game_acc"] = round(float(np.mean(hits)), 4)
        summary[m] = entry

    # Rank by the combined fidelity margin (insertion − deletion, higher
    # is better on both axes).
    order = sorted(methods, key=lambda m: summary[m]["mean_insertion_auc"]
                   - summary[m]["mean_deletion_auc"], reverse=True)

    # Paired bootstrap over images: every method saw the SAME image set, so
    # resampling one index vector per replicate preserves the per-image
    # pairing — CIs on each mean margin AND P(margin_A > margin_B) for
    # adjacent pairs in the ranking come from the same replicates. Rank
    # boundaries are drawn only where that probability clears --tier-sep;
    # everything else is a tie (a tier), not a rank.
    margins = {
        m: np.array([r["insertion_auc"] - r["deletion_auc"]
                     for r in rows[m]])
        for m in methods
    }
    tiers: list[list[str]] = [[order[0]]] if order else []
    seps: dict[str, float] = {}
    if args.bootstrap > 0 and used > 1:
        rng = np.random.RandomState(args.seed)
        idx = rng.randint(0, used, size=(args.bootstrap, used))
        boot = {m: margins[m][idx].mean(axis=1) for m in methods}
        for m in methods:
            lo, hi = np.percentile(boot[m], [2.5, 97.5])
            summary[m]["margin_mean"] = round(float(margins[m].mean()), 5)
            summary[m]["margin_ci95"] = [round(float(lo), 5),
                                         round(float(hi), 5)]
        for a, b in zip(order, order[1:]):
            p_gt = float(np.mean(boot[a] > boot[b]))
            seps[f"{a}>{b}"] = round(p_gt, 4)
            if p_gt >= args.tier_sep:
                tiers.append([b])
            else:
                tiers[-1].append(b)
    else:
        tiers = [list(order)]
        for m in methods:
            summary[m]["margin_mean"] = round(float(margins[m].mean()), 5)

    tier_of = {m: i + 1 for i, t in enumerate(tiers) for m in t}
    any_deg = any(summary[m]["degenerate_images"] for m in methods)
    header = (f"{'tier':>4}  {'method':>12}  {'del_auc↓':>9}  "
              f"{'ins_auc↑':>9}  {'margin':>7}  {'ci95':>18}  {'s/img':>7}")
    if any_deg:
        header += f"  {'deg':>7}"
    if any("pointing_game_acc" in summary[m] for m in methods):
        header += f"  {'point':>6}"
    print(header)
    for m in order:
        s = summary[m]
        ci = s.get("margin_ci95")
        ci_s = f"[{ci[0]:+.3f},{ci[1]:+.3f}]" if ci else "-"
        line = (f"{tier_of[m]:>4}  {m:>12}  {s['mean_deletion_auc']:>9.4f}  "
                f"{s['mean_insertion_auc']:>9.4f}  "
                f"{s['margin_mean']:>+7.3f}  {ci_s:>18}  "
                f"{s['seconds_per_image']:>7.2f}")
        if any_deg:
            line += f"  {s['degenerate_images']:>3d}/{s['images']:<3d}"
        if "pointing_game_acc" in s:
            line += f"  {s['pointing_game_acc']:>6.2f}"
        print(line)
    if len(tiers) < len(order):
        print("(methods sharing a tier are NOT separated at "
              f"P≥{args.tier_sep:g} by the paired bootstrap — their "
              "in-tier order is noise)")
    if any_deg:
        print("(deg = images where the method's heatmap was CONSTANT — "
              "no information; those rows scored the pixel-index-order "
              "baseline, not the method. The mask-label family degenerates "
              "when no sampled mask preserves the prediction.)")

    if args.skip_degenerate:
        print(f"(--skip-degenerate: {skipped_degenerate} images without "
              "mask signal skipped during the scan)")
    common.emit_result(args.out, "method_comparison.json", {
        "images_used": used,
        "skipped_degenerate": skipped_degenerate,
        "gp_field": args.gp_field,
        "gp_labels": args.gp_labels,
        "source": ("jpeg-dir" if jpegs else
                   "synthetic" if (args.synthetic or not args.data)
                   else "dataset"),
        "fidelity_steps": args.fidelity_steps,
        "ranking": order,
        "tiers": tiers,
        "adjacent_separation": seps,
        "bootstrap": args.bootstrap,
        "methods": summary,
    })
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
