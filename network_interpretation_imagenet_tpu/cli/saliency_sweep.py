"""Val-set saliency sweep CLI (BASELINE.json config 5: full val-set saliency
sweep, data-parallel): run superpixel-mask saliency over many images,
reporting mean IOU / survival / p50 latency / evals-per-second; per-image
failures and misclassifications are skipped and counted, not fatal
(the reference aborts — ``bayesian_active_learning_imagenet.py:221``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.saliency.sweep import saliency_sweep
from network_interpretation_imagenet_tpu.utils.logging import PhaseLogger


def _synthetic_dataset(args, spec, n, raw_u8: bool = False):
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.data import synthetic_imagenet_image
    from network_interpretation_imagenet_tpu.ops import preprocess

    for i in range(n):
        base = synthetic_imagenet_image(args.seed + i, spec.image_size)
        if spec.channels == 1:
            base = base[:, :, :1]
        if raw_u8:  # uint8 wire: /255 + normalize happen ON DEVICE
            yield np.round(base * 255.0).astype(np.uint8), None, None
            continue
        img = np.asarray(preprocess.normalize(jnp.asarray(base), spec.mean, spec.std))
        yield img, None, None


def _gp_surrogate_pass(args, res, mesh, payload, key, base_chunk, fields_fn):
    """Shared structure of the sweep's GP-surrogate passes (regression +
    classification): stack the retained heatmaps, run ``fields_fn(heats,
    chunk)`` — chunked batched fits; the chunk scales with the mesh's data
    axis so each device still sees ~``base_chunk`` grids per program —
    write a rank-suffixed npz on multihost (every rank runs its stride; a
    shared filename would race, and the ``indices`` field lets per-rank
    artifacts concatenate offline), and register the payload entry."""
    import os
    import time

    idxs = sorted(res.heatmaps)
    heats = np.stack([res.heatmaps[i] for i in idxs]).astype(np.float32)
    chunk = base_chunk
    if mesh is not None:
        chunk *= int(mesh.shape["data"])
    t0 = time.perf_counter()
    fields = fields_fn(heats, chunk)
    seconds = time.perf_counter() - t0
    os.makedirs(args.out, exist_ok=True)
    artifact = f"{key}.npz"
    if args.multihost:
        import jax as _jax

        if _jax.process_count() > 1:
            artifact = f"{key}.rank{_jax.process_index()}.npz"
    np.savez_compressed(
        os.path.join(args.out, artifact),
        indices=np.asarray(idxs),
        heatmaps=heats,
        **fields,
    )
    payload[key] = {
        "images": len(idxs),
        "seconds": round(seconds, 3),
        "artifact": artifact,
    }


def main(argv=None):
    p = common.build_parser(__doc__)
    p.add_argument("--num-images", type=int, default=8)
    p.add_argument("--bbox_threshold", type=int, default=180)
    p.add_argument("--trace", action="store_true", help="emit per-phase JSON logs")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each image's mask batch over all devices")
    p.add_argument("--image-batch", type=int, default=1,
                   help="fuse this many images' mask banks into one forward")
    p.add_argument("--mode", default="window", choices=["window", "knockout"],
                   help="mask family: contiguous windows (ImageNet reference "
                        "semantics) or random-segment knockouts (MNIST/CIFAR "
                        "reference semantics, 1000 masks/image)")
    p.add_argument("--num-knockout", type=int, default=1,
                   help="(--mode knockout) segments zeroed per mask "
                        "(reference: 1 for MNIST, 5 for CIFAR)")
    common.add_gp_flags(p)
    p.add_argument("--gp-heatmaps", action="store_true",
                   help="fit an exact Kronecker pixel-GP to every explained "
                        "image's heatmap in ONE vmapped program (mean + "
                        "uncertainty maps → gp_heatmaps.npz)")
    p.add_argument("--gp-class-heatmaps", action="store_true",
                   help="fit the grid-inducing probit CLASSIFICATION GP to "
                        "every explained image's median-binarized heatmap "
                        "in ONE vmapped program (survive-probability maps → "
                        "gp_class_heatmaps.npz; the reference's "
                        "gp_classification.py at sweep scale)")
    p.add_argument("--gp-class-iters", type=int, default=30,
                   help="(--gp-class-heatmaps) ELBO Adam iterations — the "
                        "reference's gp_classification count (30; --gp_iters "
                        "stays the regression pass's 20)")
    p.add_argument("--bo", action="store_true",
                   help="drive the sweep with the FLAGSHIP GP-EI BO path "
                        "(batched vmapped fused loops per flush) instead of "
                        "random window masks")
    p.add_argument("--attribute", default=None, metavar="METHOD",
                   choices=["gradient", "grad_input", "integrated",
                            "smoothgrad", "gradcam", "meaningful", "xrai",
                            "occlusion", "rise", "scorecam"],
                   help="drive the sweep with a per-image attribution "
                        "method instead of masks: gradient-family methods "
                        "run every --image-batch images' backward passes as "
                        "ONE vmapped program (no segmentation step; "
                        "hyperparameters via --ig-steps/--sg-samples/"
                        "--sg-sigma/--gradcam-layer); 'meaningful' = "
                        "Fong-Vedaldi learned deletion masks, N Adam loops "
                        "in one program, --lm-* flags; occlusion/rise/"
                        "scorecam dispatch one jitted mask-batched program "
                        "per image (--patch/--stride, --rise-*, "
                        "--scorecam-channels, --attr-mask-batch)")
    p.add_argument("--attr-mask-batch", type=int, default=None,
                   help="(--attribute occlusion/rise/scorecam) per-image "
                        "forward chunk; default keeps each method's "
                        "one-shot default (occlusion/scorecam 64, rise "
                        "250). For rise this is part of the RNG stream — "
                        "a method hyperparameter, not a tuning knob")
    common.add_method_flags(p)
    common.add_bo_flags(p)
    p.add_argument("--proposals-per-iter", type=int, default=1,
                   help="(--bo) q-batched BO proposals per GP refit")
    p.add_argument("--fidelity", action="store_true",
                   help="score every explained image's heatmap for "
                        "faithfulness: deletion/insertion AUC (one batched "
                        "forward per image) + pointing game where gt boxes "
                        "exist; means land in sweep_result.json")
    p.add_argument("--fidelity-steps", type=int, default=32,
                   help="(--fidelity) curve resolution")
    p.add_argument("--uint8-wire", action="store_true",
                   help="(--bo / --attribute) upload images as RAW uint8 "
                        "(1/4 the f32 bytes per flush) and run /255 + "
                        "normalize ON DEVICE — the fused decode→normalize "
                        "split; only the batched-flush lanes support it")
    p.add_argument("--heatmap-wire", default="f32",
                   choices=("f32", "f16", "u8"),
                   help="(--attribute, gradient-family methods) fetch each "
                        "flush's heatmaps as f16 (half the bytes, <=2^-11 "
                        "rounding) or min-max u8 (quarter; bbox/IOU exact, "
                        "fidelity ranks coarsen to 256 levels) instead of "
                        "lossless f32 — the fetch is the lane's largest "
                        "transfer (docs/PERFORMANCE.md)")
    p.add_argument("--journal", default=None, metavar="PATH",
                   help="per-image outcome journal (JSONL) enabling --resume "
                        "(default <out>/sweep_journal.jsonl; rank-suffixed "
                        "on --multihost)")
    p.add_argument("--no-journal", dest="journal", action="store_const",
                   const="", help="disable the sweep journal")
    p.add_argument("--resume", action="store_true",
                   help="restore finished images from the journal and sweep "
                        "only the rest (per-image seeds derive from dataset "
                        "indices, so results match an uninterrupted run)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-process (DCN) sweep: initialize "
                        "jax.distributed from the environment (or the "
                        "--coordinator/--num-processes/--process-id flags), "
                        "stride the image axis across processes, write "
                        "per-rank results, and merge on rank 0")
    p.add_argument("--coordinator", default=None,
                   help="(--multihost) coordinator address host:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)
    if args.bo and args.attribute:
        p.error("--bo and --attribute are mutually exclusive sweep drivers")
    if args.uint8_wire and not (args.bo or args.attribute):
        p.error("--uint8-wire needs a batched-flush lane (--bo/--attribute); "
                "the window/knockout driver normalizes host-side")
    if args.heatmap_wire != "f32" and not args.attribute:
        p.error("--heatmap-wire applies to --attribute sweeps only")
    if args.heatmap_wire != "f32" and args.attribute == "meaningful":
        p.error("--heatmap-wire: 'meaningful' keeps its f32 tuple state")
    if args.heatmap_wire == "u8" and args.attribute == "xrai":
        p.error("--heatmap-wire=u8 destroys the sign of xrai's "
                "attributions; use f16 (sign-preserving) or f32")
    common.apply_debug_flags(args)

    multihost_mod = None
    if args.multihost:
        from network_interpretation_imagenet_tpu.parallel import (
            multihost as multihost_mod,
        )

        if not multihost_mod.initialize_distributed(
            args.coordinator, args.num_processes, args.process_id
        ):
            import sys as _sys

            # No coordinator info anywhere: refusing beats N hosts each
            # sweeping the FULL image set as separate "rank 0"s racing
            # on --out.
            print("error: --multihost could not initialize jax.distributed "
                  "— pass --coordinator/--num-processes/--process-id or set "
                  "JAX_COORDINATOR_ADDRESS", file=_sys.stderr)
            return 2
        import jax as _jax

        if _jax.process_count() > 1:
            # initialize() is a barrier, so clearing each rank's own stale
            # file HERE guarantees rank 0's merge never reads a leftover
            # sweep_result.rank*.json from a previous run in the same --out.
            multihost_mod.clear_stale_rank_result(args.out)

    from network_interpretation_imagenet_tpu.config import DATASETS

    spec = DATASETS[args.dataset]
    engine = common.build_engine(args)

    if args.data and args.dataset == "imagenet":
        import os

        if os.path.exists(os.path.join(args.data, "LOC_val_solution.csv")):
            from network_interpretation_imagenet_tpu.data import (
                ImagenetLocalizationDataset,
            )

            dataset = ImagenetLocalizationDataset(
                args.data, raw_u8=args.uint8_wire)
        else:  # plain ImageFolder layout (no gt boxes → no IOU column)
            from network_interpretation_imagenet_tpu.data.image_folder import (
                ImageFolderDataset,
            )

            dataset = ImageFolderDataset(args.data, raw_u8=args.uint8_wire)
    else:
        dataset = _synthetic_dataset(args, spec, args.num_images,
                                     raw_u8=args.uint8_wire)

    dataset_indices = None
    if args.multihost:
        import jax

        # Image-axis DCN split: this process sweeps a disjoint stride; only
        # merged scalar metrics/rows cross hosts (via the shared filesystem).
        dataset_indices = list(
            multihost_mod.process_strided_indices(args.num_images)
        )

    journal = None
    if args.journal != "":  # "" = --no-journal
        import os as _os

        from network_interpretation_imagenet_tpu.saliency.journal import (
            SweepJournal,
        )

        jpath = args.journal or _os.path.join(args.out, "sweep_journal.jsonl")
        if args.multihost:
            import jax as _jax

            if _jax.process_count() > 1:
                # Each rank journals (and resumes) only its own stride.
                root, ext = _os.path.splitext(jpath)
                jpath = f"{root}.rank{_jax.process_index()}{ext}"
        # Row-affecting settings: a --resume under different settings would
        # silently average incomparable rows, so the journal refuses it.
        jconfig = {
            "bo": bool(args.bo), "mode": args.mode,
            "num_mask_samples": args.num_mask_samples,
            "window_fraction": args.window_fraction,
            "num_knockout": args.num_knockout,
            "segmenter": dataclasses.asdict(common.segment_config(args)),
            "seed": args.seed, "dataset": args.dataset, "arch": args.arch,
            "bbox_threshold": args.bbox_threshold,
            "fidelity_steps": args.fidelity_steps if args.fidelity else 0,
            "n_iters": args.n_iters, "n_pre_samples": args.n_pre_samples,
            "proposals_per_iter": args.proposals_per_iter,
            # Heatmap retention is row-affecting too: resuming a journal that
            # never saved .npy heatmaps under --gp-heatmaps would silently fit
            # the GP pass on only the newly-explained images.
            "keep_heatmaps": bool(args.gp_heatmaps or args.gp_class_heatmaps),
        }
        if args.uint8_wire:
            # Row-affecting: device-vs-host normalize differs by ulps, which
            # forks the discrete BO trajectory — resuming a f32 journal on
            # the u8 wire would mix incomparable rows. Stamped only when on,
            # so pre-existing journals keep resuming.
            jconfig["uint8_wire"] = True
        if args.attribute:
            # Only attribution sweeps stamp these keys — adding them to
            # every jconfig would make journals written before this flag
            # existed refuse to resume unchanged window/BO sweeps.
            jconfig.update({
                "attribute": args.attribute,
                "ig_steps": args.ig_steps, "sg_samples": args.sg_samples,
                "sg_sigma": args.sg_sigma,
                "sg_squared": bool(args.sg_squared),
                "gradcam_layer": args.gradcam_layer,
            })
            if args.heatmap_wire != "f32":
                # Row-affecting (quantized heatmaps/fidelity); stamped only
                # when non-default so pre-existing journals keep resuming.
                jconfig["heatmap_wire"] = args.heatmap_wire
            if args.attribute == "xrai":
                jconfig.update({"xrai_scales": args.xrai_scales})
            if args.attribute == "occlusion":
                jconfig.update({"patch": args.patch,
                                "stride": args.stride})
            if args.attribute == "rise":
                # The chunk is part of rise's RNG stream → row-affecting.
                jconfig.update({
                    "rise_masks": args.rise_masks,
                    "rise_grid": args.rise_grid,
                    "rise_keep": args.rise_keep,
                    "attr_mask_batch": args.attr_mask_batch,
                })
            if args.attribute == "scorecam":
                jconfig.update({
                    "scorecam_channels": args.scorecam_channels,
                })
            if args.attribute == "meaningful":
                jconfig.update({
                    "lm_mask_size": args.lm_mask_size,
                    "lm_iters": args.lm_iters, "lm_l1": args.lm_l1,
                    "lm_tv": args.lm_tv, "lm_jitter": args.lm_jitter,
                    "lm_baseline": args.lm_baseline,
                })
        journal = SweepJournal(
            jpath, resume=args.resume,
            keep_heatmaps=args.gp_heatmaps or args.gp_class_heatmaps,
            config=jconfig,
        )

    # Decode-ahead: worker threads keep `buffer` dataset[i] calls in flight
    # (reference DataLoader num_workers); serial for synthetic/iterables.
    from network_interpretation_imagenet_tpu.data.prefetch import prefetch

    if hasattr(dataset, "__getitem__"):
        n_total = min(len(dataset), args.num_images)
        base = (dataset_indices if dataset_indices is not None
                else list(range(n_total)))
        base = [i for i in base if i < n_total]
        if journal is not None and journal.done:
            # Journaled-done images never reach the decode workers — a
            # resumed 50k-image sweep must not re-decode 49k JPEGs just to
            # skip them. Positions now map to dataset indices via
            # dataset_indices (per-image seeds stay index-derived).
            base = [i for i in base if i not in journal.done]
            dataset_indices = base
        elif dataset_indices is not None:
            dataset_indices = base
        dataset = prefetch(dataset, num_workers=args.workers, indices=base)
    elif dataset_indices is not None:
        stride_set = set(dataset_indices)
        dataset = (
            item for i, item in enumerate(dataset) if i in stride_set
        )

    mesh = None
    if args.data_parallel:
        from network_interpretation_imagenet_tpu.parallel import make_mesh

        mesh = make_mesh()
    logger = PhaseLogger(enabled=args.trace)
    if args.attribute:
        from network_interpretation_imagenet_tpu.saliency.sweep import (
            attribution_sweep,
        )

        res = attribution_sweep(
            engine,
            dataset,
            method=args.attribute,
            bbox_threshold=args.bbox_threshold,
            image_batch=max(args.image_batch, 1),
            max_images=args.num_images,
            seed=args.seed,
            logger=logger,
            mesh=mesh,
            keep_heatmaps=args.gp_heatmaps or args.gp_class_heatmaps,
            dataset_indices=dataset_indices,
            journal=journal,
            fidelity_steps=args.fidelity_steps if args.fidelity else 0,
            steps=args.ig_steps,
            samples=args.sg_samples,
            noise_sigma=args.sg_sigma,
            magnitude=args.sg_squared,
            gradcam_layer=args.gradcam_layer,
            lm_cfg={
                "mask_size": args.lm_mask_size, "iters": args.lm_iters,
                "l1": args.lm_l1, "tv": args.lm_tv,
                "jitter": args.lm_jitter, "baseline": args.lm_baseline,
            } if args.attribute == "meaningful" else None,
            xrai_scales=common.parse_xrai_scales(args.xrai_scales)
            if args.attribute == "xrai" else None,
            normalize=(spec.mean, spec.std) if args.uint8_wire else None,
            heatmap_wire=args.heatmap_wire,
            patch=args.patch,
            stride=args.stride,
            rise_masks=args.rise_masks,
            rise_grid=args.rise_grid,
            rise_keep_prob=args.rise_keep,
            mask_batch=args.attr_mask_batch,
            scorecam_channels=args.scorecam_channels,
        )
    elif args.bo:
        from network_interpretation_imagenet_tpu.config import BOConfig
        from network_interpretation_imagenet_tpu.saliency.sweep import (
            bo_saliency_sweep,
        )

        res = bo_saliency_sweep(
            engine,
            dataset,
            common.segment_config(args),
            bo_cfg=BOConfig(n_iters=args.n_iters,
                            n_pre_samples=args.n_pre_samples),
            window_fraction=args.window_fraction,
            bbox_threshold=args.bbox_threshold,
            image_batch=max(args.image_batch, 1),
            max_images=args.num_images,
            seed=args.seed,
            logger=logger,
            mesh=mesh,
            proposals_per_iter=args.proposals_per_iter,
            keep_heatmaps=args.gp_heatmaps or args.gp_class_heatmaps,
            dataset_indices=dataset_indices,
            journal=journal,
            fidelity_steps=args.fidelity_steps if args.fidelity else 0,
            normalize=(spec.mean, spec.std) if args.uint8_wire else None,
        )
    else:
        res = saliency_sweep(
            engine,
            dataset,
            common.segment_config(args),
            num_mask_samples=args.num_mask_samples,
            window_fraction=args.window_fraction,
            bbox_threshold=args.bbox_threshold,
            max_images=args.num_images,
            seed=args.seed,
            logger=logger,
            mesh=mesh,
            image_batch=args.image_batch,
            keep_heatmaps=args.gp_heatmaps or args.gp_class_heatmaps,
            dataset_indices=dataset_indices,
            mode=args.mode,
            num_knockout=args.num_knockout,
            journal=journal,
            fidelity_steps=args.fidelity_steps if args.fidelity else 0,
        )
    if journal is not None:
        journal.close()
    # Scalar fields only — dataclasses.asdict would deep-copy every retained
    # heatmap and per-image row just to discard them.
    payload = {
        f.name: getattr(res, f.name)
        for f in dataclasses.fields(res)
        if f.name not in ("per_image", "heatmaps")
    }
    payload["per_image_count"] = res.images_explained

    if args.gp_heatmaps and res.heatmaps:
        # GP-surrogate pass over the whole sweep: N exact Kronecker pixel-GP
        # fits + posteriors as ONE vmapped program (reference fits one image
        # per process, gp_superpixel_data_imagenet.py:578-663).
        from network_interpretation_imagenet_tpu.gp import kron

        def _kron_fields(heats, chunk):
            params, means_l, vars_l = [], [], []
            for lo in range(0, len(heats), chunk):
                p_c, m_c, v_c, _ = kron.fit_posterior_batch(
                    heats[lo:lo + chunk], iters=args.gp_iters,
                    lr=args.gp_lr, mesh=mesh,
                )
                params.extend(p_c)
                means_l.append(np.asarray(m_c))
                vars_l.append(np.asarray(v_c))
            return {
                "gp_mean": np.concatenate(means_l),
                "gp_var": np.concatenate(vars_l),
                "lengthscales": np.asarray(
                    [float(np.exp(p.log_lengthscale)) for p in params]
                ),
            }

        # chunk=32 bounds device memory (one vmapped program holds per-image
        # per-lengthscale projections) and keeps ONE compiled shape for full
        # flushes; a val-set-scale sweep must not stack 50k grids at once.
        _gp_surrogate_pass(args, res, mesh, payload, "gp_heatmaps",
                           base_chunk=32, fields_fn=_kron_fields)

    if args.gp_class_heatmaps and res.heatmaps:
        # Classification-GP pass: the reference's gp_classification.py
        # (grid-inducing Bernoulli GP over ONE image's binarized labels,
        # one process per image) at sweep scale — N median-binarized
        # heatmaps fit as ONE vmapped program (mesh: image axis shards).
        from network_interpretation_imagenet_tpu.gp import variational as vgp

        def _class_fields(heats, chunk):
            n_img, h, w = heats.shape
            yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            coords = np.stack(
                [yy.ravel(), xx.ravel()], axis=1
            ).astype(np.float32)
            flat = heats.reshape(n_img, -1)
            med = np.median(flat, axis=1, keepdims=True)
            ys = (flat > med).astype(np.float32)  # --binarize median
            model = vgp.init_model(
                max(h, w), grid_size=min(args.grid_size, 10)
            )
            probs_l = []
            for lo in range(0, n_img, chunk):
                _, p_c, _ = vgp.fit_predict_batch(
                    model, coords, ys[lo:lo + chunk],
                    iters=args.gp_class_iters, lr=args.gp_lr, mesh=mesh,
                    return_models=False,
                )
                probs_l.append(np.asarray(p_c))
            return {
                "survive_proba": np.concatenate(probs_l).reshape(n_img, h, w)
            }

        # Smaller chunks than the Kronecker pass: each image carries a
        # [M, H·W] projection through the ELBO grad.
        _gp_surrogate_pass(args, res, mesh, payload, "gp_class_heatmaps",
                           base_chunk=16, fields_fn=_class_fields)

    if args.multihost:
        import jax

        if jax.process_count() > 1:
            # Per-rank result (full rows) → shared filesystem; rank 0 waits
            # for every rank's file and writes the merged sweep_result.json.
            multihost_mod.write_rank_result(args.out, res)
            if jax.process_index() != 0:
                return 0
            merged = multihost_mod.merge_rank_results(
                args.out, jax.process_count()
            )
            # Survive the rebuild below.
            gp_infos = {
                k: payload.get(k)
                for k in ("gp_heatmaps", "gp_class_heatmaps")
            }
            payload = {
                f.name: getattr(merged, f.name)
                for f in dataclasses.fields(merged)
                if f.name not in ("per_image", "heatmaps")
            }
            payload["per_image_count"] = merged.images_explained
            payload["process_count"] = jax.process_count()
            for key, gp_info in gp_infos.items():
                if gp_info is None:
                    continue
                # Every rank wrote its own <key>.rank{r}.npz; point the
                # merged result at THIS run's ranks only (a glob would pick
                # up stale rank files from a previous larger-world run —
                # each rank clears only its OWN stale file at init).
                import os as _os

                gp_info["artifacts"] = [
                    f"{key}.rank{r}.npz"
                    for r in range(jax.process_count())
                    if _os.path.exists(
                        _os.path.join(args.out, f"{key}.rank{r}.npz")
                    )
                ]
                payload[key] = gp_info

    common.emit_result(args.out, "sweep_result.json", payload)


if __name__ == "__main__":
    main()
