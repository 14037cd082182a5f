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


def _synthetic_dataset(args, spec, n):
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.data import synthetic_imagenet_image
    from network_interpretation_imagenet_tpu.ops import preprocess

    for i in range(n):
        base = synthetic_imagenet_image(args.seed + i, spec.image_size)
        if spec.channels == 1:
            base = base[:, :, :1]
        img = np.asarray(preprocess.normalize(jnp.asarray(base), spec.mean, spec.std))
        yield img, None, None


def main(argv=None):
    p = common.build_parser(__doc__)
    p.add_argument("--num-images", type=int, default=8)
    p.add_argument("--bbox_threshold", type=int, default=180)
    p.add_argument("--trace", action="store_true", help="emit per-phase JSON logs")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard each image's mask batch over all devices")
    p.add_argument("--image-batch", type=int, default=1,
                   help="fuse this many images' mask banks into one forward")
    common.add_gp_flags(p)
    p.add_argument("--gp-heatmaps", action="store_true",
                   help="fit an exact Kronecker pixel-GP to every explained "
                        "image's heatmap in ONE vmapped program (mean + "
                        "uncertainty maps → gp_heatmaps.npz)")
    p.add_argument("--bo", action="store_true",
                   help="drive the sweep with the FLAGSHIP GP-EI BO path "
                        "(batched vmapped fused loops per flush) instead of "
                        "random window masks")
    common.add_bo_flags(p)
    p.add_argument("--proposals-per-iter", type=int, default=1,
                   help="(--bo) q-batched BO proposals per GP refit")
    args = p.parse_args(argv)
    common.apply_debug_flags(args)

    from network_interpretation_imagenet_tpu.config import DATASETS

    spec = DATASETS[args.dataset]
    engine = common.build_engine(args)

    if args.data and args.dataset == "imagenet":
        import os

        if os.path.exists(os.path.join(args.data, "LOC_val_solution.csv")):
            from network_interpretation_imagenet_tpu.data import (
                ImagenetLocalizationDataset,
            )

            dataset = iter(ImagenetLocalizationDataset(args.data))
        else:  # plain ImageFolder layout (no gt boxes → no IOU column)
            from network_interpretation_imagenet_tpu.data.image_folder import (
                ImageFolderDataset,
            )

            dataset = iter(ImageFolderDataset(args.data))
    else:
        dataset = _synthetic_dataset(args, spec, args.num_images)

    mesh = None
    if args.data_parallel:
        from network_interpretation_imagenet_tpu.parallel import make_mesh

        mesh = make_mesh()
    logger = PhaseLogger(enabled=args.trace)
    if args.bo:
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
            keep_heatmaps=args.gp_heatmaps,
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
            keep_heatmaps=args.gp_heatmaps,
        )
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
        import os
        import time

        from network_interpretation_imagenet_tpu.gp import kron

        idxs = sorted(res.heatmaps)
        heats = np.stack([res.heatmaps[i] for i in idxs])
        t0 = time.perf_counter()
        # Fixed-size chunks bound device memory (one vmapped program holds
        # per-image per-lengthscale projections) and keep ONE compiled shape
        # for full flushes; a val-set-scale sweep must not stack 50k grids
        # into a single program.
        chunk = 32
        params, means_l, vars_l = [], [], []
        for lo in range(0, len(heats), chunk):
            p_c, m_c, v_c, _ = kron.fit_posterior_batch(
                heats[lo:lo + chunk], iters=args.gp_iters, lr=args.gp_lr
            )
            params.extend(p_c)
            means_l.append(np.asarray(m_c))
            vars_l.append(np.asarray(v_c))
        means = np.concatenate(means_l)
        vars_ = np.concatenate(vars_l)
        gp_seconds = time.perf_counter() - t0
        os.makedirs(args.out, exist_ok=True)
        np.savez_compressed(
            os.path.join(args.out, "gp_heatmaps.npz"),
            indices=np.asarray(idxs),
            heatmaps=heats,
            gp_mean=np.asarray(means),
            gp_var=np.asarray(vars_),
            lengthscales=np.asarray(
                [float(np.exp(p.log_lengthscale)) for p in params]
            ),
        )
        payload["gp_heatmaps"] = {
            "images": len(idxs),
            "seconds": round(gp_seconds, 3),
            "artifact": "gp_heatmaps.npz",
        }
    common.emit_result(args.out, "sweep_result.json", payload)


if __name__ == "__main__":
    main()
