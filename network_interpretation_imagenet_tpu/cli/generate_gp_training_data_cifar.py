"""CIFAR pipeline CLI (reference ``generate_gp_training_data_cifar.py``):
``--mode train`` runs the full training harness (resume, scores.tsv, early
stop — ``:81-234``) on the mesh-sharded train step; ``--mode gp-data``
generates N masks knocking out ``--num_masked_superpixels`` random segments
(reference: 5, ``:307-342``).
"""

from __future__ import annotations

import os

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.config import TrainConfig


def main(argv=None):
    p = common.build_parser(__doc__, dataset_default="cifar10+")
    p.add_argument("--mode", default="gp-data", choices=["train", "gp-data"])
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "rmsprop", "adam"])
    p.add_argument("--patience", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--resume", action="store_true")
    p.set_defaults(arch="resnet", num_mask_samples=1000, num_masked_superpixels=5)
    args = p.parse_args(argv)
    common.apply_debug_flags(args)

    if args.mode == "train":
        from network_interpretation_imagenet_tpu.data import (
            get_cifar_loaders,
            synthetic_classification_batch,
        )
        from network_interpretation_imagenet_tpu.data.loaders import ArrayLoader
        from network_interpretation_imagenet_tpu.models import create_model
        from network_interpretation_imagenet_tpu.train import Trainer

        if args.data:
            train_loader, val_loader, _ = get_cifar_loaders(
                args.data, args.dataset, args.batch_size, seed=args.seed
            )
        else:
            print("[warn] no --data: training on synthetic CIFAR-like batch")
            x, y = synthetic_classification_batch(args.seed, 512, 32, 3, 10)
            train_loader = ArrayLoader(x, y, args.batch_size, shuffle=True)
            val_loader = ArrayLoader(x[-128:], y[-128:], args.batch_size)
        save_dir = os.path.join(args.out, "saved_checkpoints",
                                f"{args.dataset}-{args.arch}-{args.depth}")
        if args.resume:
            # Restore arch flags from the checkpoint BEFORE building the
            # model (reference arch_resume_names, args.py:79-80).
            saved = Trainer.peek_arch_args(save_dir)
            if saved:
                common.apply_arch_resume(args, saved)
        arch_args = {n: getattr(args, n) for n in common.ARCH_RESUME_NAMES}
        bundle = create_model(
            args.arch, args.dataset, depth=args.depth,
            death_mode=args.death_mode, death_rate=args.death_rate,
            growth_rate=args.growth_rate, bn_size=args.bn_size,
            compression=args.compression,
        )
        cfg = TrainConfig(
            optimizer=args.optimizer, lr=args.lr, momentum=args.momentum,
            weight_decay=args.weight_decay, epochs=args.epochs,
            patience=args.patience, seed=args.seed,
        )
        t = Trainer(bundle, cfg, steps_per_epoch=len(train_loader),
                    save_dir=save_dir, arch_args=arch_args)
        if args.resume and t.resume():
            print(f"resumed from epoch {t.start_epoch}")
        history = t.fit(train_loader, val_loader)
        common.emit_result(args.out, "cifar_train_result.json", {
            "mode": "train", "epochs_run": len(history),
            "best_err1": t.best_err1, "best_epoch": t.best_epoch,
            "save_dir": save_dir,
        })
        return

    from network_interpretation_imagenet_tpu.saliency.pipeline import knockout_saliency

    image, disp, label, _ = common.resolve_image(args)
    engine = common.build_engine(args)
    pred, _ = engine.predict_one(image)
    target = pred  # when pred == label this IS the label; else explain the prediction

    seg = common.segment_display(disp, common.segment_config(args))
    out = knockout_saliency(
        engine, image, seg, num_samples=args.num_mask_samples,
        num_knockout=args.num_masked_superpixels, seed=args.seed, target=target,
    )
    common.write_heatmap_png(os.path.join(args.out, "heatmap.png"), out.heatmap)
    common.save_mask_npz(
        os.path.join(args.out, "masks.npz"),
        segments=seg, masks=out.masks, knock_ids=out.knock_ids,
        labels=out.eval.labels, heatmap=out.heatmap, target=np.asarray(target),
    )
    if args.save_pngs:
        common.save_mask_pngs(os.path.join(args.out, "masks"), out.masks,
                              out.eval.labels)
    common.emit_result(args.out, "cifar_gp_data_result.json", {
        "mode": "gp-data",
        "target": int(target),
        "num_segments": out.num_segments,
        "correct_pred_count": int(out.eval.survived.sum()),
        "masks_npz": os.path.join(args.out, "masks.npz"),
    })


if __name__ == "__main__":
    main()
