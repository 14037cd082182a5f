"""MNIST pipeline CLI (reference ``generate_gp_training_data_mnist.py``):
``--mode train-nn`` trains the 6-conv CNN (4 epochs, SGD momentum —
``:111-129,280-289``); ``--mode gp-data`` generates N single-superpixel
knockout masks and their survive labels (``:153-278``), all masked forwards
batched on device.
"""

from __future__ import annotations

import os

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.config import TrainConfig


def main(argv=None):
    p = common.build_parser(__doc__, dataset_default="mnist")
    p.add_argument("--mode", default="gp-data", choices=["train-nn", "gp-data"])
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--momentum", type=float, default=0.5)
    p.add_argument("--batch-size", type=int, default=64)
    p.set_defaults(arch="mnist_cnn", num_mask_samples=1000)
    args = p.parse_args(argv)
    common.apply_debug_flags(args)

    if args.mode == "train-nn":
        from network_interpretation_imagenet_tpu.data import (
            load_mnist_dir,
            synthetic_classification_batch,
        )
        from network_interpretation_imagenet_tpu.data.loaders import ArrayLoader
        from network_interpretation_imagenet_tpu.models import create_model
        from network_interpretation_imagenet_tpu.train import Trainer

        if args.data:
            train_x, train_y = load_mnist_dir(args.data, train=True)
            test_x, test_y = load_mnist_dir(args.data, train=False)
        else:
            print("[warn] no --data: training on synthetic digits")
            train_x, train_y = synthetic_classification_batch(args.seed, 512, 28, 1, 10)
            test_x, test_y = synthetic_classification_batch(args.seed + 1, 128, 28, 1, 10)
        train_loader = ArrayLoader(train_x, train_y, args.batch_size, shuffle=True)
        test_loader = ArrayLoader(test_x, test_y, args.batch_size)
        bundle = create_model("mnist_cnn", "mnist")
        cfg = TrainConfig(optimizer="sgd", lr=args.lr, momentum=args.momentum,
                          weight_decay=0.0, epochs=args.epochs, seed=args.seed)
        t = Trainer(bundle, cfg, steps_per_epoch=len(train_loader),
                    save_dir=os.path.join(args.out, "saved_checkpoints", "mnist"))
        history = t.fit(train_loader, test_loader)
        common.emit_result(args.out, "mnist_train_result.json", {
            "mode": "train-nn", "epochs": len(history), "history": history,
        })
        return

    # gp-data: knockout masks.
    from network_interpretation_imagenet_tpu.saliency.pipeline import knockout_saliency

    image, disp, label, _ = common.resolve_image(args)
    engine = common.build_engine(args)
    pred, _ = engine.predict_one(image)
    target = pred  # when pred == label this IS the label; else explain the prediction

    seg = common.segment_display(disp, common.segment_config(args))
    print(f"number of segments: {seg.max() + 1}")
    out = knockout_saliency(
        engine, image, seg, num_samples=args.num_mask_samples,
        num_knockout=args.num_masked_superpixels, seed=args.seed, target=target,
    )
    common.write_heatmap_png(os.path.join(args.out, "heatmap.png"), out.heatmap)
    common.save_mask_npz(
        os.path.join(args.out, "masks.npz"),
        segments=seg, masks=out.masks, knock_ids=out.knock_ids,
        labels=out.eval.labels, prob_max=out.eval.prob_max,
        heatmap=out.heatmap, target=np.asarray(target),
    )
    if args.save_pngs:
        common.save_mask_pngs(os.path.join(args.out, "masks"), out.masks,
                              out.eval.labels)
    common.emit_result(args.out, "mnist_gp_data_result.json", {
        "mode": "gp-data",
        "target": int(target),
        "num_segments": out.num_segments,
        "num_mask_samples": args.num_mask_samples,
        "correct_pred_count": int(out.eval.survived.sum()),
        "wrong_pred_count": int((~out.eval.survived).sum()),
        "masks_npz": os.path.join(args.out, "masks.npz"),
    })


if __name__ == "__main__":
    main()
