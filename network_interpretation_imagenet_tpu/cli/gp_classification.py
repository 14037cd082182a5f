"""GP-classification saliency surrogate CLI (reference
``gp_classification.py``): grid-inducing variational GP + Bernoulli
likelihood over per-pixel mask labels, 30 Adam(0.1) iters (``:160-217``),
then per-pixel survive probability over the full grid (``:219-264``).

Deviation (documented): the reference feeds raw summed counts into the
Bernoulli likelihood (``gp_classification.py:81-82,374``); a Bernoulli model
needs {0,1} targets, so we binarize (``--binarize median`` default; ``none``
reproduces the raw-count feed).
"""

from __future__ import annotations

import os

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.cli.gp_regression import load_mask_source
from network_interpretation_imagenet_tpu.gp import variational
from network_interpretation_imagenet_tpu.saliency.viz import save_panels
from network_interpretation_imagenet_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)


def main(argv=None):
    p = common.build_parser(__doc__)
    common.add_gp_flags(p)
    # Reference classification defaults: grid_size=10, 30 Adam iters
    # (gp_classification.py:141,176). Explicit flags always win — per-CLI
    # defaults instead of value sentinels.
    p.set_defaults(grid_size=10, gp_iters=30)
    p.add_argument("--masks", required=True)
    p.add_argument("--binarize", default="median", choices=["median", "nonzero", "none"])
    p.add_argument("--train_subsample", type=int, default=4096,
                   help="max training pixels (covered pixels are subsampled)")
    args = p.parse_args(argv)
    common.apply_debug_flags(args)

    heat, coverage = load_mask_source(args)
    n = heat.shape[0]
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    cov_idx = np.where(coverage.ravel())[0]
    rng = np.random.RandomState(args.seed)
    if len(cov_idx) > args.train_subsample:
        cov_idx = rng.choice(cov_idx, args.train_subsample, replace=False)
    x = np.stack([yy.ravel()[cov_idx], xx.ravel()[cov_idx]], -1).astype(np.float32)
    raw = heat.ravel()[cov_idx]
    if args.binarize == "median":
        y = (raw > np.median(raw)).astype(np.float32)
    elif args.binarize == "nonzero":
        y = (raw > 0).astype(np.float32)
    else:
        y = raw.astype(np.float32)

    model = variational.init_model(n, grid_size=args.grid_size,
                                   lengthscale=n / 8.0)
    ckpt_name = "gp_cls_checkpoint"
    if args.gp_mode == "eval":
        # Reference loads the saved GP state dict before prediction
        # (gp_classification.py:222-228).
        blob = restore_checkpoint(args.gp_ckpt, name=ckpt_name)
        if blob is None:
            raise SystemExit(f"no GP ckpt under {args.gp_ckpt}; run --gp-mode train")
        import numpy as _np

        model = variational.VGPModel(
            variational.VGPParams(**{k: _np.asarray(v) for k, v in blob.items()}),
            model.inducing,
        )
        losses = np.zeros(1)
    else:
        model, losses = variational.fit_adam(model, x, y, iters=args.gp_iters,
                                             lr=args.gp_lr)
        save_checkpoint(
            {k: np.asarray(v) for k, v in model.params._asdict().items()},
            args.gp_ckpt, name=ckpt_name,
        )

    all_x = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float32)
    probs = np.asarray(variational.predict_proba(model, all_x)).reshape(n, n)

    common.write_heatmap_png(os.path.join(args.out, "gp_cls_prob.png"), probs)
    save_panels(
        os.path.join(args.out, "gp_cls_result.png"),
        [heat, probs],
        ["Summed label training heatmap", "Bernoulli GP p(survive)"],
    )
    common.emit_result(args.out, "gp_classification_result.json", {
        "masks": args.masks,
        "train_points": int(len(x)),
        "grid_size": args.grid_size,
        "elbo_first": round(-float(np.asarray(losses)[0]), 3),
        "elbo_last": round(-float(np.asarray(losses)[-1]), 3),
        "prob_range": [round(float(probs.min()), 4), round(float(probs.max()), 4)],
    })


if __name__ == "__main__":
    main()
