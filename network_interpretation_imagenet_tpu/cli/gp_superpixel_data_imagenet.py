"""Fused masks→GP pipeline CLI (reference ``gp_superpixel_data_imagenet.py``):
random window masks → summed superpixel label field → exact Kronecker grid GP
→ mean + variance heatmaps, one process end-to-end.

The reference's KISS-GP (grid_size=300, ``:414``) is replaced by the exact
Kronecker-eigen solve (`gp.kron`) — see gp/kron.py docstring.
"""

from __future__ import annotations

import os

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.gp import kron
from network_interpretation_imagenet_tpu.saliency.pipeline import random_window_saliency
from network_interpretation_imagenet_tpu.saliency.viz import save_panels


def main(argv=None):
    p = common.build_parser(__doc__)
    common.add_gp_flags(p)
    args = p.parse_args(argv)
    common.apply_debug_flags(args)

    image, disp, label, _ = common.resolve_image(args)
    engine = common.build_engine(args)
    pred, _ = engine.predict_one(image)
    target = pred  # when pred == label this IS the label; else explain the prediction

    seg = common.segment_display(disp, common.segment_config(args))
    out = random_window_saliency(
        engine, image, seg, num_samples=args.num_mask_samples,
        window_fraction=args.window_fraction, seed=args.seed, target=target,
    )

    # GP over the summed superpixel labels (reference trains on all n² pixels,
    # :619-629; 20 Adam iters lr=0.1, :646-656).
    params, losses = kron.fit_adam(
        out.heatmap.astype(np.float32), iters=args.gp_iters, lr=args.gp_lr
    )
    mean, var = kron.posterior(params, out.heatmap.astype(np.float32))
    mean, var = np.asarray(mean), np.asarray(var)

    common.write_heatmap_png(os.path.join(args.out, "gp_mean.png"), mean)
    common.write_heatmap_png(os.path.join(args.out, "gp_var.png"), var)
    save_panels(
        os.path.join(args.out, "gp_superpixel_result.png"),
        [disp, out.heatmap, mean, var],
        ["Original image", "Summed label heatmap", "GP posterior mean",
         "GP posterior variance"],
    )
    common.emit_result(args.out, "gp_superpixel_result.json", {
        "target": int(target),
        "num_segments": out.num_segments,
        "survived": int(out.eval.survived.sum()),
        "gp_loss_first": round(float(np.asarray(losses)[0]), 3),
        "gp_loss_last": round(float(np.asarray(losses)[-1]), 3),
        "gp_lengthscale": round(float(np.exp(params.log_lengthscale)), 3),
        "mean_range": [round(float(mean.min()), 3), round(float(mean.max()), 3)],
        "var_range": [round(float(var.min()), 5), round(float(var.max()), 5)],
    })


if __name__ == "__main__":
    main()
