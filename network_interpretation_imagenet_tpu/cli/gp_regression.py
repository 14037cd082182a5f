"""GP-regression saliency surrogate CLI (reference ``gp_regression.py``):
aggregate stored masks into per-pixel summed labels, fit the pixel-grid GP
(20 Adam iters lr=0.1, ``:179-224``), and predict a smooth saliency mean +
confidence over the full n² grid (``:227-282``).

Input is either the in-memory ``masks.npz`` produced by
``generate_gp_training_data_imagenet`` or a reference-style ``./masks`` PNG
directory (``mask_{i}_{0|1}.png``, label parsed from the filename exactly as
``gp_regression.py:63-72``). The KISS-GP approximation is replaced by the
exact Kronecker solve (`gp.kron`).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.gp import kron
from network_interpretation_imagenet_tpu.saliency.viz import save_panels
from network_interpretation_imagenet_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)


def load_mask_source(args) -> Tuple[np.ndarray, np.ndarray]:
    """→ (heatmap f32 [n,n], coverage bool [n,n])."""
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.ops import aggregate, masking

    if args.masks and args.masks.endswith(".npz"):
        blob = np.load(args.masks)
        if "heatmap" in blob and "firsts" in blob:
            seg = blob["segments"]
            masks = np.asarray(
                masking.window_masks(
                    jnp.asarray(seg), jnp.asarray(blob["firsts"]),
                    jnp.int32(blob["width"]),
                )
            )
            labels = blob["labels"]
        else:
            masks, labels = blob["masks"], blob["labels"]
        heat = np.asarray(
            aggregate.summed_label_heatmap(jnp.asarray(masks), jnp.asarray(labels))
        )
        coverage = masks.any(axis=0)
        return heat.astype(np.float32), coverage
    # Reference-style PNG directory.
    from PIL import Image

    folder = args.masks
    heat = None
    coverage = None
    for fname in sorted(os.listdir(folder)):
        if not fname.endswith(".png"):
            continue
        label = int(fname.split("_")[2].split(".")[0])  # reference parse (:66)
        m = np.asarray(Image.open(os.path.join(folder, fname)).convert("L")) == 255
        if heat is None:
            heat = np.zeros(m.shape, np.float32)
            coverage = np.zeros(m.shape, bool)
        heat += m * label
        coverage |= m
    if heat is None:
        raise FileNotFoundError(f"no mask PNGs in {folder}")
    return heat, coverage


def main(argv=None):
    p = common.build_parser(__doc__)
    common.add_gp_flags(p)
    p.add_argument("--masks", required=True,
                   help="masks.npz from generate_gp_training_data_* or a ./masks PNG dir")
    args = p.parse_args(argv)
    common.apply_debug_flags(args)

    heat, coverage = load_mask_source(args)
    ckpt_dir = args.gp_ckpt
    name = "gp_reg_checkpoint"

    payload = {"masks": args.masks, "n": int(heat.shape[0]),
               "covered_pixels": int(coverage.sum())}
    if args.gp_mode in ("train", "train+eval"):
        params, losses = kron.fit_adam(heat, iters=args.gp_iters, lr=args.gp_lr)
        save_checkpoint(
            {k: np.asarray(v) for k, v in params._asdict().items()},
            ckpt_dir, name=name,
        )
        payload["train_losses"] = [round(float(v), 4) for v in np.asarray(losses)]
        payload["lengthscale"] = round(float(np.exp(params.log_lengthscale)), 4)
    if args.gp_mode in ("eval", "train+eval"):
        blob = restore_checkpoint(ckpt_dir, name=name)
        if blob is None:
            raise SystemExit(f"no GP checkpoint under {ckpt_dir}; run --gp-mode train")
        params = kron.KronGPParams(**{k: np.asarray(v) for k, v in blob.items()})
        mean, var = kron.posterior(params, heat)
        mean, var = np.asarray(mean), np.asarray(var)
        sd = np.sqrt(var)
        common.write_heatmap_png(os.path.join(args.out, "gp_reg_mean.png"), mean)
        save_panels(
            os.path.join(args.out, "gp_reg_result.png"),
            [heat, mean, sd],
            ["Summed label training heatmap", "Predicted mask heatmap",
             "Posterior std (confidence region)"],
        )
        payload["mean_range"] = [round(float(mean.min()), 3), round(float(mean.max()), 3)]
        payload["std_range"] = [round(float(sd.min()), 4), round(float(sd.max()), 4)]
    common.emit_result(args.out, "gp_regression_result.json", payload)


if __name__ == "__main__":
    main()
