"""Sanity-check attribution methods by cascading parameter randomization
(Adebayo et al., NeurIPS 2018).

For each method, re-randomize the classifier's modules one at a time
from the OUTPUT side (cumulatively, the paper's cascading protocol) and
report the Spearman rank correlation of each stage's heatmap against the
trained model's. Sound methods decay toward 0; a method that stays ~1
under a fully random network is explaining the image, not the model.

    python -m network_interpretation_imagenet_tpu.cli.attribution_sanity \
        --arch resnet18 --ckpt weights.msgpack --data <imagenet> \
        --methods gradient,integrated,gradcam,smoothgrad

The reference has no attribution-validity tooling; this harness keeps
the 13-method family honest (beyond parity).
"""

from __future__ import annotations

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.cli.compare_saliency_methods import (
    METHODS,
    _heatmap,
)
from network_interpretation_imagenet_tpu.saliency import sanity
from network_interpretation_imagenet_tpu.saliency.engine import SaliencyEngine

# Methods whose per-stage evaluation is cheap (no engine mask machinery
# to recompile per weight swap) — the default set.
_DEFAULT = "gradient,grad_input,integrated,smoothgrad,gradcam"


def main(argv=None):
    p = common.build_parser(__doc__)
    p.add_argument("--methods", default=_DEFAULT,
                   help=f"comma list from {','.join(METHODS)}")
    p.add_argument("--patch", type=int, default=32)
    p.add_argument("--stride", type=int, default=16)
    p.add_argument("--ig-steps", type=int, default=16)
    p.add_argument("--sg-samples", type=int, default=8)
    p.add_argument("--sg-sigma", type=float, default=0.15)
    p.add_argument("--rise-masks", type=int, default=500)
    p.add_argument("--rise-grid", type=int, default=7)
    p.add_argument("--rise-keep", type=float, default=0.5)
    p.add_argument("--gradcam-layer", default=None)
    p.add_argument("--scorecam-channels", type=int, default=64)
    p.add_argument("--xrai-scales", default="50,100,150,250,500")
    p.add_argument("--lm-mask-size", type=int, default=28)
    p.add_argument("--lm-iters", type=int, default=50)
    p.add_argument("--lm-jitter", type=int, default=2)
    p.add_argument("--lm-baseline", default="blur",
                   choices=["blur", "zero"])
    common.add_bo_flags(p)
    args = p.parse_args(argv)
    common.apply_debug_flags(args)

    methods = list(dict.fromkeys(
        m.strip() for m in args.methods.split(",") if m.strip()))
    unknown = [m for m in methods if m not in METHODS]
    if unknown:
        p.error(f"unknown methods {unknown}; choose from {METHODS}")

    image, disp, label, _ = common.resolve_image(args)
    engine = common.build_engine(args)
    seg_cfg = common.segment_config(args)
    segments = common.segment_display(disp, seg_cfg)
    target, _ = engine.predict_one(image)
    target = int(target)

    bundle = engine.bundle
    stages = sanity.randomization_stages(engine.variables)
    report = {}
    for m in methods:
        def heatmap_fn(variables, _m=m):
            eng = SaliencyEngine(bundle, variables,
                                 mask_batch=args.mask_batch,
                                 compute_dtype=engine.compute_dtype)
            return _heatmap(_m, eng, image, disp, segments, target, args)

        rows = sanity.cascading_randomization(
            heatmap_fn, bundle, engine.variables, seed=args.seed,
            stages=stages)["stages"]
        report[m] = [{"randomized_through": s, "spearman": round(c, 4)}
                     for s, c in rows]

    width = max(len(s) for s in stages)
    print(f"{'stage (cumulative)':>{width + 4}}  " +
          "  ".join(f"{m:>11}" for m in methods))
    for i, s in enumerate(stages):
        vals = "  ".join(f"{report[m][i]['spearman']:>11.3f}"
                         for m in methods)
        print(f"{s:>{width + 4}}  {vals}")

    common.emit_result(args.out, "sanity_check.json", {
        "target": target,
        "stages": stages,
        "methods": report,
    })
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
