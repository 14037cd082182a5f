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
    common.add_method_flags(p, sg_samples=8, lm_iters=50, lm_jitter=2)
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
    # Stage order comes from a RAW bundle.init (definition order);
    # engine.variables has been through device_put, whose dicts sort
    # alphabetically and would randomize e.g. resnet18's 'fc' head last.
    stages = sanity.randomization_stages(bundle)
    random_vars = sanity.fresh_random_variables(bundle, args.seed)

    base = {m: np.asarray(_heatmap(m, engine, image, disp, segments,
                                   target, args))
            for m in methods}
    report = {m: [] for m in methods}
    done = []
    # Stage-outer so each spliced weight tree is built and device_put
    # ONCE (one engine per stage), not once per method.
    for stage in stages:
        done.append(stage)
        rand = sanity.randomize_modules(engine.variables, random_vars, done)
        eng = SaliencyEngine(bundle, rand, mask_batch=args.mask_batch,
                             compute_dtype=engine.compute_dtype)
        for m in methods:
            heat = np.asarray(_heatmap(m, eng, image, disp, segments,
                                       target, args))
            report[m].append({
                "randomized_through": stage,
                "spearman": round(sanity.spearman_abs(base[m], heat), 4),
            })

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
