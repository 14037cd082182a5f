"""Superpixel demo CLI (reference ``generate_superpixels.py:1-32``): segment
one or two images and save a boundary-marked side-by-side figure."""

from __future__ import annotations

import os
import sys

import numpy as np

from network_interpretation_imagenet_tpu.cli import common
from network_interpretation_imagenet_tpu.saliency.viz import mark_boundaries, save_panels


def main(argv=None):
    p = common.build_parser(__doc__)
    p.add_argument("--images", nargs="*", default=[], help="image file paths")
    args = p.parse_args(argv)
    common.apply_debug_flags(args)
    cfg = common.segment_config(args)

    displays = []
    if args.images:
        from PIL import Image

        for path in args.images[:2]:
            displays.append(np.asarray(Image.open(path).convert("RGB")))
    else:
        _, disp, _, _ = common.resolve_image(args)
        displays.append(disp)
        args2 = p.parse_args(
            (argv if argv is not None else sys.argv[1:]) + ["--eval_img_index",
                                                       str(args.eval_img_index + 1)])
        _, disp2, _, _ = common.resolve_image(args2)
        displays.append(disp2)

    panels, titles = [], []
    seg_counts = []
    for i, disp in enumerate(displays):
        seg = common.segment_display(disp, cfg)
        seg_counts.append(int(seg.max()) + 1)
        panels.append(mark_boundaries(disp, seg))
        titles.append(f"img{i}: {seg_counts[-1]} segments ({cfg.method})")
        print(f"image {i}: {seg_counts[-1]} segments")

    out = os.path.join(args.out, "superpixels.png")
    save_panels(out, panels, titles)
    common.emit_result(args.out, "superpixels.json",
                       {"figure": out, "segments": seg_counts, "method": cfg.method})


if __name__ == "__main__":
    main()
