"""Export an AOT serving artifact for a classifier (serving.py).

No reference analogue — the reference re-runs a full Python script per image.
This packages the fused mask-build + batched-forward as serialized StableHLO
plus weights, so a serving host needs neither the model zoo nor the cold
compile::

    python -m network_interpretation_imagenet_tpu.cli.export_serving \
        --arch resnet50 --ckpt resnet50.pth.tar --out ./artifact \
        --batch-sizes 1024,256,32
"""

from __future__ import annotations

import sys

from network_interpretation_imagenet_tpu.cli import common


def main(argv=None) -> int:
    p = common.build_parser(__doc__.splitlines()[0])
    p.add_argument("--batch-sizes", default="1024,256,32",
                   help="comma-separated mask-batch buckets to export")
    p.add_argument("--no-weights", action="store_true",
                   help="exclude weights from the artifact (pass variables "
                        "at load time instead)")
    args = p.parse_args(argv)
    common.apply_debug_flags(args)

    from network_interpretation_imagenet_tpu import serving

    engine = common.build_engine(args)
    batch_sizes = tuple(int(b) for b in args.batch_sizes.split(","))
    manifest = serving.export_engine(
        engine, args.out, batch_sizes=batch_sizes,
        include_weights=not args.no_weights,
    )
    common.emit_result(args.out, "export_result.json", {
        "artifact": args.out, **manifest,
    })
    return 0


if __name__ == "__main__":
    sys.exit(main())
