"""Pure functional primitives: masks, aggregation, metrics, preprocessing."""

from network_interpretation_imagenet_tpu.ops import (  # noqa: F401
    aggregate,
    colormap,
    masking,
    metrics,
    preprocess,
)
