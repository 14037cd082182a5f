"""Saliency subsystem: masked-forward engine, per-image pipelines, threshold
search, visualization."""

from network_interpretation_imagenet_tpu.saliency.engine import (  # noqa: F401
    MaskEvalResult,
    SaliencyEngine,
)
