"""Saliency subsystem: masked-forward engine, per-image pipelines, threshold
search, visualization."""

from network_interpretation_imagenet_tpu.saliency.engine import (  # noqa: F401
    MaskEvalResult,
    SaliencyEngine,
)
from network_interpretation_imagenet_tpu.saliency.eval_metrics import (  # noqa: F401
    deletion_insertion_auc,
    fidelity_curve,
    pointing_game,
)
