"""Bayesian optimization over mask space."""

from network_interpretation_imagenet_tpu.bo.acquisition import (  # noqa: F401
    expected_improvement,
)
from network_interpretation_imagenet_tpu.bo.loop import (  # noqa: F401
    BOResult,
    bayesian_optimize,
    fused_window_bo,
    make_fused_window_bo,
    next_pow2,
)
