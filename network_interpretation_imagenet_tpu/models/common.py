"""Shared model building blocks (Flax linen, NHWC, bf16-friendly).

All classifiers in this package:
  * take NHWC inputs (TPU-native layout; the reference is NCHW torch),
  * expose ``dtype`` (compute) and ``param_dtype`` so the masked-forward
    engine can run bf16 on the MXU with f32 params,
  * use BatchNorm with torch-compatible defaults (momentum 0.1 torch ==
    ``momentum=0.9`` flax, eps 1e-5) so converted ``.pth.tar`` checkpoints
    reproduce reference logits.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
Dtype = Any

# torch nn.BatchNorm2d(momentum=0.1) ≡ flax momentum 0.9.
BatchNorm = partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5)


class ConvBNRelu(nn.Module):
    """Conv → BN → ReLU (the reference's ``conv`` helper,
    ``generate_gp_training_data_mnist.py:72-77``)."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = BatchNorm(
            use_running_average=not train, dtype=self.dtype, param_dtype=self.param_dtype
        )(x)
        return nn.relu(x)


def avg_pool(x: Array, window: int, stride: int | None = None) -> Array:
    stride = stride or window
    return nn.avg_pool(x, (window, window), strides=(stride, stride))


def max_pool_same(x: Array, window: int, stride: int) -> Array:
    """torch ``MaxPool2d(kernel, stride, padding=1)`` for the ResNet stem."""
    return nn.max_pool(
        x, (window, window), strides=(stride, stride), padding=[(1, 1), (1, 1)]
    )


def max_pool_ceil(x: Array, window: int, stride: int, padding: int = 0) -> Array:
    """torch ``MaxPool2d(..., ceil_mode=True)``: output = ceil((H + 2p − k)/s)
    + 1. Implemented as asymmetric −inf padding (shapes are jit-static so the
    pad amounts are Python ints). torch ignores windows that start inside the
    right/bottom padding; for the stride ≤ window configs used here the ceil
    formula never creates such a window."""
    import math

    h, w = x.shape[1], x.shape[2]

    def hi(size: int) -> int:
        out = math.ceil((size + 2 * padding - window) / stride) + 1
        return (out - 1) * stride + window - size - padding

    return nn.max_pool(
        x, (window, window), strides=(stride, stride),
        padding=[(padding, hi(h)), (padding, hi(w))],
    )


def global_mean_pool(x: Array) -> Array:
    """Mean over H, W (reference ``x2.mean(3).mean(2)``,
    ``generate_gp_training_data_mnist.py:102``)."""
    return jnp.mean(x, axis=(1, 2))
