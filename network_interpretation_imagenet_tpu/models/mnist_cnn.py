"""Small MNIST CNN matching the reference's ``Classification_Net``.

Reference: ``generate_gp_training_data_mnist.py:86-105`` — six 3×3 convs
(strides 1,1,2,1,2,1; the first five Conv→BN→ReLU, the sixth a bare conv),
global mean pool, one dense head. Architecture is reproduced exactly so the
shipped ``saved_checkpoints/mnist/checkpoint.pth.tar`` converts losslessly
(see ``utils/convert.py``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from network_interpretation_imagenet_tpu.models.common import (
    ConvBNRelu,
    global_mean_pool,
)

Array = jax.Array


class MnistCNN(nn.Module):
    """6-conv MNIST classifier; returns features + logits like the reference
    (``x0, x1, x2, pred0`` at ``generate_gp_training_data_mnist.py:97-105``)."""

    num_classes: int = 10
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x0 = ConvBNRelu(32, name="conv1", **kw)(x, train)
        x0 = ConvBNRelu(32, name="conv2", **kw)(x0, train)
        x1 = ConvBNRelu(64, stride=2, name="conv3", **kw)(x0, train)
        x1 = ConvBNRelu(64, name="conv4", **kw)(x1, train)
        x2 = ConvBNRelu(128, stride=2, name="conv5", **kw)(x1, train)
        x2 = nn.Conv(
            128, (3, 3), padding=[(1, 1), (1, 1)], name="conv6", **kw
        )(x2)
        f = global_mean_pool(x2)
        logits = nn.Dense(self.num_classes, name="fc1", **kw)(f)
        return x0, x1, x2, logits

    def logits(self, x: Array, train: bool = False) -> Array:
        return self(x, train)[-1]
