"""GoogLeNet (Inception v1, Szegedy et al. 2014) — torchvision graph, NHWC.

Part of the torchvision-era zoo the reference drives by name
(``models.__dict__[arch](pretrained=True)``,
``bayesian_active_learning_imagenet.py:391``). Mirrors torchvision
``googlenet.py`` exactly: BasicConv2d (bias-free conv + BN eps=1e-3 + ReLU),
ceil-mode max pools, four-branch inception blocks whose "5×5" branch is
torchvision's historical 3×3, and the pretrained factory's
``transform_input`` renormalization. The train-only aux heads never feed
the inference logits and are omitted (the converter skips their weights).

TPU notes: NHWC channel-last concats; every conv is MXU work; the whole
graph is static-shape (ceil-mode pads are Python-int padding).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from network_interpretation_imagenet_tpu.models.common import max_pool_ceil
from network_interpretation_imagenet_tpu.models.inception import BasicConv, _pad

Array = jax.Array


class _Inception(nn.Module):
    """torchvision googlenet ``Inception``: 1×1 / 1×1→3×3 / 1×1→3×3("5×5") /
    pool→1×1, channel-concat."""

    ch1x1: int
    ch3x3red: int
    ch3x3: int
    ch5x5red: int
    ch5x5: int
    pool_proj: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b1 = BasicConv(self.ch1x1, (1, 1), name="branch1", **kw)(x, train)
        b2 = BasicConv(self.ch3x3red, (1, 1), name="branch2_0", **kw)(x, train)
        b2 = BasicConv(self.ch3x3, (3, 3), padding=_pad(1),
                       name="branch2_1", **kw)(b2, train)
        # torchvision keeps the original paper's "5×5" naming but uses a 3×3
        # kernel (a known upstream quirk the pretrained weights bake in).
        b3 = BasicConv(self.ch5x5red, (1, 1), name="branch3_0", **kw)(x, train)
        b3 = BasicConv(self.ch5x5, (3, 3), padding=_pad(1),
                       name="branch3_1", **kw)(b3, train)
        b4 = max_pool_ceil(x, 3, 1, padding=1)
        b4 = BasicConv(self.pool_proj, (1, 1), name="branch4_1", **kw)(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class GoogLeNet(nn.Module):
    """torchvision-compatible GoogLeNet (aux heads omitted at inference)."""

    num_classes: int = 1000
    transform_input: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.transform_input:
            # torchvision _transform_input: ImageNet-normalized → ±1 range.
            ch = [
                jnp.expand_dims(x[..., 0], -1) * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
                jnp.expand_dims(x[..., 1], -1) * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
                jnp.expand_dims(x[..., 2], -1) * (0.225 / 0.5) + (0.406 - 0.5) / 0.5,
            ]
            x = jnp.concatenate(ch, axis=-1)
        x = BasicConv(64, (7, 7), stride=2, padding=_pad(3), name="conv1", **kw)(x, train)
        x = max_pool_ceil(x, 3, 2)
        x = BasicConv(64, (1, 1), name="conv2", **kw)(x, train)
        x = BasicConv(192, (3, 3), padding=_pad(1), name="conv3", **kw)(x, train)
        x = max_pool_ceil(x, 3, 2)
        x = _Inception(64, 96, 128, 16, 32, 32, name="inception3a", **kw)(x, train)
        x = _Inception(128, 128, 192, 32, 96, 64, name="inception3b", **kw)(x, train)
        x = max_pool_ceil(x, 3, 2)
        x = _Inception(192, 96, 208, 16, 48, 64, name="inception4a", **kw)(x, train)
        x = _Inception(160, 112, 224, 24, 64, 64, name="inception4b", **kw)(x, train)
        x = _Inception(128, 128, 256, 24, 64, 64, name="inception4c", **kw)(x, train)
        x = _Inception(112, 144, 288, 32, 64, 64, name="inception4d", **kw)(x, train)
        x = _Inception(256, 160, 320, 32, 128, 128, name="inception4e", **kw)(x, train)
        x = max_pool_ceil(x, 2, 2)
        x = _Inception(256, 160, 320, 32, 128, 128, name="inception5a", **kw)(x, train)
        x = _Inception(384, 192, 384, 48, 128, 128, name="inception5b", **kw)(x, train)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1); dropout eval no-op
        return nn.Dense(self.num_classes, name="fc", **kw)(x)
