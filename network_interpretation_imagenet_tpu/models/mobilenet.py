"""MobileNetV2 (Sandler et al. 2018) — torchvision graph, NHWC Flax.

Part of the torchvision-era zoo the reference selects from via
``models.__dict__[arch](pretrained=True)``
(``bayesian_active_learning_imagenet.py:391``). Inverted residuals with
ReLU6; depthwise 3×3s map to XLA ``feature_group_count == channels``
(channel-wise VPU work, no MXU), the 1×1 expand/project convs are plain
MXU matmuls.

Layer names mirror torchvision ``mobilenetv2.py`` so state dicts convert
mechanically (``utils/convert.py::convert_mobilenet_v2``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from network_interpretation_imagenet_tpu.models.common import BatchNorm

Array = jax.Array

# torchvision inverted_residual_setting: (expand t, channels c, repeats n,
# first-stride s)
_SETTINGS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def _relu6(x: Array) -> Array:
    return jnp.minimum(nn.relu(x), 6.0)


class _ConvBNReLU(nn.Module):
    """torchvision ConvBNReLU: conv (name "0") + BN (name "1") + ReLU6."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=[(pad, pad)] * 2,
            feature_group_count=self.groups, use_bias=False, name="0", **kw,
        )(x)
        x = BatchNorm(use_running_average=not train, name="1", **kw)(x)
        return _relu6(x)


class _InvertedResidual(nn.Module):
    """torchvision InvertedResidual; child names inside ``conv`` follow the
    expand_ratio==1 / !=1 split exactly."""

    inp: int
    oup: int
    stride: int
    expand_ratio: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        hidden = int(round(self.inp * self.expand_ratio))
        use_res = self.stride == 1 and self.inp == self.oup
        y = x
        i = 0
        if self.expand_ratio != 1:  # pointwise expand
            y = _ConvBNReLU(hidden, kernel=1, name=f"conv_{i}", **kw)(y, train)
            i += 1
        # depthwise 3×3
        y = _ConvBNReLU(
            hidden, kernel=3, stride=self.stride, groups=hidden,
            name=f"conv_{i}", **kw,
        )(y, train)
        i += 1
        # linear projection: bare conv + BN, no activation
        y = nn.Conv(self.oup, (1, 1), use_bias=False, name=f"conv_{i}", **kw)(y)
        y = BatchNorm(use_running_average=not train, name=f"conv_{i + 1}", **kw)(y)
        return x + y if use_res else y


class MobileNetV2(nn.Module):
    """torchvision-compatible MobileNetV2 (width_mult=1.0)."""

    num_classes: int = 1000
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = _ConvBNReLU(32, kernel=3, stride=2, name="features_0", **kw)(x, train)
        c_in = 32
        idx = 1
        for t, c, n, s in _SETTINGS:
            for b in range(n):
                x = _InvertedResidual(
                    inp=c_in, oup=c, stride=s if b == 0 else 1,
                    expand_ratio=t, name=f"features_{idx}", **kw,
                )(x, train)
                c_in = c
                idx += 1
        x = _ConvBNReLU(1280, kernel=1, name=f"features_{idx}", **kw)(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global pool (dropout is eval no-op)
        return nn.Dense(self.num_classes, name="classifier_1", **kw)(x)
