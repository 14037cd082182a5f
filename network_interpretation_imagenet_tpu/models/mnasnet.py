"""MNASNet (Tan et al. 2019) — torchvision graph, NHWC Flax.

Part of the torchvision-era zoo the reference drives by name
(``models.__dict__[arch](pretrained=True)``,
``bayesian_active_learning_imagenet.py:391``). MBConv inverted residuals
with 3×3/5×5 depthwise kernels; the 1×1 expand/project convs are MXU
matmuls, depthwise stages are VPU work via ``feature_group_count``.

Flax child names flatten torchvision's ``layers.{i}`` Sequential indices to
``layers_{i}`` (and stack members to ``layers_{i}_{b}``) so state dicts
convert mechanically through the generic walker in ``utils/convert.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from network_interpretation_imagenet_tpu.models.common import BatchNorm

Array = jax.Array

# torchvision _get_depths(alpha): base [32, 16, 24, 40, 80, 96, 192, 320]
# scaled then rounded to a multiple of 8 with round-up bias 0.9.
_BASE_DEPTHS = (32, 16, 24, 40, 80, 96, 192, 320)
# stacks: (kernel, stride, expansion, repeats) for layers.8..13
_STACKS = ((3, 2, 3, 3), (5, 2, 3, 3), (5, 2, 6, 3),
           (3, 1, 6, 2), (5, 2, 6, 4), (3, 1, 6, 1))


def _round_to_8(val: float) -> int:
    new_val = max(8, int(val + 8 / 2) // 8 * 8)
    return new_val if new_val >= 0.9 * val else new_val + 8


def get_depths(alpha: float):
    return [_round_to_8(d * alpha) for d in _BASE_DEPTHS]


class _InvertedResidual(nn.Module):
    """torchvision mnasnet ``_InvertedResidual`` (MBConv)."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expansion: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        mid = self.in_ch * self.expansion
        pad = self.kernel // 2

        def bn(y, name):
            return BatchNorm(use_running_average=not train, name=name, **kw)(y)

        y = nn.relu(bn(nn.Conv(mid, (1, 1), use_bias=False,
                               name="layers_0", **kw)(x), "layers_1"))
        y = nn.relu(bn(nn.Conv(
            mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=[(pad, pad)] * 2, feature_group_count=mid, use_bias=False,
            name="layers_3", **kw,
        )(y), "layers_4"))
        y = bn(nn.Conv(self.out_ch, (1, 1), use_bias=False,
                       name="layers_6", **kw)(y), "layers_7")
        if self.in_ch == self.out_ch and self.stride == 1:
            y = x + y
        return y


class MNASNet(nn.Module):
    """torchvision-compatible MNASNet (alpha-scaled depths)."""

    alpha: float = 1.0
    num_classes: int = 1000
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        d = get_depths(self.alpha)

        def bn(y, name):
            return BatchNorm(use_running_average=not train, name=name, **kw)(y)

        # stem: conv/bn/relu, depthwise 3×3, project to d[1]
        x = nn.relu(bn(nn.Conv(d[0], (3, 3), strides=(2, 2),
                               padding=[(1, 1)] * 2, use_bias=False,
                               name="layers_0", **kw)(x), "layers_1"))
        x = nn.relu(bn(nn.Conv(d[0], (3, 3), padding=[(1, 1)] * 2,
                               feature_group_count=d[0], use_bias=False,
                               name="layers_3", **kw)(x), "layers_4"))
        x = bn(nn.Conv(d[1], (1, 1), use_bias=False,
                       name="layers_6", **kw)(x), "layers_7")
        c_in = d[1]
        for li, ((k, s, e, r), c_out) in enumerate(zip(_STACKS, d[2:]), start=8):
            for b in range(r):
                x = _InvertedResidual(
                    in_ch=c_in, out_ch=c_out, kernel=k,
                    stride=s if b == 0 else 1, expansion=e,
                    name=f"layers_{li}_{b}", **kw,
                )(x, train)
                c_in = c_out
        x = nn.relu(bn(nn.Conv(1280, (1, 1), use_bias=False,
                               name="layers_14", **kw)(x), "layers_15"))
        x = jnp.mean(x, axis=(1, 2))  # x.mean([2, 3]); dropout eval no-op
        return nn.Dense(self.num_classes, name="classifier_1", **kw)(x)
