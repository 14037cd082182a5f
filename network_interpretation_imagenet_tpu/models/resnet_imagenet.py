"""ImageNet ResNet family (18/34/50/101/152) — the flagship classifiers.

The reference consumes these from the torchvision pretrained zoo
(``bayesian_active_learning_imagenet.py:391``:
``models.__dict__[arch](pretrained=True)``). We implement the standard
architecture (He et al. 2015, v1 with post-activation, as in torchvision)
from scratch in Flax/NHWC so torchvision ``state_dict``s convert 1:1
(``utils/convert.py``) when weight files are available, and random-init
models serve the throughput benchmarks.

TPU notes: NHWC everywhere; compute dtype configurable (bf16 feeds the MXU at
2× the f32 rate); the 7×7 stem and 3×3 convs map directly onto XLA's
convolution tiling. Inference is pure — BN uses running stats.
"""

from __future__ import annotations

from typing import Any, Sequence, Type

import jax
import jax.numpy as jnp
from flax import linen as nn

from network_interpretation_imagenet_tpu.models.common import BatchNorm, max_pool_same

Array = jax.Array


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        identity = x
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, name="conv1", **kw,
        )(x)
        out = BatchNorm(use_running_average=not train, name="bn1", **kw)(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="conv2", **kw,
        )(out)
        out = BatchNorm(use_running_average=not train, name="bn2", **kw)(out)
        if self.has_downsample:
            identity = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv", **kw,
            )(x)
            identity = BatchNorm(
                use_running_average=not train, name="downsample_bn", **kw
            )(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    expansion: int = 4
    groups: int = 1          # ResNeXt cardinality (torchvision `groups`)
    base_width: int = 64     # Wide-ResNet doubles this (`width_per_group`)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # torchvision Bottleneck: width = planes * base_width/64 * groups;
        # grouped 3×3 maps to XLA feature_group_count (tiles per-group
        # matmuls on the MXU).
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = nn.Conv(width, (1, 1), use_bias=False, name="conv1", **kw)(x)
        out = BatchNorm(use_running_average=not train, name="bn1", **kw)(out)
        out = nn.relu(out)
        out = nn.Conv(
            width, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False,
            feature_group_count=self.groups, name="conv2", **kw,
        )(out)
        out = BatchNorm(use_running_average=not train, name="bn2", **kw)(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes * self.expansion, (1, 1), use_bias=False, name="conv3", **kw
        )(out)
        out = BatchNorm(use_running_average=not train, name="bn3", **kw)(out)
        if self.has_downsample:
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                name="downsample_conv", **kw,
            )(x)
            identity = BatchNorm(
                use_running_average=not train, name="downsample_bn", **kw
            )(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """torchvision-compatible ResNet."""

    stage_sizes: Sequence[int]
    block: Type[nn.Module]
    num_classes: int = 1000
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, name="conv1", **kw,
        )(x)
        x = BatchNorm(use_running_average=not train, name="bn1", **kw)(x)
        x = nn.relu(x)
        x = max_pool_same(x, 3, 2)

        expansion = 4 if self.block is Bottleneck else 1
        inplanes = 64
        for stage, num_blocks in enumerate(self.stage_sizes):
            planes = 64 * (2**stage)
            stride = 1 if stage == 0 else 2
            for b in range(num_blocks):
                s = stride if b == 0 else 1
                has_ds = s != 1 or inplanes != planes * expansion
                bkw = dict(kw)
                if self.block is Bottleneck:
                    bkw.update(groups=self.groups, base_width=self.base_width)
                x = self.block(
                    planes=planes, stride=s, has_downsample=has_ds,
                    name=f"layer{stage + 1}_{b}", **bkw,
                )(x, train)
                inplanes = planes * expansion

        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        x = nn.Dense(self.num_classes, name="fc", **kw)(x)
        return x


_CONFIGS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
    "resnet152": (Bottleneck, (3, 8, 36, 3)),
    # grouped / wide variants (torchvision resnet.py factory arguments)
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3)),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3)),
    "wide_resnet50_2": (Bottleneck, (3, 4, 6, 3)),
    "wide_resnet101_2": (Bottleneck, (3, 4, 23, 3)),
}

# (groups, base_width) per arch; default (1, 64).
_GROUPS = {
    "resnext50_32x4d": (32, 4),
    "resnext101_32x8d": (32, 8),
    "wide_resnet50_2": (1, 128),
    "wide_resnet101_2": (1, 128),
}


def create_resnet(arch: str, num_classes: int = 1000, **kw) -> ResNet:
    block, stages = _CONFIGS[arch]
    groups, base_width = _GROUPS.get(arch, (1, 64))
    return ResNet(stage_sizes=stages, block=block, num_classes=num_classes,
                  groups=groups, base_width=base_width, **kw)
