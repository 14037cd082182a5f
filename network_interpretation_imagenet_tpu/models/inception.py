"""Inception-v3 — torchvision-compatible, Flax/NHWC.

Completes the torchvision-era zoo the reference drives by name
(``models.__dict__[arch](pretrained=True)``,
``bayesian_active_learning_imagenet.py:44-46,391`` — the era's families are
alexnet/densenet/inception/resnet/squeezenet/vgg; this was the last gap).

Faithful to torchvision's graph: BasicConv2d = bias-free conv + BN(eps=1e-3)
+ ReLU; Mixed_5b..7c inception blocks; all pools VALID except the 3×3/1/pad-1
branch averages (count_include_pad=True, flax's default). The train-only
AuxLogits head (a regularizer that never contributes to inference logits) is
intentionally omitted; the converter skips its weights.

``transform_input`` replicates torchvision's pretrained-model input
re-normalization (ImageNet mean/std → ±1 scaling) so converted pretrained
checkpoints see the distribution they were trained on while the data
pipeline keeps emitting standard ImageNet-normalized tensors.

TPU notes: NHWC; the asymmetric 1×7/7×1 factorized convs and branch concats
are XLA-friendly (static shapes, channel-last concat); bf16 compute dtype
feeds the MXU. Native input size 299² (224² also traces — the classifier is
a global mean pool).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

# torchvision BatchNorm2d(eps=0.001) inside BasicConv2d.
_BN_EPS = 1e-3


class BasicConv(nn.Module):
    """torchvision ``BasicConv2d``: conv(bias=False) → BN(eps=1e-3) → ReLU."""

    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Conv(
            self.features, self.kernel, strides=(self.stride, self.stride),
            padding=list(self.padding), use_bias=False, name="conv", **kw,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=_BN_EPS,
            name="bn", **kw,
        )(x)
        return nn.relu(x)


def _pad(p: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    return ((p, p), (p, p))


def _avg3(x: Array) -> Array:
    """torch ``avg_pool2d(x, 3, stride=1, padding=1)`` (count_include_pad)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1))


def _max3s2(x: Array) -> Array:
    """torch ``max_pool2d(x, 3, stride=2)`` (VALID)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b1 = BasicConv(64, (1, 1), name="branch1x1", **kw)(x, train)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1", **kw)(x, train)
        b5 = BasicConv(64, (5, 5), padding=_pad(2), name="branch5x5_2", **kw)(b5, train)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1", **kw)(x, train)
        bd = BasicConv(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2", **kw)(bd, train)
        bd = BasicConv(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3", **kw)(bd, train)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool", **kw)(
            _avg3(x), train
        )
        return jnp.concatenate([b1, b5, bd, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b3 = BasicConv(384, (3, 3), stride=2, name="branch3x3", **kw)(x, train)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1", **kw)(x, train)
        bd = BasicConv(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2", **kw)(bd, train)
        bd = BasicConv(96, (3, 3), stride=2, name="branch3x3dbl_3", **kw)(bd, train)
        return jnp.concatenate([b3, bd, _max3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))  # 1×7 conv
        p71 = ((3, 3), (0, 0))  # 7×1 conv
        b1 = BasicConv(192, (1, 1), name="branch1x1", **kw)(x, train)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1", **kw)(x, train)
        b7 = BasicConv(c7, (1, 7), padding=p17, name="branch7x7_2", **kw)(b7, train)
        b7 = BasicConv(192, (7, 1), padding=p71, name="branch7x7_3", **kw)(b7, train)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1", **kw)(x, train)
        bd = BasicConv(c7, (7, 1), padding=p71, name="branch7x7dbl_2", **kw)(bd, train)
        bd = BasicConv(c7, (1, 7), padding=p17, name="branch7x7dbl_3", **kw)(bd, train)
        bd = BasicConv(c7, (7, 1), padding=p71, name="branch7x7dbl_4", **kw)(bd, train)
        bd = BasicConv(192, (1, 7), padding=p17, name="branch7x7dbl_5", **kw)(bd, train)
        bp = BasicConv(192, (1, 1), name="branch_pool", **kw)(_avg3(x), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b3 = BasicConv(192, (1, 1), name="branch3x3_1", **kw)(x, train)
        b3 = BasicConv(320, (3, 3), stride=2, name="branch3x3_2", **kw)(b3, train)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1", **kw)(x, train)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)),
                       name="branch7x7x3_2", **kw)(b7, train)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)),
                       name="branch7x7x3_3", **kw)(b7, train)
        b7 = BasicConv(192, (3, 3), stride=2, name="branch7x7x3_4", **kw)(b7, train)
        return jnp.concatenate([b3, b7, _max3s2(x)], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        p13 = ((0, 0), (1, 1))  # 1×3 conv
        p31 = ((1, 1), (0, 0))  # 3×1 conv
        b1 = BasicConv(320, (1, 1), name="branch1x1", **kw)(x, train)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1", **kw)(x, train)
        b3 = jnp.concatenate(
            [
                BasicConv(384, (1, 3), padding=p13, name="branch3x3_2a", **kw)(b3, train),
                BasicConv(384, (3, 1), padding=p31, name="branch3x3_2b", **kw)(b3, train),
            ],
            axis=-1,
        )
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1", **kw)(x, train)
        bd = BasicConv(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2", **kw)(bd, train)
        bd = jnp.concatenate(
            [
                BasicConv(384, (1, 3), padding=p13, name="branch3x3dbl_3a", **kw)(bd, train),
                BasicConv(384, (3, 1), padding=p31, name="branch3x3dbl_3b", **kw)(bd, train),
            ],
            axis=-1,
        )
        bp = BasicConv(192, (1, 1), name="branch_pool", **kw)(_avg3(x), train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """torchvision ``inception_v3`` (inference graph, AuxLogits omitted)."""

    num_classes: int = 1000
    transform_input: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.transform_input:
            # torchvision's pretrained-model input re-normalization:
            # undo ImageNet mean/std, rescale to the ±1 range inception
            # was trained on (torchvision Inception3._transform_input).
            ch = [
                x[..., 0] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
                x[..., 1] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
                x[..., 2] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5,
            ]
            x = jnp.stack(ch, axis=-1)
        x = BasicConv(32, (3, 3), stride=2, name="Conv2d_1a_3x3", **kw)(x, train)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3", **kw)(x, train)
        x = BasicConv(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3", **kw)(x, train)
        x = _max3s2(x)
        x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1", **kw)(x, train)
        x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3", **kw)(x, train)
        x = _max3s2(x)
        x = InceptionA(32, name="Mixed_5b", **kw)(x, train)
        x = InceptionA(64, name="Mixed_5c", **kw)(x, train)
        x = InceptionA(64, name="Mixed_5d", **kw)(x, train)
        x = InceptionB(name="Mixed_6a", **kw)(x, train)
        x = InceptionC(128, name="Mixed_6b", **kw)(x, train)
        x = InceptionC(160, name="Mixed_6c", **kw)(x, train)
        x = InceptionC(160, name="Mixed_6d", **kw)(x, train)
        x = InceptionC(192, name="Mixed_6e", **kw)(x, train)
        x = InceptionD(name="Mixed_7a", **kw)(x, train)
        x = InceptionE(name="Mixed_7b", **kw)(x, train)
        x = InceptionE(name="Mixed_7c", **kw)(x, train)
        x = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="fc", **kw)(x)
