"""DenseNet-BC (reference ``models/densenet.py:12-121``), Flax/NHWC.

Reproduced semantics: 3×3 stem conv (the reference's CIFAR-style stem, not
torchvision's 7×7 ImageNet stem — ``models/densenet.py:66``), dense layers
BN→ReLU→1×1(bn_size·k)→BN→ReLU→3×3(k) with concat, torchvision
``_Transition`` (BN→ReLU→1×1→avgpool2), final BN→ReLU→avgpool(avgpool_size)
→Dense. ``avgpool_size`` 7 for imagenet / 8 otherwise (``:105``); with
``bn_size<=0`` dense layers collapse to a single 3×3 conv (``:25-27``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from network_interpretation_imagenet_tpu.models.common import BatchNorm

Array = jax.Array


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int
    drop_rate: float = 0.0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = BatchNorm(use_running_average=not train, name="norm1", **kw)(x)
        y = nn.relu(y)
        if self.bn_size > 0:
            y = nn.Conv(
                self.bn_size * self.growth_rate, (1, 1), use_bias=False,
                name="conv1", **kw,
            )(y)
            y = BatchNorm(use_running_average=not train, name="norm2", **kw)(y)
            y = nn.relu(y)
            y = nn.Conv(
                self.growth_rate, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=False, name="conv2", **kw,
            )(y)
        else:
            y = nn.Conv(
                self.growth_rate, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=False, name="conv1", **kw,
            )(y)
        if self.drop_rate > 0 and train:
            y = nn.Dropout(rate=self.drop_rate, deterministic=False)(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    out_features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = BatchNorm(use_running_average=not train, name="norm", **kw)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_features, (1, 1), use_bias=False, name="conv", **kw)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    growth_rate: int = 12
    block_config: Sequence[int] = (16, 16, 16)
    compression: float = 0.5
    num_init_features: int = 24
    bn_size: int = 4
    drop_rate: float = 0.0
    avgpool_size: int = 8
    num_classes: int = 10
    # torchvision ImageNet stem (7×7/2 conv + 3×3/2 maxpool) instead of the
    # reference's CIFAR-style 3×3 stem — used by densenet121/169/201.
    imagenet_stem: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.imagenet_stem:
            x = nn.Conv(
                self.num_init_features, (7, 7), strides=(2, 2),
                padding=[(3, 3), (3, 3)], use_bias=False, name="conv0", **kw,
            )(x)
            x = BatchNorm(use_running_average=not train, name="norm0", **kw)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        else:
            x = nn.Conv(
                self.num_init_features, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=False, name="conv0", **kw,
            )(x)
            x = BatchNorm(use_running_average=not train, name="norm0", **kw)(x)
            x = nn.relu(x)

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            for j in range(num_layers):
                x = DenseLayer(
                    self.growth_rate, self.bn_size, self.drop_rate,
                    name=f"denseblock{i + 1}_layer{j + 1}", **kw,
                )(x, train)
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                num_features = int(num_features * self.compression)
                x = Transition(num_features, name=f"transition{i + 1}", **kw)(x, train)

        x = BatchNorm(use_running_average=not train, name="norm5", **kw)(x)
        x = nn.relu(x)
        x = nn.avg_pool(
            x, (self.avgpool_size, self.avgpool_size),
            strides=(self.avgpool_size, self.avgpool_size),
        )
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(self.num_classes, name="classifier", **kw)(x)


_TV_CONFIGS = {
    "densenet121": (6, 12, 24, 16),
    "densenet169": (6, 12, 32, 32),
    "densenet201": (6, 12, 48, 32),
}


def create_densenet_torchvision(arch: str, num_classes: int = 1000, **kw) -> DenseNet:
    """torchvision DenseNet-121/169/201 (growth 32, 64 init features, 7×7
    stem) — the zoo members the reference drives by name
    (``bayesian_active_learning_imagenet.py:44-46``)."""
    return DenseNet(
        growth_rate=32, block_config=_TV_CONFIGS[arch], compression=0.5,
        num_init_features=64, bn_size=4, avgpool_size=7,
        num_classes=num_classes, imagenet_stem=True, **kw,
    )


def create_densenet(
    data: str = "cifar10", depth: int = 100, growth_rate: int = 12,
    num_classes: int = 10, drop_rate: float = 0.0, num_init_features: int = 24,
    compression: float = 0.5, bn_size: int = 4, **kw,
) -> DenseNet:
    """Reference ``createModel`` (``models/densenet.py:102-120``)."""
    assert (depth - 4) % 3 == 0, "depth should be 3N+4"
    avgpool_size = 7 if data == "imagenet" else 8
    n = (depth - 4) // 3
    if bn_size > 0:
        n //= 2
    return DenseNet(
        growth_rate=growth_rate, block_config=(n, n, n), compression=compression,
        num_init_features=num_init_features, bn_size=bn_size, drop_rate=drop_rate,
        avgpool_size=avgpool_size, num_classes=num_classes, **kw,
    )
