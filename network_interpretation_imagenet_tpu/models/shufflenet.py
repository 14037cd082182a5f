"""ShuffleNetV2 (Ma et al. 2018) — torchvision graph, NHWC Flax.

Part of the torchvision-era zoo the reference drives by name
(``models.__dict__[arch](pretrained=True)``,
``bayesian_active_learning_imagenet.py:391``). Channel split + shuffle
units: the split/concat/shuffle are free layout ops in XLA (channel-last
reshapes), depthwise 3×3s map to ``feature_group_count == channels``, and
the 1×1 convs are MXU matmuls.

Flax child names mirror torchvision's ``branch{1,2}.{i}`` Sequential
indices as ``branch{1,2}_{i}`` so state dicts convert mechanically.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from network_interpretation_imagenet_tpu.models.common import BatchNorm

Array = jax.Array

# torchvision _shufflenetv2 factory: stages_repeats [4, 8, 4] and
# stages_out_channels per width multiplier.
_STAGE_OUT = {
    "shufflenet_v2_x0_5": (24, 48, 96, 192, 1024),
    "shufflenet_v2_x1_0": (24, 116, 232, 464, 1024),
    "shufflenet_v2_x1_5": (24, 176, 352, 704, 1024),
    "shufflenet_v2_x2_0": (24, 244, 488, 976, 2048),
}
_REPEATS = (4, 8, 4)


def channel_shuffle(x: Array, groups: int) -> Array:
    """torch ``channel_shuffle``: interleave ``groups`` channel blocks
    (NHWC: reshape → transpose the two trailing channel factors)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class _InvertedResidual(nn.Module):
    """torchvision shufflenetv2 ``InvertedResidual`` unit."""

    inp: int
    oup: int
    stride: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        branch_features = self.oup // 2

        def conv1x1(y, features, name):
            return nn.Conv(features, (1, 1), use_bias=False, name=name, **kw)(y)

        def dwconv3x3(y, features, stride, name):
            return nn.Conv(
                features, (3, 3), strides=(stride, stride),
                padding=[(1, 1), (1, 1)], feature_group_count=features,
                use_bias=False, name=name, **kw,
            )(y)

        def bn(y, name):
            return BatchNorm(use_running_average=not train, name=name, **kw)(y)

        if self.stride > 1:
            b1 = dwconv3x3(x, self.inp, self.stride, "branch1_0")
            b1 = bn(b1, "branch1_1")
            b1 = nn.relu(bn(conv1x1(b1, branch_features, "branch1_2"),
                            "branch1_3"))
            b2_in = x
        else:
            b1, b2_in = jnp.split(x, 2, axis=-1)

        b2 = nn.relu(bn(conv1x1(b2_in, branch_features, "branch2_0"),
                        "branch2_1"))
        b2 = bn(dwconv3x3(b2, branch_features, self.stride, "branch2_3"),
                "branch2_4")
        b2 = nn.relu(bn(conv1x1(b2, branch_features, "branch2_5"),
                        "branch2_6"))
        return channel_shuffle(jnp.concatenate([b1, b2], axis=-1), 2)


class ShuffleNetV2(nn.Module):
    """torchvision-compatible ShuffleNetV2."""

    stage_out: Sequence[int] = _STAGE_OUT["shufflenet_v2_x1_0"]
    num_classes: int = 1000
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.Conv(self.stage_out[0], (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    name="conv1_0", **kw)(x)
        x = BatchNorm(use_running_average=not train, name="conv1_1", **kw)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        c_in = self.stage_out[0]
        for si, (repeats, c_out) in enumerate(
            zip(_REPEATS, self.stage_out[1:4]), start=2
        ):
            for b in range(repeats):
                x = _InvertedResidual(
                    inp=c_in, oup=c_out, stride=2 if b == 0 else 1,
                    name=f"stage{si}_{b}", **kw,
                )(x, train)
                c_in = c_out
        x = nn.Conv(self.stage_out[4], (1, 1), use_bias=False,
                    name="conv5_0", **kw)(x)
        x = BatchNorm(use_running_average=not train, name="conv5_1", **kw)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))  # x.mean([2, 3])
        return nn.Dense(self.num_classes, name="fc", **kw)(x)
