"""SqueezeNet 1.0 / 1.1 — torchvision-compatible Fire modules in Flax/NHWC.

Rounds out the torchvision zoo the reference drives by name
(``bayesian_active_learning_imagenet.py:44-46``). The classifier is a 1×1
conv + global average pool (no fc), so converted state dicts line up
directly (``utils.convert.convert_squeezenet``).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from network_interpretation_imagenet_tpu.models.common import max_pool_ceil

Array = jax.Array


class Fire(nn.Module):
    squeeze: int
    expand1x1: int
    expand3x3: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze", **kw)(x))
        e1 = nn.relu(nn.Conv(self.expand1x1, (1, 1), name="expand1x1", **kw)(x))
        e3 = nn.relu(
            nn.Conv(self.expand3x3, (3, 3), padding=[(1, 1), (1, 1)],
                    name="expand3x3", **kw)(x)
        )
        return jnp.concatenate([e1, e3], axis=-1)


# (stem kernel, stem channels, [(layer kind, args)...]) per version; "P" is a
# 3×3/2 ceil-mode max-pool, tuples are Fire(squeeze, e1x1, e3x3).
_V10: Sequence = ("P", (16, 64, 64), (16, 64, 64), (32, 128, 128), "P",
                  (32, 128, 128), (48, 192, 192), (48, 192, 192),
                  (64, 256, 256), "P", (64, 256, 256))
_V11: Sequence = ("P", (16, 64, 64), (16, 64, 64), "P", (32, 128, 128),
                  (32, 128, 128), "P", (48, 192, 192), (48, 192, 192),
                  (64, 256, 256), (64, 256, 256))


class SqueezeNet(nn.Module):
    version: str = "1_1"
    num_classes: int = 1000
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # torchvision stems use NO padding (Conv2d default) — flax defaults
        # to SAME, which would shift every downstream feature map
        # (224→112 instead of 224→109 for 1_0).
        if self.version == "1_0":
            x = nn.Conv(96, (7, 7), strides=(2, 2), padding="VALID",
                        name="conv0", **kw)(x)
            plan = _V10
        else:
            x = nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID",
                        name="conv0", **kw)(x)
            plan = _V11
        x = nn.relu(x)
        fire_i = 0
        for step in plan:
            if step == "P":
                # torch MaxPool2d(3, 2, ceil_mode=True)
                x = max_pool_ceil(x, 3, 2)
            else:
                s, e1, e3 = step
                x = Fire(s, e1, e3, name=f"fire{fire_i}",
                         dtype=self.dtype, param_dtype=self.param_dtype)(x)
                fire_i += 1
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Conv(self.num_classes, (1, 1), name="classifier", **kw)(x))
        return jnp.mean(x, axis=(1, 2))  # global average pool → logits
