"""VGG-11/13/16/19 (±BN) — rounds out the torchvision-style zoo the reference
drives via ``models.__dict__[arch]`` (``bayesian_active_learning_imagenet.py:44-46``,
BASELINE.json north-star: "ResNet/DenseNet/VGG classifiers").

torchvision-compatible topology (features → flatten 7·7·512 → 4096-4096-K
classifier) in Flax/NHWC so state_dicts convert 1:1.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from network_interpretation_imagenet_tpu.models.common import BatchNorm

Array = jax.Array

_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512,
              512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    cfg: Sequence[Union[int, str]]
    batch_norm: bool = False
    num_classes: int = 1000
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        conv_i = 0
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    int(v), (3, 3), padding=[(1, 1), (1, 1)],
                    name=f"conv{conv_i}", **kw,
                )(x)
                if self.batch_norm:
                    x = BatchNorm(
                        use_running_average=not train, name=f"bn{conv_i}", **kw
                    )(x)
                x = nn.relu(x)
                conv_i += 1
        # torch flattens NCHW as C*H*W; transpose so converted fc weights match.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape((x.shape[0], -1))
        x = nn.Dense(4096, name="fc0", **kw)(x)
        x = nn.relu(x)
        x = nn.Dense(4096, name="fc1", **kw)(x)
        x = nn.relu(x)
        return nn.Dense(self.num_classes, name="fc2", **kw)(x)


def create_vgg(arch: str, num_classes: int = 1000, **kw) -> VGG:
    batch_norm = arch.endswith("_bn")
    base = arch[:-3] if batch_norm else arch
    return VGG(cfg=_CFGS[base], batch_norm=batch_norm, num_classes=num_classes, **kw)
