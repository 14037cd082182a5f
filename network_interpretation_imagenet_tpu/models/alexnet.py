"""AlexNet — torchvision-compatible topology in Flax/NHWC.

The reference drives any torchvision classifier by name
(``models.__dict__[arch](pretrained=True)``,
``bayesian_active_learning_imagenet.py:44-46,391``); AlexNet is the smallest
member of that zoo and a common fast-iteration choice for saliency work.
State dicts convert 1:1 (``utils.convert.convert_alexnet``).

Dropout is inference-disabled by default (`train=False`), matching the
reference's eval-mode usage.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class AlexNet(nn.Module):
    num_classes: int = 1000
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # torchvision features: indices 0,3,6,8,10 are convs.
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=[(2, 2), (2, 2)],
                    name="conv0", **kw)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=[(2, 2), (2, 2)], name="conv1", **kw)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=[(1, 1), (1, 1)], name="conv2", **kw)(x)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="conv3", **kw)(x)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="conv4", **kw)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        # torchvision AdaptiveAvgPool2d((6,6)) is the identity at 224² input
        # (feature map is already 6×6); flatten in torch's C,H,W order so
        # converted fc weights line up.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape((x.shape[0], -1))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, name="fc0", **kw)(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, name="fc1", **kw)(x))
        return nn.Dense(self.num_classes, name="fc2", **kw)(x)
