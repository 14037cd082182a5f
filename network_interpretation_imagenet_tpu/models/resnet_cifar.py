"""CIFAR ResNet-6N+2 with stochastic depth — TPU re-design of the reference.

Reference: ``models/resnet.py:10-162``. Faithfully reproduced semantics:
  * Pre-branch topology of ``BasicBlockWithDeathRate.forward``
    (``models/resnet.py:26-42``): the residual *branch* reads the block input
    BEFORE downsampling (its first conv carries the stride), while the
    identity path is the parameter-free ``DownsampleB`` (avg-pool + zero-
    channel concat, ``models/resnet.py:67-76``). When stochastic depth drops
    a block at train time, the output is the identity path WITHOUT the final
    relu — exactly as the reference.
  * Train-time branch rescale by ``1/(1-death_rate)`` (``models/resnet.py:38``).
  * Death-rate schedules ``uniform`` / ``linear`` (``models/resnet.py:149-162``
    — including the reference's ``nblocks = (depth-2)//2`` quirk in
    ``createModel``; the model itself only consumes the first ``3n`` rates).

TPU-first differences: NHWC layout, stochastic depth driven by an explicit
PRNG key through Flax RNG collections (no host ``torch.rand`` sync), bf16
compute option.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from network_interpretation_imagenet_tpu.models.common import BatchNorm

Array = jax.Array


class DownsampleB(nn.Module):
    """Parameter-free shortcut: avg-pool(stride) then pad channels with zeros
    (reference ``models/resnet.py:67-76`` concat of ``x.mul(0)`` copies)."""

    out_channels: int
    stride: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.stride > 1:
            x = nn.avg_pool(
                x, (self.stride, self.stride), strides=(self.stride, self.stride)
            )
        in_c = x.shape[-1]
        reps = self.out_channels // in_c
        if reps > 1:
            zeros = jnp.zeros_like(x)
            x = jnp.concatenate([x] + [zeros] * (reps - 1), axis=-1)
        return x


class BasicBlockStochastic(nn.Module):
    """Basic block with stochastic depth (reference ``models/resnet.py:10-42``)."""

    planes: int
    stride: int = 1
    death_rate: float = 0.0
    has_downsample: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        branch_in = x  # pre-downsample input feeds the residual branch
        if self.has_downsample:
            x = DownsampleB(self.planes, self.stride, name="downsample")(x)

        def compute_branch() -> Array:
            r = nn.Conv(
                self.planes,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=[(1, 1), (1, 1)],
                use_bias=False,
                name="conv1",
                **kw,
            )(branch_in)
            r = BatchNorm(use_running_average=not train, name="bn1", **kw)(r)
            r = nn.relu(r)
            r = nn.Conv(
                self.planes,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                use_bias=False,
                name="conv2",
                **kw,
            )(r)
            r = BatchNorm(use_running_average=not train, name="bn2", **kw)(r)
            if train and self.death_rate > 0:
                r = r / (1.0 - self.death_rate)
            return r

        if train and self.death_rate > 0:
            # Stochastic depth: drop the branch with prob death_rate. Branch
            # params/BN stats are still traced (both cond arms execute the
            # module init) — we gate the *value*, keeping jit-static shapes.
            rng = self.make_rng("stochastic_depth")
            alive = jax.random.uniform(rng, ()) >= self.death_rate
            branch = compute_branch()
            out = jnp.where(alive, nn.relu(x + branch), x)
            return out
        out = nn.relu(x + compute_branch())
        return out


class ResNetCifar(nn.Module):
    """ResNet-6N+2 for CIFAR/SVHN (reference ``models/resnet.py:79-146``)."""

    depth: int = 56
    num_classes: int = 10
    death_rates: Optional[Sequence[float]] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        assert (self.depth - 2) % 6 == 0, "depth should be 6N+2"
        n = (self.depth - 2) // 6
        rates = list(self.death_rates) if self.death_rates is not None else [0.0] * (3 * n)
        assert len(rates) >= 3 * n
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        x = nn.Conv(
            16, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv1", **kw
        )(x)
        x = BatchNorm(use_running_average=not train, name="bn1", **kw)(x)
        x = nn.relu(x)

        inplanes = 16
        for stage, planes in enumerate((16, 32, 64)):
            stride = 1 if stage == 0 else 2
            for block in range(n):
                s = stride if block == 0 else 1
                has_ds = s != 1 or inplanes != planes
                x = BasicBlockStochastic(
                    planes=planes,
                    stride=s,
                    death_rate=rates[stage * n + block],
                    has_downsample=has_ds,
                    name=f"layer{stage + 1}_{block}",
                    **kw,
                )(x, train)
                inplanes = planes

        x = nn.avg_pool(x, (8, 8), strides=(8, 8))  # reference avgpool(8)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.num_classes, name="fc", **kw)(x)
        return x


def death_rates_for(
    depth: int, death_mode: str = "none", death_rate: float = 0.5
) -> Optional[list]:
    """Reference ``createModel`` schedule (``models/resnet.py:149-162``).

    Note the reference computes ``nblocks = (depth-2)//2`` (not ``//6``) and
    the model consumes only the first ``3n``; we generate the same prefix.
    """
    nblocks = (depth - 2) // 2
    if death_mode == "uniform":
        return [death_rate] * nblocks
    if death_mode == "linear":
        return [float(i + 1) * death_rate / float(nblocks) for i in range(nblocks)]
    return None
