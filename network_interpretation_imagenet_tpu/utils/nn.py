"""Small NN utilities mirroring the reference's ``utils.py`` helpers.

* :func:`ste_round` — straight-through-estimator rounding (reference
  ``Binarized``, ``utils.py:12-18``: forward = round, backward = identity).
* :func:`entropy_loss` — mean softmax entropy (reference ``Entropy``,
  ``utils.py:20-26``).
* :func:`kaiming_normal_init` — He-normal initializer matching torch's
  ``nn.init.kaiming_normal`` used by ``weight_init`` (``utils.py:32-39``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


@jax.custom_vjp
def ste_round(x: Array) -> Array:
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_fwd, _ste_bwd)


def entropy_loss(logits: Array) -> Array:
    """Mean (over batch) entropy of softmax(logits): −Σ p log p."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return jnp.mean(-jnp.sum(p * logp, axis=-1))


def kaiming_normal_init(dtype=jnp.float32):
    """torch ``kaiming_normal_`` (fan_in, a=0 → gain √2) for NHWC conv
    kernels and dense layers."""
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal", dtype=dtype)
