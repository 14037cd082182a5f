"""Pallas fused-masking kernel vs XLA oracle (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.ops.pallas_masking import (
    masked_batch_pallas,
    masked_batch_xla,
)


def test_pallas_masked_batch_matches_xla(rng):
    img = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    seg = jnp.asarray(rng.randint(0, 12, (16, 16)).astype(np.int32))
    firsts = jnp.asarray([0, 3, 7, 11], jnp.int32)
    width = jnp.int32(4)
    a = masked_batch_pallas(img, seg, firsts, width, interpret=True)
    b = masked_batch_xla(img, seg, firsts, width)
    assert a.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32)
    )


def test_pallas_window_clipping(rng):
    img = jnp.asarray(rng.rand(8, 8, 1).astype(np.float32))
    seg = jnp.asarray((np.arange(64).reshape(8, 8) % 5).astype(np.int32))
    # Window overruns the last segment → clips exactly like the XLA path.
    firsts = jnp.asarray([4], jnp.int32)
    a = masked_batch_pallas(img, seg, firsts, jnp.int32(99), interpret=True)
    b = masked_batch_xla(img, seg, firsts, jnp.int32(99))
    np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))
