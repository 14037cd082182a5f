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


def test_fused_bottleneck_chain_matches_xla(rng):
    """VMEM-resident bottleneck-chain kernel (measured r3 experiment —
    see its module docstring): bit-exact vs the XLA twin in interpret
    mode, including BN folding."""
    from network_interpretation_imagenet_tpu.ops.pallas_bottleneck import (
        bottleneck_chain_xla,
        fold_bn,
        fused_bottleneck_chain,
    )

    B, H, C, P = 4, 8, 32, 8
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
    weights = []
    for _ in range(2):
        # fold a synthetic BN into each conv (exercises fold_bn too)
        w1, b1 = fold_bn(mk(C, P), rng.rand(P) + 0.5, rng.randn(P) * 0.1,
                         rng.randn(P) * 0.1, rng.rand(P) + 0.5)
        w3, b3 = fold_bn(mk(3, 3, P, P), rng.rand(P) + 0.5,
                         rng.randn(P) * 0.1, rng.randn(P) * 0.1,
                         rng.rand(P) + 0.5)
        w2, b2 = fold_bn(mk(P, C), rng.rand(C) + 0.5, rng.randn(C) * 0.1,
                         rng.randn(C) * 0.1, rng.rand(C) + 0.5)
        weights += [jnp.asarray(w1), jnp.asarray(b1), jnp.asarray(w3),
                    jnp.asarray(b3), jnp.asarray(w2), jnp.asarray(b2)]
    x = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32))
    ref = np.asarray(bottleneck_chain_xla(x, tuple(weights)), np.float32)
    got = np.asarray(
        fused_bottleneck_chain(x, tuple(weights), batch_tile=2,
                               interpret=True),
        np.float32,
    )
    np.testing.assert_array_equal(got, ref)
