"""Pallas TPU kernel: VMEM-resident fused ResNet bottleneck chain.

Why this exists (the round-3 profile, docs/PERFORMANCE.md "Why ~60% MFU"):
ResNet-101's early stages are HBM-bandwidth-bound — every bottleneck block
round-trips its [B, H, W, 4P] activations through HBM ~4× (XLA fuses
elementwise chains into convs but cannot keep a whole residual block's
intermediates on-chip). This kernel runs a chain of N stride-1 bottleneck
blocks (1×1 → 3×3 → 1×1 + residual, BatchNorm folded into weights/biases)
over BATCH TILES: each grid step loads one [Bt, H, W, C] tile into VMEM,
runs the entire chain there — 1×1s as [Bt·H·W, C]×[C, P] MXU matmuls, the
3×3 as nine shifted matmuls against a zero-padded VMEM scratch — and writes
only the final tile. Tiling over batch (never space) means the 3×3 needs no
halo exchange. HBM traffic per chain: read x once + write y once, vs
~4 tensors per block for the unfused path.

BatchNorm folding (inference): w' = w·γ/√(σ²+ε), b' = β − μ·γ/√(σ²+ε),
applied on host by :func:`fold_bn` — the reference's eval-mode BN semantics
exactly.

**Measured on v5e and NOT integrated (r3).** B=2048, vs the flax stage's
per-block share of the committed per-stage profile:

  * stage1 blocks 1-2 (C=256, P=64):  32.7 ms vs ~34.5 ms — 1.06×
  * stage2 blocks 1-3 (C=512, P=128): 44.9 ms vs ~35 ms  — 0.78× (loses)

and Mosaic compile runs ~8 s (2-block) to ~16 min (3-block chain). The
VMEM-residency saving is real but the in-kernel serial structure (the
nine-shifted-matmul 3×3, sub-128-lane matmuls in stage1, no cross-step
software pipelining beyond Mosaic's default double buffering) gives back
more than the saved HBM trips — XLA's conv pipelines were already at the
measured bandwidth roofline (docs/PERFORMANCE.md "Why ~60% MFU IS the
ceiling"). Kept as a correctness-tested experiment: beating XLA here needs
a true pipelined Mosaic conv schedule, not op-level fusion.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def fold_bn(w, gamma, beta, mean, var, eps=1e-5):
    """Fold inference BatchNorm into the preceding conv: returns (w', b')."""
    w = np.asarray(w, np.float32)
    scale = np.asarray(gamma, np.float32) / np.sqrt(
        np.asarray(var, np.float32) + eps
    )
    b = np.asarray(beta, np.float32) - np.asarray(mean, np.float32) * scale
    return (w * scale).astype(np.float32), b.astype(np.float32)


def _chain_kernel(n_blocks, x_ref, *refs):
    """One batch tile through the whole chain. refs = per-block
    (w1[C,P], b1[P], w3[3,3,P,P], b3[P], w2[P,C], b2[C]) then out_ref."""
    out_ref = refs[-1]
    wrefs = refs[:-1]
    x = x_ref[...]                      # [Bt, H, W, C] bf16
    bt, h, w, c = x.shape
    f32 = jnp.float32

    for i in range(n_blocks):
        w1, b1, w3, b3, w2, b2 = (r[...] for r in wrefs[6 * i : 6 * i + 6])
        p = w1.shape[1]
        # 1x1 reduce + BN + relu  (f32 accumulate on the MXU)
        t1 = jax.lax.dot_general(
            x.reshape(bt * h * w, c), w1.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ) + b1
        t1 = jnp.maximum(t1, 0.0).astype(jnp.bfloat16).reshape(bt, h, w, p)
        # 3x3 same-pad conv as 9 shifted matmuls against a padded copy
        t1p = jnp.pad(t1, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.broadcast_to(b3.astype(f32), (bt * h * w, p))
        for di in range(3):
            for dj in range(3):
                window = t1p[:, di:di + h, dj:dj + w, :]
                acc = acc + jax.lax.dot_general(
                    window.reshape(bt * h * w, p),
                    w3[di, dj].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())), preferred_element_type=f32,
                )
        t2 = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)
        # 1x1 expand + BN, residual add, relu
        t3 = jax.lax.dot_general(
            t2, w2.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ) + b2
        x = jnp.maximum(
            t3.reshape(bt, h, w, c) + x.astype(f32), 0.0
        ).astype(jnp.bfloat16)

    out_ref[...] = x


@functools.partial(
    jax.jit, static_argnames=("batch_tile", "interpret")
)
def fused_bottleneck_chain(
    x: Array,
    weights: Sequence[Array],
    batch_tile: int = 8,
    interpret: bool = False,
) -> Array:
    """Run a chain of stride-1 bottleneck blocks entirely in VMEM.

    Args:
      x: bf16[B, H, W, C] input (C = 4·planes).
      weights: flat per-block sequence, 6 arrays per block:
        w1 f32[C, P], b1 f32[P], w3 f32[3, 3, P, P], b3 f32[P],
        w2 f32[P, C], b2 f32[C]  (BN already folded via :func:`fold_bn`).
      batch_tile: images per grid step (VMEM budget ~2·Bt·H·W·C·2 bytes
        plus scratch; 8 fits stage1/2 shapes comfortably).

    Returns bf16[B, H, W, C].
    """
    b, h, w, c = x.shape
    assert b % batch_tile == 0, (b, batch_tile)
    assert len(weights) % 6 == 0
    n_blocks = len(weights) // 6
    grid = (b // batch_tile,)

    in_specs = [
        pl.BlockSpec((batch_tile, h, w, c), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    # Weights replicate to every grid step (index_map -> block 0).
    for wt in weights:
        nd = np.ndim(wt)
        in_specs.append(
            pl.BlockSpec(np.shape(wt), lambda i, _nd=nd: (0,) * _nd,
                         memory_space=pltpu.VMEM)
        )
    out_spec = pl.BlockSpec((batch_tile, h, w, c), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_chain_kernel, n_blocks)
    kwargs = {}
    if not interpret:
        # The chain's in-kernel temporaries (tile + padded t1 + f32 acc)
        # exceed Mosaic's default 16 MB scoped-VMEM budget; raise it — the
        # whole point of the kernel is trading VMEM residency for HBM trips.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.bfloat16),
        interpret=interpret,
        **kwargs,
    )(x.astype(jnp.bfloat16), *weights)


def bottleneck_chain_xla(x, weights):
    """Pure-XLA twin (same folded weights) — the parity oracle and the
    baseline the kernel must beat."""
    n_blocks = len(weights) // 6
    x = x.astype(jnp.bfloat16)
    for i in range(n_blocks):
        w1, b1, w3, b3, w2, b2 = weights[6 * i : 6 * i + 6]
        t1 = jnp.maximum(
            jnp.einsum("bhwc,cp->bhwp", x, w1.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) + b1,
            0.0,
        ).astype(jnp.bfloat16)
        t2 = jax.lax.conv_general_dilated(
            t1, w3.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + b3
        t2 = jnp.maximum(t2, 0.0).astype(jnp.bfloat16)
        t3 = jnp.einsum("bhwp,pc->bhwc", t2, w2.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + b2
        x = jnp.maximum(t3 + x.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
    return x
