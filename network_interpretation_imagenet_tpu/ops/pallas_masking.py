"""Pallas TPU kernel: fused window-mask construction + image masking + cast.

Produces the masked bf16 image batch the classifier consumes directly from
``(image, segments, firsts)`` — one kernel instead of XLA's
broadcast-compare → broadcast-multiply → convert chain.

**NOT used on the hot path — measured and retired (r3).** On a real v5e
chip feeding ResNet-101 the kernel LOSES to the plain-XLA formulation
end-to-end: 3.7k vs 5.9k evals/s at K=512, 4.1k vs 6.8k at K=1024, and it
fails to allocate at K≥2048 — its ``[K, H, W, 3]`` output buffer is laid
out with C=3 lane-padded to 128 (T(8,128)(2,1) tiling → 52 GB at K=4096,
42× the logical bytes), which the consuming conv then re-reads. XLA's own
fusion of compare→multiply→convert into the conv input pipeline is already
optimal here; the masking stage is bandwidth-trivial next to the conv
stack either way. The kernel stays as a correctness-tested Pallas template
(scalar prefetch, VMEM row tiling) for fusions where a custom layout
actually pays. Numbers recorded in docs/PERFORMANCE.md.

Falls back to ``interpret=True`` for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _mask_apply_kernel(firsts_ref, width_ref, image_ref, segments_ref, out_ref):
    """Grid step (k, r): out[k, rows_r] for one mask k and one row tile r."""
    k = pl.program_id(0)
    first = firsts_ref[k]          # scalar-prefetched (SMEM)
    width = width_ref[0]
    seg = segments_ref[:, :]       # [TILE_H, W] int32 row tile, VMEM-resident
    keep = (seg >= first) & (seg < first + width)   # VPU compare
    # Cast to f32 BEFORE inserting the minor dim: Mosaic only supports
    # non-no-op minor-dim insertion for 32-bit types (i1 reshape fails).
    keep_f = keep.astype(jnp.float32)
    img = image_ref[:, :, :]       # [TILE_H, W, C]
    out_ref[0, :, :, :] = (img * keep_f[:, :, None]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def masked_batch_pallas(
    image: Array,
    segments: Array,
    firsts: Array,
    width: Array,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Array:
    """Fused masked-batch builder: f32[H,W,C] × int32[H,W] × int32[K] →
    ``out_dtype``[K,H,W,C]. ``firsts``/``width`` ride scalar prefetch (SMEM)
    so index math is ready before each body runs; image + segment map stay
    pinned in VMEM across the whole grid.
    """
    k = firsts.shape[0]
    h, w, c = image.shape
    # Row-tile the grid so each step's VMEM block stays small (a full
    # [K, H, W, C] output block OOMs the 16MB scoped-VMEM budget when the
    # kernel runs inside a scan body).
    tile_h = h
    for cand in (8, 16, 32):
        if h % cand == 0:
            tile_h = cand
            break
    n_tiles = h // tile_h
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # firsts, width
        grid=(k, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (tile_h, w, c), lambda i, r, *_: (r, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_h, w), lambda i, r, *_: (r, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, c),
            lambda i, r, *_: (i, r, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _mask_apply_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, h, w, c), out_dtype),
        interpret=interpret,
    )(
        jnp.asarray(firsts, jnp.int32),
        jnp.asarray(width, jnp.int32).reshape(1),
        image,
        jnp.asarray(segments, jnp.int32),
    )


def masked_batch_xla(
    image: Array, segments: Array, firsts: Array, width: Array, out_dtype=jnp.bfloat16
) -> Array:
    """Pure-XLA formulation (the engine default; numerically identical)."""
    from network_interpretation_imagenet_tpu.ops import masking

    masks = masking.window_masks(segments, firsts, width)
    return masking.apply_masks(image, masks).astype(out_dtype)
