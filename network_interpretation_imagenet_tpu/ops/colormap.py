"""JET colormap as a pure JAX op.

The reference colorizes every heatmap with ``cv2.applyColorMap(...,
cv2.COLORMAP_JET)`` (e.g. ``gp_regression.py:121``). This is the same
piecewise-linear jet ramp computed on device, returning BGR uint8 to match
OpenCV's channel order for drop-in artifact parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _jet_channel(v: Array, center: float) -> Array:
    """Classic jet ramp: triangular bump of half-width 0.25 around center."""
    return jnp.clip(1.5 - jnp.abs(4.0 * v - center), 0.0, 1.0)


def apply_jet(gray_u8: Array) -> Array:
    """uint8[H, W] → uint8[H, W, 3] BGR jet colormap."""
    v = gray_u8.astype(jnp.float32) / 255.0
    r = _jet_channel(v, 3.0)
    g = _jet_channel(v, 2.0)
    b = _jet_channel(v, 1.0)
    bgr = jnp.stack([b, g, r], axis=-1)
    return (bgr * 255.0).astype(jnp.uint8)
