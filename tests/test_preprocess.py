"""Preprocessing + colormap + viz tests."""

import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from network_interpretation_imagenet_tpu.ops import colormap, preprocess
from network_interpretation_imagenet_tpu.saliency.viz import mark_boundaries


def test_resize_shorter_side_aspect():
    img = jnp.zeros((100, 200, 3))
    out = preprocess.resize_shorter_side(img, 50)
    assert out.shape == (50, 100, 3)
    out2 = preprocess.resize_shorter_side(jnp.zeros((200, 100, 3)), 50)
    assert out2.shape == (100, 50, 3)


def test_center_crop_exact():
    img = jnp.arange(6 * 8).reshape(6, 8, 1).astype(jnp.float32)
    out = preprocess.center_crop(img, 4)
    assert out.shape == (4, 4, 1)
    # rows 1..4, cols 2..5 (torchvision round((dim-size)/2))
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 1 * 8 + 2)


def test_center_crop_pads_small_images():
    out = preprocess.center_crop(jnp.ones((2, 2, 1)), 4)
    assert out.shape == (4, 4, 1)
    assert float(out.sum()) == 4.0  # original pixels survive


def test_normalize_roundtrip(rng):
    img = jnp.asarray(rng.rand(8, 8, 3).astype(np.float32))
    n = preprocess.normalize(img, IMAGENET_MEAN, IMAGENET_STD)
    back = preprocess.denormalize(n, IMAGENET_MEAN, IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-6)


def test_to_display_uint8_range(rng):
    img = jnp.asarray(rng.randn(8, 8, 3).astype(np.float32))
    disp = np.asarray(preprocess.to_display_uint8(img))
    assert disp.dtype == np.uint8
    assert disp.min() == 0 and disp.max() == 255


def test_standard_eval_pipeline_shapes(rng):
    u8 = jnp.asarray((rng.rand(300, 400, 3) * 255).astype(np.uint8))
    out = preprocess.standard_eval_pipeline(u8, 224, IMAGENET_MEAN, IMAGENET_STD)
    assert out.shape == (224, 224, 3)
    assert -4 < float(out.mean()) < 4


def test_jet_colormap_endpoints():
    gray = jnp.asarray([[0, 128, 255]], jnp.uint8)
    bgr = np.asarray(colormap.apply_jet(gray))[0]
    # Low → blue dominant; high → red dominant; middle → green dominant.
    assert bgr[0][0] > bgr[0][2]          # B > R at 0
    assert bgr[1][1] >= max(bgr[1][0], bgr[1][2]) - 1  # G max at mid
    assert bgr[2][2] > bgr[2][0]          # R > B at 255


def test_mark_boundaries():
    seg = np.zeros((6, 6), np.int32)
    seg[:, 3:] = 1
    img = np.zeros((6, 6), np.uint8)
    out = mark_boundaries(img, seg, color=(1.0, 0.0, 0.0))
    # Boundary column(s) are painted.
    assert out[0, 2, 0] == 1.0 or out[0, 3, 0] == 1.0
    assert out[0, 0, 0] == 0.0
