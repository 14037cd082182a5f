"""Segmentation tests: contract (contiguous labels), behavior on synthetic
block images, native-vs-numpy felzenszwalb agreement, SLIC device path."""

import numpy as np
import pytest

from network_interpretation_imagenet_tpu.config import SegmentConfig
from network_interpretation_imagenet_tpu.segment import (
    felzenszwalb,
    relabel_sequential,
    segment_image,
    slic,
)
from network_interpretation_imagenet_tpu.segment.felzenszwalb import (
    _felzenszwalb_numpy,
    _load_native,
    _smooth,
)


def _block_image(n=32):
    """Four flat color quadrants — unambiguous segmentation."""
    img = np.zeros((n, n, 3), np.uint8)
    img[: n // 2, : n // 2] = (255, 0, 0)
    img[: n // 2, n // 2 :] = (0, 255, 0)
    img[n // 2 :, : n // 2] = (0, 0, 255)
    img[n // 2 :, n // 2 :] = (255, 255, 0)
    return img


def test_relabel_sequential_contract():
    labels = np.array([[5, 5, 9], [9, 2, 2]])
    out = relabel_sequential(labels)
    np.testing.assert_array_equal(out, [[0, 0, 1], [1, 2, 2]])
    assert out.dtype == np.int32


def test_felzenszwalb_blocks_numpy():
    seg = felzenszwalb(_block_image(), scale=1.0, sigma=0.0, min_size=5, backend="numpy")
    assert seg.dtype == np.int32
    assert seg.shape == (32, 32)
    # Four clean quadrants.
    assert len(np.unique(seg)) == 4
    assert len(np.unique(seg[:16, :16])) == 1
    assert len(np.unique(seg[16:, 16:])) == 1
    # Contiguous raster-order labels.
    np.testing.assert_array_equal(np.unique(seg), np.arange(4))
    assert seg[0, 0] == 0


def test_felzenszwalb_min_size_merges():
    img = _block_image(16)
    img[4:6, 4:6] = (128, 128, 128)  # 4-pixel speck
    seg_no_min = felzenszwalb(img, scale=0.5, sigma=0.0, min_size=1, backend="numpy")
    seg_min = felzenszwalb(img, scale=0.5, sigma=0.0, min_size=10, backend="numpy")
    assert len(np.unique(seg_min)) < len(np.unique(seg_no_min))


def test_native_matches_numpy():
    lib = _load_native()
    if lib is None:
        pytest.skip("native kernel not buildable")
    rng = np.random.RandomState(0)
    img = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
    a = felzenszwalb(img, scale=50.0, sigma=0.5, min_size=10, backend="native")
    b = felzenszwalb(img, scale=50.0, sigma=0.5, min_size=10, backend="numpy")
    # Same partition — labels may permute only if tie-handling differed;
    # stable sorts on identical input should produce identical labels.
    np.testing.assert_array_equal(a, b)


def test_smooth_is_noop_for_zero_sigma():
    img = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    np.testing.assert_array_equal(_smooth(img, 0.0), img)


def test_slic_blocks():
    seg = np.asarray(slic(_block_image(), n_segments=4, compactness=1.0, num_iters=10))
    assert seg.shape == (32, 32)
    # Each quadrant should be internally uniform.
    for quad in (seg[:16, :16], seg[:16, 16:], seg[16:, :16], seg[16:, 16:]):
        assert len(np.unique(quad)) == 1
    assert len(np.unique(seg)) == 4


def test_slic_label_count_bounded():
    rng = np.random.RandomState(1)
    img = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    seg = np.asarray(slic(img, n_segments=16, num_iters=5))
    assert seg.max() < 16
    assert seg.min() >= 0


def test_segment_image_dispatcher_slic():
    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=5)
    seg = segment_image(_block_image(24), cfg)
    assert seg.dtype == np.int32
    uniq = np.unique(seg)
    np.testing.assert_array_equal(uniq, np.arange(len(uniq)))  # contiguous


def test_segment_image_dispatcher_felzenszwalb():
    cfg = SegmentConfig(method="felzenszwalb", scale=1.0, sigma=0.0, min_size=5)
    seg = segment_image(_block_image(16), cfg)
    uniq = np.unique(seg)
    np.testing.assert_array_equal(uniq, np.arange(len(uniq)))


def test_segment_image_adaptive_scale_small_display():
    """scale=None (the default) area-adapts the reference's 224²-calibrated
    scale=100: a real photograph at 32×32 must segment into several
    regions, where explicit scale=100 collapses it to 1-2 (every knockout/
    window mask then identical — the degenerate mask-label pipelines the
    round-5 method study exposed). At 224² None resolves to exactly 100,
    so ImageNet-scale outputs are bit-identical to the reference params."""
    import glob

    from PIL import Image

    jpeg = sorted(glob.glob(
        "tests/fixtures/imagenet_loc/**/*.JPEG", recursive=True))[0]
    disp = np.asarray(
        Image.open(jpeg).convert("RGB").resize((32, 32)), np.uint8)
    adaptive = segment_image(disp, SegmentConfig(min_size=10))
    explicit = segment_image(disp, SegmentConfig(scale=100.0, min_size=10))
    assert int(adaptive.max()) + 1 > 4
    assert int(adaptive.max()) > int(explicit.max())
    # 224²: adaptive == reference scale=100, bit-identical.
    disp224 = np.asarray(
        Image.open(jpeg).convert("RGB").resize((224, 224)), np.uint8)
    a224 = segment_image(disp224, SegmentConfig())
    e224 = segment_image(disp224, SegmentConfig(scale=100.0))
    np.testing.assert_array_equal(a224, e224)


def test_native_matches_numpy_on_tie_heavy_image():
    """Quantized flat-region images are full of equal-weight edges; backend
    edge emission order must match so stable sorts agree tie-for-tie."""
    lib = _load_native()
    if lib is None:
        pytest.skip("native kernel not buildable")
    img = _block_image(20)  # flat quadrants → masses of zero-weight ties
    a = felzenszwalb(img, scale=30.0, sigma=0.5, min_size=5, backend="native")
    b = felzenszwalb(img, scale=30.0, sigma=0.5, min_size=5, backend="numpy")
    np.testing.assert_array_equal(a, b)


def test_enforce_connectivity_merges_islands():
    from network_interpretation_imagenet_tpu.segment.slic import enforce_connectivity

    labels = np.zeros((10, 10), np.int32)
    labels[:, 5:] = 1
    labels[0, 0] = 1  # isolated fragment of label 1 inside label 0's region
    out = enforce_connectivity(labels)
    assert out[0, 0] == 0  # absorbed into the surrounding label
    # Main regions untouched.
    assert out[5, 2] == 0 and out[5, 8] == 1


def test_segment_image_slic_with_connectivity():
    cfg = SegmentConfig(method="slic", n_segments=4, slic_iters=5,
                        enforce_connectivity=True)
    seg = segment_image(_block_image(16), cfg)
    uniq = np.unique(seg)
    np.testing.assert_array_equal(uniq, np.arange(len(uniq)))


def test_slic_batch_matches_per_image():
    """slic_batch (one vmapped dispatch) must reproduce per-image slic, and
    segment_image_batch must match per-image segment_image (incl. the
    connectivity + relabel postpasses)."""
    from network_interpretation_imagenet_tpu.config import SegmentConfig
    from network_interpretation_imagenet_tpu.segment import (
        segment_image,
        segment_image_batch,
        slic,
        slic_batch,
    )

    rng = np.random.RandomState(5)
    imgs = [(rng.rand(32, 32, 3) * 255).astype(np.uint8) for _ in range(3)]

    batch = np.asarray(slic_batch(imgs, n_segments=9, num_iters=5))
    for i, img in enumerate(imgs):
        np.testing.assert_array_equal(
            batch[i], np.asarray(slic(img, n_segments=9, num_iters=5))
        )

    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=5)
    segs_b = segment_image_batch(imgs, cfg)
    for i, img in enumerate(imgs):
        np.testing.assert_array_equal(segs_b[i], segment_image(img, cfg))

    # felzenszwalb path (serial on this 1-core host)
    cfg_fh = SegmentConfig(method="felzenszwalb", scale=10.0, min_size=5)
    segs_fh = segment_image_batch(imgs, cfg_fh)
    for i, img in enumerate(imgs):
        np.testing.assert_array_equal(segs_fh[i], segment_image(img, cfg_fh))


def test_segment_batch_host_threads_match_serial(monkeypatch):
    """The FH batch fans across a thread pool on multi-core hosts (the
    scipy smooth + ctypes kernel release the GIL); results must be
    identical to serial per-image calls, in order."""
    import os

    from network_interpretation_imagenet_tpu.config import SegmentConfig
    from network_interpretation_imagenet_tpu.segment import (
        segment_image,
        segment_image_batch,
    )

    monkeypatch.setattr(os, "cpu_count", lambda: 8)  # force the pool branch
    rng = np.random.RandomState(11)
    imgs = [(rng.rand(32, 32, 3) * 255).astype(np.uint8) for _ in range(6)]
    cfg = SegmentConfig(method="felzenszwalb", scale=10.0, min_size=5)
    segs = segment_image_batch(imgs, cfg)
    for i, img in enumerate(imgs):
        np.testing.assert_array_equal(segs[i], segment_image(img, cfg))


def test_felzenszwalb_ladder_bit_exact_and_shared_sort(rng):
    """felzenszwalb_ladder (one edge build+sort shared across scales — the
    XRAI ladder's host cost fix) must be BIT-exact with independent
    per-scale felzenszwalb calls, on both backends, including the default
    max(round(s/10), 5) min_size rule."""
    from network_interpretation_imagenet_tpu.segment import (
        felzenszwalb,
        felzenszwalb_ladder,
    )

    img = np.zeros((48, 48, 3), np.float32)
    img[8:30, 6:22] = (0.8, 0.2, 0.1)
    img[28:44, 26:44] = (0.1, 0.7, 0.3)
    img += 0.05 * rng.randn(48, 48, 3)
    disp = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    scales = (10.0, 30.0, 80.0)

    for backend in ("numpy", "auto"):
        maps = felzenszwalb_ladder(disp, scales, sigma=0.5, backend=backend)
        assert len(maps) == 3
        for sm, s in zip(maps, scales):
            ref = felzenszwalb(disp, scale=s, sigma=0.5,
                               min_size=max(int(round(s / 10.0)), 5),
                               backend=backend)
            np.testing.assert_array_equal(sm, ref)
            assert sm.min() == 0  # contiguous relabeling preserved

    # Explicit min_sizes override + length validation.
    maps = felzenszwalb_ladder(disp, (10.0,), min_sizes=(20,),
                               backend="numpy")
    ref = felzenszwalb(disp, scale=10.0, min_size=20, backend="numpy")
    np.testing.assert_array_equal(maps[0], ref)
    assert felzenszwalb_ladder(disp, ()) == []
    import pytest

    with pytest.raises(ValueError, match="min_sizes"):
        felzenszwalb_ladder(disp, (10.0, 20.0), min_sizes=(5,))


def test_label_components_matches_scipy():
    """Native one-pass CC == per-label scipy components: identical
    PARTITION (component identity is all enforce_connectivity consumes),
    ids contiguous in raster first-occurrence order."""
    import importlib

    from scipy import ndimage

    F = importlib.import_module(
        "network_interpretation_imagenet_tpu.segment.felzenszwalb")
    if F._load_native() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    r = np.random.RandomState(0)
    labels = r.randint(0, 5, (40, 37)).astype(np.int32)
    comp, n = F.label_components(labels)
    assert comp.shape == labels.shape
    assert comp.min() == 0 and comp.max() == n - 1
    # Raster first-occurrence order: first index of id k precedes id k+1.
    firsts = np.full(n, -1)
    flat = comp.ravel()
    for i, c in enumerate(flat):
        if firsts[c] < 0:
            firsts[c] = i
    assert (np.diff(firsts) > 0).all()
    # Partition parity: scipy per-label CC induces the same equivalence.
    total = 0
    for lab in range(int(labels.max()) + 1):
        scomp, sn = ndimage.label(labels == lab)
        total += sn
        for k in range(1, sn + 1):
            ids = np.unique(comp[scomp == k])
            assert len(ids) == 1  # one native component per scipy component
    assert total == n


def test_enforce_connectivity_fast_path_matches_fallback(monkeypatch):
    """The native slic_postpass (CC + keep rule + adjacency absorption)
    must be BIT-identical to the numpy twin — the spec is pure integer
    counting, so the two backends can and must agree exactly (the BO
    lane's discrete trajectory rides on it). Also pins the absorption
    anchor property: surviving pixels keep their labels, and every
    absorbed fragment lands on a label adjacent to it."""
    import importlib

    F = importlib.import_module(
        "network_interpretation_imagenet_tpu.segment.felzenszwalb")
    slic_mod = importlib.import_module(
        "network_interpretation_imagenet_tpu.segment.slic")
    if F._load_native() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    r = np.random.RandomState(3)
    segs = [
        np.asarray(slic(
            r.randint(0, 256, shape + (3,)).astype(np.uint8),
            n_segments=12, num_iters=4))
        for shape in [(64, 64), (48, 80)]
    ]
    # Nested-fragment case: a dropped fragment adjacent only to another
    # dropped fragment resolves in round 2.
    lab = np.zeros((12, 12), np.int32)
    lab[:, 6:] = 1
    lab[5, 5] = 1
    lab[5, 4] = 2
    lab[0:2, 0:2] = 2
    lab[10:, 10:] = 2
    segs.append(lab)
    for seg in segs:
        fast = slic_mod.enforce_connectivity(seg)
        monkeypatch.setattr(F, "slic_postpass_native",
                            lambda l, f: None)
        slow = slic_mod.enforce_connectivity(seg)
        monkeypatch.undo()
        np.testing.assert_array_equal(fast, slow)


def test_segs_to_device_u8_wire_roundtrip():
    """The u8 segment-upload wire is lossless for label maps < 256 and
    falls back to int32 above."""
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.saliency.bo_pipeline import (
        _segs_to_device,
    )

    r = np.random.RandomState(1)
    small = r.randint(0, 256, (2, 16, 16)).astype(np.int32)
    d = _segs_to_device(small)
    assert d.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(d), small)
    big = small.copy()
    big[0, 0, 0] = 300
    np.testing.assert_array_equal(np.asarray(_segs_to_device(big)), big)
