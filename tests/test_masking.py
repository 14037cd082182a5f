"""Unit tests for ops.masking — mask construction vs a straightforward numpy
oracle written to the reference's semantics
(``bayesian_active_learning_imagenet.py:178-185``,
``generate_gp_training_data_mnist.py:218-223``)."""

import jax
import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.ops import masking


def _reference_window_mask(segments, first, width):
    """numpy oracle: mask[segments == segVal] = 1 over unique[first:first+width]."""
    uniq = np.unique(segments)
    window = uniq[first : first + width]
    mask = np.zeros(segments.shape, np.uint8)
    for seg_val in window:
        mask[segments == seg_val] = 1
    return mask.astype(bool)


def _random_segments(rng, h, w, s):
    """Contiguous labels 0..s-1, every label present."""
    seg = rng.randint(0, s, size=(h, w))
    seg.flat[:s] = np.arange(s)  # guarantee all labels appear
    return seg.astype(np.int32)


def test_window_masks_match_reference_oracle(rng):
    seg = _random_segments(rng, 16, 16, 12)
    width = 5
    firsts = np.array([0, 1, 3, 7, 10, 11])  # includes windows clipped at end
    got = np.asarray(masking.window_masks(jnp.asarray(seg), firsts, width))
    for i, f in enumerate(firsts):
        expect = _reference_window_mask(seg, f, width)
        np.testing.assert_array_equal(got[i], expect, err_msg=f"first={f}")


def test_knockout_masks_match_reference_oracle(rng):
    seg = _random_segments(rng, 14, 14, 9)
    knock = np.array([[0], [3], [8]])
    got = np.asarray(masking.knockout_masks(jnp.asarray(seg), knock))
    for i in range(knock.shape[0]):
        expect = np.ones(seg.shape, bool)
        expect[seg == knock[i, 0]] = False
        np.testing.assert_array_equal(got[i], expect)


def test_knockout_multi_segment(rng):
    seg = _random_segments(rng, 10, 10, 8)
    knock = np.array([[1, 4, 6]])
    got = np.asarray(masking.knockout_masks(jnp.asarray(seg), knock))[0]
    expect = ~np.isin(seg, [1, 4, 6])
    np.testing.assert_array_equal(got, expect)


def test_knockout_sentinel_ignored(rng):
    seg = _random_segments(rng, 8, 8, 5)
    got_single = np.asarray(masking.knockout_masks(jnp.asarray(seg), np.array([[2, -1]])))[0]
    expect = seg != 2
    np.testing.assert_array_equal(got_single, expect)


def test_apply_masks_zeroes_normalized_pixels(rng):
    img = rng.randn(8, 8, 3).astype(np.float32)
    seg = _random_segments(rng, 8, 8, 4)
    masks = masking.window_masks(jnp.asarray(seg), np.array([0, 2]), 2)
    out = np.asarray(masking.apply_masks(jnp.asarray(img), masks))
    assert out.shape == (2, 8, 8, 3)
    m0 = np.asarray(masks[0])
    np.testing.assert_allclose(out[0][m0], img[m0], rtol=1e-6)
    assert np.all(out[0][~m0] == 0)


def test_sample_window_starts_range():
    key = jax.random.PRNGKey(0)
    starts = np.asarray(
        masking.sample_window_starts(key, 500, jnp.int32(50), jnp.int32(20))
    )
    # Reference: randint(1, S - width) inclusive → [1, 30]
    assert starts.min() >= 1
    assert starts.max() <= 30
    assert len(np.unique(starts)) > 10  # actually random


def test_sample_knockout_ids_distinct_and_in_range():
    key = jax.random.PRNGKey(1)
    ids = np.asarray(masking.sample_knockout_ids(key, 64, 5, jnp.int32(30)))
    assert ids.shape == (64, 5)
    assert ids.min() >= 0
    # Reference samples from range(uniq[0], uniq[-1]) → [0, S-1)
    assert ids.max() < 29
    for row in ids:
        assert len(set(row.tolist())) == 5  # without replacement


def test_masked_fraction(rng):
    seg = _random_segments(rng, 8, 8, 4)
    masks = masking.window_masks(jnp.asarray(seg), np.array([0]), 4)
    frac = np.asarray(masking.masked_fraction(masks))
    np.testing.assert_allclose(frac, [1.0])


def test_window_masks_jit_with_traced_width(rng):
    seg = jnp.asarray(_random_segments(rng, 12, 12, 10))

    @jax.jit
    def build(firsts, width):
        return masking.window_masks(seg, firsts, width)

    out = build(jnp.array([2, 5]), jnp.int32(4))
    assert out.shape == (2, 12, 12)


def test_host_sampler_matches_device_distribution_bounds():
    from network_interpretation_imagenet_tpu.ops.masking import (
        sample_window_starts_host,
    )

    firsts = sample_window_starts_host(0, 1000, 20, 8)
    assert firsts.min() >= 1 and firsts.max() <= 12  # [1, S-width] inclusive
    assert firsts.dtype == np.int32
    # Tiny S guard: never empty range.
    tiny = sample_window_starts_host(0, 10, 2, 5)
    assert set(tiny.tolist()) == {1}


def test_summed_superpixel_labels_np_matches_device():
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.ops import aggregate

    rng = np.random.RandomState(3)
    seg = (np.arange(64).reshape(8, 8) % 7).astype(np.int32)
    firsts = rng.randint(0, 5, 12).astype(np.int32)
    labels = (rng.rand(12) > 0.5).astype(np.float32)
    host = aggregate.summed_superpixel_labels_np(seg, firsts, 3, labels)
    dev = np.asarray(
        aggregate.summed_superpixel_labels(
            jnp.asarray(seg), jnp.asarray(firsts), jnp.int32(3),
            jnp.asarray(labels),
        )
    )
    np.testing.assert_allclose(host, dev)


def test_normalize_to_uint8_batch_matches_host_twin():
    """The device-derived SLIC display (vmapped normalize_to_uint8) must
    match the host twin per image — the batched sweeps feed SLIC the device
    version while the streaming path uses the host one, so a mismatch would
    make segmentations depend on --image-batch. Runs on the real chip in
    the tpu_smoke set (TPU f32 division could differ from numpy by 1 ulp at
    a uint8 bin boundary; this pins that it doesn't for realistic inputs)."""
    import numpy as np

    from network_interpretation_imagenet_tpu.ops import aggregate

    rng = np.random.RandomState(11)
    batch = np.stack([
        rng.rand(32, 32, 3).astype(np.float32) * rng.uniform(0.5, 4.0)
        - rng.uniform(0.0, 2.0)
        for _ in range(6)
    ])
    dev = np.asarray(aggregate.normalize_to_uint8_batch(batch))
    host = np.stack([aggregate.normalize_to_uint8_np(im) for im in batch])
    np.testing.assert_array_equal(dev, host)
