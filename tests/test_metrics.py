"""Tests for ops.metrics and ops.aggregate — bbox/IOU semantics
(``utils.py:96-142`` with bugs fixed), aggregation vs reference dict-loop
oracle (``bayesian_active_learning_imagenet.py:321-344``)."""

import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.ops import aggregate, masking, metrics


# --- aggregation -----------------------------------------------------------


def _reference_summed_heatmap(masks_u8, labels, n):
    """Reference dict-pixel loop oracle."""
    dict_pixel = {}
    for img, lab in zip(masks_u8, labels):
        for j in range(n):
            for k in range(n):
                if img[j][k] == 255:
                    dict_pixel[(j, k)] = dict_pixel.get((j, k), 0) + lab
    out = np.zeros((n, n))
    for (j, k), v in dict_pixel.items():
        out[j][k] = v
    return out


def test_summed_label_heatmap_matches_reference_oracle(rng):
    n = 12
    masks = rng.rand(6, n, n) > 0.5
    labels = np.array([1, 0, 1, 1, 0, 1])
    got = np.asarray(aggregate.summed_label_heatmap(jnp.asarray(masks), jnp.asarray(labels)))
    expect = _reference_summed_heatmap((masks * 255).astype(np.uint8), labels, n)
    np.testing.assert_allclose(got, expect)


def test_summed_superpixel_labels_equals_mask_bank_path(rng):
    n, s = 16, 10
    seg = rng.randint(0, s, size=(n, n)).astype(np.int32)
    seg.flat[:s] = np.arange(s)
    firsts = np.array([0, 2, 4, 6])
    width = 4
    labels = np.array([1.0, 0.0, 1.0, 1.0])
    masks = masking.window_masks(jnp.asarray(seg), firsts, width)
    via_bank = np.asarray(aggregate.summed_label_heatmap(masks, jnp.asarray(labels)))
    via_seg = np.asarray(
        aggregate.summed_superpixel_labels(
            jnp.asarray(seg), jnp.asarray(firsts), jnp.int32(width), jnp.asarray(labels)
        )
    )
    np.testing.assert_allclose(via_bank, via_seg)


def test_distinct_sorted_levels(rng):
    heat = jnp.asarray(np.array([[0, 3, 3], [7, 0, 3], [7, 7, 0]], np.float32))
    levels, count = aggregate.distinct_sorted_levels(heat, k_max=10)
    levels = np.asarray(levels)
    assert int(count) == 3
    np.testing.assert_allclose(levels[:3], [0, 3, 7])
    assert np.all(np.isinf(levels[3:]))


# --- bbox / IOU ------------------------------------------------------------


def test_bbox_from_mask_simple():
    mask = np.zeros((10, 10), bool)
    mask[2:5, 3:8] = True
    box = np.asarray(metrics.bbox_from_mask(jnp.asarray(mask)))
    np.testing.assert_array_equal(box, [3, 2, 5, 3])  # x, y, w, h


def test_bbox_from_mask_empty():
    box = np.asarray(metrics.bbox_from_mask(jnp.zeros((5, 5), bool)))
    np.testing.assert_array_equal(box, [0, 0, 0, 0])


def test_largest_component_bbox_picks_biggest_blob():
    mask = np.zeros((20, 20), bool)
    mask[1:3, 1:3] = True          # small blob (2x2)
    mask[5:15, 5:12] = True        # big blob (10x7)
    box = metrics.largest_component_bbox(mask)
    np.testing.assert_array_equal(box, [5, 5, 7, 10])


def test_generate_boundingbox_fixed_vs_ref_compat():
    gray = np.zeros((20, 20), np.uint8)
    gray[4:10, 6:14] = 200
    fixed = metrics.generate_boundingbox(gray, 180)
    np.testing.assert_array_equal(fixed, [6, 4, 8, 6])
    # ref_compat reproduces the [x, y, x, y] bug (utils.py:109)
    buggy = metrics.generate_boundingbox(gray, 180, ref_compat=True)
    np.testing.assert_array_equal(buggy, [6, 4, 6, 4])


def test_iou_identical_boxes():
    b = jnp.asarray([2.0, 3.0, 10.0, 12.0])
    assert float(metrics.iou(b, b)) == 1.0


def test_iou_known_value():
    a = metrics.xywh_to_corners(jnp.asarray([0.0, 0.0, 9.0, 9.0]))  # 10x10 inclusive
    b = metrics.xywh_to_corners(jnp.asarray([5.0, 5.0, 9.0, 9.0]))
    got = float(metrics.iou(a, b))
    inter = 5 * 5
    union = 100 + 100 - inter
    np.testing.assert_allclose(got, inter / union, rtol=1e-6)


def test_iou_disjoint_clamped_but_ref_compat_matches_reference():
    a = np.array([0, 0, 2, 2])
    b = np.array([10, 10, 12, 12])
    assert float(metrics.iou(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))) == 0.0
    # The reference's arithmetic goes negative for disjoint boxes.
    assert metrics.iou_ref_compat(a, b) != 0.0


def test_bbox_intersection_matches_reference():
    # mirrors dataset.py:114-120
    a = [1.0, 1.0, 4.0, 4.0]
    b = [3.0, 2.0, 4.0, 4.0]
    got = np.asarray(metrics.bbox_intersection(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, [3, 2, 2, 3])
    disjoint = np.asarray(
        metrics.bbox_intersection(jnp.asarray([0.0, 0, 1, 1]), jnp.asarray([5.0, 5, 1, 1]))
    )
    np.testing.assert_allclose(disjoint, [0, 0, 0, 0])


def test_topk_correct():
    logits = jnp.asarray(
        [[0.1, 0.9, 0.0, 0.0, 0.0, 0.0],
         [0.9, 0.1, 0.0, 0.0, 0.0, 0.0],
         [0.5, 0.4, 0.3, 0.2, 0.1, 0.6]]
    )
    labels = jnp.asarray([1, 1, 4])
    top1, top5 = metrics.topk_correct(logits, labels, (1, 5))
    assert int(top1) == 1
    assert int(top5) == 2  # sample 3's label 4 ranks 6th -> only samples 1,2 in top5


def test_largest_component_8_connectivity():
    """Diagonally-touching blobs are ONE component (cv2.findContours
    semantics)."""
    mask = np.zeros((8, 8), bool)
    mask[1:3, 1:3] = True
    mask[3:6, 3:7] = True  # touches the first blob only at corner (2,2)/(3,3)
    box = metrics.largest_component_bbox(mask)
    np.testing.assert_array_equal(box, [1, 1, 6, 5])
