"""Knockout masks through the full throughput machinery (r3): async
dispatch, multi-image flat N·K grids, mesh sharding, and the sweep's
--mode knockout — all equivalence-tested against the synchronous
single-image path (reference MNIST/CIFAR semantics,
``generate_gp_training_data_mnist.py:203-269``,
``generate_gp_training_data_cifar.py:307-342``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from network_interpretation_imagenet_tpu.config import SegmentConfig
from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.ops import aggregate, masking
from network_interpretation_imagenet_tpu.saliency.engine import SaliencyEngine
from network_interpretation_imagenet_tpu.saliency.sweep import saliency_sweep


def _engine(mask_batch=16):
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    return SaliencyEngine(bundle, variables, mask_batch=mask_batch,
                          compute_dtype=jnp.float32)


def _image_and_segments(seed, n_seg=9):
    rng = np.random.RandomState(seed)
    img = rng.rand(28, 28, 1).astype(np.float32)
    seg = (np.arange(784).reshape(28, 28) * 7919 % n_seg).astype(np.int32)
    return img, seg


@pytest.mark.parametrize("m", [1, 3])
def test_knockout_async_matches_sync(m):
    engine = _engine()
    img, seg = _image_and_segments(0)
    ids = masking.sample_knockout_ids_host(3, 21, m, int(seg.max()) + 1)
    target, _ = engine.predict_one(img)
    sync = engine.eval_knockout_masks(img, seg, ids, target)
    r = engine.collect(
        engine.eval_knockout_masks_async(img, seg, ids, target)
    )
    np.testing.assert_array_equal(r.survived, sync.survived)
    np.testing.assert_array_equal(r.preds, sync.preds)
    np.testing.assert_allclose(r.prob_target, sync.prob_target, atol=1e-6)


@pytest.mark.parametrize("m", [1, 5])
def test_knockout_multi_matches_per_image(m):
    """Flat N·K knockout grid == N independent single-image evals."""
    engine = _engine()
    imgs, segs, idss, targets = [], [], [], []
    for i in range(3):
        img, seg = _image_and_segments(i)
        imgs.append(img)
        segs.append(seg)
        idss.append(masking.sample_knockout_ids_host(
            10 + i, 12, m, int(seg.max()) + 1))
        targets.append(engine.predict_one(img)[0])
    results = engine.eval_knockout_masks_multi(
        np.stack(imgs), np.stack(segs), np.stack(idss),
        np.asarray(targets, np.int32),
    )
    for i in range(3):
        ref = engine.eval_knockout_masks(imgs[i], segs[i], idss[i], targets[i])
        np.testing.assert_array_equal(results[i].survived, ref.survived)
        np.testing.assert_allclose(results[i].prob_target, ref.prob_target,
                                   atol=1e-5)


@pytest.mark.parametrize("m", [1, 5])
def test_sharded_knockout_matches_engine(m):
    from network_interpretation_imagenet_tpu.parallel import (
        make_mesh,
        sharded_knockout_eval,
    )

    engine = _engine()
    img, seg = _image_and_segments(4)
    ids = masking.sample_knockout_ids_host(7, 13, m, int(seg.max()) + 1)
    target, _ = engine.predict_one(img)
    ref = engine.eval_knockout_masks(img, seg, ids, target)
    survived, probs, count = sharded_knockout_eval(
        make_mesh(), engine.bundle.logits, engine.variables, img, seg,
        ids, target, compute_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(survived, ref.survived)
    np.testing.assert_allclose(probs, ref.prob_target, atol=1e-5)
    assert count == int(ref.survived.sum())


def test_sharded_knockout_multi_matches_engine():
    from network_interpretation_imagenet_tpu.parallel import (
        make_mesh,
        sharded_knockout_eval_multi,
    )

    engine = _engine()
    imgs, segs, idss, targets = [], [], [], []
    for i in range(2):
        img, seg = _image_and_segments(20 + i)
        imgs.append(img)
        segs.append(seg)
        idss.append(masking.sample_knockout_ids_host(
            i, 11, 2, int(seg.max()) + 1))
        targets.append(engine.predict_one(img)[0])
    survived, p_t = sharded_knockout_eval_multi(
        make_mesh(), engine.bundle.logits, engine.variables,
        np.stack(imgs), np.stack(segs), np.stack(idss),
        np.asarray(targets, np.int32), compute_dtype=jnp.float32,
    )
    for i in range(2):
        ref = engine.eval_knockout_masks(imgs[i], segs[i], idss[i], targets[i])
        np.testing.assert_array_equal(survived[i], ref.survived)
        np.testing.assert_allclose(p_t[i], ref.prob_target, atol=1e-5)


def test_summed_knockout_labels_np_matches_einsum():
    """Host aggregation twin == device einsum over the materialized bank,
    including duplicate-id padding rows."""
    rng = np.random.RandomState(0)
    seg = rng.randint(0, 7, (16, 16)).astype(np.int32)
    ids = rng.randint(0, 6, (9, 3)).astype(np.int32)
    ids[0] = [2, 2, 4]  # duplicate within one mask must count once
    labels = rng.randint(0, 2, 9).astype(np.float32)
    masks = np.asarray(masking.knockout_masks(jnp.asarray(seg), jnp.asarray(ids)))
    ref = np.asarray(aggregate.summed_label_heatmap(
        jnp.asarray(masks), jnp.asarray(labels)))
    got = aggregate.summed_knockout_labels_np(seg, ids, labels)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_sample_knockout_ids_host_distinct_and_in_range():
    ids = masking.sample_knockout_ids_host(0, 500, 5, 12)
    assert ids.shape == (500, 5)
    assert ids.min() >= 0 and ids.max() < 11  # last segment never knocked
    for row in ids[:50]:
        assert len(set(row.tolist())) == 5  # distinct within a mask
    # Degenerate: fewer eligible segments than M → padded duplicates, no crash
    ids2 = masking.sample_knockout_ids_host(1, 8, 5, 3)
    assert ids2.shape == (8, 5)
    assert ids2.max() < 2


def _dataset(engine, n=3, with_skip=True):
    items = []
    for i in range(n):
        rng = np.random.RandomState(50 + i)
        img = rng.rand(28, 28, 1).astype(np.float32)
        if with_skip and i == 1:
            pred, _ = engine.predict_one(img)
            items.append((img, (pred + 1) % 10, None))
        else:
            items.append((img, None, np.array([4, 4, 10, 10])))
    return items


def test_knockout_sweep_paths_agree():
    """--mode knockout through streaming, image-batched, mesh, and
    mesh+image-batch paths: identical per-image survival/heatmaps."""
    from network_interpretation_imagenet_tpu.parallel import make_mesh

    engine = _engine()
    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    data = _dataset(engine)
    kw = dict(num_mask_samples=8, seed=3, mode="knockout", num_knockout=2,
              keep_heatmaps=True)
    res_stream = saliency_sweep(engine, list(data), cfg, **kw)
    res_batch = saliency_sweep(engine, list(data), cfg, image_batch=2, **kw)
    res_mesh = saliency_sweep(engine, list(data), cfg, mesh=make_mesh(), **kw)
    res_both = saliency_sweep(engine, list(data), cfg, image_batch=2,
                              mesh=make_mesh(), **kw)
    assert (res_stream.images_explained == res_batch.images_explained
            == res_mesh.images_explained == res_both.images_explained == 2)
    assert res_stream.images_skipped_misclassified == 1
    for other in (res_batch, res_mesh, res_both):
        assert set(other.heatmaps) == set(res_stream.heatmaps)
        for i in res_stream.heatmaps:
            np.testing.assert_allclose(other.heatmaps[i],
                                       res_stream.heatmaps[i], atol=1e-5)
    iou_rows = [r for r in res_stream.per_image if "iou" in r]
    assert len(iou_rows) == 2


def test_knockout_sweep_cli(tmp_path):
    import json
    import os

    from network_interpretation_imagenet_tpu.cli import saliency_sweep as cli_sweep

    out = str(tmp_path)
    cli_sweep.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "2", "--num_mask_samples", "8", "--mask-batch", "8",
        "--dtype", "float32", "--segmenter", "slic", "--n_segments", "9",
        "--mode", "knockout", "--num-knockout", "2", "--out", out,
    ])
    with open(os.path.join(out, "sweep_result.json")) as f:
        r = json.load(f)
    assert r["images_total"] == 2
    assert r["images_failed"] == 0
