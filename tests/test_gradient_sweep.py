"""Tests for gradient/occlusion saliency and the val-set sweep driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from network_interpretation_imagenet_tpu.config import SegmentConfig
from network_interpretation_imagenet_tpu.data.labels import class_name
from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.saliency import gradient as grad_mod
from network_interpretation_imagenet_tpu.saliency.engine import SaliencyEngine
from network_interpretation_imagenet_tpu.saliency.sweep import saliency_sweep
from network_interpretation_imagenet_tpu.utils.nn import (
    entropy_loss,
    kaiming_normal_init,
    ste_round,
)


def _toy_model():
    """'Classifier' whose class-1 logit is the sum of a fixed region."""

    def logits_fn(variables, imgs):
        region = imgs[:, 4:12, 4:12, :]
        # 0.05 scale keeps softmax unsaturated so occlusion drops register.
        s = jnp.sum(region, axis=(1, 2, 3)) * 0.05
        return jnp.stack([jnp.full_like(s, 1.0), s], axis=1)

    return logits_fn


def test_input_gradient_localizes_evidence():
    logits_fn = _toy_model()
    img = np.ones((16, 16, 1), np.float32)
    heat = np.asarray(grad_mod.input_gradient(logits_fn, None, img, 1))
    assert heat.shape == (16, 16)
    assert heat[4:12, 4:12].min() > 0
    assert heat[:4].max() == 0 and heat[:, :4].max() == 0


def test_grad_times_input_and_integrated_agree_for_linear_model():
    # For a linear model, IG == grad ⊙ (x - baseline) exactly.
    logits_fn = _toy_model()
    rng = np.random.RandomState(0)
    img = rng.rand(16, 16, 1).astype(np.float32)
    gi = np.asarray(grad_mod.grad_times_input(logits_fn, None, img, 1))
    ig = np.asarray(grad_mod.integrated_gradients(logits_fn, None, img, 1, steps=4))
    np.testing.assert_allclose(gi, ig, atol=1e-5)


def test_smoothgrad_localizes_and_reduces_to_plain_grad():
    """For a LINEAR model the gradient is input-independent, so smoothgrad
    equals the plain input gradient regardless of noise; localization and
    the SmoothGrad² flavor follow."""
    logits_fn = _toy_model()
    img = np.ones((16, 16, 1), np.float32)
    sg = np.asarray(grad_mod.smoothgrad(logits_fn, None, img, 1, samples=8,
                                        noise_sigma=0.3, seed=3))
    plain = np.asarray(grad_mod.input_gradient(logits_fn, None, img, 1))
    np.testing.assert_allclose(sg, plain, atol=1e-6)
    assert sg[4:12, 4:12].min() > 0
    assert sg[:4].max() == 0 and sg[:, :4].max() == 0
    # SmoothGrad**2 squares before channel-sum: region value = grad**2.
    sg2 = np.asarray(grad_mod.smoothgrad(logits_fn, None, img, 1, samples=8,
                                         noise_sigma=0.3, seed=3,
                                         magnitude=True))
    np.testing.assert_allclose(sg2[4:12, 4:12], plain[4:12, 4:12] ** 2,
                               atol=1e-6)
    # Determinism: same seed -> same map.
    again = np.asarray(grad_mod.smoothgrad(logits_fn, None, img, 1,
                                           samples=8, noise_sigma=0.3,
                                           seed=3))
    np.testing.assert_array_equal(sg, again)


def test_rise_map_localizes_and_is_deterministic():
    """RISE's probability-weighted soft-mask average ranks the evidence
    region above the background; same seed -> identical map; rounding
    num_masks up to a batch multiple is absorbed by the normalization."""
    logits_fn = _toy_model()
    img = np.ones((16, 16, 1), np.float32)
    heat = np.asarray(grad_mod.rise_map(
        logits_fn, None, img, 1, num_masks=300, grid=4, batch=64, seed=0,
        compute_dtype=jnp.float32))
    assert heat.shape == (16, 16)
    assert heat[4:12, 4:12].mean() > heat[:4].mean()
    assert heat[4:12, 4:12].mean() > heat[:, :4].mean()
    again = np.asarray(grad_mod.rise_map(
        logits_fn, None, img, 1, num_masks=300, grid=4, batch=64, seed=0,
        compute_dtype=jnp.float32))
    np.testing.assert_array_equal(heat, again)


def test_gradcam_analytic_and_zoo_layer_pick():
    """On a module where grad-CAM is analytic (feature A = 2x, logit_0 =
    sum of A over a fixed region) the map equals mean-region-weight * A;
    the default layer pick finds the canonical deepest stage on a real
    model and runs end-to-end."""
    import types

    import flax.linen as nn

    class _ToyCam(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            class _Feat(nn.Module):
                @nn.compact
                def __call__(self, x):
                    return x * 2.0

            a = _Feat(name="feat")(x)
            s = jnp.sum(a[:, 2:6, 2:6, :], axis=(1, 2, 3))
            return jnp.stack([s, jnp.zeros_like(s)], 1)

    bundle = types.SimpleNamespace(module=_ToyCam())
    rng = np.random.RandomState(0)
    img = rng.rand(8, 8, 1).astype(np.float32)
    variables = bundle.module.init(jax.random.PRNGKey(0), img[None], False)

    layers = grad_mod.gradcam_target_layers(bundle, variables, img)
    assert ("feat", (1, 8, 8, 1)) in layers
    cam = np.asarray(grad_mod.gradcam(bundle, variables, img, 0))
    # dY/dA = region indicator -> weight = 16/64; cam = relu(w * A) = 0.5x.
    np.testing.assert_allclose(cam, 0.5 * img[:, :, 0], atol=1e-6)

    # Unknown layer names fail loudly with the menu.
    try:
        grad_mod.gradcam(bundle, variables, img, 0, layer="nope")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "feat" in str(e)

    # Real model: default pick is the deepest stage; cam is nonneg HxW.
    mb = create_model("mnist_cnn", "mnist")
    mv = mb.init(jax.random.PRNGKey(0))
    mimg = rng.rand(28, 28, 1).astype(np.float32)
    names = [n for n, _ in grad_mod.gradcam_target_layers(mb, mv, mimg)]
    assert any(n.startswith("conv") for n in names)
    mcam = np.asarray(grad_mod.gradcam(mb, mv, mimg, 3))
    assert mcam.shape == (28, 28) and mcam.min() >= 0


def test_scorecam_analytic_and_zoo():
    """On a module where Score-CAM is analytic — feature channel 0 is a
    region indicator, channel 1 a disjoint-corner indicator, channel 2
    all-zero (dead), logit_0 sums input over the region — the map equals
    softmax over the LIVE channels' masked-forward scores, blended over
    their indicators; the dead channel must NOT dilute the softmax (its
    exp(f(black)) would change the denominator). Then a real model."""
    import types

    import flax.linen as nn

    region = np.zeros((8, 8), np.float32)
    region[2:6, 2:6] = 1.0
    corner = np.zeros((8, 8), np.float32)
    corner[0:2, 0:2] = 1.0  # disjoint from region → masked score 0

    class _ToyScore(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            class _Feat(nn.Module):
                @nn.compact
                def __call__(self, x):
                    c0 = jnp.broadcast_to(jnp.asarray(region),
                                          x.shape[:3])
                    c1 = jnp.broadcast_to(jnp.asarray(corner),
                                          x.shape[:3])
                    return jnp.stack([c0, c1, jnp.zeros_like(c0)], -1)

            _ = _Feat(name="feat")(x)
            s = jnp.sum(x[:, 2:6, 2:6, :], axis=(1, 2, 3))
            return jnp.stack([s, jnp.zeros_like(s)], 1)

    bundle = types.SimpleNamespace(module=_ToyScore())
    rng = np.random.RandomState(0)
    img = rng.rand(8, 8, 1).astype(np.float32)
    variables = bundle.module.init(jax.random.PRNGKey(0), img[None], False)

    cam = np.asarray(grad_mod.scorecam(
        bundle, variables, img, 0, layer="feat", channels=3, batch=2,
        compute_dtype=jnp.float32))
    # Mask 0 = region indicator → s0 = Σ img[region]; mask 1 = corner
    # indicator, disjoint from the logit's region → s1 = 0; channel 2 is
    # dead → excluded from the softmax entirely.
    s0 = float(img[2:6, 2:6, 0].sum())
    w0 = np.exp(s0) / (np.exp(s0) + 1.0)
    np.testing.assert_allclose(cam, w0 * region + (1.0 - w0) * corner,
                               atol=1e-5)

    # channels > available clamps; unknown layer fails with the menu.
    cam2 = np.asarray(grad_mod.scorecam(
        bundle, variables, img, 0, layer="feat", channels=16, batch=4,
        compute_dtype=jnp.float32))
    np.testing.assert_allclose(cam2, cam, atol=1e-5)
    try:
        grad_mod.scorecam(bundle, variables, img, 0, layer="nope")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "feat" in str(e)

    # Real model: default layer pick, nonneg HxW map.
    mb = create_model("mnist_cnn", "mnist")
    mv = mb.init(jax.random.PRNGKey(0))
    mimg = rng.rand(28, 28, 1).astype(np.float32)
    mcam = np.asarray(grad_mod.scorecam(mb, mv, mimg, 3, channels=8,
                                        batch=8,
                                        compute_dtype=jnp.float32))
    assert mcam.shape == (28, 28) and mcam.min() >= 0


def test_occlusion_map_finds_region():
    logits_fn = _toy_model()
    img = np.ones((16, 16, 1), np.float32)
    heat = np.asarray(
        grad_mod.occlusion_map(
            logits_fn, None, img, 1, patch=4, stride=4, batch=8,
            compute_dtype=jnp.float32,
        )
    )
    assert heat.shape == (16, 16)
    # Probability drop concentrates on the evidence region.
    assert heat[4:12, 4:12].mean() > heat[:4, :4].mean()
    assert heat.min() >= 0


def test_occlusion_map_adaptive_patch_small_image():
    """patch=None (the default) resolution-adapts the classic 224²
    patch=32: on a 16×16 image a fixed 32 would admit ZERO positions
    (error) and 16 exactly ONE (constant map); the adaptive default must
    yield a multi-position, non-constant map that still localizes the
    evidence region."""
    logits_fn = _toy_model()
    img = np.ones((16, 16, 1), np.float32)
    heat = np.asarray(
        grad_mod.occlusion_map(
            logits_fn, None, img, 1, batch=8, compute_dtype=jnp.float32,
        )
    )
    assert heat.shape == (16, 16)
    assert float(np.ptp(heat)) > 0.0
    assert heat[4:12, 4:12].mean() > heat[:4, :4].mean()


def test_saliency_sweep_mixed_outcomes():
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=8, compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)

    def dataset():
        img = rng.rand(28, 28, 1).astype(np.float32)
        pred, _ = engine.predict_one(img)
        yield img, pred, np.array([4, 4, 10, 10])   # explained, with IOU
        yield img, (pred + 1) % 10, None            # misclassified → skipped
        yield img, None, None                       # no label → explained

    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    res = saliency_sweep(engine, dataset(), cfg, num_mask_samples=8)
    assert res.images_total == 3
    assert res.images_explained == 2
    assert res.images_skipped_misclassified == 1
    assert res.images_failed == 0
    assert res.evals_per_sec > 0
    assert 0 <= res.mean_survival <= 1


# --- small utils -----------------------------------------------------------


def test_ste_round_gradient_is_identity():
    g = jax.grad(lambda x: jnp.sum(ste_round(x) * 3.0))(jnp.asarray([0.2, 0.7]))
    np.testing.assert_allclose(np.asarray(g), [3.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(ste_round(jnp.asarray([0.2, 0.7]))), [0.0, 1.0]
    )


def test_entropy_loss():
    # Uniform logits → entropy log(K).
    logits = jnp.zeros((2, 4))
    np.testing.assert_allclose(float(entropy_loss(logits)), np.log(4), rtol=1e-6)
    # Peaked logits → near-zero entropy.
    peaked = jnp.asarray([[100.0, 0.0, 0.0, 0.0]])
    assert float(entropy_loss(peaked)) < 1e-3


def test_kaiming_init_scale():
    init = kaiming_normal_init()
    k = init(jax.random.PRNGKey(0), (3, 3, 64, 128))
    fan_in = 3 * 3 * 64
    np.testing.assert_allclose(float(jnp.std(k)), np.sqrt(2.0 / fan_in), rtol=0.1)


def test_class_names():
    assert class_name(3, "cifar10") == "cat"
    assert class_name(7, "mnist") == "7"
    assert class_name(42, "imagenet") == "class_42"
    assert class_name(1, "imagenet", {1: "goldfish"}) == "goldfish"


def test_saliency_sweep_data_parallel_matches_single():
    """Sharded mask-parallel sweep on the 8-device mesh gives the same
    survival statistics as the single-device engine."""
    from network_interpretation_imagenet_tpu.parallel import make_mesh

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=8, compute_dtype=jnp.float32)
    rng = np.random.RandomState(2)
    imgs = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(2)]

    def dataset():
        for img in imgs:
            yield img, None, None

    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    res_single = saliency_sweep(engine, dataset(), cfg, num_mask_samples=16, seed=5)
    res_sharded = saliency_sweep(
        engine, dataset(), cfg, num_mask_samples=16, seed=5, mesh=make_mesh()
    )
    assert res_sharded.images_explained == res_single.images_explained == 2
    for a, b in zip(res_single.per_image, res_sharded.per_image):
        np.testing.assert_allclose(a["survival"], b["survival"])


def test_saliency_sweep_image_batched_matches_single():
    """image_batch>1 (multi-image fused forwards) must match streaming."""
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=16, compute_dtype=jnp.float32)
    rng = np.random.RandomState(3)
    imgs = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(3)]

    def dataset():
        for img in imgs:
            yield img, None, None

    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    res_a = saliency_sweep(engine, dataset(), cfg, num_mask_samples=8, seed=9)
    res_b = saliency_sweep(engine, dataset(), cfg, num_mask_samples=8, seed=9,
                           image_batch=2)  # 2+1 flush pattern
    assert res_b.images_explained == res_a.images_explained == 3
    for a, b in zip(res_a.per_image, res_b.per_image):
        assert a["index"] == b["index"]
        np.testing.assert_allclose(a["survival"], b["survival"])


def test_saliency_sweep_mesh_plus_image_batch_composes():
    """mesh AND image_batch>1: the flat N·K grid shards over the mesh and
    must reproduce the single-device streaming results."""
    from network_interpretation_imagenet_tpu.parallel import make_mesh

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=16, compute_dtype=jnp.float32)
    rng = np.random.RandomState(6)
    imgs = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(3)]

    def dataset():
        for img in imgs:
            yield img, None, None

    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    res_a = saliency_sweep(engine, dataset(), cfg, num_mask_samples=8, seed=2)
    res_b = saliency_sweep(engine, dataset(), cfg, num_mask_samples=8, seed=2,
                           image_batch=2, mesh=make_mesh())
    assert res_b.images_explained == res_a.images_explained == 3
    for a, b in zip(res_a.per_image, res_b.per_image):
        assert a["survival"] == b["survival"]
        assert a["num_segments"] == b["num_segments"]


def test_bo_saliency_sweep_end_to_end():
    """BO-driven sweep: batched fused loops over the image axis, skip
    decided pre-dispatch, IOU computed for images with gt."""
    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.saliency.sweep import bo_saliency_sweep

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=8, compute_dtype=jnp.float32)
    rng = np.random.RandomState(1)
    img = rng.rand(28, 28, 1).astype(np.float32)
    pred, _ = engine.predict_one(img)

    def dataset():
        yield img, pred, np.array([4, 4, 10, 10])   # explained, with IOU
        yield img, (pred + 1) % 10, None            # misclassified → skipped
        yield rng.rand(28, 28, 1).astype(np.float32), None, None  # explained

    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    res = bo_saliency_sweep(
        engine, dataset(), cfg, bo_cfg=BOConfig(n_iters=2, n_pre_samples=2),
        image_batch=2,
    )
    assert res.images_total == 3
    assert res.images_explained == 2
    assert res.images_skipped_misclassified == 1
    assert res.images_failed == 0
    assert res.evals_per_sec > 0
    iou_rows = [r for r in res.per_image if "iou" in r]
    assert len(iou_rows) == 1 and np.isfinite(iou_rows[0]["iou"])


def test_bo_sweep_invariant_to_flush_composition():
    """Per-image BO results must not depend on --image-batch or on which
    images share a flush (seeds derive from dataset indices, r3 fix): the
    same dataset swept at image_batch=2 and image_batch=4 — and with a
    misclassified image perturbing the flush packing — yields bit-identical
    per-image heatmaps."""
    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.saliency.sweep import bo_saliency_sweep

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=8,
                            compute_dtype=jnp.float32)
    rng = np.random.RandomState(4)
    imgs = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(4)]
    pred0, _ = engine.predict_one(imgs[0])

    def dataset(with_skip):
        for i, img in enumerate(imgs):
            if with_skip and i == 1:
                yield img, (engine.predict_one(img)[0] + 1) % 10, None
            else:
                yield img, None, None

    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    bo = BOConfig(n_iters=2, n_pre_samples=2)
    kw = dict(bo_cfg=bo, seed=11, keep_heatmaps=True)
    res_b2 = bo_saliency_sweep(engine, dataset(False), cfg, image_batch=2, **kw)
    res_b4 = bo_saliency_sweep(engine, dataset(False), cfg, image_batch=4, **kw)
    res_skip = bo_saliency_sweep(engine, dataset(True), cfg, image_batch=2, **kw)
    assert res_b2.images_explained == res_b4.images_explained == 4
    for i in range(4):
        np.testing.assert_array_equal(res_b2.heatmaps[i], res_b4.heatmaps[i])
    # Image 1 skipped → images 0,2,3 keep their streams regardless of packing.
    assert res_skip.images_skipped_misclassified == 1
    for i in (0, 2, 3):
        np.testing.assert_array_equal(res_b2.heatmaps[i], res_skip.heatmaps[i])

    # And each batched result equals the single-image flagship call with the
    # same derived seed (per_image_seeds = seed + index).
    from network_interpretation_imagenet_tpu.saliency.bo_pipeline import (
        bo_window_saliency,
    )
    from network_interpretation_imagenet_tpu.ops import aggregate
    from network_interpretation_imagenet_tpu.segment import segment_image

    disp = aggregate.normalize_to_uint8_np(imgs[2])[:, :, 0]
    seg = np.asarray(segment_image(disp, cfg), np.int32)
    tgt, _ = engine.predict_one(imgs[2])
    out_single, _ = bo_window_saliency(
        engine, imgs[2], seg, bo, seed=11 + 2, target=int(tgt)
    )
    np.testing.assert_allclose(res_b2.heatmaps[2], out_single.heatmap,
                               atol=1e-5)


def test_bo_sweep_dispatch_failure_counts_once():
    """When the batched BO dispatch throws, skipped-misclassified images must
    not ALSO be counted as failed (regression: failed += len(batch))."""
    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.saliency.sweep import bo_saliency_sweep

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=8,
                            compute_dtype=jnp.float32)
    rng = np.random.RandomState(1)
    img = rng.rand(28, 28, 1).astype(np.float32)
    pred, _ = engine.predict_one(img)

    def dataset():
        yield img, pred, None                 # dispatched → failed (boom)
        yield img, (pred + 1) % 10, None      # misclassified → skipped only

    def boom(*a, **k):
        raise RuntimeError("boom")

    # bo_saliency_sweep imports the symbol from bo_pipeline at call time.
    import network_interpretation_imagenet_tpu.saliency.bo_pipeline as bp
    real = bp.bo_window_saliency_multi_async
    bp.bo_window_saliency_multi_async = boom
    try:
        cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
        res = bo_saliency_sweep(
            engine, dataset(), cfg,
            bo_cfg=BOConfig(n_iters=2, n_pre_samples=2), image_batch=2,
        )
    finally:
        bp.bo_window_saliency_multi_async = real
    assert res.images_total == 2
    assert res.images_skipped_misclassified == 1
    assert res.images_failed == 1  # only the dispatched image
    assert res.images_explained == 0


def test_sweep_gp_heatmaps_cli(tmp_path):
    """--gp-heatmaps: batched Kronecker GP over all explained heatmaps →
    gp_heatmaps.npz with mean/var per image."""
    from network_interpretation_imagenet_tpu.cli import saliency_sweep as cli_sweep
    import json
    import os

    out = str(tmp_path)
    cli_sweep.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "3", "--num_mask_samples", "8", "--mask-batch", "8",
        "--dtype", "float32", "--segmenter", "slic", "--n_segments", "9",
        "--gp-heatmaps", "--gp_iters", "4", "--out", out,
    ])
    with open(os.path.join(out, "sweep_result.json")) as f:
        r = json.load(f)
    assert r["gp_heatmaps"]["images"] == 3
    blob = np.load(os.path.join(out, "gp_heatmaps.npz"))
    assert blob["gp_mean"].shape == (3, 28, 28)
    assert blob["gp_var"].shape == (3, 28, 28)
    assert (blob["gp_var"] > 0).all()
    assert len(blob["lengthscales"]) == 3


def test_sweep_cli_bo_mode(tmp_path):
    """--bo drives the sweep through the batched fused-BO path."""
    from network_interpretation_imagenet_tpu.cli import saliency_sweep as cli_sweep
    import json
    import os

    out = str(tmp_path)
    cli_sweep.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "2", "--mask-batch", "8", "--dtype", "float32",
        "--segmenter", "slic", "--n_segments", "9",
        "--bo", "--n_iters", "2", "--n_pre_samples", "2",
        "--image-batch", "2", "--out", out,
    ])
    with open(os.path.join(out, "sweep_result.json")) as f:
        r = json.load(f)
    assert r["images_total"] == 2
    assert r["images_explained"] == 2
    assert r["images_failed"] == 0


def test_bo_sweep_collect_failure_counts_dispatched_only():
    """With the depth-2 flush pipeline, an error that surfaces at FETCH time
    (inside collect()) must fail only the dispatched images of that flush —
    and must not kill the sweep or double-count skipped images."""
    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.saliency.sweep import bo_saliency_sweep

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=8,
                            compute_dtype=jnp.float32)
    rng = np.random.RandomState(1)
    img = rng.rand(28, 28, 1).astype(np.float32)
    pred, _ = engine.predict_one(img)

    def dataset():
        yield img, pred, None                 # dispatched → fails at collect
        yield img, (pred + 1) % 10, None      # misclassified → skipped only

    def fake_async(*a, **k):
        def collect():
            raise RuntimeError("boom at fetch")
        return collect

    import network_interpretation_imagenet_tpu.saliency.bo_pipeline as bp
    real = bp.bo_window_saliency_multi_async
    bp.bo_window_saliency_multi_async = fake_async
    try:
        cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
        res = bo_saliency_sweep(
            engine, dataset(), cfg,
            bo_cfg=BOConfig(n_iters=2, n_pre_samples=2), image_batch=2,
        )
    finally:
        bp.bo_window_saliency_multi_async = real
    assert res.images_total == 2
    assert res.images_skipped_misclassified == 1
    assert res.images_failed == 1
    assert res.images_explained == 0


def test_sweep_gp_class_heatmaps_cli(tmp_path):
    """--gp-class-heatmaps: batched variational classification GP over all
    explained median-binarized heatmaps → gp_class_heatmaps.npz with a
    survive-probability map per image."""
    from network_interpretation_imagenet_tpu.cli import saliency_sweep as cli_sweep
    import json
    import os

    out = str(tmp_path)
    cli_sweep.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "3", "--num_mask_samples", "8", "--mask-batch", "8",
        "--dtype", "float32", "--segmenter", "slic", "--n_segments", "9",
        "--gp-class-heatmaps", "--gp_iters", "4", "--out", out,
    ])
    with open(os.path.join(out, "sweep_result.json")) as f:
        r = json.load(f)
    assert r["gp_class_heatmaps"]["images"] == 3
    blob = np.load(os.path.join(out, "gp_class_heatmaps.npz"))
    assert blob["survive_proba"].shape == (3, 28, 28)
    assert (blob["survive_proba"] >= 0).all()
    assert (blob["survive_proba"] <= 1).all()
    assert len(blob["indices"]) == 3


def test_sweep_fidelity_fields_and_path_invariance():
    """fidelity_steps>0 adds deletion/insertion AUC (+ pointing where gt
    boxes exist) to every explained row, rolls up means, and produces
    IDENTICAL scores through the streaming and image-batched paths."""
    from network_interpretation_imagenet_tpu.config import SegmentConfig

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=8,
                            compute_dtype=jnp.float32)
    rng = np.random.RandomState(3)
    items = []
    for i in range(4):
        img = rng.rand(28, 28, 1).astype(np.float32)
        pred, _ = engine.predict_one(img)
        gt = np.array([4, 4, 10, 10]) if i % 2 == 0 else None
        items.append((img, pred, gt))

    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    res_s = saliency_sweep(engine, items, cfg, num_mask_samples=8,
                           fidelity_steps=8)
    res_b = saliency_sweep(engine, items, cfg, num_mask_samples=8,
                           fidelity_steps=8, image_batch=2)

    for res in (res_s, res_b):
        assert res.images_explained == 4
        for row in res.per_image:
            assert 0.0 <= row["deletion_auc"] <= 1.0
            assert 0.0 <= row["insertion_auc"] <= 1.0
        with_gt = [r for r in res.per_image if "pointing" in r]
        assert len(with_gt) == 2
        assert res.mean_deletion_auc > 0 or res.mean_insertion_auc > 0
        pooled = np.mean([r["pointing"] for r in with_gt])
        assert res.pointing_game_acc == pooled

    rows_s = sorted(res_s.per_image, key=lambda r: r["index"])
    rows_b = sorted(res_b.per_image, key=lambda r: r["index"])
    for a, b in zip(rows_s, rows_b):
        assert a["deletion_auc"] == b["deletion_auc"]
        assert a["insertion_auc"] == b["insertion_auc"]
        assert a.get("pointing") == b.get("pointing")


def test_bo_sweep_fidelity_fields():
    from network_interpretation_imagenet_tpu.config import BOConfig, SegmentConfig
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        bo_saliency_sweep,
    )

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=16,
                            compute_dtype=jnp.float32)
    rng = np.random.RandomState(5)
    items = []
    for _ in range(2):
        img = rng.rand(28, 28, 1).astype(np.float32)
        pred, _ = engine.predict_one(img)
        items.append((img, pred, np.array([4, 4, 10, 10])))

    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    res = bo_saliency_sweep(engine, items, cfg,
                            bo_cfg=BOConfig(n_pre_samples=2, n_iters=2),
                            image_batch=2, fidelity_steps=8)
    assert res.images_explained == 2
    for row in res.per_image:
        assert "deletion_auc" in row and "insertion_auc" in row
        assert "pointing" in row
    assert 0.0 <= res.pointing_game_acc <= 1.0


def test_occlusion_patch_larger_than_image_fails_loudly():
    logits_fn = _toy_model()
    img = np.ones((16, 16, 1), np.float32)
    import pytest

    with pytest.raises(ValueError, match="exceeds"):
        grad_mod.occlusion_map(logits_fn, None, img, 1, patch=32)


def test_xrai_greedy_analytic():
    """Hand-built attribution + a fine and a coarse segment map: regions
    must be claimed in density order, every pixel claimed once (the
    coarse map guarantees coverage), and rank values strictly ordered."""
    from network_interpretation_imagenet_tpu.saliency import xrai

    attr = np.zeros((4, 4), np.float32)
    attr[0:2, 0:2] = 1.0    # density 1.00 in fine quadrant 0
    attr[2:4, 2:4] = 0.25   # density 0.25 in fine quadrant 3
    fine = np.zeros((4, 4), np.int32)
    fine[0:2, 2:4] = 1
    fine[2:4, 0:2] = 2
    fine[2:4, 2:4] = 3
    coarse = np.zeros((4, 4), np.int32)  # one segment over everything

    heat, n = xrai.greedy_region_ranking(attr, [fine, coarse], min_area=1)
    assert n >= 3 and np.all(heat > 0)  # coarse map covers every pixel
    # Quadrant 0 is the densest → rank 1 → value 1.0, constant over it.
    assert np.all(heat[0:2, 0:2] == 1.0)
    # Quadrant 3 comes second (its 0.25 beats the coarse remainder's
    # 4·0.25/12); the zero-attribution quadrants come later still.
    assert np.all(heat[2:4, 2:4] < 1.0)
    assert np.all(heat[2:4, 2:4] > heat[0:2, 2:4])
    assert np.all(heat[2:4, 2:4] > heat[2:4, 0:2])

    # min_area larger than every segment → nothing claimable.
    heat0, n0 = xrai.greedy_region_ranking(attr, [fine], min_area=99)
    assert n0 == 0 and np.all(heat0 == 0)


def test_xrai_greedy_native_matches_numpy(rng):
    """The C++ greedy ranking (native/felzenszwalb.cc xrai_greedy_rank)
    is BIT-EXACT with the numpy reference: same float64 accumulation
    order, same first-maximum argmax tie rule, same min_area filtering —
    on a realistic FH ladder, on tie-heavy quantized attributions, and
    on label maps with a nonzero offset."""
    import pytest

    from network_interpretation_imagenet_tpu.saliency import xrai
    from network_interpretation_imagenet_tpu.segment import (
        felzenszwalb_ladder,
    )
    from network_interpretation_imagenet_tpu.segment.felzenszwalb import (
        _load_native,
    )

    if _load_native() is None:
        pytest.skip("native toolchain unavailable")

    img = np.zeros((48, 48, 3), np.uint8)
    r = np.random.RandomState(7)
    for _ in range(12):
        y, x = r.randint(0, 48, 2)
        h, w = r.randint(6, 20, 2)
        img[y:y + h, x:x + w] = r.randint(0, 256, 3)
    ladder = felzenszwalb_ladder(img, (20.0, 60.0, 150.0), sigma=0.5)

    cases = [
        rng.randn(48, 48).astype(np.float32),            # generic signed
        np.round(rng.randn(48, 48) * 2).astype(np.float32),  # heavy ties
        np.zeros((48, 48), np.float32),                  # all-tied zeros
    ]
    for attr in cases:
        h_np, n_np = xrai.greedy_region_ranking(attr, ladder,
                                                backend="numpy")
        h_cc, n_cc = xrai.greedy_region_ranking(attr, ladder,
                                                backend="native")
        assert n_cc == n_np
        np.testing.assert_array_equal(h_cc, h_np)

    # Label maps with arbitrary offsets (the per-map min subtraction).
    shifted = [m + 5 for m in ladder]
    attr = cases[0]
    h_np, n_np = xrai.greedy_region_ranking(attr, shifted, backend="numpy")
    h_cc, n_cc = xrai.greedy_region_ranking(attr, shifted, backend="native")
    assert n_cc == n_np
    np.testing.assert_array_equal(h_cc, h_np)

    # min_area floor: unclaimable segments leave pixels at 0 identically.
    h_np, n_np = xrai.greedy_region_ranking(attr, [ladder[0]], min_area=64,
                                            backend="numpy")
    h_cc, n_cc = xrai.greedy_region_ranking(attr, [ladder[0]], min_area=64,
                                            backend="native")
    assert n_cc == n_np
    np.testing.assert_array_equal(h_cc, h_np)

    with pytest.raises(ValueError, match="backend"):
        xrai.greedy_region_ranking(attr, ladder, backend="cuda")


def test_xrai_attribution_linear_exact():
    """For a LINEAR logit the integrated gradient is exact: grads are the
    constant weights, so attr = mean_b w·(x−b) = w·(x − (lo+hi)/2) with
    the default black/white baseline pair — sign preserved."""
    from network_interpretation_imagenet_tpu.saliency import xrai

    rng = np.random.RandomState(0)
    wmat = rng.randn(6, 6, 1).astype(np.float32)

    def logits_fn(variables, imgs):
        s = jnp.sum(imgs * jnp.asarray(wmat)[None], axis=(1, 2, 3))
        return jnp.stack([jnp.zeros_like(s), s], axis=1)

    img = rng.rand(6, 6, 1).astype(np.float32)
    attr = np.asarray(xrai.xrai_attribution(logits_fn, {}, img, 1, steps=8))
    mid = (img.min() + img.max()) / 2.0
    expected = (wmat * (img - mid))[:, :, 0]
    np.testing.assert_allclose(attr, expected, rtol=1e-4, atol=1e-6)
    assert attr.min() < 0 < attr.max()  # signedness preserved


def test_xrai_saliency_end_to_end():
    """Real zoo model end-to-end: multi-scale felzenszwalb ladder, device
    IG, greedy ranking → rank-valued [0,1] map covering the image."""
    from network_interpretation_imagenet_tpu.saliency import xrai

    rng = np.random.RandomState(1)
    mb = create_model("mnist_cnn", "mnist")
    mv = mb.init(jax.random.PRNGKey(0))
    img = rng.rand(28, 28, 1).astype(np.float32)
    disp = (img[:, :, 0] * 255).astype(np.uint8)
    res = xrai.xrai_saliency(mb.logits, mv, img, 3, disp,
                             steps=4, scales=(10.0, 50.0))
    assert res.heatmap.shape == (28, 28)
    assert res.attribution.shape == (28, 28)
    assert res.num_regions >= 1
    assert 0.0 <= res.heatmap.min() and res.heatmap.max() == 1.0


def test_xrai_adaptive_scales_resolution_invariant():
    """scales=None area-scales the 224² paper ladder: identity at 224²,
    shrunk (with a 1.0 floor) on small inputs — the FH scale parameter
    has pixel-count units, so the 224² values over-merge a smooth 32×32
    photo into ONE region and the ranking degenerates to a constant."""
    from network_interpretation_imagenet_tpu.saliency import xrai

    assert xrai.adaptive_scales(224, 224) == tuple(xrai.DEFAULT_SCALES)
    small = xrai.adaptive_scales(32, 32)
    ratio = (32 * 32) / (224 * 224)
    for got, base in zip(small, xrai.DEFAULT_SCALES):
        assert got == max(1.0, base * ratio)
    # Monotone ladder preserved.
    assert list(small) == sorted(small)


def test_xrai_adaptive_default_not_constant_on_small_photo():
    """A real photograph downscaled to 28×28 through scales=None must
    yield >1 region and a NON-constant heatmap; the 224²-tuned
    DEFAULT_SCALES ladder merges such images to one region (constant map
    — the degenerate rows the round-5 real-JPEG study exposed)."""
    import glob

    from PIL import Image

    from network_interpretation_imagenet_tpu.saliency import xrai
    from network_interpretation_imagenet_tpu.segment.felzenszwalb import (
        felzenszwalb_ladder,
    )

    jpeg = sorted(glob.glob(
        "tests/fixtures/imagenet_loc/**/*.JPEG", recursive=True))[0]
    disp = np.asarray(
        Image.open(jpeg).convert("RGB").resize((28, 28)), np.uint8)
    old = felzenszwalb_ladder(disp, xrai.DEFAULT_SCALES, sigma=0.5)
    new = felzenszwalb_ladder(disp, xrai.adaptive_scales(28, 28),
                              sigma=0.5)
    # The finest adaptive level splits the photo into strictly more
    # regions than the 224²-tuned ladder's finest level (which collapses
    # to 1-2 regions here — at 32×32 on all three fixture JPEGs it is
    # exactly 1, the constant-heatmap failure).
    assert int(new[0].max()) > int(old[0].max())
    assert int(new[0].max()) > 0
    mb = create_model("mnist_cnn", "mnist")
    mv = mb.init(jax.random.PRNGKey(0))
    img = (disp.mean(-1, keepdims=True) / 255.0).astype(np.float32)
    res = xrai.xrai_saliency(mb.logits, mv, img, 3, disp,
                             steps=4)  # scales=None → adaptive
    assert res.num_regions > 1
    assert float(np.ptp(res.heatmap)) > 0.0


def test_learned_mask_deletes_evidence_region():
    """Fong-Vedaldi learned mask on the toy region model: the optimized
    deletion mask must kill the target probability, concentrate deletion
    on the evidence region (far background stays kept), and be
    deterministic per seed."""
    from network_interpretation_imagenet_tpu.saliency import learned_mask as lm

    logits_fn = _toy_model()
    img = np.ones((16, 16, 1), np.float32)
    res = lm.learned_mask_saliency(
        logits_fn, None, img, 1, mask_size=8, iters=150, baseline="zero",
        jitter=2, max_shift=1, seed=0, l1=0.1)
    h = res.heatmap
    assert h.shape == (16, 16)
    assert res.prob_masked < res.prob_original - 0.3
    # Evidence region (img[4:12,4:12]) is deleted hard; the far corners
    # (outside the one-lowres-cell bilinear bleed ring) stay kept.
    assert h[4:12, 4:12].mean() > 0.9
    corners = np.concatenate([h[:2, :2], h[:2, -2:], h[-2:, :2],
                              h[-2:, -2:]], axis=None)
    assert corners.mean() < 0.3
    again = lm.learned_mask_saliency(
        logits_fn, None, img, 1, mask_size=8, iters=150, baseline="zero",
        jitter=2, max_shift=1, seed=0, l1=0.1)
    np.testing.assert_array_equal(h, again.heatmap)

    # Guards fail loudly.
    for kw in ({"mask_size": 0}, {"iters": 0}, {"baseline": "nope"},
               {"jitter": -1}, {"max_shift": -3}):
        try:
            lm.learned_mask_saliency(logits_fn, None, img, 1, **kw)
            raise AssertionError(f"expected ValueError for {kw}")
        except ValueError:
            pass


def test_learned_mask_blur_baseline_and_zoo():
    """The blur baseline path runs end-to-end on a real zoo model, and
    gaussian_blur preserves constants / reduces to identity-ish maps."""
    from network_interpretation_imagenet_tpu.saliency import learned_mask as lm

    const = np.full((9, 9, 3), 0.7, np.float32)
    blurred = np.asarray(lm.gaussian_blur(const, sigma=2.0))
    # SAME padding with zeros darkens edges; the interior is exact.
    np.testing.assert_allclose(blurred[4, 4], 0.7, atol=1e-5)

    rng = np.random.RandomState(0)
    mb = create_model("mnist_cnn", "mnist")
    mv = mb.init(jax.random.PRNGKey(0))
    img = rng.rand(28, 28, 1).astype(np.float32)
    res = lm.learned_mask_saliency(mb.logits, mv, img, 3, mask_size=7,
                                   iters=10, jitter=2, max_shift=2,
                                   baseline="blur", seed=1)
    assert res.heatmap.shape == (28, 28)
    assert 0.0 <= res.heatmap.min() and res.heatmap.max() <= 1.0
    assert np.isfinite(res.final_loss)


# ---------------------------------------------------------------------------
# Batched attribution machinery (attribute_batch + attribution_sweep)
# ---------------------------------------------------------------------------


def test_attribute_batch_matches_single_all_methods(rng):
    """One vmapped program == N per-image calls, for every batchable
    method, across a non-pow-2 N (pads trim back)."""
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    imgs = rng.rand(3, 28, 28, 1).astype(np.float32)
    targets = np.array([1, 2, 3], np.int32)
    seeds = np.array([5, 6, 7], np.int32)

    singles = {
        "gradient": [grad_mod.input_gradient(
            bundle.logits, variables, imgs[i], targets[i]) for i in range(3)],
        "grad_input": [grad_mod.grad_times_input(
            bundle.logits, variables, imgs[i], targets[i]) for i in range(3)],
        "integrated": [grad_mod.integrated_gradients(
            bundle.logits, variables, imgs[i], targets[i], steps=4)
            for i in range(3)],
        "smoothgrad": [grad_mod.smoothgrad(
            bundle.logits, variables, imgs[i], targets[i], samples=3,
            noise_sigma=0.1, seed=int(seeds[i])) for i in range(3)],
        "gradcam": [grad_mod.gradcam(
            bundle, variables, imgs[i], targets[i]) for i in range(3)],
    }
    for m in grad_mod.BATCHABLE_METHODS:
        out = grad_mod.attribute_batch(
            bundle.logits, variables, imgs, targets, m, bundle=bundle,
            steps=4, samples=3, noise_sigma=0.1, seeds=seeds,
        )
        assert out.shape == (3, 28, 28)
        np.testing.assert_allclose(
            np.asarray(out), np.stack([np.asarray(s) for s in singles[m]]),
            atol=2e-5, err_msg=m)

    # Validation: unknown method, bad shapes, gradcam without bundle.
    with pytest.raises(ValueError, match="batchable"):
        grad_mod.attribute_batch(bundle.logits, variables, imgs, targets,
                                 "rise")
    with pytest.raises(ValueError, match="bundle"):
        grad_mod.attribute_batch(bundle.logits, variables, imgs, targets,
                                 "gradcam")
    with pytest.raises(ValueError, match=r"\[N, H, W, C\]"):
        grad_mod.attribute_batch(bundle.logits, variables, imgs[0], targets,
                                 "gradient")
    with pytest.raises(ValueError, match="targets/seeds"):
        grad_mod.attribute_batch(bundle.logits, variables, imgs,
                                 targets[:2], "gradient")
    # N=0 returns a typed empty, no device program.
    empty = grad_mod.attribute_batch(
        bundle.logits, variables, np.zeros((0, 28, 28, 1), np.float32),
        np.zeros(0, np.int32), "gradient")
    assert empty.shape == (0, 28, 28)


def test_attribute_batch_mesh_matches_single(rng):
    """The image axis shards over the mesh's data axis; results equal the
    single-device program (pad image-0 lanes trim away)."""
    from network_interpretation_imagenet_tpu.parallel import make_mesh

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    mesh = make_mesh()
    imgs = rng.rand(5, 28, 28, 1).astype(np.float32)
    targets = (np.arange(5) % 10).astype(np.int32)
    seeds = np.arange(5, dtype=np.int32)
    for m in ("integrated", "smoothgrad"):
        plain = grad_mod.attribute_batch(
            bundle.logits, variables, imgs, targets, m,
            steps=4, samples=3, seeds=seeds)
        sharded = grad_mod.attribute_batch(
            bundle.logits, variables, imgs, targets, m,
            steps=4, samples=3, seeds=seeds, mesh=mesh)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                                   atol=1e-5, err_msg=m)


def test_attribution_sweep_end_to_end(rng):
    """attribution_sweep: skips misclassified, scores IOU where gt exists,
    and per-image heatmaps are invariant to flush composition (seeds derive
    from dataset indices)."""
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=32,
                            compute_dtype=jnp.float32)
    images = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(6)]
    preds = [int(engine.predict_one(im)[0]) for im in images]
    # Items: four correct labels, one wrong (skip), one unlabeled + gt box.
    wrong = (preds[2] + 1) % 10
    dataset = [
        (images[0], preds[0], None),
        (images[1], preds[1], (4.0, 4.0, 12.0, 12.0)),
        (images[2], wrong, None),
        (images[3], preds[3], None),
        (images[4], None, (2.0, 2.0, 8.0, 8.0)),
        (images[5], preds[5], None),
    ]
    res = attribution_sweep(engine, list(dataset), method="smoothgrad",
                            image_batch=3, seed=11, samples=3,
                            keep_heatmaps=True)
    assert res.images_total == 6
    assert res.images_explained == 5
    assert res.images_skipped_misclassified == 1
    assert res.images_failed == 0
    ious = [r["iou"] for r in res.per_image if "iou" in r]
    assert len(ious) == 2 and all(0.0 <= v <= 1.0 for v in ious)
    assert all(r["method"] == "smoothgrad" for r in res.per_image)
    assert set(res.heatmaps) == {0, 1, 3, 4, 5}
    assert res.evals_per_sec > 0

    # Flush-composition invariance: image_batch=2 reproduces every heatmap
    # bit-for-bit (per-image seeds derive from dataset indices).
    res2 = attribution_sweep(engine, list(dataset), method="smoothgrad",
                             image_batch=2, seed=11, samples=3,
                             keep_heatmaps=True)
    assert set(res2.heatmaps) == set(res.heatmaps)
    for i in res.heatmaps:
        np.testing.assert_array_equal(res.heatmaps[i], res2.heatmaps[i])


def test_attribution_sweep_mesh_matches_single(rng):
    from network_interpretation_imagenet_tpu.parallel import make_mesh
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=32,
                            compute_dtype=jnp.float32)
    dataset = [(rng.rand(28, 28, 1).astype(np.float32), None, None)
               for _ in range(5)]
    plain = attribution_sweep(engine, list(dataset), method="integrated",
                              image_batch=4, steps=4, keep_heatmaps=True)
    sharded = attribution_sweep(engine, list(dataset), method="integrated",
                                image_batch=4, steps=4, keep_heatmaps=True,
                                mesh=make_mesh())
    assert plain.images_explained == sharded.images_explained == 5
    for i in plain.heatmaps:
        np.testing.assert_allclose(sharded.heatmaps[i], plain.heatmaps[i],
                                    atol=1e-5)


def test_grad_mean_chunked_is_exact(rng):
    """step_batch/sample_batch scan accumulation is EXACT (gradients sum
    linearly), single-image and inside attribute_batch."""
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    img = rng.rand(28, 28, 1).astype(np.float32)

    full = grad_mod.integrated_gradients(bundle.logits, variables, img, 3,
                                         steps=8)
    chunked = grad_mod.integrated_gradients(bundle.logits, variables, img, 3,
                                            steps=8, step_batch=2)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)

    for mag in (False, True):
        sg_full = grad_mod.smoothgrad(bundle.logits, variables, img, 3,
                                      samples=6, seed=9, magnitude=mag)
        sg_chunk = grad_mod.smoothgrad(bundle.logits, variables, img, 3,
                                       samples=6, seed=9, magnitude=mag,
                                       sample_batch=3)
        np.testing.assert_allclose(np.asarray(sg_chunk), np.asarray(sg_full),
                                   atol=1e-5)

    with pytest.raises(ValueError, match="divide"):
        grad_mod.integrated_gradients(bundle.logits, variables, img, 3,
                                      steps=8, step_batch=3)

    # Through the batched program too.
    imgs = rng.rand(3, 28, 28, 1).astype(np.float32)
    ts = np.array([1, 2, 3], np.int32)
    b_full = grad_mod.attribute_batch(bundle.logits, variables, imgs, ts,
                                      "integrated", steps=8)
    b_chunk = grad_mod.attribute_batch(bundle.logits, variables, imgs, ts,
                                       "integrated", steps=8, step_batch=4)
    np.testing.assert_allclose(np.asarray(b_chunk), np.asarray(b_full),
                               atol=1e-5)


def test_learned_mask_batch_matches_single(rng):
    """N learned-mask Adam loops in ONE program reproduce per-image calls
    (same jitted core, vmapped), on and off the mesh."""
    from network_interpretation_imagenet_tpu.parallel import make_mesh
    from network_interpretation_imagenet_tpu.saliency import learned_mask

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    imgs = rng.rand(3, 28, 28, 1).astype(np.float32)
    ts = [1, 2, 3]
    kw = dict(mask_size=7, iters=6, jitter=2)
    batch = learned_mask.learned_mask_saliency_batch(
        bundle.logits, variables, imgs, ts, seeds=[5, 6, 7], **kw)
    for i in range(3):
        single = learned_mask.learned_mask_saliency(
            bundle.logits, variables, imgs[i], ts[i], seed=5 + i, **kw)
        np.testing.assert_allclose(batch[i].heatmap, single.heatmap,
                                   atol=2e-5)
        np.testing.assert_allclose(batch[i].prob_masked, single.prob_masked,
                                   atol=2e-5)
        np.testing.assert_allclose(batch[i].prob_original,
                                   single.prob_original, atol=2e-5)
    sharded = learned_mask.learned_mask_saliency_batch(
        bundle.logits, variables, imgs, ts, seeds=[5, 6, 7],
        mesh=make_mesh(), **kw)
    for i in range(3):
        np.testing.assert_allclose(sharded[i].heatmap, batch[i].heatmap,
                                   atol=1e-5)
    # Typed empty + validation.
    empty = learned_mask.learned_mask_saliency_batch(
        bundle.logits, variables, np.zeros((0, 28, 28, 1), np.float32), [],
        **kw)
    assert empty == []
    with pytest.raises(ValueError, match="baseline"):
        learned_mask.learned_mask_batch_dispatch(
            bundle.logits, variables, imgs, ts, baseline="nope")


def test_attribution_sweep_meaningful(rng):
    """method='meaningful' drives the sweep with batched learned masks;
    rows carry prob_original/prob_masked and heatmaps are
    flush-composition invariant."""
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=32,
                            compute_dtype=jnp.float32)
    dataset = [(rng.rand(28, 28, 1).astype(np.float32), None, None)
               for _ in range(3)]
    lm_cfg = dict(mask_size=7, iters=6, jitter=2)
    res = attribution_sweep(engine, list(dataset), method="meaningful",
                            image_batch=2, seed=3, lm_cfg=lm_cfg,
                            keep_heatmaps=True)
    assert res.images_explained == 3
    for r in res.per_image:
        assert r["method"] == "meaningful"
        assert 0.0 <= r["prob_masked"] <= 1.0
        assert 0.0 <= r["prob_original"] <= 1.0
    res2 = attribution_sweep(engine, list(dataset), method="meaningful",
                             image_batch=3, seed=3, lm_cfg=lm_cfg,
                             keep_heatmaps=True)
    for i in res.heatmaps:
        np.testing.assert_allclose(res2.heatmaps[i], res.heatmaps[i],
                                   atol=2e-5)


def test_attribution_sweep_xrai(rng):
    """method='xrai': batched signed-IG per flush, per-image host ladder
    ranking at collect; heatmaps match xrai_saliency per image."""
    from network_interpretation_imagenet_tpu.ops import aggregate
    from network_interpretation_imagenet_tpu.saliency import xrai
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=32,
                            compute_dtype=jnp.float32)
    images = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(3)]
    dataset = [(im, None, None) for im in images]
    res = attribution_sweep(engine, list(dataset), method="xrai",
                            image_batch=2, steps=4, keep_heatmaps=True,
                            xrai_scales=(20.0, 60.0))
    assert res.images_explained == 3
    for r in res.per_image:
        assert r["method"] == "xrai" and r["num_regions"] >= 1
    for i, im in enumerate(images):
        target = int(engine.predict_one(im)[0])
        disp = aggregate.normalize_to_uint8_np(im)[:, :, 0]
        ref = xrai.xrai_saliency(bundle.logits, variables, im, target,
                                 disp, steps=4, scales=(20.0, 60.0))
        np.testing.assert_allclose(res.heatmaps[i], ref.heatmap, atol=2e-5)


def test_attribution_sweep_xrai_f16_wire(rng):
    """xrai + heatmap_wire='f16': the signed-IG attribution stack rides
    the wire in half precision (sign preserved; <=2^-11 relative
    rounding) and the host ladder reconstructs to f32 — region heatmaps
    match the f32 wire within the rounding the region sums absorb."""
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=32,
                            compute_dtype=jnp.float32)
    images = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(3)]
    dataset = [(im, None, None) for im in images]
    kw = dict(method="xrai", image_batch=2, steps=4, keep_heatmaps=True,
              xrai_scales=(20.0, 60.0))
    res_f32 = attribution_sweep(engine, list(dataset), **kw)
    res_f16 = attribution_sweep(engine, list(dataset),
                                heatmap_wire="f16", **kw)
    assert res_f16.images_explained == res_f32.images_explained == 3
    for i in range(3):
        h = res_f32.heatmaps[i]
        span = float(h.max() - h.min()) or 1.0
        # f16 has ~3 decimal digits; the ladder's region sums average the
        # per-pixel rounding down further.
        np.testing.assert_allclose(res_f16.heatmaps[i], h,
                                   rtol=5e-3, atol=span * 2e-3)
        assert (res_f16.per_image[i]["num_regions"]
                == res_f32.per_image[i]["num_regions"])


def test_attribution_sweep_uint8_wire_matches_f32(rng):
    """The uint8 wire (raw u8 dataset + normalize=(mean, std), scaled and
    normalized ON DEVICE — 1/4 the flush upload bytes) must reproduce the
    f32 path fed the identically host-normalized images, including the
    fidelity row fields (which normalize the u8 image host-side)."""
    import pytest

    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=32,
                            compute_dtype=jnp.float32)
    mean, std = (0.1307,), (0.3081,)
    u8s = [rng.randint(0, 256, (28, 28, 1)).astype(np.uint8)
           for _ in range(5)]
    f32s = [((u.astype(np.float32) / np.float32(255.0)
              - np.asarray(mean, np.float32))
             / np.asarray(std, np.float32)) for u in u8s]

    u8_ds = [(u, None, None) for u in u8s]
    f32_ds = [(f, None, None) for f in f32s]
    res_u8 = attribution_sweep(engine, u8_ds, method="integrated",
                               image_batch=3, steps=4, seed=5,
                               keep_heatmaps=True, fidelity_steps=4,
                               normalize=(mean, std))
    res_f32 = attribution_sweep(engine, f32_ds, method="integrated",
                                image_batch=3, steps=4, seed=5,
                                keep_heatmaps=True, fidelity_steps=4)
    assert res_u8.images_explained == res_f32.images_explained == 5
    for i in range(5):
        np.testing.assert_allclose(res_u8.heatmaps[i], res_f32.heatmaps[i],
                                   rtol=1e-4, atol=1e-6)
    for ru, rf in zip(res_u8.per_image, res_f32.per_image):
        assert ru["target"] == rf["target"]
        np.testing.assert_allclose(ru["deletion_auc"], rf["deletion_auc"],
                                   atol=1e-4)
        np.testing.assert_allclose(ru["insertion_auc"], rf["insertion_auc"],
                                   atol=1e-4)

    # uint8 without normalize is a LOUD config error, not N failed images.
    with pytest.raises(ValueError, match="normalize"):
        attribution_sweep(engine, u8_ds, method="integrated",
                          image_batch=3, steps=4, seed=5)

    # Mixed u8/f32 flushes would silently promote raw pixels — rejected.
    mixed = [(u8s[0], None, None), (f32s[1], None, None),
             (u8s[2], None, None)]
    res_mixed = attribution_sweep(engine, mixed, method="integrated",
                                  image_batch=3, steps=4, seed=5,
                                  normalize=(mean, std))
    assert res_mixed.images_failed == 3 and res_mixed.images_explained == 0


def test_attribution_sweep_uint8_wire_xrai_display(rng):
    """On the uint8 wire, xrai's felzenszwalb ladder segments the RAW u8
    image (what a JPEG pipeline hands xrai_saliency), and results match
    the live xrai_saliency given the same display."""
    from network_interpretation_imagenet_tpu.saliency import xrai as xm
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=32,
                            compute_dtype=jnp.float32)
    mean, std = (0.1307,), (0.3081,)
    u8 = np.zeros((28, 28, 1), np.uint8)
    u8[4:14, 4:14] = 230
    u8[16:26, 10:22] = 128
    u8 = np.clip(u8.astype(np.int32)
                 + (5 * rng.randn(28, 28, 1)).astype(np.int32),
                 0, 255).astype(np.uint8)
    scales = (10.0, 30.0)
    res = attribution_sweep(engine, [(u8, None, None)], method="xrai",
                            image_batch=1, steps=4, seed=5,
                            keep_heatmaps=True, xrai_scales=scales,
                            normalize=(mean, std))
    assert res.images_explained == 1
    f32 = ((u8.astype(np.float32) / np.float32(255.0)
            - np.asarray(mean, np.float32)) / np.asarray(std, np.float32))
    target = int(engine.predict_one(f32)[0])
    live = xm.xrai_saliency(bundle.logits, variables, f32, target,
                            u8[:, :, 0], steps=4, scales=scales)
    np.testing.assert_allclose(res.heatmaps[0], live.heatmap, atol=1e-5)
    assert res.per_image[0]["num_regions"] == live.num_regions


def test_bo_sweep_uint8_wire_matches_f32():
    """The uint8 wire on the FLAGSHIP BO sweep: raw-u8 input +
    normalize=(mean, std) must reproduce the f32 path fed the SAME
    normalized bits — so the reference dataset here is the u8 images
    round-tripped through the device normalizer. That pins the wire
    MECHANICS (u8 upload, on-device scale+normalize, flush composition,
    SLIC display derivation, per-image seeds) exactly. A host-numpy
    normalize twin is NOT a valid reference for this discrete lane: XLA's
    compiled (x/255-m)/s differs by 1-2 ulp, which can flip a uint8
    display bin, move a SLIC boundary pixel, and fork the whole BO
    trajectory (masks are segment windows). The continuous-lane test
    above covers host-normalized tolerance parity."""
    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        _u8_normalize_device, bo_saliency_sweep,
    )

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=8,
                            compute_dtype=jnp.float32)
    mean, std = (0.1307,), (0.3081,)
    r = np.random.RandomState(3)
    u8s = [r.randint(0, 256, (28, 28, 1)).astype(np.uint8)
           for _ in range(4)]
    f32s = list(np.asarray(
        _u8_normalize_device(jax.device_put(np.stack(u8s)), (mean, std))))
    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    kw = dict(bo_cfg=BOConfig(n_iters=2, n_pre_samples=2), image_batch=2,
              seed=9, keep_heatmaps=True)
    res_u8 = bo_saliency_sweep(engine, [(u, None, None) for u in u8s],
                               cfg, normalize=(mean, std), **kw)
    res_f32 = bo_saliency_sweep(engine, [(f, None, None) for f in f32s],
                                cfg, **kw)
    assert res_u8.images_explained == res_f32.images_explained == 4
    for i in range(4):
        np.testing.assert_array_equal(res_u8.heatmaps[i],
                                      res_f32.heatmaps[i])
    for ru, rf in zip(res_u8.per_image, res_f32.per_image):
        assert ru["target"] == rf["target"]
        assert ru["num_segments"] == rf["num_segments"]
        assert ru["best_start"] == rf["best_start"]


def test_batched_sweep_deferred_predict_matches_labeled(rng):
    """Unlabeled flushes take the deferred-predict path (targets stay on
    device, no blocking logits fetch before dispatch); they must be
    BIT-identical to the labeled path (host preds for the skip decision)
    given labels that keep every image — same targets, same programs.
    Covers both batched-flush lanes; also re-pins that a wrong label
    still skips."""
    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep, bo_saliency_sweep,
    )

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=16,
                            compute_dtype=jnp.float32)
    imgs = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(4)]
    preds = [int(engine.predict_one(im)[0]) for im in imgs]

    unlabeled = [(im, None, None) for im in imgs]
    labeled = [(im, p, None) for im, p in zip(imgs, preds)]

    kw = dict(method="integrated", image_batch=2, steps=4, seed=7,
              keep_heatmaps=True)
    res_d = attribution_sweep(engine, unlabeled, **kw)
    res_l = attribution_sweep(engine, labeled, **kw)
    assert res_d.images_explained == res_l.images_explained == 4
    assert res_l.images_skipped_misclassified == 0
    for i in range(4):
        np.testing.assert_array_equal(res_d.heatmaps[i], res_l.heatmaps[i])
        assert (res_d.per_image[i]["target"]
                == res_l.per_image[i]["target"] == preds[i])

    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    bkw = dict(bo_cfg=BOConfig(n_iters=2, n_pre_samples=2), image_batch=2,
               seed=11, keep_heatmaps=True)
    res_bd = bo_saliency_sweep(engine, unlabeled, cfg, **bkw)
    res_bl = bo_saliency_sweep(engine, labeled, cfg, **bkw)
    assert res_bd.images_explained == res_bl.images_explained == 4
    for i in range(4):
        np.testing.assert_array_equal(res_bd.heatmaps[i],
                                      res_bl.heatmaps[i])
        assert (res_bd.per_image[i]["best_start"]
                == res_bl.per_image[i]["best_start"])

    # A wrong label must still skip (the labeled path's whole point).
    bad = [(imgs[0], (preds[0] + 1) % 10, None)] + labeled[1:]
    res_s = attribution_sweep(engine, bad, **kw)
    assert res_s.images_skipped_misclassified == 1
    assert res_s.images_explained == 3


def test_attribution_sweep_heatmap_wire(rng):
    """heatmap_wire='f16'/'u8' shrink the flush's heatmap fetch (2x/4x);
    f16 reconstructs within half-precision rounding, u8 within 1/255 of
    the per-image span — and the u8 bbox/IOU row is EXACT (localization
    min-max-normalizes to u8 anyway; quantization is a monotonic affine
    map). xrai/meaningful + non-f32 wires are refused."""
    import pytest

    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=32,
                            compute_dtype=jnp.float32)
    gt = [3, 5, 14, 12]  # xywh box so the IOU row exercises bbox
    ds = [(rng.rand(28, 28, 1).astype(np.float32), None, gt)
          for _ in range(4)]
    kw = dict(method="integrated", image_batch=2, steps=4, seed=3,
              keep_heatmaps=True)
    res_f32 = attribution_sweep(engine, ds, **kw)
    res_f16 = attribution_sweep(engine, ds, heatmap_wire="f16", **kw)
    res_u8 = attribution_sweep(engine, ds, heatmap_wire="u8", **kw)
    assert (res_f32.images_explained == res_f16.images_explained
            == res_u8.images_explained == 4)
    for i in range(4):
        h = res_f32.heatmaps[i]
        span = float(h.max() - h.min())
        np.testing.assert_allclose(res_f16.heatmaps[i], h,
                                   rtol=2e-3, atol=span * 1e-3)
        np.testing.assert_allclose(res_u8.heatmaps[i], h,
                                   atol=span / 255.0 + 1e-9)
        # IOU exactness under u8: monotonic affine quantization commutes
        # with the min-max-u8 threshold inside localization_score.
        assert (res_u8.per_image[i]["iou"]
                == res_f32.per_image[i]["iou"])

    with pytest.raises(ValueError, match="heatmap_wire"):
        attribution_sweep(engine, ds, method="xrai", image_batch=2,
                          steps=4, seed=3, heatmap_wire="u8")
    with pytest.raises(ValueError, match="f32|f16|u8"):
        attribution_sweep(engine, ds, heatmap_wire="bf16", **kw)


# ---------------------------------------------------------------------------
# Mask-batched per-image methods at sweep scale (occlusion / rise / scorecam)
# ---------------------------------------------------------------------------


def _mask_batched_engine():
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=32,
                            compute_dtype=jnp.float32)
    return bundle, variables, engine


def test_mask_batched_sweep_matches_one_shot(rng):
    """occlusion/rise/scorecam at sweep scale return EXACTLY the one-shot
    fns' heatmaps (same ops in one jitted program; rise additionally
    shares the PRNG chunk structure when mask_batch matches the one-shot
    batch), with seeds derived from dataset indices."""
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    bundle, variables, engine = _mask_batched_engine()
    imgs = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(3)]
    ds = [(im, None, None) for im in imgs]
    targets = [
        int(np.argmax(np.asarray(engine.predict(jnp.asarray(im)[None]))[0]))
        for im in imgs
    ]
    seed = 11

    cases = {
        "rise": (
            dict(rise_masks=32, rise_grid=4, rise_keep_prob=0.5,
                 mask_batch=16),
            lambda im, t, i: grad_mod.rise_map(
                bundle.logits, variables, im, t, num_masks=32, grid=4,
                keep_prob=0.5, batch=16, seed=seed + i),
        ),
        "occlusion": (
            dict(patch=8, stride=8, mask_batch=8),
            lambda im, t, i: grad_mod.occlusion_map(
                bundle.logits, variables, im, t, patch=8, stride=8,
                batch=8),
        ),
        "scorecam": (
            dict(scorecam_channels=4, mask_batch=4),
            lambda im, t, i: grad_mod.scorecam(
                bundle, variables, im, t, channels=4, batch=4),
        ),
    }
    for method, (kw, one_shot) in cases.items():
        res = attribution_sweep(engine, ds, method=method, image_batch=2,
                                seed=seed, keep_heatmaps=True, **kw)
        assert res.images_explained == 3, method
        for i in range(3):
            want = np.asarray(one_shot(imgs[i], targets[i], i))
            np.testing.assert_allclose(
                res.heatmaps[i], want, rtol=1e-5, atol=1e-6,
                err_msg=f"{method} image {i}")
            assert res.per_image[i]["method"] == method


def test_mask_batched_sweep_eval_accounting(rng):
    """evals_per_sec counts masked forwards: rise rounds masks up to a
    chunk multiple, occlusion resolves its position grid from the image
    shape (callable evals_per_image), scorecam counts scored channels."""
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        _attr_evals_per_image,
    )

    assert _attr_evals_per_image(
        "rise", steps=0, samples=0, lm={}, rise_masks=33, mask_batch=16,
        patch=8, stride=8, scorecam_channels=4) == 48  # 33 -> 3 chunks
    occ = _attr_evals_per_image(
        "occlusion", steps=0, samples=0, lm={}, rise_masks=0,
        mask_batch=None, patch=8, stride=8, scorecam_channels=4)
    assert callable(occ)
    assert occ((28, 28, 1)) == 9   # 3x3 grid of 8px patches at stride 8
    assert occ((8, 8, 1)) == 1
    assert occ((7, 8, 1)) == 0     # patch exceeds height
    assert _attr_evals_per_image(
        "scorecam", steps=0, samples=0, lm={}, rise_masks=0,
        mask_batch=None, patch=8, stride=8, scorecam_channels=4) == 4


def test_mask_batched_sweep_heatmap_wire_and_journal(rng):
    """The mask-batched lane shares the heatmap wire (u8 IOU rows exact)
    and journal resume (rows invariant to interruption) with the
    gradient family."""
    from network_interpretation_imagenet_tpu.saliency.journal import (
        SweepJournal,
    )
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    _, _, engine = _mask_batched_engine()
    gt = [3, 5, 14, 12]
    ds = [(rng.rand(28, 28, 1).astype(np.float32), None, gt)
          for _ in range(4)]
    kw = dict(method="occlusion", image_batch=2, patch=8, stride=8,
              mask_batch=8, seed=3, keep_heatmaps=True)
    res_f32 = attribution_sweep(engine, ds, **kw)
    res_u8 = attribution_sweep(engine, ds, heatmap_wire="u8", **kw)
    assert res_u8.images_explained == res_f32.images_explained == 4
    for i in range(4):
        h = res_f32.heatmaps[i]
        span = float(h.max() - h.min())
        np.testing.assert_allclose(res_u8.heatmaps[i], h,
                                   atol=span / 255.0 + 1e-9)
        assert res_u8.per_image[i]["iou"] == res_f32.per_image[i]["iou"]

    # Journal resume: first run explains 2 images, the resumed run the
    # other 2; merged rows must equal the uninterrupted run's.
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        jpath = os.path.join(td, "sweep.journal")
        j1 = SweepJournal(jpath, config={"attribute": "occlusion"},
                          keep_heatmaps=True)
        attribution_sweep(engine, ds[:2], journal=j1, dataset_indices=[0, 1],
                          **kw)
        j2 = SweepJournal(jpath, resume=True, keep_heatmaps=True,
                          config={"attribute": "occlusion"})
        res_resumed = attribution_sweep(engine, ds, journal=j2,
                                        dataset_indices=[0, 1, 2, 3], **kw)
        assert res_resumed.images_explained == 4
        by_index = {r["index"]: r for r in res_resumed.per_image}
        for i in range(4):
            np.testing.assert_allclose(
                by_index[i]["iou"], res_f32.per_image[i]["iou"])


def test_mask_batched_sweep_mesh_matches_single(rng):
    """Mesh-sharded mask-batched sweep (each device lax.maps its image
    shard) matches the single-device run exactly."""
    from network_interpretation_imagenet_tpu.parallel import make_mesh
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    _, _, engine = _mask_batched_engine()
    ds = [(rng.rand(28, 28, 1).astype(np.float32), None, None)
          for _ in range(3)]
    kw = dict(method="rise", image_batch=3, rise_masks=16, rise_grid=4,
              mask_batch=8, seed=5, keep_heatmaps=True)
    res_single = attribution_sweep(engine, ds, **kw)
    res_mesh = attribution_sweep(engine, ds, mesh=make_mesh(), **kw)
    assert res_mesh.images_explained == res_single.images_explained == 3
    for i in range(3):
        np.testing.assert_allclose(res_mesh.heatmaps[i],
                                   res_single.heatmaps[i],
                                   rtol=1e-5, atol=1e-6)
