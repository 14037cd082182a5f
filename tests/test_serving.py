"""AOT serving artifacts (serving.py): export → load → parity with the
live engine."""

import numpy as np
import jax
import jax.numpy as jnp

from network_interpretation_imagenet_tpu import serving
from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.saliency import SaliencyEngine


def _engine():
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    return SaliencyEngine(bundle, variables, mask_batch=16,
                          compute_dtype=jnp.float32)


def test_export_load_matches_engine(tmp_path, rng):
    engine = _engine()
    path = str(tmp_path / "artifact")
    manifest = serving.export_engine(engine, path, batch_sizes=(16, 4))
    assert manifest["arch"] == "mnist_cnn"
    assert set(manifest["files"]) == {"16", "4"}

    server = serving.load_exported(path)  # weights from the bundled msgpack
    image = rng.rand(28, 28, 1).astype(np.float32)
    segments = rng.randint(0, 10, (28, 28)).astype(np.int32)
    firsts = rng.randint(0, 7, size=21).astype(np.int32)  # 16 + 4 + pad bucket
    width = 3
    target = 5

    ref = engine.eval_window_masks(image, segments, firsts, width, target)
    # Same typed contract as the live engine (drop-in substitute).
    srv = server.eval_window_masks(image, segments, firsts, width, target)
    assert type(srv) is type(ref)
    np.testing.assert_array_equal(srv.preds, ref.preds)
    np.testing.assert_array_equal(srv.survived, ref.survived)
    np.testing.assert_allclose(srv.prob_target, ref.prob_target, atol=1e-5)
    np.testing.assert_allclose(srv.prob_max, ref.prob_max, atol=1e-5)

    # K=0 honors the engine contract (empty typed result, no crash).
    empty = server.logits_for_windows(image, segments, np.zeros(0, np.int32), width)
    assert empty.shape == (0, manifest["num_classes"])
    r0 = server.eval_window_masks(
        image, segments, np.zeros(0, np.int32), width, target
    )
    assert r0.survived.shape == (0,) and r0.preds.shape == (0,)


def test_export_at_explicit_input_size(tmp_path, rng):
    """input_size= lowers the artifact for a non-native resolution (the
    inception-299-vs-pipeline-224 case, ADVICE r2) — every zoo model is
    global-pooled so any resolution traces; the manifest records both."""
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.models import create_model

    bundle = create_model("resnet18", "imagenet", num_classes=10)
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=4,
                            compute_dtype=jnp.float32)
    path = str(tmp_path / "artifact32")
    manifest = serving.export_engine(
        engine, path, batch_sizes=(4,), input_size=32
    )
    assert manifest["input_size"] == 32
    assert manifest["native_input_size"] == 224
    server = serving.load_exported(path)
    image = rng.rand(32, 32, 3).astype(np.float32)
    segments = rng.randint(0, 6, (32, 32)).astype(np.int32)
    logits = server.logits_for_windows(
        image, segments, np.arange(4, dtype=np.int32), 2
    )
    ref = engine.predict(
        image[None] * (segments >= 0)[None, :, :, None]
    )  # sanity: shapes agree with a live 32² forward
    assert logits.shape == (4, 10) and ref.shape == (1, 10)


def test_export_without_weights_requires_variables(tmp_path, rng):
    engine = _engine()
    path = str(tmp_path / "artifact")
    serving.export_engine(engine, path, batch_sizes=(8,), include_weights=False)
    try:
        serving.load_exported(path)
        assert False, "expected ValueError for missing weights"
    except ValueError:
        pass
    server = serving.load_exported(path, variables=engine.variables)
    logits = server.logits_for_windows(
        rng.rand(28, 28, 1).astype(np.float32),
        rng.randint(0, 10, (28, 28)).astype(np.int32),
        np.arange(5, dtype=np.int32),
        3,
    )
    assert logits.shape == (5, 10)


def test_flatten_batches():
    """Fewest dispatches first, least padding second (a 255-mask tail is one
    padded 256 call, not eight 32 calls)."""
    assert serving._flatten_batches(21, (16, 4)) == [16, 16]  # 2 calls < 3
    assert serving._flatten_batches(20, (16, 4)) == [16, 4]
    assert serving._flatten_batches(16, (16, 4)) == [16]
    assert serving._flatten_batches(3, (16, 4)) == [4]
    assert serving._flatten_batches(40, (16, 4)) == [16, 16, 16]  # 3 < 4
    assert serving._flatten_batches(255, (1024, 256, 32)) == [256]
    assert serving._flatten_batches(1023, (1024, 256, 32)) == [1024]
    assert serving._flatten_batches(1280, (1024, 256, 32)) == [1024, 256]


def test_export_serving_cli(tmp_path):
    from network_interpretation_imagenet_tpu.cli import export_serving

    out = str(tmp_path / "artifact")
    rc = export_serving.main([
        "--arch", "mnist_cnn", "--dataset", "mnist", "--synthetic",
        "--dtype", "float32", "--out", out, "--batch-sizes", "8",
        "--bo", "--candidate-buckets", "8", "--bo-image-batches", "2",
        "--n_iters", "2", "--n_pre_samples", "2",
        "--no-compilation-cache",
    ])
    assert rc == 0
    server = serving.load_exported(out)
    assert server.manifest["arch"] == "mnist_cnn"
    # --bo-image-batches flowed through to the BO artifact in the same dir.
    bo_server = serving.load_exported_bo(out)
    assert bo_server.manifest["image_batches"] == ["2"]
    assert sorted(bo_server._batched_fns) == [2]
    r = np.random.RandomState(0)
    logits = server.logits_for_windows(
        r.rand(28, 28, 1).astype(np.float32),
        r.randint(0, 6, (28, 28)).astype(np.int32),
        np.arange(8, dtype=np.int32), 2,
    )
    assert logits.shape == (8, 10)


def test_export_bo_matches_fused_pipeline(tmp_path, rng):
    """The AOT fused-BO artifact must reproduce bo_window_saliency's fused
    path exactly (same seed/target/bucket)."""
    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.saliency import bo_pipeline

    engine = _engine()
    cfg = BOConfig(n_iters=3, n_pre_samples=2)
    image = rng.rand(28, 28, 1).astype(np.float32)
    segments = (np.arange(784).reshape(28, 28) % 10).astype(np.int32)
    s = 10
    upper = int(0.6 * s)

    path = str(tmp_path / "bo_artifact")
    manifest = serving.export_bo_engine(
        engine, path, bo_cfg=cfg, candidate_buckets=(upper + 1,)
    )
    assert manifest["bo"]["n_iters"] == 3
    server = serving.load_exported_bo(path)

    out_ref, trace_ref = bo_pipeline.bo_window_saliency(
        engine, image, segments, cfg, seed=4, target=7, fused=True
    )
    out_srv, trace_srv = server.explain(image, segments, seed=4, target=7)
    np.testing.assert_array_equal(trace_srv.xp, trace_ref.xp)
    np.testing.assert_allclose(trace_srv.yp, trace_ref.yp, atol=1e-5)
    np.testing.assert_array_equal(trace_srv.survived, trace_ref.survived)
    np.testing.assert_allclose(out_srv.heatmap, out_ref.heatmap, atol=1e-5)

    # target inference via the bundled predict artifact must agree with the
    # live engine, and the resulting run must match an explicit-target run.
    pred, _ = engine.predict_one(image)
    out2, trace2 = server.explain(image, segments, seed=4)
    out2_ref, trace2_ref = server.explain(image, segments, seed=4,
                                          target=int(pred))
    np.testing.assert_array_equal(trace2.xp, trace2_ref.xp)
    np.testing.assert_allclose(trace2.yp, trace2_ref.yp, atol=1e-6)
    np.testing.assert_allclose(out2.heatmap, out2_ref.heatmap, atol=1e-6)

    # bucket too small → clear error
    import pytest
    big_seg = (np.arange(784).reshape(28, 28) % 200).astype(np.int32)
    with pytest.raises(ValueError, match="candidate bucket"):
        server.explain(image, big_seg, seed=0, target=1)


def test_export_bo_batched_explain_matches_multi(tmp_path, rng):
    """The image-batched BO artifact must reproduce
    bo_window_saliency_multi (same per-image seeds), including padding
    of a partial batch, and infer targets via the batched predict head."""
    import pytest

    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.saliency import bo_pipeline

    engine = _engine()
    cfg = BOConfig(n_iters=3, n_pre_samples=2)
    images = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(3)]
    segments = [
        ((np.arange(784).reshape(28, 28) + i) % 10).astype(np.int32)
        for i in range(3)
    ]
    seeds = [11, 22, 33]

    path = str(tmp_path / "bo_batched")
    manifest = serving.export_bo_engine(
        engine, path, bo_cfg=cfg, candidate_buckets=(7,), image_batches=(4,)
    )
    assert manifest["image_batches"] == ["4"]
    assert manifest["batched_files"]["4"].keys() == {"8"}
    server = serving.load_exported_bo(path)

    ref = bo_pipeline.bo_window_saliency_multi(
        engine, images, segments, cfg, per_image_seeds=seeds
    )
    # n=3 < exported N=4 exercises the padding path; targets inferred via
    # the batched predict head (vs the live engine in the reference path).
    srv = server.explain_batch(images, segments, per_image_seeds=seeds)
    assert len(srv) == len(ref) == 3
    for (out_s, tr_s), (out_r, tr_r) in zip(srv, ref):
        np.testing.assert_array_equal(tr_s.xp, tr_r.xp)
        np.testing.assert_allclose(tr_s.yp, tr_r.yp, atol=1e-5)
        np.testing.assert_array_equal(tr_s.survived, tr_r.survived)
        np.testing.assert_allclose(out_s.heatmap, out_r.heatmap, atol=1e-5)

    # batch larger than any exported N → clear error
    with pytest.raises(ValueError, match="image batch"):
        server.explain_batch(images * 2, segments * 2, per_image_seeds=[0] * 6)

    # an artifact without batched programs refuses explain_batch
    path1 = str(tmp_path / "bo_plain")
    serving.export_bo_engine(engine, path1, bo_cfg=cfg, candidate_buckets=(7,))
    with pytest.raises(ValueError, match="image-batched"):
        serving.load_exported_bo(path1).explain_batch(
            images, segments, per_image_seeds=seeds
        )


def test_export_knockout_matches_engine(tmp_path, rng):
    """Exported knockout forwards must reproduce the live engine's
    eval_knockout_masks across bucket-spanning K and padded m < M."""
    import pytest

    engine = _engine()
    path = str(tmp_path / "ko_artifact")
    manifest = serving.export_engine(
        engine, path, batch_sizes=(16, 4), knockout_m=5
    )
    assert manifest["knockout_m"] == 5
    assert set(manifest["knockout_files"]) == {"16", "4"}
    server = serving.load_exported(path)

    image = rng.rand(28, 28, 1).astype(np.float32)
    segments = rng.randint(0, 10, (28, 28)).astype(np.int32)
    target = 5

    # K=21 spans the 16+4 buckets plus a padded tail; m=M=5 exact.
    knock5 = rng.randint(0, 10, (21, 5)).astype(np.int32)
    ref = engine.eval_knockout_masks(image, segments, knock5, target)
    srv = server.eval_knockout_masks(image, segments, knock5, target)
    assert type(srv) is type(ref)
    np.testing.assert_array_equal(srv.preds, ref.preds)
    np.testing.assert_array_equal(srv.survived, ref.survived)
    np.testing.assert_allclose(srv.prob_target, ref.prob_target, atol=1e-5)

    # m=1 (MNIST semantics) pads columns with the -1 sentinel.
    knock1 = rng.randint(0, 10, (7, 1)).astype(np.int32)
    ref1 = engine.eval_knockout_masks(image, segments, knock1, target)
    srv1 = server.eval_knockout_masks(image, segments, knock1, target)
    np.testing.assert_array_equal(srv1.survived, ref1.survived)
    np.testing.assert_allclose(srv1.prob_target, ref1.prob_target, atol=1e-5)

    # K=0 typed-empty contract; m > M and missing-export errors.
    empty = server.logits_for_knockouts(
        image, segments, np.zeros((0, 5), np.int32)
    )
    assert empty.shape == (0, 10)
    with pytest.raises(ValueError, match="knockout_m"):
        server.logits_for_knockouts(
            image, segments, rng.randint(0, 10, (3, 6)).astype(np.int32)
        )
    plain = str(tmp_path / "plain")
    serving.export_engine(engine, plain, batch_sizes=(4,))
    with pytest.raises(ValueError, match="knockout"):
        serving.load_exported(plain).eval_knockout_masks(
            image, segments, knock1, target
        )


def test_export_attribution_matches_live(tmp_path, rng):
    """attr_{method}.stablehlo programs must reproduce the live
    saliency.gradient functions (the backward pass is baked into the AOT
    artifact), including the smoothgrad seed as a runtime operand and the
    gradcam layer resolved at export time into the manifest."""
    import pytest

    from network_interpretation_imagenet_tpu.saliency import (
        gradient as grad_mod,
    )

    engine = _engine()
    path = str(tmp_path / "attr_artifact")
    methods = ("gradient", "grad_input", "integrated", "smoothgrad",
               "gradcam")
    manifest = serving.export_engine(
        engine, path, batch_sizes=(4,), attribution=methods,
        attribution_cfg={"ig_steps": 4, "sg_samples": 3, "sg_sigma": 0.1},
    )
    cfg = manifest["attribution"]["config"]
    assert set(manifest["attribution"]["files"]) == set(methods)
    assert cfg["ig_steps"] == 4 and cfg["sg_samples"] == 3
    assert cfg["gradcam_layer"]  # resolved at export time

    server = serving.load_exported(path)
    assert server.attribution_methods == tuple(sorted(methods))
    image = rng.rand(28, 28, 1).astype(np.float32)
    target = 3
    bundle, variables = engine.bundle, engine.variables

    live = {
        "gradient": grad_mod.input_gradient(
            bundle.logits, variables, image, target),
        "grad_input": grad_mod.grad_times_input(
            bundle.logits, variables, image, target),
        "integrated": grad_mod.integrated_gradients(
            bundle.logits, variables, image, target, steps=4),
        "smoothgrad": grad_mod.smoothgrad(
            bundle.logits, variables, image, target, samples=3,
            noise_sigma=0.1, seed=7),
        "gradcam": grad_mod.gradcam(
            bundle, variables, image, target, layer=cfg["gradcam_layer"]),
    }
    for m in methods:
        heat = server.attribute(image, target, m, seed=7)
        assert heat.shape == (28, 28) and heat.dtype == np.float32
        np.testing.assert_allclose(heat, np.asarray(live[m]), atol=1e-4,
                                   err_msg=m)

    # Unknown / unexported methods fail loudly, at export and at call.
    with pytest.raises(ValueError, match="unsupported"):
        serving.export_engine(engine, str(tmp_path / "bad"),
                              batch_sizes=(4,), attribution=("nope",))
    # Typo'd hyperparameters must not be recorded as if honored.
    with pytest.raises(ValueError, match="attribution_cfg"):
        serving.export_engine(engine, str(tmp_path / "bad2"),
                              batch_sizes=(4,), attribution=("gradient",),
                              attribution_cfg={"ig_step": 64})
    # Out-of-range target would be silently clamped by the exported
    # program's gather — reject it host-side.
    with pytest.raises(ValueError, match="out of range"):
        server.attribute(image, 5000, "gradient")
    plain = str(tmp_path / "plain")
    serving.export_engine(engine, plain, batch_sizes=(4,))
    plain_server = serving.load_exported(plain)
    assert plain_server.attribution_methods == ()
    with pytest.raises(ValueError, match="attribution"):
        plain_server.attribute(image, target, "gradient")
    with pytest.raises(ValueError, match="re-export"):
        server.attribute(image, target, "rise")


def test_export_attribution_cli_and_warmup(tmp_path):
    """--attribution flows hyperparameters through to the manifest; warmup
    touches the attr programs."""
    from network_interpretation_imagenet_tpu.cli import export_serving

    out = str(tmp_path / "artifact")
    rc = export_serving.main([
        "--arch", "mnist_cnn", "--dataset", "mnist", "--synthetic",
        "--dtype", "float32", "--out", out, "--batch-sizes", "4",
        "--attribution", "gradient,integrated", "--ig-steps", "2",
        "--no-compilation-cache",
    ])
    assert rc == 0
    server = serving.load_exported(out)
    assert server.attribution_methods == ("gradient", "integrated")
    assert server.attribution_config["ig_steps"] == 2
    # 1 window bucket + 2 attribution programs.
    assert server.warmup() == 3


def test_export_attribution_batched_matches_per_image(tmp_path, rng):
    """attribution_batches exports N-image vmapped programs; attribute_many
    picks the batched program (one device call) and matches per-image
    attribute() calls, including padding trim and the sequential fallback."""
    import pytest

    engine = _engine()
    path = str(tmp_path / "attr_b_artifact")
    manifest = serving.export_engine(
        engine, path, batch_sizes=(4,),
        attribution=("gradient", "smoothgrad"),
        attribution_cfg={"sg_samples": 3, "sg_sigma": 0.1},
        attribution_batches=(4,),
    )
    bf = manifest["attribution"]["batched_files"]
    assert set(bf) == {"gradient", "smoothgrad"}
    assert set(bf["gradient"]) == {"4"}

    server = serving.load_exported(path)
    images = rng.rand(3, 28, 28, 1).astype(np.float32)
    targets = [1, 2, 3]
    seeds = [5, 6, 7]
    for m in ("gradient", "smoothgrad"):
        singles = np.stack([
            server.attribute(images[i], targets[i], m, seed=seeds[i])
            for i in range(3)
        ])
        heats, calls = server.attribute_many(images, targets, m, seeds=seeds)
        assert calls == 1  # N=3 fits the exported b4 program
        np.testing.assert_allclose(heats, singles, atol=1e-5, err_msg=m)

    # N=1 goes sequential (no pad waste); oversized N falls back too.
    h1, c1 = server.attribute_many(images[:1], targets[:1], "gradient")
    assert c1 == 1 and h1.shape == (1, 28, 28)
    big = np.repeat(images, 2, axis=0)
    h6, c6 = server.attribute_many(big, targets * 2, "gradient",
                                   seeds=seeds * 2)
    assert c6 == 6 and h6.shape == (6, 28, 28)
    # Typed-empty and validation.
    h0, c0 = server.attribute_many(
        np.zeros((0, 28, 28, 1), np.float32), [], "gradient")
    assert h0.shape == (0, 28, 28) and c0 == 0
    with pytest.raises(ValueError, match="length"):
        server.attribute_many(images, targets[:2], "gradient")
    with pytest.raises(ValueError, match="out of range"):
        server.attribute_many(images, [1, 2, 5000], "gradient")
    # warmup touches 1 window + 2 attr + 2 batched-attr programs.
    assert server.warmup() == 5
    # Batches without methods are a loud export error.
    with pytest.raises(ValueError, match="attribution_batches"):
        serving.export_engine(engine, str(tmp_path / "bad"),
                              batch_sizes=(4,), attribution_batches=(4,))
    with pytest.raises(ValueError, match=">= 2"):
        serving.export_engine(engine, str(tmp_path / "bad1"),
                              batch_sizes=(4,), attribution=("gradient",),
                              attribution_batches=(1,))


def test_export_attribution_full_family(tmp_path, rng):
    """The mask-batched methods (scorecam/occlusion/rise) and the
    learned-mask Adam loop also export as AOT programs — interceptors,
    scans, and the optimizer all live inside the artifact — and reproduce
    the live implementations exactly."""
    from network_interpretation_imagenet_tpu.saliency import (
        gradient as grad_mod,
    )
    from network_interpretation_imagenet_tpu.saliency import learned_mask

    engine = _engine()
    path = str(tmp_path / "family_artifact")
    cfg = {"mask_batch": 8, "occ_patch": 14, "occ_stride": 7,
           "rise_masks": 8, "rise_grid": 4, "scorecam_channels": 4,
           "lm_mask_size": 7, "lm_iters": 4, "lm_jitter": 2}
    manifest = serving.export_engine(
        engine, path, batch_sizes=(4,),
        attribution=("scorecam", "occlusion", "rise", "meaningful"),
        attribution_cfg=cfg,
        attribution_batches=(4,),  # no gradient-family methods → no batched
    )
    assert manifest["attribution"]["batched_files"] == {}
    # scorecam resolved its CAM layer at export time.
    assert manifest["attribution"]["config"]["gradcam_layer"]

    server = serving.load_exported(path)
    bundle, variables = engine.bundle, engine.variables
    img = rng.rand(28, 28, 1).astype(np.float32)
    live = {
        "scorecam": grad_mod.scorecam(
            bundle, variables, img, 3, channels=4, batch=8,
            compute_dtype=jnp.float32),
        "occlusion": grad_mod.occlusion_map(
            bundle.logits, variables, img, 3, patch=14, stride=7, batch=8,
            compute_dtype=jnp.float32),
        "rise": grad_mod.rise_map(
            bundle.logits, variables, img, 3, num_masks=8, grid=4, batch=8,
            seed=7, compute_dtype=jnp.float32),
        "meaningful": learned_mask.learned_mask_saliency(
            bundle.logits, variables, img, 3, mask_size=7, iters=4,
            jitter=2, seed=7).heatmap,
    }
    for name, ref in live.items():
        heat = server.attribute(img, 3, name, seed=7)
        np.testing.assert_allclose(heat, np.asarray(ref), atol=2e-5,
                                   err_msg=name)


def test_export_xrai_matches_live(tmp_path, rng):
    """attr_xrai_ig.stablehlo + the manifest's ranking parameters must
    reproduce the live xrai_saliency end-to-end: same signed IG program,
    same felzenszwalb ladder, same greedy density ranking (the host half
    is literally the same code, saliency.xrai.greedy_region_ranking)."""
    import pytest

    from network_interpretation_imagenet_tpu.saliency import xrai as xrai_mod

    engine = _engine()
    path = str(tmp_path / "xrai_artifact")
    scales = (10.0, 30.0)
    manifest = serving.export_engine(
        engine, path, batch_sizes=(4,), attribution=("xrai", "gradient"),
        attribution_cfg={"ig_steps": 4, "xrai_scales": list(scales)},
    )
    entry = manifest["attribution"]["xrai"]
    assert entry["file"] == "attr_xrai_ig.stablehlo"
    assert entry["steps"] == 4 and entry["scales"] == [10.0, 30.0]
    assert entry["min_area"] == 4
    # xrai does NOT occupy a gradient-family program slot — it has its own
    # two-half path (device signed-IG + host ranking).
    assert "xrai" not in manifest["attribution"]["files"]
    assert "gradient" in manifest["attribution"]["files"]

    server = serving.load_exported(path)
    assert server.attribution_methods == ("gradient",)
    assert server.xrai_config["steps"] == 4

    # Structured image so every felzenszwalb scale yields real segments.
    image = np.zeros((28, 28, 1), np.float32)
    image[4:14, 4:14] = 0.9
    image[16:26, 10:22] = 0.5
    image += 0.02 * rng.randn(28, 28, 1).astype(np.float32)
    image = np.clip(image, 0.0, 1.0)
    display = (image * 255).astype(np.uint8)
    target = 3

    live = xrai_mod.xrai_saliency(
        engine.bundle.logits, engine.variables, image, target, display,
        steps=4, scales=scales)
    srv = server.xrai(image, target, display=display)
    np.testing.assert_allclose(srv.attribution, live.attribution, atol=1e-4)
    assert srv.num_regions == live.num_regions
    np.testing.assert_array_equal(srv.heatmap, live.heatmap)

    # display=None derives a min-max display; result stays well-formed.
    auto = server.xrai(image, target)
    assert auto.heatmap.shape == (28, 28) and auto.num_regions >= 1

    # warmup touches the xrai program too: 1 window bucket + 1 gradient
    # program + 1 xrai program.
    assert server.warmup() == 3

    with pytest.raises(ValueError, match="out of range"):
        server.xrai(image, 5000)
    plain = str(tmp_path / "plain")
    serving.export_engine(engine, plain, batch_sizes=(4,))
    with pytest.raises(ValueError, match="xrai"):
        serving.load_exported(plain).xrai(image, target)
