"""Multi-device tests on the virtual 8-CPU mesh: sharded masked-forward
matches the single-device engine; dp×tp train step runs and learns."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.ops import masking
from network_interpretation_imagenet_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    sharded_window_eval,
)


def test_mesh_shapes():
    mesh = make_mesh(model_parallel=2)
    assert mesh.shape["data"] == 4
    assert mesh.shape["model"] == 2
    mesh1 = make_mesh()
    assert mesh1.shape["data"] == 8


def test_mesh_indivisible_falls_back_to_dp():
    # 1 device with model_parallel=2 (the driver's single-TPU degenerate
    # case, MULTICHIP_r01) must not crash — falls back to pure DP.
    mesh = make_mesh(jax.devices()[:1], model_parallel=2)
    assert mesh.shape == {"data": 1, "model": 1}
    mesh3 = make_mesh(jax.devices()[:3], model_parallel=2)
    assert mesh3.shape == {"data": 3, "model": 1}


def test_graft_entry_dryrun_multichip():
    # The driver-visible artifact: must run end-to-end on the 8-CPU mesh.
    import sys
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)
    finally:
        sys.path.remove("/root/repo")


def test_sharded_window_eval_matches_local():
    mesh = make_mesh()  # 8-way data parallel
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    image = rng.rand(28, 28, 1).astype(np.float32)
    segments = (np.arange(784).reshape(28, 28) % 10).astype(np.int32)
    firsts = np.arange(10, dtype=np.int32)  # not a multiple of 8 → padding
    width, target = 4, 3

    survived, probs, count = sharded_window_eval(
        mesh, bundle.logits, variables, image, segments, firsts, width, target,
        compute_dtype=jnp.float32,
    )
    assert survived.shape == (10,)
    assert count == int(survived.sum())

    # Single-device oracle.
    masks = np.asarray(masking.window_masks(jnp.asarray(segments), firsts, width))
    for i in range(10):
        logits = np.asarray(
            bundle.logits(variables, jnp.asarray((image * masks[i][:, :, None])[None]))
        )[0]
        assert survived[i] == (logits.argmax() == target)
        e = np.exp(logits - logits.max())
        np.testing.assert_allclose(probs[i], (e / e.sum())[target], atol=1e-5)


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_train_step_runs_and_learns(model_parallel):
    mesh = make_mesh(model_parallel=model_parallel)
    bundle = create_model("resnet", "cifar10", depth=8)
    opt = optax.sgd(0.1, momentum=0.9)
    init_fn, step_fn = make_sharded_train_step(bundle, mesh, opt)
    state = init_fn(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(16, 32, 32, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 10, 16))

    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, images, labels)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 3
    assert np.isfinite(losses).all()
    # Overfitting a fixed batch: loss should drop.
    assert losses[-1] < losses[0]


def test_param_shardings_split_head():
    from network_interpretation_imagenet_tpu.parallel.train_step import param_shardings

    mesh = make_mesh(model_parallel=2)
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    shardings = param_shardings(variables["params"], mesh)
    # conv5 has 128 output channels → sharded over model axis.
    conv5 = shardings["conv5"]["Conv_0"]["kernel"]
    assert conv5.spec == jax.sharding.PartitionSpec(None, None, None, "model")
    # Biases replicate.
    bias = shardings["conv6"]["bias"]
    assert bias.spec == jax.sharding.PartitionSpec()


def test_multihost_helpers_single_process():
    from network_interpretation_imagenet_tpu.parallel import multihost
    from network_interpretation_imagenet_tpu.saliency.sweep import SweepResult

    # Single-process: initialize is a no-op returning False.
    assert multihost.initialize_distributed() is False
    idx = list(multihost.process_strided_indices(5))
    assert idx == [0, 1, 2, 3, 4]  # 1 process → all images

    a = SweepResult(images_total=2, images_explained=2, mean_iou=0.5,
                    mean_survival=0.8, p50_latency_s=0.1, evals_per_sec=100,
                    per_image=[{"iou": 0.5}, {"iou": 0.5}])
    b = SweepResult(images_total=2, images_explained=2, mean_iou=0.7,
                    mean_survival=0.6, p50_latency_s=0.3, evals_per_sec=50,
                    per_image=[{"iou": 0.7}, {"iou": 0.7}])
    merged = multihost.merge_sweep_metrics([a, b])
    assert merged.images_total == 4
    np.testing.assert_allclose(merged.mean_iou, 0.6)
    np.testing.assert_allclose(merged.mean_survival, 0.7)
    assert merged.evals_per_sec == 150


def test_sharded_multi_image_eval_matches_engine():
    """N×K sharded multi-image eval == single-device engine results."""
    from network_interpretation_imagenet_tpu.parallel import (
        sharded_window_eval_multi,
    )
    from network_interpretation_imagenet_tpu.saliency import SaliencyEngine

    mesh = make_mesh()  # 8-way DP
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(2))
    engine = SaliencyEngine(bundle, variables, mask_batch=16,
                            compute_dtype=jnp.float32)
    rng = np.random.RandomState(4)
    n, k = 3, 7  # n*k=21: not a multiple of 8 → padding path
    images = rng.rand(n, 28, 28, 1).astype(np.float32)
    segments = np.stack(
        [(np.arange(784).reshape(28, 28) % (5 + i)).astype(np.int32)
         for i in range(n)]
    )
    firsts = rng.randint(0, 4, (n, k)).astype(np.int32)
    widths = np.asarray([2, 3, 2], np.int32)
    targets = np.asarray([1, 4, 7], np.int32)

    def logits_fn(v, x):
        return bundle.logits(v, x)

    survived, p_t = sharded_window_eval_multi(
        mesh, logits_fn, variables, images, segments, firsts, widths,
        targets, compute_dtype=jnp.float32,
    )
    ref = engine.eval_window_masks_multi(images, segments, firsts, widths, targets)
    for i in range(n):
        np.testing.assert_array_equal(survived[i], ref[i].survived)
        np.testing.assert_allclose(p_t[i], ref[i].prob_target, atol=1e-5)


def test_fused_bo_sharded_matches_single_device():
    """Fused BO with the q-proposal forward sharded over the mesh must
    reproduce the single-device trace (same PRNG, same GP, same EI)."""
    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.saliency import SaliencyEngine
    from network_interpretation_imagenet_tpu.saliency.bo_pipeline import (
        bo_window_saliency,
    )

    mesh = make_mesh()  # 8-way DP
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(3))
    engine = SaliencyEngine(bundle, variables, mask_batch=16,
                            compute_dtype=jnp.float32)
    rng = np.random.RandomState(5)
    img = rng.rand(28, 28, 1).astype(np.float32)
    seg = (np.arange(784).reshape(28, 28) % 12).astype(np.int32)
    cfg = BOConfig(n_iters=3, n_pre_samples=2)

    out_single, tr_single = bo_window_saliency(
        engine, img, seg, cfg, seed=0, target=2, proposals_per_iter=4
    )
    out_mesh, tr_mesh = bo_window_saliency(
        engine, img, seg, cfg, seed=0, target=2, proposals_per_iter=4,
        mesh=mesh,
    )
    np.testing.assert_array_equal(tr_single.xp, tr_mesh.xp)
    np.testing.assert_allclose(tr_single.yp, tr_mesh.yp, atol=1e-5)
    np.testing.assert_array_equal(tr_single.survived, tr_mesh.survived)
    np.testing.assert_allclose(out_single.heatmap, out_mesh.heatmap, atol=1e-5)


def test_merge_sweep_metrics_pools_latencies():
    """p50 pools ALL per-image latencies, not a median-of-medians."""
    from network_interpretation_imagenet_tpu.parallel import multihost
    from network_interpretation_imagenet_tpu.saliency.sweep import SweepResult

    a = SweepResult(images_total=3, images_explained=3, mean_survival=1.0,
                    p50_latency_s=0.2,
                    per_image=[{"seconds": s, "survival": 1.0}
                               for s in (0.1, 0.2, 0.3)])
    b = SweepResult(images_total=2, images_explained=2, mean_survival=1.0,
                    p50_latency_s=0.9,
                    per_image=[{"seconds": s, "survival": 1.0}
                               for s in (0.9, 1.1)])
    merged = multihost.merge_sweep_metrics([a, b])
    # Pooled sorted latencies: 0.1 0.2 0.3 0.9 1.1 → p50 = 0.3
    # (median-of-medians would give 0.9).
    np.testing.assert_allclose(merged.p50_latency_s, 0.3)


def test_sharded_eval_no_retrace_across_targets():
    """Per-image target/width are traced operands and the shard_map wrapper
    is cached, so a sweep over images must trace the model ONCE (regression:
    target/width were baked into a fresh closure per call → per-image
    recompiles)."""
    from network_interpretation_imagenet_tpu.parallel import (
        make_mesh,
        sharded_window_eval,
        sharded_window_eval_multi,
    )

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    traces = []

    def counting_logits(variables, imgs):
        traces.append(1)  # appends only while TRACING, not per execution
        return bundle.logits(variables, imgs)

    mesh = make_mesh()
    rng = np.random.RandomState(0)
    image = rng.rand(28, 28, 1).astype(np.float32)
    segments = rng.randint(0, 12, (28, 28)).astype(np.int32)
    firsts = np.arange(8, dtype=np.int32)
    for target in (1, 5, 9):
        for width in (3, 4):
            sharded_window_eval(
                mesh, counting_logits, variables, image, segments, firsts,
                width=width, target=target, compute_dtype=jnp.float32,
            )
    assert len(traces) == 1, f"expected 1 trace, got {len(traces)}"

    traces.clear()
    imgs = np.stack([image, image])
    segs = np.stack([segments, segments])
    f2 = rng.randint(0, 4, (2, 3)).astype(np.int32)
    for tgts in ([1, 2], [3, 4]):
        sharded_window_eval_multi(
            mesh, counting_logits, variables, imgs, segs, f2,
            np.asarray([3, 4], np.int32), np.asarray(tgts, np.int32),
            compute_dtype=jnp.float32,
        )
    assert len(traces) == 1, f"expected 1 trace, got {len(traces)}"


def test_two_process_dcn_sweep_matches_single_process(tmp_path):
    """ACTUALLY run the multi-process (DCN) path: spawn two CPU-backend
    workers with jax.distributed.initialize against a localhost coordinator,
    each sweeping its process_strided_indices stride of a 6-image synthetic
    set; prove a real cross-process collective ran (process_allgather);
    merge via merge_sweep_metrics and assert metric equality with an
    in-process single-process sweep. Closes SURVEY §5's last unproven
    subsystem (the reference's distributed flags were dead code,
    /root/reference/bayesian_active_learning_imagenet.py:78-83)."""
    import json
    import os
    import socket
    import subprocess
    import sys

    from network_interpretation_imagenet_tpu.config import SegmentConfig
    from network_interpretation_imagenet_tpu.parallel import multihost
    from network_interpretation_imagenet_tpu.saliency.engine import SaliencyEngine
    from network_interpretation_imagenet_tpu.saliency.sweep import saliency_sweep

    # A free localhost port for the coordinator.
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo_root = os.path.dirname(os.path.dirname(worker))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # The workers self-configure (cpu platform, 2 local devices); scrub any
    # test-harness device forcing so they start clean.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    outs = [str(tmp_path / f"rank{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--coordinator", coordinator,
             "--num-processes", "2", "--process-id", str(i), "--out", outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"rank {i} failed:\n{logs[i]}"

    ranks = []
    for path in outs:
        with open(path) as f:
            ranks.append(json.load(f))
    # Both processes saw the 2-process world and the collective completed.
    for r in ranks:
        assert r["process_count"] == 2
        assert r["global_devices"] == 4
        assert sorted(r["allgather"]) == [0, 1]
    assert ranks[0]["indices"] == [0, 2, 4]
    assert ranks[1]["indices"] == [1, 3, 5]

    merged = multihost.merge_sweep_metrics(
        [multihost.sweep_result_from_dict(r) for r in ranks]
    )

    # Single-process reference sweep over the same deterministic dataset.
    import multihost_worker

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=8,
                            compute_dtype=jnp.float32)
    dataset = multihost_worker.build_dataset(list(range(6)), engine)
    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    single = saliency_sweep(engine, dataset, cfg, num_mask_samples=8, seed=5)

    assert merged.images_total == single.images_total == 6
    assert merged.images_explained == single.images_explained
    assert (merged.images_skipped_misclassified
            == single.images_skipped_misclassified == 1)
    assert merged.images_failed == single.images_failed == 0
    np.testing.assert_allclose(merged.mean_survival, single.mean_survival,
                               atol=1e-6)
    np.testing.assert_allclose(merged.mean_iou, single.mean_iou, atol=1e-6)
    rows_m = {r["index"]: r for r in merged.per_image}
    rows_s = {r["index"]: r for r in single.per_image}
    assert set(rows_m) == set(rows_s)
    for idx in rows_s:
        np.testing.assert_allclose(rows_m[idx]["survival"],
                                   rows_s[idx]["survival"], atol=1e-6)
        assert rows_m[idx]["num_segments"] == rows_s[idx]["num_segments"]


def test_rank_result_protocol_roundtrip_and_stale_cleanup(tmp_path):
    """write_rank_result/merge_rank_results reproduce merge_sweep_metrics
    through the shared-filesystem protocol, and clear_stale_rank_result
    removes a leftover rank file so a re-run can't silently merge a
    previous run's metrics (the merge then times out NAMING the missing
    rank instead)."""
    from network_interpretation_imagenet_tpu.parallel import multihost
    from network_interpretation_imagenet_tpu.saliency.sweep import SweepResult

    out = str(tmp_path)
    a = SweepResult(images_total=2, images_explained=2, mean_survival=0.5,
                    per_image=[{"seconds": 0.1, "survival": 1.0},
                               {"seconds": 0.3, "survival": 0.0}])
    b = SweepResult(images_total=1, images_explained=1, mean_survival=1.0,
                    per_image=[{"seconds": 0.2, "survival": 1.0}])
    multihost.write_rank_result(out, a, rank=0)
    multihost.write_rank_result(out, b, rank=1)
    merged = multihost.merge_rank_results(out, 2, timeout_s=5)
    expect = multihost.merge_sweep_metrics([a, b])
    assert merged.images_total == expect.images_total == 3
    assert merged.images_explained == 3
    np.testing.assert_allclose(merged.p50_latency_s, expect.p50_latency_s)
    np.testing.assert_allclose(merged.mean_survival, expect.mean_survival)

    multihost.clear_stale_rank_result(out, rank=1)
    with pytest.raises(TimeoutError, match="rank1"):
        multihost.merge_rank_results(out, 2, timeout_s=0.1)
