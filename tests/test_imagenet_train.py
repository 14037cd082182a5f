"""ImageNet training surface (`cli.main` + `data.imagenet_train`):
RandomResizedCrop semantics, worker-invariant determinism, top-5 metrics,
and the end-to-end trainer CLI on a tiny on-disk ImageFolder."""

import json
import os

import numpy as np
import pytest

from network_interpretation_imagenet_tpu.data.imagenet_train import (
    TrainImageFolder,
    epoch_batches,
    pil_train_transform,
    random_resized_crop_box,
)

def _rng(seed=0):
    return np.random.Generator(np.random.PCG64(seed))


def test_random_resized_crop_box_bounds_and_area():
    rng = _rng(0)
    for _ in range(200):
        w, h = int(rng.integers(30, 500)), int(rng.integers(30, 500))
        top, left, ch, cw = random_resized_crop_box(rng, w, h)
        assert 0 <= top and top + ch <= h
        assert 0 <= left and left + cw <= w
        assert ch > 0 and cw > 0
        frac = (ch * cw) / (w * h)
        # 10-attempt path keeps area in [0.08, 1.0] (up to int rounding);
        # the fallback is a center crop that can only be the full ratio-
        # clamped frame, also within these bounds.
        assert 0.05 <= frac <= 1.0 + 1e-6


def test_random_resized_crop_fallback_clamps_ratio():
    # A 10x400 strip fails every aspect attempt -> fallback clamps to 4/3.
    rng = _rng(1)
    top, left, ch, cw = random_resized_crop_box(rng, 400, 10)
    assert ch == 10 and cw == round(10 * 4.0 / 3.0)
    assert top == 0 and left == (400 - cw) // 2


def test_train_transform_shape_and_determinism():
    from PIL import Image

    img = Image.fromarray(
        (np.random.RandomState(0).rand(80, 120, 3) * 255).astype(np.uint8)
    )
    a = pil_train_transform(img, _rng(7), crop=32)
    b = pil_train_transform(img, _rng(7), crop=32)
    c = pil_train_transform(img, _rng(8), crop=32)
    assert a.shape == (32, 32, 3) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def _write_image_folder(root, classes=2, per_class=4, size=48):
    from PIL import Image

    rs = np.random.RandomState(0)
    for c in range(classes):
        d = os.path.join(root, f"class_{c}")
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            arr = rs.randint(0, 255, (size, size, 3), np.uint8)
            # Make classes trivially separable: class c gets stripe c maxed.
            arr[:, c * 8 : c * 8 + 8] = 255 if c else 0
            Image.fromarray(arr).save(os.path.join(d, f"img_{i}.png"))


def test_epoch_batches_worker_invariant_and_epoch_varying(tmp_path):
    _write_image_folder(str(tmp_path))
    ds = TrainImageFolder(str(tmp_path), crop=32, seed=3)

    def collect(workers, epoch):
        return list(
            epoch_batches(ds, 4, epoch=epoch, seed=3, workers=workers)
        )

    serial = collect(0, 0)
    threaded = collect(3, 0)
    assert len(serial) == 2
    for (xs, ys), (xt, yt) in zip(serial, threaded):
        np.testing.assert_array_equal(xs, xt)
        np.testing.assert_array_equal(ys, yt)
    # A different epoch reshuffles and re-augments.
    other = collect(0, 1)
    assert any(
        not np.array_equal(a[0], b[0]) for a, b in zip(serial, other)
    )


def test_epoch_batches_drop_last_and_indices(tmp_path):
    _write_image_folder(str(tmp_path))
    ds = TrainImageFolder(str(tmp_path), crop=32)
    full = list(epoch_batches(ds, 3, shuffle=False, workers=0))
    assert [len(y) for _, y in full] == [3, 3, 2]
    dropped = list(
        epoch_batches(ds, 3, shuffle=False, workers=0, drop_last=True)
    )
    assert [len(y) for _, y in dropped] == [3, 3]
    strided = list(
        epoch_batches(ds, 2, shuffle=False, workers=0, indices=[0, 2, 4, 6])
    )
    assert sum(len(y) for _, y in strided) == 4


def test_train_step_top5_metric_matches_numpy():
    import jax

    from network_interpretation_imagenet_tpu.config import TrainConfig
    from network_interpretation_imagenet_tpu.data import (
        synthetic_classification_batch,
    )
    from network_interpretation_imagenet_tpu.data.loaders import ArrayLoader
    from network_interpretation_imagenet_tpu.models import create_model
    from network_interpretation_imagenet_tpu.train import Trainer

    x, y = synthetic_classification_batch(0, 32, 32, 3, 8)
    bundle = create_model("mnist_cnn", "mnist", num_classes=8)
    # mnist_cnn expects 1 channel; use grayscale of the synthetic batch.
    xg = x.mean(-1, keepdims=True)
    cfg = TrainConfig(optimizer="sgd", lr=0.05, epochs=1, batch_size=16)
    t = Trainer(bundle, cfg, steps_per_epoch=2)
    loader = ArrayLoader(xg, y, 16)
    loss, err1, err5 = t.evaluate(loader)
    assert 0.0 <= err5 <= err1 <= 100.0

    # Cross-check top5 against numpy on the same logits.
    variables = {"params": t.state.params}
    if t.state.batch_stats:
        variables["batch_stats"] = t.state.batch_stats
    logits = np.asarray(bundle.logits(variables, xg))
    top5_np = np.mean(
        [y[i] in np.argsort(-logits[i])[:5] for i in range(len(y))]
    )
    assert err5 == pytest.approx(100.0 * (1.0 - top5_np), abs=1e-6)


def test_cli_main_trains_and_writes_artifacts(tmp_path):
    from network_interpretation_imagenet_tpu.cli import main as main_cli

    data = tmp_path / "imagenet"
    _write_image_folder(str(data / "train"), classes=2, per_class=6)
    _write_image_folder(str(data / "val"), classes=2, per_class=2)
    save = tmp_path / "out"
    rc = main_cli.main([
        str(data), "-a", "resnet18", "--crop", "48", "-b", "4",
        "--epochs", "2", "--lr", "0.01", "-j", "2", "-p", "1",
        "--save", str(save), "--seed", "0",
    ])
    assert rc == 0
    res = json.load(open(save / "imagenet_train_result.json"))
    assert res["mode"] == "train" and res["epochs_run"] == 2
    assert {"val_err5", "val_err1"} <= set(res["history"][0])
    scores = open(os.path.join(res["save_dir"], "scores.tsv")).read()
    assert "val_err5" in scores.splitlines()[0]
    assert os.path.isdir(os.path.join(res["save_dir"], "model_best"))

    # -e evaluates using the resumed checkpoint.
    rc = main_cli.main([
        str(data), "-a", "resnet18", "--crop", "48", "-b", "4", "-e",
        "--resume", res["save_dir"], "--save", str(save), "-j", "0",
    ])
    assert rc == 0
    res2 = json.load(open(save / "imagenet_train_result.json"))
    assert res2["mode"] == "evaluate" and 0 <= res2["top5"] <= 100


def test_cli_main_synthetic_smoke(tmp_path):
    from network_interpretation_imagenet_tpu.cli import main as main_cli

    save = tmp_path / "out"
    rc = main_cli.main([
        "--synthetic", "-a", "resnet18", "--crop", "32", "-b", "8",
        "--epochs", "1", "--limit-images", "32", "--lr", "0.01",
        "--save", str(save), "-p", "0",
    ])
    assert rc == 0
    res = json.load(open(save / "imagenet_train_result.json"))
    assert res["epochs_run"] == 1


def test_cli_main_rejects_trainset_smaller_than_batch(tmp_path, capsys):
    """drop_last + tiny --limit-images would train ZERO steps per epoch while
    reporting loss 0.0; the CLI must refuse loudly instead."""
    from network_interpretation_imagenet_tpu.cli import main as main_cli

    data = tmp_path / "imagenet"
    _write_image_folder(str(data / "train"), classes=2, per_class=6)
    _write_image_folder(str(data / "val"), classes=2, per_class=2)
    rc = main_cli.main([
        str(data), "-a", "resnet18", "--crop", "48", "-b", "256",
        "--limit-images", "8", "--save", str(tmp_path / "out"),
    ])
    assert rc == 2
    assert "batch-size" in capsys.readouterr().err


def test_cli_main_pretrained_shape_mismatch_is_loud(tmp_path):
    """A --pretrained artifact whose head was trained for a different
    num_classes must fail with a clear head-shape error, not an opaque
    optimizer crash on the first step."""
    import pytest

    from network_interpretation_imagenet_tpu.cli import main as main_cli
    from network_interpretation_imagenet_tpu.models import create_model
    from network_interpretation_imagenet_tpu.utils import convert

    # Artifact with a 1000-way head...
    import jax

    bundle = create_model("resnet18", "imagenet", num_classes=1000)
    variables = jax.device_get(bundle.init(jax.random.PRNGKey(0)))
    art = str(tmp_path / "weights")
    convert.save_weights_artifact(variables, art, meta={"arch": "resnet18"})

    # ...loaded into a 2-class training run.
    data = tmp_path / "imagenet"
    _write_image_folder(str(data / "train"), classes=2, per_class=6)
    _write_image_folder(str(data / "val"), classes=2, per_class=2)
    with pytest.raises(ValueError, match="num_classes|shape"):
        main_cli.main([
            str(data), "-a", "resnet18", "--crop", "48", "-b", "4",
            "--epochs", "1", "--pretrained", art,
            "--save", str(tmp_path / "out"),
        ])


def test_epoch_batches_process_slices_concatenate_to_global(tmp_path):
    """Rank slices of every global batch, concatenated in rank order, must
    equal the single-process global batches exactly (same (seed, epoch)
    permutation; partial global batch dropped)."""
    _write_image_folder(str(tmp_path), classes=2, per_class=9)  # 18 items
    ds = TrainImageFolder(str(tmp_path), crop=32, seed=1)

    kw = dict(epoch=2, seed=1, shuffle=True, workers=0)
    global_batches = list(epoch_batches(ds, 8, drop_last=True, **kw))
    rank_batches = [
        list(epoch_batches(ds, 8, process_slice=(r, 2), **kw))
        for r in range(2)
    ]
    assert len(global_batches) == 2  # 18 // 8, partial dropped
    for b, (g_img, g_lab) in enumerate(global_batches):
        parts_img = np.concatenate([rank_batches[r][b][0] for r in range(2)])
        parts_lab = np.concatenate([rank_batches[r][b][1] for r in range(2)])
        np.testing.assert_array_equal(parts_img, g_img)
        np.testing.assert_array_equal(parts_lab, g_lab)
    for r in range(2):
        assert all(len(lab) == 4 for _, lab in rank_batches[r])

    with pytest.raises(ValueError, match="divide evenly"):
        list(epoch_batches(ds, 7, process_slice=(0, 2), **kw))


def test_two_process_dcn_training_matches_single_process(tmp_path):
    """ACTUALLY run multi-process data-parallel TRAINING: spawn two
    CPU-backend workers (2 local devices each → 4 global) through
    `cli.main --multihost`; each rank decodes only its slice of every
    global batch and contributes it via make_array_from_process_local_data;
    rank 0 alone writes checkpoints/scores/result. The merged run's loss
    trajectory must match a single-process run on the same data/seed."""
    import socket
    import subprocess
    import sys as _sys

    from network_interpretation_imagenet_tpu.cli import main as main_cli

    data = tmp_path / "imagenet"
    _write_image_folder(str(data / "train"), classes=2, per_class=6)
    # 10 val images with -b 8: the tail does NOT fill a global batch —
    # multihost validation must still cover every image (rank-strided local
    # eval + cross-process count sum), matching single-process exactly.
    _write_image_folder(str(data / "val"), classes=2, per_class=5)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_train_worker.py")
    repo_root = os.path.dirname(os.path.dirname(worker))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    save = str(tmp_path / "mh_out")
    outs = [str(tmp_path / f"rank{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [_sys.executable, worker, "--coordinator", coordinator,
             "--num-processes", "2", "--process-id", str(i),
             "--data", str(data), "--out", outs[i], "--save", save],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"rank {i} failed:\n{logs[i]}"

    ranks = [json.load(open(o)) for o in outs]
    for r in ranks:
        assert r["global_devices"] == 4
        assert r["mode"] == "train" and r["epochs_run"] == 2
    # Both ranks read the SAME rank-0-written result.
    assert ranks[0]["history"] == ranks[1]["history"]

    # Single-process run on the same data/config.
    save1 = str(tmp_path / "sp_out")
    rc = main_cli.main([
        str(data), "-a", "resnet18", "--crop", "32", "-b", "8",
        "--epochs", "2", "--lr", "0.01", "-j", "2",
        "--save", save1, "--seed", "0", "--no-compilation-cache",
    ])
    assert rc == 0
    single = json.load(open(os.path.join(save1, "imagenet_train_result.json")))

    for mh_row, sp_row in zip(ranks[0]["history"], single["history"]):
        assert mh_row["epoch"] == sp_row["epoch"]
        np.testing.assert_allclose(
            mh_row["train_loss"], sp_row["train_loss"], rtol=5e-3
        )
        np.testing.assert_allclose(
            mh_row["val_loss"], sp_row["val_loss"], rtol=5e-3
        )
        assert mh_row["val_err1"] == pytest.approx(sp_row["val_err1"], abs=1e-6)


def test_multihost_flag_without_coordinator_errors(tmp_path):
    """--multihost with no coordinator info must refuse (two hosts silently
    each running as rank 0 would race on the shared checkpoint dir), for
    both the trainer and the sweep CLI."""
    from network_interpretation_imagenet_tpu.cli import main as main_cli
    from network_interpretation_imagenet_tpu.cli import (
        saliency_sweep as sweep_cli,
    )

    rc = main_cli.main([
        "--synthetic", "--arch", "mnist_cnn", "--epochs", "1",
        "--batch-size", "8", "--limit-images", "16",
        "--save", str(tmp_path), "--multihost",
    ])
    assert rc == 2
    rc = sweep_cli.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "2", "--num_mask_samples", "4", "--mask-batch", "4",
        "--dtype", "float32", "--segmenter", "slic", "--n_segments", "4",
        "--out", str(tmp_path), "--multihost",
    ])
    assert rc == 2


def test_rank_slice_and_stride_semantics():
    """_RankSlice drops partial GLOBAL batches (DP drop_last) and slices
    full ones contiguously; _RankStride covers every item disjointly."""
    from network_interpretation_imagenet_tpu.cli.main import (
        _RankSlice,
        _RankStride,
    )

    batches = [
        (np.arange(8).reshape(8, 1), np.arange(8)),
        (np.arange(6).reshape(6, 1), np.arange(6)),  # partial (even split!)
        (np.arange(8).reshape(8, 1), np.arange(8) + 100),
    ]
    r0 = list(_RankSlice(batches, 0, 2, global_batch=8))
    r1 = list(_RankSlice(batches, 1, 2, global_batch=8))
    assert len(r0) == len(r1) == 2  # the 6-item partial dropped on BOTH
    for (i0, l0), (i1, l1), (gi, gl) in zip(r0, r1,
                                            [batches[0], batches[2]]):
        np.testing.assert_array_equal(np.concatenate([i0, i1]), gi)
        np.testing.assert_array_equal(np.concatenate([l0, l1]), gl)

    s0 = list(_RankStride(batches, 0, 2))
    s1 = list(_RankStride(batches, 1, 2))
    assert len(s0) == len(s1) == 3  # nothing dropped
    for (i0, l0), (i1, l1), (gi, gl) in zip(s0, s1, batches):
        got = sorted(np.concatenate([l0, l1]).tolist())
        assert got == sorted(gl.tolist())
