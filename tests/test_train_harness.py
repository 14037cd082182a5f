"""Training-harness tests: overfits a toy batch, writes scores.tsv, early
stops, checkpoints + resumes; utils meters/checkpoint round-trips."""

import os

import jax
import numpy as np
import pytest

from network_interpretation_imagenet_tpu.config import TrainConfig
from network_interpretation_imagenet_tpu.data import synthetic_classification_batch
from network_interpretation_imagenet_tpu.data.loaders import ArrayLoader
from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.train import Trainer
from network_interpretation_imagenet_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from network_interpretation_imagenet_tpu.utils.meters import AverageMeter, WeightsCheck


def _loaders(batch=16, n=32):
    x, y = synthetic_classification_batch(0, n, 32, 3, 4)
    return (
        ArrayLoader(x, y, batch, shuffle=True, seed=0),
        ArrayLoader(x, y, batch),
    )


def test_trainer_overfits_and_writes_artifacts(tmp_path):
    bundle = create_model("resnet", "cifar10", depth=8, num_classes=4)
    cfg = TrainConfig(optimizer="sgd", lr=0.05, epochs=4, batch_size=16, seed=0)
    train_loader, val_loader = _loaders()
    t = Trainer(bundle, cfg, steps_per_epoch=len(train_loader), save_dir=str(tmp_path))
    history = t.fit(train_loader, val_loader)
    assert len(history) == 4
    assert history[-1]["train_loss"] < history[0]["train_loss"]
    # scores.tsv exists and has 1 header + 4 rows.
    lines = open(tmp_path / "scores.tsv").read().strip().split("\n")
    assert len(lines) == 5
    assert lines[0].startswith("epoch\t")
    # checkpoint + best exist.
    assert os.path.isdir(tmp_path / "checkpoint")
    assert os.path.isdir(tmp_path / "model_best")


def test_trainer_resume(tmp_path):
    bundle = create_model("resnet", "cifar10", depth=8, num_classes=4)
    cfg = TrainConfig(optimizer="adam", lr=0.01, epochs=2, batch_size=16)
    train_loader, val_loader = _loaders()
    t = Trainer(bundle, cfg, steps_per_epoch=len(train_loader), save_dir=str(tmp_path))
    t.fit(train_loader, val_loader)

    t2 = Trainer(bundle, cfg, steps_per_epoch=len(train_loader), save_dir=str(tmp_path))
    assert t2.resume()
    assert t2.start_epoch == 2
    # Resumed fit with same total epochs does nothing more.
    assert t2.fit(train_loader, val_loader, epochs=2) == []


def test_trainer_early_stop():
    bundle = create_model("resnet", "cifar10", depth=8, num_classes=4)
    # lr=0 → no improvement → patience triggers.
    cfg = TrainConfig(optimizer="sgd", lr=0.0, momentum=0.0, weight_decay=0.0,
                      epochs=10, patience=2)
    train_loader, val_loader = _loaders()
    t = Trainer(bundle, cfg, steps_per_epoch=len(train_loader))
    history = t.fit(train_loader, val_loader)
    # lr=0 → barely-changing val err (BN stats still drift slightly) →
    # patience must cut the run well short of the 10-epoch budget.
    assert 3 <= len(history) < 10


def test_average_meter():
    m = AverageMeter()
    m.update(2.0, 2)
    m.update(4.0, 1)
    assert m.count == 3
    np.testing.assert_allclose(m.avg, (2 * 2 + 4) / 3)
    m.reset()
    assert m.count == 0


def test_weights_check_flags_frozen_params():
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    wc = WeightsCheck(variables["params"])
    warnings = wc.check(variables["params"])  # unchanged params
    assert any("not been updated" in w for w in warnings)


def test_checkpoint_roundtrip(tmp_path):
    state = {"a": np.arange(5.0), "nested": {"b": np.ones((2, 2))}, "epoch": np.asarray(7)}
    save_checkpoint(state, str(tmp_path), is_best=True)
    out = restore_checkpoint(str(tmp_path))
    np.testing.assert_array_equal(out["a"], state["a"])
    np.testing.assert_array_equal(out["nested"]["b"], state["nested"]["b"])
    best = restore_checkpoint(str(tmp_path), name="model_best")
    assert int(best["epoch"]) == 7
    assert restore_checkpoint(str(tmp_path), name="nonexistent") is None


def test_trainer_resume_restores_opt_state_and_step(tmp_path):
    """Resume must restore the optimizer step so the stepped lr schedule and
    momentum continue instead of replaying from step 0."""
    bundle = create_model("resnet", "cifar10", depth=8, num_classes=4)
    cfg = TrainConfig(optimizer="sgd", lr=0.05, epochs=2, batch_size=16,
                      decay_epochs=(1,), decay_rate=0.1)
    train_loader, val_loader = _loaders()
    t = Trainer(bundle, cfg, steps_per_epoch=len(train_loader), save_dir=str(tmp_path))
    t.fit(train_loader, val_loader)
    steps_done = int(t.state.step)
    assert steps_done == 2 * len(train_loader)

    t2 = Trainer(bundle, cfg, steps_per_epoch=len(train_loader), save_dir=str(tmp_path))
    assert t2.resume()
    assert int(t2.state.step) == steps_done
    # Momentum trace restored (non-zero after SGD steps).
    leaves = jax.tree_util.tree_leaves(t2.state.opt_state)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves if hasattr(l, "shape") and np.ndim(l) > 0)


def test_arch_args_saved_and_peeked(tmp_path):
    """arch_resume_names semantics (reference args.py:79-80): arch flags
    persist with the checkpoint and can be peeked before model build."""
    from network_interpretation_imagenet_tpu.cli import common as cli_common

    bundle = create_model("resnet", "cifar10", depth=8)
    cfg = TrainConfig(optimizer="sgd", lr=0.1, epochs=1, seed=0)
    arch_args = {"arch": "resnet", "depth": 8, "death_mode": "linear",
                 "death_rate": 0.25, "growth_rate": 12, "bn_size": 4,
                 "compression": 0.5}
    t = Trainer(bundle, cfg, steps_per_epoch=2, save_dir=str(tmp_path),
                arch_args=arch_args)
    t.save(epoch=0, is_best=True)

    peeked = Trainer.peek_arch_args(str(tmp_path))
    assert peeked == arch_args

    # CLI flags drifted → apply_arch_resume restores the saved architecture.
    import argparse
    drifted = argparse.Namespace(arch="densenet", depth=100, death_mode="none",
                                 death_rate=0.5, growth_rate=24, bn_size=2,
                                 compression=1.0)
    cli_common.apply_arch_resume(drifted, peeked)
    assert drifted.arch == "resnet" and drifted.depth == 8
    assert drifted.death_mode == "linear" and drifted.death_rate == 0.25


def _det_factory(n_batches=6, batch=8):
    """Deterministic epoch->batches factory (same data for every Trainer)."""
    def factory(epoch):
        out = []
        for b in range(n_batches):
            x, y = synthetic_classification_batch(
                1000 + 17 * epoch + b, batch, 32, 3, 4
            )
            out.append((x, y))
        return out
    return factory


class _CrashAfter:
    """Loader that dies after `n` batches — a preemption mid-epoch."""

    def __init__(self, inner, n):
        self.inner, self.n = inner, n

    def __iter__(self):
        for i, item in enumerate(self.inner):
            if i >= self.n:
                raise RuntimeError("preempted")
            yield item


def test_trainer_mid_epoch_checkpoint_resume_is_exact(tmp_path):
    """save_every_steps + a mid-epoch crash + resume reproduces the
    uninterrupted run update-for-update (the skip replays the identical
    batch sequence; params/opt-state/BN stats all round-trip)."""
    import pytest

    def build(save_dir, **kw):
        bundle = create_model("resnet", "cifar10", depth=8, num_classes=4)
        cfg = TrainConfig(optimizer="sgd", lr=0.05, epochs=1, batch_size=8,
                          seed=0)
        return Trainer(bundle, cfg, steps_per_epoch=6, save_dir=save_dir, **kw)

    factory = _det_factory()
    val = factory(99)[:1]

    ref = build(str(tmp_path / "a"))
    ref.fit(factory, val)

    t = build(str(tmp_path / "b"), save_every_steps=2)
    with pytest.raises(RuntimeError, match="preempted"):
        t.fit(lambda e: _CrashAfter(factory(e), 4), val)
    blob = restore_checkpoint(str(tmp_path / "b"))
    assert int(blob["mid_epoch_step"]) == 4
    assert int(blob["step"]) == 4

    t2 = build(str(tmp_path / "b"), save_every_steps=2)
    assert t2.resume()
    assert t2.start_epoch == 0 and t2.resume_skip_steps == 4
    history = t2.fit(factory, val)
    assert len(history) == 1

    ref_leaves = jax.tree_util.tree_leaves(
        {"p": ref.state.params, "b": ref.state.batch_stats}
    )
    res_leaves = jax.tree_util.tree_leaves(
        {"p": t2.state.params, "b": t2.state.batch_stats}
    )
    for a, b in zip(ref_leaves, res_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # Epoch-end save cleared the mid-epoch marker.
    blob2 = restore_checkpoint(str(tmp_path / "b"))
    assert int(blob2["mid_epoch_step"]) == 0


def test_checkpoint_save_is_atomic_with_fallback(tmp_path):
    """A crash between removing the old checkpoint and the rename leaves a
    complete, marked .new dir that restore falls back to; an UNMARKED .new
    (crash mid-write) is ignored."""
    save_checkpoint({"params": {"w": np.ones(3, np.float32)},
                     "epoch": np.asarray(1)}, str(tmp_path))
    path = str(tmp_path / "checkpoint")
    os.rename(path, path + ".new")  # simulate the crash window
    blob = restore_checkpoint(str(tmp_path))
    assert blob is not None and int(blob["epoch"]) == 1

    # Unmarked .new: torn write, must be ignored.
    os.remove(os.path.join(path + ".new", "nit_complete"))
    assert restore_checkpoint(str(tmp_path)) is None

    # A subsequent save must clear the stale .new and win.
    save_checkpoint({"params": {"w": np.zeros(3, np.float32)},
                     "epoch": np.asarray(2)}, str(tmp_path))
    blob = restore_checkpoint(str(tmp_path))
    assert int(blob["epoch"]) == 2
    assert not os.path.exists(path + ".new")


def test_checkpoint_orphan_new_promoted_before_next_write(tmp_path):
    """After a crash-in-swap (only a marked .new survives), the NEXT save
    promotes it to the main dir BEFORE starting its own write — a second
    preemption during that write must not lose the only checkpoint."""
    import orbax.checkpoint as ocp
    import pytest

    save_checkpoint({"params": {"w": np.ones(3, np.float32)},
                     "epoch": np.asarray(7)}, str(tmp_path))
    path = str(tmp_path / "checkpoint")
    os.rename(path, path + ".new")  # crash between rmtree(old) and rename

    orig = ocp.PyTreeCheckpointer.save

    def die(self, *a, **k):
        raise RuntimeError("preempted during Orbax write")

    ocp.PyTreeCheckpointer.save = die
    try:
        with pytest.raises(RuntimeError, match="preempted"):
            save_checkpoint({"params": {"w": np.zeros(3, np.float32)},
                             "epoch": np.asarray(8)}, str(tmp_path))
    finally:
        ocp.PyTreeCheckpointer.save = orig
    # The epoch-7 state survived: promoted to the main dir pre-write.
    blob = restore_checkpoint(str(tmp_path))
    assert blob is not None and int(blob["epoch"]) == 7


def test_restore_prefers_marked_new_over_torn_main_dir(tmp_path):
    """SIGKILL mid-rmtree leaves a torn (unmarked) main dir; restore must
    use the complete marked .new beside it, not crash on the torn dir."""
    save_checkpoint({"params": {"w": np.ones(3, np.float32)},
                     "epoch": np.asarray(3)}, str(tmp_path))
    path = str(tmp_path / "checkpoint")
    os.rename(path, path + ".new")
    # Torn main dir: exists, has stray content, but NO completion marker
    # (save drops the old marker before rmtree, so torn dirs are unmarked).
    os.makedirs(path)
    with open(os.path.join(path, "stray"), "w") as f:
        f.write("partial")
    blob = restore_checkpoint(str(tmp_path))
    assert blob is not None and int(blob["epoch"]) == 3


def test_arrayloader_set_epoch_is_deterministic():
    """set_epoch makes the batch stream a pure function of (seed, epoch):
    a fresh process's epoch-E stream matches the original run's."""
    x = np.arange(24 * 4, dtype=np.float32).reshape(24, 2, 2)
    y = np.arange(24, dtype=np.int64)
    a = ArrayLoader(x, y, 4, shuffle=True, seed=5)
    b = ArrayLoader(x, y, 4, shuffle=True, seed=5)
    a.set_epoch(0)
    list(a)  # advance through epoch 0
    a.set_epoch(1)
    got_a = [lab.tolist() for _, lab in a]
    b.set_epoch(1)  # fresh process jumps straight to epoch 1
    got_b = [lab.tolist() for _, lab in b]
    assert got_a == got_b
    # ...and differs from epoch 0 (it really reshuffles).
    b.set_epoch(0)
    assert [lab.tolist() for _, lab in b] != got_a


def test_epoch_batches_skip_matches_islice():
    """skip=N slices the permutation pre-decode and yields exactly the
    stream islice would produce post-decode."""
    import itertools

    from network_interpretation_imagenet_tpu.data.imagenet_train import (
        epoch_batches,
    )

    class _DS:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return np.full((2, 2, 3), i, np.float32), i % 5

    ref = list(itertools.islice(
        epoch_batches(_DS(), 4, epoch=2, seed=9, workers=0), 3, None))
    got = list(epoch_batches(_DS(), 4, epoch=2, seed=9, workers=0, skip=3))
    assert len(ref) == len(got) > 0
    for (xa, ya), (xb, yb) in zip(ref, got):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


def test_no_mid_epoch_save_on_epoch_boundary(tmp_path):
    """When the save interval lands exactly on the last batch, the
    mid-epoch save is suppressed (the epoch-end save follows at once, and
    a mid==steps resume would re-enter a zero-batch epoch)."""
    bundle = create_model("resnet", "cifar10", depth=8, num_classes=4)
    cfg = TrainConfig(optimizer="sgd", lr=0.05, epochs=1, batch_size=8, seed=0)
    train_loader, val_loader = _loaders(batch=8, n=32)  # 4 batches
    t = Trainer(bundle, cfg, steps_per_epoch=4, save_dir=str(tmp_path),
                save_every_steps=4)
    t.train_epoch(train_loader, epoch=0)
    assert not os.path.exists(tmp_path / "checkpoint")


def test_factory_skip_is_used_on_resume(tmp_path):
    """A factory exposing skip= receives the resume offset (no islice) and
    the resumed run still matches the uninterrupted one exactly."""
    import pytest

    seen = []
    base = _det_factory()

    def factory(epoch, skip=0):
        seen.append((epoch, skip))
        return base(epoch)[skip:]

    def build(save_dir):
        bundle = create_model("resnet", "cifar10", depth=8, num_classes=4)
        cfg = TrainConfig(optimizer="sgd", lr=0.05, epochs=1, batch_size=8,
                          seed=0)
        return Trainer(bundle, cfg, steps_per_epoch=6, save_dir=save_dir,
                       save_every_steps=2)

    val = base(99)[:1]
    t = build(str(tmp_path / "a"))
    with pytest.raises(RuntimeError, match="preempted"):
        t.fit(lambda e, skip=0: _CrashAfter(base(e)[skip:], 4 - skip), val)

    t2 = build(str(tmp_path / "a"))
    assert t2.resume() and t2.resume_skip_steps == 4
    t2.fit(factory, val)
    assert (0, 4) in seen  # resumed epoch came pre-sliced from the factory

    ref = build(str(tmp_path / "b"))
    ref.fit(base, val)
    ra = jax.tree_util.tree_leaves({"p": ref.state.params,
                                    "b": ref.state.batch_stats})
    rb = jax.tree_util.tree_leaves({"p": t2.state.params,
                                    "b": t2.state.batch_stats})
    for p, q in zip(ra, rb):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=1e-6)


def test_model_best_swap_keeps_marker_invariant(tmp_path):
    """model_best follows the same completeness-marker protocol as the main
    checkpoint: the marker is written only AFTER the copy lands, a crashed
    best-swap leaves a marked model_best.new that restore falls back to,
    and the next best-save promotes it before its own (interruptible)
    copytree."""
    save_checkpoint({"params": {"w": np.ones(3, np.float32)},
                     "epoch": np.asarray(1)}, str(tmp_path), is_best=True)
    best = str(tmp_path / "model_best")
    assert os.path.exists(os.path.join(best, "nit_complete"))

    # Crash between rmtree(best) and the rename: only the marked .new left.
    os.rename(best, best + ".new")
    blob = restore_checkpoint(str(tmp_path), name="model_best")
    assert blob is not None and int(blob["epoch"]) == 1

    # The next best-save promotes the orphan first, then swaps in epoch 2.
    save_checkpoint({"params": {"w": np.zeros(3, np.float32)},
                     "epoch": np.asarray(2)}, str(tmp_path), is_best=True)
    blob = restore_checkpoint(str(tmp_path), name="model_best")
    assert int(blob["epoch"]) == 2
    assert not os.path.exists(best + ".new")

    # A torn (unmarked) model_best beside a marked .new: restore prefers
    # the .new — save drops the old marker before rmtree, so torn dirs are
    # never marked.
    os.rename(best, best + ".new")
    os.makedirs(best)
    with open(os.path.join(best, "stray"), "w") as f:
        f.write("partial")
    blob = restore_checkpoint(str(tmp_path), name="model_best")
    assert blob is not None and int(blob["epoch"]) == 2


def test_zero_batch_resume_fails_loudly(tmp_path):
    """steps_per_epoch overstating a LENGTH-LESS loader's true batch count
    lets a mid-epoch save land on the true last batch; the resumed epoch
    would then train zero batches and record bogus metrics (loss 0.0,
    err 100.0) — fit() must raise instead of writing the row."""
    base = _det_factory(n_batches=3)

    def build(save_dir):
        bundle = create_model("resnet", "cifar10", depth=8, num_classes=4)
        cfg = TrainConfig(optimizer="sgd", lr=0.05, epochs=1, batch_size=8,
                          seed=0)
        # steps_per_epoch=4 overstates the 3-batch epoch (e.g. a rank slice
        # that dropped the partial global batch without exposing __len__).
        return Trainer(bundle, cfg, steps_per_epoch=4, save_dir=save_dir,
                       save_every_steps=3)

    def crash_at_epoch_end(e):
        # Yields all 3 batches, then dies where StopIteration would land —
        # a preemption between the last step and the epoch-end save.
        yield from base(e)
        raise RuntimeError("preempted")

    val = base(99)[:1]
    t = build(str(tmp_path))
    with pytest.raises(RuntimeError, match="preempted"):
        t.fit(crash_at_epoch_end, val)
    blob = restore_checkpoint(str(tmp_path))
    assert int(blob["mid_epoch_step"]) == 3  # landed on the true last batch

    t2 = build(str(tmp_path))
    assert t2.resume() and t2.resume_skip_steps == 3
    with pytest.raises(RuntimeError, match="overstates"):
        t2.fit(lambda e: iter(base(e)), val)


def test_rank_slice_epochs_are_sized(tmp_path):
    """_RankSlice epoch iterables expose the FULL-batch count so the
    Trainer's boundary suppression is exact even though the partial global
    batch is dropped."""
    from network_interpretation_imagenet_tpu.cli.main import _RankSlice

    x = np.zeros((22, 4, 4, 3), np.float32)
    y = np.zeros((22,), np.int64)
    inner = ArrayLoader(x, y, 8, shuffle=True, seed=0, drop_last=True)
    rs = _RankSlice(inner, rank=0, world=2, global_batch=8)
    ep = rs(0)
    assert len(ep) == 2  # 22 // 8 full global batches
    got = list(ep)
    assert len(got) == 2
    assert all(lab.shape[0] == 4 for _, lab in got)  # local slice of 8/2
