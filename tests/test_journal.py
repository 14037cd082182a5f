"""Sweep journal (saliency/journal.py): crash-safe resume for val-set sweeps.

The reference's saliency scripts lose all work on interruption; the sweep
journal appends each image's terminal outcome as it finalizes and restores
it on resume. Because per-image PRNG seeds derive from DATASET indices
(round-2 seed fix), a resumed sweep must reproduce an uninterrupted run
byte-for-byte.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.config import BOConfig, SegmentConfig
from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.saliency.engine import SaliencyEngine
from network_interpretation_imagenet_tpu.saliency.journal import SweepJournal
from network_interpretation_imagenet_tpu.saliency.sweep import (
    bo_saliency_sweep,
    saliency_sweep,
)

SEG = SegmentConfig(method="slic", n_segments=9, slic_iters=4)


def _engine(mask_batch=8):
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    return SaliencyEngine(bundle, variables, mask_batch=mask_batch,
                          compute_dtype=jnp.float32)


def _dataset(engine, n=6):
    """Re-iterable mixed-outcome dataset: item 2 is misclassified."""
    rng = np.random.RandomState(7)
    items = []
    for i in range(n):
        img = rng.rand(28, 28, 1).astype(np.float32)
        pred, _ = engine.predict_one(img)
        label = (pred + 1) % 10 if i == 2 else pred
        items.append((img, label, np.array([4, 4, 10, 10])))
    return items


def _rows(res):
    return sorted(
        ({k: v for k, v in r.items() if k != "seconds"} for r in res.per_image),
        key=lambda r: r["index"],
    )


# --- unit: journal file semantics -------------------------------------------


def test_journal_load_skips_torn_tail_and_retries_failures(tmp_path):
    path = str(tmp_path / "j.jsonl")
    j = SweepJournal(path)
    j.record({"event": "image_done", "index": 0, "survival": 0.5,
              "iou": 0.25, "seconds": 0.1})
    j.record({"event": "skip_misclassified", "index": 1, "pred": 3, "label": 4})
    j.record({"event": "image_failed", "index": 2, "error": "boom"})
    j.close()
    with open(path, "a") as f:
        f.write('{"event": "image_done", "ind')  # torn tail from a crash

    r = SweepJournal(path, resume=True)
    assert r.done == {0, 1}  # failed index 2 retries; torn line ignored
    assert r.restored_skips == 1
    assert r.restored_rows == [
        {"index": 0, "survival": 0.5, "iou": 0.25, "seconds": 0.1}
    ]
    r.close()


def test_journal_fresh_run_truncates(tmp_path):
    path = str(tmp_path / "j.jsonl")
    j = SweepJournal(path)
    j.record({"event": "image_done", "index": 0})
    j.close()
    j2 = SweepJournal(path, resume=False)  # fresh run invalidates the journal
    j2.close()
    assert open(path).read() == ""


def test_journal_heatmap_roundtrip(tmp_path):
    j = SweepJournal(str(tmp_path / "j.jsonl"), keep_heatmaps=True)
    heat = np.arange(12, dtype=np.float32).reshape(3, 4)
    j.save_heatmap(5, heat)
    np.testing.assert_array_equal(j.load_heatmap(5), heat)
    assert j.load_heatmap(6) is None
    j.close()


# --- integration: resumed sweeps match uninterrupted ones --------------------


def test_window_sweep_resume_matches_uninterrupted(tmp_path):
    engine = _engine()
    data = _dataset(engine)
    ref = saliency_sweep(engine, data, SEG, num_mask_samples=8,
                         keep_heatmaps=True)

    path = str(tmp_path / "j.jsonl")
    j1 = SweepJournal(path, keep_heatmaps=True)
    part = saliency_sweep(engine, data, SEG, num_mask_samples=8,
                          keep_heatmaps=True, max_images=3, journal=j1)
    j1.close()
    assert part.images_total == 3

    j2 = SweepJournal(path, resume=True, keep_heatmaps=True)
    assert len(j2.done) == 3  # 2 explained + 1 misclassified-skip
    res = saliency_sweep(engine, data, SEG, num_mask_samples=8,
                         keep_heatmaps=True, journal=j2)
    j2.close()

    assert res.images_total == ref.images_total == 6
    assert res.images_explained == ref.images_explained
    assert res.images_skipped_misclassified == ref.images_skipped_misclassified
    assert _rows(res) == _rows(ref)
    assert res.mean_iou == ref.mean_iou
    assert set(res.heatmaps) == set(ref.heatmaps)
    for i in ref.heatmaps:
        np.testing.assert_array_equal(res.heatmaps[i], ref.heatmaps[i])

    # The journal now holds every terminal outcome: a third run is a no-op.
    j3 = SweepJournal(path, resume=True, keep_heatmaps=True)
    res3 = saliency_sweep(engine, data, SEG, num_mask_samples=8,
                          keep_heatmaps=True, journal=j3)
    j3.close()
    assert _rows(res3) == _rows(ref)
    assert res3.evals_per_sec == 0.0  # no NEW work this run


def test_window_sweep_resume_image_batched(tmp_path):
    """Resume composes with --image-batch: done images drop out of flushes
    and per-image seeds (dataset-index-derived) keep results identical."""
    engine = _engine()
    data = _dataset(engine)
    ref = saliency_sweep(engine, data, SEG, num_mask_samples=8, image_batch=4)

    path = str(tmp_path / "j.jsonl")
    j1 = SweepJournal(path)
    saliency_sweep(engine, data, SEG, num_mask_samples=8, image_batch=4,
                   max_images=4, journal=j1)
    j1.close()
    j2 = SweepJournal(path, resume=True)
    res = saliency_sweep(engine, data, SEG, num_mask_samples=8, image_batch=4,
                         journal=j2)
    j2.close()
    assert _rows(res) == _rows(ref)


def test_bo_sweep_resume_matches_uninterrupted(tmp_path):
    engine = _engine(mask_batch=16)
    data = _dataset(engine, n=4)
    cfg = BOConfig(n_pre_samples=2, n_iters=3)
    ref = bo_saliency_sweep(engine, data, SEG, bo_cfg=cfg, image_batch=2)

    path = str(tmp_path / "j.jsonl")
    j1 = SweepJournal(path)
    bo_saliency_sweep(engine, data, SEG, bo_cfg=cfg, image_batch=2,
                      max_images=2, journal=j1)
    j1.close()
    j2 = SweepJournal(path, resume=True)
    res = bo_saliency_sweep(engine, data, SEG, bo_cfg=cfg, image_batch=2,
                            journal=j2)
    j2.close()
    assert _rows(res) == _rows(ref)
    assert res.images_skipped_misclassified == ref.images_skipped_misclassified


def test_cli_sweep_resume(tmp_path):
    """CLI surface: --journal is on by default, --resume restores it."""
    from network_interpretation_imagenet_tpu.cli.saliency_sweep import main

    out = str(tmp_path / "out")
    base = ["--synthetic", "--dataset", "mnist", "--arch", "mnist_cnn",
            "--segmenter", "slic", "--n_segments", "9",
            "--num_mask_samples", "8", "--out", out,
            "--no-compilation-cache"]
    main(base + ["--num-images", "2"])
    jpath = tmp_path / "out" / "sweep_journal.jsonl"
    assert jpath.exists()
    lines = [json.loads(l) for l in jpath.read_text().splitlines()]
    assert sum(1 for l in lines if l["event"] == "image_done") == 2

    main(base + ["--num-images", "4", "--resume"])
    result = json.loads((tmp_path / "out" / "sweep_result.json").read_text())
    assert result["images_total"] == 4
    assert result["images_explained"] == 4
    lines = [json.loads(l) for l in jpath.read_text().splitlines()]
    assert sum(1 for l in lines if l["event"] == "image_done") == 4


def test_journal_resume_isolates_torn_tail_for_next_resume(tmp_path):
    """A resume after a torn-tail crash must not concatenate its first
    record onto the fragment (both lines would be lost to the NEXT load)."""
    path = str(tmp_path / "j.jsonl")
    j = SweepJournal(path)
    j.record({"event": "image_done", "index": 0, "survival": 1.0})
    j.close()
    with open(path, "a") as f:
        f.write('{"event": "image_done", "ind')  # crash mid-write, no \n

    j2 = SweepJournal(path, resume=True)
    j2.record({"event": "image_done", "index": 1, "survival": 1.0})
    j2.close()
    j3 = SweepJournal(path, resume=True)
    assert j3.done == {0, 1}
    j3.close()


def test_journal_config_fingerprint_refuses_mismatched_resume(tmp_path):
    path = str(tmp_path / "j.jsonl")
    j = SweepJournal(path, config={"num_mask_samples": 64, "mode": "window"})
    j.record({"event": "image_done", "index": 0, "survival": 1.0})
    j.close()

    ok = SweepJournal(path, resume=True,
                      config={"num_mask_samples": 64, "mode": "window"})
    assert ok.done == {0}
    ok.close()

    import pytest

    with pytest.raises(ValueError, match="config mismatch"):
        SweepJournal(path, resume=True,
                     config={"num_mask_samples": 256, "mode": "window"})
    # Journals without a stamped config (or resumes without one) accept.
    noconf = SweepJournal(path, resume=True)
    assert noconf.done == {0}
    noconf.close()


def test_journal_keep_heatmaps_mismatch_raises(tmp_path):
    from network_interpretation_imagenet_tpu.saliency.sweep import SweepResult
    from network_interpretation_imagenet_tpu.utils.meters import AverageMeter

    import pytest

    j = SweepJournal(str(tmp_path / "j.jsonl"), keep_heatmaps=False)
    with pytest.raises(ValueError, match="keep_heatmaps"):
        j.restore_into(SweepResult(), AverageMeter(), AverageMeter(), [],
                       keep_heatmaps=True)
    j.close()


def test_attribution_sweep_resume_matches_uninterrupted(tmp_path):
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    engine = _engine()
    data = _dataset(engine)
    kw = dict(method="smoothgrad", samples=3, image_batch=2, seed=5,
              keep_heatmaps=True)
    ref = attribution_sweep(engine, data, **kw)

    path = str(tmp_path / "j.jsonl")
    j1 = SweepJournal(path, keep_heatmaps=True)
    part = attribution_sweep(engine, data, max_images=3, journal=j1, **kw)
    j1.close()
    assert part.images_total == 3

    j2 = SweepJournal(path, resume=True, keep_heatmaps=True)
    assert len(j2.done) == 3  # 2 explained + 1 misclassified-skip
    res = attribution_sweep(engine, data, journal=j2, **kw)
    j2.close()

    assert res.images_total == ref.images_total == 6
    assert res.images_explained == ref.images_explained == 5
    assert _rows(res) == _rows(ref)
    assert set(res.heatmaps) == set(ref.heatmaps)
    for i in ref.heatmaps:
        np.testing.assert_array_equal(res.heatmaps[i], ref.heatmaps[i])
