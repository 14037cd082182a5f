"""Threaded decode-ahead (data/prefetch.py) — the reference's
DataLoader(num_workers) counterpart."""

import threading
import time

import numpy as np
import pytest

from network_interpretation_imagenet_tpu.data.prefetch import prefetch


class _SlowDataset:
    """Indexable dataset with a per-item delay and access log."""

    def __init__(self, n, delay=0.02):
        self.n = n
        self.delay = delay
        self.accessed = []
        self._lock = threading.Lock()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        time.sleep(self.delay)
        with self._lock:
            self.accessed.append(i)
        return ("item", i)


def test_prefetch_preserves_order_and_covers_all():
    ds = _SlowDataset(17, delay=0.001)
    out = list(prefetch(ds, num_workers=4, buffer=6))
    assert out == [("item", i) for i in range(17)]
    assert sorted(ds.accessed) == list(range(17))


def test_prefetch_overlaps_work():
    """4 workers on 20 items of 20 ms each must beat serial decode.

    The bound compares against a serial run MEASURED under the same machine
    load (an absolute wall-clock bound flaked when the suite ran alongside
    other work)."""
    ds_serial = _SlowDataset(20, delay=0.02)
    t0 = time.perf_counter()
    list(prefetch(ds_serial, num_workers=0))
    serial = time.perf_counter() - t0
    ds = _SlowDataset(20, delay=0.02)
    t0 = time.perf_counter()
    list(prefetch(ds, num_workers=4, buffer=8))
    parallel = time.perf_counter() - t0
    assert parallel < serial * 0.6, (parallel, serial)


def test_prefetch_bounded_inflight():
    """No more than `buffer` items are ever fetched ahead of the consumer."""
    ds = _SlowDataset(30, delay=0.001)
    gen = prefetch(ds, num_workers=8, buffer=4)
    next(gen)
    time.sleep(0.1)  # let workers run ahead as far as they can
    assert len(ds.accessed) <= 1 + 4 + 8  # consumed + buffer + in-flight slack
    list(gen)


def test_prefetch_explicit_indices_stride():
    ds = _SlowDataset(10, delay=0.0)
    out = list(prefetch(ds, num_workers=2, indices=[1, 3, 5, 7, 9]))
    assert [i for _, i in out] == [1, 3, 5, 7, 9]


def test_prefetch_serial_fallbacks():
    ds = _SlowDataset(5, delay=0.0)
    assert [i for _, i in prefetch(ds, num_workers=0)] == [0, 1, 2, 3, 4]
    gen_input = (("item", i) for i in range(4))
    assert len(list(prefetch(gen_input, num_workers=4))) == 4  # iterable passthrough


def test_prefetch_propagates_exception_at_right_index():
    class Boom(_SlowDataset):
        def __getitem__(self, i):
            if i == 3:
                raise ValueError("boom at 3")
            return super().__getitem__(i)

    ds = Boom(6, delay=0.001)
    gen = prefetch(ds, num_workers=3, buffer=4)
    got = []
    with pytest.raises(ValueError, match="boom at 3"):
        for item in gen:
            got.append(item)
    assert [i for _, i in got] == [0, 1, 2]


def test_sweep_cli_workers_real_jpegs(tmp_path):
    """--workers drives the real-JPEG fixture through the prefetching
    sweep; results match a serial (--workers 0) run."""
    import json
    import os

    from network_interpretation_imagenet_tpu.cli import saliency_sweep as cli

    fixture = os.path.join(os.path.dirname(__file__), "fixtures",
                           "imagenet_loc")
    if not os.path.isdir(fixture):
        pytest.skip("fixture not present")
    results = {}
    for workers in (0, 3):
        out = str(tmp_path / f"w{workers}")
        cli.main([
            "--data", fixture, "--dataset", "imagenet", "--arch", "resnet18",
            "--num-images", "3", "--num_mask_samples", "8",
            "--mask-batch", "8", "--dtype", "float32",
            "--segmenter", "slic", "--n_segments", "9",
            "--workers", str(workers), "--out", out,
        ])
        with open(os.path.join(out, "sweep_result.json")) as f:
            results[workers] = json.load(f)
    assert results[0]["images_total"] == results[3]["images_total"]
    assert results[0]["images_explained"] == results[3]["images_explained"]
    np.testing.assert_allclose(results[0]["mean_survival"],
                               results[3]["mean_survival"], atol=1e-6)
