"""Warm serving-path timings for the round-3 artifacts, on the real chip.

Measures the staged backlog items from docs/PERFORMANCE.md:
  1. `ExportedBOServer.explain` warm (round-2 baseline: 70 ms, MNIST CNN,
     3+10 budget) and the round-3 `explain_batch` (N=16 vmapped loops —
     local equivalent measured 23-25 ms/image on ResNet-101 in round 2;
     here the MNIST artifact isolates the serving overhead).
  2. Knockout-mask serving (`eval_knockout_masks` at the reference's
     MNIST shape: 1000 masks, m=1 — generate_gp_training_data_mnist.py:203).

Run: PYTHONPATH=/root/repo python benchmarks/probe_serving.py
"""

import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu import serving
from network_interpretation_imagenet_tpu.config import BOConfig
from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.saliency import SaliencyEngine
from network_interpretation_imagenet_tpu.utils.compile_cache import (
    enable_compilation_cache,
)


def _median_ms(fn, reps=8):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), float(np.min(ts))


def main():
    enable_compilation_cache()
    print("devices:", jax.devices())
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    host_vars = jax.device_get(variables)
    engine = SaliencyEngine(bundle, variables, mask_batch=1024,
                            compute_dtype=jnp.float32)

    rng = np.random.RandomState(0)
    img = rng.rand(28, 28, 1).astype(np.float32)
    seg = rng.randint(0, 24, (28, 28)).astype(np.int32)

    with tempfile.TemporaryDirectory() as tmp:
        # --- fused-BO artifact: single + image-batched(16) programs -------
        bo_dir = f"{tmp}/bo"
        t0 = time.perf_counter()
        serving.export_bo_engine(
            engine, bo_dir, bo_cfg=BOConfig(), candidate_buckets=(32,),
            image_batches=(16,), host_variables=host_vars,
        )
        print(f"export_bo_engine (buckets=32, image_batches=16): "
              f"{time.perf_counter() - t0:.1f} s")
        srv = serving.load_exported_bo(bo_dir)
        t0 = time.perf_counter()
        srv.warmup()
        print(f"bo warmup: {time.perf_counter() - t0:.1f} s")

        med, best = _median_ms(lambda: srv.explain(img, seg, seed=3))
        print(f"explain (single, 3+10): median {med:.1f} ms, best {best:.1f}")

        imgs = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(16)]
        segs = [rng.randint(0, 24, (28, 28)).astype(np.int32)
                for _ in range(16)]
        med, best = _median_ms(
            lambda: srv.explain_batch(imgs, segs, seed=3), reps=6)
        print(f"explain_batch (N=16, 3+10): median {med:.1f} ms "
              f"({med / 16:.1f} ms/image), best {best / 16:.1f} ms/image")

        # --- window + knockout forward artifact ---------------------------
        win_dir = f"{tmp}/win"
        t0 = time.perf_counter()
        serving.export_engine(engine, win_dir, batch_sizes=(1024,),
                              knockout_m=1, host_variables=host_vars)
        print(f"export_engine (B=1024, knockout_m=1): "
              f"{time.perf_counter() - t0:.1f} s")
        wsrv = serving.load_exported(win_dir)
        wsrv.warmup()

        knock = rng.randint(0, 24, size=(1000, 1)).astype(np.int32)
        med, best = _median_ms(
            lambda: wsrv.eval_knockout_masks(img, seg, knock, target=5))
        print(f"eval_knockout_masks (K=1000, m=1): median {med:.1f} ms "
              f"-> {1000 / (med / 1e3):.0f} evals/s, best {best:.1f} ms")

        firsts = rng.randint(0, 14, size=1000).astype(np.int32)
        med, best = _median_ms(
            lambda: wsrv.eval_window_masks(img, seg, firsts, 9, 5))
        print(f"eval_window_masks (K=1000): median {med:.1f} ms "
              f"-> {1000 / (med / 1e3):.0f} evals/s, best {best:.1f} ms")


if __name__ == "__main__":
    main()
