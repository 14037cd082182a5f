"""Measure the depth-2 flush pipeline in bo_saliency_sweep on the real chip.

64 synthetic ImageNet images, image_batch=16 (4 flushes), ResNet-101,
SLIC-48, reference BO budget (3 pre + 10 iters). "sync" emulates the
pre-pipeline behavior by collecting each flush's fused program eagerly at
dispatch; "pipelined" is the shipped code (finalize flush i-1 while flush
i churns on device). Same math either way — the sweep equivalence tests
pin that; this probe only times it.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.config import BOConfig, SegmentConfig
from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.saliency import bo_pipeline
from network_interpretation_imagenet_tpu.saliency.engine import SaliencyEngine
from network_interpretation_imagenet_tpu.saliency.sweep import bo_saliency_sweep
from network_interpretation_imagenet_tpu.utils.compile_cache import (
    enable_compilation_cache,
)


def dataset(n, seed0):
    r = np.random.RandomState(seed0)
    for _ in range(n):
        yield r.rand(224, 224, 3).astype(np.float32), None, None


def run(engine, cfg, bo_cfg, n, seed0, sync):
    real = bo_pipeline.bo_window_saliency_multi_async
    if sync:
        def eager(*a, **k):
            results = real(*a, **k)()
            return lambda: results
        bo_pipeline.bo_window_saliency_multi_async = eager
    try:
        t0 = time.perf_counter()
        res = bo_saliency_sweep(engine, dataset(n, seed0), cfg,
                                bo_cfg=bo_cfg, image_batch=16, seed=2)
        wall = time.perf_counter() - t0
    finally:
        bo_pipeline.bo_window_saliency_multi_async = real
    assert res.images_explained == n, (res.images_explained, res.images_failed)
    return wall


def main():
    enable_compilation_cache()
    bundle = create_model("resnet101", "imagenet", dtype=jnp.bfloat16)
    engine = SaliencyEngine(bundle, bundle.init(jax.random.PRNGKey(0)),
                            mask_batch=1024)
    cfg = SegmentConfig(method="slic", n_segments=48, slic_iters=10)
    bo_cfg = BOConfig()
    print("warming (compiles)...", flush=True)
    run(engine, cfg, bo_cfg, 16, 61, sync=True)

    n = 64
    walls = {"sync": [], "pipelined": []}
    for _ in range(6):  # alternate: tunnel RTT drifts minute-to-minute
        for mode in ("sync", "pipelined"):
            wall = run(engine, cfg, bo_cfg, n, 77, sync=(mode == "sync"))
            walls[mode].append(wall)
            print(f"{mode:10s}: {n} images in {wall:.2f}s = {n/wall:.1f} img/s",
                  flush=True)
    for mode, ws in walls.items():
        ws = sorted(ws)
        med = ws[len(ws) // 2]
        print(f"{mode:10s} median: {n/med:.1f} img/s  best: {n/ws[0]:.1f}",
              flush=True)


if __name__ == "__main__":
    main()
