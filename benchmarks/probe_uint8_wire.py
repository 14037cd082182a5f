"""On-chip probe: the uint8 wire vs the f32 upload path on the batched
sweep lanes (``saliency.sweep`` ``normalize=``).

The attribution/BO sweep flushes upload ``image_batch`` full images per
program; through the axon tunnel a 16-image 224² f32 stack is ~9.6 MB
(~240 ms, docs/PERFORMANCE.md attribution roofline), and these lanes are
transfer-bound end-to-end. The wire ships raw uint8 (2.4 MB) and runs
/255 + normalize ON DEVICE — this probe measures what that buys on the
real chip for both lanes (IG-16 attribution and fused-BO), median of 3.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/probe_uint8_wire.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def f32_dataset(n, seed0, mean, std):
    r = np.random.RandomState(seed0)
    for _ in range(n):
        u8 = r.randint(0, 256, (224, 224, 3)).astype(np.uint8)
        yield ((u8.astype(np.float32) / np.float32(255.0)
                - np.asarray(mean, np.float32))
               / np.asarray(std, np.float32)), None, None


def u8_dataset(n, seed0):
    r = np.random.RandomState(seed0)
    for _ in range(n):
        yield r.randint(0, 256, (224, 224, 3)).astype(np.uint8), None, None


def median_rate(fn, runs=3):
    rates = []
    for r in range(runs):
        t0 = time.perf_counter()
        res = fn(r)
        rates.append(res.images_explained / (time.perf_counter() - t0))
    return float(np.median(rates)), rates


def main():
    import jax

    from network_interpretation_imagenet_tpu.config import (
        IMAGENET_MEAN, IMAGENET_STD, SegmentConfig,
    )
    from network_interpretation_imagenet_tpu.models import create_model
    from network_interpretation_imagenet_tpu.saliency.engine import (
        SaliencyEngine,
    )
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep, bo_saliency_sweep,
    )
    from network_interpretation_imagenet_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    norm = (IMAGENET_MEAN, IMAGENET_STD)

    bundle = create_model("resnet101", "imagenet")
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=4096)

    # --- attribution lane (IG-16, bench row shapes) ----------------------
    kw = dict(method="integrated", image_batch=16, steps=16, step_batch=4)
    log("attribution warm (f32 + u8 wire)...")
    attribution_sweep(engine, f32_dataset(16, 1, *norm), seed=4, **kw)
    attribution_sweep(engine, u8_dataset(16, 1), seed=4, normalize=norm,
                      **kw)
    a_f32, rf = median_rate(lambda r: attribution_sweep(
        engine, f32_dataset(32, 11 + r, *norm), seed=5 + r, **kw))
    a_u8, ru = median_rate(lambda r: attribution_sweep(
        engine, u8_dataset(32, 11 + r), seed=5 + r, normalize=norm, **kw))
    log(f"attribution IG-16: f32 {a_f32:.1f} img/s "
        f"(runs {[f'{x:.1f}' for x in rf]})  "
        f"u8 wire {a_u8:.1f} img/s (runs {[f'{x:.1f}' for x in ru]})  "
        f"-> {a_u8 / a_f32:.2f}x")

    # --- flagship BO lane (bench row shapes) ------------------------------
    from network_interpretation_imagenet_tpu.config import BOConfig

    slic_cfg = SegmentConfig(method="slic", n_segments=48, slic_iters=10)
    bo_cfg = BOConfig(n_iters=10, n_pre_samples=3)
    bkw = dict(bo_cfg=bo_cfg, image_batch=16)
    log("bo warm (f32 + u8 wire)...")
    bo_saliency_sweep(engine, f32_dataset(16, 2, *norm), slic_cfg, seed=2,
                      **bkw)
    bo_saliency_sweep(engine, u8_dataset(16, 2), slic_cfg, seed=2,
                      normalize=norm, **bkw)
    b_f32, rf = median_rate(lambda r: bo_saliency_sweep(
        engine, f32_dataset(48, 21 + r, *norm), slic_cfg, seed=3 + r, **bkw))
    b_u8, ru = median_rate(lambda r: bo_saliency_sweep(
        engine, u8_dataset(48, 21 + r), slic_cfg, seed=3 + r,
        normalize=norm, **bkw))
    log(f"bo sweep (3+10): f32 {b_f32:.1f} img/s "
        f"(runs {[f'{x:.1f}' for x in rf]})  "
        f"u8 wire {b_u8:.1f} img/s (runs {[f'{x:.1f}' for x in ru]})  "
        f"-> {b_u8 / b_f32:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
