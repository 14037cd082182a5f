"""On-chip probe: mask-batched attribution sweep throughput
(occlusion / RISE / Score-CAM as ONE ``lax.map`` program per flush).

These per-image methods batch over MASKS internally, so the sweep runs
each flush as one program that scans the image axis sequentially
(``gradient.mask_method_batch``) — live memory stays at one image's mask
chunk while the flush still costs a single dispatch + one stacked fetch.
This probe measures what that buys end-to-end on the real chip at
reference-scale hyperparameters (ResNet-101 @ 224², uint8 image wire,
median of 3), and prints the per-method masked-forward rate so the lane
can be compared against the 7.4k evals/s masked-forward headline.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/probe_mask_batched.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def u8_dataset(n, seed0):
    r = np.random.RandomState(seed0)
    for _ in range(n):
        yield r.randint(0, 256, (224, 224, 3)).astype(np.uint8), None, None


def median_rate(fn, runs=3):
    rates, evals = [], []
    for r in range(runs):
        t0 = time.perf_counter()
        res = fn(r)
        dt = time.perf_counter() - t0
        rates.append(res.images_explained / dt)
        evals.append(res.evals_per_sec)
    return float(np.median(rates)), rates, float(np.median(evals))


def main():
    import jax

    from network_interpretation_imagenet_tpu.config import (
        IMAGENET_MEAN, IMAGENET_STD,
    )
    from network_interpretation_imagenet_tpu.models import create_model
    from network_interpretation_imagenet_tpu.saliency.engine import (
        SaliencyEngine,
    )
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )
    from network_interpretation_imagenet_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    log(f"devices: {jax.devices()}")
    norm = (IMAGENET_MEAN, IMAGENET_STD)

    bundle = create_model("resnet101", "imagenet")
    variables = bundle.init(jax.random.PRNGKey(0))
    # NOTE: the engine's mask_batch does NOT reach the mask-batched
    # attribution lane — per-image chunking comes from attribution_sweep's
    # own ``mask_batch`` kwarg (left unset below → each method's one-shot
    # default: occlusion/scorecam 64, rise 250; for RISE the chunk is part
    # of the RNG stream, i.e. a method hyperparameter).
    engine = SaliencyEngine(bundle, variables)

    # (method kwargs, images per run, evals/image note). Hyperparameters
    # are each method's reference-scale defaults: occlusion 32/16 -> 13x13
    # positions (192 padded forwards at chunk 64), RISE 1000 masks
    # (Petsiuk et al.'s N), Score-CAM 64 top channels.
    cases = [
        ("occlusion", dict(patch=32, stride=16), 32),
        ("rise", dict(rise_masks=1000, rise_grid=7, rise_keep_prob=0.5), 16),
        ("scorecam", dict(scorecam_channels=64), 32),
    ]
    for method, kw, n_imgs in cases:
        skw = dict(method=method, image_batch=16, normalize=norm, **kw)
        log(f"{method}: warm (compile)...")
        t0 = time.perf_counter()
        attribution_sweep(engine, u8_dataset(16, 1), seed=4, **skw)
        log(f"{method}: warm done in {time.perf_counter() - t0:.1f} s")
        rate, runs, ev = median_rate(lambda r: attribution_sweep(
            engine, u8_dataset(n_imgs, 11 + r), seed=5 + r, **skw))
        log(f"{method}: {rate:.1f} img/s median-of-3 "
            f"(runs {[f'{x:.1f}' for x in runs]}), "
            f"{ev:.0f} masked-forward evals/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
