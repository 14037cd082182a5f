"""XRAI-lane roofline: the per-phase decomposition the IG lane got
(profile_attribution.py), applied to the slowest headline lane.

XRAI per image = one DEVICE program (2 baselines x ``steps`` signed-IG
path steps -> f32[H, W] attribution) + one WIRE fetch of that stack +
HOST work (5-scale felzenszwalb ladder + greedy region ranking). The
bench row (``xrai_sweep_images_per_sec``) only showed the end-to-end
number; this probe measures each phase so the 7%-MFU headline has a
ceiling argument instead of an assertion. Reference anchor: the
segmentation-driven saliency core of
``bayesian_active_learning_imagenet.py:150``.

FLOPs model: fwd + 1x-fwd backward per path step (input gradients need
no weight cotangents — XLA DCE's the dW einsums, measured
bwd/fwd = 1.1-1.4x in docs/profiles/attribution_profile.txt), so
XRAI-16 = 2 baselines x 16 steps x 2 x forward per image.

Measurements:
  1. the real batched device program (xrai.xrai_attribution_batch)
     across the (image_batch, step_batch) grid, device-resident inputs,
     amortized dispatch -> img/s + MFU;
  2. the wire: one [B, 224, 224] attribution-stack fetch through the
     axon tunnel at f32 vs f16 (the round-5 sign-preserving wire);
  3. the host half, per image: felzenszwalb_ladder (ONE edge
     build+radix-sort shared across the 5 scales) and
     greedy_region_ranking;
  4. end-to-end attribution_sweep at heatmap_wire f32 vs f16,
     median of 3.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/profile_xrai.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.saliency import xrai
from network_interpretation_imagenet_tpu.saliency.engine import SaliencyEngine
from network_interpretation_imagenet_tpu.saliency.sweep import attribution_sweep
from network_interpretation_imagenet_tpu.segment import felzenszwalb_ladder
from network_interpretation_imagenet_tpu.utils.compile_cache import (
    enable_compilation_cache,
)

PEAK = 197e12            # v5e bf16 TFLOP/s
FWD_FLOPS = 2 * 7.83e9   # ResNet-101 @224^2 forward (see bench.py)


def collage(seed):
    """Blocky synthetic image (bench.py's stand-in) — segments like a
    natural photo, unlike white noise (whose FH ladder degenerates)."""
    r = np.random.RandomState(seed)
    img = np.ones((224, 224, 3), np.float32) * r.rand(3)
    for _ in range(40):
        y, x = r.randint(0, 224, 2)
        h, w = r.randint(18, 75, 2)
        img[y:y + h, x:x + w] = r.rand(3)
    img += 0.03 * r.randn(224, 224, 3)
    return np.clip(img, 0, 1).astype(np.float32)


def timeit_amortized(fn, k=4, n=3):
    np.asarray(fn())  # compile + sync
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(k - 1):
            fn()  # async enqueue
        np.asarray(fn())  # one sync at the tail
        ts.append(time.perf_counter() - t0)
    return min(ts) / k


def main():
    enable_compilation_cache()
    print(f"devices: {jax.devices()}")
    bundle = create_model("resnet101", "imagenet", dtype=jnp.bfloat16)
    variables = jax.device_put(bundle.init(jax.random.PRNGKey(0)))
    steps = 16

    # --- 1. the batched signed-IG device program -------------------------
    print(f"\n{'imgs':>5s} {'step_b':>6s} {'t/call':>9s} {'img/s':>7s} "
          f"{'MFU':>6s}   (2 baselines x {steps} steps, fwd+1x-fwd bwd)")
    imgs_host = np.stack([collage(i) for i in range(16)])
    for n_img, step_b in ((8, 4), (8, 8), (16, 4), (16, 8)):
        imgs = jax.device_put(jnp.asarray(imgs_host[:n_img]))
        tgts = jax.device_put(jnp.ones((n_img,), jnp.int32))

        def run(xi=imgs, ti=tgts, sb=step_b):
            return jnp.sum(xrai.xrai_attribution_batch(
                bundle.logits, variables, xi, ti, steps=steps,
                step_batch=sb))

        t = timeit_amortized(run, k=4)
        flops = n_img * 2 * steps * 2 * FWD_FLOPS
        print(f"{n_img:5d} {step_b:6d} {t*1e3:8.1f}m {n_img/t:7.1f} "
              f"{flops/t/PEAK*100:5.1f}%")

    # --- 2. the wire: attribution-stack fetch, f32 vs f16 ----------------
    # The sweep fetches ONE [B, 224, 224] signed stack per flush; f16
    # halves the bytes and preserves sign (u8 min-max would not).
    print()
    for b in (8, 16):
        stack32 = jax.device_put(
            jnp.asarray(np.random.RandomState(0)
                        .randn(b, 224, 224).astype(np.float32)))
        stack16 = stack32.astype(jnp.float16)
        for name, st in (("f32", stack32), ("f16", stack16)):
            np.asarray(st)  # warm the fetch path
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(st)
                ts.append(time.perf_counter() - t0)
            mb = st.size * st.dtype.itemsize / 1e6
            print(f"fetch B={b:2d} {name}: {min(ts)*1e3:7.1f} ms "
                  f"({mb:.1f} MB, {mb/min(ts):.1f} MB/s)")

    # --- 3. the host half, per image -------------------------------------
    disps = [(collage(100 + i) * 255).astype(np.uint8) for i in range(8)]
    attrs = [np.random.RandomState(i).randn(224, 224).astype(np.float32)
             for i in range(8)]
    ladders = []
    t0 = time.perf_counter()
    for d in disps:
        ladders.append(felzenszwalb_ladder(d, xrai.DEFAULT_SCALES,
                                           sigma=0.5))
    t_ladder = (time.perf_counter() - t0) / len(disps)
    t0 = time.perf_counter()
    for a, lad in zip(attrs, ladders):
        xrai.greedy_region_ranking(a, lad)
    t_rank = (time.perf_counter() - t0) / len(attrs)
    print(f"\nhost/image: fh ladder {t_ladder*1e3:.1f} ms "
          f"({len(xrai.DEFAULT_SCALES)} scales, one edge build+sort), "
          f"greedy ranking {t_rank*1e3:.1f} ms")

    # --- 4. end-to-end sweep, f32 vs f16 wire ----------------------------
    engine = SaliencyEngine(bundle, variables)

    def ds(n, seed0):
        for i in range(n):
            yield (np.round(collage(seed0 * 100 + i) * 255)
                   .astype(np.uint8)), None, None

    from network_interpretation_imagenet_tpu.config import (
        IMAGENET_MEAN, IMAGENET_STD,
    )

    norm = (IMAGENET_MEAN, IMAGENET_STD)
    for wire in ("f32", "f16"):
        attribution_sweep(engine, ds(8, 41), method="xrai", image_batch=8,
                          steps=steps, step_batch=4, seed=6, normalize=norm,
                          heatmap_wire=wire)  # warm
        rates = []
        for r in range(3):
            t0 = time.perf_counter()
            res = attribution_sweep(engine, ds(16, 43 + r), method="xrai",
                                    image_batch=8, steps=steps, step_batch=4,
                                    seed=7 + r, normalize=norm,
                                    heatmap_wire=wire)
            rates.append(res.images_explained
                         / (time.perf_counter() - t0))
        print(f"sweep wire={wire}: {float(np.median(rates)):.1f} img/s "
              f"median-of-3 (runs {[f'{x:.1f}' for x in rates]})")


if __name__ == "__main__":
    main()
