"""Attribution-lane roofline: what binds the batched-IG backward (run on
a real v5e chip; recorded output: docs/profiles/attribution_profile.txt).

The masked-forward lane has a committed per-stage roofline
(profile_mfu.py: ~60% MFU IS the ceiling at B=4096). This is the
backward lane's counterpart, answering why `attribution_ig16_images_per_sec`
sits at ~15% MFU and which knob moves it. Three measurements:

  1. forward-only MFU vs flat batch — the IG program's effective
     concurrency is image_batch x step_batch (16x4 = 64 concurrent
     paths), nowhere near the 4096 the headline row tiles at; small
     batches under-fill the MXU on the 7x7/14x14 stages.
  2. forward+backward (input gradient) at the same flat batch — the
     backward's achieved efficiency relative to its 2x-forward FLOPs
     model (extra HBM traffic: it re-reads every saved activation).
  3. the REAL batched-IG program (gradient.attribute_batch,
     method=integrated, steps=16) across the (image_batch, step_batch)
     grid — img/s + MFU per config, i.e. the tuning table for the
     bench row's defaults.

Timing follows profile_mfu.py: every call syncs via a scalar host fetch
(block_until_ready can return at enqueue time through the tunnel), and
the measured dispatch+fetch overhead is subtracted.

Usage: PYTHONPATH=/root/repo python benchmarks/profile_attribution.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.saliency import gradient as gmod
from network_interpretation_imagenet_tpu.utils.compile_cache import (
    enable_compilation_cache,
)

PEAK = 197e12          # v5e bf16 TFLOP/s
FWD_FLOPS = 2 * 7.83e9  # ResNet-101 @224^2 forward (see bench.py)


def timeit(fn, *args, n=4):
    np.asarray(fn(*args))  # compile + sync
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    bundle = create_model("resnet101", "imagenet", dtype=jnp.bfloat16)
    variables = jax.device_put(bundle.init(rng))

    triv = jax.jit(lambda x: jnp.sum(x))
    overhead = timeit(triv, jnp.ones((8, 8)), n=6)
    print(f"tunnel dispatch+fetch overhead: {overhead*1e3:.1f} ms")

    # --- 1. forward-only MFU vs flat batch --------------------------------
    print(f"\n{'fwd batch':>9s} {'t-ov':>9s} {'MFU':>6s}")
    for b in (32, 64, 128, 512, 2048):
        x = jax.random.normal(rng, (b, 224, 224, 3), jnp.bfloat16)
        fn = jax.jit(lambda v, xx: jnp.sum(
            bundle.logits(v, xx).astype(jnp.float32)))
        t = timeit(fn, variables, x) - overhead
        print(f"{b:9d} {t*1e3:8.1f}m {b*FWD_FLOPS/t/PEAK*100:5.1f}%")
        del x

    # --- 2. forward+backward at the IG lane's flat batches ----------------
    # Input gradient of the summed target logit: FLOPs model = 3x forward
    # (fwd + ~2x-fwd backward). The gap vs the model is the backward's
    # extra HBM traffic (it re-reads every saved activation).
    def loss(v, xx):
        return jnp.sum(bundle.logits(v, xx).astype(jnp.float32)[:, 1])

    grad_fn = jax.jit(lambda v, xx: jnp.sum(jax.grad(
        lambda im: loss(v, im))(xx).astype(jnp.float32)))
    print(f"\n{'fwd+bwd b':>9s} {'t-ov':>9s} {'MFU(3x)':>8s}")
    for b in (32, 64, 128):
        x = jax.random.normal(rng, (b, 224, 224, 3), jnp.bfloat16)
        t = timeit(grad_fn, variables, x) - overhead
        print(f"{b:9d} {t*1e3:8.1f}m {3*b*FWD_FLOPS/t/PEAK*100:7.1f}%")
        del x

    # --- 3. the real batched-IG program across the tuning grid ------------
    print(f"\n{'imgs':>5s} {'step_b':>6s} {'flat':>5s} {'t-ov':>9s} "
          f"{'img/s':>7s} {'MFU':>6s}")
    imgs = np.asarray(
        jax.random.uniform(rng, (32, 224, 224, 3), jnp.float32))
    for n_img, step_b in ((16, 2), (16, 4), (16, 8), (8, 8), (32, 4)):
        def run(nb=n_img, sb=step_b):
            out = gmod.attribute_batch(
                bundle.logits, variables, imgs[:nb], [1] * nb,
                method="integrated", steps=16, step_batch=sb)
            return jnp.sum(out)

        t = timeit(run) - 2 * overhead  # attribute + sum fetch dispatches
        flops = n_img * 16 * 3 * FWD_FLOPS
        print(f"{n_img:5d} {step_b:6d} {n_img*step_b:5d} {t*1e3:8.1f}m "
              f"{n_img/t:7.1f} {flops/t/PEAK*100:5.1f}%")


if __name__ == "__main__":
    main()
