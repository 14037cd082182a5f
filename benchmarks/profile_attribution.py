"""Attribution-lane roofline: what binds the batched-IG backward (run on
a real v5e chip; recorded output: docs/profiles/attribution_profile.txt).

The masked-forward lane has a committed per-stage roofline
(profile_mfu.py: ~60% MFU IS the ceiling at B=4096). This is the
backward lane's counterpart. Headline findings (r4, committed output):

  * the IG-16 DEVICE PROGRAM runs at 59-75% MFU across the
    (image_batch, step_batch) grid — the same efficiency class as the
    masked-forward lane; the backward lane was never slow;
  * the right FLOPs model is fwd + 1x-fwd backward per step: jax.grad
    w.r.t. the IMAGE needs no weight cotangents, XLA dead-code-
    eliminates the dW einsums (measured bwd/fwd = 1.1-1.4x — a naive
    3x-forward model "shows" >100% MFU);
  * the END-TO-END sweep gap (bench's ~39 img/s vs ~240 img/s program)
    is the per-flush f32 heatmap READBACK (~200 KB/image) through the
    ~MB/s axon tunnel plus host row work — already overlapped by the
    depth-2 pipeline, but the fetch alone exceeds the device time. On a
    locally-attached TPU that readback is PCIe-speed noise.

Three measurements:

  1. forward-only MFU vs flat batch (amortized k-dispatch timing — a
     single small-batch call is faster than one tunnel round-trip);
  2. forward+backward (input gradient) at the same flat batch — the
     bwd/fwd ratio that pins the DCE'd-backward FLOPs model;
  3. the REAL batched-IG program (gradient.attribute_batch,
     method=integrated, steps=16) across the (image_batch, step_batch)
     grid with DEVICE-RESIDENT inputs — img/s + MFU per config, the
     tuning table for the bench row's defaults.

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


def timeit_amortized(fn, *args, k=8, n=3):
    """Per-call device time for calls SMALLER than the tunnel RTT: enqueue
    k async dispatches, sync once — the ~30 ms dispatch+fetch overhead
    amortizes over k instead of swamping (a naive single-call measurement
    of a 2 ms forward reads ~35 ms, and overhead subtraction goes
    negative)."""
    np.asarray(fn(*args))  # compile + sync
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(k - 1):
            fn(*args)  # async enqueue
        np.asarray(fn(*args))  # one sync at the tail
        ts.append(time.perf_counter() - t0)
    return min(ts) / k


def main():
    enable_compilation_cache()
    rng = jax.random.PRNGKey(0)
    bundle = create_model("resnet101", "imagenet", dtype=jnp.bfloat16)
    variables = jax.device_put(bundle.init(rng))

    triv = jax.jit(lambda x: jnp.sum(x))
    overhead = timeit(triv, jnp.ones((8, 8)), n=6)
    print(f"tunnel dispatch+fetch overhead: {overhead*1e3:.1f} ms")

    # --- 1. forward-only MFU vs flat batch --------------------------------
    # Amortized timing: small-batch forwards run FASTER than one tunnel
    # round-trip, so per-call time comes from k chained async dispatches.
    fwd_t = {}
    print(f"\n{'fwd batch':>9s} {'t/call':>9s} {'MFU':>6s}")
    for b in (32, 64, 128, 512, 2048):
        x = jax.random.normal(rng, (b, 224, 224, 3), jnp.bfloat16)
        fn = jax.jit(lambda v, xx: jnp.sum(
            bundle.logits(v, xx).astype(jnp.float32)))
        t = timeit_amortized(fn, variables, x, k=8 if b <= 512 else 4)
        fwd_t[b] = t
        print(f"{b:9d} {t*1e3:8.2f}m {b*FWD_FLOPS/t/PEAK*100:5.1f}%")
        del x

    # --- 2. forward+backward at the IG lane's flat batches ----------------
    # Input gradient of the summed target logit: FLOPs model = 2x forward.
    # jax.grad w.r.t. the IMAGE needs no weight cotangents — XLA
    # dead-code-eliminates the dW einsums — so the backward is ~1x forward
    # (each conv's input cotangent is one transposed conv, same MACs).
    # The bwd/fwd column measures that directly (expect 1.1-1.4x: the
    # backward re-reads relu masks/BN scales, a little extra HBM traffic).
    def loss(v, xx):
        return jnp.sum(bundle.logits(v, xx).astype(jnp.float32)[:, 1])

    grad_fn = jax.jit(lambda v, xx: jnp.sum(jax.grad(
        lambda im: loss(v, im))(xx).astype(jnp.float32)))
    print(f"\n{'fwd+bwd b':>9s} {'t/call':>9s} {'MFU(2x)':>8s} {'bwd/fwd':>8s}")
    for b in (32, 64, 128):
        x = jax.random.normal(rng, (b, 224, 224, 3), jnp.bfloat16)
        t = timeit_amortized(grad_fn, variables, x, k=8)
        ratio = (t - fwd_t[b]) / fwd_t[b]
        print(f"{b:9d} {t*1e3:8.2f}m {2*b*FWD_FLOPS/t/PEAK*100:7.1f}% "
              f"{ratio:7.2f}x")
        del x

    # --- 3. the real batched-IG program across the tuning grid ------------
    # Images are DEVICE-RESIDENT (device_put once per config) — the sweep's
    # flush path uploads each image once too, and re-uploading a 9.6 MB
    # batch per timed call turns this table into a tunnel-bandwidth
    # thermometer (two early runs disagreed 3× exactly this way).
    print(f"\n{'imgs':>5s} {'step_b':>6s} {'flat':>5s} {'t-ov':>9s} "
          f"{'img/s':>7s} {'MFU':>6s}")
    imgs_host = np.asarray(
        jax.random.uniform(rng, (32, 224, 224, 3), jnp.float32))
    for n_img, step_b in ((16, 2), (16, 4), (16, 8), (8, 8), (32, 4)):
        imgs = jax.device_put(jnp.asarray(imgs_host[:n_img]))
        tgts = jax.device_put(jnp.ones((n_img,), jnp.int32))

        def run(nb=n_img, sb=step_b, xi=imgs, ti=tgts):
            out = gmod.attribute_batch(
                bundle.logits, variables, xi, ti,
                method="integrated", steps=16, step_batch=sb)
            return jnp.sum(out)

        # Amortized like the ladders above: a fixed 2-RTT subtraction
        # overcorrects the short configs (showed a >100% MFU artifact).
        t = timeit_amortized(run, k=4)
        flops = n_img * 16 * 2 * FWD_FLOPS  # input-grad bwd: dW is DCE'd
        print(f"{n_img:5d} {step_b:6d} {n_img*step_b:5d} {t*1e3:8.1f}m "
              f"{n_img/t:7.1f} {flops/t/PEAK*100:5.1f}%")


if __name__ == "__main__":
    main()
