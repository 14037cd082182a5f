"""Benchmark: masked-forward evals/sec/chip, ResNet-101 @ 224² (BASELINE.md
north-star) + p50 per-image saliency latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

``vs_baseline`` is the speedup over the PyTorch-CPU reference style (batch-1
masked forwards, f32 — the reference evaluates one mask per forward,
``generate_gp_training_data_imagenet.py:221-246``), measured once on this
machine and cached in ``.bench_cpu_baseline.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".bench_cpu_baseline.json")

MASK_BATCH = 4096  # measured optimum (docs/PERFORMANCE.md ladder: 7.42k
MEASURE_MASKS = 4096  # evals/s at 4096 vs 7.0k at 2048 on v5e)
SALIENCY_MASKS = 100  # reference --num_mask_samples for ImageNet
SWEEP_IMAGES = 20

# MFU model: ResNet-101 @ 224² forward ≈ 7.83 GMACs = 15.66 GFLOPs/image
# (conv+fc, batch-1; torchvision-reported 7.8 GMACs). v5e bf16 peak =
# 197 TFLOP/s/chip.
RESNET101_FLOPS = 15.66e9
V5E_PEAK_FLOPS = 197e12
# Attribution-lane FLOPs: one IG path step = forward + INPUT-gradient
# backward. jax.grad w.r.t. the image needs no weight cotangents, so XLA
# dead-code-eliminates the dW einsums and the backward is ~1x forward
# (each conv's input cotangent is one transposed conv, same MACs;
# measured bwd/fwd = 1.1-1.4x, docs/profiles/attribution_profile.txt).
# IG-16 ≈ 16 x 2 x forward per image; XRAI doubles it (2 baselines).
IG16_FLOPS_PER_IMAGE = 16 * 2 * RESNET101_FLOPS
XRAI_FLOPS_PER_IMAGE = 2 * IG16_FLOPS_PER_IMAGE
# RISE (the method-comparison study's most-faithful AND fastest method,
# docs/METHOD_COMPARISON.md) is pure masked forwards: 1000 soft masks per
# image at Petsiuk et al.'s defaults — its natural ceiling is the
# masked-forward headline rate (7.5k evals/s ⇒ ~7.5 img/s).
RISE_MASKS = 1000
RISE_FLOPS_PER_IMAGE = RISE_MASKS * RESNET101_FLOPS


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cpu_reference_rate() -> float:
    """PyTorch-CPU ResNet-101, batch-1 masked forwards (reference style)."""
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            return json.load(f)["evals_per_sec"]
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class Bottleneck(nn.Module):
        def __init__(self, inp, planes, stride=1, downsample=False):
            super().__init__()
            self.conv1 = nn.Conv2d(inp, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.down = None
            if downsample:
                self.down = nn.Sequential(
                    nn.Conv2d(inp, planes * 4, 1, stride=stride, bias=False),
                    nn.BatchNorm2d(planes * 4),
                )

        def forward(self, x):
            idt = x if self.down is None else self.down(x)
            y = F.relu(self.bn1(self.conv1(x)))
            y = F.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return F.relu(y + idt)

    class ResNet101(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, padding=1)
            layers = []
            inp = 64
            for planes, blocks, stride in ((64, 3, 1), (128, 4, 2), (256, 23, 2), (512, 3, 2)):
                stage = [Bottleneck(inp, planes, stride, True)]
                inp = planes * 4
                stage += [Bottleneck(inp, planes) for _ in range(blocks - 1)]
                layers.append(nn.Sequential(*stage))
            self.layers = nn.Sequential(*layers)
            self.fc = nn.Linear(2048, 1000)

        def forward(self, x):
            x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
            x = self.layers(x)
            return self.fc(x.mean((2, 3)))

    torch.set_num_threads(os.cpu_count() or 8)
    model = ResNet101().eval()
    x = torch.rand(1, 3, 224, 224)
    with torch.no_grad():
        model(x)  # warmup
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            model(x * torch.randint(0, 2, (1, 1, 224, 224)).float())
        dt = time.perf_counter() - t0
    rate = n / dt
    with open(CACHE, "w") as f:
        json.dump({"evals_per_sec": rate, "threads": torch.get_num_threads()}, f)
    log(f"cpu baseline: {rate:.3f} evals/s ({torch.get_num_threads()} threads)")
    return rate


def tpu_rate_and_latency():
    import jax
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()  # repeat bench runs skip the cold compiles

    from network_interpretation_imagenet_tpu.models import create_model
    from network_interpretation_imagenet_tpu.ops import aggregate, masking, metrics
    from network_interpretation_imagenet_tpu.saliency import SaliencyEngine
    from network_interpretation_imagenet_tpu.segment import slic as slic_fn

    log(f"devices: {jax.devices()}")
    bundle = create_model("resnet101", "imagenet", dtype=jnp.bfloat16)
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=MASK_BATCH)

    rng = np.random.RandomState(0)
    image_np = rng.rand(224, 224, 3).astype(np.float32)
    disp = (image_np * 255).astype(np.uint8)

    # --- headline: masked-forward throughput ---------------------------
    segments_np = np.asarray(slic_fn(disp, n_segments=48, num_iters=10))
    # Device-resident image/segments: real pipelines reuse them across mask
    # batches; re-uploading per call costs ~8% through the axon tunnel.
    image = jnp.asarray(image_np)
    segments = jnp.asarray(segments_np)
    s = int(segments_np.max()) + 1
    width = max(1, int(0.4 * s))
    firsts = rng.randint(1, max(2, s - width), size=MEASURE_MASKS).astype(np.int32)

    t0 = time.perf_counter()
    engine.eval_window_masks(image, segments, firsts, width, target=1)
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        engine.eval_window_masks(image, segments, firsts, width, target=1)
        times.append(time.perf_counter() - t0)
    best = min(times)
    rate = MEASURE_MASKS / best
    log(f"tpu: {MEASURE_MASKS} masks in {best:.3f}s -> {rate:.0f} evals/s")

    # --- p50 per-image saliency latency --------------------------------
    # Full per-image pipeline exactly as a user runs it: host Felzenszwalb
    # segmentation + 100 masked forwards + host heatmap aggregation +
    # bbox/IOU (the library path, pipeline.random_window_saliency).
    from network_interpretation_imagenet_tpu.saliency import pipeline
    from network_interpretation_imagenet_tpu.segment import felzenszwalb

    def collage(seed):
        r = np.random.RandomState(seed)
        img = np.ones((224, 224, 3), np.float32) * r.rand(3)
        for _ in range(40):
            y, x = r.randint(0, 224, 2)
            h, w = r.randint(18, 75, 2)
            img[y:y+h, x:x+w] = r.rand(3)
        img += 0.03 * r.randn(224, 224, 3)
        return np.clip(img, 0, 1).astype(np.float32)

    def one_image(seed):
        img = collage(seed)
        seg = felzenszwalb((img * 255).astype(np.uint8), scale=100.0,
                           sigma=0.5, min_size=50)
        out = pipeline.random_window_saliency(
            engine, img, seg, num_samples=SALIENCY_MASKS, seed=seed, target=1
        )
        pipeline.localization_score(out.heatmap, [60, 50, 120, 130])
        return out.heatmap

    # Warm the 100-mask shape AND the dispatch path: the first few calls
    # after a compile carry extra tunnel/dispatch overhead (measured runs
    # decay 230→170 ms over ~5 calls), so one warm call under-reports.
    for w in range(3):
        one_image(100 + w)
    lats = []
    for i in range(7):
        t0 = time.perf_counter()
        one_image(200 + i)
        lats.append(time.perf_counter() - t0)
    p50 = float(np.median(lats))
    log(f"saliency p50 latency: {p50*1000:.0f} ms (runs: {[f'{x:.3f}' for x in lats]})")

    # --- pipelined val-sweep throughput ---------------------------------
    # 20 images through the depth-2 dispatch/collect pipeline (host
    # segmentation overlaps device forwards); reuses the B=2048 executable.
    from network_interpretation_imagenet_tpu.config import SegmentConfig
    from network_interpretation_imagenet_tpu.saliency.sweep import saliency_sweep

    def sweep_dataset(n, seed0):
        for i in range(n):
            yield collage(seed0 * 1000 + i), None, None

    seg_cfg = SegmentConfig(method="felzenszwalb", scale=100.0, sigma=0.5,
                            min_size=50)
    saliency_sweep(engine, sweep_dataset(2, 7), seg_cfg,
                   num_mask_samples=MASK_BATCH, seed=0)  # warm (reuses the
    # B=4096 executable — no extra compile)
    sweep_res = saliency_sweep(engine, sweep_dataset(SWEEP_IMAGES, 11),
                               seg_cfg, num_mask_samples=MASK_BATCH, seed=1)
    log(f"sweep: {SWEEP_IMAGES} images -> {sweep_res.evals_per_sec:.0f} evals/s")

    # --- knockout-mode sweep (reference MNIST/CIFAR mask family, r3) -----
    # Same engine/shape as the window sweep so the comparison is direct;
    # the reference's 1000-mask workload rides the same executables.
    saliency_sweep(engine, sweep_dataset(2, 13), seg_cfg,
                   num_mask_samples=MASK_BATCH, seed=0, mode="knockout")  # warm
    ko_res = saliency_sweep(engine, sweep_dataset(SWEEP_IMAGES, 17), seg_cfg,
                            num_mask_samples=MASK_BATCH, seed=1,
                            mode="knockout")
    log(f"knockout sweep: {SWEEP_IMAGES} images -> "
        f"{ko_res.evals_per_sec:.0f} evals/s")

    # --- DenseNet ImageNet sweep (BASELINE config 5's model family) ------
    dn_bundle = create_model("densenet121", "imagenet", dtype=jnp.bfloat16)
    dn_engine = SaliencyEngine(
        dn_bundle, dn_bundle.init(jax.random.PRNGKey(1)), mask_batch=1024
    )
    log("densenet121: warm sweep (cold compile can take minutes)...")
    saliency_sweep(dn_engine, sweep_dataset(2, 23), seg_cfg,
                   num_mask_samples=1024, seed=0)  # warm
    dn_res = saliency_sweep(dn_engine, sweep_dataset(10, 29), seg_cfg,
                            num_mask_samples=1024, seed=1)
    log(f"densenet121 sweep: {dn_res.evals_per_sec:.0f} evals/s")

    # --- fused-BO p50 latency (flagship reference path) ------------------
    # 10 images with varying segment counts; pow-2 candidate buckets mean
    # ONE compile, then sub-second active-learning loops.
    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.saliency import bo_pipeline

    bo_cfg = BOConfig()  # reference budget: 3 pre + 10 iters
    bo_lats = []
    for i in range(10):
        r = np.random.RandomState(300 + i)
        img = r.rand(224, 224, 3).astype(np.float32)
        # ONE static n_segments (shared with the headline's SLIC executable)
        # and ONE pow-2 candidate bucket: upper = int(0.6·S) must stay ≤ 31
        # (next_pow2 → 32) — a second bucket would land a multi-second
        # compile inside the measured runs. Cross-image no-recompile at
        # VARYING S is pinned by tests/test_bo.py instead.
        seg = np.asarray(
            slic_fn((img * 255).astype(np.uint8), n_segments=48, num_iters=10)
        )
        s = int(seg.max()) + 1
        assert int(0.6 * s) <= 31, s
        t0 = time.perf_counter()
        bo_pipeline.bo_window_saliency(engine, img, seg, bo_cfg, seed=i, target=1)
        bo_lats.append(time.perf_counter() - t0)
    bo_p50 = float(np.median(bo_lats[1:]))  # drop the compile run
    log(f"fused-BO p50 latency: {bo_p50*1000:.0f} ms "
        f"(first/compile: {bo_lats[0]:.1f}s)")

    # --- image-batched fused BO (vmapped loops, TPU-first extension) ------
    r = np.random.RandomState(500)
    bo_imgs, bo_segs = [], []
    for i in range(16):
        img = r.rand(224, 224, 3).astype(np.float32)
        bo_imgs.append(img)
        bo_segs.append(np.asarray(
            slic_fn((img * 255).astype(np.uint8), n_segments=48, num_iters=10)
        ))
    log("batched fused-BO: warming (one vmapped compile)...")
    bo_pipeline.bo_window_saliency_multi(
        engine, bo_imgs, bo_segs, bo_cfg, seed=0, targets=[1] * 16)  # warm
    t0 = time.perf_counter()
    bo_pipeline.bo_window_saliency_multi(
        engine, bo_imgs, bo_segs, bo_cfg, seed=1, targets=[1] * 16)
    bo_batched_ms = (time.perf_counter() - t0) / 16 * 1000
    log(f"batched fused-BO: {bo_batched_ms:.0f} ms/image (N=16 vmapped loops)")

    # --- flagship BO val-set sweep (bo_saliency_sweep) -------------------
    # SLIC keeps S (and therefore the candidate bucket) fixed, so this
    # reuses the batched-BO executable compiled just above — no new compile.
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        bo_saliency_sweep,
    )

    # Both batched-flush lanes ride the uint8 wire (round 4): datasets
    # yield raw u8 — the form JPEG decode produces — uploaded at 1/4 the
    # f32 bytes and /255+normalized ON DEVICE. With deferred predict +
    # native CC + the u8 segment wire this lifted the lanes 2-3x over r3
    # on these transfer-bound paths (docs/PERFORMANCE.md round-4 ladder).
    from network_interpretation_imagenet_tpu.config import (
        IMAGENET_MEAN, IMAGENET_STD,
    )

    NORM = (IMAGENET_MEAN, IMAGENET_STD)

    def bo_sweep_dataset(n, seed0):
        r2 = np.random.RandomState(seed0)
        for _ in range(n):
            yield r2.randint(0, 256, (224, 224, 3)).astype(np.uint8), \
                None, None

    slic_cfg = SegmentConfig(method="slic", n_segments=48, slic_iters=10)
    bo_saliency_sweep(engine, bo_sweep_dataset(16, 61), slic_cfg,
                      bo_cfg=bo_cfg, image_batch=16, seed=2,
                      normalize=NORM)  # warm
    # 3 flushes per run: exercises the depth-2 flush pipeline +
    # device-resident uploads (a single flush can't overlap anything).
    # MEDIAN OF 3 runs: BO-sweep throughput rides the axon tunnel RTT
    # (±25% run-to-run, docs/PERFORMANCE.md), so a single-run number made
    # BENCH_rN variance reflect tunnel weather instead of code.
    bo_sweep_runs = [
        bo_saliency_sweep(
            engine, bo_sweep_dataset(48, 77 + 2 * r), slic_cfg, bo_cfg=bo_cfg,
            image_batch=16, seed=3 + r, normalize=NORM,
        )
        for r in range(3)
    ]
    bo_sweep_rate = float(np.median(
        [res.evals_per_sec for res in bo_sweep_runs]))
    bo_budget = bo_cfg.n_pre_samples + bo_cfg.n_iters
    log(f"bo sweep (warm, median of 3): "
        f"{bo_sweep_runs[0].images_explained} images/run, "
        f"{bo_sweep_rate:.1f} BO evals/s "
        f"({bo_sweep_rate / bo_budget:.1f} img/s; runs: "
        f"{[f'{res.evals_per_sec:.1f}' for res in bo_sweep_runs]})")

    # --- batched attribution sweep (vmapped IG backwards, r3) -------------
    # Integrated gradients on the headline ResNet-101: 16 images × 16 path
    # steps per flush = 256 forward+backwards in ONE program — the backward
    # twin of the masked-forward grid.
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        attribution_sweep,
    )

    # step_batch=4 bounds live activations at 16·4=64 concurrent ResNet-101
    # backwards (exact scan accumulation) — 256 at once flirts with the
    # 16 GB HBM ceiling. Median of 3 (tunnel-RTT smoothing, same rationale
    # as the BO sweep row).
    attribution_sweep(engine, bo_sweep_dataset(16, 91), method="integrated",
                      image_batch=16, steps=16, step_batch=4, seed=4,
                      normalize=NORM)  # warm
    attr_rates = []
    for r in range(3):
        t0 = time.perf_counter()
        attr_res = attribution_sweep(engine, bo_sweep_dataset(32, 93 + 2 * r),
                                     method="integrated", image_batch=16,
                                     steps=16, step_batch=4, seed=5 + r,
                                     normalize=NORM)
        attr_rates.append(
            attr_res.images_explained / (time.perf_counter() - t0))
    attr_img_s = float(np.median(attr_rates))
    log(f"attribution sweep (IG-16, warm, median of 3): "
        f"{attr_res.images_explained} images/run -> {attr_img_s:.1f} img/s "
        f"(runs: {[f'{x:.1f}' for x in attr_rates]})")

    # --- RISE sweep (the study's default-recommendation method) ----------
    # 1000 soft-masked forwards per image as ONE lax.map program per
    # 16-image flush (mask chunk 250 — part of RISE's RNG stream, a method
    # hyperparameter, not a tuning knob). Pure masked forwards: compare
    # directly against the 7.5k evals/s masked-forward headline.
    attribution_sweep(engine, bo_sweep_dataset(8, 51), method="rise",
                      image_batch=8, seed=8, normalize=NORM)  # warm
    rise_rates = []
    for r in range(3):
        t0 = time.perf_counter()
        rise_res = attribution_sweep(engine, bo_sweep_dataset(16, 53 + r),
                                     method="rise", image_batch=8,
                                     seed=9 + r, normalize=NORM)
        rise_rates.append(
            rise_res.images_explained / (time.perf_counter() - t0))
    rise_img_s = float(np.median(rise_rates))
    log(f"rise sweep (1000 masks/img, median of 3): "
        f"{rise_res.images_explained} images/run -> {rise_img_s:.1f} img/s "
        f"= {rise_img_s * RISE_MASKS:.0f} masked-forward evals/s "
        f"(runs: {[f'{x:.1f}' for x in rise_rates]})")

    # --- XRAI sweep (signed multi-baseline IG flushes + host ranking) -----
    # 2 baselines × 16 steps = 32 backwards/image on device; the greedy
    # felzenszwalb-ladder ranking overlaps as host work at collect. Collage
    # images (not white noise) so the 5-scale ladder segments realistically.
    def xrai_sweep_dataset(n, seed0):
        # u8 wire: the raw collage bytes double as the felzenszwalb-ladder
        # display (exactly what a JPEG pipeline hands xrai).
        for i in range(n):
            yield (np.round(collage(seed0 * 100 + i) * 255)
                   .astype(np.uint8)), None, None

    attribution_sweep(engine, xrai_sweep_dataset(8, 41), method="xrai",
                      image_batch=8, steps=16, step_batch=4, seed=6,
                      normalize=NORM)  # warm
    xrai_rates = []
    for r in range(3):
        t0 = time.perf_counter()
        xrai_res = attribution_sweep(engine, xrai_sweep_dataset(16, 43 + r),
                                     method="xrai", image_batch=8,
                                     steps=16, step_batch=4, seed=7 + r,
                                     normalize=NORM)
        xrai_rates.append(
            xrai_res.images_explained / (time.perf_counter() - t0))
    xrai_img_s = float(np.median(xrai_rates))
    log(f"xrai sweep (2x IG-16 + ranking, median of 3): "
        f"{xrai_res.images_explained} images/run -> {xrai_img_s:.1f} img/s "
        f"(runs: {[f'{x:.1f}' for x in xrai_rates]})")
    return (rate, p50, sweep_res.evals_per_sec, bo_p50,
            dn_res.evals_per_sec, bo_batched_ms, bo_sweep_rate,
            ko_res.evals_per_sec, attr_img_s, xrai_img_s, rise_img_s)


def tpu_reachable(timeout_s: float = 240.0) -> bool:
    """Bounded tunnel probe. ``import jax`` HANGS (not errors) while the
    axon tunnel is down, so probing must happen in a killable subprocess —
    otherwise a dead tunnel turns the whole bench into a silent hang and
    the round records nothing at all."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return "tpu" in r.stdout
    except Exception:
        return False


def main():
    if not tpu_reachable():
        log("TPU tunnel unreachable — emitting explicit outage record")
        print(json.dumps({
            "metric": "masked_forward_evals_per_sec_chip_resnet101_224",
            "value": 0,
            "unit": "evals/s",
            "vs_baseline": 0,
            "extra": {
                "error": "axon TPU tunnel unreachable at bench time "
                         "(import jax hangs); no fresh on-chip measurement "
                         "possible. Staged rerun: "
                         "benchmarks/run_onchip_backlog.sh executes the "
                         "full bench + probes the moment the tunnel "
                         "answers. Last real-chip measurement: "
                         "BENCH_r02.json (7487.1 evals/s, 1450x baseline).",
            },
        }))
        return
    cpu_rate = cpu_reference_rate()
    (rate, p50, sweep_rate, bo_p50, dn_rate,
     bo_batched_ms, bo_sweep_rate, ko_rate,
     attr_img_s, xrai_img_s, rise_img_s) = tpu_rate_and_latency()
    print(
        json.dumps(
            {
                "metric": "masked_forward_evals_per_sec_chip_resnet101_224",
                "value": round(rate, 1),
                "unit": "evals/s",
                "vs_baseline": round(rate / cpu_rate, 1),
                "extra": {
                    "cpu_baseline_evals_per_sec": round(cpu_rate, 3),
                    "p50_saliency_latency_ms": round(p50 * 1000, 1),
                    "sweep_evals_per_sec": round(sweep_rate, 1),
                    "bo_p50_latency_ms": round(bo_p50 * 1000, 1),
                    "densenet121_sweep_evals_per_sec": round(dn_rate, 1),
                    "bo_batched_ms_per_image": round(bo_batched_ms, 1),
                    "bo_sweep_evals_per_sec": round(bo_sweep_rate, 1),
                    "knockout_sweep_evals_per_sec": round(ko_rate, 1),
                    "attribution_ig16_images_per_sec": round(attr_img_s, 1),
                    # Context for the attribution lane (VERDICT r3): MFU of
                    # the backward-heavy IG program, same peak-FLOPs model
                    # as the headline row.
                    "attribution_ig16_mfu_pct": round(
                        attr_img_s * IG16_FLOPS_PER_IMAGE
                        / V5E_PEAK_FLOPS * 100, 1),
                    "xrai_sweep_images_per_sec": round(xrai_img_s, 1),
                    "xrai_mfu_pct": round(
                        xrai_img_s * XRAI_FLOPS_PER_IMAGE
                        / V5E_PEAK_FLOPS * 100, 1),
                    # RISE: the method study's recommended default. Its
                    # masked-forward rate (img/s x 1000 masks) reads
                    # directly against the headline evals/s row.
                    "rise_sweep_images_per_sec": round(rise_img_s, 1),
                    "rise_masked_forward_evals_per_sec": round(
                        rise_img_s * RISE_MASKS, 1),
                    "rise_mfu_pct": round(
                        rise_img_s * RISE_FLOPS_PER_IMAGE
                        / V5E_PEAK_FLOPS * 100, 1),
                    "mfu_pct": round(rate * RESNET101_FLOPS / V5E_PEAK_FLOPS * 100, 1),
                    "mask_batch": MASK_BATCH,
                    "dtype": "bfloat16",
                    # BO/attribution/XRAI sweep rows ride the uint8 wire
                    # (raw-u8 uploads + on-device normalize, round 4).
                    "sweep_wire": "uint8",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
