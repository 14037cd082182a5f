"""Post-uint8-wire per-phase timing of one warm flush for BOTH batched
sweep lanes (attribution IG-16 and fused-BO; ResNet-101, 16 images) —
where does the remaining wall go now that uploads are 4x smaller?

Phases measured per flush (median of 5 warm flushes):
- upload:      device_put(u8 stack) + on-device /255+normalize, blocked
- predict:     batched forward + argmax + HOST FETCH (the keep/target sync)
- slic:        (BO lane) device display derive + slic_batch + segs fetch
- dispatch:    async program dispatch (should be ~0)
- program:     block_until_ready on the result (device wall)
- fetch:       device->host result fetch (heatmaps / attr stacks)
- [bo] rank:   heatmap assembly + trace handling at collect

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/probe_flush_phases_u8.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.config import (
        IMAGENET_MEAN, IMAGENET_STD, BOConfig, SegmentConfig,
    )
    from network_interpretation_imagenet_tpu.models import create_model
    from network_interpretation_imagenet_tpu.ops import aggregate
    from network_interpretation_imagenet_tpu.saliency import (
        bo_pipeline, gradient as gmod,
    )
    from network_interpretation_imagenet_tpu.saliency.engine import (
        SaliencyEngine,
    )
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        _u8_normalize_device, segment_image_batch,
    )
    from network_interpretation_imagenet_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    bundle = create_model("resnet101", "imagenet", dtype=jnp.bfloat16)
    engine = SaliencyEngine(bundle, bundle.init(jax.random.PRNGKey(0)),
                            mask_batch=1024)
    norm = (IMAGENET_MEAN, IMAGENET_STD)
    r = np.random.RandomState(7)
    u8s = np.stack([r.randint(0, 256, (224, 224, 3)).astype(np.uint8)
                    for _ in range(16)])

    def attr_flush():
        t = {}
        t0 = time.perf_counter()
        imgs_dev = _u8_normalize_device(jax.device_put(u8s), norm)
        imgs_dev.block_until_ready()
        t["upload"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        preds = engine.predict(imgs_dev).argmax(axis=1)
        targets = np.asarray(preds, np.int32)
        t["predict"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        state = gmod.attribute_batch(
            engine.bundle.logits, engine.variables, imgs_dev, targets,
            "integrated", bundle=engine.bundle, steps=16, step_batch=4)
        t["dispatch"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(state)
        t["program"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        heats = np.asarray(state)
        t["fetch"] = time.perf_counter() - t0
        assert heats.shape == (16, 224, 224)
        return t

    cfg = SegmentConfig(method="slic", n_segments=48, slic_iters=10)
    bo_cfg = BOConfig()

    def bo_flush():
        t = {}
        t0 = time.perf_counter()
        imgs_dev = _u8_normalize_device(jax.device_put(u8s), norm)
        imgs_dev.block_until_ready()
        t["upload"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        preds = engine.predict(imgs_dev).argmax(axis=1)
        targets = [int(p) for p in preds]
        t["predict"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        disp_dev = aggregate.normalize_to_uint8_batch(imgs_dev)
        segs = [np.asarray(s, np.int32)
                for s in segment_image_batch(disp_dev, cfg)]
        t["slic"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        collect = bo_pipeline.bo_window_saliency_multi_async(
            engine, imgs_dev, segs, bo_cfg,
            per_image_seeds=list(range(16)), targets=targets)
        t["dispatch"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = collect()
        t["collect"] = time.perf_counter() - t0
        assert len(outs) == 16
        return t

    for name, flush in (("attribution IG-16", attr_flush),
                        ("fused-BO 3+10", bo_flush)):
        flush()  # warm (compile)
        flush()
        rows = [flush() for _ in range(5)]
        med = {k: float(np.median([row[k] for row in rows]))
               for k in rows[0]}
        total = sum(med.values())
        print(f"\n{name} flush (16 images, median of 5, warm):", flush=True)
        for k, v in med.items():
            print(f"  {k:>9}: {v * 1000:7.1f} ms  ({v / total * 100:4.1f}%)")
        print(f"  {'TOTAL':>9}: {total * 1000:7.1f} ms "
              f"-> {16 / total:.1f} img/s (sync upper bound; the sweep "
              "overlaps collect with the next flush)", flush=True)


if __name__ == "__main__":
    main()
