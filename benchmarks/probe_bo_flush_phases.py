"""Per-phase timing of one warm bo_saliency_sweep flush (16 images,
ResNet-101, SLIC-48, 3+10 budget): where do the ~1.2 s/flush go?

Phases: batched SLIC (dispatch+fetch of 16 segment maps), batched predict,
fused-BO dispatch (async — should be ~0), fused-BO collect (program wall +
ONE batched fetch + heatmap assembly), heatmap assembly alone (host twin).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.config import BOConfig, SegmentConfig
from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.saliency import bo_pipeline
from network_interpretation_imagenet_tpu.saliency.engine import SaliencyEngine
from network_interpretation_imagenet_tpu.saliency.sweep import segment_image_batch
from network_interpretation_imagenet_tpu.utils.compile_cache import (
    enable_compilation_cache,
)


def main():
    enable_compilation_cache()
    bundle = create_model("resnet101", "imagenet", dtype=jnp.bfloat16)
    engine = SaliencyEngine(bundle, bundle.init(jax.random.PRNGKey(0)),
                            mask_batch=1024)
    cfg = SegmentConfig(method="slic", n_segments=48, slic_iters=10)
    bo_cfg = BOConfig()
    r = np.random.RandomState(7)
    imgs = [r.rand(224, 224, 3).astype(np.float32) for _ in range(16)]
    disps = [(im * 255).astype(np.uint8) for im in imgs]

    def one_flush(tag):
        t = {}
        t0 = time.perf_counter()
        segs = [np.asarray(s, np.int32) for s in segment_image_batch(disps, cfg)]
        t["slic_batch"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        preds = engine.predict(np.stack(imgs)).argmax(axis=1)
        t["predict"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        collect = bo_pipeline.bo_window_saliency_multi_async(
            engine, imgs, segs, bo_cfg,
            per_image_seeds=list(range(16)),
            targets=[int(p) for p in preds],
        )
        t["bo_dispatch"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        results = collect()
        t["bo_collect"] = time.perf_counter() - t0
        total = sum(t.values())
        print(f"{tag}: total {total*1000:.0f} ms | " +
              " | ".join(f"{k} {v*1000:.0f} ms" for k, v in t.items()),
              flush=True)
        return results

    print("warming...", flush=True)
    one_flush("warm")
    for i in range(3):
        one_flush(f"run{i}")

    # Isolate the pieces inside collect: program wall vs fetch vs assembly.
    segs = [np.asarray(s, np.int32) for s in segment_image_batch(disps, cfg)]
    preds = engine.predict(np.stack(imgs)).argmax(axis=1)
    collect = bo_pipeline.bo_window_saliency_multi_async(
        engine, imgs, segs, bo_cfg, per_image_seeds=list(range(16)),
        targets=[int(p) for p in preds])
    results = collect()
    t0 = time.perf_counter()
    from network_interpretation_imagenet_tpu.saliency.bo_pipeline import (
        _assemble_output,
    )
    for i, (out, tr) in enumerate(results):
        s = int(segs[i].max()) + 1
        _assemble_output(segs[i], s, int(0.4 * s), int(preds[i]), tr)
    print(f"assembly alone (16 images, host): "
          f"{(time.perf_counter()-t0)*1000:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
