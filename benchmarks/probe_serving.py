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

        # --- HTTP dynamic batching: 16 concurrent /explain ----------------
        # Serialized baseline vs --dynamic-batch coalescing into ONE
        # image-batched device call (cli.serve flags; r3d session drive).
        import base64
        import http.client
        import json as _json
        import threading

        from network_interpretation_imagenet_tpu.serving_http import (
            make_http_server,
        )

        def _b64(a):
            return base64.b64encode(np.ascontiguousarray(a).tobytes()).decode()

        def _drive_http(dynamic):
            httpd = make_http_server(bo_dir, "127.0.0.1", 0,
                                     dynamic_batch=dynamic,
                                     batch_wait_ms=8.0)
            th = threading.Thread(target=httpd.serve_forever, daemon=True)
            th.start()
            host, port = httpd.server_address[:2]
            try:
                httpd.service.warmup()

                def fire(i, out):
                    c = http.client.HTTPConnection(host, port, timeout=600)
                    body = {"image_b64": _b64(imgs[i]),
                            "image_shape": [28, 28, 1],
                            "segments_b64": _b64(segs[i]),
                            "segments_shape": [28, 28],
                            "seed": 3 + i, "target": 5}
                    c.request("POST", "/explain", _json.dumps(body))
                    out[i] = c.getresponse().status

                def once():
                    codes = [0] * 16
                    ts = [threading.Thread(target=fire, args=(i, codes))
                          for i in range(16)]
                    for t in ts:
                        t.start()
                    for t in ts:
                        t.join()
                    assert all(c == 200 for c in codes), codes

                once()  # warm the chosen path
                med, best = _median_ms(once, reps=5)
                stats = (dict(httpd.service._batcher.stats)
                         if dynamic else None)
                return med, best, stats
            finally:
                httpd.shutdown()
                httpd.server_close()

        med_s, best_s, _ = _drive_http(dynamic=False)
        print(f"HTTP 16 concurrent /explain, serialized: median {med_s:.0f} ms "
              f"({med_s / 16:.1f} ms/image)")
        med_d, best_d, stats = _drive_http(dynamic=True)
        print(f"HTTP 16 concurrent /explain, dynamic-batch: median "
              f"{med_d:.0f} ms ({med_d / 16:.1f} ms/image, "
              f"{med_s / med_d:.2f}x) stats={stats}")

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
