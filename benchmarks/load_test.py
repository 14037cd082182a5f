"""Closed-loop serving load test: sustained RPS + latency under concurrency.

The burst probe in ``probe_serving.py`` measures one 16-way wave; this
drives SUSTAINED load — C client threads each issuing M back-to-back
``/explain`` requests through :class:`SaliencyClient` (dogfooding the
first-party client, including its 503 backoff path) — and reports
throughput and client-observed latency quantiles per (concurrency, mode).

Dynamic batching should win at C > 1 by amortizing the fused-loop cost
across coalesced groups; the serialized server is the baseline. Run on
the chip via ``run_onchip_backlog.sh`` (stage ``load_test``) or locally:

    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/load_test.py \
        [--platform cpu] [--concurrency 1,4,16] [--requests 32]
"""

import argparse
import os
import sys
import tempfile
import threading
import time

def _parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--concurrency", default="1,4,16")
    p.add_argument("--requests", type=int, default=32,
                   help="requests per client thread")
    p.add_argument("--wait-ms", type=float, default=8.0)
    p.add_argument("--max-group", type=int, default=None,
                   help="also measure dynamic batching with the group-size "
                        "cap (serving_http batch_max_group): bounds how "
                        "many requests one slow device call can stall")
    return p.parse_args()


# Parse (and pin the platform) ONLY when run as a script — this module
# must stay import-safe: its *_test.py name matches pytest's default
# collection glob, and a module-level parse_args() aborts bare `pytest`
# runs from the repo root with SystemExit(2) during collection.
args = None
if __name__ == "__main__":
    args = _parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from network_interpretation_imagenet_tpu import serving  # noqa: E402
from network_interpretation_imagenet_tpu.config import BOConfig  # noqa: E402
from network_interpretation_imagenet_tpu.models import create_model  # noqa: E402
from network_interpretation_imagenet_tpu.saliency import SaliencyEngine  # noqa: E402
from network_interpretation_imagenet_tpu.serving_client import (  # noqa: E402
    SaliencyClient,
)
from network_interpretation_imagenet_tpu.serving_http import (  # noqa: E402
    make_http_server,
)
from network_interpretation_imagenet_tpu.utils.compile_cache import (  # noqa: E402
    enable_compilation_cache,
)


def drive(art, dynamic, conc, n_req, wait_ms, max_group=None):
    httpd = make_http_server(art, "127.0.0.1", 0, dynamic_batch=dynamic,
                             batch_wait_ms=wait_ms,
                             batch_max_group=max_group)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    host, port = httpd.server_address[:2]
    try:
        httpd.service.warmup()
        rng = np.random.RandomState(0)
        img = rng.rand(28, 28, 1).astype(np.float32)
        seg = (np.arange(784).reshape(28, 28) % 10).astype(np.int32)
        lats, errs = [], []
        lock = threading.Lock()

        def worker(cid):
            client = SaliencyClient(host, port, retries=8, backoff_s=0.05)
            mine = []
            try:
                for i in range(n_req):
                    t0 = time.perf_counter()
                    client.explain(img, segments=seg, seed=cid * 1000 + i,
                                   target=2)
                    mine.append(time.perf_counter() - t0)
            except Exception as e:
                with lock:
                    errs.append(e)
            finally:
                client.close()
                with lock:
                    lats.extend(mine)

        threads = [threading.Thread(target=worker, args=(c,))
                   for c in range(conc)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        assert not errs, errs[:3]
        lat = np.asarray(lats) * 1e3
        stats = (dict(httpd.service._batcher.stats) if dynamic else {})
        # Device-section durations attribute any latency tail: a client
        # p95 that tracks slow DEVICE calls is tunnel/device weather
        # (amplified by coalescing — one slow call stalls its group);
        # a tail with fast device calls would be host-side queueing.
        return {
            "rps": len(lats) / wall,
            "p50_ms": float(np.percentile(lat, 50)),
            "p95_ms": float(np.percentile(lat, 95)),
            "batcher": stats,
            "device": httpd.service.device_call_stats(),
        }
    finally:
        httpd.shutdown()
        httpd.server_close()


def main():
    enable_compilation_cache()
    print("devices:", jax.devices())
    tmp = tempfile.mkdtemp(prefix="load_test_")
    bundle = create_model("mnist_cnn", "mnist")
    engine = SaliencyEngine(bundle, bundle.init(jax.random.PRNGKey(0)),
                            mask_batch=1024)
    art = os.path.join(tmp, "art")
    # A LADDER of image batches: explain_batch picks the smallest exported
    # batch >= group size, so small coalesced groups don't pad into the
    # 16-image program (a lone 16 would waste 4x compute on a 4-group).
    serving.export_bo_engine(engine, art, bo_cfg=BOConfig(),
                             candidate_buckets=(32,),
                             image_batches=(2, 4, 8, 16))
    print(f"artifact exported (buckets=32, image_batches=2/4/8/16); "
          f"{args.requests} req/client")
    for conc in [int(c) for c in args.concurrency.split(",")]:
        base = drive(art, False, conc, args.requests, args.wait_ms)
        dyn = drive(art, True, conc, args.requests, args.wait_ms)
        ratio = dyn["rps"] / base["rps"]
        print(f"C={conc:3d}  serialized {base['rps']:7.1f} rps "
              f"(p50 {base['p50_ms']:6.1f} ms, p95 {base['p95_ms']:6.1f})  "
              f"dynamic {dyn['rps']:7.1f} rps "
              f"(p50 {dyn['p50_ms']:6.1f}, p95 {dyn['p95_ms']:6.1f})  "
              f"{ratio:4.2f}x  "
              f"calls={dyn['batcher'].get('device_calls')}"
              f"/{dyn['batcher'].get('requests')} "
              f"maxgrp={dyn['batcher'].get('max_group')}",
              flush=True)
        print(f"       device-call ms: serialized {base['device']}  "
              f"dynamic {dyn['device']}", flush=True)
        if args.max_group:
            cap = drive(art, True, conc, args.requests, args.wait_ms,
                        max_group=args.max_group)
            print(f"       dyn-cap{args.max_group:3d} "
                  f"{cap['rps']:7.1f} rps "
                  f"(p50 {cap['p50_ms']:6.1f}, p95 {cap['p95_ms']:6.1f})  "
                  f"calls={cap['batcher'].get('device_calls')}"
                  f"/{cap['batcher'].get('requests')} "
                  f"maxgrp={cap['batcher'].get('max_group')}  "
                  f"device {cap['device']}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
