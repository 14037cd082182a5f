"""HTTP serving endpoint (serving_http.py): JSON wire format, parity with
the underlying exported servers, error paths."""

import base64
import json
import threading
from http.client import HTTPConnection

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from network_interpretation_imagenet_tpu import serving
from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.saliency import SaliencyEngine
from network_interpretation_imagenet_tpu.serving_http import make_http_server


def _engine():
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    return SaliencyEngine(bundle, variables, mask_batch=16,
                          compute_dtype=jnp.float32)


def _b64(arr):
    return base64.b64encode(np.ascontiguousarray(arr).tobytes()).decode()


def _post(conn, path, body):
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    return r.status, json.loads(r.read())


@pytest.fixture
def http_engine_server(tmp_path):
    engine = _engine()
    path = str(tmp_path / "artifact")
    serving.export_engine(engine, path, batch_sizes=(16, 4))
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield engine, httpd
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_explain_matches_direct_service(http_engine_server, rng):
    engine, httpd = http_engine_server
    host, port = httpd.server_address[:2]
    image = rng.rand(28, 28, 1).astype(np.float32)
    segments = (np.arange(784).reshape(28, 28) % 8).astype(np.int32)

    conn = HTTPConnection(host, port)
    conn.request("GET", "/healthz")
    health = json.loads(conn.getresponse().read())
    assert health["status"] == "ok" and health["kind"] == "engine"

    body = {
        "image_b64": _b64(image), "image_shape": [28, 28, 1],
        "segments_b64": _b64(segments), "segments_shape": [28, 28],
        "num_samples": 12, "seed": 3,
    }
    status, resp = _post(conn, "/explain", body)
    assert status == 200
    heat = np.frombuffer(
        base64.b64decode(resp["heatmap_b64"]), np.float32
    ).reshape(resp["heatmap_shape"])
    assert heat.shape == (28, 28)
    assert resp["num_segments"] == 8
    assert 0.0 <= resp["survival"] <= 1.0

    # Deterministic: a repeat request returns the identical heatmap.
    status2, resp2 = _post(conn, "/explain", body)
    assert status2 == 200 and resp2["heatmap_b64"] == resp["heatmap_b64"]

    # Parity with the live engine fed the SAME host-sampled windows (the
    # service uses the sweep's host PRNG twin + host heatmap twin).
    from network_interpretation_imagenet_tpu.ops.aggregate import (
        summed_superpixel_labels_np,
    )
    from network_interpretation_imagenet_tpu.ops.masking import (
        sample_window_starts_host,
    )

    width = int(0.4 * 8)
    firsts = sample_window_starts_host(3, 12, 8, width)
    ref = engine.eval_window_masks(image, segments, firsts, width,
                                   resp["target"])
    heat_ref = summed_superpixel_labels_np(segments, firsts, width,
                                           np.asarray(ref.survived))
    np.testing.assert_allclose(heat, heat_ref, atol=1e-5)


def test_http_explain_segments_server_side(http_engine_server, rng):
    """Omitting 'segments' segments on the server with the request's (or
    default) SegmentConfig."""
    _, httpd = http_engine_server
    host, port = httpd.server_address[:2]
    # Structured image (noise merges into ONE Felzenszwalb segment).
    image = np.full((28, 28, 1), 0.1, np.float32)
    image[:, 14:] = 0.9
    image[8:14, 4:10] = 0.5
    conn = HTTPConnection(host, port)
    status, resp = _post(conn, "/explain", {
        "image_b64": _b64(image), "image_shape": [28, 28, 1],
        "num_samples": 8,
        "segment": {"method": "felzenszwalb", "scale": 10.0, "min_size": 5},
    })
    assert status == 200
    assert resp["num_segments"] >= 2


def test_http_eval_windows_and_errors(http_engine_server, rng):
    engine, httpd = http_engine_server
    host, port = httpd.server_address[:2]
    image = rng.rand(28, 28, 1).astype(np.float32)
    segments = (np.arange(784).reshape(28, 28) % 8).astype(np.int32)
    firsts = np.array([0, 2, 5], np.int32)
    target, _ = engine.predict_one(image)

    conn = HTTPConnection(host, port)
    status, resp = _post(conn, "/eval_windows", {
        "image": image.tolist(), "segments": segments.tolist(),
        "firsts": firsts.tolist(), "width": 3, "target": int(target),
    })
    assert status == 200
    ref = engine.eval_window_masks(image, segments, firsts, 3, int(target))
    assert resp["survived"] == [bool(v) for v in ref.survived]
    np.testing.assert_allclose(resp["prob_target"],
                               np.asarray(ref.prob_target), atol=1e-5)

    status, resp = _post(conn, "/explain", {"seed": 1})  # no image
    assert status == 400 and "image" in resp["error"]
    conn.request("GET", "/nope")
    assert conn.getresponse().status == 404


def test_http_bo_artifact_explain(tmp_path, rng):
    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.saliency import bo_pipeline

    engine = _engine()
    cfg = BOConfig(n_iters=3, n_pre_samples=2)
    image = rng.rand(28, 28, 1).astype(np.float32)
    segments = (np.arange(784).reshape(28, 28) % 10).astype(np.int32)
    path = str(tmp_path / "bo_artifact")
    serving.export_bo_engine(engine, path, bo_cfg=cfg,
                             candidate_buckets=(7,))

    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        conn = HTTPConnection(host, port)
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["kind"] == "bo"
        status, resp = _post(conn, "/explain", {
            "image_b64": _b64(image), "image_shape": [28, 28, 1],
            "segments_b64": _b64(segments), "segments_shape": [28, 28],
            "seed": 4, "target": 7,
        })
        assert status == 200
        out_ref, trace_ref = bo_pipeline.bo_window_saliency(
            engine, image, segments, cfg, seed=4, target=7, fused=True
        )
        assert resp["xp"] == [int(x) for x in trace_ref.xp]
        heat = np.frombuffer(
            base64.b64decode(resp["heatmap_b64"]), np.float32
        ).reshape(resp["heatmap_shape"])
        np.testing.assert_allclose(heat, out_ref.heatmap, atol=1e-5)
        assert resp["best_start"] == int(trace_ref.xp[np.argmax(trace_ref.yp)])

        # /eval_windows is an engine-artifact endpoint
        status, resp = _post(conn, "/eval_windows", {})
        assert status == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_concurrent_explains_serialize_correctly(http_engine_server, rng):
    """Parallel /explain requests must not corrupt each other (device calls
    serialize behind the service lock; the HTTP layer is threaded)."""
    from concurrent.futures import ThreadPoolExecutor

    _, httpd = http_engine_server
    host, port = httpd.server_address[:2]
    image = rng.rand(28, 28, 1).astype(np.float32)
    segments = (np.arange(784).reshape(28, 28) % 8).astype(np.int32)

    def call(seed):
        conn = HTTPConnection(host, port)
        status, resp = _post(conn, "/explain", {
            "image_b64": _b64(image), "image_shape": [28, 28, 1],
            "segments_b64": _b64(segments), "segments_shape": [28, 28],
            "num_samples": 10, "seed": seed,
        })
        assert status == 200
        return resp["heatmap_b64"]

    with ThreadPoolExecutor(max_workers=4) as pool:
        parallel = list(pool.map(call, [1, 2, 3, 1, 2, 3]))
    serial = [call(s) for s in (1, 2, 3)]
    # Same seed → same heatmap, regardless of concurrency.
    assert parallel[0] == parallel[3] == serial[0]
    assert parallel[1] == parallel[4] == serial[1]
    assert parallel[2] == parallel[5] == serial[2]
    # Different seeds → different sampled windows.
    assert len({parallel[0], parallel[1], parallel[2]}) == 3


def test_http_explain_batch_batched_and_fallback_identical(tmp_path, rng):
    """/explain_batch must give bit-identical responses from an artifact
    WITH exported image-batched programs (one device call) and one WITHOUT
    (sequential fallback) — image i's key is PRNGKey(seeds[i]) either way."""
    from network_interpretation_imagenet_tpu.config import BOConfig

    engine = _engine()
    cfg = BOConfig(n_iters=3, n_pre_samples=2)
    images = np.stack(
        [rng.rand(28, 28, 1).astype(np.float32) for _ in range(3)]
    )
    segments = np.stack([
        ((np.arange(784).reshape(28, 28) + i) % 10).astype(np.int32)
        for i in range(3)
    ])
    body = {
        "images_b64": _b64(images), "images_shape": [3, 28, 28, 1],
        "segments_b64": _b64(segments), "segments_shape": [3, 28, 28],
        "seed": 9,  # default seeds = [9, 10, 11]
    }

    responses = {}
    for name, batches in (("batched", (4,)), ("fallback", ())):
        path = str(tmp_path / name)
        serving.export_bo_engine(engine, path, bo_cfg=cfg,
                                 candidate_buckets=(7,),
                                 image_batches=batches)
        httpd = make_http_server(path, "127.0.0.1", 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            conn = HTTPConnection(*httpd.server_address[:2])
            status, resp = _post(conn, "/explain_batch", body)
            assert status == 200, resp
            responses[name] = resp
        finally:
            httpd.shutdown()
            httpd.server_close()

    a, b = responses["batched"]["results"], responses["fallback"]["results"]
    assert len(a) == len(b) == 3
    for ra, rb in zip(a, b):
        assert ra["xp"] == rb["xp"]
        assert ra["target"] == rb["target"]
        np.testing.assert_allclose(ra["yp"], rb["yp"], atol=1e-6)
        assert ra["heatmap_b64"] == rb["heatmap_b64"]

    # error paths: wrong-rank images, mismatched seeds length
    path = str(tmp_path / "errs")
    serving.export_bo_engine(engine, path, bo_cfg=cfg, candidate_buckets=(7,))
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = HTTPConnection(*httpd.server_address[:2])
        status, resp = _post(conn, "/explain_batch", {"images": [[1.0]]})
        assert status == 400 and "images" in resp["error"]
        status, resp = _post(conn, "/explain_batch",
                             {**body, "seeds": [1, 2]})
        assert status == 400 and "seeds" in resp["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_eval_knockouts(tmp_path, rng):
    """/eval_knockouts matches the live engine; artifacts without knockout
    forwards give a 400."""
    engine = _engine()
    image = rng.rand(28, 28, 1).astype(np.float32)
    segments = rng.randint(0, 8, (28, 28)).astype(np.int32)
    knock = rng.randint(0, 8, (6, 1)).astype(np.int32)

    path = str(tmp_path / "ko")
    serving.export_engine(engine, path, batch_sizes=(8,), knockout_m=1)
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = HTTPConnection(*httpd.server_address[:2])
        status, resp = _post(conn, "/eval_knockouts", {
            "image_b64": _b64(image), "image_shape": [28, 28, 1],
            "segments_b64": _b64(segments), "segments_shape": [28, 28],
            "knock_ids_b64": _b64(knock), "knock_ids_shape": [6, 1],
            "target": 3,
        })
        assert status == 200, resp
        ref = engine.eval_knockout_masks(image, segments, knock, 3)
        assert resp["survived"] == [bool(v) for v in ref.survived]
        assert resp["preds"] == [int(v) for v in ref.preds]
        np.testing.assert_allclose(resp["prob_target"], ref.prob_target,
                                   atol=1e-5)
        status, resp = _post(conn, "/eval_knockouts", {"target": 0})
        assert status == 400 and "image" in resp["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()

    plain = str(tmp_path / "plain")
    serving.export_engine(engine, plain, batch_sizes=(8,))
    httpd = make_http_server(plain, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = HTTPConnection(*httpd.server_address[:2])
        status, resp = _post(conn, "/eval_knockouts", {
            "image_b64": _b64(image), "image_shape": [28, 28, 1],
            "segments_b64": _b64(segments), "segments_shape": [28, 28],
            "knock_ids_b64": _b64(knock), "knock_ids_shape": [6, 1],
            "target": 3,
        })
        assert status == 400 and "knockout" in resp["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_explain_knockout_mode(tmp_path, rng):
    """/explain mode=knockout samples the host-twin knockout bank and
    aggregates with the knockout heatmap semantics."""
    from network_interpretation_imagenet_tpu.ops.aggregate import (
        summed_knockout_labels_np,
    )
    from network_interpretation_imagenet_tpu.ops.masking import (
        sample_knockout_ids_host,
    )

    engine = _engine()
    image = rng.rand(28, 28, 1).astype(np.float32)
    segments = rng.randint(0, 8, (28, 28)).astype(np.int32)
    path = str(tmp_path / "ko")
    serving.export_engine(engine, path, batch_sizes=(8,), knockout_m=2)
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = HTTPConnection(*httpd.server_address[:2])
        body = {
            "image_b64": _b64(image), "image_shape": [28, 28, 1],
            "segments_b64": _b64(segments), "segments_shape": [28, 28],
            "mode": "knockout", "num_samples": 12, "num_knockout": 2,
            "seed": 5, "target": 3,
        }
        status, resp = _post(conn, "/explain", body)
        assert status == 200, resp
        assert resp["num_knockout"] == 2 and resp["num_samples"] == 12

        knock_ids = sample_knockout_ids_host(5, 12, 2, 8)
        ref = engine.eval_knockout_masks(image, segments, knock_ids, 3)
        ref_heat = summed_knockout_labels_np(
            segments, knock_ids, np.asarray(ref.survived)
        )
        heat = np.frombuffer(
            base64.b64decode(resp["heatmap_b64"]), np.float32
        ).reshape(resp["heatmap_shape"])
        np.testing.assert_allclose(heat, ref_heat, atol=1e-6)
        assert resp["survival"] == pytest.approx(float(np.mean(ref.survived)))

        # unknown mode and knockout-on-window-only-artifact are 400s
        status, resp = _post(conn, "/explain", {**body, "mode": "zigzag"})
        assert status == 400 and "mode" in resp["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_explain_batch_overflow_falls_back_and_empty_batch(tmp_path, rng):
    """N larger than every exported image batch uses the sequential
    fallback (not a 400); N=0 returns empty results; the export CLI
    rejects --bo-image-batches without --bo."""
    from network_interpretation_imagenet_tpu.cli import export_serving
    from network_interpretation_imagenet_tpu.config import BOConfig

    engine = _engine()
    cfg = BOConfig(n_iters=2, n_pre_samples=2)
    images = np.stack(
        [rng.rand(28, 28, 1).astype(np.float32) for _ in range(3)]
    )
    segments = np.stack([
        ((np.arange(784).reshape(28, 28) + i) % 10).astype(np.int32)
        for i in range(3)
    ])

    path = str(tmp_path / "n2")  # exported batch N=2 < request N=3
    serving.export_bo_engine(engine, path, bo_cfg=cfg,
                             candidate_buckets=(7,), image_batches=(2,))
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = HTTPConnection(*httpd.server_address[:2])
        body = {
            "images_b64": _b64(images), "images_shape": [3, 28, 28, 1],
            "segments_b64": _b64(segments), "segments_shape": [3, 28, 28],
            "seeds": [4, 5, 6], "targets": [1, 2, 3],
        }
        status, resp = _post(conn, "/explain_batch", body)
        assert status == 200, resp
        assert len(resp["results"]) == 3
        # bit-stable vs per-image /explain with the same seed/target
        status1, one = _post(conn, "/explain", {
            "image_b64": _b64(images[1]), "image_shape": [28, 28, 1],
            "segments_b64": _b64(segments[1]), "segments_shape": [28, 28],
            "seed": 5, "target": 2,
        })
        assert status1 == 200
        assert resp["results"][1]["xp"] == one["xp"]
        assert resp["results"][1]["heatmap_b64"] == one["heatmap_b64"]

        status, resp = _post(conn, "/explain_batch", {
            "images_b64": "", "images_shape": [0, 28, 28, 1],
        })
        assert status == 200 and resp["results"] == []
    finally:
        httpd.shutdown()
        httpd.server_close()

    with pytest.raises(SystemExit):
        export_serving.main([
            "--arch", "mnist_cnn", "--dataset", "mnist", "--synthetic",
            "--out", str(tmp_path / "x"), "--bo-image-batches", "4",
        ])


def test_service_warmup_touches_every_program(tmp_path, rng):
    """warmup() executes every loaded program (window + knockout buckets,
    BO loops incl. batched, predict heads) and requests still serve."""
    from network_interpretation_imagenet_tpu.config import BOConfig
    from network_interpretation_imagenet_tpu.serving_http import SaliencyService

    engine = _engine()
    path = str(tmp_path / "combined")
    serving.export_engine(engine, path, batch_sizes=(8, 4), knockout_m=2)
    serving.export_bo_engine(
        engine, path, bo_cfg=BOConfig(n_iters=2, n_pre_samples=2),
        candidate_buckets=(7,), image_batches=(2,), include_weights=False,
    )
    service = SaliencyService(path)
    # engine: 2 window + 2 knockout; bo: predict1 + 1 loop + 1 batched loop
    # + 1 batched predict = 4.
    assert service.warmup() == 8
    out = service.explain({
        "image": rng.rand(28, 28, 1).astype(np.float32).tolist(),
        "segments": rng.randint(0, 7, (28, 28)).tolist(),
        "target": 1,
    })
    assert "heatmap_b64" in out


def test_http_metrics_endpoint(http_engine_server, rng):
    """/metrics tracks POST endpoints: counts, 4xx errors, latency window."""
    engine, httpd = http_engine_server
    host, port = httpd.server_address[:2]
    conn = HTTPConnection(host, port)

    img = rng.rand(28, 28, 1).astype(np.float32)
    seg = rng.randint(0, 8, (28, 28)).astype(np.int32)
    body = {"image_b64": _b64(img), "image_shape": [28, 28, 1],
            "segments_b64": _b64(seg), "segments_shape": [28, 28],
            "num_samples": 4, "seed": 1}
    for _ in range(2):
        status, _ = _post(conn, "/explain", body)
        assert status == 200
    status, _ = _post(conn, "/explain", {"seed": 1})  # missing image -> 400
    assert status == 400

    conn.request("GET", "/metrics")
    r = conn.getresponse()
    assert r.status == 200
    snap = json.loads(r.read())
    assert snap["uptime_seconds"] >= 0
    ep = snap["endpoints"]["/explain"]
    assert ep["count"] == 3
    assert ep["errors_4xx"] == 1 and ep["errors_5xx"] == 0
    lat = ep["latency_seconds"]
    assert lat["window"] == 3
    assert 0 <= lat["p50"] <= lat["p90"] <= lat["p99"] <= lat["max"]
    # GET probes (healthz/metrics itself) are not observed.
    assert "/metrics" not in snap["endpoints"]
    conn.close()


def test_http_unknown_post_path_is_404_and_unobserved(http_engine_server):
    """Unknown POST paths answer 404 BEFORE body parsing and never enter
    the metrics dict (arbitrary client paths must not grow it)."""
    engine, httpd = http_engine_server
    host, port = httpd.server_address[:2]
    conn = HTTPConnection(host, port)
    for i in range(3):
        conn.request("POST", f"/junk-{i}", "not json at all",
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 404
        r.read()
    conn.request("GET", "/metrics")
    r = conn.getresponse()
    snap = json.loads(r.read())
    assert not any(k.startswith("/junk") for k in snap["endpoints"])
    conn.close()


def test_http_unknown_path_large_body_gets_404(http_engine_server):
    """The 404 reply drains the request body first, so a client still
    streaming a large body sees the 404 (not a connection reset from the
    server answering-and-closing mid-upload)."""
    engine, httpd = http_engine_server
    host, port = httpd.server_address[:2]
    conn = HTTPConnection(host, port)
    big = b"x" * (8 << 20)
    conn.request("POST", "/definitely-not-a-route", big,
                 {"Content-Type": "application/octet-stream"})
    r = conn.getresponse()
    assert r.status == 404
    assert b"unknown path" in r.read()
    conn.close()


def test_http_metrics_record_post_serialization_status(tmp_path, rng,
                                                       monkeypatch):
    """A payload that fails JSON serialization reaches the client as 500
    and is recorded as 500 in /metrics — the observation happens after
    serialization, not on the pre-send intent code."""
    from network_interpretation_imagenet_tpu.serving_http import (
        SaliencyService,
    )

    engine = _engine()
    path = str(tmp_path / "artifact")
    serving.export_engine(engine, path, batch_sizes=(16, 4))
    # Patch BEFORE server creation: routes bind bound methods at build time.
    monkeypatch.setattr(SaliencyService, "explain",
                        lambda self, body: {"oops": object()})
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        conn = HTTPConnection(host, port)
        status, payload = _post(conn, "/explain", {"anything": 1})
        assert status == 500 and "error" in payload
        conn.request("GET", "/metrics")
        r = conn.getresponse()
        snap = json.loads(r.read())
        ep = snap["endpoints"]["/explain"]
        assert ep["count"] == 1
        assert ep["errors_5xx"] == 1 and ep["errors_4xx"] == 0
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_dynamic_batching_coalesces_and_matches(tmp_path, rng):
    """Concurrent /explain requests on a --dynamic-batch server coalesce
    into ONE image-batched device call and return responses identical to
    the plain serialized server (explicit targets → bit-stable across the
    single and batched fused-loop programs)."""
    from network_interpretation_imagenet_tpu.config import BOConfig

    engine = _engine()
    cfg = BOConfig(n_iters=3, n_pre_samples=2)
    path = str(tmp_path / "artifact")
    serving.export_bo_engine(engine, path, bo_cfg=cfg,
                             candidate_buckets=(7,), image_batches=(4,))

    n = 4
    images = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(n)]
    segments = [((np.arange(784).reshape(28, 28) + i) % 10).astype(np.int32)
                for i in range(n)]

    def body(i):
        return {"image_b64": _b64(images[i]), "image_shape": [28, 28, 1],
                "segments_b64": _b64(segments[i]),
                "segments_shape": [28, 28], "seed": 9 + i, "target": i % 3}

    # Reference: plain server, sequential single-call path.
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    ref = []
    try:
        conn = HTTPConnection(*httpd.server_address[:2])
        for i in range(n):
            status, resp = _post(conn, "/explain", body(i))
            assert status == 200, resp
            ref.append(resp)
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()

    # Dynamic-batch server: fire all n concurrently; a generous collection
    # window lets every request join the leader's group.
    httpd = make_http_server(path, "127.0.0.1", 0, dynamic_batch=True,
                             batch_wait_ms=600.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    got = [None] * n
    errs = []
    try:
        host, port = httpd.server_address[:2]

        def fire(i):
            try:
                conn = HTTPConnection(host, port)
                status, resp = _post(conn, "/explain", body(i))
                assert status == 200, resp
                got[i] = resp
                conn.close()
            except Exception as e:  # surfaced after join
                errs.append((i, e))

        threads = [threading.Thread(target=fire, args=(i,)) for i in range(n)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert not errs, errs

        conn = HTTPConnection(host, port)
        conn.request("GET", "/metrics")
        snap = json.loads(conn.getresponse().read())
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()

    for i in range(n):
        assert got[i]["target"] == ref[i]["target"]
        assert got[i]["xp"] == ref[i]["xp"]
        np.testing.assert_allclose(got[i]["yp"], ref[i]["yp"], atol=1e-6)
        assert got[i]["heatmap_b64"] == ref[i]["heatmap_b64"]

    db = snap["dynamic_batch"]
    assert db["requests"] == n
    assert db["max_group"] >= 2  # coalescing actually happened
    assert db["device_calls"] < n  # fewer device calls than requests

    # Device-section durations are recorded per coalesced GROUP so a
    # client-latency tail can be attributed to slow device calls.
    dev = snap["device_call_ms"]
    assert dev["count"] >= 1
    assert 0 <= dev["p50_ms"] <= dev["p95_ms"] <= dev["max_ms"]
    assert "over_1s" in dev


def test_http_dynamic_batch_group_cap_bounds_blast_radius(tmp_path, rng):
    """``batch_max_group`` clamps the coalesced group below the artifact's
    largest exported image batch: with a cap of 2, four concurrent
    requests split into >= 2 device calls of <= 2 requests each (one slow
    call can stall at most 2 requests), and every response still matches
    the serialized reference bit-for-bit (explicit targets)."""
    from network_interpretation_imagenet_tpu.config import BOConfig

    engine = _engine()
    cfg = BOConfig(n_iters=3, n_pre_samples=2)
    path = str(tmp_path / "artifact")
    serving.export_bo_engine(engine, path, bo_cfg=cfg,
                             candidate_buckets=(7,), image_batches=(2, 4))

    n = 4
    images = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(n)]
    segments = [((np.arange(784).reshape(28, 28) + i) % 10).astype(np.int32)
                for i in range(n)]

    def body(i):
        return {"image_b64": _b64(images[i]), "image_shape": [28, 28, 1],
                "segments_b64": _b64(segments[i]),
                "segments_shape": [28, 28], "seed": 9 + i, "target": i % 3}

    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    ref = []
    try:
        conn = HTTPConnection(*httpd.server_address[:2])
        for i in range(n):
            status, resp = _post(conn, "/explain", body(i))
            assert status == 200, resp
            ref.append(resp)
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()

    httpd = make_http_server(path, "127.0.0.1", 0, dynamic_batch=True,
                             batch_wait_ms=600.0, batch_max_group=2)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    got = [None] * n
    errs = []
    try:
        host, port = httpd.server_address[:2]

        def fire(i):
            try:
                conn = HTTPConnection(host, port)
                status, resp = _post(conn, "/explain", body(i))
                assert status == 200, resp
                got[i] = resp
                conn.close()
            except Exception as e:
                errs.append((i, e))

        threads = [threading.Thread(target=fire, args=(i,)) for i in range(n)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert not errs, errs

        conn = HTTPConnection(host, port)
        conn.request("GET", "/metrics")
        snap = json.loads(conn.getresponse().read())
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()

    for i in range(n):
        assert got[i]["target"] == ref[i]["target"]
        assert got[i]["xp"] == ref[i]["xp"]
        np.testing.assert_allclose(got[i]["yp"], ref[i]["yp"], atol=1e-6)
        assert got[i]["heatmap_b64"] == ref[i]["heatmap_b64"]

    db = snap["dynamic_batch"]
    assert db["requests"] == n
    assert db["max_group"] <= 2       # the cap held
    assert db["device_calls"] >= 2    # ... so the burst split into calls


def test_http_dynamic_batching_mixed_groups(tmp_path, rng):
    """Concurrent requests with different window fractions can't share a
    fused-loop call: the batcher runs them as separate groups in one drain
    pass, and every response still matches the plain server."""
    from network_interpretation_imagenet_tpu.config import BOConfig

    engine = _engine()
    path = str(tmp_path / "artifact")
    serving.export_bo_engine(engine, path,
                             bo_cfg=BOConfig(n_iters=3, n_pre_samples=2),
                             candidate_buckets=(7,), image_batches=(4,))

    img = rng.rand(28, 28, 1).astype(np.float32)
    seg = ((np.arange(784).reshape(28, 28)) % 10).astype(np.int32)

    def body(i):
        return {"image_b64": _b64(img), "image_shape": [28, 28, 1],
                "segments_b64": _b64(seg), "segments_shape": [28, 28],
                "seed": 5 + i, "target": 2,
                "window_fraction": 0.4 if i % 2 == 0 else 0.6}

    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    ref = []
    try:
        conn = HTTPConnection(*httpd.server_address[:2])
        for i in range(4):
            status, resp = _post(conn, "/explain", body(i))
            assert status == 200, resp
            ref.append(resp)
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()

    httpd = make_http_server(path, "127.0.0.1", 0, dynamic_batch=True,
                             batch_wait_ms=600.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    got = [None] * 4
    errs = []
    try:
        host, port = httpd.server_address[:2]

        def fire(i):
            try:
                conn = HTTPConnection(host, port)
                status, resp = _post(conn, "/explain", body(i))
                assert status == 200, resp
                got[i] = resp
                conn.close()
            except Exception as e:
                errs.append((i, e))

        threads = [threading.Thread(target=fire, args=(i,)) for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert not errs, errs
        stats = dict(httpd.service._batcher.stats)
    finally:
        httpd.shutdown()
        httpd.server_close()

    for i in range(4):
        assert got[i]["xp"] == ref[i]["xp"]
        assert got[i]["heatmap_b64"] == ref[i]["heatmap_b64"]
    # Two window fractions → at least two device calls even when all four
    # joined one drain pass; the even/odd halves each coalesced.
    assert stats["requests"] == 4
    assert 2 <= stats["device_calls"] <= 4


def test_http_dynamic_batch_sheds_load_with_503(tmp_path, rng):
    """Beyond max_pending queued explains the batcher rejects BEFORE any
    work starts: the client sees a retryable 503 (not 400/500) and
    /metrics counts the rejection."""
    from network_interpretation_imagenet_tpu.config import BOConfig

    engine = _engine()
    path = str(tmp_path / "artifact")
    serving.export_bo_engine(engine, path,
                             bo_cfg=BOConfig(n_iters=3, n_pre_samples=2),
                             candidate_buckets=(7,), image_batches=(4,))
    httpd = make_http_server(path, "127.0.0.1", 0, dynamic_batch=True,
                             batch_wait_ms=800.0)
    httpd.service.enable_dynamic_batching(wait_ms=800.0, max_pending=1)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    img = rng.rand(28, 28, 1).astype(np.float32)
    seg = ((np.arange(784).reshape(28, 28)) % 10).astype(np.int32)
    body = {"image_b64": _b64(img), "image_shape": [28, 28, 1],
            "segments_b64": _b64(seg), "segments_shape": [28, 28],
            "seed": 1, "target": 2}
    statuses, errs = [], []
    try:
        host, port = httpd.server_address[:2]

        def fire():
            try:
                conn = HTTPConnection(host, port)
                status, resp = _post(conn, "/explain", body)
                statuses.append((status, resp))
                conn.close()
            except Exception as e:
                errs.append(e)

        threads = [threading.Thread(target=fire) for _ in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert not errs, errs
        conn = HTTPConnection(host, port)
        conn.request("GET", "/metrics")
        snap = json.loads(conn.getresponse().read())
        conn.close()
    finally:
        httpd.shutdown()
        httpd.server_close()

    codes = sorted(s for s, _ in statuses)
    # max_pending=1 and an 800ms window: the leader occupies the queue, so
    # at least one concurrent arrival is shed; every accepted one succeeds.
    assert codes.count(200) >= 1
    assert codes.count(503) >= 1
    assert codes.count(200) + codes.count(503) == 3
    for s, resp in statuses:
        if s == 503:
            assert "queue full" in resp["error"]
    assert snap["dynamic_batch"]["rejected"] >= 1
    ep = snap["endpoints"]["/explain"]
    assert ep["errors_5xx"] >= 1  # 503s are visible in endpoint counters


def test_serve_cli_sigterm_drains_cleanly(tmp_path, rng):
    """cli.serve exits 0 on SIGTERM after draining (graceful stop for
    orchestrators) — and an IN-FLIGHT request still gets its response
    (handler threads are joined, not killed as daemons)."""
    import os
    import re
    import signal
    import subprocess
    import sys
    import time

    engine = _engine()
    path = str(tmp_path / "artifact")
    serving.export_engine(engine, path, batch_sizes=(16,))
    env = dict(os.environ)
    proc = subprocess.Popen(
        [sys.executable, "-m", "network_interpretation_imagenet_tpu.cli.serve",
         "--artifact", path, "--port", "0", "--platform", "cpu"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    result = {}
    try:
        # Port 0: parse the bound port from the startup line (hardcoded
        # ports collide across concurrent test runs).
        port = None
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            m = re.search(r"http://[^:]+:(\d+)", line or "")
            if m:
                port = int(m.group(1))
                break
        assert port, "serve CLI never printed its bound port"

        # Fire a COLD /explain (first-compile keeps it in flight for
        # seconds), then SIGTERM while it runs.
        img = rng.rand(28, 28, 1).astype(np.float32)
        seg = ((np.arange(784).reshape(28, 28)) % 10).astype(np.int32)
        body = {"image_b64": _b64(img), "image_shape": [28, 28, 1],
                "segments_b64": _b64(seg), "segments_shape": [28, 28],
                "seed": 1, "num_samples": 8, "mode": "window"}

        def fire():
            conn = HTTPConnection("127.0.0.1", port, timeout=120)
            result["resp"] = _post(conn, "/explain", body)
            conn.close()

        t = threading.Thread(target=fire)
        t.start()
        time.sleep(0.5)  # request is in flight (cold compile takes longer)
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
        t.join(timeout=120)
        assert proc.returncode == 0, out
        assert "draining" in out
        status, resp = result["resp"]
        assert status == 200, resp  # the in-flight request was served
    finally:
        if proc.poll() is None:
            proc.kill()


def test_http_dynamic_batch_isolates_bad_groupmate(tmp_path, rng):
    """A request whose segment count exceeds the artifact's candidate
    buckets must fail ALONE: its coalesced groupmate still gets a 200 via
    the serial-fallback path (no group poisoning)."""
    from network_interpretation_imagenet_tpu.config import BOConfig

    engine = _engine()
    path = str(tmp_path / "artifact")
    serving.export_bo_engine(engine, path,
                             bo_cfg=BOConfig(n_iters=3, n_pre_samples=2),
                             candidate_buckets=(7,), image_batches=(4,))
    httpd = make_http_server(path, "127.0.0.1", 0, dynamic_batch=True,
                             batch_wait_ms=600.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    img = rng.rand(28, 28, 1).astype(np.float32)
    seg_ok = ((np.arange(784).reshape(28, 28)) % 10).astype(np.int32)
    seg_bad = ((np.arange(784).reshape(28, 28)) % 24).astype(np.int32)
    results, errs = {}, []
    try:
        host, port = httpd.server_address[:2]

        def fire(name, seg):
            try:
                conn = HTTPConnection(host, port)
                body = {"image_b64": _b64(img), "image_shape": [28, 28, 1],
                        "segments_b64": _b64(seg),
                        "segments_shape": [28, 28], "seed": 1, "target": 2}
                results[name] = _post(conn, "/explain", body)
                conn.close()
            except Exception as e:
                errs.append((name, e))

        threads = [threading.Thread(target=fire, args=("ok", seg_ok)),
                   threading.Thread(target=fire, args=("bad", seg_bad))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        stats = dict(httpd.service._batcher.stats)
    finally:
        httpd.shutdown()
        httpd.server_close()
    assert not errs, errs
    assert results["ok"][0] == 200, results["ok"]
    assert results["bad"][0] == 400, results["bad"]
    assert stats["requests"] == 2


def test_http_normalize_requires_uint8_wire(http_engine_server, rng):
    """'normalize' with an f32 image is a 400, not a silent no-op (the
    model would otherwise run on un-preprocessed pixels)."""
    engine, httpd = http_engine_server
    host, port = httpd.server_address[:2]
    conn = HTTPConnection(host, port)
    img = rng.rand(28, 28, 1).astype(np.float32)
    seg = ((np.arange(784).reshape(28, 28)) % 10).astype(np.int32)
    body = {"image_b64": _b64(img), "image_shape": [28, 28, 1],
            "segments_b64": _b64(seg), "segments_shape": [28, 28],
            "seed": 1, "num_samples": 4,
            "normalize": {"mean": [0.5], "std": [0.5]}}
    status, resp = _post(conn, "/explain", body)
    assert status == 400 and "uint8" in resp["error"]
    # uint8 wire + normalize works.
    u8 = (img * 255).astype(np.uint8)
    body2 = {"image_u8_b64": _b64(u8), "image_shape": [28, 28, 1],
             "segments_b64": _b64(seg), "segments_shape": [28, 28],
             "seed": 1, "num_samples": 4,
             "normalize": {"mean": [0.5], "std": [0.5]}}
    status, resp = _post(conn, "/explain", body2)
    assert status == 200, resp
    conn.close()


def test_http_jpeg_wire_client_errors_are_400(http_engine_server, rng):
    """Malformed JPEG bytes and a stray 'normalize' on the JPEG wire are
    CLIENT errors (400), never 500s: PIL's UnidentifiedImageError is an
    OSError, which used to fall through to the generic 500 handler."""
    _, httpd = http_engine_server
    host, port = httpd.server_address[:2]
    seg = ((np.arange(784).reshape(28, 28)) % 10).astype(np.int32)
    seg_fields = {"segments_b64": _b64(seg), "segments_shape": [28, 28],
                  "seed": 1, "num_samples": 4}
    conn = HTTPConnection(host, port)
    # Valid base64 of bytes that are not a JPEG.
    garbage = base64.b64encode(b"definitely not a jpeg").decode()
    status, resp = _post(conn, "/explain",
                         {"image_jpeg_b64": garbage, **seg_fields})
    assert status == 400 and "invalid JPEG" in resp["error"], (status, resp)
    # 'normalize' belongs to the u8 wire; on the JPEG wire mean/std ride
    # 'preprocess' — silent acceptance would produce a wrong heatmap.
    status, resp = _post(conn, "/explain",
                         {"image_jpeg_b64": garbage,
                          "normalize": {"mean": [0.5], "std": [0.5]},
                          **seg_fields})
    assert status == 400 and "preprocess" in resp["error"], (status, resp)
    conn.close()


def test_http_attribute_endpoint(tmp_path, rng):
    """POST /attribute serves the artifact's AOT gradient-family programs:
    parity with the direct server call, inferred target, and 400s for
    missing method / attribution-free artifacts."""
    from network_interpretation_imagenet_tpu.saliency import (
        gradient as grad_mod,
    )

    engine = _engine()
    path = str(tmp_path / "attr_artifact")
    serving.export_engine(
        engine, path, batch_sizes=(4,),
        attribution=("gradient", "smoothgrad"),
        attribution_cfg={"sg_samples": 3, "sg_sigma": 0.1},
    )
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        conn = HTTPConnection(host, port)
        image = rng.rand(28, 28, 1).astype(np.float32)

        body = {"image_b64": _b64(image), "image_shape": [28, 28, 1],
                "method": "smoothgrad", "target": 3, "seed": 7}
        status, resp = _post(conn, "/attribute", body)
        assert status == 200
        heat = np.frombuffer(
            base64.b64decode(resp["heatmap_b64"]), np.float32
        ).reshape(resp["heatmap_shape"])
        live = grad_mod.smoothgrad(
            engine.bundle.logits, engine.variables, image, 3,
            samples=3, noise_sigma=0.1, seed=7,
        )
        np.testing.assert_allclose(heat, np.asarray(live), atol=1e-4)
        assert resp["target"] == 3 and resp["method"] == "smoothgrad"
        assert resp["config"]["sg_samples"] == 3

        # Inferred target == the unmasked forward's argmax.
        status, resp = _post(conn, "/attribute", {
            "image_b64": _b64(image), "image_shape": [28, 28, 1],
            "method": "gradient",
        })
        assert status == 200
        pred = int(np.asarray(
            engine.predict(image[None])
        ).argmax())
        assert resp["target"] == pred

        # Missing method and unknown method are client errors.
        status, resp = _post(conn, "/attribute", {
            "image_b64": _b64(image), "image_shape": [28, 28, 1]})
        assert status == 400 and "method" in resp["error"]
        status, resp = _post(conn, "/attribute", {
            "image_b64": _b64(image), "image_shape": [28, 28, 1],
            "method": "gradcam"})
        assert status == 400 and "re-export" in resp["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_attribute_without_programs_is_400(http_engine_server, rng):
    _, httpd = http_engine_server
    host, port = httpd.server_address[:2]
    conn = HTTPConnection(host, port)
    image = rng.rand(28, 28, 1).astype(np.float32)
    status, resp = _post(conn, "/attribute", {
        "image_b64": _b64(image), "image_shape": [28, 28, 1],
        "method": "gradient"})
    assert status == 400 and "attribution" in resp["error"]


def test_http_attribute_batch_endpoint(tmp_path, rng):
    """POST /attribute_batch: batched-program parity with N /attribute
    calls, inferred targets, and validation errors."""
    engine = _engine()
    path = str(tmp_path / "attr_batch_artifact")
    serving.export_engine(
        engine, path, batch_sizes=(4,),
        attribution=("gradient", "smoothgrad"),
        attribution_cfg={"sg_samples": 3, "sg_sigma": 0.1},
        attribution_batches=(4,),
    )
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        conn = HTTPConnection(host, port)
        images = rng.rand(3, 28, 28, 1).astype(np.float32)

        status, resp = _post(conn, "/attribute_batch", {
            "images_b64": _b64(images), "images_shape": [3, 28, 28, 1],
            "method": "smoothgrad", "targets": [1, 2, 3],
            "seeds": [5, 6, 7]})
        assert status == 200 and len(resp["results"]) == 3
        for i, item in enumerate(resp["results"]):
            heat = np.frombuffer(
                base64.b64decode(item["heatmap_b64"]), np.float32
            ).reshape(item["heatmap_shape"])
            s1, single = _post(conn, "/attribute", {
                "image_b64": _b64(images[i]), "image_shape": [28, 28, 1],
                "method": "smoothgrad", "target": i + 1, "seed": 5 + i})
            assert s1 == 200
            ref = np.frombuffer(
                base64.b64decode(single["heatmap_b64"]), np.float32
            ).reshape(single["heatmap_shape"])
            np.testing.assert_allclose(heat, ref, atol=1e-5)

        # Inferred targets match per-image /attribute inference.
        status, resp = _post(conn, "/attribute_batch", {
            "images_b64": _b64(images), "images_shape": [3, 28, 28, 1],
            "method": "gradient"})
        assert status == 200
        preds = np.asarray(engine.predict(images)).argmax(axis=1)
        assert [r["target"] for r in resp["results"]] == [int(p)
                                                          for p in preds]

        # Validation: bad lengths and unknown method are 400s.
        status, resp = _post(conn, "/attribute_batch", {
            "images_b64": _b64(images), "images_shape": [3, 28, 28, 1],
            "method": "gradient", "targets": [1]})
        assert status == 400 and "length" in resp["error"]
        status, resp = _post(conn, "/attribute_batch", {
            "images_b64": _b64(images), "images_shape": [3, 28, 28, 1],
            "method": "rise"})
        assert status == 400 and "re-export" in resp["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_attribute_xrai(tmp_path, rng):
    """POST /attribute method=xrai: AOT signed-IG + server-side greedy
    ranking, parity with ExportedSaliencyServer.xrai, display wire field,
    and 400s for shape mismatches / xrai-free artifacts."""
    engine = _engine()
    path = str(tmp_path / "xrai_artifact")
    serving.export_engine(
        engine, path, batch_sizes=(4,), attribution=("xrai",),
        attribution_cfg={"ig_steps": 4, "xrai_scales": [10.0, 30.0]},
    )
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        conn = HTTPConnection(host, port)
        image = np.zeros((28, 28, 1), np.float32)
        image[4:14, 4:14] = 0.9
        image[16:26, 10:22] = 0.5
        image += 0.02 * rng.randn(28, 28, 1).astype(np.float32)
        image = np.clip(image, 0.0, 1.0).astype(np.float32)
        display = (image * 255).astype(np.uint8)

        body = {"image_b64": _b64(image), "image_shape": [28, 28, 1],
                "display_b64": _b64(display), "display_shape": [28, 28, 1],
                "method": "xrai", "target": 3}
        status, resp = _post(conn, "/attribute", body)
        assert status == 200
        heat = np.frombuffer(
            base64.b64decode(resp["heatmap_b64"]), np.float32
        ).reshape(resp["heatmap_shape"])
        attr = np.frombuffer(
            base64.b64decode(resp["attribution_b64"]), np.float32
        ).reshape(resp["attribution_shape"])
        direct = httpd.service.engine_server.xrai(image, 3, display=display)
        np.testing.assert_array_equal(heat, direct.heatmap)
        np.testing.assert_allclose(attr, direct.attribution, atol=1e-6)
        assert resp["num_regions"] == direct.num_regions >= 2
        assert resp["xrai"]["scales"] == [10.0, 30.0]
        assert "file" not in resp["xrai"]

        # Inferred target + derived display both optional.
        status, resp2 = _post(conn, "/attribute", {
            "image_b64": _b64(image), "image_shape": [28, 28, 1],
            "method": "xrai"})
        assert status == 200 and resp2["num_regions"] >= 1

        # display spatial shape must match the image.
        status, resp3 = _post(conn, "/attribute", {
            "image_b64": _b64(image), "image_shape": [28, 28, 1],
            "display_b64": _b64(display[:14]), "display_shape": [14, 28, 1],
            "method": "xrai", "target": 3})
        assert status == 400 and "display" in resp3["error"]

        # The gradient family isn't in this artifact → still a clean 400.
        status, resp4 = _post(conn, "/attribute", {
            "image_b64": _b64(image), "image_shape": [28, 28, 1],
            "method": "gradient"})
        assert status == 400 and "re-export" in resp4["error"]

        # SaliencyClient round-trip decodes heatmap + attribution.
        from network_interpretation_imagenet_tpu.serving_client import (
            SaliencyClient,
        )

        client = SaliencyClient(host, port)
        out = client.attribute(image, "xrai", target=3, display=display)
        np.testing.assert_array_equal(out["heatmap"], direct.heatmap)
        np.testing.assert_allclose(out["attribution"], direct.attribution,
                                   atol=1e-6)
        assert out["num_regions"] == direct.num_regions
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_attribute_xrai_not_exported_is_400(tmp_path, rng):
    """An artifact with gradient programs but no xrai entry 400s on
    method=xrai with a re-export hint."""
    engine = _engine()
    path = str(tmp_path / "grad_only")
    serving.export_engine(engine, path, batch_sizes=(4,),
                          attribution=("gradient",))
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        conn = HTTPConnection(host, port)
        image = rng.rand(28, 28, 1).astype(np.float32)
        status, resp = _post(conn, "/attribute", {
            "image_b64": _b64(image), "image_shape": [28, 28, 1],
            "method": "xrai"})
        assert status == 400 and "re-export" in resp["error"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_http_burst_of_simultaneous_connects_all_served(tmp_path, rng):
    """Regression pin for the listen-backlog overflow (commit 880bf79 /
    serving_http _Server.request_queue_size): 24 SIMULTANEOUS connects —
    released by a barrier so they hit the kernel accept queue together —
    must all receive an HTTP response. With the stdlib default backlog of
    5 the kernel drops the excess SYNs and clients stall in retransmit
    (503 load-shed is allowed; transport-level failure is not)."""
    import socket

    engine = _engine()
    path = str(tmp_path / "burst_artifact")
    serving.export_engine(engine, path, batch_sizes=(4,))
    httpd = make_http_server(path, "127.0.0.1", 0)
    # The attribute itself is the pin: the behavioral half below is
    # timing-dependent pressure, this line fails deterministically if the
    # fix regresses.
    assert type(httpd).request_queue_size >= 64
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        n = 24
        barrier = threading.Barrier(n)
        failures = []
        statuses = []
        lock = threading.Lock()

        def hit():
            try:
                barrier.wait(timeout=10)
                conn = HTTPConnection(host, port, timeout=15)
                conn.request("GET", "/healthz")
                r = conn.getresponse()
                r.read()
                with lock:
                    statuses.append(r.status)
                conn.close()
            except Exception as e:  # includes ConnectionReset + timeouts
                with lock:
                    failures.append(repr(e))

        threads = [threading.Thread(target=hit) for _ in range(n)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=30)
        assert not failures, f"transport-level failures: {failures}"
        assert len(statuses) == n
        # /healthz never sheds, but keep the contract honest: any HTTP
        # status is fine at the transport layer; 200 expected here.
        assert all(s == 200 for s in statuses)
    finally:
        httpd.shutdown()
        httpd.server_close()
