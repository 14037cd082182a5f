"""First-party serving client (serving_client.py): wire round-trips vs the
raw HTTP format, 503 retry-with-backoff, no-retry on client errors."""

import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from network_interpretation_imagenet_tpu import serving
from network_interpretation_imagenet_tpu.config import BOConfig
from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.saliency import SaliencyEngine
from network_interpretation_imagenet_tpu.serving_client import (
    SaliencyClient,
    ServiceError,
)
from network_interpretation_imagenet_tpu.serving_http import make_http_server


def _engine():
    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))
    return SaliencyEngine(bundle, variables, mask_batch=16,
                          compute_dtype=jnp.float32)


@pytest.fixture
def dual_server(tmp_path):
    """One artifact dir holding BOTH kinds (engine incl. knockout + BO)."""
    engine = _engine()
    path = str(tmp_path / "artifact")
    serving.export_engine(engine, path, batch_sizes=(16,), knockout_m=2,
                          attribution=("gradient",))
    serving.export_bo_engine(engine, path,
                             bo_cfg=BOConfig(n_iters=3, n_pre_samples=2),
                             candidate_buckets=(7,), image_batches=(4,))
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield httpd
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_client_round_trips_every_endpoint(dual_server, rng):
    host, port = dual_server.server_address[:2]
    client = SaliencyClient(host, port)

    assert client.healthz()["status"] == "ok"

    img = rng.rand(28, 28, 1).astype(np.float32)
    seg = ((np.arange(784).reshape(28, 28)) % 10).astype(np.int32)

    # BO explain (default mode on a dual artifact): heatmap decoded to f32.
    out = client.explain(img, segments=seg, seed=3, target=2)
    assert out["heatmap"].shape == (28, 28)
    assert out["heatmap"].dtype == np.float32
    assert out["target"] == 2 and len(out["xp"]) == len(out["yp"])

    # window + knockout modes ride the engine artifact.
    w = client.explain(img, segments=seg, mode="window", seed=1,
                       num_samples=8)
    assert w["num_samples"] == 8 and w["heatmap"].shape == (28, 28)
    k = client.explain(img, segments=seg, mode="knockout", seed=1,
                       num_samples=8, num_knockout=2)
    assert k["num_knockout"] == 2

    # explain_batch round-trip, server-side segmentation allowed.
    imgs = np.stack([img, rng.rand(28, 28, 1).astype(np.float32)])
    segs = np.stack([seg, seg])
    res = client.explain_batch(imgs, segments=segs, seeds=[3, 4],
                               targets=[2, 2])
    assert len(res) == 2
    np.testing.assert_array_equal(res[0]["heatmap"], out["heatmap"])

    # raw per-mask endpoints.
    ev = client.eval_windows(img, seg, np.arange(4, dtype=np.int32),
                             width=4, target=2)
    assert len(ev["survived"]) == 4 and len(ev["prob_target"]) == 4
    kv = client.eval_knockouts(img, seg,
                               rng.randint(0, 10, (5, 2)).astype(np.int32),
                               target=2)
    assert len(kv["survived"]) == 5

    # AOT attribution program (artifact exported with attribution=).
    at = client.attribute(img, "gradient", target=2)
    assert at["heatmap"].shape == (28, 28)
    assert at["heatmap"].dtype == np.float32 and at["target"] == 2
    client.close()


def test_client_matches_raw_wire_format(dual_server, rng):
    """The client's decoded heatmap equals a hand-decoded raw response."""
    import base64
    from http.client import HTTPConnection

    host, port = dual_server.server_address[:2]
    img = rng.rand(28, 28, 1).astype(np.float32)
    seg = ((np.arange(784).reshape(28, 28)) % 10).astype(np.int32)

    client = SaliencyClient(host, port)
    out = client.explain(img, segments=seg, seed=7, target=1)

    conn = HTTPConnection(host, port)
    body = {"image_b64": base64.b64encode(img.tobytes()).decode(),
            "image_shape": [28, 28, 1],
            "segments_b64": base64.b64encode(seg.tobytes()).decode(),
            "segments_shape": [28, 28], "seed": 7, "target": 1}
    conn.request("POST", "/explain", json.dumps(body))
    raw = json.loads(conn.getresponse().read())
    conn.close()
    heat = np.frombuffer(base64.b64decode(raw["heatmap_b64"]),
                         np.float32).reshape(raw["heatmap_shape"])
    np.testing.assert_array_equal(out["heatmap"], heat)
    assert out["xp"] == raw["xp"]


def test_client_retries_503_until_accepted(tmp_path, rng):
    """Against an overloaded dynamic-batch server (max_pending=1) every
    concurrent client call eventually succeeds via 503 backoff-retry."""
    engine = _engine()
    path = str(tmp_path / "artifact")
    serving.export_bo_engine(engine, path,
                             bo_cfg=BOConfig(n_iters=3, n_pre_samples=2),
                             candidate_buckets=(7,), image_batches=(4,))
    httpd = make_http_server(path, "127.0.0.1", 0, dynamic_batch=True,
                             batch_wait_ms=300.0)
    httpd.service.enable_dynamic_batching(wait_ms=300.0, max_pending=1)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    img = rng.rand(28, 28, 1).astype(np.float32)
    seg = ((np.arange(784).reshape(28, 28)) % 10).astype(np.int32)
    outs, errs = [None] * 3, []
    try:
        host, port = httpd.server_address[:2]

        def fire(i):
            try:
                c = SaliencyClient(host, port, retries=8, backoff_s=0.2)
                outs[i] = c.explain(img, segments=seg, seed=1, target=2)
                c.close()
            except Exception as e:
                errs.append((i, e))

        threads = [threading.Thread(target=fire, args=(i,)) for i in range(3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        stats = dict(httpd.service._batcher.stats)
    finally:
        httpd.shutdown()
        httpd.server_close()
    assert not errs, errs
    assert all(o is not None and o["heatmap"].shape == (28, 28) for o in outs)
    assert stats["rejected"] >= 1  # the retry path was actually exercised


def test_client_does_not_retry_4xx(dual_server):
    """Malformed requests raise ServiceError(400) after exactly ONE
    attempt — client bugs must not burn the retry budget."""
    host, port = dual_server.server_address[:2]
    client = SaliencyClient(host, port, retries=5, backoff_s=0.01)
    with pytest.raises(ServiceError) as ei:
        client.explain(np.zeros((4, 4, 1), np.float32), mode="nope")
    assert ei.value.status == 400

    conn_metrics = client.metrics()
    assert conn_metrics["endpoints"]["/explain"]["count"] == 1
    client.close()


def test_client_uint8_wire_matches_f32(dual_server, rng):
    """A uint8 image ships as raw bytes (4× smaller) and yields bit-equal
    results to sending the pre-scaled f32 image; server-side normalize
    applies mean/std after the /255 exactly like local preprocessing."""
    host, port = dual_server.server_address[:2]
    client = SaliencyClient(host, port)
    seg = ((np.arange(784).reshape(28, 28)) % 10).astype(np.int32)
    img_u8 = rng.randint(0, 256, (28, 28, 1)).astype(np.uint8)

    a = client.explain(img_u8, segments=seg, seed=5, target=1)
    b = client.explain(img_u8.astype(np.float32) / 255.0, segments=seg,
                       seed=5, target=1)
    np.testing.assert_array_equal(a["heatmap"], b["heatmap"])
    assert a["xp"] == b["xp"]

    norm = {"mean": [0.5], "std": [0.25]}
    c = client.explain(img_u8, segments=seg, seed=5, target=1,
                       normalize=norm)
    local = (img_u8.astype(np.float32) / 255.0 - np.float32(0.5)) \
        / np.float32(0.25)
    d = client.explain(local, segments=seg, seed=5, target=1)
    np.testing.assert_array_equal(c["heatmap"], d["heatmap"])

    # normalize= on a float image is a client-side usage error.
    with pytest.raises(ValueError, match="uint8"):
        client.explain(local, segments=seg, normalize=norm)

    # batch path takes u8 too.
    res = client.explain_batch(np.stack([img_u8, img_u8]),
                               segments=np.stack([seg, seg]),
                               seeds=[5, 5], targets=[1, 1])
    np.testing.assert_array_equal(res[0]["heatmap"], a["heatmap"])
    client.close()


def test_client_dead_server_is_status_zero():
    """A server that never answers yields ServiceError(status=0) — callers
    must be able to tell 'unreachable' from 'overloaded (503)'."""
    import socket

    # Reserve a port and close it: nothing listens there.
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    client = SaliencyClient("127.0.0.1", port, retries=1, backoff_s=0.01,
                            timeout_s=2)
    with pytest.raises(ServiceError) as ei:
        client.healthz()
    assert ei.value.status == 0
    assert ei.value.__cause__ is not None


def test_serve_cli_rejects_malformed_registry_specs():
    """--artifact 'name=' (empty dir) and duplicate names are argparse
    errors, not a FileNotFoundError for the literal spec string or a
    silent last-entry-wins overwrite."""
    from network_interpretation_imagenet_tpu.cli import serve

    with pytest.raises(SystemExit):
        serve.main(["--artifact", "resnet=", "--port", "0"])
    with pytest.raises(SystemExit):
        serve.main(["--artifact", "m=a", "--artifact", "m=b",
                    "--port", "0"])


def test_multi_model_registry(tmp_path, rng):
    """One process serves several artifacts: bare endpoints hit the first
    entry, /m/<name>/... routes per model, healthz lists the registry,
    unknown model names 404 without entering metrics, and the client's
    model= targets a named entry."""
    from http.client import HTTPConnection

    engine = _engine()
    eng_dir = str(tmp_path / "eng")
    serving.export_engine(engine, eng_dir, batch_sizes=(16,))
    bo_dir = str(tmp_path / "bo")
    serving.export_bo_engine(engine, bo_dir,
                             bo_cfg=BOConfig(n_iters=3, n_pre_samples=2),
                             candidate_buckets=(7,))
    httpd = make_http_server({"windows": eng_dir, "bo": bo_dir},
                             "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        img = rng.rand(28, 28, 1).astype(np.float32)
        seg = ((np.arange(784).reshape(28, 28)) % 10).astype(np.int32)

        default = SaliencyClient(host, port)
        h = default.healthz()
        assert h["kind"] == "engine"  # first entry answers bare endpoints
        assert h["models"] == {"windows": "engine", "bo": "bo"}
        w = default.explain(img, segments=seg, seed=1, num_samples=8)
        assert w["num_samples"] == 8  # window mode via the engine artifact

        bo = SaliencyClient(host, port, model="bo")
        assert bo.healthz()["kind"] == "bo"
        out = bo.explain(img, segments=seg, seed=1, target=2)
        assert len(out["xp"]) == 5  # 2 pre + 3 iters

        named_eng = SaliencyClient(host, port, model="windows")
        ev = named_eng.eval_windows(img, seg, np.arange(3, dtype=np.int32),
                                    width=4, target=2)
        assert len(ev["survived"]) == 3

        # Unknown model: 404, and the path never enters metrics.
        conn = HTTPConnection(host, port)
        conn.request("POST", "/m/nope/explain", "{}")
        assert conn.getresponse().status == 404
        conn.request("GET", "/m/nope/healthz")
        assert conn.getresponse().status == 404
        conn.close()
        snap = default.metrics()
        assert not any("nope" in k for k in snap["endpoints"])
        # Per-model metrics key by full path.
        assert "/m/bo/explain" in snap["endpoints"]
        for c in (default, bo, named_eng):
            c.close()
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_client_jpeg_wire_runs_eval_transform_server_side(tmp_path, rng):
    """JPEG bytes ship untouched; the server runs the bit-exact eval
    transform (resize/center-crop//255/mean-std), so the result equals
    sending the locally-transformed f32 array."""
    from io import BytesIO

    from PIL import Image

    from network_interpretation_imagenet_tpu.data.transform import (
        pil_eval_transform,
    )

    bundle = create_model("resnet", "cifar10", depth=8)  # RGB 32x32 input
    variables = bundle.init(jax.random.PRNGKey(0))
    engine = SaliencyEngine(bundle, variables, mask_batch=16,
                            compute_dtype=jnp.float32)
    path = str(tmp_path / "artifact")
    serving.export_engine(engine, path, batch_sizes=(16,))
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        client = SaliencyClient(host, port)

        # A 48x40 JPEG: the transform must resize+center-crop to 32.
        src = (rng.rand(48, 40, 3) * 255).astype(np.uint8)
        buf = BytesIO()
        Image.fromarray(src).save(buf, format="JPEG", quality=95)
        jpeg = buf.getvalue()
        pp = {"crop": 32, "mean": [0.4914, 0.4822, 0.4465],
              "std": [0.2470, 0.2435, 0.2616]}
        seg = ((np.arange(1024).reshape(32, 32)) % 8).astype(np.int32)

        a = client.explain(jpeg, segments=seg, mode="window", seed=1,
                           num_samples=8, target=3, preprocess=pp)

        local = pil_eval_transform(
            Image.open(BytesIO(jpeg)).convert("RGB"), 32,
            pp["mean"], pp["std"])
        b = client.explain(local.astype(np.float32), segments=seg,
                           mode="window", seed=1, num_samples=8, target=3)
        np.testing.assert_array_equal(a["heatmap"], b["heatmap"])

        # preprocess= with an array is a usage error on both sides.
        with pytest.raises(ValueError, match="JPEG"):
            client.explain(local, segments=seg, preprocess=pp)
        status_err = None
        try:
            # raw wire: f32 + preprocess must 400 server-side too.
            import base64 as _b64mod
            import json as _json
            from http.client import HTTPConnection

            conn = HTTPConnection(host, port)
            conn.request("POST", "/explain", _json.dumps({
                "image_b64": _b64mod.b64encode(local.tobytes()).decode(),
                "image_shape": [32, 32, 3], "preprocess": pp,
            }))
            status_err = conn.getresponse().status
            conn.close()
        finally:
            assert status_err == 400
        client.close()
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_client_attribute_batch(tmp_path, rng):
    engine = _engine()
    path = str(tmp_path / "attr_artifact")
    serving.export_engine(engine, path, batch_sizes=(4,),
                          attribution=("gradient",),
                          attribution_batches=(4,))
    httpd = make_http_server(path, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address[:2]
        client = SaliencyClient(host, port)
        imgs = rng.rand(2, 28, 28, 1).astype(np.float32)
        res = client.attribute_batch(imgs, "gradient", targets=[1, 2],
                                     seeds=[3, 4])
        assert len(res) == 2
        for i, item in enumerate(res):
            assert item["heatmap"].shape == (28, 28)
            single = client.attribute(imgs[i], "gradient", target=i + 1,
                                      seed=3 + i)
            np.testing.assert_allclose(item["heatmap"], single["heatmap"],
                                       atol=1e-5)
        client.close()
    finally:
        httpd.shutdown()
        httpd.server_close()
