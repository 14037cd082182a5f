"""Session drive: exercise this session's changes end-to-end.

1. cli.serve --dynamic-batch as a real subprocess: concurrent /explain
   requests coalesce into one image-batched device call, /metrics shows
   the dynamic_batch block, and a big-body 404 answers cleanly.
2. Trainer preemption → mid-epoch checkpoint → resume; model_best carries
   the completeness marker through the is_best swap.
3. saliency_sweep journal: --resume under a flipped --gp-heatmaps refuses
   (keep_heatmaps is in the config fingerprint).

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/drive_session_r3d.py [--platform cpu]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import threading
import time

p = argparse.ArgumentParser()
p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
args = p.parse_args()
if args.platform:
    import jax

    jax.config.update("jax_platforms", args.platform)

import numpy as np  # noqa: E402


def banner(msg):
    print(f"\n=== {msg} ===", flush=True)


# ---- 1. dynamic-batch HTTP service (real CLI subprocess) -------------------
banner("1. cli.serve --dynamic-batch")
import base64  # noqa: E402
import http.client  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from network_interpretation_imagenet_tpu import serving  # noqa: E402
from network_interpretation_imagenet_tpu.config import BOConfig  # noqa: E402
from network_interpretation_imagenet_tpu.models import create_model  # noqa: E402
from network_interpretation_imagenet_tpu.saliency import SaliencyEngine  # noqa: E402

tmp = tempfile.mkdtemp(prefix="drive_r3d_")
bundle = create_model("mnist_cnn", "mnist")
variables = bundle.init(jax.random.PRNGKey(0))
engine = SaliencyEngine(bundle, variables, mask_batch=16,
                        compute_dtype=jnp.float32)
art = os.path.join(tmp, "artifact")
serving.export_bo_engine(engine, art, bo_cfg=BOConfig(n_iters=3, n_pre_samples=2),
                         candidate_buckets=(7,), image_batches=(4,))
print("exported BO artifact with image_batches=(4,)")

env = dict(os.environ)
env["PYTHONPATH"] = "/root/.axon_site:/root/repo"
cmd = [sys.executable, "-m", "network_interpretation_imagenet_tpu.cli.serve",
       "--artifact", art, "--port", "18371", "--dynamic-batch",
       "--batch-wait-ms", "500", "--warmup"]
if args.platform:
    cmd += ["--platform", args.platform]
proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                        stderr=subprocess.STDOUT, text=True)
try:
    deadline = time.time() + 300
    while time.time() < deadline:
        try:
            c = http.client.HTTPConnection("127.0.0.1", 18371, timeout=2)
            c.request("GET", "/healthz")
            if c.getresponse().status == 200:
                break
        except Exception:
            time.sleep(1.0)
    else:
        raise SystemExit("serve CLI never became healthy")
    print("serve CLI healthy (warmed)")

    rng = np.random.RandomState(0)
    imgs = [rng.rand(28, 28, 1).astype(np.float32) for _ in range(4)]
    segs = [((np.arange(784).reshape(28, 28) + i) % 10).astype(np.int32)
            for i in range(4)]

    def b64(a):
        return base64.b64encode(np.ascontiguousarray(a).tobytes()).decode()

    results, errs = [None] * 4, []

    def fire(i):
        try:
            c = http.client.HTTPConnection("127.0.0.1", 18371, timeout=600)
            body = {"image_b64": b64(imgs[i]), "image_shape": [28, 28, 1],
                    "segments_b64": b64(segs[i]), "segments_shape": [28, 28],
                    "seed": 9 + i, "target": i % 3}
            c.request("POST", "/explain", json.dumps(body))
            r = c.getresponse()
            results[i] = (r.status, json.loads(r.read()))
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(4)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    assert not errs, errs
    assert all(r[0] == 200 for r in results), [r[0] for r in results]
    print(f"4 concurrent /explain OK in {dt:.2f}s "
          f"(best_starts={[r[1]['best_start'] for r in results]})")

    c = http.client.HTTPConnection("127.0.0.1", 18371)
    c.request("GET", "/metrics")
    snap = json.loads(c.getresponse().read())
    db = snap["dynamic_batch"]
    print(f"dynamic_batch stats: {db}")
    assert db["requests"] == 4 and db["max_group"] >= 2
    assert db["device_calls"] < 4

    # big-body 404 drains cleanly
    c = http.client.HTTPConnection("127.0.0.1", 18371)
    c.request("POST", "/nope", b"x" * (8 << 20))
    r = c.getresponse()
    assert r.status == 404, r.status
    print("8MB-body 404 answered cleanly")
finally:
    proc.terminate()
    proc.wait(timeout=20)

# ---- 2. preemption-safe training + model_best marker ------------------------
banner("2. Trainer preempt/resume + model_best marker")
from network_interpretation_imagenet_tpu.config import TrainConfig  # noqa: E402
from network_interpretation_imagenet_tpu.data import (  # noqa: E402
    synthetic_classification_batch,
)
from network_interpretation_imagenet_tpu.train import Trainer  # noqa: E402
from network_interpretation_imagenet_tpu.utils.checkpoint import (  # noqa: E402
    restore_checkpoint,
)


def factory(epoch):
    return [synthetic_classification_batch(1000 + 17 * epoch + b, 8, 32, 3, 4)
            for b in range(6)]


class CrashAfter:
    def __init__(self, inner, n):
        self.inner, self.n = inner, n

    def __iter__(self):
        for i, item in enumerate(self.inner):
            if i >= self.n:
                raise RuntimeError("preempted")
            yield item


def build(d):
    b = create_model("resnet", "cifar10", depth=8, num_classes=4)
    cfg = TrainConfig(optimizer="sgd", lr=0.05, epochs=1, batch_size=8, seed=0)
    return Trainer(b, cfg, steps_per_epoch=6, save_dir=d, save_every_steps=2)


tdir = os.path.join(tmp, "train")
val = factory(99)[:1]
t = build(tdir)
try:
    t.fit(lambda e: CrashAfter(factory(e), 4), val)
    raise SystemExit("expected preemption")
except RuntimeError:
    pass
blob = restore_checkpoint(tdir)
assert int(blob["mid_epoch_step"]) == 4, blob["mid_epoch_step"]
print("preempted at step 4; mid-epoch checkpoint present")
t2 = build(tdir)
assert t2.resume() and t2.resume_skip_steps == 4
hist = t2.fit(factory, val)
assert len(hist) == 1
assert os.path.exists(os.path.join(tdir, "model_best", "nit_complete"))
best = restore_checkpoint(tdir, name="model_best")
assert best is not None and int(best["mid_epoch_step"]) == 0
print("resumed, epoch completed, model_best marked complete")

# ---- 3. journal fingerprint refuses flipped --gp-heatmaps -------------------
banner("3. sweep journal keep_heatmaps fingerprint")
out = os.path.join(tmp, "sweep")
common = [sys.executable, "-m",
          "network_interpretation_imagenet_tpu.cli.saliency_sweep",
          "--synthetic", "--num-images", "2", "--num_mask_samples", "8",
          "--arch", "mnist_cnn", "--dataset", "mnist", "--out", out,
          "--image-batch", "2"]
if args.platform:
    common += ["--platform", args.platform]
r1 = subprocess.run(common, env=env, capture_output=True, text=True,
                    timeout=900)
assert r1.returncode == 0, r1.stdout + r1.stderr
print("sweep 1 (no heatmaps) OK")
r2 = subprocess.run(common + ["--resume", "--gp-heatmaps"], env=env,
                    capture_output=True, text=True, timeout=900)
assert r2.returncode != 0, "resume with flipped --gp-heatmaps must refuse"
assert "config mismatch" in (r2.stdout + r2.stderr)
print("resume with flipped --gp-heatmaps refused (config mismatch)")

print("\nALL DRIVES PASSED")
