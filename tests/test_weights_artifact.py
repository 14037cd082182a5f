"""Torch-free weights artifact: convert once offline, run inference with
torch provably absent (the reference needs torch + network in every run —
``bayesian_active_learning_imagenet.py:391``)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

MNIST_CKPT = "/root/reference/saved_checkpoints/mnist/checkpoint.pth.tar"

pytestmark = pytest.mark.skipif(
    not os.path.exists(MNIST_CKPT), reason="reference checkpoint not mounted"
)


def _convert(out):
    from network_interpretation_imagenet_tpu.cli import convert_checkpoint

    rc = convert_checkpoint.main([
        "--ckpt", MNIST_CKPT, "--arch", "mnist_cnn", "--dataset", "mnist",
        "--out", out, "--verify",
    ])
    assert rc == 0


def test_convert_cli_writes_verified_artifact(tmp_path):
    out = str(tmp_path / "artifact")
    _convert(out)
    assert os.path.isfile(os.path.join(out, "weights.msgpack"))
    with open(os.path.join(out, "meta.json")) as f:
        meta = json.load(f)
    assert meta["arch"] == "mnist_cnn"
    assert meta["format"] == "nit-weights-v1"

    # In-process load matches the torch-converted tree bit-exactly.
    import jax

    from network_interpretation_imagenet_tpu.utils import convert

    ref = convert.convert_checkpoint(MNIST_CKPT, "mnist_cnn")
    got, meta2 = convert.load_weights_artifact(out)
    assert meta2["arch"] == "mnist_cnn"
    ra, ga = jax.tree.leaves(ref), jax.tree.leaves(got)
    assert len(ra) == len(ga)
    for a, b in zip(ra, ga):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_runs_from_artifact_with_torch_blocked(tmp_path):
    """The whole inference path (build_engine → predict → masked evals) runs
    in a subprocess where importing torch RAISES — proving the artifact
    breaks the torch dependency, not merely avoids it."""
    out = str(tmp_path / "artifact")
    _convert(out)

    # Reference logits computed in THIS process (torch available).
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.models import create_model
    from network_interpretation_imagenet_tpu.saliency.engine import SaliencyEngine
    from network_interpretation_imagenet_tpu.utils import convert

    variables = convert.convert_checkpoint(MNIST_CKPT, "mnist_cnn")
    bundle = create_model("mnist_cnn", "mnist")
    engine = SaliencyEngine(bundle, variables, mask_batch=8,
                            compute_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    img = rng.rand(28, 28, 1).astype(np.float32)
    ref_logits = engine.predict(img[None])[0]

    script = f"""
import sys

class _TorchBlocker:
    def find_spec(self, name, path=None, target=None):
        if name == "torch" or name.startswith("torch."):
            raise ImportError("torch is BLOCKED in this process")

sys.meta_path.insert(0, _TorchBlocker())
sys.modules.pop("torch", None)

import argparse
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from network_interpretation_imagenet_tpu.cli import common

p = common.build_parser("t", dataset_default="mnist")
args = p.parse_args(["--arch", "mnist_cnn", "--dataset", "mnist",
                     "--ckpt", {out!r}, "--dtype", "float32",
                     "--mask-batch", "8"])
engine = common.build_engine(args)
rng = np.random.RandomState(0)
img = rng.rand(28, 28, 1).astype(np.float32)
logits = engine.predict(img[None])[0]
seg = rng.randint(0, 6, (28, 28)).astype(np.int32)
r = engine.eval_window_masks(img, seg, np.arange(4, dtype=np.int32), 2,
                             int(logits.argmax()))
assert r.survived.shape == (4,)
# torch must be genuinely un-importable here
try:
    import torch
    raise SystemExit("torch import unexpectedly succeeded")
except ImportError:
    pass
print("LOGITS", ",".join(f"{{x:.6f}}" for x in logits.tolist()))
"""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run([sys.executable, "-c", script], env=env,
                          capture_output=True, timeout=300)
    assert proc.returncode == 0, proc.stdout.decode() + proc.stderr.decode()
    line = [l for l in proc.stdout.decode().splitlines()
            if l.startswith("LOGITS")][0]
    sub_logits = np.array([float(x) for x in line.split(" ", 1)[1].split(",")])
    np.testing.assert_allclose(sub_logits, ref_logits, atol=1e-5)


def test_artifact_arch_mismatch_fails_loudly(tmp_path):
    out = str(tmp_path / "artifact")
    _convert(out)
    from network_interpretation_imagenet_tpu.cli import common

    p = common.build_parser("t", dataset_default="mnist")
    args = p.parse_args(["--arch", "resnet18", "--dataset", "mnist",
                         "--ckpt", out, "--dtype", "float32"])
    with pytest.raises(ValueError, match="arch 'mnist_cnn'"):
        common.build_engine(args)


def test_fetch_requires_network_or_known_arch(tmp_path):
    from network_interpretation_imagenet_tpu.cli import convert_checkpoint

    with pytest.raises(ValueError, match="no published torchvision URL"):
        convert_checkpoint.fetch_torchvision_checkpoint(
            "not_an_arch", str(tmp_path)
        )
