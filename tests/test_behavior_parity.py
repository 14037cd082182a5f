"""Behavioral parity fixtures (SURVEY §4): with the reference's shipped
checkpoints, the full mask→forward→label flow must produce the SAME survive
labels and matching probability-drop curves as a PyTorch evaluation of the
same masked images. This pins the end-to-end semantics, not just per-layer
logits."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from network_interpretation_imagenet_tpu.models import create_model  # noqa: E402
from network_interpretation_imagenet_tpu.ops import masking  # noqa: E402
from network_interpretation_imagenet_tpu.saliency import SaliencyEngine  # noqa: E402
from network_interpretation_imagenet_tpu.utils import convert  # noqa: E402
from tests.test_convert_parity import TorchMnistNet, TorchResNetCifar  # noqa: E402

MNIST_CKPT = "/root/reference/saved_checkpoints/mnist/checkpoint.pth.tar"
CIFAR_CKPT = "/root/reference/saved_checkpoints/cifar10+-resnet-56/model_best.pth.tar"


def _textured_image(rng, h, w, c):
    """Structured image that felzenszwalb splits into several segments."""
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (
        0.5
        + 0.4 * np.sin(yy / 4.0)[..., None] * np.cos(xx / 5.0)[..., None]
        + 0.1 * rng.rand(h, w, c)
    ).astype(np.float32)
    return np.clip(img, 0, 1)


@pytest.mark.skipif(not os.path.exists(MNIST_CKPT), reason="ckpt absent")
def test_mnist_knockout_labels_match_torch():
    rng = np.random.RandomState(0)
    img = _textured_image(rng, 28, 28, 1)
    # Deterministic 4x4 block segmentation (the parity claim is about the
    # mask->forward->label flow, not the segmenter).
    yy, xx = np.meshgrid(np.arange(28), np.arange(28), indexing="ij")
    seg = ((yy // 7) * 4 + (xx // 7)).astype(np.int32)
    s = int(seg.max()) + 1
    assert s == 16

    sd = convert.load_state_dict(MNIST_CKPT)
    # JAX path.
    bundle = create_model("mnist_cnn", "mnist")
    engine = SaliencyEngine(
        bundle, convert.convert_mnist_cnn(sd), mask_batch=8,
        compute_dtype=jnp.float32,
    )
    target, _ = engine.predict_one(img)
    knock_ids = rng.randint(0, s, size=(24, 1)).astype(np.int32)
    ours = engine.eval_knockout_masks(img, seg, knock_ids, target)

    # Torch oracle on identical masked images.
    tmodel = TorchMnistNet()
    tmodel.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in sd.items()})
    tmodel.eval()
    masks = np.asarray(masking.knockout_masks(jnp.asarray(seg), jnp.asarray(knock_ids)))
    t_labels, t_probs = [], []
    with torch.no_grad():
        for m in masks:
            masked = (img * m[:, :, None]).transpose(2, 0, 1)[None]
            logits = tmodel(torch.from_numpy(masked)).numpy()[0]
            t_labels.append(int(logits.argmax()) == target)
            e = np.exp(logits - logits.max())
            t_probs.append(float((e / e.sum())[target]))

    # Survive labels identical; probability-drop curve matches to tolerance.
    np.testing.assert_array_equal(ours.survived, t_labels)
    np.testing.assert_allclose(ours.prob_target, t_probs, atol=1e-3)


@pytest.mark.skipif(not os.path.exists(CIFAR_CKPT), reason="ckpt absent")
def test_cifar_window_labels_match_torch():
    rng = np.random.RandomState(1)
    img = _textured_image(rng, 32, 32, 3)
    # Normalized like the reference's CIFAR eval (mean/std).
    from network_interpretation_imagenet_tpu.config import CIFAR10_MEAN, CIFAR10_STD

    norm = (img - np.asarray(CIFAR10_MEAN, np.float32)) / np.asarray(
        CIFAR10_STD, np.float32
    )
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    seg = ((yy // 8) * 4 + (xx // 8)).astype(np.int32)
    s = int(seg.max()) + 1
    assert s == 16

    sd = convert.load_state_dict(CIFAR_CKPT)
    bundle = create_model("resnet", "cifar10", depth=56)
    engine = SaliencyEngine(
        bundle, convert.convert_resnet_cifar(sd, 56), mask_batch=8,
        compute_dtype=jnp.float32,
    )
    target, _ = engine.predict_one(norm)
    width = max(1, int(0.4 * s))
    firsts = np.arange(min(12, s), dtype=np.int32)
    ours = engine.eval_window_masks(norm, seg, firsts, width, target)

    tmodel = TorchResNetCifar(depth=56)
    tmodel.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in sd.items()})
    tmodel.eval()
    masks = np.asarray(masking.window_masks(jnp.asarray(seg), firsts, width))
    t_labels = []
    with torch.no_grad():
        for m in masks:
            masked = (norm * m[:, :, None]).transpose(2, 0, 1)[None]
            logits = tmodel(torch.from_numpy(masked)).numpy()[0]
            t_labels.append(int(logits.argmax()) == target)
    np.testing.assert_array_equal(ours.survived, t_labels)
