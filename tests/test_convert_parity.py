"""Golden parity: converted checkpoints must reproduce torch logits.

Strategy (SURVEY.md §4 "parity fixtures"): build torch replicas of the
reference architectures *in test code only*, load the reference's shipped
``.pth.tar`` checkpoints, and assert the converted Flax model matches torch
logits on random inputs to float tolerance. This validates both the model
re-implementations and the converter's layout mapping.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from network_interpretation_imagenet_tpu.models import create_model  # noqa: E402
from network_interpretation_imagenet_tpu.utils import convert  # noqa: E402

MNIST_CKPT = "/root/reference/saved_checkpoints/mnist/checkpoint.pth.tar"
CIFAR_CKPT = "/root/reference/saved_checkpoints/cifar10+-resnet-56/model_best.pth.tar"


# --- torch replicas (test-only; mirror reference architecture semantics) ----


def _conv_bn_relu(inp, out, stride=1):
    return tnn.Sequential(
        tnn.Conv2d(inp, out, 3, stride=stride, padding=1),
        tnn.BatchNorm2d(out),
        tnn.ReLU(True),
    )


class TorchMnistNet(tnn.Module):
    """Replica of reference Classification_Net (generate_gp_training_data_mnist.py:86-105)."""

    def __init__(self):
        super().__init__()
        self.conv1 = _conv_bn_relu(1, 32)
        self.conv2 = _conv_bn_relu(32, 32)
        self.conv3 = _conv_bn_relu(32, 64, stride=2)
        self.conv4 = _conv_bn_relu(64, 64)
        self.conv5 = _conv_bn_relu(64, 128, stride=2)
        self.conv6 = tnn.Conv2d(128, 128, 3, padding=1)
        self.fc1 = tnn.Linear(128, 10)

    def forward(self, x):
        x = self.conv2(self.conv1(x))
        x = self.conv4(self.conv3(x))
        x = self.conv6(self.conv5(x))
        f = x.mean(3).mean(2)
        return self.fc1(f)


class TorchDownsampleB(tnn.Module):
    """Replica of models/resnet.py:67-76."""

    def __init__(self, n_in, n_out, stride):
        super().__init__()
        self.avg = tnn.AvgPool2d(stride)
        self.ratio = n_out // n_in

    def forward(self, x):
        x = self.avg(x)
        return torch.cat([x] + [x * 0] * (self.ratio - 1), 1)


class TorchCifarBlock(tnn.Module):
    """Replica of BasicBlockWithDeathRate eval path (models/resnet.py:26-42)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        branch_in = x
        if self.downsample is not None:
            x = self.downsample(x)
        r = tF.relu(self.bn1(self.conv1(branch_in)))
        r = self.bn2(self.conv2(r))
        return tF.relu(x + r)


class TorchResNetCifar(tnn.Module):
    """Replica of ResNetCifar (models/resnet.py:79-146), eval semantics."""

    def __init__(self, depth=56, num_classes=10):
        super().__init__()
        n = (depth - 2) // 6
        self.conv1 = tnn.Conv2d(3, 16, 3, padding=1, bias=False)
        self.bn1 = tnn.BatchNorm2d(16)
        inplanes = 16
        layers = []
        for stage, planes in enumerate((16, 32, 64)):
            stride = 1 if stage == 0 else 2
            blocks = []
            for b in range(n):
                s = stride if b == 0 else 1
                ds = (
                    TorchDownsampleB(inplanes, planes, s)
                    if (s != 1 or inplanes != planes)
                    else None
                )
                blocks.append(TorchCifarBlock(inplanes, planes, s, ds))
                inplanes = planes
            layers.append(tnn.Sequential(*blocks))
        self.layer1, self.layer2, self.layer3 = layers
        self.avgpool = tnn.AvgPool2d(8)
        self.fc = tnn.Linear(64, num_classes)

    def forward(self, x):
        x = tF.relu(self.bn1(self.conv1(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


# --- tests -----------------------------------------------------------------


@pytest.mark.skipif(not os.path.exists(MNIST_CKPT), reason="reference ckpt absent")
def test_mnist_checkpoint_parity(rng):
    sd_np = convert.load_state_dict(MNIST_CKPT)
    tmodel = TorchMnistNet()
    tmodel.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}
    )
    tmodel.eval()

    bundle = create_model("mnist_cnn", "mnist")
    variables = convert.convert_mnist_cnn(sd_np)

    x = rng.rand(4, 1, 28, 28).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(not os.path.exists(CIFAR_CKPT), reason="reference ckpt absent")
def test_cifar_resnet56_checkpoint_parity(rng):
    sd_np = convert.load_state_dict(CIFAR_CKPT)
    tmodel = TorchResNetCifar(depth=56)
    tmodel.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in sd_np.items()})
    tmodel.eval()

    bundle = create_model("resnet", "cifar10", depth=56)
    variables = convert.convert_resnet_cifar(sd_np, depth=56)

    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(j_logits, t_logits, atol=5e-4, rtol=1e-3)
    # Predictions must agree exactly — downstream mask labels depend on argmax.
    np.testing.assert_array_equal(j_logits.argmax(-1), t_logits.argmax(-1))


def test_roundtrip_resnet18_random_weights(rng):
    """Converter structure check without a weights file: random torch resnet18
    replica → convert → flax logits match."""
    # Minimal torchvision-style resnet18 in torch:
    class TorchBasic(tnn.Module):
        def __init__(self, inp, planes, stride=1, downsample=False):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 3, stride=stride, padding=1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.downsample = None
            if downsample:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, planes, 1, stride=stride, bias=False),
                    tnn.BatchNorm2d(planes),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = tF.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return tF.relu(y + idt)

    class TorchResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, padding=1)
            self.layer1 = tnn.Sequential(TorchBasic(64, 64), TorchBasic(64, 64))
            self.layer2 = tnn.Sequential(
                TorchBasic(64, 128, 2, True), TorchBasic(128, 128)
            )
            self.layer3 = tnn.Sequential(
                TorchBasic(128, 256, 2, True), TorchBasic(256, 256)
            )
            self.layer4 = tnn.Sequential(
                TorchBasic(256, 512, 2, True), TorchBasic(512, 512)
            )
            self.fc = tnn.Linear(512, 1000)

        def forward(self, x):
            x = self.maxpool(tF.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(x.mean((2, 3)))

    tmodel = TorchResNet18()
    tmodel.eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
             if "num_batches_tracked" not in k}
    variables = convert.convert_resnet_imagenet(sd_np, "resnet18")
    bundle = create_model("resnet18", "imagenet")

    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(j_logits, t_logits, atol=1e-3, rtol=1e-3)


def test_densenet_roundtrip_random_weights(rng):
    """Reference-style DenseNet-BC (depth 10, k=12): torch replica → convert →
    flax logits match."""

    class TorchDenseLayer(tnn.Module):
        def __init__(self, inp, growth, bn_size):
            super().__init__()
            # Modern-torchvision undotted child names (current torch forbids
            # dots; the converter accepts both this and the reference-era
            # dotted 'norm.1' form).
            self.norm1 = tnn.BatchNorm2d(inp)
            self.conv1 = tnn.Conv2d(inp, bn_size * growth, 1, bias=False)
            self.norm2 = tnn.BatchNorm2d(bn_size * growth)
            self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1,
                                    bias=False)

        def forward(self, x):
            y = self.conv1(tF.relu(self.norm1(x)))
            y = self.conv2(tF.relu(self.norm2(y)))
            return torch.cat([x, y], 1)

    class TorchTransition(tnn.Module):
        def __init__(self, inp, out):
            super().__init__()
            self.norm = tnn.BatchNorm2d(inp)
            self.conv = tnn.Conv2d(inp, out, 1, bias=False)

        def forward(self, x):
            x = self.conv(tF.relu(self.norm(x)))
            return tF.avg_pool2d(x, 2)

    depth, growth, bn_size = 10, 12, 4
    n = ((depth - 4) // 3) // 2  # = 1 layer per block
    feats = 24

    class TorchDenseNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Module()
            self.features.add_module("conv0", tnn.Conv2d(3, feats, 3, padding=1, bias=False))
            self.features.add_module("norm0", tnn.BatchNorm2d(feats))
            f = feats
            for i in range(1, 4):
                block = tnn.Module()
                for j in range(1, n + 1):
                    block.add_module(f"denselayer{j}", TorchDenseLayer(f, growth, bn_size))
                    f += growth
                self.features.add_module(f"denseblock{i}", block)
                if i != 3:
                    out = int(f * 0.5)
                    self.features.add_module(f"transition{i}", TorchTransition(f, out))
                    f = out
            self.features.add_module("norm5", tnn.BatchNorm2d(f))
            self.classifier = tnn.Linear(f, 10)

        def forward(self, x):
            x = tF.relu(self.features.norm0(self.features.conv0(x)))
            for i in range(1, 4):
                block = getattr(self.features, f"denseblock{i}")
                for j in range(1, n + 1):
                    x = getattr(block, f"denselayer{j}")(x)
                if i != 3:
                    x = getattr(self.features, f"transition{i}")(x)
            x = tF.relu(self.features.norm5(x))
            x = tF.avg_pool2d(x, 8).flatten(1)
            return self.classifier(x)

    tmodel = TorchDenseNet().eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
             if "num_batches_tracked" not in k}
    variables = convert.convert_densenet(sd_np, depth=depth, bn_size=bn_size)
    bundle = create_model("densenet", "cifar10", depth=depth, bn_size=bn_size)

    x = rng.rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(j_logits, t_logits, atol=1e-3, rtol=1e-3)



def _structured_batch(rng, size=224):
    """Collage image — spatially structured so geometry bugs (stride/padding/
    pool) produce gross logit differences instead of near-constant outputs
    that sneak under tolerance."""
    img = np.ones((size, size, 3), np.float32) * rng.rand(3)
    for _ in range(30):
        y, x = rng.randint(0, size, 2)
        h, w = rng.randint(size // 10, size // 3, 2)
        img[y:y+h, x:x+w] = rng.rand(3)
    img += 0.05 * rng.randn(size, size, 3).astype(np.float32)
    return np.clip(img, 0, 1).transpose(2, 0, 1)[None].astype(np.float32)


def _assert_logit_parity(t_logits, j_logits, atol=2e-3):
    # Guard against the degenerate near-constant-output case that would let
    # geometry bugs pass tolerance.
    assert t_logits.std() > 1e-3, "oracle logits are near-constant"
    np.testing.assert_allclose(j_logits, t_logits, atol=atol, rtol=2e-3)
    np.testing.assert_array_equal(j_logits.argmax(-1), t_logits.argmax(-1))


def test_alexnet_roundtrip_random_weights(rng):
    """torchvision-layout AlexNet replica → convert → flax logits match.
    Input must be 224² (AdaptiveAvgPool2d((6,6)) is the identity there)."""
    tmodel = tnn.Sequential()
    tmodel.features = tnn.Sequential(
        tnn.Conv2d(3, 64, 11, stride=4, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
    )
    tmodel.classifier = tnn.Sequential(
        tnn.Dropout(), tnn.Linear(256 * 6 * 6, 4096), tnn.ReLU(),
        tnn.Dropout(), tnn.Linear(4096, 4096), tnn.ReLU(),
        tnn.Linear(4096, 1000),
    )

    def t_forward(x):
        x = tmodel.features(x)
        return tmodel.classifier(torch.flatten(x, 1))

    tmodel.eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert.convert_alexnet(sd_np)
    bundle = create_model("alexnet", "imagenet")

    x = _structured_batch(rng)
    with torch.no_grad():
        t_logits = t_forward(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(
        bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    _assert_logit_parity(t_logits, j_logits)


@pytest.mark.parametrize("version", ["1_0", "1_1"])
def test_squeezenet_roundtrip_random_weights(rng, version):
    """torchvision-layout SqueezeNet replica (incl. ceil-mode pools) →
    convert → flax logits match."""

    class TorchFire(tnn.Module):
        def __init__(self, inp, s, e1, e3):
            super().__init__()
            self.squeeze = tnn.Conv2d(inp, s, 1)
            self.expand1x1 = tnn.Conv2d(s, e1, 1)
            self.expand3x3 = tnn.Conv2d(s, e3, 3, padding=1)

        def forward(self, x):
            x = tF.relu(self.squeeze(x))
            return torch.cat(
                [tF.relu(self.expand1x1(x)), tF.relu(self.expand3x3(x))], 1
            )

    pool = lambda: tnn.MaxPool2d(3, 2, ceil_mode=True)
    if version == "1_0":
        feats = [
            tnn.Conv2d(3, 96, 7, stride=2), tnn.ReLU(), pool(),
            TorchFire(96, 16, 64, 64), TorchFire(128, 16, 64, 64),
            TorchFire(128, 32, 128, 128), pool(),
            TorchFire(256, 32, 128, 128), TorchFire(256, 48, 192, 192),
            TorchFire(384, 48, 192, 192), TorchFire(384, 64, 256, 256),
            pool(), TorchFire(512, 64, 256, 256),
        ]
    else:
        feats = [
            tnn.Conv2d(3, 64, 3, stride=2), tnn.ReLU(), pool(),
            TorchFire(64, 16, 64, 64), TorchFire(128, 16, 64, 64), pool(),
            TorchFire(128, 32, 128, 128), TorchFire(256, 32, 128, 128), pool(),
            TorchFire(256, 48, 192, 192), TorchFire(384, 48, 192, 192),
            TorchFire(384, 64, 256, 256), TorchFire(512, 64, 256, 256),
        ]
    tmodel = tnn.Sequential()
    tmodel.features = tnn.Sequential(*feats)
    tmodel.classifier = tnn.Sequential(
        tnn.Dropout(), tnn.Conv2d(512, 1000, 1), tnn.ReLU(),
        tnn.AdaptiveAvgPool2d((1, 1)),
    )

    def t_forward(x):
        return torch.flatten(tmodel.classifier(tmodel.features(x)), 1)

    tmodel.eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert.convert_squeezenet(sd_np, f"squeezenet{version}")
    bundle = create_model(f"squeezenet{version}", "imagenet")

    x = _structured_batch(rng)
    with torch.no_grad():
        t_logits = t_forward(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(
        bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    _assert_logit_parity(t_logits, j_logits)


def test_densenet121_torchvision_roundtrip_random_weights(rng):
    """torchvision-layout DenseNet-121 replica (7×7 stem, 4 blocks) →
    convert → flax logits match."""

    class TVDenseLayer(tnn.Module):
        def __init__(self, inp, growth, bn_size=4):
            super().__init__()
            self.norm1 = tnn.BatchNorm2d(inp)
            self.conv1 = tnn.Conv2d(inp, bn_size * growth, 1, bias=False)
            self.norm2 = tnn.BatchNorm2d(bn_size * growth)
            self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1,
                                    bias=False)

        def forward(self, x):
            y = self.conv1(tF.relu(self.norm1(x)))
            y = self.conv2(tF.relu(self.norm2(y)))
            return torch.cat([x, y], 1)

    class TVTransition(tnn.Module):
        def __init__(self, inp, out):
            super().__init__()
            self.norm = tnn.BatchNorm2d(inp)
            self.conv = tnn.Conv2d(inp, out, 1, bias=False)

        def forward(self, x):
            return tF.avg_pool2d(self.conv(tF.relu(self.norm(x))), 2)

    class TVDenseNet121(tnn.Module):
        def __init__(self, growth=32, cfg=(6, 12, 24, 16)):
            super().__init__()
            feats = tnn.Module()
            feats.conv0 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            feats.norm0 = tnn.BatchNorm2d(64)
            nf = 64
            for i, n_layers in enumerate(cfg, start=1):
                block = tnn.Module()
                for j in range(1, n_layers + 1):
                    setattr(block, f"denselayer{j}", TVDenseLayer(nf, growth))
                    nf += growth
                setattr(feats, f"denseblock{i}", block)
                if i != len(cfg):
                    setattr(feats, f"transition{i}", TVTransition(nf, nf // 2))
                    nf //= 2
            feats.norm5 = tnn.BatchNorm2d(nf)
            self.features = feats
            self.classifier = tnn.Linear(nf, 1000)
            self.cfg = cfg

        def forward(self, x):
            f = self.features
            x = tF.max_pool2d(tF.relu(f.norm0(f.conv0(x))), 3, 2, padding=1)
            for i in range(1, len(self.cfg) + 1):
                block = getattr(f, f"denseblock{i}")
                j = 1
                while hasattr(block, f"denselayer{j}"):
                    x = getattr(block, f"denselayer{j}")(x)
                    j += 1
                if hasattr(f, f"transition{i}"):
                    x = getattr(f, f"transition{i}")(x)
            x = tF.relu(f.norm5(x))
            x = tF.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
            return self.classifier(x)

    tmodel = TVDenseNet121()
    tmodel.eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
             if "num_batches_tracked" not in k}
    variables = convert.convert_densenet_torchvision(sd_np, "densenet121")
    bundle = create_model("densenet121", "imagenet")

    x = _structured_batch(rng)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(
        bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    _assert_logit_parity(t_logits, j_logits, atol=3e-3)


def test_inception_v3_roundtrip_random_weights(rng):
    """torchvision-layout Inception-v3 replica (BasicConv2d + Mixed_5b..7c,
    incl. the pretrained-model transform_input re-normalization) → convert →
    flax logits match at the native 299² input."""

    class TBasic(tnn.Module):
        def __init__(self, inp, out, **kw):
            super().__init__()
            self.conv = tnn.Conv2d(inp, out, bias=False, **kw)
            self.bn = tnn.BatchNorm2d(out, eps=0.001)

        def forward(self, x):
            return tF.relu(self.bn(self.conv(x)))

    class TIncA(tnn.Module):
        def __init__(self, inp, pool_features):
            super().__init__()
            self.branch1x1 = TBasic(inp, 64, kernel_size=1)
            self.branch5x5_1 = TBasic(inp, 48, kernel_size=1)
            self.branch5x5_2 = TBasic(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = TBasic(inp, 64, kernel_size=1)
            self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, padding=1)
            self.branch_pool = TBasic(inp, pool_features, kernel_size=1)

        def forward(self, x):
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = self.branch_pool(tF.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([self.branch1x1(x), b5, bd, bp], 1)

    class TIncB(tnn.Module):
        def __init__(self, inp):
            super().__init__()
            self.branch3x3 = TBasic(inp, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = TBasic(inp, 64, kernel_size=1)
            self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            return torch.cat(
                [self.branch3x3(x), bd, tF.max_pool2d(x, 3, stride=2)], 1
            )

    class TIncC(tnn.Module):
        def __init__(self, inp, c7):
            super().__init__()
            self.branch1x1 = TBasic(inp, 192, kernel_size=1)
            self.branch7x7_1 = TBasic(inp, c7, kernel_size=1)
            self.branch7x7_2 = TBasic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = TBasic(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = TBasic(inp, c7, kernel_size=1)
            self.branch7x7dbl_2 = TBasic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = TBasic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = TBasic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = TBasic(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = TBasic(inp, 192, kernel_size=1)

        def forward(self, x):
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            bp = self.branch_pool(tF.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([self.branch1x1(x), b7, bd, bp], 1)

    class TIncD(tnn.Module):
        def __init__(self, inp):
            super().__init__()
            self.branch3x3_1 = TBasic(inp, 192, kernel_size=1)
            self.branch3x3_2 = TBasic(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = TBasic(inp, 192, kernel_size=1)
            self.branch7x7x3_2 = TBasic(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = TBasic(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = TBasic(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3_2(self.branch3x3_1(x))
            b7 = self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x))))
            return torch.cat([b3, b7, tF.max_pool2d(x, 3, stride=2)], 1)

    class TIncE(tnn.Module):
        def __init__(self, inp):
            super().__init__()
            self.branch1x1 = TBasic(inp, 320, kernel_size=1)
            self.branch3x3_1 = TBasic(inp, 384, kernel_size=1)
            self.branch3x3_2a = TBasic(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = TBasic(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = TBasic(inp, 448, kernel_size=1)
            self.branch3x3dbl_2 = TBasic(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = TBasic(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = TBasic(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = TBasic(inp, 192, kernel_size=1)

        def forward(self, x):
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            bp = self.branch_pool(tF.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([self.branch1x1(x), b3, bd, bp], 1)

    class TInception3(tnn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = TBasic(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = TBasic(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = TBasic(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = TBasic(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = TBasic(80, 192, kernel_size=3)
            self.Mixed_5b = TIncA(192, 32)
            self.Mixed_5c = TIncA(256, 64)
            self.Mixed_5d = TIncA(288, 64)
            self.Mixed_6a = TIncB(288)
            self.Mixed_6b = TIncC(768, 128)
            self.Mixed_6c = TIncC(768, 160)
            self.Mixed_6d = TIncC(768, 160)
            self.Mixed_6e = TIncC(768, 192)
            self.Mixed_7a = TIncD(768)
            self.Mixed_7b = TIncE(1280)
            self.Mixed_7c = TIncE(2048)
            self.fc = tnn.Linear(2048, 1000)

        def forward(self, x):
            # torchvision Inception3._transform_input (transform_input=True,
            # as the pretrained factory sets it — mirrored by create_model).
            x = torch.stack(
                [
                    x[:, 0] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
                    x[:, 1] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
                    x[:, 2] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5,
                ],
                1,
            )
            x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
            x = tF.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
            x = tF.max_pool2d(x, 3, stride=2)
            for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                         "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                         "Mixed_7a", "Mixed_7b", "Mixed_7c"):
                x = getattr(self, name)(x)
            x = tF.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
            return self.fc(x)

    tmodel = TInception3()
    tmodel.eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
             if "num_batches_tracked" not in k}
    # The real torchvision state dict carries a train-only AuxLogits head;
    # the converter must skip it.
    sd_np["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
    sd_np["AuxLogits.fc.weight"] = np.zeros((1000, 768), np.float32)
    variables = convert.convert_inception(sd_np)
    bundle = create_model("inception_v3", "imagenet")
    assert bundle.input_size == 299

    x = _structured_batch(rng, size=299)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(
        bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    _assert_logit_parity(t_logits, j_logits, atol=3e-3)


@pytest.mark.parametrize("arch,groups,base_width", [
    ("resnext50_32x4d", 32, 4),
    ("wide_resnet50_2", 1, 128),
])
def test_grouped_wide_resnet_roundtrip_random_weights(rng, arch, groups, base_width):
    """ResNeXt / Wide-ResNet (torchvision resnet.py factory args): random
    torch replica with grouped 3x3 bottlenecks → convert → flax logits match.
    Grouped conv kernels keep torch's (O, I/groups, H, W) layout, so the
    standard conv transpose applies unchanged."""

    class TorchBottleneck(tnn.Module):
        def __init__(self, inp, planes, stride=1, downsample=False):
            super().__init__()
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = tnn.Conv2d(inp, width, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(width)
            self.conv2 = tnn.Conv2d(width, width, 3, stride=stride, padding=1,
                                    groups=groups, bias=False)
            self.bn2 = tnn.BatchNorm2d(width)
            self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = None
            if downsample:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(inp, planes * 4, 1, stride=stride, bias=False),
                    tnn.BatchNorm2d(planes * 4),
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = tF.relu(self.bn1(self.conv1(x)))
            y = tF.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return tF.relu(y + idt)

    class TorchNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, padding=1)
            layers = []
            inp = 64
            for li, (planes, blocks, stride) in enumerate(
                ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2))
            ):
                stage = [TorchBottleneck(inp, planes, stride, True)]
                inp = planes * 4
                stage += [TorchBottleneck(inp, planes) for _ in range(blocks - 1)]
                setattr(self, f"layer{li + 1}", tnn.Sequential(*stage))
            self.fc = tnn.Linear(2048, 1000)

        def forward(self, x):
            x = self.maxpool(tF.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(x.mean((2, 3)))

    tmodel = TorchNet()
    tmodel.eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
             if "num_batches_tracked" not in k}
    variables = convert.convert_resnet_imagenet(sd_np, arch)
    bundle = create_model(arch, "imagenet")

    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-3, rtol=1e-3)


def test_mobilenet_v2_roundtrip_random_weights(rng):
    """MobileNetV2 (torchvision graph): random torch replica (inverted
    residuals, ReLU6, depthwise groups) → convert → flax logits match."""

    class TorchConvBNReLU(tnn.Sequential):
        def __init__(self, inp, oup, kernel=3, stride=1, groups=1):
            pad = (kernel - 1) // 2
            super().__init__(
                tnn.Conv2d(inp, oup, kernel, stride, pad, groups=groups,
                           bias=False),
                tnn.BatchNorm2d(oup),
                tnn.ReLU6(inplace=True),
            )

    class TorchInvertedResidual(tnn.Module):
        def __init__(self, inp, oup, stride, expand_ratio):
            super().__init__()
            hidden = int(round(inp * expand_ratio))
            self.use_res = stride == 1 and inp == oup
            layers = []
            if expand_ratio != 1:
                layers.append(TorchConvBNReLU(inp, hidden, kernel=1))
            layers += [
                TorchConvBNReLU(hidden, hidden, stride=stride, groups=hidden),
                tnn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
                tnn.BatchNorm2d(oup),
            ]
            self.conv = tnn.Sequential(*layers)

        def forward(self, x):
            return x + self.conv(x) if self.use_res else self.conv(x)

    class TorchMobileNetV2(tnn.Module):
        def __init__(self):
            super().__init__()
            settings = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                        (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                        (6, 320, 1, 1)]
            features = [TorchConvBNReLU(3, 32, stride=2)]
            c_in = 32
            for t, c, n, s in settings:
                for b in range(n):
                    features.append(TorchInvertedResidual(
                        c_in, c, s if b == 0 else 1, t))
                    c_in = c
            features.append(TorchConvBNReLU(c_in, 1280, kernel=1))
            self.features = tnn.Sequential(*features)
            self.classifier = tnn.Sequential(
                tnn.Dropout(0.2), tnn.Linear(1280, 1000))

        def forward(self, x):
            x = self.features(x).mean((2, 3))
            return self.classifier(x)

    tmodel = TorchMobileNetV2()
    tmodel.eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
             if "num_batches_tracked" not in k}
    variables = convert.convert_mobilenet_v2(sd_np)
    bundle = create_model("mobilenet_v2", "imagenet")

    x = rng.rand(1, 3, 96, 96).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-3, rtol=1e-3)


def test_googlenet_roundtrip_random_weights(rng):
    """GoogLeNet (torchvision graph incl. ceil-mode pools, 3x3 "5x5"
    branches, transform_input): random torch replica → convert → flax
    logits match at 224²."""

    class TBasicConv(tnn.Module):
        def __init__(self, inp, oup, **kw):
            super().__init__()
            self.conv = tnn.Conv2d(inp, oup, bias=False, **kw)
            self.bn = tnn.BatchNorm2d(oup, eps=0.001)

        def forward(self, x):
            return tF.relu(self.bn(self.conv(x)))

    class TInception(tnn.Module):
        def __init__(self, inp, ch1x1, ch3x3red, ch3x3, ch5x5red, ch5x5, pool_proj):
            super().__init__()
            self.branch1 = TBasicConv(inp, ch1x1, kernel_size=1)
            self.branch2 = tnn.Sequential(
                TBasicConv(inp, ch3x3red, kernel_size=1),
                TBasicConv(ch3x3red, ch3x3, kernel_size=3, padding=1))
            self.branch3 = tnn.Sequential(
                TBasicConv(inp, ch5x5red, kernel_size=1),
                TBasicConv(ch5x5red, ch5x5, kernel_size=3, padding=1))
            self.branch4 = tnn.Sequential(
                tnn.MaxPool2d(3, stride=1, padding=1, ceil_mode=True),
                TBasicConv(inp, pool_proj, kernel_size=1))

        def forward(self, x):
            return torch.cat([self.branch1(x), self.branch2(x),
                              self.branch3(x), self.branch4(x)], 1)

    class TGoogLeNet(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = TBasicConv(3, 64, kernel_size=7, stride=2, padding=3)
            self.maxpool1 = tnn.MaxPool2d(3, stride=2, ceil_mode=True)
            self.conv2 = TBasicConv(64, 64, kernel_size=1)
            self.conv3 = TBasicConv(64, 192, kernel_size=3, padding=1)
            self.maxpool2 = tnn.MaxPool2d(3, stride=2, ceil_mode=True)
            self.inception3a = TInception(192, 64, 96, 128, 16, 32, 32)
            self.inception3b = TInception(256, 128, 128, 192, 32, 96, 64)
            self.maxpool3 = tnn.MaxPool2d(3, stride=2, ceil_mode=True)
            self.inception4a = TInception(480, 192, 96, 208, 16, 48, 64)
            self.inception4b = TInception(512, 160, 112, 224, 24, 64, 64)
            self.inception4c = TInception(512, 128, 128, 256, 24, 64, 64)
            self.inception4d = TInception(512, 112, 144, 288, 32, 64, 64)
            self.inception4e = TInception(528, 256, 160, 320, 32, 128, 128)
            self.maxpool4 = tnn.MaxPool2d(2, stride=2, ceil_mode=True)
            self.inception5a = TInception(832, 256, 160, 320, 32, 128, 128)
            self.inception5b = TInception(832, 384, 192, 384, 48, 128, 128)
            self.fc = tnn.Linear(1024, 1000)

        def forward(self, x):
            # torchvision _transform_input (pretrained factory default)
            x = torch.cat([
                x[:, 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
                x[:, 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
                x[:, 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5,
            ], 1)
            x = self.maxpool1(self.conv1(x))
            x = self.maxpool2(self.conv3(self.conv2(x)))
            x = self.maxpool3(self.inception3b(self.inception3a(x)))
            x = self.inception4e(self.inception4d(self.inception4c(
                self.inception4b(self.inception4a(x)))))
            x = self.maxpool4(x)
            x = self.inception5b(self.inception5a(x))
            return self.fc(x.mean((2, 3)))

    tmodel = TGoogLeNet()
    tmodel.eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
             if "num_batches_tracked" not in k}
    variables = convert.convert_googlenet(sd_np)
    bundle = create_model("googlenet", "imagenet")

    x = rng.rand(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-3, rtol=1e-3)


def test_shufflenet_v2_roundtrip_random_weights(rng):
    """ShuffleNetV2 x1.0 (torchvision graph: channel split/shuffle units,
    depthwise branches): random torch replica → convert → flax logits match."""

    def channel_shuffle_t(x, groups):
        b, c, h, w = x.size()
        x = x.view(b, groups, c // groups, h, w).transpose(1, 2).contiguous()
        return x.view(b, c, h, w)

    class TUnit(tnn.Module):
        def __init__(self, inp, oup, stride):
            super().__init__()
            self.stride = stride
            bf = oup // 2
            if stride > 1:
                self.branch1 = tnn.Sequential(
                    tnn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
                    tnn.BatchNorm2d(inp),
                    tnn.Conv2d(inp, bf, 1, bias=False),
                    tnn.BatchNorm2d(bf),
                    tnn.ReLU(inplace=True),
                )
            else:
                self.branch1 = tnn.Sequential()
            b2_in = inp if stride > 1 else bf
            self.branch2 = tnn.Sequential(
                tnn.Conv2d(b2_in, bf, 1, bias=False),
                tnn.BatchNorm2d(bf),
                tnn.ReLU(inplace=True),
                tnn.Conv2d(bf, bf, 3, stride, 1, groups=bf, bias=False),
                tnn.BatchNorm2d(bf),
                tnn.Conv2d(bf, bf, 1, bias=False),
                tnn.BatchNorm2d(bf),
                tnn.ReLU(inplace=True),
            )

        def forward(self, x):
            if self.stride == 1:
                x1, x2 = x.chunk(2, dim=1)
                out = torch.cat((x1, self.branch2(x2)), dim=1)
            else:
                out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
            return channel_shuffle_t(out, 2)

    class TShuffleNetV2(tnn.Module):
        def __init__(self):
            super().__init__()
            so = (24, 116, 232, 464, 1024)
            self.conv1 = tnn.Sequential(
                tnn.Conv2d(3, so[0], 3, 2, 1, bias=False),
                tnn.BatchNorm2d(so[0]), tnn.ReLU(inplace=True))
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            c_in = so[0]
            for si, (reps, c_out) in enumerate(zip((4, 8, 4), so[1:4]), 2):
                units = [TUnit(c_in, c_out, 2)]
                c_in = c_out
                units += [TUnit(c_in, c_out, 1) for _ in range(reps - 1)]
                setattr(self, f"stage{si}", tnn.Sequential(*units))
            self.conv5 = tnn.Sequential(
                tnn.Conv2d(c_in, so[4], 1, bias=False),
                tnn.BatchNorm2d(so[4]), tnn.ReLU(inplace=True))
            self.fc = tnn.Linear(so[4], 1000)

        def forward(self, x):
            x = self.maxpool(self.conv1(x))
            x = self.stage4(self.stage3(self.stage2(x)))
            return self.fc(self.conv5(x).mean([2, 3]))

    tmodel = TShuffleNetV2()
    tmodel.eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
             if "num_batches_tracked" not in k}
    variables = convert.convert_shufflenet_v2(sd_np)
    bundle = create_model("shufflenet_v2_x1_0", "imagenet")

    x = rng.rand(1, 3, 96, 96).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-3, rtol=1e-3)


def test_mnasnet_roundtrip_random_weights(rng):
    """MNASNet 1.0 (torchvision graph: MBConv stacks, 5x5 depthwise):
    random torch replica → convert → flax logits match."""

    class TInv(tnn.Module):
        def __init__(self, inp, oup, k, stride, exp):
            super().__init__()
            mid = inp * exp
            self.apply_residual = inp == oup and stride == 1
            self.layers = tnn.Sequential(
                tnn.Conv2d(inp, mid, 1, bias=False),
                tnn.BatchNorm2d(mid), tnn.ReLU(inplace=True),
                tnn.Conv2d(mid, mid, k, padding=k // 2, stride=stride,
                           groups=mid, bias=False),
                tnn.BatchNorm2d(mid), tnn.ReLU(inplace=True),
                tnn.Conv2d(mid, oup, 1, bias=False),
                tnn.BatchNorm2d(oup),
            )

        def forward(self, x):
            y = self.layers(x)
            return x + y if self.apply_residual else y

    def stack(inp, oup, k, stride, exp, repeats):
        units = [TInv(inp, oup, k, stride, exp)]
        units += [TInv(oup, oup, k, 1, exp) for _ in range(repeats - 1)]
        return tnn.Sequential(*units)

    class TMNASNet(tnn.Module):
        def __init__(self):
            super().__init__()
            d = [32, 16, 24, 40, 80, 96, 192, 320]
            self.layers = tnn.Sequential(
                tnn.Conv2d(3, d[0], 3, padding=1, stride=2, bias=False),
                tnn.BatchNorm2d(d[0]), tnn.ReLU(inplace=True),
                tnn.Conv2d(d[0], d[0], 3, padding=1, groups=d[0], bias=False),
                tnn.BatchNorm2d(d[0]), tnn.ReLU(inplace=True),
                tnn.Conv2d(d[0], d[1], 1, bias=False),
                tnn.BatchNorm2d(d[1]),
                stack(d[1], d[2], 3, 2, 3, 3),
                stack(d[2], d[3], 5, 2, 3, 3),
                stack(d[3], d[4], 5, 2, 6, 3),
                stack(d[4], d[5], 3, 1, 6, 2),
                stack(d[5], d[6], 5, 2, 6, 4),
                stack(d[6], d[7], 3, 1, 6, 1),
                tnn.Conv2d(d[7], 1280, 1, bias=False),
                tnn.BatchNorm2d(1280), tnn.ReLU(inplace=True),
            )
            self.classifier = tnn.Sequential(
                tnn.Dropout(0.2), tnn.Linear(1280, 1000))

        def forward(self, x):
            return self.classifier(self.layers(x).mean([2, 3]))

    tmodel = TMNASNet()
    tmodel.eval()
    sd_np = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
             if "num_batches_tracked" not in k}
    variables = convert.convert_mnasnet(sd_np)
    bundle = create_model("mnasnet1_0", "imagenet")

    # sanity: alpha parsing reproduces torchvision depths at 1.0
    from network_interpretation_imagenet_tpu.models.mnasnet import get_depths
    assert get_depths(1.0) == [32, 16, 24, 40, 80, 96, 192, 320]
    assert get_depths(0.5) == [16, 8, 16, 24, 40, 48, 96, 160]

    x = rng.rand(1, 3, 96, 96).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(bundle.logits(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(j_logits, t_logits, atol=2e-3, rtol=1e-3)
