"""PyTorch ``.pth.tar`` → Flax variables converters.

Ingests the reference's shipped checkpoints
(``saved_checkpoints/mnist/checkpoint.pth.tar``,
``saved_checkpoints/cifar10+-resnet-56/model_best.pth.tar`` — loaded by
``generate_gp_training_data_mnist.py:157-158`` /
``generate_gp_training_data_cifar.py:249-250``) and torchvision-format
state_dicts for the ImageNet zoo, producing NHWC Flax params + batch_stats.

Layout rules:
  * Conv weight  torch [O, I, kH, kW] → flax [kH, kW, I, O]
  * Dense weight torch [O, I]         → flax [I, O]
  * BatchNorm: weight→scale, bias→bias, running_mean/var→batch_stats

torch is only needed to *read* the pickle; all downstream compute is JAX.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a ``.pth.tar`` and return a flat name→numpy dict.

    Handles the reference's two wrapper formats: ``{'model': sd}`` (MNIST)
    and ``{'state_dict': sd}`` with ``module.``-prefixed DataParallel keys
    (CIFAR, reference ``generate_gp_training_data_cifar.py:75-78``).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict):
        sd = blob.get("model") or blob.get("state_dict") or blob
    else:
        sd = blob
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


class _TreeBuilder:
    """Accumulates (path, array) pairs into flax's nested-dict variables."""

    def __init__(self) -> None:
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}

    def _put(self, root: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
        node = root
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def conv(self, sd: Mapping[str, np.ndarray], torch_name: str, *flax_path: str):
        self._put(self.params, (*flax_path, "kernel"), _conv_w(sd[torch_name + ".weight"]))
        if torch_name + ".bias" in sd:
            self._put(self.params, (*flax_path, "bias"), sd[torch_name + ".bias"])

    def dense(self, sd: Mapping[str, np.ndarray], torch_name: str, *flax_path: str):
        self._put(self.params, (*flax_path, "kernel"), _dense_w(sd[torch_name + ".weight"]))
        if torch_name + ".bias" in sd:
            self._put(self.params, (*flax_path, "bias"), sd[torch_name + ".bias"])

    def bn(self, sd: Mapping[str, np.ndarray], torch_name: str, *flax_path: str):
        self._put(self.params, (*flax_path, "scale"), sd[torch_name + ".weight"])
        self._put(self.params, (*flax_path, "bias"), sd[torch_name + ".bias"])
        self._put(self.stats, (*flax_path, "mean"), sd[torch_name + ".running_mean"])
        self._put(self.stats, (*flax_path, "var"), sd[torch_name + ".running_var"])

    def variables(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {"params": self.params}
        if self.stats:
            out["batch_stats"] = self.stats
        return out


def convert_mnist_cnn(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ``Classification_Net`` → :class:`models.MnistCNN`.

    torch names: ``conv{1..5}.0`` (conv) / ``conv{1..5}.1`` (bn), bare
    ``conv6``, ``fc1`` (``generate_gp_training_data_mnist.py:86-95``).
    """
    tb = _TreeBuilder()
    for i in range(1, 6):
        tb.conv(sd, f"conv{i}.0", f"conv{i}", "Conv_0")
        tb.bn(sd, f"conv{i}.1", f"conv{i}", "BatchNorm_0")
    tb.conv(sd, "conv6", "conv6")
    tb.dense(sd, "fc1", "fc1")
    return tb.variables()


def convert_resnet_cifar(sd: Mapping[str, np.ndarray], depth: int) -> Dict[str, Any]:
    """Reference ``ResNetCifar`` state dict → :class:`models.ResNetCifar`.

    torch names: ``conv1``, ``bn1``, ``layer{1..3}.{b}.{conv1,bn1,conv2,bn2}``,
    ``fc`` (``models/resnet.py:79-131``; ``DownsampleB`` is parameter-free).
    """
    n = (depth - 2) // 6
    tb = _TreeBuilder()
    tb.conv(sd, "conv1", "conv1")
    tb.bn(sd, "bn1", "bn1")
    for stage in range(1, 4):
        for b in range(n):
            for mod in ("conv1", "conv2"):
                tb.conv(sd, f"layer{stage}.{b}.{mod}", f"layer{stage}_{b}", mod)
            for mod in ("bn1", "bn2"):
                tb.bn(sd, f"layer{stage}.{b}.{mod}", f"layer{stage}_{b}", mod)
    tb.dense(sd, "fc", "fc")
    return tb.variables()


def convert_resnet_imagenet(sd: Mapping[str, np.ndarray], arch: str) -> Dict[str, Any]:
    """torchvision ResNet state dict → :class:`models.resnet_imagenet.ResNet`."""
    from network_interpretation_imagenet_tpu.models.resnet_imagenet import _CONFIGS

    block, stages = _CONFIGS[arch]
    bottleneck = block.__name__ == "Bottleneck"
    tb = _TreeBuilder()
    tb.conv(sd, "conv1", "conv1")
    tb.bn(sd, "bn1", "bn1")
    for stage, num_blocks in enumerate(stages, start=1):
        for b in range(num_blocks):
            prefix = f"layer{stage}.{b}"
            flax_block = f"layer{stage}_{b}"
            n_convs = 3 if bottleneck else 2
            for ci in range(1, n_convs + 1):
                tb.conv(sd, f"{prefix}.conv{ci}", flax_block, f"conv{ci}")
                tb.bn(sd, f"{prefix}.bn{ci}", flax_block, f"bn{ci}")
            if f"{prefix}.downsample.0.weight" in sd:
                tb.conv(sd, f"{prefix}.downsample.0", flax_block, "downsample_conv")
                tb.bn(sd, f"{prefix}.downsample.1", flax_block, "downsample_bn")
    tb.dense(sd, "fc", "fc")
    return tb.variables()


def convert_densenet(
    sd: Mapping[str, np.ndarray], depth: int = 100, bn_size: int = 4
) -> Dict[str, Any]:
    """Reference DenseNet-BC state dict → :class:`models.DenseNet`.

    torch names (``models/densenet.py:12-91``): ``features.conv0``,
    ``features.norm0``, ``features.denseblock{i}.denselayer{j}.{norm.1,conv.1,
    norm.2,conv.2}``, ``features.transition{i}.{norm,conv}``,
    ``features.norm5``, ``classifier``.
    """
    n = (depth - 4) // 3
    if bn_size > 0:
        n //= 2

    def pick(*candidates):
        """Old torchvision uses dotted child names ('norm.1' — what the
        reference's era produces); modern torchvision uses 'norm1'."""
        for c in candidates:
            if c + ".weight" in sd:
                return c
        raise KeyError(candidates)

    tb = _TreeBuilder()
    tb.conv(sd, "features.conv0", "conv0")
    tb.bn(sd, "features.norm0", "norm0")
    for i in range(1, 4):
        for j in range(1, n + 1):
            t = f"features.denseblock{i}.denselayer{j}"
            f = f"denseblock{i}_layer{j}"
            tb.bn(sd, pick(f"{t}.norm.1", f"{t}.norm1"), f, "norm1")
            tb.conv(sd, pick(f"{t}.conv.1", f"{t}.conv1"), f, "conv1")
            if bn_size > 0:
                tb.bn(sd, pick(f"{t}.norm.2", f"{t}.norm2"), f, "norm2")
                tb.conv(sd, pick(f"{t}.conv.2", f"{t}.conv2"), f, "conv2")
        if i != 3:
            tb.bn(sd, f"features.transition{i}.norm", f"transition{i}", "norm")
            tb.conv(sd, f"features.transition{i}.conv", f"transition{i}", "conv")
    tb.bn(sd, "features.norm5", "norm5")
    tb.dense(sd, "classifier", "classifier")
    return tb.variables()


def convert_vgg(sd: Mapping[str, np.ndarray], arch: str) -> Dict[str, Any]:
    """torchvision VGG state dict → :class:`models.VGG`."""
    from network_interpretation_imagenet_tpu.models.vgg import _CFGS

    batch_norm = arch.endswith("_bn")
    base = arch[:-3] if batch_norm else arch
    cfg = _CFGS[base]
    tb = _TreeBuilder()
    conv_i = 0
    feat_i = 0
    for v in cfg:
        if v == "M":
            feat_i += 1
            continue
        tb.conv(sd, f"features.{feat_i}", f"conv{conv_i}")
        feat_i += 1
        if batch_norm:
            tb.bn(sd, f"features.{feat_i}", f"bn{conv_i}")
            feat_i += 1
        feat_i += 1  # ReLU
        conv_i += 1
    for out_i, cls_i in enumerate((0, 3, 6)):
        tb.dense(sd, f"classifier.{cls_i}", f"fc{out_i}")
    return tb.variables()


def convert_densenet_torchvision(
    sd: Mapping[str, np.ndarray], arch: str
) -> Dict[str, Any]:
    """torchvision DenseNet-121/169/201 state dict →
    :class:`models.densenet.DenseNet` (imagenet_stem variant).

    Same feature-tree naming as the reference DenseNet-BC but with 4 blocks
    of torchvision's block configs; final norm is ``features.norm5`` in every
    variant."""
    from network_interpretation_imagenet_tpu.models.densenet import _TV_CONFIGS

    def pick(*candidates):
        for c in candidates:
            if c + ".weight" in sd:
                return c
        raise KeyError(candidates)

    tb = _TreeBuilder()
    tb.conv(sd, "features.conv0", "conv0")
    tb.bn(sd, "features.norm0", "norm0")
    cfg = _TV_CONFIGS[arch]
    for i, n_layers in enumerate(cfg, start=1):
        for j in range(1, n_layers + 1):
            t = f"features.denseblock{i}.denselayer{j}"
            f = f"denseblock{i}_layer{j}"
            tb.bn(sd, pick(f"{t}.norm.1", f"{t}.norm1"), f, "norm1")
            tb.conv(sd, pick(f"{t}.conv.1", f"{t}.conv1"), f, "conv1")
            tb.bn(sd, pick(f"{t}.norm.2", f"{t}.norm2"), f, "norm2")
            tb.conv(sd, pick(f"{t}.conv.2", f"{t}.conv2"), f, "conv2")
        if i != len(cfg):
            tb.bn(sd, f"features.transition{i}.norm", f"transition{i}", "norm")
            tb.conv(sd, f"features.transition{i}.conv", f"transition{i}", "conv")
    tb.bn(sd, "features.norm5", "norm5")
    tb.dense(sd, "classifier", "classifier")
    return tb.variables()


def convert_alexnet(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision AlexNet state dict → :class:`models.alexnet.AlexNet`.

    torch layout: ``features.{0,3,6,8,10}`` convs,
    ``classifier.{1,4,6}`` linears (0/3 are Dropout)."""
    tb = _TreeBuilder()
    for out_i, feat_i in enumerate((0, 3, 6, 8, 10)):
        tb.conv(sd, f"features.{feat_i}", f"conv{out_i}")
    for out_i, cls_i in enumerate((1, 4, 6)):
        tb.dense(sd, f"classifier.{cls_i}", f"fc{out_i}")
    return tb.variables()


def convert_squeezenet(sd: Mapping[str, np.ndarray], arch: str) -> Dict[str, Any]:
    """torchvision SqueezeNet state dict →
    :class:`models.squeezenet.SqueezeNet`.

    torch layout: ``features.0`` stem conv; Fire modules at features indices
    (3,4,5,7,8,9,10,12) for 1_0 and (3,4,6,7,9,10,11,12) for 1_1, each with
    ``.squeeze/.expand1x1/.expand3x3``; ``classifier.1`` final 1×1 conv."""
    fire_idx = (3, 4, 5, 7, 8, 9, 10, 12) if arch.endswith("1_0") else (
        3, 4, 6, 7, 9, 10, 11, 12)
    tb = _TreeBuilder()
    tb.conv(sd, "features.0", "conv0")
    for out_i, feat_i in enumerate(fire_idx):
        for part in ("squeeze", "expand1x1", "expand3x3"):
            tb.conv(sd, f"features.{feat_i}.{part}", f"fire{out_i}", part)
    tb.conv(sd, "classifier.1", "classifier")
    return tb.variables()


def convert_mobilenet_v2(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision MobileNetV2 state dict → :class:`models.MobileNetV2`.

    torch names: ``features.0.{0,1}`` stem ConvBNReLU, per-block
    ``features.{i}.conv.{j}[.{0,1}]`` (nested ConvBNReLU children for the
    expand/depthwise stages, bare conv + BN for the linear projection),
    ``features.18.{0,1}``, ``classifier.1``. Depthwise kernels keep torch's
    (C, 1, kh, kw) layout so the standard conv transpose applies.
    """
    from network_interpretation_imagenet_tpu.models.mobilenet import _SETTINGS

    tb = _TreeBuilder()
    tb.conv(sd, "features.0.0", "features_0", "0")
    tb.bn(sd, "features.0.1", "features_0", "1")
    idx = 1
    for t, _c, n, _s in _SETTINGS:
        for _b in range(n):
            f, p = f"features_{idx}", f"features.{idx}.conv"
            j = 0
            if t != 1:  # pointwise expand ConvBNReLU
                tb.conv(sd, f"{p}.0.0", f, "conv_0", "0")
                tb.bn(sd, f"{p}.0.1", f, "conv_0", "1")
                j = 1
            tb.conv(sd, f"{p}.{j}.0", f, f"conv_{j}", "0")  # depthwise
            tb.bn(sd, f"{p}.{j}.1", f, f"conv_{j}", "1")
            tb.conv(sd, f"{p}.{j + 1}", f, f"conv_{j + 1}")  # projection
            tb.bn(sd, f"{p}.{j + 2}", f, f"conv_{j + 2}")
            idx += 1
    tb.conv(sd, f"features.{idx}.0", f"features_{idx}", "0")
    tb.bn(sd, f"features.{idx}.1", f"features_{idx}", "1")
    tb.dense(sd, "classifier.1", "classifier_1")
    return tb.variables()


def convert_inception(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision Inception-v3 state dict →
    :class:`models.inception.InceptionV3`.

    The flax module names mirror torchvision's exactly
    (``Conv2d_1a_3x3`` … ``Mixed_7c``, each BasicConv2d a ``conv``/``bn``
    pair), so conversion is mechanical: walk every ``*.conv.weight`` /
    ``*.bn.*`` key. The train-only ``AuxLogits.*`` head is skipped (the
    inference graph omits it — see models/inception.py)."""
    tb = _TreeBuilder()
    for key in sd:
        if key.startswith("AuxLogits."):
            continue
        if key.endswith(".conv.weight"):
            prefix = key[: -len(".weight")]
            tb.conv(sd, prefix, *prefix.split("."))
        elif key.endswith(".bn.weight"):
            prefix = key[: -len(".weight")]
            tb.bn(sd, prefix, *prefix.split("."))
    tb.dense(sd, "fc", "fc")
    return tb.variables()


def convert_googlenet(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision GoogLeNet state dict → :class:`models.googlenet.GoogLeNet`.

    torch names: ``conv{1..3}.{conv,bn}``, ``inception{3a..5b}.branch{1..4}``
    (branches 2-4 are Sequentials, so ``branch2.0.conv`` → flax
    ``branch2_0/conv``), ``fc``. Train-only ``aux{1,2}.*`` heads are skipped
    (inference graph omits them — see models/googlenet.py)."""

    def flax_path(prefix: str):
        out = []
        for p in prefix.split("."):
            if out and out[-1].startswith("branch") and p.isdigit():
                out[-1] = f"{out[-1]}_{p}"
            else:
                out.append(p)
        return out

    tb = _TreeBuilder()
    for key in sd:
        if key.startswith(("aux1.", "aux2.")):
            continue
        if key.endswith(".conv.weight"):
            prefix = key[: -len(".weight")]
            tb.conv(sd, prefix, *flax_path(prefix))
        elif key.endswith(".bn.weight"):
            prefix = key[: -len(".weight")]
            tb.bn(sd, prefix, *flax_path(prefix))
    tb.dense(sd, "fc", "fc")
    return tb.variables()


def _convert_by_name_walk(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Generic torchvision-Sequential converter: every ``*.weight`` key maps
    to a flax child whose name flattens the dotted Sequential indices with
    ``_`` (``stage2.0.branch1.0`` → ``stage2_0/branch1_0``). BN is detected
    by a sibling ``running_mean``; Linear by a 2-D weight. Works for any
    model whose flax module names follow this flattening convention."""

    def flax_path(prefix: str):
        out = []
        for p in prefix.split("."):
            if out and p.isdigit():
                out[-1] = f"{out[-1]}_{p}"
            else:
                out.append(p)
        return out

    tb = _TreeBuilder()
    for key in sd:
        if not key.endswith(".weight"):
            continue
        prefix = key[: -len(".weight")]
        if prefix + ".running_mean" in sd:
            tb.bn(sd, prefix, *flax_path(prefix))
        elif sd[key].ndim == 2:
            tb.dense(sd, prefix, *flax_path(prefix))
        else:
            tb.conv(sd, prefix, *flax_path(prefix))
    return tb.variables()


def convert_shufflenet_v2(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision ShuffleNetV2 state dict →
    :class:`models.shufflenet.ShuffleNetV2` (names: ``conv1.{0,1}``,
    ``stage{2,3,4}.{b}.branch{1,2}.{i}``, ``conv5.{0,1}``, ``fc``)."""
    return _convert_by_name_walk(sd)


def convert_mnasnet(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision MNASNet state dict → :class:`models.mnasnet.MNASNet`
    (names: ``layers.{0..16}`` stem/tail, ``layers.{8..13}.{b}.layers.{j}``
    MBConv stacks, ``classifier.1``)."""
    return _convert_by_name_walk(sd)


def convert_checkpoint(path: str, arch: str, depth: int = 56, bn_size: int = 4):
    """One-call ingest: load + convert by architecture family."""
    sd = load_state_dict(path)
    if arch == "mnist_cnn":
        return convert_mnist_cnn(sd)
    if arch == "resnet":
        return convert_resnet_cifar(sd, depth)
    if arch.startswith(("resnet", "resnext", "wide_resnet")):
        return convert_resnet_imagenet(sd, arch)
    if arch == "densenet":
        return convert_densenet(sd, depth, bn_size)
    if arch.startswith("densenet"):
        return convert_densenet_torchvision(sd, arch)
    if arch.startswith("vgg"):
        return convert_vgg(sd, arch)
    if arch == "alexnet":
        return convert_alexnet(sd)
    if arch.startswith("squeezenet"):
        return convert_squeezenet(sd, arch)
    if arch == "inception_v3":
        return convert_inception(sd)
    if arch == "mobilenet_v2":
        return convert_mobilenet_v2(sd)
    if arch == "googlenet":
        return convert_googlenet(sd)
    if arch.startswith("shufflenet_v2"):
        return convert_shufflenet_v2(sd)
    if arch.startswith("mnasnet"):
        return convert_mnasnet(sd)
    raise ValueError(f"no converter for arch {arch}")


# ---------------------------------------------------------------------------
# Torch-free weights artifact
# ---------------------------------------------------------------------------
#
# The reference gets pretrained weights implicitly at every run
# (``models.__dict__[arch](pretrained=True)``,
# ``bayesian_active_learning_imagenet.py:391``), which drags torch +
# torchvision + network into every process. Here the torch pickle is read
# ONCE, offline (``cli.convert_checkpoint``), into a directory artifact —
# ``weights.msgpack`` (the same flax-serialization blob serving.py bundles)
# plus ``meta.json`` — and every inference CLI/serving host loads it with
# zero torch dependency.

WEIGHTS_FILE = "weights.msgpack"
META_FILE = "meta.json"


def save_weights_artifact(variables, out_dir: str, meta: Dict[str, Any] = None) -> Dict[str, Any]:
    """Write a torch-free weights artifact (msgpack + meta.json)."""
    import json
    import os

    from flax import serialization

    os.makedirs(out_dir, exist_ok=True)
    host_vars = _tree_map_np(variables)
    with open(os.path.join(out_dir, WEIGHTS_FILE), "wb") as f:
        f.write(serialization.msgpack_serialize(host_vars))
    meta = dict(meta or {})
    meta.setdefault("format", "nit-weights-v1")
    with open(os.path.join(out_dir, META_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def _tree_map_np(variables):
    import jax

    return jax.tree.map(np.asarray, variables)


def is_weights_artifact(path: str) -> bool:
    import os

    if path.endswith(".msgpack"):
        return os.path.isfile(path)
    return os.path.isdir(path) and os.path.isfile(os.path.join(path, WEIGHTS_FILE))


def load_weights_artifact(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load (variables, meta) from an artifact dir or a bare ``.msgpack``.

    Pure flax/numpy — importable and runnable on hosts without torch.
    """
    import json
    import os

    from flax import serialization

    if os.path.isdir(path):
        weights_path = os.path.join(path, WEIGHTS_FILE)
        meta_path = os.path.join(path, META_FILE)
    else:
        weights_path, meta_path = path, None
    with open(weights_path, "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    meta = {}
    if meta_path and os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return variables, meta
