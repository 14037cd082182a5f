"""Model registry — the reference's ``models.__dict__[arch]`` /
``createModel`` pattern (``bayesian_active_learning_imagenet.py:391``,
``args.py:8-9``) as one typed factory.

``create_model`` returns a :class:`ModelBundle` exposing a uniform pure
``logits(variables, nhwc_batch) -> [B, K]`` regardless of each net's native
output signature (the MNIST CNN returns feature tuples, reference
``generate_gp_training_data_mnist.py:97-105``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from network_interpretation_imagenet_tpu.models.densenet import (  # noqa: F401
    DenseNet,
    create_densenet,
)
from network_interpretation_imagenet_tpu.models.mnist_cnn import MnistCNN  # noqa: F401
from network_interpretation_imagenet_tpu.models.resnet_cifar import (  # noqa: F401
    ResNetCifar,
    death_rates_for,
)
from network_interpretation_imagenet_tpu.models.resnet_imagenet import (  # noqa: F401
    ResNet,
    create_resnet,
)
from network_interpretation_imagenet_tpu.models.vgg import VGG, create_vgg  # noqa: F401

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    """A model plus its uniform inference/train entry points."""

    name: str
    module: nn.Module
    input_size: int
    input_channels: int
    num_classes: int

    def init(self, key: Array, train: bool = False) -> Any:
        dummy = jnp.zeros(
            (1, self.input_size, self.input_size, self.input_channels), jnp.float32
        )
        rngs = {"params": key, "stochastic_depth": key, "dropout": key}
        return self.module.init(rngs, dummy, train)

    def logits(self, variables: Any, images: Array) -> Array:
        """Pure eval-mode forward: NHWC batch → [B, num_classes] logits."""
        out = self.module.apply(variables, images, False)
        if isinstance(out, tuple):
            out = out[-1]
        return out

    def train_apply(
        self, variables: Any, images: Array, rngs: dict
    ) -> Tuple[Array, Any]:
        """Train-mode forward; returns (logits, new_mutable_state)."""
        out, mutated = self.module.apply(
            variables, images, True, rngs=rngs, mutable=["batch_stats"]
        )
        if isinstance(out, tuple):
            out = out[-1]
        return out, mutated


def create_model(
    arch: str,
    dataset: str = "imagenet",
    num_classes: Optional[int] = None,
    depth: Optional[int] = None,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    death_mode: str = "none",
    death_rate: float = 0.5,
    growth_rate: int = 12,
    bn_size: int = 4,
    compression: float = 0.5,
) -> ModelBundle:
    """Uniform factory over every classifier family in the framework.

    ``arch`` accepts torchvision-style names (``resnet18``..``resnet152``,
    ``vgg16``/``vgg16_bn``), reference-local families (``resnet`` +
    ``depth`` → CIFAR ResNet-6N+2, ``densenet`` + ``depth`` → DenseNet-BC),
    and ``mnist_cnn``.
    """
    kw = dict(dtype=dtype, param_dtype=param_dtype)
    from network_interpretation_imagenet_tpu.config import DATASETS

    spec = DATASETS[dataset]
    nc = num_classes if num_classes is not None else spec.num_classes

    if arch in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
                "resnext50_32x4d", "resnext101_32x8d",
                "wide_resnet50_2", "wide_resnet101_2"):
        module: nn.Module = create_resnet(arch, num_classes=nc, **kw)
    elif arch.startswith("vgg"):
        module = create_vgg(arch, num_classes=nc, **kw)
    elif arch == "alexnet":
        from network_interpretation_imagenet_tpu.models.alexnet import AlexNet

        module = AlexNet(num_classes=nc, **kw)
    elif arch in ("squeezenet1_0", "squeezenet1_1"):
        from network_interpretation_imagenet_tpu.models.squeezenet import SqueezeNet

        module = SqueezeNet(version=arch.split("squeezenet")[1],
                            num_classes=nc, **kw)
    elif arch == "inception_v3":
        from network_interpretation_imagenet_tpu.models.inception import InceptionV3

        # torchvision's pretrained factory enables transform_input; mirror it
        # so converted pretrained checkpoints see their training distribution.
        module = InceptionV3(num_classes=nc, transform_input=True, **kw)
    elif arch == "googlenet":
        from network_interpretation_imagenet_tpu.models.googlenet import GoogLeNet

        # torchvision's pretrained factory enables transform_input (as for
        # inception_v3); mirror it for converted checkpoints.
        module = GoogLeNet(num_classes=nc, transform_input=True, **kw)
    elif arch == "mobilenet_v2":
        from network_interpretation_imagenet_tpu.models.mobilenet import MobileNetV2

        module = MobileNetV2(num_classes=nc, **kw)
    elif arch.startswith("shufflenet_v2"):
        from network_interpretation_imagenet_tpu.models.shufflenet import (
            _STAGE_OUT,
            ShuffleNetV2,
        )

        module = ShuffleNetV2(stage_out=_STAGE_OUT[arch], num_classes=nc, **kw)
    elif arch.startswith("mnasnet"):
        from network_interpretation_imagenet_tpu.models.mnasnet import MNASNet

        # torchvision names: mnasnet0_5 / mnasnet0_75 / mnasnet1_0 / mnasnet1_3
        alpha = float(arch[len("mnasnet"):].replace("_", "."))
        module = MNASNet(alpha=alpha, num_classes=nc, **kw)
    elif arch == "mnist_cnn":
        module = MnistCNN(num_classes=nc, **kw)
    elif arch == "resnet":  # CIFAR ResNet-6N+2 (reference models/resnet.py)
        d = depth or 56
        module = ResNetCifar(
            depth=d, num_classes=nc,
            death_rates=death_rates_for(d, death_mode, death_rate), **kw,
        )
    elif arch in ("densenet121", "densenet169", "densenet201"):
        from network_interpretation_imagenet_tpu.models.densenet import (
            create_densenet_torchvision,
        )

        module = create_densenet_torchvision(arch, num_classes=nc, **kw)
    elif arch == "densenet":  # DenseNet-BC (reference models/densenet.py)
        module = create_densenet(
            data=dataset, depth=depth or 100, growth_rate=growth_rate,
            num_classes=nc, bn_size=bn_size, compression=compression, **kw,
        )
    else:
        raise ValueError(f"unknown arch: {arch}")

    # Inception-v3's native resolution is 299² (torchvision eval transform);
    # the data pipeline's 224² tensors also trace — the head is a global pool.
    input_size = 299 if arch == "inception_v3" else spec.image_size
    return ModelBundle(
        name=arch,
        module=module,
        input_size=input_size,
        input_channels=spec.channels,
        num_classes=nc,
    )
