"""Training harness (CIFAR/MNIST classifier training)."""

from network_interpretation_imagenet_tpu.train.harness import (  # noqa: F401
    Trainer,
    make_optimizer,
)
