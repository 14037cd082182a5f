"""Data layer: ImageNet-localization dataset, MNIST/CIFAR loaders, synthetic
generators. Decode happens on host (PIL / raw binary formats); resize, crop
and normalization are fused XLA ops (`ops.preprocess`)."""

from network_interpretation_imagenet_tpu.data.imagenet_loc import (  # noqa: F401
    ImagenetLocalizationDataset,
    transform_gt_bbox,
)
from network_interpretation_imagenet_tpu.data.loaders import (  # noqa: F401
    get_cifar_loaders,
    load_cifar10_dir,
    load_mnist_dir,
)
from network_interpretation_imagenet_tpu.data.synthetic import (  # noqa: F401
    synthetic_classification_batch,
    synthetic_imagenet_image,
)
