"""Dataclass configuration system.

Replaces the reference's scattered argparse blocks
(``args.py:1-118``, ``bayesian_active_learning_imagenet.py:48-87``,
``generate_gp_training_data_imagenet.py:42-81``) and the ``config.datasets``
registry (``config.py:3-20``) with one typed config tree. CLI entry points in
`cli/` parse flags into these dataclasses so every workload is reproducible
from a single object.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# ---------------------------------------------------------------------------
# Dataset registry (reference config.py:3-20 plus the ImageNet/MNIST presets
# hardcoded in the per-script argparse blocks).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    name: str
    num_classes: int
    image_size: int          # square side length n (224/32/28)
    channels: int
    augmentation: bool = False
    # Normalization applied after scaling to [0, 1].
    mean: Tuple[float, ...] = (0.0,)
    std: Tuple[float, ...] = (1.0,)


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# Reference dataloader.py:16-21 constants (must match exactly: converted
# reference checkpoints see these inputs).
CIFAR10_MEAN = (0.4914, 0.4824, 0.4467)
CIFAR10_STD = (0.2471, 0.2435, 0.2616)
CIFAR100_MEAN = (0.5071, 0.4867, 0.4408)
CIFAR100_STD = (0.2675, 0.2565, 0.2761)

DATASETS = {
    # reference config.py:3-20 (cifar10/cifar10+/cifar100/cifar100+; '+' =
    # standard flip/crop augmentation)
    "cifar10": DatasetSpec("cifar10", 10, 32, 3, False, CIFAR10_MEAN, CIFAR10_STD),
    "cifar10+": DatasetSpec("cifar10+", 10, 32, 3, True, CIFAR10_MEAN, CIFAR10_STD),
    "cifar100": DatasetSpec("cifar100", 100, 32, 3, False, CIFAR100_MEAN, CIFAR100_STD),
    "cifar100+": DatasetSpec("cifar100+", 100, 32, 3, True, CIFAR100_MEAN, CIFAR100_STD),
    # reference generate_gp_training_data_mnist.py:57-69 (no normalization —
    # ToTensor only; the Normalize call is commented out there)
    "mnist": DatasetSpec("mnist", 10, 28, 1, False, (0.0,), (1.0,)),
    # reference bayesian_active_learning_imagenet.py:402-403
    "imagenet": DatasetSpec("imagenet", 1000, 224, 3, False, IMAGENET_MEAN, IMAGENET_STD),
}


# ---------------------------------------------------------------------------
# Segmentation config (reference felzenszwalb calls, e.g.
# bayesian_active_learning_imagenet.py:150: scale=100, sigma=0.5, min_size=50;
# MNIST uses min_size=5, CIFAR min_size=10).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SegmentConfig:
    # Default = felzenszwalb (reference parity, and 1.4× faster than device
    # SLIC end-to-end: 34 ms host vs 49 ms device+connectivity at 224² —
    # docs/PERFORMANCE.md "Segmenter study"). As host work it also overlaps
    # the chip in the pipelined sweep. "slic" = the on-device alternative.
    method: str = "felzenszwalb"
    # felzenszwalb params. scale=None → area-adaptive: the reference's
    # scale=100 is a 224² calibration, and FH's scale has PIXEL-COUNT
    # units (merge threshold τ(C) = scale/|C|), so 100 over-merges a
    # 32×32 image to ONE segment — every mask identical, the whole
    # mask-label pipeline degenerate (caught by the round-5 method
    # study). None resolves to max(1, 100·H·W/224²) at segmentation
    # time: identity at 224² (ImageNet paths unchanged), ~2 at 32²
    # (8-14 segments on CIFAR-scale content). Explicit floats are
    # honored verbatim (reference parity: pass scale=100).
    scale: "float | None" = None
    sigma: float = 0.5
    min_size: int = 50
    # slic params
    n_segments: int = 48            # target #superpixels (typ. Felzenszwalb yields ~40-80)
    compactness: float = 10.0
    slic_iters: int = 10
    # Vectorized host postprocess merging SLIC islands (~14 ms at 224²) —
    # on by default so SLIC superpixels are spatially coherent like FH's.
    enforce_connectivity: bool = True
    # static upper bound on segment count so downstream stays jit-static
    max_segments: int = 256


# ---------------------------------------------------------------------------
# Masking / engine config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MaskConfig:
    # Window masks keep a contiguous run of superpixel IDs
    # (reference bayesian_active_learning_imagenet.py:174-185).
    window_fraction: float = 0.4
    # Knockout masks zero `num_knockout` random segments and keep the rest
    # (reference generate_gp_training_data_mnist.py:218-223 → 1 segment;
    #  generate_gp_training_data_cifar.py:307-342 → 5 segments).
    num_knockout: int = 1
    num_samples: int = 100          # reference --num_mask_samples
    batch_size: int = 128           # masks per device per forward


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    compute_dtype: str = "bfloat16"  # MXU-friendly
    param_dtype: str = "float32"
    donate: bool = True


# ---------------------------------------------------------------------------
# BO config (reference bayesian_active_learning_imagenet.py:479-486,
# BayesianOptimization.py:99-192)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BOConfig:
    n_iters: int = 10
    n_pre_samples: int = 3
    alpha: float = 1e-5              # GP noise (reference BO alpha=1e-5)
    epsilon: float = 1e-7            # duplicate-rejection tolerance
    greater_is_better: bool = True   # maximize survival probability
    # On-device lengthscale selection replaces sklearn's n_restarts_optimizer=10:
    # MLL is evaluated over a log-spaced candidate grid and the argmax taken.
    lengthscale_grid: Tuple[float, ...] = tuple(
        float(x) for x in (0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0, 128.0)
    )


# ---------------------------------------------------------------------------
# GP surrogate config (reference gp_regression.py:160-224 /
# gp_classification.py:139-217 / gp_superpixel_data_imagenet.py:407-472)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GPConfig:
    kind: str = "regression"        # "regression" | "classification"
    grid_size: int = 30              # KISS-GP inducing grid per dim (ref: 30/300/10)
    train_iters: int = 20            # ref: 20 (regression), 30 (classification)
    lr: float = 0.1                  # ref: Adam lr=0.1
    eval_batch: int = 1024           # ref streams 896-point batches; we batch on device
    jitter: float = 1e-5


# ---------------------------------------------------------------------------
# Training harness config (reference args.py:83-117 optimizer group,
# generate_gp_training_data_cifar.py:81-234 harness)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    optimizer: str = "sgd"           # sgd | rmsprop | adam (reference args.py:88)
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 1e-4
    epochs: int = 90
    batch_size: int = 64
    patience: int = 0                # early stop (reference args.py:92-94; 0 = off)
    seed: int = 0
    decay_rate: float = 0.1
    decay_epochs: Tuple[int, ...] = (30, 60)  # lr schedule (ref adjust_learning_rate)
    print_freq: int = 0              # per-batch meter line every N steps (stock main.py -p)


# ---------------------------------------------------------------------------
# Parallelism config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    # 1-D "data" mesh shards the mask/image batch over ICI; a second "model"
    # axis optionally shards wide channels / the classifier head (TP).
    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1


# ---------------------------------------------------------------------------
# Top-level workload config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SaliencyConfig:
    dataset: str = "imagenet"
    arch: str = "resnet18"
    eval_img_index: int = 1600       # reference default
    bbox_threshold: int = 180        # reference bayesian_active_learning_imagenet.py:491
    segment: SegmentConfig = dataclasses.field(default_factory=SegmentConfig)
    mask: MaskConfig = dataclasses.field(default_factory=MaskConfig)
    engine: EngineConfig = dataclasses.field(default_factory=EngineConfig)
    bo: BOConfig = dataclasses.field(default_factory=BOConfig)
    gp: GPConfig = dataclasses.field(default_factory=GPConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    seed: int = 0

    @property
    def dataset_spec(self) -> DatasetSpec:
        return DATASETS[self.dataset]
