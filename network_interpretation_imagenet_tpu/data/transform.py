"""Host (PIL) eval transform shared by every ImageNet-style loader.

Exactly torchvision's ``Resize(crop) + CenterCrop(crop) + ToTensor +
Normalize`` arithmetic (the reference eval pipeline,
``bayesian_active_learning_imagenet.py:402-415``): torchvision computes the
resized long side as ``int(size * long / short)`` — TRUNCATION, not
rounding (torchvision ``_compute_resized_output_size``) — and center-crops
with ``round()``. One implementation here so the CSV and folder loaders can
never diverge.
"""

from __future__ import annotations

import numpy as np

from network_interpretation_imagenet_tpu.config import IMAGENET_MEAN, IMAGENET_STD


def resized_output_size(w: int, h: int, size: int):
    """torchvision Resize(size) output (new_w, new_h): short side == size,
    long side truncated."""
    if w < h:
        return size, int(size * h / w)
    return int(size * w / h), size


def pil_eval_transform(img, crop: int = 224,
                       mean=IMAGENET_MEAN, std=IMAGENET_STD,
                       raw: bool = False) -> np.ndarray:
    """PIL image → normalized f32 [crop, crop, 3] (torchvision semantics).

    ``raw=True`` stops after resize+crop and returns uint8 HWC — the uint8
    wire: the sweep uploads raw bytes (1/4 the f32 size) and runs the
    /255 + normalize half ON DEVICE (``saliency.sweep`` ``normalize=``),
    the fused decode→normalize split BASELINE.md mandates."""
    from PIL import Image

    w, h = img.size
    new_w, new_h = resized_output_size(w, h, crop)
    img = img.resize((new_w, new_h), Image.BILINEAR)
    left = int(round((new_w - crop) / 2.0))
    top = int(round((new_h - crop) / 2.0))
    img = img.crop((left, top, left + crop, top + crop))
    if raw:
        return np.asarray(img, np.uint8)
    arr = np.asarray(img, np.float32) / 255.0  # ToTensor
    return (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
