"""Superpixel segmentation.

Contract: every segmenter returns ``int32[H, W]`` labels, contiguous
``0..S-1``, relabeled in raster-scan first-occurrence order (deterministic;
downstream window masks rely on label order — see ``ops.masking``).

Two families:
  * :mod:`segment.slic` — TPU-native SLIC k-means, jittable, runs on device.
  * :mod:`segment.felzenszwalb` — graph segmentation matching the reference's
    scikit-image calls (``bayesian_active_learning_imagenet.py:150``);
    first-party C++ kernel (``native/felzenszwalb.cc``) with a numpy
    fallback. Inherently serial union-find → host component.
"""

from network_interpretation_imagenet_tpu.segment.felzenszwalb import (  # noqa: F401
    felzenszwalb,
    felzenszwalb_ladder,
)
from network_interpretation_imagenet_tpu.segment.slic import (  # noqa: F401
    slic,
    slic_batch,
)
from network_interpretation_imagenet_tpu.segment.common import (  # noqa: F401
    relabel_sequential,
    segment_image,
    segment_image_batch,
    slic_batch_device,
    slic_postpass_host,
)
