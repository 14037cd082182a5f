"""network_interpretation_imagenet_tpu — TPU-native GP-guided superpixel saliency.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``LiliMeng/network_interpretation_imagenet`` (reference mounted read-only at
``/root/reference``): explain an image classifier's prediction by segmenting the
image into superpixels, evaluating the classifier on batches of superpixel
masks, optionally choosing masks by GP-EI Bayesian optimization, aggregating
per-mask survive/die labels into a per-pixel saliency heatmap, fitting a GP
surrogate over the pixel grid, and scoring localization via bbox IOU.

Design notes (TPU-first, not a port):
  * The reference's hot loop — one host-built mask, one CUDA forward, one PNG
    write per sample (reference ``generate_gp_training_data_imagenet.py:221-267``)
    — becomes a single jitted, vmapped batched forward over an on-device mask
    bank (`saliency.engine`).
  * Layers communicate through in-memory arrays, not ``./masks/*.png`` files
    (reference ``gp_regression.py:63-72``).
  * Superpixels: SLIC k-means on device (`segment.slic`); the reference's
    Felzenszwalb (scikit-image) is reproduced as a first-party C++ kernel with
    a numpy fallback for parity (`segment.felzenszwalb`).
  * GP surrogates (`gp/`) run on device with Cholesky / Kronecker-SKI
    structure instead of sklearn/gpytorch host solves.
  * Scaling is mesh-based data/mask parallelism via ``shard_map``/``pjit``
    (`parallel/`), replacing the reference's dead ``--dist-backend gloo``
    flags and single-host ``nn.DataParallel``.
"""

__version__ = "0.1.0"

from network_interpretation_imagenet_tpu import config as config  # noqa: F401
