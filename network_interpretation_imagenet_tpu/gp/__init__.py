"""On-device Gaussian processes.

Replaces the reference's two GP stacks — sklearn ``GaussianProcessRegressor``
for the BO surrogate (``BayesianOptimization.py:149-166``) and gpytorch
KISS-GP for the pixel-grid saliency surrogate (``gp_regression.py:160-282``,
``gp_classification.py:139-264``) — with JAX implementations that never leave
the device:

  * :mod:`gp.exact` — exact GP regression via Cholesky (the BO surrogate has
    ≤13 points; also serves subsampled pixel GPs).
  * :mod:`gp.kron` — EXACT GP over the full H×W pixel grid using Kronecker
    eigenstructure of the separable RBF kernel: mean, variance and marginal
    likelihood in a handful of H×H / W×W matmuls (MXU work). This *upgrades*
    the reference's grid-interpolation approximation to an exact solve.
  * :mod:`gp.variational` — grid-inducing variational GP with Bernoulli
    (probit) likelihood for the classification surrogate.
"""

from network_interpretation_imagenet_tpu.gp import exact, kron, variational  # noqa: F401
from network_interpretation_imagenet_tpu.gp.kernels import rbf_kernel  # noqa: F401
