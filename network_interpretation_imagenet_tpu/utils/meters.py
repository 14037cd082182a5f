"""Running-statistics meters.

One implementation of the meter the reference duplicates in five files
(``bayesian_active_learning_imagenet.py:98-113`` et al.), plus a gradient /
update sanity checker mirroring ``utils.WeightsCheck`` (``utils.py:69-87``)
for JAX pytrees.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


class AverageMeter:
    """Tracks current value, running sum, count and average."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class WeightsCheck:
    """Warns when a conv-like param has no/zero gradient or did not change
    between steps (reference ``utils.WeightsCheck``, ``utils.py:69-87``)."""

    def __init__(self, params: Any, min_ndim: int = 4) -> None:
        self.min_ndim = min_ndim
        self.means = {
            path: float(np.mean(np.asarray(leaf)))
            for path, leaf in self._iter(params)
        }

    def _iter(self, params: Any):
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            if np.ndim(leaf) >= self.min_ndim:
                yield jax.tree_util.keystr(path), leaf

    def check(self, params: Any, grads: Optional[Any] = None) -> list:
        """Returns warning strings (empty = healthy)."""
        warnings = []
        if grads is not None:
            for path, leaf in self._iter(grads):
                if float(np.max(np.abs(np.asarray(leaf)))) == 0.0:
                    warnings.append(f"param {path} has zero grad")
        for path, leaf in self._iter(params):
            mean = float(np.mean(np.asarray(leaf)))
            if path in self.means and mean == self.means[path]:
                warnings.append(f"param {path} has not been updated")
            self.means[path] = mean
        return warnings
