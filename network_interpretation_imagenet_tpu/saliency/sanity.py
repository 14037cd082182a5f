"""Attribution sanity checks (Adebayo et al., NeurIPS 2018 "Sanity
Checks for Saliency Maps").

Cascading parameter randomization: re-randomize the classifier's weights
one top-level module at a time, OUTPUT side first, and measure how much
each attribution method's heatmap changes (Spearman rank correlation of
|heat| against the trained-model map — rank correlation because every
downstream consumer of these maps is an argsort: deletion/insertion
curves, top-k%% masks, bbox thresholds). A method whose maps survive
full randomization (correlation stays ~1) is insensitive to the model it
claims to explain — an edge detector, not an explanation.

The reference repo has no attribution-validity tooling at all; this is
the evaluation harness that keeps a 13-method family honest. Device
split: heatmaps are whatever the method runs (vmapped/jitted device
programs); the rank correlation is a host argsort over H·W scalars.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import numpy as np
from scipy.stats import rankdata


def spearman_abs(a: np.ndarray, b: np.ndarray) -> float:
    """Spearman rank correlation of |a| vs |b| (flattened), ties
    averaged (scipy ``rankdata``). Constant inputs have no ranking —
    returns 0.0 (maximally non-informative) rather than NaN."""
    x = np.abs(np.asarray(a, np.float64)).ravel()
    y = np.abs(np.asarray(b, np.float64)).ravel()
    if x.shape != y.shape:
        raise ValueError(f"shape mismatch {x.shape} vs {y.shape}")
    if np.ptp(x) == 0 or np.ptp(y) == 0:
        return 0.0
    rx = rankdata(x) - (len(x) + 1) / 2.0
    ry = rankdata(y) - (len(y) + 1) / 2.0
    denom = np.sqrt((rx ** 2).sum() * (ry ** 2).sum())
    return float((rx * ry).sum() / denom) if denom else 0.0


def fresh_random_variables(bundle, seed: int = 0) -> Any:
    """A full re-draw from the model's own init distribution (the
    paper's randomization source), as host numpy leaves."""
    return jax.tree.map(np.asarray,
                        bundle.init(jax.random.PRNGKey(seed + 7919)))


def randomization_stages(bundle) -> list:
    """Top-level 'params' module names, OUTPUT side first.

    Derived from a FRESH ``bundle.init`` tree: flax preserves module
    definition order there, whereas any tree that has been through
    ``jax.device_put``/``jax.tree.map`` (e.g. ``SaliencyEngine
    .variables``) comes back with ALPHABETICALLY SORTED keys — on
    resnet18 that order randomizes the 'fc' head 10th instead of first,
    silently breaking the cascading protocol."""
    variables = bundle.init(jax.random.PRNGKey(0))
    params = variables["params"] if "params" in variables else variables
    return list(reversed(list(params.keys())))


def randomize_modules(
    variables: Any,
    random_variables: Any,
    modules: Sequence[str],
) -> Any:
    """Splice ``random_variables``' entries for ``modules`` into
    ``variables`` — ALL collections (params AND batch_stats etc.), so a
    randomized BN module doesn't keep its trained running stats."""
    modules = set(modules)
    out = {}
    for coll, tree in variables.items():
        if not isinstance(tree, dict):
            out[coll] = tree
            continue
        rand_tree = random_variables.get(coll, {})
        out[coll] = {
            k: (rand_tree[k] if k in modules and k in rand_tree else v)
            for k, v in tree.items()
        }
    return out


def cascading_randomization(
    heatmap_fn: Callable[[Any], np.ndarray],
    bundle,
    variables: Any,
    seed: int = 0,
    stages: Sequence[str] | None = None,
    random_variables: Any = None,
) -> dict:
    """Run the cascading test for ONE method.

    ``heatmap_fn(variables) -> heat`` computes the method's map with the
    given weights (everything else — image, target, hyperparams — is
    closed over by the caller). Returns ``{"stages": [(module,
    spearman_vs_trained), ...]}`` with modules randomized CUMULATIVELY
    from the output side; the last row is the fully-random network.
    Pass ``random_variables`` (see :func:`fresh_random_variables`) to
    share one random draw across several methods' runs."""
    if random_variables is None:
        random_variables = fresh_random_variables(bundle, seed)
    base = np.asarray(heatmap_fn(variables))
    if stages is None:
        stages = randomization_stages(bundle)
    rows = []
    done: list = []
    for stage in stages:
        done.append(stage)
        rand = randomize_modules(variables, random_variables, done)
        heat = np.asarray(heatmap_fn(rand))
        rows.append((stage, spearman_abs(base, heat)))
    return {"stages": rows}
