"""Cascading parameter-randomization sanity checks (saliency.sanity)."""

import types

import jax
import numpy as np

from network_interpretation_imagenet_tpu.saliency import sanity


def test_spearman_abs_properties():
    rng = np.random.RandomState(0)
    x = rng.randn(64)
    assert sanity.spearman_abs(x, x) == 1.0
    # Sign-blind: ranking is over magnitudes.
    assert sanity.spearman_abs(x, -x) == 1.0
    # Monotone transforms of |x| preserve ranks exactly.
    assert abs(sanity.spearman_abs(x, np.abs(x) ** 3) - 1.0) < 1e-12
    # Constant maps carry no ranking — defined as 0, not NaN.
    assert sanity.spearman_abs(x, np.zeros_like(x)) == 0.0
    assert sanity.spearman_abs(np.ones(8), np.ones(8)) == 0.0
    # Independent random maps decorrelate.
    y = rng.randn(4096)
    z = rng.randn(4096)
    assert abs(sanity.spearman_abs(y, z)) < 0.1
    # Tied values get averaged ranks (a flat region can't fake structure):
    # a has ties where b disagrees internally -> correlation below 1.
    a = np.array([1.0, 1.0, 2.0, 3.0])
    b = np.array([1.0, 1.5, 2.0, 3.0])
    assert 0.9 < sanity.spearman_abs(a, b) < 1.0


def test_randomize_modules_splices_all_collections():
    trained = {
        "params": {"m1": {"w": np.ones((2, 2))}, "m2": {"w": np.ones(3)}},
        "batch_stats": {"m1": {"mean": np.zeros(2)}},
    }
    rand = {
        "params": {"m1": {"w": np.full((2, 2), 9.0)},
                   "m2": {"w": np.full(3, 9.0)}},
        "batch_stats": {"m1": {"mean": np.full(2, 9.0)}},
    }
    out = sanity.randomize_modules(trained, rand, ["m1"])
    assert (out["params"]["m1"]["w"] == 9.0).all()          # spliced
    assert (out["batch_stats"]["m1"]["mean"] == 9.0).all()  # stats too
    assert (out["params"]["m2"]["w"] == 1.0).all()          # untouched




def test_randomization_stages_definition_order():
    """Stage order must come from a RAW bundle.init (definition order) —
    trees that passed through device_put/tree.map sort alphabetically,
    which on resnet-style names would randomize the head last."""
    import jax as _jax

    bundle = types.SimpleNamespace(
        init=lambda key: {"params": {
            "conv1": {"w": np.zeros(1)}, "bn1": {"s": np.zeros(1)},
            "layer1_0": {"w": np.zeros(1)}, "fc": {"w": np.zeros(1)},
        }})
    assert sanity.randomization_stages(bundle) == [
        "fc", "layer1_0", "bn1", "conv1"]
    # The sorted order a device_put tree would give is NOT what we use.
    sorted_keys = list(_jax.device_put(
        bundle.init(None))["params"].keys())
    assert sorted_keys == ["bn1", "conv1", "fc", "layer1_0"]


def test_cascading_randomization_detects_dependence():
    """A 'method' whose map IS a module's weights: randomizing that module
    kills the correlation; the cumulative last row is fully random."""
    rng = np.random.RandomState(0)
    trained = {"params": {
        "early": {"w": rng.randn(16, 16)},
        "late": {"w": rng.randn(16, 16)},
    }}

    bundle = types.SimpleNamespace(
        init=lambda key: {"params": {
            "early": {"w": np.asarray(
                jax.random.normal(key, (16, 16)))},
            "late": {"w": np.asarray(
                jax.random.normal(jax.random.split(key)[0], (16, 16)))},
        }})

    def late_method(variables):
        return variables["params"]["late"]["w"]

    rows = sanity.cascading_randomization(
        late_method, bundle, trained, seed=0)["stages"]
    assert [s for s, _ in rows] == ["late", "early"]
    assert abs(rows[0][1]) < 0.35   # late randomized -> map decorrelates
    assert abs(rows[1][1]) < 0.35   # still random at the final stage

    def early_method(variables):
        return variables["params"]["early"]["w"]

    rows = sanity.cascading_randomization(
        early_method, bundle, trained, seed=0)["stages"]
    assert rows[0][1] == 1.0        # insensitive to the late module
    assert abs(rows[1][1]) < 0.35   # dies once its module randomizes


def test_sanity_cli_real_model(tmp_path):
    """End-to-end on a zoo model: the input gradient of a RANDOM network
    differs from the trained(-init) one's — correlations are valid and
    the JSON report covers every stage x method."""
    import json
    import os

    from network_interpretation_imagenet_tpu.cli import attribution_sanity

    rc = attribution_sanity.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--methods", "gradient,gradcam", "--dtype", "float32",
        "--mask-batch", "8", "--out", str(tmp_path),
    ])
    assert rc == 0
    payload = json.loads(
        open(os.path.join(str(tmp_path), "sanity_check.json")).read())
    stages = payload["stages"]
    assert len(stages) >= 3  # conv stack + head
    for m in ("gradient", "gradcam"):
        rows = payload["methods"][m]
        assert [r["randomized_through"] for r in rows] == stages
        for r in rows:
            assert -1.0 <= r["spearman"] <= 1.0
        # The fully-randomized network's map must not be identical.
        assert rows[-1]["spearman"] < 0.999
