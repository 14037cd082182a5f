"""CLI smoke tests (in-process, CPU, tiny configs): every entry point runs
end-to-end on synthetic data and emits its artifacts."""

import json
import os

import numpy as np
import pytest

from network_interpretation_imagenet_tpu.cli import (
    bayesian_active_learning_imagenet as cli_bo,
)
from network_interpretation_imagenet_tpu.cli import (
    generate_gp_training_data_cifar as cli_cifar,
)
from network_interpretation_imagenet_tpu.cli import (
    generate_gp_training_data_imagenet as cli_imagenet,
)
from network_interpretation_imagenet_tpu.cli import (
    generate_gp_training_data_mnist as cli_mnist,
)
from network_interpretation_imagenet_tpu.cli import generate_superpixels as cli_seg
from network_interpretation_imagenet_tpu.cli import gp_classification as cli_gpc
from network_interpretation_imagenet_tpu.cli import gp_regression as cli_gpr
from network_interpretation_imagenet_tpu.cli import (
    gp_superpixel_data_imagenet as cli_gps,
)

MNIST_CKPT = "/root/reference/saved_checkpoints/mnist/checkpoint.pth.tar"


def _json(path):
    with open(path) as f:
        return json.load(f)


def test_cli_generate_superpixels(tmp_path):
    out = str(tmp_path)
    cli_seg.main(["--synthetic", "--dataset", "mnist", "--segmenter", "slic",
                  "--n_segments", "9", "--out", out])
    r = _json(os.path.join(out, "superpixels.json"))
    assert len(r["segments"]) == 2
    assert os.path.exists(r["figure"])


@pytest.mark.skipif(not os.path.exists(MNIST_CKPT), reason="ckpt absent")
def test_cli_mnist_gp_data_and_gp_consumers(tmp_path):
    out = str(tmp_path / "gen")
    cli_mnist.main([
        "--mode", "gp-data", "--synthetic",
        "--ckpt", MNIST_CKPT, "--num_mask_samples", "24",
        "--mask-batch", "8", "--dtype", "float32",
        "--segmenter", "slic", "--n_segments", "9",
        "--out", out, "--save-pngs",
    ])
    r = _json(os.path.join(out, "mnist_gp_data_result.json"))
    assert r["correct_pred_count"] + r["wrong_pred_count"] == 24
    assert os.path.exists(os.path.join(out, "masks.npz"))
    # PNG artifact parity: mask_{i}_{label}.png files exist.
    pngs = os.listdir(os.path.join(out, "masks"))
    assert len(pngs) == 24
    assert all(p.startswith("mask_") for p in pngs)

    # gp_regression consumes the npz...
    out2 = str(tmp_path / "gpr")
    cli_gpr.main(["--masks", os.path.join(out, "masks.npz"),
                  "--gp-mode", "train+eval", "--gp_iters", "5",
                  "--dataset", "mnist", "--out", out2])
    r2 = _json(os.path.join(out2, "gp_regression_result.json"))
    assert "mean_range" in r2 and "train_losses" in r2

    # ...and the PNG dir (reference parity path).
    out3 = str(tmp_path / "gpr_png")
    cli_gpr.main(["--masks", os.path.join(out, "masks"),
                  "--gp-mode", "train+eval", "--gp_iters", "3",
                  "--dataset", "mnist", "--out", out3])
    assert os.path.exists(os.path.join(out3, "gp_reg_result.png"))

    # gp_classification on the same masks.
    out4 = str(tmp_path / "gpc")
    cli_gpc.main(["--masks", os.path.join(out, "masks.npz"),
                  "--dataset", "mnist", "--gp_iters", "10",
                  "--train_subsample", "256", "--out", out4])
    r4 = _json(os.path.join(out4, "gp_classification_result.json"))
    assert 0.0 <= r4["prob_range"][0] <= r4["prob_range"][1] <= 1.0


def test_cli_imagenet_random_masks_small(tmp_path):
    out = str(tmp_path)
    cli_imagenet.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num_mask_samples", "12", "--mask-batch", "4", "--dtype", "float32",
        "--segmenter", "slic", "--n_segments", "9",
        "--skip-threshold-search", "--out", out,
    ])
    r = _json(os.path.join(out, "gp_training_data_result.json"))
    assert r["num_mask_samples"] == 12
    assert os.path.exists(os.path.join(out, "heatmap.png"))


def test_cli_bo_small(tmp_path):
    out = str(tmp_path)
    cli_bo.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--mask-batch", "4", "--dtype", "float32",
        "--segmenter", "slic", "--n_segments", "9",
        "--n_iters", "3", "--n_pre_samples", "2", "--out", out,
    ])
    r = _json(os.path.join(out, "bo_result.json"))
    assert len(r["bo_xp"]) == 5
    assert os.path.exists(os.path.join(out, "heatmap.png"))


def test_cli_mnist_train_nn(tmp_path):
    out = str(tmp_path)
    cli_mnist.main(["--mode", "train-nn", "--synthetic", "--epochs", "1",
                    "--batch-size", "32", "--out", out])
    r = _json(os.path.join(out, "mnist_train_result.json"))
    assert r["epochs"] == 1
    assert os.path.isdir(os.path.join(out, "saved_checkpoints", "mnist", "checkpoint"))


def test_cli_cifar_train_small(tmp_path):
    out = str(tmp_path)
    cli_cifar.main(["--mode", "train", "--synthetic", "--depth", "8",
                    "--epochs", "1", "--batch-size", "32", "--out", out])
    r = _json(os.path.join(out, "cifar_train_result.json"))
    assert r["epochs_run"] == 1


def test_cli_gp_superpixel_fused(tmp_path):
    out = str(tmp_path)
    cli_gps.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num_mask_samples", "12", "--mask-batch", "4", "--dtype", "float32",
        "--segmenter", "slic", "--n_segments", "9", "--gp_iters", "5",
        "--out", out,
    ])
    r = _json(os.path.join(out, "gp_superpixel_result.json"))
    assert "gp_lengthscale" in r
    assert os.path.exists(os.path.join(out, "gp_superpixel_result.png"))


def test_cli_occlusion_and_gradient(tmp_path):
    from network_interpretation_imagenet_tpu.cli import occlusion_saliency as cli_occ

    out = str(tmp_path / "occ")
    cli_occ.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--method", "occlusion", "--patch", "8", "--stride", "8",
        "--mask-batch", "8", "--dtype", "float32", "--out", out,
    ])
    r = _json(os.path.join(out, "occlusion_result.json"))
    assert r["method"] == "occlusion"
    out2 = str(tmp_path / "grad")
    cli_occ.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--method", "gradient", "--dtype", "float32", "--out", out2,
    ])
    assert os.path.exists(os.path.join(out2, "gradient_result.json"))
    out3 = str(tmp_path / "xrai")
    cli_occ.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--method", "xrai", "--xrai-scales", "10,50", "--ig-steps", "4",
        "--dtype", "float32", "--out", out3,
    ])
    r3 = _json(os.path.join(out3, "xrai_result.json"))
    assert r3["num_regions"] >= 1 and r3["heat_range"][1] <= 1.0
    out4 = str(tmp_path / "lm")
    cli_occ.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--method", "meaningful", "--lm-iters", "5", "--lm-mask-size", "7",
        "--lm-jitter", "2", "--dtype", "float32", "--out", out4,
    ])
    r4 = _json(os.path.join(out4, "meaningful_result.json"))
    assert 0.0 <= r4["prob_masked"] <= 1.0 and 0.0 <= r4["prob_original"] <= 1.0


def test_cli_saliency_sweep(tmp_path):
    from network_interpretation_imagenet_tpu.cli import saliency_sweep as cli_sweep

    out = str(tmp_path)
    cli_sweep.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "2", "--num_mask_samples", "8", "--mask-batch", "8",
        "--dtype", "float32", "--segmenter", "slic", "--n_segments", "9",
        "--out", out,
    ])
    r = _json(os.path.join(out, "sweep_result.json"))
    assert r["images_total"] == 2
    assert r["images_failed"] == 0


def test_cli_saliency_sweep_multihost_two_processes(tmp_path):
    """End-to-end --multihost CLI: two spawned CPU-backend ranks stride the
    synthetic image axis, rank 0 merges rank files into sweep_result.json."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    out = str(tmp_path)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    common_args = [
        sys.executable, "-m",
        "network_interpretation_imagenet_tpu.cli.saliency_sweep",
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "4", "--num_mask_samples", "8", "--mask-batch", "8",
        "--dtype", "float32", "--segmenter", "slic", "--n_segments", "9",
        "--platform", "cpu", "--local-devices", "1",
        "--no-compilation-cache", "--out", out,
        "--multihost", "--coordinator", f"127.0.0.1:{port}",
        "--num-processes", "2",
    ]
    procs = [
        subprocess.Popen(common_args + ["--process-id", str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"rank {i} failed:\n{logs[i]}"

    for rank in range(2):
        rp = _json(os.path.join(out, f"sweep_result.rank{rank}.json"))
        assert rp["images_total"] == 2  # its stride of the 4 images
    merged = _json(os.path.join(out, "sweep_result.json"))
    assert merged["process_count"] == 2
    assert merged["images_total"] == 4
    assert merged["images_failed"] == 0
    # Each rank journals its own stride (rank-suffixed, resumable).
    for rank in range(2):
        jp = os.path.join(out, f"sweep_journal.rank{rank}.jsonl")
        assert os.path.exists(jp)
        with open(jp) as f:
            rows = [json.loads(l) for l in f if l.strip()]
        assert sum(1 for r in rows
                   if r["event"] in ("image_done", "skip_misclassified")) == 2


def test_cli_gp_classification_ckpt_roundtrip(tmp_path):
    """Train saves the variational GP state; eval restores it (reference
    gp_classification.py:217,222-228 semantics)."""
    # Reuse a tiny mask npz.
    out0 = str(tmp_path / "gen")
    cli_imagenet.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num_mask_samples", "8", "--mask-batch", "4", "--dtype", "float32",
        "--segmenter", "slic", "--n_segments", "9",
        "--skip-threshold-search", "--out", out0,
    ])
    ckpt = str(tmp_path / "gpck")
    out1 = str(tmp_path / "train")
    cli_gpc.main(["--masks", os.path.join(out0, "masks.npz"), "--dataset", "mnist",
                  "--gp_iters", "5", "--train_subsample", "128",
                  "--gp-ckpt", ckpt, "--out", out1])
    out2 = str(tmp_path / "eval")
    cli_gpc.main(["--masks", os.path.join(out0, "masks.npz"), "--dataset", "mnist",
                  "--gp-mode", "eval", "--train_subsample", "128",
                  "--gp-ckpt", ckpt, "--out", out2])
    r1 = _json(os.path.join(out1, "gp_classification_result.json"))
    r2 = _json(os.path.join(out2, "gp_classification_result.json"))
    np.testing.assert_allclose(r1["prob_range"], r2["prob_range"], atol=1e-5)


def test_cli_bo_batched(tmp_path):
    import json

    from network_interpretation_imagenet_tpu.cli import (
        bayesian_active_learning_imagenet as bo_cli,
    )

    out = str(tmp_path)
    bo_cli.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--dtype", "float32", "--num-images", "3", "--n_iters", "2",
        "--n_pre_samples", "2", "--out", out,
    ])
    with open(f"{out}/bo_result.json") as f:
        res = json.load(f)
    assert res["num_images"] == 3
    assert len(res["per_image"]) == 3
    for i, row in enumerate(res["per_image"]):
        assert row["eval_img_index"] == 1 + i
        assert 0 <= row["survived"] <= 6
    import os as _os
    assert _os.path.exists(f"{out}/heatmap_2.png")


def test_compilation_cache_toggle(tmp_path, monkeypatch):
    """enable_compilation_cache: explicit dir wins, env-var off disables."""
    import jax

    from network_interpretation_imagenet_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    prev = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "xla_cache")
        assert enable_compilation_cache(d) == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

        monkeypatch.setenv("NIT_COMPILATION_CACHE", "off")
        assert enable_compilation_cache() == ""
    finally:
        # don't leave the process-global config pointing at a deleted tmp dir
        jax.config.update("jax_compilation_cache_dir", prev)


def test_build_engine_honors_densenet_shape_flags(tmp_path):
    """--growth-rate/--bn-size/--compression must reach create_model
    (regression: build_engine dropped them, so trained DenseNet params
    could not be reloaded for saliency)."""
    from network_interpretation_imagenet_tpu.cli import common

    p = common.build_parser("t")
    args = p.parse_args([
        "--arch", "densenet", "--dataset", "cifar10", "--depth", "10",
        "--growth-rate", "24", "--synthetic", "--out", str(tmp_path),
    ])
    engine = common.build_engine(args)
    assert engine.bundle.module.growth_rate == 24


def test_cli_fidelity_metrics(tmp_path):
    """--fidelity adds deletion/insertion AUC to the result payload."""
    out = str(tmp_path)
    cli_imagenet.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num_mask_samples", "8", "--mask-batch", "8", "--dtype", "float32",
        "--segmenter", "slic", "--n_segments", "9",
        "--skip-threshold-search", "--fidelity", "--out", out,
    ])
    r = _json(os.path.join(out, "gp_training_data_result.json"))
    assert 0.0 <= r["deletion_auc"] <= 1.0
    assert 0.0 <= r["insertion_auc"] <= 1.0


def test_cli_compare_saliency_methods(tmp_path):
    """The method-comparison CLI runs a mixed method set end-to-end on
    synthetic data and emits a ranking with both fidelity AUCs."""
    import json

    from network_interpretation_imagenet_tpu.cli import (
        compare_saliency_methods,
    )

    rc = compare_saliency_methods.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "2", "--num_mask_samples", "8",
        # 'window' twice: duplicates dedup instead of double-counting rows.
        "--methods", "window,window,gradient,smoothgrad,rise,gradcam,"
                     "scorecam,xrai,meaningful",
        "--lm-iters", "5", "--lm-mask-size", "7", "--lm-jitter", "2",
        "--rise-masks", "32", "--rise-grid", "4", "--sg-samples", "4",
        "--fidelity-steps", "8", "--out", str(tmp_path),
        "--platform", "cpu", "--mask-batch", "16",
    ])
    assert rc == 0
    payload = json.loads((tmp_path / "method_comparison.json").read_text())
    assert payload["images_used"] == 2
    assert set(payload["ranking"]) == {"window", "gradient", "smoothgrad",
                                       "rise", "gradcam", "scorecam",
                                       "xrai", "meaningful"}
    assert len(payload["ranking"]) == 8  # dup 'window' collapsed
    for m, s in payload["methods"].items():
        assert s["images"] == 2
        assert 0.0 <= s["mean_deletion_auc"] <= 1.0
        assert 0.0 <= s["mean_insertion_auc"] <= 1.0


def test_cli_compare_saliency_gp_methods(tmp_path):
    """'gp' (Kronecker pixel-GP mean) and 'gp_cls' (Bernoulli variational
    GP) rank alongside their window training field, with paired-bootstrap
    margin CIs and a tier partition of the ranking."""
    import json

    from network_interpretation_imagenet_tpu.cli import (
        compare_saliency_methods,
    )

    rc = compare_saliency_methods.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "3", "--num_mask_samples", "8",
        "--methods", "window,gp,gp_cls",
        "--gp_iters", "5", "--gp-cls-iters", "5", "--gp-grid-size", "4",
        "--bootstrap", "200",
        "--fidelity-steps", "8", "--out", str(tmp_path),
        "--platform", "cpu", "--mask-batch", "16",
    ])
    assert rc == 0
    payload = json.loads((tmp_path / "method_comparison.json").read_text())
    assert set(payload["ranking"]) == {"window", "gp", "gp_cls"}
    # Tiers partition the ranking in order.
    assert [m for t in payload["tiers"] for m in t] == payload["ranking"]
    for m in payload["ranking"]:
        s = payload["methods"][m]
        lo, hi = s["margin_ci95"]
        assert lo <= s["margin_mean"] <= hi
    # Adjacent-pair separation probabilities exist for every boundary.
    assert len(payload["adjacent_separation"]) == 2


def test_cli_compare_saliency_gp_soft_knockout_field(tmp_path):
    """--gp-field knockout --gp-labels soft: the GP surrogates train on a
    RISE-style soft-label knockout field (which cannot hard-degenerate),
    and the summary records field/labels provenance plus per-method
    degenerate-image counts."""
    import json

    from network_interpretation_imagenet_tpu.cli import (
        compare_saliency_methods,
    )

    rc = compare_saliency_methods.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "2", "--num_mask_samples", "8",
        "--methods", "window,field,gp,gp_cls",
        "--gp-field", "knockout", "--gp-labels", "soft",
        "--gp_iters", "5", "--gp-cls-iters", "5", "--gp-grid-size", "4",
        "--bootstrap", "100",
        "--fidelity-steps", "8", "--out", str(tmp_path),
        "--platform", "cpu", "--mask-batch", "16",
    ])
    assert rc == 0
    payload = json.loads((tmp_path / "method_comparison.json").read_text())
    assert payload["gp_field"] == "knockout"
    assert payload["gp_labels"] == "soft"
    for m in ("window", "field", "gp", "gp_cls"):
        s = payload["methods"][m]
        assert 0 <= s["degenerate_images"] <= s["images"]
    # 'field' is the raw training field — the ablation baseline the gp
    # row is judged against; same field, so same degeneracy accounting.
    assert (payload["methods"]["field"]["degenerate_images"]
            == payload["methods"]["gp"]["degenerate_images"])
    # Degeneracy is judged on the LABELS (ptp of prob_target for soft
    # fields), and a random-init net emits an exactly-uniform softmax for
    # every masked input — so on this fixture the accounting must flag
    # the gp rows as degenerate rather than report coverage noise as
    # signal. (On a trained net soft labels vary and the rows turn
    # informative — asserted by the committed chip study.)
    assert (payload["methods"]["gp"]["degenerate_images"]
            == payload["methods"]["gp"]["images"])


def test_cli_compare_saliency_skip_degenerate(tmp_path):
    """--skip-degenerate filters images whose mask-label field carries no
    model signal; the summary reports how many were skipped during the
    scan, and scanning extends past --num-images to find scoreable ones."""
    import json

    from network_interpretation_imagenet_tpu.cli import (
        compare_saliency_methods,
    )

    rc = compare_saliency_methods.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "2", "--num_mask_samples", "8",
        "--methods", "window,gp",
        "--skip-degenerate",
        "--gp_iters", "5", "--bootstrap", "100",
        "--fidelity-steps", "8", "--out", str(tmp_path),
        "--platform", "cpu", "--mask-batch", "16",
    ])
    payload_path = tmp_path / "method_comparison.json"
    if rc == 0:
        payload = json.loads(payload_path.read_text())
        assert payload["skipped_degenerate"] >= 0
        # Every scored image passed the field-signal filter, so no gp row
        # can be field-degenerate.
        assert payload["methods"]["gp"]["degenerate_images"] == 0
    else:
        # All scanned images lacked mask signal — a legal outcome on tiny
        # synthetic slices; the CLI must fail gracefully (rc=1, no JSON).
        assert rc == 1
        assert not payload_path.exists()


def test_cli_compare_saliency_jpeg_dir(tmp_path):
    """--jpeg-dir scores real committed JPEGs (resized/cropped/normalized
    to the dataset's input geometry, incl. the 1-channel collapse) as a
    secondary table; the JSON stamps source='jpeg-dir'."""
    import json

    from network_interpretation_imagenet_tpu.cli import (
        compare_saliency_methods,
    )

    rc = compare_saliency_methods.main([
        "--jpeg-dir", "tests/fixtures/imagenet_loc",
        "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "8",  # capped by the 3 fixture JPEGs
        "--methods", "gradient,rise", "--num_mask_samples", "8",
        "--bootstrap", "100", "--fidelity-steps", "8",
        "--out", str(tmp_path), "--platform", "cpu", "--mask-batch", "16",
    ])
    assert rc == 0
    payload = json.loads((tmp_path / "method_comparison.json").read_text())
    assert payload["source"] == "jpeg-dir"
    assert payload["images_used"] == 3  # every fixture JPEG, no skip rule
    assert set(payload["ranking"]) == {"gradient", "rise"}


def test_cli_saliency_sweep_attribute(tmp_path):
    """--attribute drives the sweep with batched gradient-family
    attribution (no segmentation pass; per-image rows carry the method)."""
    from network_interpretation_imagenet_tpu.cli import (
        saliency_sweep as cli_sweep,
    )

    out = str(tmp_path)
    cli_sweep.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "3", "--image-batch", "2", "--dtype", "float32",
        "--attribute", "smoothgrad", "--sg-samples", "3", "--out", out,
    ])
    r = _json(os.path.join(out, "sweep_result.json"))
    assert r["images_total"] == 3
    assert r["images_failed"] == 0
    assert r["evals_per_sec"] > 0


def test_cli_saliency_sweep_uint8_wire(tmp_path):
    """--uint8-wire: synthetic images travel as raw u8 and are normalized
    on device; works for both batched-flush lanes, refused elsewhere."""
    import pytest

    from network_interpretation_imagenet_tpu.cli import (
        saliency_sweep as cli_sweep,
    )

    out = str(tmp_path / "attr")
    cli_sweep.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "3", "--image-batch", "2", "--dtype", "float32",
        "--attribute", "integrated", "--ig-steps", "4",
        "--uint8-wire", "--out", out,
    ])
    r = _json(os.path.join(out, "sweep_result.json"))
    assert r["images_total"] == 3 and r["images_failed"] == 0

    out2 = str(tmp_path / "bo")
    cli_sweep.main([
        "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
        "--num-images", "2", "--image-batch", "2", "--dtype", "float32",
        "--bo", "--n_iters", "2", "--n_pre_samples", "2",
        "--segmenter", "slic", "--n_segments", "9",
        "--uint8-wire", "--out", out2,
    ])
    r2 = _json(os.path.join(out2, "sweep_result.json"))
    assert r2["images_total"] == 2 and r2["images_failed"] == 0

    # The window/knockout driver normalizes host-side: flag refused.
    with pytest.raises(SystemExit):
        cli_sweep.main([
            "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
            "--num-images", "2", "--uint8-wire", "--out", str(tmp_path),
        ])


def test_cli_saliency_sweep_mask_batched_methods(tmp_path):
    """--attribute occlusion/rise/scorecam: one jitted mask-batched
    program per image, full sweep artifacts (rows, evals accounting,
    method hyperparameters pass through)."""
    from network_interpretation_imagenet_tpu.cli import (
        saliency_sweep as cli_sweep,
    )

    for method, extra in (
        ("rise", ["--rise-masks", "16", "--rise-grid", "4",
                  "--attr-mask-batch", "8"]),
        ("occlusion", ["--patch", "8", "--stride", "8"]),
        ("scorecam", ["--scorecam-channels", "4"]),
    ):
        out = str(tmp_path / method)
        cli_sweep.main([
            "--synthetic", "--arch", "mnist_cnn", "--dataset", "mnist",
            "--num-images", "3", "--image-batch", "2", "--dtype", "float32",
            "--attribute", method, "--out", out,
        ] + extra)
        r = _json(os.path.join(out, "sweep_result.json"))
        assert r["images_total"] == 3, method
        assert r["images_failed"] == 0, method
        assert r["evals_per_sec"] > 0, method
