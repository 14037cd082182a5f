"""Shared CLI plumbing: flags, image/engine resolution, artifact writers.

Consolidates the ~40-line argparse blocks duplicated across the reference
scripts (``bayesian_active_learning_imagenet.py:48-87``,
``generate_gp_training_data_imagenet.py:42-81``, ``args.py:11-117``) into one
parser builder with the same flag names.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional, Tuple

import numpy as np

from network_interpretation_imagenet_tpu.config import DATASETS, SegmentConfig

# Architecture flags restored from a checkpoint on --resume, so the rebuilt
# model always matches the saved weights even when the CLI flags drifted
# (reference ``args.py:79-80`` ``arch_resume_names``).
ARCH_RESUME_NAMES = (
    "arch", "depth", "death_mode", "death_rate", "growth_rate", "bn_size",
    "compression",
)


def apply_arch_resume(args, arch_args: Optional[dict]) -> None:
    """Overwrite ``args``' architecture flags from a checkpoint's saved
    ``arch_args`` (no-op when the checkpoint predates them)."""
    if not arch_args:
        return
    for name in ARCH_RESUME_NAMES:
        if name in arch_args:
            val = arch_args[name]
            setattr(args, name, val.item() if hasattr(val, "item") else val)


def build_parser(description: str, dataset_default: str = "imagenet") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    g = p.add_argument_group("data")
    g.add_argument("--data", default=None, help="dataset root directory")
    g.add_argument("--dataset", default=dataset_default, choices=sorted(DATASETS))
    g.add_argument("--synthetic", action="store_true",
                   help="use a deterministic synthetic image (no dataset needed)")
    g.add_argument("--eval_img_index", type=int, default=1,
                   help="index of the evaluation image (reference flag)")
    g.add_argument("--workers", "-j", type=int, default=4,
                   help="decode/prefetch threads for real-data sweeps "
                        "(reference DataLoader num_workers; 0 = serial)")

    g = p.add_argument_group("model")
    g.add_argument("--arch", "-a", default="resnet18",
                   help="resnet18/34/50/101/152 | vgg* | resnet (CIFAR) | densenet | mnist_cnn")
    g.add_argument("--depth", "-d", type=int, default=56,
                   help="depth for CIFAR resnet/densenet")
    # Reference arch flags (args.py:62-77); restored from a resumed
    # checkpoint via ARCH_RESUME_NAMES (args.py:79-80 semantics).
    g.add_argument("--death-mode", default="none",
                   choices=["none", "linear", "uniform"])
    g.add_argument("--death-rate", type=float, default=0.5)
    g.add_argument("--growth-rate", type=int, default=12,
                   help="DenseNet growth rate")
    g.add_argument("--bn-size", type=int, default=4,
                   help="DenseNet bottleneck ratio")
    g.add_argument("--compression", type=float, default=0.5,
                   help="DenseNet compression ratio")
    g.add_argument("--ckpt", default=None,
                   help=".pth.tar (torch), a torch-free artifact dir/"
                        ".msgpack from cli.convert_checkpoint, or an orbax "
                        "dir to load weights from")
    g.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    g.add_argument("--mask-batch", type=int, default=1024)

    g = p.add_argument_group("segmentation")
    g.add_argument("--segmenter", default="felzenszwalb",
                   choices=["felzenszwalb", "slic"])
    # None = area-adaptive: the reference's scale=100 calibrated at 224²
    # (identity there), area-scaled for other resolutions — FH scale has
    # pixel-count units, and 100 collapses a 32×32 display to ONE
    # segment. Pass --scale 100 explicitly for raw reference behavior.
    g.add_argument("--scale", type=float, default=None)
    g.add_argument("--sigma", type=float, default=0.5)
    # None = per-dataset reference default (50 imagenet / 5 mnist / 10 cifar,
    # resolved in segment_config); an explicit value always wins.
    g.add_argument("--min_size", type=int, default=None)
    g.add_argument("--n_segments", type=int, default=48)

    g = p.add_argument_group("masks")
    g.add_argument("--num_mask_samples", type=int, default=100)
    g.add_argument("--window_fraction", type=float, default=0.4)
    g.add_argument("--num_masked_superpixels", type=int, default=1)

    g = p.add_argument_group("output")
    g.add_argument("--out", default="./outputs", help="artifact directory")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--save-pngs", action="store_true",
                   help="also write per-mask PNGs like the reference ./masks dir")

    g = p.add_argument_group("debug")
    g.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans: every jitted computation "
                        "re-checks outputs for NaN and errors at the "
                        "producing op (SURVEY §5 sanity-checking plan)")
    g.add_argument("--compilation-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory "
                        "(default ~/.cache/network_interpretation_imagenet_tpu"
                        "/xla; repeat runs skip the 30-170s cold compiles)")
    g.add_argument("--no-compilation-cache", dest="compilation_cache",
                   action="store_const", const="off",
                   help="disable the persistent compilation cache")
    g.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the JAX backend (jax.config, applied before "
                        "first backend use — works even where the "
                        "environment pre-selects a platform plugin)")
    g.add_argument("--local-devices", type=int, default=None,
                   help="(--platform cpu) number of virtual local CPU "
                        "devices, e.g. to emulate a multi-chip host")
    return p


def apply_debug_flags(args) -> None:
    """Apply runtime toggles that must run before any jit executes."""
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
        if getattr(args, "local_devices", None) and args.platform == "cpu":
            jax.config.update("jax_num_cpu_devices", int(args.local_devices))
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    from network_interpretation_imagenet_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    cache = getattr(args, "compilation_cache", None)
    enable_compilation_cache(None if cache is None else cache)


def add_method_flags(
    p: argparse.ArgumentParser,
    rise_masks: int = 500,
    sg_samples: int = 16,
    lm_iters: int = 150,
    lm_jitter: int = 4,
) -> None:
    """Per-method attribution hyperparameters, shared by every CLI that
    dispatches through ``compare_saliency_methods._heatmap`` (occlusion_
    saliency, compare_saliency_methods, attribution_sanity) — one flag
    set, per-CLI default overrides via the keyword args."""
    g = p.add_argument_group("attribution method hyperparameters")
    # None = resolution-adaptive (32 at 224² scaled to the image side,
    # floor 4; stride = patch//2): a fixed 32 on a 32×32 input admits
    # exactly ONE occlusion position — constant, information-free map.
    g.add_argument("--patch", type=int, default=None,
                   help="occlusion: patch side (default: adaptive, "
                        "32 at 224² scaled linearly, floor 4)")
    g.add_argument("--stride", type=int, default=None,
                   help="occlusion: stride (default: patch // 2)")
    g.add_argument("--ig-steps", type=int, default=16,
                   help="integrated/xrai: path steps")
    g.add_argument("--sg-samples", type=int, default=sg_samples,
                   help="smoothgrad: noisy copies averaged (one vmapped "
                        "backward)")
    g.add_argument("--sg-sigma", type=float, default=0.15,
                   help="smoothgrad: Gaussian noise sigma RELATIVE to the "
                        "image's value range (paper convention)")
    g.add_argument("--sg-squared", action="store_true",
                   help="smoothgrad: average squared gradients "
                        "(SmoothGrad²)")
    g.add_argument("--rise-masks", type=int, default=rise_masks,
                   help="rise: random soft masks (rounded up to a batch "
                        "multiple)")
    g.add_argument("--rise-grid", type=int, default=7,
                   help="rise: low-res Bernoulli grid size")
    g.add_argument("--rise-keep", type=float, default=0.5,
                   help="rise: per-cell keep probability")
    g.add_argument("--gradcam-layer", default=None,
                   help="module path for gradcam/scorecam (default: "
                        "deepest conv block; 'list' prints the menu in "
                        "occlusion_saliency)")
    g.add_argument("--scorecam-channels", type=int, default=64,
                   help="scorecam: top-K activation channels scored by "
                        "masked forwards")
    g.add_argument("--xrai-scales", default="auto",
                   help="xrai: comma list of felzenszwalb scales for the "
                        "oversegmentation ladder, or 'auto' (default) for "
                        "the paper's 224² ladder 50,100,150,250,500 "
                        "area-scaled to the input resolution — the FH "
                        "scale parameter has pixel-count units, so the "
                        "224² values over-merge small images to one "
                        "region (constant, information-free heatmap)")
    g.add_argument("--lm-mask-size", type=int, default=28,
                   help="meaningful: low-res mask grid side")
    g.add_argument("--lm-iters", type=int, default=lm_iters)
    g.add_argument("--lm-l1", type=float, default=0.05,
                   help="meaningful: deletion-area weight")
    g.add_argument("--lm-tv", type=float, default=0.1,
                   help="meaningful: mean-TV smoothness weight")
    g.add_argument("--lm-jitter", type=int, default=lm_jitter,
                   help="meaningful: shifted copies per step")
    g.add_argument("--lm-baseline", default="blur",
                   choices=["blur", "zero"])


def parse_xrai_scales(spec: str):
    """``--xrai-scales`` string → list of floats, or None for 'auto'
    (callees then use ``xrai.adaptive_scales`` for their resolution)."""
    if spec is None or spec.strip().lower() in ("auto", ""):
        return None
    return [float(s) for s in spec.split(",")]


def add_bo_flags(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("bayesian optimization")
    g.add_argument("--n_iters", type=int, default=10)
    g.add_argument("--n_pre_samples", type=int, default=3)
    # The one-jit fused loop amortizes its (minutes-long) compile across many
    # images — sweeps and the library default use it. A one-image CLI run is
    # ~5× faster end-to-end on the host-driven loop (same math), so that is
    # the CLI default; --fused opts in.
    g.add_argument("--fused", dest="fused", action="store_true", default=False,
                   help="run the one-jit fused BO loop (best when explaining "
                        "many images; long first compile)")
    g.add_argument("--no-fused", dest="fused", action="store_false",
                   help="use the host-driven BO loop (default; fastest for "
                        "a single image)")


def add_gp_flags(p: argparse.ArgumentParser) -> None:
    g = p.add_argument_group("gp surrogate")
    g.add_argument("--gp-mode", default="train", choices=["train", "eval", "train+eval"],
                   help="reference gp_regression.py Train/Eval switch")
    g.add_argument("--grid_size", type=int, default=30)
    g.add_argument("--gp_iters", type=int, default=20)
    g.add_argument("--gp_lr", type=float, default=0.1)
    g.add_argument("--gp-ckpt", default="./gp_saved_checkpoints")


def segment_config(args) -> SegmentConfig:
    spec = DATASETS[args.dataset]
    min_size = args.min_size
    if min_size is None:  # per-dataset reference defaults
        if args.dataset == "mnist":
            min_size = 5   # reference generate_gp_training_data_mnist.py:187
        elif args.dataset.startswith("cifar"):
            min_size = 10  # reference generate_gp_training_data_cifar.py:293
        else:
            min_size = 50  # reference bayesian_active_learning_imagenet.py:150
    return SegmentConfig(
        method=args.segmenter, scale=args.scale, sigma=args.sigma,
        min_size=min_size, n_segments=args.n_segments,
    )


# Dataset/array cache: N-image CLI paths call resolve_image once per index;
# without this each call re-parses LOC_val_solution.csv / re-reads the whole
# IDX/pickle test set just to pull one sample.
_DATASET_CACHE: dict = {}


def _cached_dataset(key, build):
    if key not in _DATASET_CACHE:
        _DATASET_CACHE[key] = build()
    return _DATASET_CACHE[key]


def resolve_image(args) -> Tuple[np.ndarray, np.ndarray, Optional[int], Optional[np.ndarray]]:
    """→ (normalized f32 HWC image, display uint8 HWC, label?, gt_bbox?)."""
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.ops import preprocess

    spec = DATASETS[args.dataset]
    if args.synthetic or not args.data:
        from network_interpretation_imagenet_tpu.data import synthetic_imagenet_image

        base = synthetic_imagenet_image(args.seed + args.eval_img_index, spec.image_size)
        if spec.channels == 1:
            base = base[:, :, :1]
        img = np.asarray(
            preprocess.normalize(jnp.asarray(base), spec.mean, spec.std)
        )
        disp = np.asarray(preprocess.to_display_uint8(jnp.asarray(img)))
        if spec.channels == 1:
            disp = disp[:, :, 0]
        return img, disp, None, None

    if args.dataset == "imagenet":
        if os.path.exists(os.path.join(args.data, "LOC_val_solution.csv")):
            from network_interpretation_imagenet_tpu.data import (
                ImagenetLocalizationDataset,
            )

            ds = _cached_dataset(
                ("loc", args.data),
                lambda: ImagenetLocalizationDataset(args.data),
            )
        else:
            # Plain class-subdirectory layout — the reference's ImageFolder
            # path (generate_gp_training_data_imagenet.py:594-602); no gt
            # boxes.
            from network_interpretation_imagenet_tpu.data.image_folder import (
                ImageFolderDataset,
            )

            ds = _cached_dataset(
                ("folder", args.data), lambda: ImageFolderDataset(args.data)
            )
        # Reference counts images 1-based (count == eval_img_index).
        img, label, gt = ds[max(args.eval_img_index - 1, 0)]
        disp = np.asarray(preprocess.to_display_uint8(jnp.asarray(img)))
        return img, disp, label, gt
    if args.dataset == "mnist":
        from network_interpretation_imagenet_tpu.data import load_mnist_dir

        xs, ys = _cached_dataset(
            ("mnist", args.data), lambda: load_mnist_dir(args.data, train=False)
        )
        i = max(args.eval_img_index - 1, 0)
        img = xs[i]
        disp = (img[:, :, 0] * 255).astype(np.uint8)
        return img, disp, int(ys[i]), None
    if args.dataset.startswith("cifar"):
        from network_interpretation_imagenet_tpu.data.loaders import (
            load_cifar10_dir,
            load_cifar100_dir,
        )
        from network_interpretation_imagenet_tpu.ops import preprocess as pp

        loader = (
            load_cifar100_dir if args.dataset.startswith("cifar100")
            else load_cifar10_dir
        )
        xs, ys = _cached_dataset(
            (args.dataset, args.data), lambda: loader(args.data, train=False)
        )
        i = max(args.eval_img_index - 1, 0)
        img = np.asarray(pp.normalize(jnp.asarray(xs[i]), spec.mean, spec.std))
        disp = np.asarray(pp.to_display_uint8(jnp.asarray(img)))
        return img, disp, int(ys[i]), None
    raise ValueError(args.dataset)


def build_engine(args, num_classes: Optional[int] = None):
    import jax
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.models import create_model
    from network_interpretation_imagenet_tpu.saliency import SaliencyEngine
    from network_interpretation_imagenet_tpu.utils import convert

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bundle = create_model(
        args.arch, args.dataset, num_classes=num_classes,
        depth=args.depth, dtype=dtype,
        # DenseNet shape flags (parser exposes them; dropping them here would
        # build a default-shape model that can't load the trained params)
        growth_rate=getattr(args, "growth_rate", 12),
        bn_size=getattr(args, "bn_size", 4),
        compression=getattr(args, "compression", 0.5),
    )
    if args.ckpt and convert.is_weights_artifact(args.ckpt):
        # Torch-free path: artifact written once by cli.convert_checkpoint
        # (weights.msgpack + meta.json); inference hosts never import torch.
        variables, meta = convert.load_weights_artifact(args.ckpt)
        if meta.get("arch") and meta["arch"] != args.arch:
            raise ValueError(
                f"--ckpt artifact was converted for arch {meta['arch']!r} "
                f"but --arch is {args.arch!r}"
            )
    elif args.ckpt and args.ckpt.endswith((".pth.tar", ".pth", ".tar")):
        variables = convert.convert_checkpoint(
            args.ckpt, args.arch, depth=args.depth,
            bn_size=getattr(args, "bn_size", 4),
        )
    elif args.ckpt:
        from network_interpretation_imagenet_tpu.utils.checkpoint import restore_checkpoint

        blob = restore_checkpoint(os.path.dirname(args.ckpt) or ".",
                                  os.path.basename(args.ckpt))
        variables = {"params": blob["params"]}
        if "batch_stats" in blob:
            variables["batch_stats"] = blob["batch_stats"]
    else:
        print("[warn] no --ckpt: random-initialized weights", file=sys.stderr)
        variables = bundle.init(jax.random.PRNGKey(args.seed))
    return SaliencyEngine(bundle, variables, mask_batch=args.mask_batch, compute_dtype=dtype)


def segment_display(disp: np.ndarray, cfg: SegmentConfig) -> np.ndarray:
    from network_interpretation_imagenet_tpu.segment import segment_image

    return segment_image(disp, cfg)


# --- artifacts -------------------------------------------------------------


def write_heatmap_png(path: str, heat: np.ndarray) -> None:
    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.ops import aggregate, colormap

    gray = np.asarray(aggregate.normalize_to_uint8(jnp.asarray(heat)))
    bgr = np.asarray(colormap.apply_jet(jnp.asarray(gray)))
    _imwrite(path, bgr)


def _imwrite(path: str, bgr: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import cv2

        cv2.imwrite(path, bgr)
    except Exception:
        from PIL import Image

        Image.fromarray(bgr[:, :, ::-1] if bgr.ndim == 3 else bgr).save(path)


def save_mask_npz(path: str, **arrays) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **arrays)


def save_mask_pngs(out_dir: str, masks: np.ndarray, labels: np.ndarray) -> None:
    """Reference artifact parity: ``masks/mask_{i}_{0|1}.png`` with 255=keep
    (``generate_gp_training_data_imagenet.py:257-266``)."""
    os.makedirs(out_dir, exist_ok=True)
    for i, (m, lab) in enumerate(zip(masks, labels)):
        _imwrite(os.path.join(out_dir, f"mask_{i}_{int(lab)}.png"),
                 (m.astype(np.uint8) * 255))


def emit_result(out_dir: str, name: str, payload: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, name), "w") as f:
        json.dump(payload, f, indent=2, default=str)
    print(json.dumps(payload, default=str))
