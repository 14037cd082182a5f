"""TPU ImageNet training — the ``main.py`` the reference README advertises.

The reference repo's headline usage is the stock PyTorch ImageNet trainer
(``/root/reference/README.md:14-24``: ``python main.py -a resnet18
[imagenet-folder with train and val folders]``) but ships no ``main.py``
(SURVEY.md §2 "referenced but missing"). This re-creates that surface
TPU-first: the dp×tp mesh-sharded train step (`parallel.train_step`), the
epoch harness with scores.tsv / best-checkpoint / resume
(`train.harness.Trainer`), decode-ahead augmentation workers
(`data.imagenet_train`, worker-count-invariant RNG), and the stock flag
set (``-a/-j/--epochs/-b/--lr/--momentum/--weight-decay/-p/--resume/-e/
--pretrained``) with the 0.1→÷10-every-30-epochs schedule.

Run it with the module path::

    python -m network_interpretation_imagenet_tpu.cli.main -a resnet18 <imagenet-dir>
    python -m network_interpretation_imagenet_tpu.cli.main -a resnet50 -e \
        --pretrained weights/resnet50 <imagenet-dir>
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

from network_interpretation_imagenet_tpu.config import TrainConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU ImageNet Training")
    p.add_argument("data", nargs="?", default=None,
                   help="path to dataset (ImageFolder train/ and val/ subdirs)")
    p.add_argument("--arch", "-a", default="resnet18",
                   help="model architecture (any zoo name: resnet*, vgg*, "
                        "alexnet, densenet*, ... default: resnet18)")
    p.add_argument("--workers", "-j", type=int, default=4,
                   help="number of data loading workers (default: 4)")
    p.add_argument("--epochs", type=int, default=90,
                   help="number of total epochs to run")
    p.add_argument("--start-epoch", type=int, default=0,
                   help="manual epoch number (useful on restarts)")
    p.add_argument("--batch-size", "-b", type=int, default=256,
                   help="mini-batch size (default: 256)")
    p.add_argument("--lr", "--learning-rate", type=float, default=0.1,
                   help="initial learning rate (use 0.01 for alexnet/vgg)")
    p.add_argument("--momentum", type=float, default=0.9, help="momentum")
    p.add_argument("--weight-decay", "--wd", type=float, default=1e-4,
                   help="weight decay (default: 1e-4)")
    p.add_argument("--print-freq", "-p", type=int, default=10,
                   help="print frequency (default: 10)")
    p.add_argument("--resume", default="", metavar="PATH",
                   help="path to latest checkpoint dir (default: none)")
    p.add_argument("--evaluate", "-e", action="store_true",
                   help="evaluate model on validation set")
    p.add_argument("--pretrained", default=None, metavar="CKPT",
                   help="initialize from weights: a torch .pth[.tar], or a "
                        "torch-free artifact from cli.convert_checkpoint "
                        "(the reference's pretrained=True downloads at "
                        "runtime; here weights are an explicit artifact)")
    # -- beyond the stock surface -------------------------------------------
    p.add_argument("--save", default="./outputs/imagenet_train",
                   help="checkpoint/scores directory")
    p.add_argument("--crop", type=int, default=224)
    p.add_argument("--patience", type=int, default=0,
                   help="early stop after N non-improving epochs (0 = off)")
    p.add_argument("--save-every-steps", type=int, default=0,
                   help="preemption-safe MID-epoch checkpoints every N train "
                        "steps (0 = per-epoch only); --resume re-enters the "
                        "epoch at the exact batch, update-for-update")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit-images", type=int, default=None,
                   help="truncate train/val sets (smoke runs)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on a synthetic separable batch (no dataset)")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="devices per tensor-parallel group (rest go to data "
                        "parallelism over the batch)")
    p.add_argument("--debug-nans", action="store_true")
    p.add_argument("--compilation-cache", default=None, metavar="DIR")
    p.add_argument("--no-compilation-cache", dest="compilation_cache",
                   action="store_const", const="off")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--local-devices", type=int, default=None)
    p.add_argument("--multihost", action="store_true",
                   help="multi-process (DCN) data-parallel training: "
                        "initialize jax.distributed, shard the GLOBAL batch "
                        "across processes (each rank decodes only its slice "
                        "and contributes it via "
                        "jax.make_array_from_process_local_data), rank 0 "
                        "owns checkpoints/scores")
    p.add_argument("--coordinator", default=None,
                   help="(--multihost) coordinator address host:port")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from network_interpretation_imagenet_tpu.cli import common

    common.apply_debug_flags(args)

    from network_interpretation_imagenet_tpu.data.imagenet_train import (
        TrainImageFolder,
    )
    from network_interpretation_imagenet_tpu.data.image_folder import (
        ImageFolderDataset,
    )
    from network_interpretation_imagenet_tpu.models import create_model
    from network_interpretation_imagenet_tpu.parallel import make_mesh
    from network_interpretation_imagenet_tpu.train import Trainer

    rank, world = 0, 1
    if args.multihost:
        if args.model_parallel > 1:
            print("error: --multihost supports data parallelism only "
                  "(--model-parallel must be 1: checkpoints read the local "
                  "replica, which tensor-sharding across processes breaks)",
                  file=sys.stderr)
            return 2
        from network_interpretation_imagenet_tpu.parallel import multihost

        if not multihost.initialize_distributed(
            args.coordinator, args.num_processes, args.process_id
        ):
            # initialize_distributed no-ops without coordinator info; two
            # hosts each silently running as "rank 0" would race on the
            # shared checkpoint dir AND not actually be distributed.
            print("error: --multihost could not initialize jax.distributed "
                  "— pass --coordinator/--num-processes/--process-id or set "
                  "JAX_COORDINATOR_ADDRESS (refusing to degrade to a silent "
                  "single-process run)", file=sys.stderr)
            return 2
        import jax as _jax

        rank, world = _jax.process_index(), _jax.process_count()
        if args.batch_size % max(world, 1):
            print(f"error: --batch-size {args.batch_size} (GLOBAL) must "
                  f"divide evenly across {world} processes", file=sys.stderr)
            return 2

    mesh = make_mesh(model_parallel=args.model_parallel)

    # -- data ---------------------------------------------------------------
    if args.synthetic:
        from network_interpretation_imagenet_tpu.data import (
            synthetic_classification_batch,
        )
        from network_interpretation_imagenet_tpu.data.loaders import ArrayLoader

        num_classes = 8
        n = args.limit_images or 256
        x, y = synthetic_classification_batch(args.seed, n, args.crop, 3,
                                              num_classes)
        # Under DP the partial global batch is dropped (_RankSlice), so the
        # loader's length — and steps_per_epoch below — must count only FULL
        # batches; mid-epoch save suppression relies on it being exact.
        train_factory = ArrayLoader(x, y, args.batch_size, shuffle=True,
                                    seed=args.seed, drop_last=world > 1)
        val_loader = ArrayLoader(x[-max(n // 4, args.batch_size):],
                                 y[-max(n // 4, args.batch_size):],
                                 args.batch_size)
        steps_per_epoch = len(train_factory)
        if world > 1:
            # Both ranks build the identical loader (same seed → same
            # shuffles); each feeds only its contiguous slice of every FULL
            # global batch to make_array_from_process_local_data (training
            # under DP implies drop_last on the global batch). Validation
            # instead item-strides every batch — full val coverage, counts
            # summed across ranks (Trainer eval_local_metrics).
            train_factory = _RankSlice(train_factory, rank, world,
                                       args.batch_size)
            val_loader = _RankStride(val_loader, rank, world)
    else:
        if not args.data:
            print("error: DIR positional argument (or --synthetic) required",
                  file=sys.stderr)
            return 2
        train_dir = os.path.join(args.data, "train")
        val_dir = os.path.join(args.data, "val")
        if not os.path.isdir(train_dir):
            # Tolerate a bare folder-of-classes layout (no train/val split).
            train_dir = val_dir = args.data
        train_set = TrainImageFolder(train_dir, crop=args.crop, seed=args.seed)
        val_set = ImageFolderDataset(val_dir, crop=args.crop)
        num_classes = max(len(train_set.class_to_label), 2)
        train_indices = None
        val_indices = None
        if args.limit_images:
            train_indices = list(range(min(args.limit_images, len(train_set))))
            val_indices = list(range(min(args.limit_images, len(val_set))))
        n_train = len(train_indices or train_set)
        if n_train < args.batch_size and not args.evaluate:
            # drop_last discards the lone partial batch → every "epoch"
            # would run zero steps while reporting loss 0.0.
            print(
                f"error: train set has {n_train} images (after "
                f"--limit-images) but --batch-size is {args.batch_size}; "
                f"lower -b so at least one full batch exists "
                f"(partial batches are dropped)", file=sys.stderr)
            return 2
        steps_per_epoch = max(1, n_train // args.batch_size)

        process_slice = (rank, world) if world > 1 else None
        train_factory = partial(
            _train_epoch_loader, train_set, args, train_indices, process_slice
        )
        if world > 1:
            # Validation covers EVERY image: rank-strided indices (no
            # global-batch divisibility → no dropped tail), per-rank local
            # eval, counts summed across processes.
            vi = list(val_indices if val_indices is not None
                      else range(len(val_set)))
            val_indices = vi[rank::world]
        val_loader = _ValLoader(val_set, args, val_indices)

    # -- model + trainer ----------------------------------------------------
    bundle = create_model(args.arch, "imagenet", num_classes=num_classes)
    cfg = TrainConfig(
        optimizer="sgd", lr=args.lr, momentum=args.momentum,
        weight_decay=args.weight_decay, epochs=args.epochs,
        batch_size=args.batch_size, patience=args.patience, seed=args.seed,
        decay_rate=0.1, decay_epochs=(30, 60),  # stock schedule: ÷10 every 30
        print_freq=args.print_freq,
    )
    globalize = None
    if world > 1:
        import jax

        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("data"))

        def globalize(images, labels):
            import numpy as np

            images = np.ascontiguousarray(images, np.float32)
            labels = np.ascontiguousarray(labels, np.int32)
            gb = images.shape[0] * world
            return (
                jax.make_array_from_process_local_data(
                    batch_sh, images, (gb,) + images.shape[1:]
                ),
                jax.make_array_from_process_local_data(
                    batch_sh, labels, (gb,)
                ),
            )

    save_dir = args.resume or os.path.join(args.save, f"imagenet-{args.arch}")
    t = Trainer(bundle, cfg, steps_per_epoch=steps_per_epoch, mesh=mesh,
                save_dir=save_dir, arch_args={"arch": args.arch},
                globalize=globalize, eval_local_metrics=world > 1,
                save_every_steps=args.save_every_steps)

    if args.pretrained:
        _load_pretrained(t, bundle, args)
    if args.resume:
        if t.resume():
            print(f"=> resumed from '{args.resume}' (epoch {t.start_epoch})")
        else:
            print(f"=> no checkpoint found at '{args.resume}'")
    elif args.start_epoch:
        t.start_epoch = args.start_epoch

    if args.evaluate:
        loss, err1, err5 = t.evaluate(val_loader)
        print(f" * Prec@1 {100 - err1:.3f} Prec@5 {100 - err5:.3f}")
        _emit(args, {"mode": "evaluate", "val_loss": loss,
                     "top1": 100 - err1, "top5": 100 - err5})
        return 0

    history = t.fit(train_factory, val_loader)
    if history:
        last = history[-1]
        print(f" * Prec@1 {100 - last['val_err1']:.3f} "
              f"Prec@5 {100 - last['val_err5']:.3f} "
              f"(best err1 {t.best_err1:.3f} @ epoch {t.best_epoch})")
    _emit(args, {"mode": "train", "epochs_run": len(history),
                 "best_err1": t.best_err1, "best_epoch": t.best_epoch,
                 "save_dir": save_dir, "history": history})
    return 0


def _train_epoch_loader(train_set, args, indices, process_slice, epoch,
                        skip=0):
    from network_interpretation_imagenet_tpu.data.imagenet_train import (
        epoch_batches,
    )

    return epoch_batches(
        train_set, args.batch_size, epoch=epoch, seed=args.seed,
        shuffle=True, workers=args.workers, drop_last=True, indices=indices,
        process_slice=process_slice, skip=skip,
    )


class _ValLoader:
    """Re-iterable val loader (Trainer.evaluate runs once per epoch)."""

    def __init__(self, val_set, args, indices):
        self.val_set = val_set
        self.args = args
        self.indices = indices

    def __iter__(self):
        from network_interpretation_imagenet_tpu.data.imagenet_train import (
            epoch_batches,
        )

        return epoch_batches(
            self.val_set, self.args.batch_size, epoch=0, seed=0,
            shuffle=False, workers=self.args.workers, indices=self.indices,
        )


class _RankSlice:
    """Feed this rank's contiguous slice of every FULL global batch
    (synthetic TRAIN path: both ranks generate identical global batches;
    the sliced portions concatenate in rank order to exactly the
    single-process batch). Partial global batches are dropped — multihost
    data-parallel training implies drop_last on the global batch."""

    def __init__(self, inner, rank, world, global_batch):
        self.inner = inner
        self.rank, self.world = rank, world
        self.global_batch = int(global_batch)

    def __len__(self):
        return len(self.inner)

    def _slices(self, it):
        local = self.global_batch // self.world
        for images, labels in it:
            if len(labels) != self.global_batch:
                continue  # partial tail: dropped under DP
            lo = self.rank * local
            yield images[lo:lo + local], labels[lo:lo + local]

    def __call__(self, epoch):
        if callable(self.inner):
            inner = self.inner(epoch)
        else:
            if hasattr(self.inner, "set_epoch"):
                # Keep the stateful loader's shuffle a pure function of
                # (seed, epoch) — mid-epoch resume replays the same stream.
                self.inner.set_epoch(epoch)
            inner = iter(self.inner)
        gen = self._slices(inner)
        if hasattr(self.inner, "__len__"):
            # Sized epochs let the Trainer suppress a mid-epoch save that
            # lands ON the final (full) batch — the inner loader is built
            # with drop_last, so its length IS the full-batch count.
            return _SizedIter(gen, len(self.inner))
        return gen

    def __iter__(self):
        return self._slices(iter(self.inner))


class _SizedIter:
    """A one-epoch generator with a known batch count."""

    def __init__(self, gen, n):
        self._gen, self._n = gen, n

    def __iter__(self):
        return iter(self._gen)

    def __len__(self):
        return self._n


class _RankStride:
    """Item-stride every batch (synthetic VAL path): rank r takes items
    r::world, so the ranks' subsets are disjoint and together cover every
    item — no divisibility constraint, no dropped tail. Pairs with
    ``Trainer(eval_local_metrics=True)`` which sums counts across ranks."""

    def __init__(self, inner, rank, world):
        self.inner, self.rank, self.world = inner, rank, world

    def __iter__(self):
        for images, labels in iter(self.inner):
            yield images[self.rank::self.world], labels[self.rank::self.world]


def _load_pretrained(t, bundle, args):
    import jax

    from network_interpretation_imagenet_tpu.utils import convert

    if convert.is_weights_artifact(args.pretrained):
        variables, meta = convert.load_weights_artifact(args.pretrained)
        if meta.get("arch") and meta["arch"] != args.arch:
            raise ValueError(
                f"--pretrained artifact is for arch {meta['arch']!r}, "
                f"--arch is {args.arch!r}")
    else:
        variables = convert.convert_checkpoint(args.pretrained, args.arch)
    # Shapes must match the initialized model BEFORE the swap — a head
    # trained for a different num_classes would otherwise surface as an
    # opaque optimizer-state shape crash on the first train step.
    _check_tree_shapes(variables["params"], t.state.params,
                       args.pretrained, "params")
    _check_tree_shapes(variables.get("batch_stats", {}), t.state.batch_stats,
                       args.pretrained, "batch_stats")
    # Place onto the shardings init established (same rule as resume).
    put = lambda new, like: jax.tree.map(
        lambda n, l: jax.device_put(n, getattr(l, "sharding", None)), new, like
    )
    t.state = t.state._replace(
        params=put(variables["params"], t.state.params),
        batch_stats=put(variables.get("batch_stats", {}), t.state.batch_stats),
    )
    print(f"=> initialized from pretrained weights '{args.pretrained}'")


def _check_tree_shapes(new, like, source, what):
    """Raise a clear error if ``new``'s pytree structure or leaf shapes
    disagree with the initialized model's (``like``)."""
    import jax

    ts_new = jax.tree_util.tree_structure(new)
    ts_like = jax.tree_util.tree_structure(like)
    if ts_new != ts_like:
        raise ValueError(
            f"--pretrained '{source}': {what} tree structure does not match "
            f"the initialized model (different arch variant?)")
    new_leaves = jax.tree_util.tree_flatten_with_path(new)[0]
    like_leaves = jax.tree_util.tree_flatten_with_path(like)[0]
    for (kp, n), (_, l) in zip(new_leaves, like_leaves):
        if tuple(n.shape) != tuple(l.shape):
            raise ValueError(
                f"--pretrained '{source}': {what}"
                f"{jax.tree_util.keystr(kp)} has shape {tuple(n.shape)} but "
                f"the model expects {tuple(l.shape)} — wrong num_classes "
                f"(dataset class count) or arch variant?")


def _emit(args, payload):
    import jax

    from network_interpretation_imagenet_tpu.cli import common

    if jax.process_count() > 1 and jax.process_index() != 0:
        return  # rank 0 owns the result file on the shared filesystem
    common.emit_result(args.save, "imagenet_train_result.json", payload)


if __name__ == "__main__":
    raise SystemExit(main())
