"""Classifier training harness.

TPU re-design of the reference's CIFAR harness
(``generate_gp_training_data_cifar.py:81-234``) and optimizer flags
(``args.py:83-117``): sgd/rmsprop/adam with momentum + weight decay, stepped
lr decay, per-epoch ``scores.tsv`` rewrite, early stopping on val error with
``--patience``, best-checkpoint copy, and resume. The step itself is the
mesh-sharded train step from `parallel.train_step` (dp×tp), so the same
harness trains on 1 chip or a slice.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from network_interpretation_imagenet_tpu.config import TrainConfig
from network_interpretation_imagenet_tpu.models import ModelBundle
from network_interpretation_imagenet_tpu.parallel import make_mesh, make_sharded_train_step
from network_interpretation_imagenet_tpu.utils.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
)
from network_interpretation_imagenet_tpu.utils.logging import PhaseLogger
from network_interpretation_imagenet_tpu.utils.meters import AverageMeter


def make_optimizer(
    cfg: TrainConfig, steps_per_epoch: int
) -> optax.GradientTransformation:
    """sgd | rmsprop | adam with torch-style weight decay and the reference's
    stepped lr schedule (decay_rate at decay_epochs — the classic
    ``adjust_learning_rate``, ``generate_gp_training_data_imagenet.py:299-303``)."""
    boundaries = {
        int(e) * steps_per_epoch: cfg.decay_rate for e in cfg.decay_epochs
    }
    schedule = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    wd = optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else optax.identity()
    if cfg.optimizer == "sgd":
        core = optax.sgd(schedule, momentum=cfg.momentum, nesterov=False)
    elif cfg.optimizer == "rmsprop":
        core = optax.rmsprop(schedule, momentum=cfg.momentum)
    elif cfg.optimizer == "adam":
        core = optax.adam(schedule)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    return optax.chain(wd, core)


def _factory_accepts_skip(factory) -> bool:
    """True when an epoch->loader factory takes a ``skip`` keyword (batches
    to drop before decode — mid-epoch resume without re-decoding)."""
    import inspect

    try:
        params = inspect.signature(factory).parameters
    except (TypeError, ValueError):
        return False
    # An explicit named parameter only: a bare **kwargs might swallow the
    # keyword without applying it, silently training the wrong batches.
    return "skip" in params


class Trainer:
    """Epoch-loop harness over numpy loaders (see ``data.loaders``)."""

    def __init__(
        self,
        bundle: ModelBundle,
        cfg: TrainConfig,
        steps_per_epoch: int,
        mesh=None,
        save_dir: Optional[str] = None,
        logger: Optional[PhaseLogger] = None,
        arch_args: Optional[dict] = None,
        globalize=None,
        eval_local_metrics: bool = False,
        save_every_steps: int = 0,
    ):
        """``globalize(images, labels) -> (Array, Array)`` maps one host
        batch onto the mesh. Default: plain ``jnp.asarray`` (single-process;
        the step's sharding constraint places it). Multi-process trainers
        pass a ``jax.make_array_from_process_local_data`` wrapper so each
        rank contributes its LOCAL slice of the global batch
        (``cli.main --multihost``).

        ``eval_local_metrics=True`` (multi-process validation): each rank
        evaluates its OWN disjoint val batches with plain local arrays —
        no global-batch divisibility constraint, so the val tail is never
        dropped — and the (loss·n, correct, correct5, n) sums cross
        processes once per evaluate() via ``process_allgather``.

        ``save_every_steps > 0``: preemption-safe MID-epoch checkpoints —
        every N train steps the full state (params/batch_stats/opt_state +
        the position ``mid_epoch_step``) is saved atomically; ``resume()``
        re-enters that epoch and ``fit`` skips the already-trained batches.
        The data pipeline's per-(seed, epoch) permutation and per-(seed,
        epoch, index) augmentation RNG make the skip exact: a resumed run's
        update sequence is identical to an uninterrupted one. An ImageNet
        epoch is ~5k steps; without this a preemption loses up to an epoch."""
        self.bundle = bundle
        self.cfg = cfg
        self.globalize = globalize or (
            lambda images, labels: (jnp.asarray(images), jnp.asarray(labels))
        )
        self.eval_local_metrics = eval_local_metrics
        # Architecture flags persisted with the checkpoint so resume can
        # rebuild the exact model (reference args.py:79-80 arch_resume_names).
        self.arch_args = dict(arch_args) if arch_args else None
        self.mesh = mesh if mesh is not None else make_mesh(jax.devices()[:1])
        self.save_dir = save_dir
        self.log = logger or PhaseLogger(enabled=False)
        self.print_freq = getattr(cfg, "print_freq", 0)
        self.optimizer = make_optimizer(cfg, steps_per_epoch)
        self.steps_per_epoch = int(steps_per_epoch)
        self.init_fn, self.step_fn = make_sharded_train_step(
            bundle, self.mesh, self.optimizer
        )
        self.state = self.init_fn(jax.random.PRNGKey(cfg.seed))
        self.start_epoch = 0
        self.best_err1 = float("inf")
        self.best_epoch = -1
        self.save_every_steps = int(save_every_steps)
        self.resume_skip_steps = 0  # set by resume() from a mid-epoch ckpt

        bundle_logits = bundle.logits

        @jax.jit
        def eval_step(params, batch_stats, images, labels):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            logits = bundle_logits(variables, images).astype(jnp.float32)
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )
            top1 = jnp.sum((jnp.argmax(logits, -1) == labels).astype(jnp.int32))
            k = min(5, logits.shape[-1])
            topk_idx = jax.lax.top_k(logits, k)[1]
            top5 = jnp.sum(
                jnp.any(topk_idx == labels[:, None], axis=-1).astype(jnp.int32)
            )
            return loss, top1, top5

        self._eval_step = eval_step

    # -- persistence --------------------------------------------------------

    def save(self, epoch: int, is_best: bool, mid_epoch_step: int = 0) -> None:
        """``mid_epoch_step > 0`` marks an in-progress epoch: resume()
        re-enters ``epoch`` skipping that many batches (an epoch-end save
        stores 0 and resume starts at ``epoch + 1``)."""
        if not self.save_dir:
            return
        params, batch_stats = self.state.params, self.state.batch_stats
        if jax.process_count() > 1:
            # Multi-process: EVERY rank enters save_checkpoint (Orbax
            # barriers internally; a rank-0-only call deadlocks). Data-
            # parallel state is fully replicated, so np.asarray reads each
            # rank's local replica; model-parallel-across-processes is
            # rejected at the CLI (cli.main --multihost).
            params = jax.tree.map(np.asarray, params)
            batch_stats = jax.tree.map(np.asarray, batch_stats)
        # opt_state is saved as flat leaves: Orbax restores plain dicts, so
        # structure is re-imposed at resume from a freshly-initialized state
        # (optimizer step count rides along — the stepped lr schedule and
        # momentum must survive resume, unlike a params-only restore).
        opt_leaves = [
            np.asarray(x) for x in jax.tree_util.tree_leaves(self.state.opt_state)
        ]
        blob = {
            "params": params,
            "batch_stats": batch_stats,
            "opt_leaves": {str(i): leaf for i, leaf in enumerate(opt_leaves)},
            "step": np.asarray(self.state.step),
            "epoch": np.asarray(epoch),
            "mid_epoch_step": np.asarray(int(mid_epoch_step)),
            "best_err1": np.asarray(self.best_err1),
            "best_epoch": np.asarray(self.best_epoch),
            "arch": self.bundle.name,
        }
        if self.arch_args:
            blob["arch_args"] = dict(self.arch_args)
        save_checkpoint(blob, self.save_dir, is_best=is_best)

    @staticmethod
    def peek_arch_args(save_dir: str) -> Optional[dict]:
        """Read a checkpoint's saved architecture flags WITHOUT building a
        model — callers restore these into their CLI args before
        `create_model` (reference ``arch_resume_names`` flow,
        ``generate_gp_training_data_cifar.py:97-123``)."""
        blob = restore_checkpoint(save_dir)
        if blob is None or "arch_args" not in blob:
            return None
        return {
            k: (v.item() if hasattr(v, "item") else v)
            for k, v in blob["arch_args"].items()
        }

    def resume(self) -> bool:
        """Restore params/epoch from ``save_dir`` (reference resume semantics,
        ``generate_gp_training_data_cifar.py:97-123``)."""
        if not self.save_dir:
            return False
        blob = restore_checkpoint(self.save_dir)
        if blob is None:
            return False
        opt_state = self.state.opt_state
        if "opt_leaves" in blob:
            leaves = [
                blob["opt_leaves"][str(i)] for i in range(len(blob["opt_leaves"]))
            ]
            treedef = jax.tree_util.tree_structure(opt_state)
            opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
        def _put_like(new, like):
            """Restore onto the SAME shardings init_fn established — a bare
            device_put would commit everything to one device and break the
            next step on a >1-device mesh (dp/tp placement lost)."""
            return jax.tree.map(
                lambda n, l: jax.device_put(n, getattr(l, "sharding", None)),
                new, like,
            )

        self.state = self.state._replace(
            params=_put_like(blob["params"], self.state.params),
            batch_stats=_put_like(blob["batch_stats"], self.state.batch_stats),
            opt_state=_put_like(opt_state, self.state.opt_state),
            step=jnp.asarray(blob.get("step", 0), jnp.int32),
        )
        mid = int(blob.get("mid_epoch_step", 0))
        if mid > 0:
            # Mid-epoch checkpoint: re-enter the SAME epoch, skipping the
            # batches already trained (fit() consumes resume_skip_steps).
            self.start_epoch = int(blob["epoch"])
            self.resume_skip_steps = mid
        else:
            self.start_epoch = int(blob["epoch"]) + 1
            self.resume_skip_steps = 0
        self.best_err1 = float(blob["best_err1"])
        self.best_epoch = int(blob["best_epoch"])
        return True

    # -- loops --------------------------------------------------------------

    def train_epoch(
        self, loader, epoch: int = 0, print_freq: int = 0,
        step_offset: int = 0,
    ) -> Tuple[float, float]:
        """One pass over ``loader``. ``print_freq > 0`` prints the stock
        ImageNet trainer's per-batch line (Time/Data/Loss/Prec@1/Prec@5
        meters — the reference's AverageMeter logging shape,
        ``generate_gp_training_data_imagenet.py:281-296``). Metric scalars
        are fetched with ONE batched ``device_get`` per step — on a
        tunnel-attached chip each separate fetch costs a full RTT."""
        import time

        import jax

        loss_m, top1_m, top5_m = AverageMeter(), AverageMeter(), AverageMeter()
        batch_t, data_t = AverageMeter(), AverageMeter()
        steps = len(loader) if hasattr(loader, "__len__") else None
        end = time.time()
        for i, (images, labels) in enumerate(loader):
            data_t.update(time.time() - end)
            images_d, labels_d = self.globalize(images, labels)
            self.state, metrics = self.step_fn(self.state, images_d, labels_d)
            n = int(labels_d.shape[0])  # GLOBAL batch (== len(labels) 1-proc)
            metrics = jax.device_get(metrics)
            loss_m.update(float(metrics["loss"]), n)
            top1_m.update(float(metrics["top1"]), n)
            top5_m.update(float(metrics.get("top5", metrics["top1"])), n)
            batch_t.update(time.time() - end)
            end = time.time()
            if self.save_every_steps:
                pos = step_offset + i + 1  # position within the FULL epoch
                # Skip the save when pos lands ON the epoch boundary: the
                # epoch-end save follows seconds later, and a resume from a
                # mid==steps checkpoint would re-enter a zero-batch epoch.
                # Length-less loaders fall back to steps_per_epoch, which
                # MUST therefore equal the true batch count (sized loaders —
                # see cli.main's _RankSlice — are exact by construction; an
                # overstated steps_per_epoch is caught loudly in fit()).
                last = step_offset + steps if steps is not None else (
                    self.steps_per_epoch or None)
                if pos % self.save_every_steps == 0 and (
                        last is None or pos < last):
                    self.save(epoch, is_best=False, mid_epoch_step=pos)
            if print_freq and i % print_freq == 0:
                total = f"/{steps}" if steps is not None else ""
                print(
                    f"Epoch: [{epoch}][{i}{total}]\t"
                    f"Time {batch_t.val:.3f} ({batch_t.avg:.3f})\t"
                    f"Data {data_t.val:.3f} ({data_t.avg:.3f})\t"
                    f"Loss {loss_m.val:.4f} ({loss_m.avg:.4f})\t"
                    f"Prec@1 {100 * top1_m.val:.3f} ({100 * top1_m.avg:.3f})\t"
                    f"Prec@5 {100 * top5_m.val:.3f} ({100 * top5_m.avg:.3f})"
                )
        self._last_epoch_batches = loss_m.count  # fit()'s zero-batch guard
        return loss_m.avg, 100.0 * (1.0 - top1_m.avg)

    def evaluate(self, loader) -> Tuple[float, float, float]:
        """Returns (loss, top-1 error %, top-5 error %)."""
        loss_m = AverageMeter()
        correct = 0
        correct5 = 0
        total = 0
        import jax

        for images, labels in loader:
            if self.eval_local_metrics:
                if len(labels) == 0:
                    continue
                images_d = jnp.asarray(np.ascontiguousarray(images))
                labels_d = jnp.asarray(np.asarray(labels, np.int32))
            else:
                images_d, labels_d = self.globalize(images, labels)
            loss, top1, top5 = jax.device_get(self._eval_step(
                self.state.params,
                self.state.batch_stats,
                images_d,
                labels_d,
            ))
            n = int(labels_d.shape[0])  # top1/top5 count the GLOBAL batch
            loss_m.update(float(loss), n)
            correct += int(top1)
            correct5 += int(top5)
            total += n
        loss_sum = loss_m.sum
        if self.eval_local_metrics and jax.process_count() > 1:
            # Sum the per-rank counts across processes (each rank saw a
            # disjoint val subset). ONE collective per evaluate().
            from jax.experimental import multihost_utils

            sums = np.asarray(multihost_utils.process_allgather(
                np.array([loss_sum, correct, correct5, total], np.float64)
            )).sum(axis=0)
            loss_sum, correct, correct5, total = (
                float(sums[0]), int(sums[1]), int(sums[2]), int(sums[3])
            )
        err1 = 100.0 * (1.0 - correct / max(total, 1))
        err5 = 100.0 * (1.0 - correct5 / max(total, 1))
        return loss_sum / max(total, 1), err1, err5

    def fit(self, train_loader, val_loader, epochs: Optional[int] = None) -> List[Dict]:
        """Run the epoch loop; returns per-epoch history rows (also written
        to ``scores.tsv``, rewritten each epoch like the reference
        ``generate_gp_training_data_cifar.py:181,208-212``)."""
        epochs = epochs if epochs is not None else self.cfg.epochs
        history: List[Dict] = []
        since_best = 0
        for epoch in range(self.start_epoch, epochs):
            skip = self.resume_skip_steps
            self.resume_skip_steps = 0  # only the resumed epoch skips
            # A callable train_loader is an epoch->iterable factory (e.g.
            # `data.imagenet_train.epoch_batches` reshuffling per epoch).
            # A factory with a `skip` parameter slices the permutation
            # BEFORE decode (a resumed ImageNet epoch would otherwise
            # re-decode every skipped image just to discard it); otherwise
            # islice discards already-trained batches after the fact.
            loader, skipped_in_factory = train_loader, False
            if callable(train_loader):
                if skip and _factory_accepts_skip(train_loader):
                    loader = train_loader(epoch, skip=skip)
                    skipped_in_factory = True
                else:
                    loader = train_loader(epoch)
            if hasattr(loader, "set_epoch"):
                # Stateful loaders (e.g. ArrayLoader) re-derive their
                # shuffle from (seed, epoch) so a resumed process replays
                # the SAME permutation the interrupted run trained on.
                loader.set_epoch(epoch)
            if skip and not skipped_in_factory:
                import itertools

                # The pipeline's per-(seed, epoch) permutation makes the
                # skip exact; this epoch's meters average only the
                # remaining batches (scores.tsv row is partial-epoch).
                loader = itertools.islice(iter(loader), skip, None)
            with self.log.phase("train_epoch", epoch=epoch):
                train_loss, train_err = self.train_epoch(
                    loader, epoch=epoch, print_freq=self.print_freq,
                    step_offset=skip,
                )
            if skip and not self._last_epoch_batches:
                # A resumed epoch that consumes ZERO batches means the
                # mid-epoch checkpoint's position equals (or exceeds) the
                # loader's true length — i.e. steps_per_epoch overstated a
                # length-less loader's batch count at save time. Recording
                # the row would write bogus metrics (loss 0.0, err 100.0);
                # fail loudly instead.
                raise RuntimeError(
                    f"resumed epoch {epoch} skipped {skip} batches but the "
                    f"loader yielded none beyond them; steps_per_epoch "
                    f"({self.steps_per_epoch}) overstates the true batch "
                    "count — give the loader a __len__ (or correct "
                    "steps_per_epoch) so mid-epoch saves suppress the "
                    "epoch-final position")
            with self.log.phase("val_epoch", epoch=epoch):
                val_loss, val_err, val_err5 = self.evaluate(val_loader)
            is_best = val_err < self.best_err1
            if is_best:
                self.best_err1 = val_err
                self.best_epoch = epoch
                since_best = 0
            else:
                since_best += 1
            row = {
                "epoch": epoch,
                "train_loss": round(train_loss, 5),
                "train_err1": round(train_err, 3),
                "val_loss": round(val_loss, 5),
                "val_err1": round(val_err, 3),
                "val_err5": round(val_err5, 3),
                "best_err1": round(self.best_err1, 3),
                "best_epoch": self.best_epoch,
            }
            history.append(row)
            self._write_scores(history)
            self.save(epoch, is_best)
            self.log.emit(row)
            if self.cfg.patience and since_best >= self.cfg.patience:
                break  # early stop (reference :232-233)
        return history

    def _write_scores(self, history: List[Dict]) -> None:
        if not self.save_dir:
            return
        if jax.process_count() > 1 and jax.process_index() != 0:
            return  # rank 0 owns scores.tsv on the shared filesystem
        os.makedirs(self.save_dir, exist_ok=True)
        cols = list(history[0].keys())
        lines = ["\t".join(cols)]
        for row in history:
            lines.append("\t".join(str(row[c]) for c in cols))
        with open(os.path.join(self.save_dir, "scores.tsv"), "w") as f:
            f.write("\n".join(lines) + "\n")
