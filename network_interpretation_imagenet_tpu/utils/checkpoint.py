"""Checkpoint save/restore (Orbax) with the reference's best-copy semantics.

Reference: ``utils.save_checkpoint`` (``utils.py:59-65``) writes
``checkpoint.pth.tar`` and copies to ``model_best.pth.tar`` when improved;
CIFAR resume restores epoch + arch flags from the blob
(``generate_gp_training_data_cifar.py:97-123``). Here checkpoints are Orbax
pytrees (params/batch_stats/opt_state/metadata) under ``<dir>/checkpoint``
and ``<dir>/model_best``.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _is_complete(ckpt_dir: str) -> bool:
    """A checkpoint dir carrying the ``nit_complete`` marker (written after
    the full Orbax write, before the swap) is known-complete."""
    return os.path.exists(os.path.join(ckpt_dir, "nit_complete"))


def _is_json_scalar_tree(v) -> bool:
    if isinstance(v, dict):
        return all(_is_json_scalar_tree(x) for x in v.values())
    return v is None or isinstance(v, (str, bool, int, float))


def _split_meta(state: Dict[str, Any]):
    """Top-level string/None entries — and dicts of pure JSON scalars, e.g.
    the ``arch_args`` flag blob — go to a JSON sidecar (tensorstore can't
    serialize strings); array pytrees go through Orbax."""
    arrays, meta = {}, {}
    for k, v in state.items():
        if isinstance(v, bytes):
            meta[k] = v.decode()
        elif _is_json_scalar_tree(v) and not isinstance(v, (int, float, bool)):
            meta[k] = v
        else:
            arrays[k] = v
    return arrays, meta


def save_checkpoint(
    state: Dict[str, Any],
    save_dir: str,
    is_best: bool = False,
    name: str = "checkpoint",
) -> str:
    """Save a pytree state dict; mirror to ``model_best`` when ``is_best``.

    Multi-process: EVERY rank must call this (Orbax synchronizes processes
    internally — a rank-0-only call deadlocks in its barrier). Plain-file
    mutations (rmtree, meta sidecar, best-copy) happen on rank 0 only,
    sequenced around explicit barriers so no rank enters Orbax's save while
    rank 0 is still clearing the directory.
    """
    import json

    import orbax.checkpoint as ocp

    primary = jax.process_index() == 0
    multiproc = jax.process_count() > 1

    def _barrier(tag: str) -> None:
        if multiproc:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"nit_ckpt_{tag}")

    path = os.path.abspath(os.path.join(save_dir, name))
    # Atomic swap: the NEW checkpoint is fully written (and marked complete)
    # under <name>.new before the old one is touched — a crash at ANY point
    # leaves either the old checkpoint intact or a complete .new that
    # restore_checkpoint falls back to. The old rmtree-then-save left a
    # window with NO checkpoint at all (fatal for preemption-safe training).
    tmp = path + ".new"
    if primary:
        if os.path.exists(tmp):
            if (os.path.exists(os.path.join(tmp, "nit_complete"))
                    and not _is_complete(path)):
                # A prior save crashed inside the swap: the marked .new is
                # the ONLY complete checkpoint. Promote it before clearing —
                # deleting it first would reopen the no-checkpoint window
                # for the duration of the (long) Orbax write below.
                if os.path.exists(path):
                    shutil.rmtree(path)
                os.rename(tmp, path)
            else:
                shutil.rmtree(tmp)
        os.makedirs(save_dir, exist_ok=True)
    _barrier("pre")
    arrays, meta = _split_meta(state)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(tmp, _to_numpy_tree(arrays))
    if primary:
        if meta:
            with open(os.path.join(tmp, "nit_meta.json"), "w") as f:
                json.dump(meta, f)
        with open(os.path.join(tmp, "nit_complete"), "w") as f:
            f.write("ok")
        if os.path.exists(path):
            # Drop the old dir's marker FIRST: rmtree deletes the array
            # subdirs before the top-level files, so a kill mid-rmtree
            # would otherwise leave a torn dir that still looks complete.
            old_marker = os.path.join(path, "nit_complete")
            if os.path.exists(old_marker):
                os.remove(old_marker)
            shutil.rmtree(path)
        os.rename(tmp, path)
    _barrier("swap")
    if is_best and primary:
        # Same marker invariant as the main swap: the marker is only ever
        # present in a dir whose arrays are fully on disk, and is dropped
        # before any destructive step that could tear the dir.
        best = os.path.abspath(os.path.join(save_dir, "model_best"))
        best_tmp = best + ".new"
        if os.path.exists(best_tmp):
            if _is_complete(best_tmp) and not _is_complete(best):
                # A prior best-swap died between rmtree(best) and the rename:
                # promote the complete .new before the (interruptible)
                # copytree below so model_best never vanishes.
                if os.path.exists(best):
                    shutil.rmtree(best)
                os.rename(best_tmp, best)
            else:
                shutil.rmtree(best_tmp)
        # Copy WITHOUT the marker (copytree's file order is arbitrary, so the
        # marker must not be able to precede the array payload), then mark.
        shutil.copytree(path, best_tmp,
                        ignore=shutil.ignore_patterns("nit_complete"))
        with open(os.path.join(best_tmp, "nit_complete"), "w") as f:
            f.write("ok")
        if os.path.exists(best):
            old_marker = os.path.join(best, "nit_complete")
            if os.path.exists(old_marker):
                os.remove(old_marker)
            shutil.rmtree(best)
        os.rename(best_tmp, best)
    return path


def restore_checkpoint(save_dir: str, name: str = "checkpoint") -> Optional[Dict[str, Any]]:
    """Restore a previously saved state; None if absent (fresh start)."""
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(save_dir, name))
    tmp = path + ".new"
    # Crash-window resolution, in preference order: a MARKED main dir is
    # complete (every new-code save renames the marked .new into place); a
    # marked .new means the save died inside the swap (main dir absent or
    # torn mid-rmtree — save drops the old marker before rmtree, so a torn
    # dir is never marked); an UNMARKED main dir with no marked .new is a
    # legacy (pre-marker) checkpoint and is trusted as-is.
    if not _is_complete(path):
        if _is_complete(tmp):
            path = tmp
        elif not os.path.exists(path):
            return None
    meta_path = os.path.join(path, "nit_meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        # Orbax refuses unknown files inside the checkpoint dir on restore in
        # some versions; it tolerates extra files in practice, but remove and
        # re-add defensively if that changes.
    with ocp.PyTreeCheckpointer() as ckptr:
        out = dict(ckptr.restore(path))
    out.update(meta)
    return out
