"""Multi-host (DCN) initialization and mesh layout.

The reference's distributed story is dead code (gloo flags parsed, never
initialized — SURVEY §2c). The TPU-native design:

  * ICI (within a slice): mask batches and training batches shard over the
    "data" axis; TP over "model". Collectives (psum / all-gather from
    sharding annotations) ride the intra-slice interconnect.
  * DCN (across slices/hosts): the *image axis* of val-set sweeps shards
    coarsely across processes — each host sweeps a disjoint stride of the
    dataset; only scalar metrics cross DCN (one psum at the end). No
    activation traffic ever crosses DCN.

Single-host environments (this repo's CI and the one-chip bench) skip
``jax.distributed.initialize`` entirely; the same code runs unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX's multi-process runtime when running under a launcher.

    Reads the standard env (``JAX_COORDINATOR_ADDRESS`` etc.) when args are
    omitted; returns False (no-op) in single-process settings so callers can
    unconditionally invoke it.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_strided_indices(total: int) -> range:
    """The image-axis DCN split: process i sweeps images i, i+P, i+2P, ...

    Deterministic, balanced, and requires no coordination beyond process
    count; merge per-host SweepResults by summing counters and
    count-weighted means.
    """
    return range(jax.process_index(), total, jax.process_count())


def sweep_result_to_dict(res) -> dict:
    """JSON-safe dict of a SweepResult (heatmaps excluded — per-host sweep
    artifacts stay on their host; only metrics and rows cross DCN/disk)."""
    return {
        "images_total": int(res.images_total),
        "images_explained": int(res.images_explained),
        "images_skipped_misclassified": int(res.images_skipped_misclassified),
        "images_failed": int(res.images_failed),
        "mean_iou": float(res.mean_iou),
        "mean_survival": float(res.mean_survival),
        "p50_latency_s": float(res.p50_latency_s),
        "evals_per_sec": float(res.evals_per_sec),
        "mean_deletion_auc": float(res.mean_deletion_auc),
        "mean_insertion_auc": float(res.mean_insertion_auc),
        "pointing_game_acc": float(res.pointing_game_acc),
        "per_image": [
            {k: (v.item() if hasattr(v, "item") else v) for k, v in row.items()}
            for row in res.per_image
        ],
    }


def sweep_result_from_dict(d: dict):
    """Inverse of :func:`sweep_result_to_dict`."""
    from network_interpretation_imagenet_tpu.saliency.sweep import SweepResult

    res = SweepResult()
    for k, v in d.items():
        setattr(res, k, v)
    return res


def rank_result_path(out_dir: str, rank: int) -> str:
    return os.path.join(out_dir, f"sweep_result.rank{rank}.json")


def clear_stale_rank_result(out_dir: str, rank: Optional[int] = None) -> None:
    """Remove THIS rank's result file from any previous run in ``out_dir``.

    Call immediately after ``initialize_distributed`` — initialize() is a
    barrier, so every rank passes here before any rank can finish a sweep
    and write, which means rank 0's merge never sees a stale
    ``sweep_result.rank*.json`` left by an earlier invocation (or by a rank
    that died mid-run last time).
    """
    rank = jax.process_index() if rank is None else rank
    stale = [rank_result_path(out_dir, rank)]
    # Per-rank GP artifacts from a previous run with a DIFFERENT world size
    # would otherwise survive and be mistaken for this run's outputs.
    stale += [
        os.path.join(out_dir, f"{key}.rank{rank}.npz")
        for key in ("gp_heatmaps", "gp_class_heatmaps")
    ]
    for path in stale:
        if os.path.exists(path):
            os.remove(path)


def write_rank_result(out_dir: str, res, rank: Optional[int] = None) -> str:
    """Atomically write this rank's SweepResult JSON (readers never see a
    partial file: write to .tmp then rename)."""
    import json

    rank = jax.process_index() if rank is None else rank
    os.makedirs(out_dir, exist_ok=True)
    payload = sweep_result_to_dict(res)
    payload["process_id"] = rank
    path = rank_result_path(out_dir, rank)
    with open(path + ".tmp", "w") as f:
        json.dump(payload, f)
    os.replace(path + ".tmp", path)
    return path


def merge_rank_results(out_dir: str, num_processes: int,
                       timeout_s: float = 600.0):
    """Rank 0's side of the shared-filesystem merge: wait for every rank's
    file (bounded by ``timeout_s`` — a dead rank raises, naming the missing
    files), then reduce with :func:`merge_sweep_metrics`."""
    import json
    import time

    paths = [rank_result_path(out_dir, r) for r in range(num_processes)]
    deadline = time.time() + timeout_s
    while not all(os.path.exists(p) for p in paths):
        if time.time() > deadline:
            raise TimeoutError(
                f"missing rank results after {timeout_s:.0f}s: "
                f"{[p for p in paths if not os.path.exists(p)]}")
        time.sleep(0.5)
    parts = []
    for p in paths:
        with open(p) as f:
            parts.append(sweep_result_from_dict(json.load(f)))
    return merge_sweep_metrics(parts)


def merge_sweep_metrics(results):
    """Reduce per-host SweepResult objects (host 0 gathers via any transport
    — typically a tiny allgather of the scalar dict)."""
    from network_interpretation_imagenet_tpu.saliency.sweep import SweepResult

    out = SweepResult()
    total_iou_w = 0.0
    total_surv_w = 0.0
    for r in results:
        out.images_total += r.images_total
        out.images_explained += r.images_explained
        out.images_skipped_misclassified += r.images_skipped_misclassified
        out.images_failed += r.images_failed
        out.per_image.extend(r.per_image)
        iou_n = sum(1 for row in r.per_image if "iou" in row)
        out.mean_iou += r.mean_iou * iou_n
        total_iou_w += iou_n
        out.mean_survival += r.mean_survival * r.images_explained
        total_surv_w += r.images_explained
    out.mean_iou = out.mean_iou / total_iou_w if total_iou_w else 0.0
    out.mean_survival = out.mean_survival / total_surv_w if total_surv_w else 0.0
    # True pooled p50 over every image's latency (rows carry "seconds");
    # fall back to a labeled median-of-medians approximation for results
    # produced before rows recorded latency.
    pooled = sorted(
        row["seconds"] for r in results for row in r.per_image
        if "seconds" in row
    )
    if pooled:
        out.p50_latency_s = pooled[len(pooled) // 2]
    else:
        lats = [r.p50_latency_s for r in results if r.p50_latency_s > 0]
        out.p50_latency_s = sorted(lats)[len(lats) // 2] if lats else 0.0
    out.evals_per_sec = sum(r.evals_per_sec for r in results)
    from network_interpretation_imagenet_tpu.saliency.sweep import (
        _finalize_fidelity_means,
    )

    _finalize_fidelity_means(out)  # fidelity means pool from merged rows
    return out
