"""Worker for the 2-process DCN integration test (test_parallel.py spawns it).

Each process: ``jax.distributed.initialize`` against a localhost coordinator
(CPU backend — the multi-host stand-in, same code path a TPU pod runs),
prove a REAL cross-process collective (process_allgather over the
distributed runtime), then sweep its ``process_strided_indices`` stride of
a deterministic synthetic dataset and write its SweepResult as JSON.

The reference's distributed story was dead code (gloo flags parsed, never
initialized — ``/root/reference/bayesian_active_learning_imagenet.py:78-83``);
this worker is the proof the TPU framework's DCN path actually executes.
"""

import argparse
import json
import sys


def build_dataset(indices, engine):
    """Deterministic (image, label, gt_bbox) per GLOBAL index — any process
    can generate any image identically (no data exchange needed)."""
    import numpy as np

    items = []
    for idx in indices:
        rng = np.random.RandomState(1000 + idx)
        img = rng.rand(28, 28, 1).astype(np.float32)
        if idx == 3:  # one deliberately-misclassified image exercises skip
            pred, _ = engine.predict_one(img)
            label = (pred + 1) % 10
        else:
            label = None
        items.append((img, label, np.array([4, 4, 10, 10])))
    return items


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-images", type=int, default=6)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    # 2 local devices/process → 4 global: the mesh layering a real pod has
    # (ICI within a process's devices, DCN across processes).
    jax.config.update("jax_num_cpu_devices", 2)

    from network_interpretation_imagenet_tpu.parallel.multihost import (
        initialize_distributed,
        process_strided_indices,
        sweep_result_to_dict,
    )

    assert initialize_distributed(
        args.coordinator, args.num_processes, args.process_id
    )
    assert jax.process_count() == args.num_processes
    assert len(jax.devices()) == 2 * args.num_processes  # global view

    # A real collective across processes: allgather each rank's id through
    # the distributed runtime and check every rank sees every other.
    import numpy as np
    from jax.experimental import multihost_utils

    gathered = np.asarray(
        multihost_utils.process_allgather(np.int32(jax.process_index()))
    )
    assert sorted(gathered.tolist()) == list(range(args.num_processes)), gathered

    import jax.numpy as jnp

    from network_interpretation_imagenet_tpu.config import SegmentConfig
    from network_interpretation_imagenet_tpu.models import create_model
    from network_interpretation_imagenet_tpu.saliency.engine import SaliencyEngine
    from network_interpretation_imagenet_tpu.saliency.sweep import saliency_sweep

    bundle = create_model("mnist_cnn", "mnist")
    variables = bundle.init(jax.random.PRNGKey(0))  # deterministic everywhere
    engine = SaliencyEngine(bundle, variables, mask_batch=8,
                            compute_dtype=jnp.float32)

    indices = list(process_strided_indices(args.num_images))
    dataset = build_dataset(indices, engine)
    cfg = SegmentConfig(method="slic", n_segments=9, slic_iters=4)
    res = saliency_sweep(
        engine, dataset, cfg, num_mask_samples=8, seed=5,
        dataset_indices=indices,
    )

    payload = sweep_result_to_dict(res)
    payload["process_id"] = jax.process_index()
    payload["process_count"] = jax.process_count()
    payload["global_devices"] = len(jax.devices())
    payload["allgather"] = gathered.tolist()
    payload["indices"] = indices
    with open(args.out, "w") as f:
        json.dump(payload, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
