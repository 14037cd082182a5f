"""Worker for the 2-process DCN TRAINING integration test
(test_imagenet_train.py spawns it).

Each process: CPU backend with 2 local devices, ``cli.main --multihost``
against a localhost coordinator — the deterministic (seed, epoch) shuffle is
computed identically on every rank, each rank decodes ONLY its contiguous
slice of every global batch (``epoch_batches(process_slice=...)``) and
contributes it via ``jax.make_array_from_process_local_data``; gradients and
metrics reduce globally through the sharded train step; rank 0 owns
checkpoints/scores. Writes the run result JSON for the test to compare
across ranks and against a single-process run.
"""

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--save", required=True)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from network_interpretation_imagenet_tpu.cli import main as train_main

    rc = train_main.main([
        args.data, "-a", "resnet18", "--crop", "32", "-b", "8",
        "--epochs", "2", "--lr", "0.01", "-j", "2",
        "--save", args.save, "--seed", "0", "--no-compilation-cache",
        "--multihost", "--coordinator", args.coordinator,
        "--num-processes", str(args.num_processes),
        "--process-id", str(args.process_id),
    ])
    assert rc == 0, rc
    assert jax.process_count() == args.num_processes
    assert len(jax.devices()) == 2 * args.num_processes

    import os

    from jax.experimental import multihost_utils

    # Barrier: rank 0 must have written the result file before anyone reads.
    multihost_utils.sync_global_devices("train_done")

    # Every rank re-reads rank 0's result file from the shared filesystem
    # (rank 1 proves it did NOT write one of its own).
    result_path = os.path.join(args.save, "imagenet_train_result.json")
    with open(result_path) as f:
        result = json.load(f)
    result["process_id"] = jax.process_index()
    result["global_devices"] = len(jax.devices())
    with open(args.out, "w") as f:
        json.dump(result, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
