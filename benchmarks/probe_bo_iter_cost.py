"""Per-BO-iteration cost of the fused loop on the real chip.

Times the image-batched fused-BO program (N=16 vmapped loops, ResNet-101,
SLIC-free synthetic inputs) at 3+10 and 3+20 budgets; the slope is the
per-iteration cost. Round-3 baseline with the in-loop Cholesky refit:
356 ms / 662 ms → 30.6 ms/iter, ~24 ms of it the GP-refit/EI chain
(docs/PERFORMANCE.md). The carried-L⁻¹ incremental state (gp/exact.py
incremental_*) replaces that chain with a handful of batched matvecs.

Run: PYTHONPATH=/root/repo python benchmarks/probe_bo_iter_cost.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from network_interpretation_imagenet_tpu.bo.loop import make_fused_window_bo
from network_interpretation_imagenet_tpu.models import create_model
from network_interpretation_imagenet_tpu.utils.compile_cache import (
    enable_compilation_cache,
)


def main(n_images=16, reps=6):
    enable_compilation_cache()
    bundle = create_model("resnet101", "imagenet", dtype=jnp.bfloat16)
    variables = bundle.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(n_images, 224, 224, 3), jnp.float32)
    segments = jnp.asarray(
        rng.randint(0, 48, size=(n_images, 224, 224)), jnp.int32
    )
    widths = jnp.full((n_images,), 19, jnp.int32)
    targets = jnp.zeros((n_images,), jnp.int32)
    uppers = jnp.full((n_images,), 28, jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(7), n_images)

    def apply_fn(v, imgs):
        return bundle.logits(v, imgs.astype(jnp.bfloat16))

    results = {}
    for n_iters in (10, 20):
        run = make_fused_window_bo(
            apply_fn, max_candidates=64, n_pre_samples=3,
            n_iters=n_iters, batch_images=True,
        )
        out = run(variables, images, segments, widths, targets, uppers, keys)
        jax.block_until_ready(out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(variables, images, segments, widths, targets,
                      uppers, keys)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        results[n_iters] = float(np.median(times))
        print(f"3+{n_iters}: median {results[n_iters]*1e3:.1f} ms "
              f"(best {min(times)*1e3:.1f})")

    slope = (results[20] - results[10]) / 10.0
    print(f"per-iteration slope: {slope*1e3:.2f} ms")


if __name__ == "__main__":
    main()
