"""Sharded training step: data parallelism + tensor parallelism by
annotation.

The reference's only training parallelism is single-host ``nn.DataParallel``
(``generate_gp_training_data_cifar.py:75-78``). TPU-native: place the batch
sharded over the mesh's "data" axis and shard wide conv output-channels and
dense heads over "model"; XLA inserts the all-reduces/all-gathers implied by
the shardings (the scaling-book recipe: annotate, let the compiler place
collectives on ICI).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from network_interpretation_imagenet_tpu.models import ModelBundle

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array
    rng: Array


def param_shardings(
    params: Any, mesh: Mesh, model_axis: str = "model", min_shard_dim: int = 32
):
    """Sharding rules: conv kernels [kh,kw,cin,cout] and dense kernels
    [cin,cout] shard their output channels over the model axis when evenly
    divisible; everything else (biases, BN) replicates."""
    msize = mesh.shape[model_axis]

    def rule(leaf):
        shape = jnp.shape(leaf)
        if msize > 1 and len(shape) == 4 and shape[3] % msize == 0 and shape[3] >= min_shard_dim:
            return NamedSharding(mesh, P(None, None, None, model_axis))
        if msize > 1 and len(shape) == 2 and shape[1] % msize == 0 and shape[1] >= min_shard_dim:
            return NamedSharding(mesh, P(None, model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def make_sharded_train_step(
    bundle: ModelBundle,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Tuple[Callable, Callable]:
    """Returns (init_fn, step_fn) for a cross-entropy classification step.

    ``init_fn(key) -> TrainState`` (placed: params per sharding rules,
    opt state likewise). ``step_fn(state, images, labels) -> (state, metrics)``
    — one SGD/optimizer step on the global batch; jitted once; donation keeps
    params in place.
    """

    def init_fn(key: Array) -> TrainState:
        variables = bundle.init(key, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        p_shard = param_shardings(params, mesh, model_axis)
        params = jax.device_put(params, p_shard)
        batch_stats = jax.device_put(batch_stats, NamedSharding(mesh, P()))
        opt_state = optimizer.init(params)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=key,
        )

    batch_sharding = NamedSharding(mesh, P(data_axis))

    # Donating the state keeps params/opt-state single-buffered at the
    # update (without it each step holds old+new trees live → 2× memory).
    @partial(jax.jit, donate_argnums=(0,))
    def step_fn(state: TrainState, images: Array, labels: Array):
        images = jax.lax.with_sharding_constraint(images, batch_sharding)
        labels = jax.lax.with_sharding_constraint(labels, batch_sharding)
        rng, sd_rng, drop_rng = jax.random.split(state.rng, 3)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out, mutated = bundle.module.apply(
                variables,
                images,
                True,
                rngs={"stochastic_depth": sd_rng, "dropout": drop_rng},
                mutable=["batch_stats"],
            )
            logits = out[-1] if isinstance(out, tuple) else out
            logits = logits.astype(jnp.float32)
            loss = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )
            return loss, (logits, mutated.get("batch_stats", {}))

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        top1 = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        k = min(5, logits.shape[-1])
        topk_idx = jax.lax.top_k(logits, k)[1]
        top5 = jnp.mean(
            jnp.any(topk_idx == labels[:, None], axis=-1).astype(jnp.float32)
        )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
            rng=rng,
        )
        return new_state, {"loss": loss, "top1": top1, "top5": top5}

    return init_fn, step_fn
