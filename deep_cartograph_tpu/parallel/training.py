"""Data-parallel deep-CV training step over a device mesh.

Batch axis shards across the mesh; per-shard gradients are psum-reduced —
the TPU equivalent of distributed data parallelism (SURVEY §2.5), expressed
as shard_map + XLA collectives rather than a communication backend.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from deep_cartograph_tpu.parallel.mesh import FRAME_AXIS


def make_dp_train_step(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
) -> Callable:
    """Build a jitted data-parallel train step.

    loss_fn(params, batch_dict, rng) -> scalar loss; `batch_dict` arrays are
    sharded along their leading axis. Parameters and optimizer state are
    replicated; gradients are psum'd across the batch shards.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), {"data": P(FRAME_AXIS), "data_lag": P(FRAME_AXIS), "weight": P(FRAME_AXIS)}, P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def step(params, opt_state, batch, rng):
        # Per-shard loss is weighted by the shard's sample count so the
        # psum'd gradient equals the full-batch gradient.
        local_w = jnp.sum(batch["weight"])
        total_w = jax.lax.psum(local_w, FRAME_AXIS)

        def scaled_loss(p):
            return loss_fn(p, batch, rng) * (local_w / jnp.maximum(total_w, 1e-12))

        loss, grads = jax.value_and_grad(scaled_loss)(params)
        grads = jax.lax.psum(grads, FRAME_AXIS)
        loss = jax.lax.psum(loss, FRAME_AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step)
