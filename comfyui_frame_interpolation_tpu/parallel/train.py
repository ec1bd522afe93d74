"""Sharded training step (fine-tuning / distillation harness).

The reference ships inference-only weights, but the framework supports training the
flow models end-to-end: every op in ``ops/`` is differentiable (XLA scatter/gather
have exact VJPs — unlike the reference's hand-written CUDA backward kernels, which
JAX derives for free). The step below is the canonical multi-chip recipe for this
workload: data-parallel over frame pairs + spatial sharding over height, weights
replicated, gradients reduced by GSPMD over ICI.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import frame_sharding, replicated

__all__ = ["l1_loss", "make_train_step"]


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def make_train_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
) -> Callable:
    """Build ``step(params, opt_state, f0, f1, t, target) -> (params, opt_state,
    loss)`` jitted over ``mesh``: parameters and optimizer state replicated, batch
    inputs sharded by the :func:`~.mesh.frame_sharding` policy — (data, space)
    when the crop is tall enough for spatial sharding, pure data-parallel
    otherwise (typical training crops are small, so DP is the common case).

    ``apply_fn(params, f0, f1, t) -> pred`` is the model forward (already closed
    over static config such as scale lists).
    """

    def loss_fn(params, f0, f1, t, target):
        pred = apply_fn(params, f0, f1, t)
        return l1_loss(pred, target)

    tvec_shard = NamedSharding(mesh, P("data"))
    repl = replicated(mesh)

    def step_fn(params, opt_state, f0, f1, t, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, f0, f1, t, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = {}

    def step(params, opt_state, f0, f1, t, target):
        batch_shard = frame_sharding(mesh, f0.shape)
        key = batch_shard.spec
        if key not in jitted:
            jitted[key] = jax.jit(
                step_fn,
                in_shardings=(
                    repl, repl, batch_shard, batch_shard, tvec_shard, batch_shard
                ),
                out_shardings=(repl, repl, repl),
            )
        return jitted[key](params, opt_state, f0, f1, t, target)

    return step
