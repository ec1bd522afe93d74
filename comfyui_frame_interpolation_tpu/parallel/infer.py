"""Multi-chip inference: wrap an executor-shaped model callable for a mesh.

The reference runs inference single-GPU, one pair at a time
(``vfi_utils.py:205-216``); this framework's executors already batch pairs, so
multi-chip inference is pure GSPMD: shard the frame batch over the ``data``
axis (and height over ``space`` when frames are tall enough — the
:func:`~.mesh.frame_sharding` policy), replicate nothing but the weights the
callable already closed over, and let XLA insert the halo exchanges.

``make_sharded_model_fn`` adapts a positional-argument model callable —
``model_fn(f0, f1, t)`` as returned by every pair-model ``make_model_fn``
(drop-in for :func:`core.run_plan`), or ``model_fn(f0, f1, f2, f3)`` for the
4-frame-window models (drop-in for :func:`core.run_plan_window4`) — into an
identically-shaped callable that runs sharded over a mesh. NHWC batch args
shard by the frame policy; 1-D args (the timestep vector) shard over
``data``.

``make_sharded_pair_fns`` covers :func:`core.run_plan_pair_cached`'s
(reuse_fn, infer_fn) pair — GMFSS/M2M/EISAI, the heaviest families. The
cache pytree's *structure* is model-specific, but its sharding need not be
spelled out: every leaf is a per-pair tensor with a leading batch dimension,
computed from batch-sharded endpoints, so jitting ``reuse_fn`` with the
endpoints committed to the frame sharding makes GSPMD propagate a
batch-sharded layout onto every cache leaf automatically; ``infer_fn`` then
consumes those committed leaves as-is.

Outputs stay data-sharded: the executors only slice along the batch axis and
transfer to host, so replicating them would waste ICI bandwidth.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import frame_sharding

__all__ = ["make_sharded_model_fn", "make_sharded_pair_fns"]


def make_sharded_model_fn(model_fn: Callable, mesh: Mesh) -> Callable:
    """``model_fn(*args) -> frames`` executed sharded over ``mesh``.

    Every 4-D (NHWC batch) positional argument shards by
    :func:`~.mesh.frame_sharding`; every other argument (e.g. the ``[B]``
    timestep vector) shards over ``data``. The batch dimension must be a
    multiple of ``mesh.shape['data']`` (the executors' fixed ``batch_size``
    makes this easy: pick a multiple of it). Jitted once per input-sharding
    signature (a handful of variants at most).
    """
    tvec = NamedSharding(mesh, P("data"))
    jitted = {}

    def shardings_for(args):
        return tuple(
            frame_sharding(mesh, a.shape) if jnp.ndim(a) == 4 else tvec
            for a in args
        )

    def sharded_fn(*args):
        in_sh = shardings_for(args)
        key = tuple(s.spec for s in in_sh)
        if key not in jitted:
            out_sh = next(
                (s for a, s in zip(args, in_sh) if jnp.ndim(a) == 4), tvec
            )
            jitted[key] = jax.jit(
                model_fn, in_shardings=in_sh, out_shardings=out_sh
            )
        with mesh:
            return jitted[key](*args)

    return sharded_fn


def make_sharded_pair_fns(
    reuse_fn: Callable, infer_fn: Callable, mesh: Mesh
) -> tuple:
    """Shard a ``run_plan_pair_cached`` (reuse_fn, infer_fn) pair over ``mesh``.

    Drop-in: returns ``(sharded_reuse, sharded_infer)`` with the executor's
    signatures (``reuse_fn(f0, f1) -> cache``, ``infer_fn(f0, f1, cache, t) ->
    mids``). Endpoint batches are committed to :func:`~.mesh.frame_sharding`
    and the timestep vector to ``data``; the cache pytree — whose structure
    only the model knows — needs no explicit specs: GSPMD propagates the
    batch-sharded layout of the endpoints onto every cache leaf of
    ``reuse_fn``'s output, and ``infer_fn`` is compiled against those
    committed leaf shardings. The executor's ``batch_size`` must be a
    multiple of ``mesh.shape['data']``.
    """
    tvec = NamedSharding(mesh, P("data"))
    jit_reuse = jax.jit(reuse_fn)
    jit_infer = jax.jit(infer_fn)

    def put(a):
        return jax.device_put(a, frame_sharding(mesh, a.shape))

    def sharded_reuse(f0, f1):
        with mesh:
            return jit_reuse(put(f0), put(f1))

    def sharded_infer(f0, f1, cache, t):
        with mesh:
            return jit_infer(put(f0), put(f1), cache, jax.device_put(t, tvec))

    return sharded_reuse, sharded_infer
