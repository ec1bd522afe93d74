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
``data``. ``run_plan_pair_cached``'s (reuse_fn, infer_fn) pair is NOT
covered: its cache pytree's sharding is model-specific — shard those two
callables by hand with the :mod:`.mesh` helpers instead.

Outputs stay data-sharded: the executors only slice along the batch axis and
transfer to host, so replicating them would waste ICI bandwidth.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import frame_sharding

__all__ = ["make_sharded_model_fn"]


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
