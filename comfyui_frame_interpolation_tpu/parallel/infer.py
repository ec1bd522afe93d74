"""Multi-chip inference: wrap any executor-shaped model callable for a mesh.

The reference runs inference single-GPU, one pair at a time
(``vfi_utils.py:205-216``); this framework's executors already batch pairs, so
multi-chip inference is pure GSPMD: shard the frame batch over the ``data``
axis (and height over ``space`` when frames are tall enough — the
:func:`~.mesh.frame_sharding` policy), replicate nothing but the weights the
callable already closed over, and let XLA insert the halo exchanges.

``make_sharded_model_fn`` adapts any ``model_fn(f0, f1, t) -> frames``
(what every ``models.*.make_model_fn`` returns) into an identically-shaped
callable that runs sharded over a mesh — a drop-in for the ``model_fn``
argument of ``core.run_plan`` / ``run_plan_window4`` / ``run_plan_pair_cached``.
Outputs stay data-sharded: the executors only slice along the batch axis and
transfer to host, so replicating them would waste ICI bandwidth.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import frame_sharding

__all__ = ["make_sharded_model_fn"]


def make_sharded_model_fn(model_fn: Callable, mesh: Mesh) -> Callable:
    """``model_fn(f0, f1, t) -> frames``, executed sharded over ``mesh``.

    The batch dimension must be a multiple of the ``data`` axis size (the
    executors' fixed ``batch_size`` makes this easy to arrange: pick a
    multiple of ``mesh.shape['data']``). Height is additionally sharded over
    ``space`` when the frame clears the :data:`~.mesh.MIN_ROWS_PER_SHARD`
    floor. Jitted per input-sharding spec (at most two variants).
    """
    tvec = NamedSharding(mesh, P("data"))
    jitted = {}

    def sharded_fn(f0, f1, t):
        batch = frame_sharding(mesh, f0.shape)
        key = batch.spec
        if key not in jitted:
            jitted[key] = jax.jit(
                model_fn,
                in_shardings=(batch, batch, tvec),
                out_shardings=batch,
            )
        with mesh:
            return jitted[key](f0, f1, t)

    return sharded_fn
