"""Device-mesh construction and sharding helpers.

The reference is a single-process single-GPU suite (SURVEY.md §2e) — there is no
distributed machinery to port. The TPU-native scaling story instead follows the
workload's structure: frame-pair tasks are embarrassingly parallel, so the batch
dimension shards over a ``data`` axis, and large frames shard spatially over a
``space`` axis (XLA GSPMD inserts the conv halo exchanges over ICI automatically).
Weights are replicated — VFI nets are small (< 50 MB); there is nothing to gain
from tensor-parallel weight sharding at this scale.

Spatial-sharding policy
-----------------------

Spatial sharding pays off only when every pyramid level of the model still has a
meaningful number of rows per shard; at tiny per-shard extents the halo exchange
dominates, and XLA's SPMD partitioner has verified miscompilation edge cases for
strided convolutions on ~2-row shards (see ``models/common.py:conv2d``, guarded
there, and ``tests/test_parallel.py``). :func:`frame_sharding` therefore applies
the ``space`` axis only when the height keeps at least ``min_rows_per_shard``
(default 64, i.e. ≥8 rows/shard at the coarsest 1/8-scale pyramid level — RIFE
at 1080p gives 544 rows/shard on a 2-way space axis, far above the floor); below
the floor it falls back to pure data parallelism, which is the right sharding
for small frames anyway.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "frame_sharding",
    "replicated",
    "MIN_ROWS_PER_SHARD",
]

# Minimum frame rows per 'space' shard for spatial sharding to be applied.
MIN_ROWS_PER_SHARD = 64


def make_mesh(
    n_devices: Optional[int] = None, shape: Optional[Tuple[int, int]] = None
) -> Mesh:
    """2-D ``(data, space)`` mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if shape is None:
        space = 2 if n % 2 == 0 and n > 1 else 1
        shape = (n // space, space)
    assert shape[0] * shape[1] == n, (shape, n)
    return Mesh(np.asarray(devices).reshape(shape), ("data", "space"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharded over ``data``, height over ``space``."""
    return NamedSharding(mesh, P("data", "space", None, None))


def frame_sharding(
    mesh: Mesh,
    shape: Sequence[int],
    min_rows_per_shard: int = MIN_ROWS_PER_SHARD,
) -> NamedSharding:
    """Sharding for an NHWC frame batch of ``shape``, by the policy above:
    batch over ``data`` always, height over ``space`` only when every shard
    keeps ``min_rows_per_shard`` rows."""
    space = mesh.shape.get("space", 1)
    if space > 1 and shape[1] // space >= min_rows_per_shard:
        return NamedSharding(mesh, P("data", "space", None, None))
    return NamedSharding(mesh, P("data", None, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
