"""Device-mesh construction and sharding helpers.

The reference is a single-process single-GPU suite (SURVEY.md §2e) — there is no
distributed machinery to port. The TPU-native scaling story instead follows the
workload's structure: frame-pair tasks are embarrassingly parallel, so the batch
dimension shards over a ``data`` axis, and large frames shard spatially over a
``space`` axis (XLA GSPMD inserts the conv halo exchanges over ICI automatically).
Weights are replicated — VFI nets are small (< 50 MB); there is nothing to gain
from tensor-parallel weight sharding at this scale.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated"]


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


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
