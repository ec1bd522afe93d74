"""Robust TPU timing helpers.

Two platform quirks (tunneled "axon" PJRT) make naive timing lie:
* ``block_until_ready`` is a no-op — only a host readback fences execution, so
  every timing section ends with ``float(jnp.sum(...))`` of a chained result;
* the first timed loop in a process runs 5-10x slower than steady state
  (executor warm-up), so ``measure`` runs multiple rounds and reports the
  MEDIAN round average — robust to a straggler warm-up round without the
  flattering bias of best-of (recorded benchmark numbers are medians).
"""

from __future__ import annotations

import statistics
import time
from typing import Callable

import jax.numpy as jnp

__all__ = ["measure"]


def measure(fn: Callable, *args, iters: int = 10, rounds: int = 3) -> float:
    """Return median-round average seconds per call of ``fn(*args)``."""
    float(jnp.sum(fn(*args)))  # compile + warm
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            out = fn(*args)
            acc = out if acc is None else acc + out * 1e-9
        float(jnp.sum(acc))
        times.append((time.perf_counter() - t0) / iters)
    return statistics.median(times)
