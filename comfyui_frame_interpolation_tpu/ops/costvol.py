"""81-channel L1 cost volume — shift-and-reduce XLA (reference
``cupy_ops/costvol.py`` kernel ``costvol_out``, lines 4-43).

For displacement ``(dy, dx)`` in the ±4 window, output channel
``(dy+4)*9 + (dx+4)`` holds ``mean_c |one[y, x, c] - two[y+dy, x+dx, c]|``;
out-of-bounds displaced pixels compare against zero.

On TPU this is 81 fused shifted elementwise ops (no gather, no scatter) — XLA fuses
the pad/slice/abs/mean chain into one pass. Zero-padding ``two`` reproduces the
out-of-bounds-compares-to-zero semantics for free.

Used by M2M's decoder (``M2M_arch.py:484-494``).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["costvol_func"]

_R = 4  # ±4 window → 9x9 = 81 channels


def costvol_func(ten_one: Array, ten_two: Array) -> Array:
    """[N,H,W,C] x2 → [N,H,W,81] mean-abs-difference volume."""
    n, h, w, c = ten_one.shape
    padded = jnp.pad(
        ten_two, ((0, 0), (_R, _R), (_R, _R), (0, 0)), constant_values=0.0
    )
    chans = []
    for dy in range(-_R, _R + 1):
        for dx in range(-_R, _R + 1):
            shifted = padded[:, _R + dy : _R + dy + h, _R + dx : _R + dx + w, :]
            chans.append(jnp.mean(jnp.abs(ten_one - shifted), axis=-1))
    return jnp.stack(chans, axis=-1)
