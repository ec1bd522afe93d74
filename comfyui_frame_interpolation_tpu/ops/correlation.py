"""PWC/FlowNet-style 81-channel dot-product correlation — shift-and-reduce XLA
(reference ``cupy_ops/correlation.py``).

The CUDA path rearranges NCHW into a zero-padded (+4 px border) NHWC buffer
(``kernel_Correlation_rearrange``), then for each displacement ``(s2p, s2o)`` in the
±4 window computes ``mean_c(one[y, x, c] * two[y+s2p, x+s2o, c])`` with a 32-thread
shared-memory reduction (``kernel_Correlation_updateOutput``); output channel index
is ``(s2p+4)*9 + (s2o+4)``. Out-of-bounds displaced pixels contribute zero (the
padded buffer is zero-initialized).

Here that is 81 fused shifted multiplies over the channel mean — no rearrange pass,
no shared memory, NHWC native.

Used by STMFNet's internal PWCNet wrapped in ``leaky_relu(0.1)``
(``stmfnet_arch.py:407,421,2160,2174``).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["correlation_func"]

_R = 4


def correlation_func(ten_one: Array, ten_two: Array) -> Array:
    """[N,H,W,C] x2 → [N,H,W,81] channel-mean dot-product correlation."""
    n, h, w, c = ten_one.shape
    padded = jnp.pad(
        ten_two, ((0, 0), (_R, _R), (_R, _R), (0, 0)), constant_values=0.0
    )
    chans = []
    for dy in range(-_R, _R + 1):
        for dx in range(-_R, _R + 1):
            shifted = padded[:, _R + dy : _R + dy + h, _R + dx : _R + dx + w, :]
            chans.append(jnp.mean(ten_one * shifted, axis=-1))
    return jnp.stack(chans, axis=-1)
