"""AdaCoF deformable adaptive convolution — XLA gather
(reference ``cupy_ops/adacof.py`` kernel ``kernel_AdaCoF_updateOutput``, lines 5-64).

``out[n, i, j, c] = sum_{k,l} w[n, i, j, k*F+l] * bilin(in, i + k*d + alpha_{kl},
j + l*d + beta_{kl})`` where the "bilinear" taps replicate the CUDA kernel's exact
corner cases:

* ``A = (int) alpha`` is **truncation toward zero**, not floor — for negative
  fractional offsets the blend weights leave [0, 1]; we reproduce this with
  ``trunc`` for bit-parity with the reference.
* each of the four tap coordinates is clamped to the image rectangle
  *independently* (border behavior).

Shape contract (``adacof.py:274-279``): ``in_H - ((F-1)*d + 1) == out_H - 1`` —
the input comes pre-padded by the model.

Layout: NHWC input; ``weight/alpha/beta`` are ``[N, H, W, F*F]``.
Used by STMFNet at three scales with F=5, d=1 (``stmfnet_arch.py:2768-2818``).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["adacof_func"]


def adacof_func(
    ten_in: Array, weight: Array, alpha: Array, beta: Array, dilation: int = 1
) -> Array:
    """All 25 taps are vectorized along one axis so each bilinear corner is ONE
    take_along_axis over [N, Hp*Wp, C] (4 large gathers total) instead of the
    naive 100 small ones — XLA gather launch/index overhead dominates the
    per-element cost at C=3 on TPU (stmfnet `_us` stream attribution,
    docs/PROBES_r5.md)."""
    n, hp, wp, c = ten_in.shape
    _, h, w, ff = weight.shape
    f = int(round(ff**0.5))
    assert f * f == ff
    assert hp - ((f - 1) * dilation + 1) == h - 1, (ten_in.shape, weight.shape)
    assert wp - ((f - 1) * dilation + 1) == w - 1

    dtype = ten_in.dtype
    ys = jnp.arange(h, dtype=jnp.int32)[None, :, None, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, None, :, None]
    ks = (jnp.arange(ff, dtype=jnp.int32) // f)[None, None, None, :]
    ls = (jnp.arange(ff, dtype=jnp.int32) % f)[None, None, None, :]

    ai = jnp.trunc(alpha)  # C-style (int) cast: truncation toward zero
    bi = jnp.trunc(beta)
    fa = (alpha - ai).astype(jnp.float32)  # [N,H,W,FF]; in (-1,0] for a<0
    fb = (beta - bi).astype(jnp.float32)
    i0 = ys + ks * dilation + ai.astype(jnp.int32)  # [N,H,W,FF]
    j0 = xs + ls * dilation + bi.astype(jnp.int32)
    # each corner coordinate clamps independently (reference border behavior)
    i0c = jnp.clip(i0, 0, hp - 1)
    i1c = jnp.clip(i0 + 1, 0, hp - 1)
    j0c = jnp.clip(j0, 0, wp - 1)
    j1c = jnp.clip(j0 + 1, 0, wp - 1)

    flat = ten_in.reshape(n, hp * wp, c)

    def corner(iy: Array, ix: Array, cw: Array) -> Array:
        idx = (iy * wp + ix).reshape(n, -1, 1)
        g = jnp.take_along_axis(flat, idx, axis=1).reshape(n, h, w, ff, c)
        return jnp.sum(cw[..., None] * g.astype(jnp.float32), axis=3)

    wf = weight.astype(jnp.float32)
    out = (
        corner(i0c, j0c, wf * (1 - fa) * (1 - fb))
        + corner(i1c, j0c, wf * fa * (1 - fb))
        + corner(i0c, j1c, wf * (1 - fa) * fb)
        + corner(i1c, j1c, wf * fa * fb)
    )
    return out.astype(dtype)
