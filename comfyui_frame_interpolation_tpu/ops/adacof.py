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


def _gather_hw(img: Array, iy: Array, ix: Array) -> Array:
    """img [N,Hp,Wp,C], integer maps [N,H,W] → [N,H,W,C]."""
    n, hp, wp, c = img.shape
    flat = img.reshape(n, hp * wp, c)
    idx = (iy * wp + ix).reshape(n, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(n, iy.shape[1], iy.shape[2], c)


def adacof_func(
    ten_in: Array, weight: Array, alpha: Array, beta: Array, dilation: int = 1
) -> Array:
    n, hp, wp, c = ten_in.shape
    _, h, w, ff = weight.shape
    f = int(round(ff**0.5))
    assert f * f == ff
    assert hp - ((f - 1) * dilation + 1) == h - 1, (ten_in.shape, weight.shape)
    assert wp - ((f - 1) * dilation + 1) == w - 1

    dtype = ten_in.dtype
    ys = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, None, :]

    out = jnp.zeros((n, h, w, c), dtype=jnp.float32)
    for k in range(f):
        for l in range(f):
            t = k * f + l
            a = alpha[..., t]
            b = beta[..., t]
            ai = jnp.trunc(a)  # C-style (int) cast: truncation toward zero
            bi = jnp.trunc(b)
            fa = (a - ai).astype(jnp.float32)[..., None]
            fb = (b - bi).astype(jnp.float32)[..., None]
            i0 = ys + k * dilation + ai.astype(jnp.int32)
            j0 = xs + l * dilation + bi.astype(jnp.int32)
            i0c = jnp.clip(i0, 0, hp - 1)
            i1c = jnp.clip(i0 + 1, 0, hp - 1)
            j0c = jnp.clip(j0, 0, wp - 1)
            j1c = jnp.clip(j0 + 1, 0, wp - 1)
            tap = (
                _gather_hw(ten_in, i0c, j0c).astype(jnp.float32) * (1 - fa) * (1 - fb)
                + _gather_hw(ten_in, i1c, j0c).astype(jnp.float32) * fa * (1 - fb)
                + _gather_hw(ten_in, i0c, j1c).astype(jnp.float32) * (1 - fa) * fb
                + _gather_hw(ten_in, i1c, j1c).astype(jnp.float32) * fa * fb
            )
            out = out + weight[..., t : t + 1].astype(jnp.float32) * tap
    return out.astype(dtype)
