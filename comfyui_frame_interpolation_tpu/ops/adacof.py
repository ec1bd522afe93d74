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
    """All 25 taps are vectorized along one axis and the 4 bilinear corners are
    pre-packed into a quad tensor, so the whole op is ONE take_along_axis over
    [N, (Hp+1)*(Wp+1), 4C] instead of the naive 100 C=3-granularity gathers —
    XLA gather launch/index overhead dominates the per-element cost at that
    size on TPU (stmfnet `_us` stream attribution, docs/PROBES_r5.md §5).

    Quad packing is EXACT w.r.t. the reference's independent per-corner clamp:
    ``Q[g] = (I[max(g-1,0)], I[min(g, n-1)])`` per axis with
    ``g = clip(p, -1, n-1) + 1`` reproduces ``(clip(p), clip(p+1))`` for every
    integer p — interior, both-clamped-low (p <= -1 → (0, 0) via Q[0]) and
    both-clamped-high (p >= n-1 → (n-1, n-1) via Q[n])."""
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
    ig = jnp.clip(i0, -1, hp - 1) + 1  # quad row index in [0, hp]
    jg = jnp.clip(j0, -1, wp - 1) + 1

    # x-pair: channel block 0 = corner j0c, block 1 = corner j1c
    xp = jnp.concatenate(
        [
            jnp.concatenate([ten_in[:, :, :1], ten_in], axis=2),
            jnp.concatenate([ten_in, ten_in[:, :, -1:]], axis=2),
        ],
        axis=-1,
    )  # [N, Hp, Wp+1, 2C]
    quad = jnp.concatenate(
        [
            jnp.concatenate([xp[:, :1], xp], axis=1),
            jnp.concatenate([xp, xp[:, -1:]], axis=1),
        ],
        axis=-1,
    )  # [N, Hp+1, Wp+1, 4C]: blocks (i0j0, i0j1, i1j0, i1j1)
    flat = quad.reshape(n, (hp + 1) * (wp + 1), 4 * c)

    idx = (ig * (wp + 1) + jg).reshape(n, -1, 1)
    g = jnp.take_along_axis(flat, idx, axis=1)
    g = g.reshape(n, h, w, ff, 4, c).astype(jnp.float32)

    wf = weight.astype(jnp.float32)
    cw = jnp.stack(
        [
            wf * (1 - fa) * (1 - fb),
            wf * (1 - fa) * fb,
            wf * fa * (1 - fb),
            wf * fa * fb,
        ],
        axis=-1,
    )  # [N,H,W,FF,4]
    out = jnp.einsum("nhwtq,nhwtqc->nhwc", cw, g)
    return out.astype(dtype)
