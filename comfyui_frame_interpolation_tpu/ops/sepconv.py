"""Adaptive separable convolution (SepConv) — reference
``cupy_ops/sepconv.py`` kernel ``sepconv_out`` (lines 86-117).

``out[n, y, x, c] = sum_fy sum_fx in[n, y+fy, x+fx, c] * ver[n, y, x, fy] *
hor[n, y, x, fx]`` — a per-pixel K×K filter factored into per-pixel vertical and
horizontal K-taps. The input is expected pre-padded by the caller by K-1 (the model
pads +25 replicate on each side for K=51, ``sepconv_enhanced.py:689-691``), so the
output H/W equal ``ver``/``hor``'s H/W (reference shape coupling at
``sepconv.py:159-165``).

The CUDA kernel uses Kahan-compensated summation, a hint that fp32 accumulation is
load-bearing at K=51 — we accumulate in fp32 regardless of input dtype.

Implementation: :func:`sepconv_func`, a fori_loop over the K² taps with dynamic
slices — XLA keeps the accumulator on-chip between iterations, and the measured
720p throughput already exceeds the estimated reference baseline. A fused Pallas
kernel (input tile + 50 px halo resident in VMEM across all K² taps) is the known
next step if sepconv ever becomes the bottleneck; it is NOT implemented yet.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["sepconv_func"]


def sepconv_func(ten_in: Array, ten_ver: Array, ten_hor: Array) -> Array:
    """[N,Hp,Wp,C], [N,H,W,K], [N,H,W,K] → [N,H,W,C] with Hp=H+K-1, Wp=W+K-1."""
    n, hp, wp, c = ten_in.shape
    _, h, w, k = ten_ver.shape
    assert ten_hor.shape == (n, h, w, k), (ten_hor.shape, (n, h, w, k))
    assert hp == h + k - 1 and wp == w + k - 1, (ten_in.shape, ten_ver.shape)

    in32 = ten_in.astype(jnp.float32)
    ver32 = ten_ver.astype(jnp.float32)
    hor32 = ten_hor.astype(jnp.float32)

    def body(i, acc):
        fy = i // k
        fx = i % k
        window = jax.lax.dynamic_slice(in32, (0, fy, fx, 0), (n, h, w, c))
        wgt = (
            jax.lax.dynamic_slice(ver32, (0, 0, 0, fy), (n, h, w, 1))
            * jax.lax.dynamic_slice(hor32, (0, 0, 0, fx), (n, h, w, 1))
        )
        return acc + window * wgt

    acc = jax.lax.fori_loop(0, k * k, body, jnp.zeros((n, h, w, c), jnp.float32))
    return acc.astype(ten_in.dtype)
