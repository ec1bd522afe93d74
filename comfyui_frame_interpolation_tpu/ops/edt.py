"""Batched Euclidean distance transform — separable min-plus XLA
(reference ``cupy_ops/batch_edt.py``).

Input is a binary edge map (white lines on black); output is the Euclidean distance
to the nearest edge pixel, defaulting to the image diameter for empty images.
The reference runs a brute-force per-row squared-distance scan along each axis
(``kernel_dt``): ``out[i] = min_j (data[j] + (i - j)^2)`` — first along x, then along
y on the transposed intermediate — followed by ``sqrt``.

Here each 1-D pass is a min-plus product computed in chunks:
``out[..., i] = min_j (data[..., j] + (i-j)^2)`` via a broadcasted [W, W] distance
matrix, chunked along ``i`` to bound memory. Pure VPU work, fully batched; unlike
the CUDA version it is shape-generic and differentiable (not that EDT grads are
used — EISAI applies it to thresholded edges, ``eisai_arch.py:1588-1613``).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["batch_edt"]


def _dt_1d(data: Array, chunk: int = 256) -> Array:
    """min_j(data[..., j] + (i-j)^2) along the last axis."""
    w = data.shape[-1]
    js = jnp.arange(w, dtype=data.dtype)
    outs = []
    for start in range(0, w, chunk):
        stop = min(start + chunk, w)
        is_ = jnp.arange(start, stop, dtype=data.dtype)
        d2 = (is_[:, None] - js[None, :]) ** 2  # [chunk, W]
        outs.append(jnp.min(data[..., None, :] + d2, axis=-1))
    return jnp.concatenate(outs, axis=-1)


def batch_edt(img: Array) -> Array:
    """(N,H,W) or (N,1,H,W)/(N,H,W,1) binary map → same-shape float distances."""
    expand_axis = None
    if img.ndim == 4:
        if img.shape[1] == 1:  # NCHW-style
            expand_axis, imgs = 1, img[:, 0]
        elif img.shape[-1] == 1:  # NHWC-style
            expand_axis, imgs = -1, img[..., 0]
        else:
            raise ValueError(f"expected a single-channel map, got {img.shape}")
    else:
        imgs = img
    n, h, w = imgs.shape
    diam2 = float(h * h + w * w)
    odtype = imgs.dtype

    data = (1.0 - imgs.astype(jnp.float32)) * diam2
    # x-axis pass then y-axis pass (order is symmetric for EDT)
    inter = _dt_1d(data)
    out = _dt_1d(inter.transpose(0, 2, 1)).transpose(0, 2, 1)
    ans = jnp.sqrt(out)
    if jnp.issubdtype(odtype, jnp.floating):
        ans = ans.astype(odtype)
    if expand_axis is not None:
        ans = jnp.expand_dims(ans, expand_axis)
    return ans
