"""Backward bilinear warping (grid-sample) — pure XLA gather.

Replicates the semantics the reference models rely on:

* ``rife_arch.py:31-70`` — ``warp(img, flow)``: sample ``img`` at
  ``(x + flow_x, y + flow_y)`` with bilinear filtering, ``align_corners=True``
  normalization (which cancels against the grid construction, leaving pure pixel
  offsets) and ``padding_mode="border"``.
* torch ``grid_sample`` generally (used via normalized grids in GMFlow, M2M backwarp,
  etc.) — exposed as :func:`grid_sample` with both padding modes and both
  align-corners conventions.

Layout: NHWC images, ``[N, H, W, 2]`` flows/grids with channel 0 = x, 1 = y —
matching the reference's NCHW channel order transposed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["warp", "grid_sample", "bilinear_sample", "warp_xla"]


def _tpu_available() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


_BACKEND = None


def _backend() -> str:
    """Resolve the warp backend once: 'pallas' on TPU unless configured off."""
    global _BACKEND
    if _BACKEND is None:
        from ..core.config import load_config

        cfg = load_config()
        _BACKEND = (
            "pallas"
            if cfg.get("ops_backend", "pallas") == "pallas" and _tpu_available()
            else "xla"
        )
    return _BACKEND


def _gather_2d(img: Array, ix: Array, iy: Array) -> Array:
    """Gather img[n, iy, ix, :] for integer index maps of shape [N, H', W']."""
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = (iy * w + ix).reshape(n, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape(n, ix.shape[1], ix.shape[2], c)


def bilinear_sample(
    img: Array, sx: Array, sy: Array, padding_mode: str = "border"
) -> Array:
    """Bilinear sample ``img`` (NHWC) at unnormalized pixel coords ``sx, sy``
    ([N, H', W']), matching torch ``grid_sample``'s corner cases.

    ``border``: coordinates are clamped to the image rectangle before the bilinear
    weights are computed (torch clips the coordinate, not just the indices).
    ``zeros``: out-of-bounds taps contribute zero.
    """
    n, h, w, c = img.shape
    out_dtype = img.dtype
    # coordinate/weight math always in f32: bf16/f16 pixel coordinates are lossy
    # beyond ~256 px and would shift samples by whole pixels
    compute_dtype = jnp.float32
    sx = sx.astype(compute_dtype)
    sy = sy.astype(compute_dtype)

    if padding_mode == "border":
        sx = jnp.clip(sx, 0.0, w - 1.0)
        sy = jnp.clip(sy, 0.0, h - 1.0)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode {padding_mode}")

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    if padding_mode == "zeros":
        # per-tap validity; indices clamped only for the gather
        vx0 = (x0i >= 0) & (x0i < w)
        vx1 = (x1i >= 0) & (x1i < w)
        vy0 = (y0i >= 0) & (y0i < h)
        vy1 = (y1i >= 0) & (y1i < h)
        m00 = (vy0 & vx0).astype(compute_dtype)[..., None]
        m01 = (vy0 & vx1).astype(compute_dtype)[..., None]
        m10 = (vy1 & vx0).astype(compute_dtype)[..., None]
        m11 = (vy1 & vx1).astype(compute_dtype)[..., None]
    else:
        m00 = m01 = m10 = m11 = jnp.ones((), compute_dtype)

    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x1i, 0, w - 1)
    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y1i, 0, h - 1)

    p00 = _gather_2d(img, x0c, y0c) * m00
    p01 = _gather_2d(img, x1c, y0c) * m01
    p10 = _gather_2d(img, x0c, y1c) * m10
    p11 = _gather_2d(img, x1c, y1c) * m11

    w00 = ((1.0 - wx) * (1.0 - wy))[..., None]
    w01 = (wx * (1.0 - wy))[..., None]
    w10 = ((1.0 - wx) * wy)[..., None]
    w11 = (wx * wy)[..., None]
    out = (
        p00.astype(compute_dtype) * w00
        + p01.astype(compute_dtype) * w01
        + p10.astype(compute_dtype) * w10
        + p11.astype(compute_dtype) * w11
    )
    return out.astype(out_dtype)


def warp_xla(img: Array, flow: Array, padding_mode: str = "border") -> Array:
    """Pure-XLA gather warp (always exact; slow on TPU — see pallas kernel)."""
    n, h, w, _ = flow.shape
    xs = jnp.arange(w, dtype=flow.dtype)
    ys = jnp.arange(h, dtype=flow.dtype)
    gx = jnp.broadcast_to(xs[None, None, :], (n, h, w))
    gy = jnp.broadcast_to(ys[None, :, None], (n, h, w))
    return bilinear_sample(img, gx + flow[..., 0], gy + flow[..., 1], padding_mode)


def warp(
    img: Array,
    flow: Array,
    padding_mode: str = "border",
    prefer_mxu: bool = False,
) -> Array:
    """Backward-warp ``img`` by ``flow`` (both NHWC; flow has 2 channels, x then y).

    Exactly ``rife_arch.py:31-70``: sample at ``(x + flow_x, y + flow_y)``,
    bilinear, align_corners=True + border padding (the normalization of the grid by
    ``(size-1)/2`` cancels, so the semantics reduce to pixel-space offsets).

    On TPU, border/zeros warps of reasonably sized images dispatch to the
    Pallas windowed-gather kernels; everything else uses the exact XLA path.

    Routing note: the r4 `warpshapes` A/B suggested XLA's gather wins for
    C >= 256 (its per-pixel channel slices are wide contiguous copies), but
    that harness drives synthetic ROUGH flows — the Pallas diagonal kernel's
    worst case (cost scales with per-tile flow variation) — and acting on the
    same data for the rows kernel collapsed the real RIFE headline 2.3x. XLA
    gather cost is flow-independent; real model flows are smooth, where diag
    measured >2x under its synthetic numbers. So all supported shapes stay on
    the Pallas path until a smooth-flow A/B says otherwise.
    """
    h, w = img.shape[1], img.shape[2]
    if (
        padding_mode in ("border", "zeros")
        and _backend() == "pallas"
        and h >= 64
        and w >= 128
        and h * w >= 128 * 128
    ):
        from .pallas.warp_kernel import warp_pallas_tiered

        # always-exact two-pass scheme: a fixed-window diagonal bulk kernel
        # covers in-window samples, then an in-place patch pass rewrites the
        # (rare) pixels whose samples fell outside the window — no
        # data-dependent fallback (see warp_kernel.py); channel chunking
        # beyond the per-pass VMEM caps is handled inside
        # prefer_mxu: callers opt wide-channel (C>=32) bf16 warps onto the
        # rows-layout MXU kernel, whose one-hot builds amortize over all
        # channels (flow-independent cost); narrow warps stay on diag.
        # CFI_WARP_MXU (0/auto/force) still overrides globally.
        return warp_pallas_tiered(
            img, flow, zeros=padding_mode == "zeros", prefer_mxu=prefer_mxu
        )
    return warp_xla(img, flow, padding_mode)


def grid_sample(
    img: Array,
    grid: Array,
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> Array:
    """torch ``F.grid_sample(mode="bilinear")`` parity for normalized grids.

    ``grid``: [N, H', W', 2] in [-1, 1], channel 0 = x, 1 = y.
    """
    n, h, w, _ = img.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        sx = (gx + 1.0) * 0.5 * (w - 1)
        sy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        sx = ((gx + 1.0) * w - 1.0) * 0.5
        sy = ((gy + 1.0) * h - 1.0) * 0.5
    return bilinear_sample(img, sx, sy, padding_mode)


def bicubic_sample(
    img: Array, sx: Array, sy: Array, padding_mode: str = "zeros"
) -> Array:
    """torch ``grid_sample(mode="bicubic")`` parity: 4x4 cubic-convolution taps
    (a=-0.75); ``zeros`` zeroes out-of-bounds taps, ``border`` clamps indices."""
    n, h, w, c = img.shape
    out_dtype = img.dtype
    sx = sx.astype(jnp.float32)
    sy = sy.astype(jnp.float32)

    def cubic(t):
        a = -0.75
        at = jnp.abs(t)
        return jnp.where(
            at <= 1.0,
            ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0,
            jnp.where(at < 2.0, (((at - 5.0) * at + 8.0) * at - 4.0) * a, 0.0),
        )

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    tx = sx - x0
    ty = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = jnp.zeros(sx.shape + (c,), jnp.float32)
    for dy in (-1, 0, 1, 2):
        wy = cubic(ty - dy)[..., None]
        yi = y0i + dy
        for dx in (-1, 0, 1, 2):
            wx = cubic(tx - dx)[..., None]
            xi = x0i + dx
            if padding_mode == "zeros":
                valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).astype(
                    jnp.float32
                )[..., None]
            else:
                valid = 1.0
            xc = jnp.clip(xi, 0, w - 1)
            yc = jnp.clip(yi, 0, h - 1)
            tap = _gather_2d(img, xc, yc).astype(jnp.float32)
            out = out + tap * wx * wy * valid
    return out.astype(out_dtype)
