"""Pallas TPU bilinear backward-warp kernel.

Why: XLA:TPU lowers per-pixel gathers to near-scalar code — a single 1080p warp
costs ~110-150 ms, and RIFE does 14 of them per forward (the entire gap between
2.2 s/frame and tens of ms). Mosaic's ``tpu.dynamic_gather`` gives a vectorized
lane crossbar, but only within one 128-lane vreg — so the kernel localizes the
gather:

For each [8, 128] output tile (all C channels of one image together):
  1. read the flow tile, compute clamped source coords (border semantics, exactly
     matching ``ops.warp``),
  2. derive a dynamic, tile-aligned window base (min source coord over the tile,
     rounded down to the (8, 128) tiling) and DMA an aligned ``[C, WIN_H, WIN_W]``
     source window from HBM into VMEM,
  3. accumulate the bilinear sample over the window rows actually touched
     (``fori_loop`` between the tile's min/max source row): for each row, a
     sublane one-hot selects the two y-taps' weights, and per-128-column chunk a
     same-shape lane crossbar (``take_along_axis`` axis=1, single vreg) fetches
     the two x-taps — index arithmetic done once, reused for every channel.

For a fixed window, local flow deviation beyond it is clamped to the window
edge. The public entry point :func:`warp_pallas_tiered` therefore computes the
per-tile source-coordinate spans in an XLA prologue and picks the cheapest
window that covers EVERY tile — (16, 256) → (32, 384) → (64, 512) → whole-call
XLA gather — so the result is always bit-exact vs ``ops.warp.warp_xla`` while
smooth flows (the overwhelmingly common case: RIFE/FILM/GMFSS intermediate
flows are upsampled from coarse pyramids) pay only for the small window.
Exactness vs the XLA path is asserted in ``tests/test_pallas_kernels.py``
(TPU-gated), including flows chosen to land in each tier.

Measured (v5e, 8x1088x1920x7 bf16 per call): 24 ms at (16, 256), 55 ms at
(32, 384), vs ~880 ms for the XLA gather. Cost is VPU-bound and scales with
``win_h * (win_w / 128)``; DMA and weight math are minor.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

TILE_H = 8
TILE_W = 128
DEF_WIN_H = 32
DEF_WIN_W = 384
# exactness ladder for warp_pallas_tiered: (win_h, win_w, channel cap)
TIERS = ((16, 256, 36), (32, 384, 36), (64, 512, 12))


def _row_gather(row_chunks, lx, win_w):
    """Gather ``row[lx]`` for a [8,128] index tile from a window row held as a
    list of 128-lane chunks (each already broadcast to [8,128])."""
    out = jnp.zeros(lx.shape, row_chunks[0].dtype)
    for ci, chunk in enumerate(row_chunks):
        base = ci * TILE_W
        in_chunk = (lx >= base) & (lx < base + TILE_W)
        local = jnp.clip(lx - base, 0, TILE_W - 1)
        gathered = jnp.take_along_axis(chunk, local, axis=1)
        out = jnp.where(in_chunk, gathered, out)
    return out


def _warp_kernel(
    fx_ref, fy_ref, img_ref, out_ref, win_ref, acc_ref, sem,
    *, h: int, w: int, win_h: int, win_w: int, c: int, skip_groups: bool
):
    bc = pl.program_id(0)
    hi = pl.program_id(1)
    wi = pl.program_id(2)

    fx = fx_ref[0].astype(jnp.float32)  # [8, 128]; coords always in f32 —
    fy = fy_ref[0].astype(jnp.float32)  # bf16 pixel coords are lossy at >256 px

    ys = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) + hi * TILE_H
    ).astype(jnp.float32)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + wi * TILE_W
    ).astype(jnp.float32)

    sx = jnp.clip(xs + fx, 0.0, w - 1.0)
    sy = jnp.clip(ys + fy, 0.0, h - 1.0)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx1 = (sx - x0).astype(jnp.float32)
    wy1 = (sy - y0).astype(jnp.float32)

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # DMA bases must be tile-aligned (8 sublanes / 128 lanes); align down and
    # rely on the window margin to absorb the lost offset.
    by = jnp.clip((jnp.min(y0i) // TILE_H) * TILE_H, 0, max(h - win_h, 0))
    bx = jnp.clip((jnp.min(x0i) // TILE_W) * TILE_W, 0, max(w - win_w, 0))
    by = pl.multiple_of(by, TILE_H)
    bx = pl.multiple_of(bx, TILE_W)

    copy = pltpu.make_async_copy(
        img_ref.at[bc, pl.ds(by, win_h), pl.ds(bx, win_w)], win_ref, sem
    )
    copy.start()

    # local tap indices, clamped into the window (edge clamp beyond)
    ly0 = jnp.clip(y0i - by, 0, win_h - 1)
    ly1 = jnp.clip(y0i + 1 - by, 0, win_h - 1)
    lx0 = jnp.clip(x0i - bx, 0, win_w - 1)
    lx1 = jnp.clip(x0i + 1 - bx, 0, win_w - 1)
    wx0 = 1.0 - wx1

    copy.wait()

    n_chunks = win_w // TILE_W

    # Fully static unroll over the window rows. Empirically load-bearing Mosaic
    # codegen facts (all measured on v5e):
    #  - predication (pl.when), VMEM scratch accumulators, and dynamic row
    #    loops each drop codegen into a ~6-8x slower path;
    #  - hoisting the per-chunk masks/indices out of the row loop creates
    #    long-lived vregs that spill — recompute them per row instead.
    acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for r in range(win_h):
        wrow = jnp.where(ly0 == r, 1.0 - wy1, 0.0) + jnp.where(ly1 == r, wy1, 0.0)
        chunks = [
            jnp.broadcast_to(
                win_ref[r : r + 1, ci * TILE_W : (ci + 1) * TILE_W],
                (TILE_H, TILE_W),
            ).astype(jnp.float32)
            for ci in range(n_chunks)
        ]
        v0 = _row_gather(chunks, lx0, win_w)
        v1 = _row_gather(chunks, lx1, win_w)
        acc = acc + wrow * (v0 * wx0 + v1 * wx1)

    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("c", "win_h", "win_w", "skip_groups")
)
def warp_pallas_planes(
    planes: Array,
    fx: Array,
    fy: Array,
    c: int,
    win_h: int = DEF_WIN_H,
    win_w: int = DEF_WIN_W,
    skip_groups: bool = True,
) -> Array:
    """Warp channel planes ``[B*C, H, W]`` by per-image flows ``fx/fy [B, H, W]``.

    H must be a multiple of 8 and W of 128 (caller pads)."""
    p, h, w = planes.shape
    b = fx.shape[0]
    assert p == b * c, (p, b, c)
    assert h % TILE_H == 0 and w % TILE_W == 0, (h, w)
    win_h = min(win_h, h)
    win_w = min(win_w, w)
    if w < TILE_W:
        raise ValueError("width must be >= 128 for the pallas warp")

    grid = (p, h // TILE_H, w // TILE_W)
    kernel = functools.partial(
        _warp_kernel, h=h, w=w, win_h=win_h, win_w=win_w, c=c,
        skip_groups=skip_groups,
    )
    flow_spec = pl.BlockSpec(
        (1, TILE_H, TILE_W),
        lambda bc, hi, wi: (bc // c, hi, wi),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            flow_spec,
            flow_spec,
            pl.BlockSpec(memory_space=pltpu.ANY),  # full planes stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_H, TILE_W),
            lambda bc, hi, wi: (bc, hi, wi),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((p, h, w), planes.dtype),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w), planes.dtype),
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(fx, fy, planes)


def warp_pallas(
    img: Array,
    flow: Array,
    win_h: int = DEF_WIN_H,
    win_w: int = DEF_WIN_W,
    skip_groups: bool = True,
) -> Array:
    """NHWC warp with border semantics via the Pallas kernel.

    Pads H to a multiple of 8 and W to a multiple of 128 (edge replicate, so
    border clamping against the padded extent equals clamping against the true
    extent), warps channel planes, crops back.
    """
    b, h, w, c = img.shape
    ph = -h % TILE_H
    pw = -w % TILE_W
    if ph or pw or w < TILE_W:
        pw = max(pw, TILE_W - w)
        img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        flow = jnp.pad(flow, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    planes = img.transpose(0, 3, 1, 2).reshape(b * c, img.shape[1], img.shape[2])
    out = warp_pallas_planes(
        planes, flow[..., 0], flow[..., 1], c, win_h=win_h, win_w=win_w,
        skip_groups=skip_groups,
    )
    out = out.reshape(b, c, img.shape[1], img.shape[2]).transpose(0, 2, 3, 1)
    return out[:, :h, :w, :]


# ---------------------------------------------------------------------------
# v2: per-image grid, in-kernel channel loop, scalar-prefetched window bases,
# double-buffered window DMA (hides the per-tile DMA latency that floors v1)
# ---------------------------------------------------------------------------


def _warp_kernel_v2(
    by_ref, bx_ref,  # scalar-prefetched window bases [T]
    fx_ref, fy_ref, img_ref, out_ref, win_ref, sem,
    *, h: int, w: int, win_h: int, win_w: int, c: int,
    grid_hw: Tuple[int, int], zeros: bool = False
):
    gh, gw = grid_hw
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    wi = pl.program_id(2)
    t = (bi * gh + hi) * gw + wi
    n_tiles = pl.num_programs(0) * gh * gw

    def start_dma(tile_idx, slot):
        b_k = tile_idx // (gh * gw)
        by = pl.multiple_of(by_ref[tile_idx], TILE_H)
        bx = pl.multiple_of(bx_ref[tile_idx], TILE_W)
        return pltpu.make_async_copy(
            img_ref.at[b_k, :, pl.ds(by, win_h), pl.ds(bx, win_w)],
            win_ref.at[slot],
            sem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        start_dma(0, 0).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        start_dma(t + 1, (t + 1) % 2).start()

    fx = fx_ref[0].astype(jnp.float32)
    fy = fy_ref[0].astype(jnp.float32)
    ys = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0) + hi * TILE_H
    ).astype(jnp.float32)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + wi * TILE_W
    ).astype(jnp.float32)
    if zeros:
        # zeros padding: taps keep their true (unclamped) coords; out-of-frame
        # taps get zero weight. Non-finite coords are pushed out of frame.
        sx = xs + fx
        sy = ys + fy
        finite = jnp.isfinite(sx) & jnp.isfinite(sy)
        sx = jnp.where(finite, sx, -4.0 * w)
        sy = jnp.where(finite, sy, -4.0 * h)
        sx = jnp.clip(sx, -2.0 * w, 2.0 * w)  # keep int32 conversion safe
        sy = jnp.clip(sy, -2.0 * h, 2.0 * h)
    else:
        sx = jnp.clip(xs + fx, 0.0, w - 1.0)
        sy = jnp.clip(ys + fy, 0.0, h - 1.0)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx1 = sx - x0
    wy1 = sy - y0
    wx0 = 1.0 - wx1
    if zeros:
        vx0 = (x0 >= 0.0) & (x0 <= w - 1.0)
        vx1 = (x0 + 1.0 >= 0.0) & (x0 + 1.0 <= w - 1.0)
        vy0 = (y0 >= 0.0) & (y0 <= h - 1.0)
        vy1 = (y0 + 1.0 >= 0.0) & (y0 + 1.0 <= h - 1.0)
        wx0 = jnp.where(vx0, wx0, 0.0)
        wx1 = jnp.where(vx1, wx1, 0.0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    by = pl.multiple_of(by_ref[t], TILE_H)
    bx = pl.multiple_of(bx_ref[t], TILE_W)
    ly0 = jnp.clip(y0i - by, 0, win_h - 1)
    ly1 = jnp.clip(y0i + 1 - by, 0, win_h - 1)
    lx0 = jnp.clip(x0i - bx, 0, win_w - 1)
    lx1 = jnp.clip(x0i + 1 - bx, 0, win_w - 1)

    start_dma(t, t % 2).wait()
    slot = t % 2
    n_chunks = win_w // TILE_W

    # lx0/lx1 are row-invariant: hoist each tap's per-chunk local index and
    # in-range mask to tile level instead of recomputing them for every
    # (row, channel) — the inner loop is then just gather+select+fma.
    tap_meta = []
    for lx in (lx0, lx1):
        metas = []
        for ci in range(n_chunks):
            base = ci * TILE_W
            in_chunk = (lx >= base) & (lx < base + TILE_W)
            local = jnp.clip(lx - base, 0, TILE_W - 1)
            metas.append((local, in_chunk))
        tap_meta.append(metas)

    if zeros:
        wy0m = jnp.where(vy0, 1.0 - wy1, 0.0)
        wy1m = jnp.where(vy1, wy1, 0.0)
    else:
        wy0m = 1.0 - wy1
        wy1m = wy1
    accs = [jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(c)]
    for r in range(win_h):
        wrow = jnp.where(ly0 == r, wy0m, 0.0) + jnp.where(ly1 == r, wy1m, 0.0)
        wr0 = wrow * wx0
        wr1 = wrow * wx1
        for ch in range(c):
            chunks = [
                jnp.broadcast_to(
                    win_ref[slot, ch, r : r + 1, ci * TILE_W : (ci + 1) * TILE_W],
                    (TILE_H, TILE_W),
                ).astype(jnp.float32)
                for ci in range(n_chunks)
            ]
            vals = []
            for metas in tap_meta:
                v = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                for ci, (local, in_chunk) in enumerate(metas):
                    g = jnp.take_along_axis(chunks[ci], local, axis=1)
                    v = jnp.where(in_chunk, g, v)
                vals.append(v)
            accs[ch] = accs[ch] + wr0 * vals[0] + wr1 * vals[1]

    for ch in range(c):
        out_ref[0, ch] = accs[ch].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("win_h", "win_w", "zeros", "frame_hw")
)
def warp_pallas_planes_v2(
    planes: Array,  # [B, C, H, W]
    fx: Array,
    fy: Array,
    win_h: int = DEF_WIN_H,
    win_w: int = DEF_WIN_W,
    zeros: bool = False,
    frame_hw: Optional[Tuple[int, int]] = None,
    bases: Optional[Tuple[Array, Array]] = None,
) -> Array:
    b, c, h, w = planes.shape
    # true frame bounds for clamping/validity (the array may be padded)
    hb, wb = frame_hw or (h, w)
    assert h % TILE_H == 0 and w % TILE_W == 0, (h, w)
    win_h = min(win_h, h)
    win_w = min(win_w, w)
    gh, gw = h // TILE_H, w // TILE_W

    if bases is not None:
        by, bx = bases
    else:
        # per-tile aligned window bases, computed as a cheap XLA reduction
        y0 = jnp.floor(jnp.clip(
            jnp.arange(h, dtype=fy.dtype)[None, :, None] + fy, 0.0, hb - 1.0
        )).astype(jnp.int32)
        x0 = jnp.floor(jnp.clip(
            jnp.arange(w, dtype=fx.dtype)[None, None, :] + fx, 0.0, wb - 1.0
        )).astype(jnp.int32)
        by = jnp.min(y0.reshape(b, gh, TILE_H, gw, TILE_W), axis=(2, 4))
        bx = jnp.min(x0.reshape(b, gh, TILE_H, gw, TILE_W), axis=(2, 4))
        by = jnp.clip((by // TILE_H) * TILE_H, 0, max(h - win_h, 0)).reshape(-1)
        bx = jnp.clip((bx // TILE_W) * TILE_W, 0, max(w - win_w, 0)).reshape(-1)

    kernel = functools.partial(
        _warp_kernel_v2, h=hb, w=wb, win_h=win_h, win_w=win_w, c=c,
        grid_hw=(gh, gw), zeros=zeros,
    )
    flow_spec = pl.BlockSpec(
        (1, TILE_H, TILE_W), lambda bi, hi, wi, *_: (bi, hi, wi),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, gh, gw),
        in_specs=[
            flow_spec,
            flow_spec,
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, c, TILE_H, TILE_W), lambda bi, hi, wi, *_: (bi, 0, hi, wi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, c, win_h, win_w), planes.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), planes.dtype),
    )(by, bx, fx, fy, planes)


def warp_pallas_v2(
    img: Array, flow: Array, win_h: int = DEF_WIN_H, win_w: int = DEF_WIN_W,
    zeros: bool = False,
) -> Array:
    """NHWC warp (border or zeros padding) via the double-buffered kernel."""
    b, h, w, c = img.shape
    ph = -h % TILE_H
    pw = -w % TILE_W
    if ph or pw or w < TILE_W:
        pw = max(pw, TILE_W - w)
        img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        flow = jnp.pad(flow, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    planes = img.transpose(0, 3, 1, 2)
    out = warp_pallas_planes_v2(
        planes, flow[..., 0], flow[..., 1], win_h=win_h, win_w=win_w,
        zeros=zeros, frame_hw=(h, w),
    )
    out = out.transpose(0, 2, 3, 1)
    return out[:, :h, :w, :]


# Note: a channel-packed bf16 variant (two bf16 channels per int32 lane, one
# crossbar gathering both) was measured at 11.1-11.2 ms/1080p-warp vs
# 9.2-10.9 ms for the plain kernel fed bf16 windows: at bf16 the kernel is
# bandwidth/ALU-bound, not crossbar-bound, so the packing's unpack ALU cost
# exceeded the crossbar savings and the variant was dropped.


# ---------------------------------------------------------------------------
# Tiered exact dispatch: pick the cheapest window that covers every tile
# ---------------------------------------------------------------------------


def _tile_spans(fx, fy, h, w, hb, wb):
    """Per-(8,128)-tile min/max of the clamped integer source coordinates.

    Clamping to the frame matches the kernel exactly in border mode; in zeros
    mode out-of-frame taps carry zero weight, so clamping is span-neutral.
    Non-finite flows contribute nothing on every path and are treated as zero
    displacement here so one NaN pixel doesn't inflate its tile's span."""
    b = fx.shape[0]
    gh, gw = h // TILE_H, w // TILE_W
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    sx = xs + fx.astype(jnp.float32)
    sy = ys + fy.astype(jnp.float32)
    finite = jnp.isfinite(sx) & jnp.isfinite(sy)
    sx = jnp.where(finite, sx, xs)
    sy = jnp.where(finite, sy, ys)
    x0 = jnp.floor(jnp.clip(sx, 0.0, wb - 1.0)).astype(jnp.int32)
    y0 = jnp.floor(jnp.clip(sy, 0.0, hb - 1.0)).astype(jnp.int32)
    x0 = x0.reshape(b, gh, TILE_H, gw, TILE_W)
    y0 = y0.reshape(b, gh, TILE_H, gw, TILE_W)
    return (
        jnp.min(y0, axis=(2, 4)), jnp.max(y0, axis=(2, 4)),
        jnp.min(x0, axis=(2, 4)), jnp.max(x0, axis=(2, 4)),
    )


def _bases_fits(spans, wh, ww, h, w, hb, wb):
    """Aligned window bases + whether (wh, ww) covers every tile.

    The second tap (``y0+1`` / ``x0+1``) carries zero weight when it falls
    beyond the frame, so the needed extent clamps to ``hb-1`` / ``wb-1``."""
    ymin, ymax, xmin, xmax = spans
    wh = min(wh, h)
    ww = min(ww, w)
    by = jnp.clip((ymin // TILE_H) * TILE_H, 0, max(h - wh, 0))
    bx = jnp.clip((xmin // TILE_W) * TILE_W, 0, max(w - ww, 0))
    need_y = jnp.minimum(ymax + 1, hb - 1)
    need_x = jnp.minimum(xmax + 1, wb - 1)
    fits = jnp.all((need_y - by <= wh - 1) & (need_x - bx <= ww - 1))
    return by.reshape(-1), bx.reshape(-1), fits


def _xla_fallback_planes(planes, fx, fy, hb, wb, zeros):
    """Exact whole-call gather for flows beyond every tier. Channel-chunked:
    the 4-tap gather materializes f32 temporaries per tap, which at full
    resolution and wide C would blow HBM inside this rarely-taken branch."""
    from ..warp import bilinear_sample

    b, c, h, w = planes.shape
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    gx = jnp.broadcast_to(xs[None, None, :], (b, h, w)) + fx.astype(jnp.float32)
    gy = jnp.broadcast_to(ys[None, :, None], (b, h, w)) + fy.astype(jnp.float32)
    if not zeros:
        gx = jnp.clip(gx, 0.0, wb - 1.0)
        gy = jnp.clip(gy, 0.0, hb - 1.0)
    mode = "zeros" if zeros else "border"
    outs = []
    for c0 in range(0, c, 4):
        img = planes[:, c0 : c0 + 4, :hb, :wb].transpose(0, 2, 3, 1)
        res = bilinear_sample(img, gx[:, :hb, :wb], gy[:, :hb, :wb], mode)
        res = res.transpose(0, 3, 1, 2)
        res = jnp.pad(
            res, ((0, 0), (0, 0), (0, h - hb), (0, w - wb))
        )
        outs.append(res)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return out.astype(planes.dtype)


@functools.partial(jax.jit, static_argnames=("zeros", "frame_hw"))
def warp_pallas_planes_tiered(
    planes: Array,  # [B, C, H, W]
    fx: Array,
    fy: Array,
    zeros: bool = False,
    frame_hw: Optional[Tuple[int, int]] = None,
) -> Array:
    """Always-exact warp: run the cheapest kernel window that covers every
    tile's source span, falling back to the XLA gather for pathological flows
    (local variation beyond ~±48 rows / ±380 cols within one 8x128 tile)."""
    b, c, h, w = planes.shape
    hb, wb = frame_hw or (h, w)
    spans = _tile_spans(fx, fy, h, w, hb, wb)

    def run_tier(wh, ww, cap, by, bx):
        # zeros-mode validity masks add register pressure; lower the channel
        # cap so the fully-unrolled kernel body doesn't blow scoped VMEM
        cap = min(cap, {16: 24, 32: 24, 64: 8}[wh] if zeros else cap)
        if c <= cap:
            return warp_pallas_planes_v2(
                planes, fx, fy, win_h=wh, win_w=ww, zeros=zeros,
                frame_hw=(hb, wb), bases=(by, bx),
            )
        parts = [
            warp_pallas_planes_v2(
                planes[:, i : i + cap], fx, fy, win_h=wh, win_w=ww,
                zeros=zeros, frame_hw=(hb, wb), bases=(by, bx),
            )
            for i in range(0, c, cap)
        ]
        return jnp.concatenate(parts, axis=1)

    ladder = []
    for wh, ww, cap in TIERS:
        by, bx, fits = _bases_fits(spans, wh, ww, h, w, hb, wb)
        ladder.append((wh, ww, cap, by, bx, fits))
        if wh >= h and ww >= w:
            break  # this window sees the whole image: unconditional cover

    def make(i):
        if i == len(ladder):
            return lambda _: _xla_fallback_planes(planes, fx, fy, hb, wb, zeros)
        wh, ww, cap, by, bx, fits = ladder[i]
        if wh >= h and ww >= w:
            return lambda _: run_tier(wh, ww, cap, by, bx)

        def step(_):
            return jax.lax.cond(
                fits,
                lambda __: run_tier(wh, ww, cap, by, bx),
                make(i + 1),
                None,
            )

        return step

    return make(0)(None)


def warp_pallas_tiered(img: Array, flow: Array, zeros: bool = False) -> Array:
    """NHWC warp (border or zeros padding), always exact vs ``warp_xla``."""
    b, h, w, c = img.shape
    ph = -h % TILE_H
    pw = -w % TILE_W
    if ph or pw or w < TILE_W:
        pw = max(pw, TILE_W - w)
        img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        flow = jnp.pad(flow, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    planes = img.transpose(0, 3, 1, 2)
    out = warp_pallas_planes_tiered(
        planes, flow[..., 0], flow[..., 1], zeros=zeros, frame_hw=(h, w)
    )
    out = out.transpose(0, 2, 3, 1)
    return out[:, :h, :w, :]
