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

The public entry point :func:`warp_pallas_tiered` is ALWAYS exact vs
``ops.warp.warp_xla`` with no data-dependent control flow (an earlier
``lax.cond`` tier ladder made XLA layout assignment materialize channel-minor
boundary copies padded 18-42x — OOM at 1080p). Two passes:

1. **bulk** — the rolled diagonal-form kernel (``_warp_kernel_diag_roll``) over every
   tile with the ``K0_WIN`` (24, 384) window. It iterates flow-deviation
   diagonals ``d = y0 - m - base`` rather than window rows: the window slice
   ``win[d:d+8]`` maps output sublane m to source row ``base + m + d``
   directly (no per-row broadcast), and for locally smooth flow only
   ``variation + alignment + 2`` diagonals carry weight. An XLA prologue
   derives per-tile spans from ``floor(flow)`` alone (cheap fused reduction;
   exact off the frame edges since ``floor(row + f) == row + floor(f)``).
2. **patch** — an in-place (aliased-output) kernel that exactly recomputes
   the tiles the bulk pass couldn't cover (edge-clamped tiles, local
   variation beyond the window) with a dynamic loop over aligned 8-row
   full-width source slabs — exact for ANY flow, so no whole-call fallback
   exists. Its body is per-tile predicated; the all-good case costs only a
   scalar flag sweep.

Exactness vs the XLA path is asserted in ``tests/test_pallas_kernels.py``
(TPU-gated), including discontinuous and extreme flows that exercise the
patch pass.

Measured (v5e, 16x1088x1920x7 bf16 per call, smooth flow): 54 ms diagonal
bulk vs 83 ms row-form vs ~1700 ms XLA gather. Cost is VPU-bound and scales
with ``(win_h - 8) * (win_w / 128)``; DMA and weight math are minor.
"""

from __future__ import annotations

import functools
import os
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
# bulk-pass window for the always-exact two-pass scheme: with 8/128-aligned
# per-tile bases this covers local flow variation of ≤8 px vertically and
# ≤128 px horizontally within one (8, 128) tile — virtually all real flows
K0_WIN = (24, 384)
# NOTE: a third crossbar-free "x-fast" tier (static-lane taps off a
# lane-rolled window, CFI_WARP_XFAST, round 4) was deleted in round 5: the
# composed A/B measured no RIFE gain (28.38 vs 28.40) and a 13 % FILM
# regression, and its TPU exactness was never verified. The take_along_axis
# crossbar below is not the bottleneck on real (locally smooth) flows.


def _warp_kernel_diag_roll(
    ymin_ref, by_ref, bx_ref, fast_ref,  # scalar-prefetched [T]
    fx_ref, fy_ref, img_ref, out_ref, win_ref, sem,
    *, h: int, w: int, win_h: int, win_w: int, c: int,
    grid_hw: Tuple[int, int], zeros: bool = False
):
    """Diagonal kernel with a dynamic sublane ROLL of the window that cancels
    the 8-row base alignment loss: the rolled window's row r holds source row
    ``ymin + r``, so the diagonal loop spans only ``variation + 2`` values
    (static bound ``win_h - 15``) instead of ``variation + alignment + 2``.
    The worst-case wrap check: s + d + 8 <= win_h holds for every alignment
    s in [0, 7] exactly when the fit bound dymax - dymin <= win_h - 16 does.

    Tiles whose floor-flow span is ZERO (``fast_ref``: per-tile constant
    integer displacement — the common case for smooth real flows, and ~every
    tile of FILM/RIFE mid-flows) take a predicated FAST body: only diagonals
    d in {0, 1} carry weight and the roll touches just the first 16 window
    rows (s + d + 7 <= 15), cutting the per-channel vreg work ~3x. The fast
    body's arithmetic is an exact subset of the full body's, so results are
    bit-identical either way."""
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
    miota = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    ys = (miota + hi * TILE_H).astype(jnp.float32)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + wi * TILE_W
    ).astype(jnp.float32)
    if zeros:
        sx = xs + fx
        sy = ys + fy
        finite = jnp.isfinite(sx) & jnp.isfinite(sy)
        sx = jnp.where(finite, sx, -4.0 * w)
        sy = jnp.where(finite, sy, -4.0 * h)
        sx = jnp.clip(sx, -2.0 * w, 2.0 * w)
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
        wy0m = jnp.where(vy0, 1.0 - wy1, 0.0)
        wy1m = jnp.where(vy1, wy1, 0.0)
    else:
        wy0m = 1.0 - wy1
        wy1m = wy1
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    ymin = ymin_ref[t]
    by = pl.multiple_of(by_ref[t], TILE_H)
    bx = pl.multiple_of(bx_ref[t], TILE_W)
    # deviation relative to the tile's exact min source row
    dy0 = jnp.clip(y0i - miota - ymin, -1, win_h)
    lx0 = jnp.clip(x0i - bx, -1, win_w)
    lx1 = jnp.clip(x0i + 1 - bx, -1, win_w)

    start_dma(t, t % 2).wait()
    slot = t % 2
    n_chunks = win_w // TILE_W

    tap_meta = []
    for lx, wxm in ((lx0, wx0), (lx1, wx1)):
        metas = []
        for ci in range(n_chunks):
            base = ci * TILE_W
            in_chunk = (lx >= base) & (lx < base + TILE_W)
            local = jnp.clip(lx - base, 0, TILE_W - 1)
            metas.append((local, jnp.where(in_chunk, wxm, 0.0)))
        tap_meta.append(metas)

    # roll so rolled row r = source row ymin + r (dynamic positive shift;
    # Mosaic's negative dynamic shifts are miscompiled — measured off-by-8)
    s = ymin - by

    def compute(rows: int, ndiag: int):
        # rolled window slice [0:rows]: rolled[r] = win[r + s] for
        # r + s < rows (no wrap for r <= ndiag-1+7, s <= 7 when
        # ndiag + 14 <= rows, which both instantiations satisfy)
        shift = jnp.where(s == 0, 0, rows - s)
        rolled = [
            pltpu.roll(
                win_ref[slot, ch, 0:rows][...].astype(jnp.float32), shift, 0
            )
            for ch in range(c)
        ]
        accs = [jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(c)]
        for d in range(ndiag):
            wd = (
                jnp.where(dy0 == d, wy0m, 0.0)
                + jnp.where(dy0 == d - 1, wy1m, 0.0)
            )
            for ci in range(n_chunks):
                l0, w0c = tap_meta[0][ci]
                l1, w1c = tap_meta[1][ci]
                wd0 = wd * w0c
                wd1 = wd * w1c
                for ch in range(c):
                    blk = rolled[ch][
                        d : d + TILE_H, ci * TILE_W : (ci + 1) * TILE_W
                    ]
                    v0 = jnp.take_along_axis(blk, l0, axis=1)
                    v1 = jnp.take_along_axis(blk, l1, axis=1)
                    accs[ch] = accs[ch] + wd0 * v0 + wd1 * v1
        for ch in range(c):
            out_ref[0, ch] = accs[ch].astype(out_ref.dtype)

    fast = fast_ref[t]

    @pl.when(fast != 0)
    def _():
        compute(2 * TILE_H, 2)

    @pl.when(fast == 0)
    def _():
        compute(win_h, win_h - TILE_H - 7 + 1)


@functools.partial(
    jax.jit, static_argnames=("win_h", "win_w", "zeros", "frame_hw")
)
def warp_pallas_planes_v2(
    planes: Array,  # [B, C, H, W]
    fx: Array,
    fy: Array,
    bases: Tuple[Array, ...],  # (ymin, by, bx, fast)
    win_h: int = DEF_WIN_H,
    win_w: int = DEF_WIN_W,
    zeros: bool = False,
    frame_hw: Optional[Tuple[int, int]] = None,
) -> Array:
    """Bulk pass: the rolled diagonal kernel over every tile, with per-tile
    window bases from :func:`_diag_bases_fits` (garbage on non-fitting tiles —
    the patch pass rewrites those)."""
    b, c, h, w = planes.shape
    # true frame bounds for clamping/validity (the array may be padded)
    hb, wb = frame_hw or (h, w)
    assert h % TILE_H == 0 and w % TILE_W == 0, (h, w)
    win_h = min(win_h, h)
    win_w = min(win_w, w)
    gh, gw = h // TILE_H, w // TILE_W

    assert len(bases) == 4
    prefetch = tuple(bases)
    kernel = functools.partial(
        _warp_kernel_diag_roll,
        h=hb, w=wb, win_h=win_h, win_w=win_w, c=c,
        grid_hw=(gh, gw), zeros=zeros,
    )
    flow_spec = pl.BlockSpec(
        (1, TILE_H, TILE_W), lambda bi, hi, wi, *_: (bi, hi, wi),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(b, gh, gw),
        in_specs=[
            flow_spec,
            flow_spec,
            pl.BlockSpec(memory_space=pl.ANY),
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
    )(*prefetch, fx, fy, planes)



# Note: a channel-packed bf16 variant (two bf16 channels per int32 lane, one
# crossbar gathering both) was measured at 11.1-11.2 ms/1080p-warp vs
# 9.2-10.9 ms for the plain kernel fed bf16 windows: at bf16 the kernel is
# bandwidth/ALU-bound, not crossbar-bound, so the packing's unpack ALU cost
# exceeded the crossbar savings and the variant was dropped.


def _warp_kernel_rows_mxu(
    ymin_ref, by_ref, bx_ref, fast_ref,  # scalar-prefetched [T]
    fx_ref, fy_ref, img_ref, out_ref, win_ref, sem,
    *, h: int, w: int, win_h: int, win_w: int, c: int,
    grid_hw: Tuple[int, int], zeros: bool = False
):
    """MXU bulk kernel on a rows-major ``[B, H, C, W]`` image layout.

    The VPU-bound part of the diagonal kernel is the per-(diagonal, chunk,
    channel) 128-lane crossbar (``take_along_axis``): its cost scales with
    ``ndiag * (win_w/128) * C``. This kernel replaces every crossbar with an
    exact one-hot matmul shared across channels: for output row ``r`` the two
    x-tap selection matrices ``G0/G1 [win_w, 128]`` (pure 0/1 in the image
    dtype — selection of a bf16 value times 1.0 accumulated over zeros in
    f32 is EXACT, so bit-identical results) are built once, and each
    diagonal contributes two ``[C, win_w] @ [win_w, 128]`` MXU contractions.
    Per-tile work becomes ``8 * 2`` G-builds (C-independent) plus
    ``8 * ndiag * 2`` matmuls, instead of ``ndiag * 3 * C`` crossbars.

    The rows-major layout makes H an UNTILED dim, so the window DMA base
    needs no 8-row alignment: ``by == ymin`` exactly, the source-row select
    ``win[r + d]`` is fully STATIC (no roll, no dynamic sublane addressing —
    both of which Mosaic miscompiles), and the fit bound improves to
    ``dymax - dymin <= win_h - TILE_H - 1`` (vs ``win_h - 16`` for the
    aligned diagonal kernel).

    Weight math, masks, and accumulation order are copied verbatim from the
    diagonal kernel, so results are bit-identical to it (and to
    ``ops.warp.warp_xla`` — asserted at atol=0 in tests/test_pallas_kernels).
    """
    gh, gw = grid_hw
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    wi = pl.program_id(2)
    t = (bi * gh + hi) * gw + wi
    n_tiles = pl.num_programs(0) * gh * gw

    def start_dma(tile_idx, slot):
        b_k = tile_idx // (gh * gw)
        by_ = by_ref[tile_idx]  # unaligned: H is untiled in this layout
        bx_ = pl.multiple_of(bx_ref[tile_idx], TILE_W)
        return pltpu.make_async_copy(
            img_ref.at[b_k, pl.ds(by_, win_h), :, pl.ds(bx_, win_w)],
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
    miota = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    ys = (miota + hi * TILE_H).astype(jnp.float32)
    xs = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) + wi * TILE_W
    ).astype(jnp.float32)
    if zeros:
        sx = xs + fx
        sy = ys + fy
        finite = jnp.isfinite(sx) & jnp.isfinite(sy)
        sx = jnp.where(finite, sx, -4.0 * w)
        sy = jnp.where(finite, sy, -4.0 * h)
        sx = jnp.clip(sx, -2.0 * w, 2.0 * w)
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
        wy0m = jnp.where(vy0, 1.0 - wy1, 0.0)
        wy1m = jnp.where(vy1, wy1, 0.0)
    else:
        wy0m = 1.0 - wy1
        wy1m = wy1
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    del ymin_ref  # by == ymin on this path
    by = by_ref[t]
    bx = pl.multiple_of(bx_ref[t], TILE_W)
    dy0 = jnp.clip(y0i - miota - by, -1, win_h)
    lx0 = jnp.clip(x0i - bx, -1, win_w)
    lx1 = jnp.clip(x0i + 1 - bx, -1, win_w)

    start_dma(t, t % 2).wait()
    slot = t % 2

    wdt = win_ref.dtype
    # both x-taps share one [win_w, 256] one-hot: lanes [0,128) select lx0,
    # lanes [128,256) select lx1 — built with a single compare
    iota_j2 = jax.lax.broadcasted_iota(jnp.int32, (win_w, 2 * TILE_W), 0)

    def compute(nvals: int):
        """Iterate the floor-y-deviation VALUES ``dv`` (one bilinear y-tap
        PAIR per value — rows ``r+dv`` and ``r+dv+1``): both y-taps load as
        one contiguous ``[2, C, win_w]`` slice reshaped to ``[2C, win_w]``,
        and both x-taps ride the shared one-hot, so each (row, dv) is a
        single ``[2C, win_w] @ [win_w, 256]`` MXU contraction. Per pixel the
        four tap products accumulate in the same (y0x0, y0x1, y1x0, y1x1)
        order as the diagonal kernel and ``warp_xla`` — bit-exact."""
        for r in range(TILE_H):
            lx01 = jnp.concatenate(
                [lx0[r : r + 1, :], lx1[r : r + 1, :]], axis=1
            )
            lx01r = jax.lax.broadcast_in_dim(
                lx01, (win_w, 2 * TILE_W), (0, 1)
            )
            # build in f32 (native (8,128) mask layout), cast to the matmul
            # dtype: 1.0/0.0 are exact in bf16, and Mosaic rejects the direct
            # i1 select at (16,128) packing
            g = jnp.where(iota_j2 == lx01r, 1.0, 0.0).astype(wdt)
            dy0r = dy0[r : r + 1, :]
            wy0r = wy0m[r : r + 1, :]
            wy1r = wy1m[r : r + 1, :]
            wx0r = wx0[r : r + 1, :]
            wx1r = wx1[r : r + 1, :]
            acc = jnp.zeros((c, TILE_W), jnp.float32)
            for dv in range(nvals):
                sely0 = jnp.where(dy0r == dv, wy0r, 0.0)
                sely1 = jnp.where(dy0r == dv, wy1r, 0.0)
                pair = win_ref[slot, r + dv : r + dv + 2]  # [2, C, win_w]
                m = jax.lax.dot_general(
                    pair.reshape(2 * c, win_w), g, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [2C, 256]: [tap y, tap x] quadrants
                acc = (
                    acc
                    + (sely0 * wx0r) * m[:c, :TILE_W]
                    + (sely0 * wx1r) * m[:c, TILE_W:]
                    + (sely1 * wx0r) * m[c:, :TILE_W]
                    + (sely1 * wx1r) * m[c:, TILE_W:]
                )
            out_ref[0, r] = acc.astype(out_ref.dtype)

    fast = fast_ref[t] != 0

    @pl.when(fast)
    def _():
        compute(1)

    @pl.when(jnp.logical_not(fast))
    def _():
        compute(win_h - TILE_H)


@functools.partial(
    jax.jit, static_argnames=("win_h", "win_w", "zeros", "frame_hw")
)
def warp_pallas_rows_v3(
    rows: Array,  # [B, H, C, W]
    fx: Array,
    fy: Array,
    bases: Tuple[Array, Array, Array, Array],  # (ymin, by, bx, fast)
    win_h: int = DEF_WIN_H,
    win_w: int = DEF_WIN_W,
    zeros: bool = False,
    frame_hw: Optional[Tuple[int, int]] = None,
) -> Array:
    """Bulk pass of the MXU rows-layout kernel (garbage on non-fitting tiles —
    the patch pass rewrites those)."""
    b, h, c, w = rows.shape
    hb, wb = frame_hw or (h, w)
    assert h % TILE_H == 0 and w % TILE_W == 0, (h, w)
    win_h = min(win_h, h)
    win_w = min(win_w, w)
    gh, gw = h // TILE_H, w // TILE_W

    assert len(bases) == 4
    prefetch = tuple(bases)
    kernel = functools.partial(
        _warp_kernel_rows_mxu,
        h=hb, w=wb, win_h=win_h, win_w=win_w, c=c,
        grid_hw=(gh, gw), zeros=zeros,
    )
    flow_spec = pl.BlockSpec(
        (1, TILE_H, TILE_W), lambda bi, hi, wi, *_: (bi, hi, wi),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(b, gh, gw),
        in_specs=[
            flow_spec,
            flow_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_H, c, TILE_W), lambda bi, hi, wi, *_: (bi, hi, 0, wi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win_h, c, win_w), rows.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, c, w), rows.dtype),
    )(*prefetch, fx, fy, rows)


# ---------------------------------------------------------------------------
# Tiered exact dispatch: pick the cheapest window that covers every tile
# ---------------------------------------------------------------------------


def _tile_spans(fx, fy, h, w, hb, wb):
    """Per-(8,128)-tile source-coordinate spans, computed from the FLOW alone.

    For integer pixel coordinates ``floor(row + f) == row + floor(f)``, so the
    per-tile displacement spans are just tile min/max of ``floor(flow)`` — one
    cheap fused reduction over the flow instead of materializing full-res
    source-index maps (which cost ~5 ms/call at 1080p batch 16). Frame-edge
    clamping breaks the identity, so any tile whose UNCLIPPED span touches the
    frame boundary is flagged via the ``edge`` output (conservative superset);
    the dispatcher sends those to the exact patch pass — which is where
    clamped regions land anyway (their deviation turns negative). Non-finite
    flows contribute nothing on every path and are span-neutral (0) here.

    Returns (ymin, ymax, xmin, xmax, dymin, dymax, edge, dxmin, dxspan,
    xfree): absolute row/col spans clipped to the frame (for the patch pass's
    slab range), raw displacement spans (for diagonal bases/fits), the edge
    flag, plus the raw x displacement min/span and a "no horizontal clipping
    anywhere in the tile, +1 taps included" flag (for the x-fast body) — all
    [B, gh, gw]."""
    b = fx.shape[0]
    gh, gw = h // TILE_H, w // TILE_W
    lim = 4.0 * max(hb, wb)
    fxs = fx.astype(jnp.float32)
    fys = fy.astype(jnp.float32)
    finite = jnp.isfinite(fxs) & jnp.isfinite(fys)
    fxs = jnp.clip(jnp.where(finite, fxs, 0.0), -lim, lim)
    fys = jnp.clip(jnp.where(finite, fys, 0.0), -lim, lim)
    # reduce the minor (lane) axis first, then the sublane groups — lowers to
    # contiguous vector reductions instead of a strided two-axis reduce
    def tile_minmax(d):
        d = d.reshape(b, h, gw, TILE_W)
        dmin = jnp.min(d, axis=-1).reshape(b, gh, TILE_H, gw)
        dmax = jnp.max(d, axis=-1).reshape(b, gh, TILE_H, gw)
        return jnp.min(dmin, axis=2), jnp.max(dmax, axis=2)

    dxmin, dxmax = tile_minmax(jnp.floor(fxs).astype(jnp.int32))
    dymin, dymax = tile_minmax(jnp.floor(fys).astype(jnp.int32))
    row0 = (jnp.arange(gh, dtype=jnp.int32) * TILE_H)[None, :, None]
    col0 = (jnp.arange(gw, dtype=jnp.int32) * TILE_W)[None, None, :]
    y_lo = row0 + dymin
    y_hi0 = row0 + TILE_H - 1 + dymax  # max tap0 row
    x_lo = col0 + dxmin
    x_hi0 = col0 + TILE_W - 1 + dxmax
    # Only VERTICAL out-of-frame taps break the diagonal kernel's indexing
    # (border clamping yields constant y0 = deviation -m, unreachable by the
    # d:d+8 slices; zeros-mode negative deviation likewise). Horizontal
    # clipping is harmless — the x gather takes arbitrary per-lane indices and
    # the clipped x spans below are exact by monotonicity of clip. The +1 taps
    # carry zero weight at the boundary and never break the identity. Tiles
    # entirely inside the caller's bottom padding are cropped away — never
    # flag them.
    edge = ((y_lo < 0) | (y_hi0 > hb - 1)) & (row0 <= hb - 1)
    # no x clipping can engage anywhere in the tile: min unclipped floor >= 0
    # means min sx >= 0, and max floor <= wb-2 means max sx < wb-1, so the +1
    # taps are in-frame too (x_hi0 + 1 <= wb - 1)
    xfree = (x_lo >= 0) & (x_hi0 + 1 <= wb - 1)
    return (
        jnp.clip(y_lo, 0, hb - 1), jnp.clip(y_hi0 + 1, 0, hb - 1),
        jnp.clip(x_lo, 0, wb - 1), jnp.clip(x_hi0 + 1, 0, wb - 1),
        dymin, dymax, edge, dxmin, dxmax - dxmin, xfree,
    )



def _diag_bases_fits(spans, wh, ww, h, w, hb, wb):
    """Bases + fit flags for the rolled diagonal-form bulk kernel.

    Bases are absolute (align8 of the tile's min source row), so any constant
    offset AND interior negative deviation (vertical shrink) are absorbed;
    the kernel rolls its window by ``ymin - by`` so the diagonal loop only
    spans the flow VARIATION: a tile fits when ``dymax - dymin <= wh - 16``
    (the roll wrap bound for every alignment phase), its x span sits in the
    window, and it doesn't touch frame clipping (edge tiles break the
    floor(row+f)=row+floor(f) identity — the patch pass owns them). Callers
    pad the planes by wh-8 extra bottom rows so ``by`` is never clipped down
    for real tiles. Returns (ymin, by, bx, fits, fast, kx), flattened."""
    ymin, ymax, xmin, xmax, dymin, dymax, edge, dxmin, dxspan, xfree = spans
    wh = min(wh, h)
    ww = min(ww, w)
    by = jnp.clip((ymin // TILE_H) * TILE_H, 0, max(h - wh, 0))
    bx = jnp.clip((xmin // TILE_W) * TILE_W, 0, max(w - ww, 0))
    fits = (
        jnp.logical_not(edge)
        & (ymin - by >= 0)
        & (ymin - by <= TILE_H - 1)
        & (dymax - dymin <= wh - 2 * TILE_H)
        & (xmax - bx <= ww - 1)
    )
    # fast tier (see _warp_kernel_diag_roll): vertical span 0 (cheap
    # 2-diagonal body) — the common case for smooth real flows.
    fast = (fits & (dymax == dymin)).astype(jnp.int32)
    ymin_b = jnp.broadcast_to(ymin, fits.shape)
    return (
        ymin_b.reshape(-1), by.reshape(-1), bx.reshape(-1), fits.reshape(-1),
        fast.reshape(-1),
    )


def _rows_bases_fits(spans, wh, ww, h, w):
    """Bases + fit flags for the rows-layout MXU kernel.

    H is untiled in the ``[B, H, C, W]`` layout, so ``by == ymin`` exactly
    (no 8-row alignment, no roll): a tile fits when its window is in-array
    (callers pad the bottom by ``wh`` rows so ymin is never clipped down),
    the variation fits ``wh - TILE_H - 1`` (kernel touches rows
    ``r + d <= wh - 1``), and the x span sits in the 128-aligned window.
    Returns (ymin, by, bx, fits, fast), flattened — ymin kept for signature
    parity with the diagonal kernel's bases (the patch pass uses it)."""
    ymin, ymax, xmin, xmax, dymin, dymax, edge = spans[:7]
    wh = min(wh, h)
    ww = min(ww, w)
    by = jnp.clip(ymin, 0, max(h - wh, 0))
    bx = jnp.clip((xmin // TILE_W) * TILE_W, 0, max(w - ww, 0))
    fits = (
        jnp.logical_not(edge)
        & (by == ymin)
        & (dymax - dymin <= wh - TILE_H - 1)
        & (xmax - bx <= ww - 1)
    )
    fast = (fits & (dymax == dymin)).astype(jnp.int32)
    ymin_b = jnp.broadcast_to(ymin, fits.shape)
    return (
        ymin_b.reshape(-1), by.reshape(-1), bx.reshape(-1), fits.reshape(-1),
        fast.reshape(-1),
    )


def _patch_kernel(
    bad_ref, ymin_ref, ymax_ref,  # scalar-prefetch [T]
    fx_ref, fy_ref,  # VMEM flow tiles [1, 8, 128]
    img_ref,  # ANY planes [B, C, H, W]
    prev_ref,  # ANY planes [B, C, H, W], aliased to the output
    out_ref,  # ANY planes [B, C, H, W]
    slab_ref,  # VMEM [C, 8, W]
    stage_ref,  # VMEM [C, 8, 128]
    sem_in, sem_out,
    *, h: int, w: int, hb: int, wb: int, c: int,
    grid_hw: Tuple[int, int], zeros: bool,
):
    """In-place exact patch for tiles whose source span overflowed the bulk
    pass's window: recompute with a dynamic loop over aligned 8-row source
    slabs spanning the FULL width — exact for arbitrary flows (any vertical
    span, any horizontal displacement), no fallback needed. Good tiles are
    untouched (the output aliases the bulk result); the kernel body is fully
    predicated on the per-tile flag. The grid is one instance per (image,
    8-row band) — not per tile — so the all-good case costs only a cheap
    sweep of scalar flag checks."""
    gh, gw = grid_hw
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    del prev_ref  # only present for the in-place aliasing

    # dynamic loop over the row band's w-tiles: a Python unroll would inline
    # gw copies of the (already large) slab body and explode Mosaic compile
    # time at wide C (observed: FILM's c=36 chunks never finished compiling)
    def body(wi, _):
        _patch_tile(
            bad_ref, ymin_ref, ymax_ref, fx_ref, fy_ref, img_ref, out_ref,
            slab_ref, stage_ref, sem_in, sem_out,
            bi=bi, hi=hi, wi=wi, gh=gh, gw=gw, h=h, w=w, hb=hb, wb=wb, c=c,
            zeros=zeros,
        )
        return 0

    jax.lax.fori_loop(0, gw, body, 0)


def _patch_tile(
    bad_ref, ymin_ref, ymax_ref, fx_ref, fy_ref, img_ref, out_ref,
    slab_ref, stage_ref, sem_in, sem_out,
    *, bi, hi, wi, gh, gw, h, w, hb, wb, c, zeros,
):
    t = (bi * gh + hi) * gw + wi
    wx0_off = pl.multiple_of(wi * TILE_W, TILE_W)

    @pl.when(bad_ref[t] != 0)
    def _():
        fx = fx_ref[0, :, pl.ds(wx0_off, TILE_W)].astype(jnp.float32)
        fy = fy_ref[0, :, pl.ds(wx0_off, TILE_W)].astype(jnp.float32)
        ys = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
            + hi * TILE_H
        ).astype(jnp.float32)
        xs = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
            + wi * TILE_W
        ).astype(jnp.float32)
        if zeros:
            sx = xs + fx
            sy = ys + fy
            finite = jnp.isfinite(sx) & jnp.isfinite(sy)
            sx = jnp.where(finite, sx, -4.0 * wb)
            sy = jnp.where(finite, sy, -4.0 * hb)
            sx = jnp.clip(sx, -2.0 * wb, 2.0 * wb)
            sy = jnp.clip(sy, -2.0 * hb, 2.0 * hb)
        else:
            sx = jnp.clip(xs + fx, 0.0, wb - 1.0)
            sy = jnp.clip(ys + fy, 0.0, hb - 1.0)
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        wx1 = sx - x0
        wy1 = sy - y0
        wx0 = 1.0 - wx1
        if zeros:
            vx0 = (x0 >= 0.0) & (x0 <= wb - 1.0)
            vx1 = (x0 + 1.0 >= 0.0) & (x0 + 1.0 <= wb - 1.0)
            vy0 = (y0 >= 0.0) & (y0 <= hb - 1.0)
            vy1 = (y0 + 1.0 >= 0.0) & (y0 + 1.0 <= hb - 1.0)
            wx0 = jnp.where(vx0, wx0, 0.0)
            wx1 = jnp.where(vx1, wx1, 0.0)
            wy0m = jnp.where(vy0, 1.0 - wy1, 0.0)
            wy1m = jnp.where(vy1, wy1, 0.0)
        else:
            wy0m = 1.0 - wy1
            wy1m = wy1
        # absolute tap indices, clamped into the frame (zero weight beyond)
        ly0 = jnp.clip(y0.astype(jnp.int32), 0, hb - 1)
        ly1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, hb - 1)
        n_chunks = w // TILE_W
        tap_meta = []
        for lx_f in (x0, x0 + 1.0):
            lx = jnp.clip(lx_f.astype(jnp.int32), 0, wb - 1)
            metas = []
            for ci in range(n_chunks):
                base = ci * TILE_W
                in_chunk = (lx >= base) & (lx < base + TILE_W)
                local = jnp.clip(lx - base, 0, TILE_W - 1)
                metas.append((local, in_chunk))
            tap_meta.append(metas)

        g0 = ymin_ref[t] // TILE_H
        g1 = ymax_ref[t] // TILE_H  # spans are tap-inclusive, frame-clipped

        def body(g, accs):
            base_r = pl.multiple_of(g * TILE_H, TILE_H)
            copy = pltpu.make_async_copy(
                img_ref.at[bi, :, pl.ds(base_r, TILE_H), :], slab_ref, sem_in
            )
            copy.start()
            copy.wait()
            accs = list(accs)
            for dr in range(TILE_H):
                r = base_r + dr
                wrow = (
                    jnp.where(ly0 == r, wy0m, 0.0)
                    + jnp.where(ly1 == r, wy1m, 0.0)
                )
                wr0 = wrow * wx0
                wr1 = wrow * wx1
                for ch in range(c):
                    chunks = [
                        jnp.broadcast_to(
                            slab_ref[ch, dr : dr + 1,
                                     ci * TILE_W : (ci + 1) * TILE_W],
                            (TILE_H, TILE_W),
                        ).astype(jnp.float32)
                        for ci in range(n_chunks)
                    ]
                    vals = []
                    for metas in tap_meta:
                        v = jnp.zeros((TILE_H, TILE_W), jnp.float32)
                        for ci, (local, in_chunk) in enumerate(metas):
                            g_ = jnp.take_along_axis(chunks[ci], local, axis=1)
                            v = jnp.where(in_chunk, g_, v)
                        vals.append(v)
                    accs[ch] = accs[ch] + wr0 * vals[0] + wr1 * vals[1]
            return tuple(accs)

        accs = tuple(
            jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(c)
        )
        accs = jax.lax.fori_loop(g0, g1 + 1, body, accs)
        for ch in range(c):
            stage_ref[ch] = accs[ch].astype(stage_ref.dtype)
        out = pltpu.make_async_copy(
            stage_ref,
            out_ref.at[
                bi, :, pl.ds(hi * TILE_H, TILE_H), pl.ds(wx0_off, TILE_W)
            ],
            sem_out,
        )
        out.start()
        out.wait()


def _run_patch(planes_prev, img_planes, fx, fy, bad, ymin, ymax, hb, wb, zeros):
    b, c, h, w = img_planes.shape
    gh, gw = h // TILE_H, w // TILE_W
    kernel = functools.partial(
        _patch_kernel, h=h, w=w, hb=hb, wb=wb, c=c, grid_hw=(gh, gw),
        zeros=zeros,
    )
    flow_spec = pl.BlockSpec(
        (1, TILE_H, w), lambda bi, hi, *_: (bi, hi, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, gh),
        in_specs=[
            flow_spec,
            flow_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((c, TILE_H, w), img_planes.dtype),
            pltpu.VMEM((c, TILE_H, TILE_W), planes_prev.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(planes_prev.shape, planes_prev.dtype),
        input_output_aliases={6: 0},  # prev (operand 6 incl. prefetch) -> out
    )(bad, ymin, ymax, fx, fy, img_planes, planes_prev)


@functools.partial(jax.jit, static_argnames=("zeros", "frame_hw", "mxu"))
def warp_pallas_nhwc_tiered(
    img: Array,  # [B, H, W, C], H % 8 == 0, W % 128 == 0
    fx: Array,
    fy: Array,
    zeros: bool = False,
    frame_hw: Optional[Tuple[int, int]] = None,
    mxu: bool = False,
) -> Array:
    """Always-exact warp with NO data-dependent control flow: a bulk pass over
    every tile with the (24, 384) window (covers ≤8 px vertical / ≤128 px
    horizontal local flow variation per (8, 128) tile — virtually all real
    content), then an in-place patch kernel that exactly recomputes the rare
    overflowing tiles with a dynamic full-width slab loop (exact for ANY
    flow). Both passes always run; the patch is per-tile predicated, so its
    cost is proportional to the number of overflowing tiles.

    An earlier design selected window tiers with ``lax.cond``; XLA's layout
    assignment pushed the NHWC↔planes transposes through the cond boundary as
    a channel-minor tiled layout (C padded to 128 lanes — 18-42x padded
    multi-GB boundary copies at C=7, OOMing a 16 GB chip). Avoiding conds
    avoids the entire failure class and the XLA-gather fallback with it.
    """
    b, h, w, c = img.shape
    hb, wb = frame_hw or (h, w)
    spans = _tile_spans(fx, fy, h, w, hb, wb)
    wh, ww = K0_WIN
    if mxu:
        tymin, by, bx, fits, tfast = _rows_bases_fits(spans, wh, ww, h, w)
    else:
        tymin, by, bx, fits, tfast = _diag_bases_fits(
            spans, wh, ww, h, w, hb, wb
        )
    planes = img.transpose(0, 3, 1, 2)
    ymin, ymax = spans[0].reshape(-1), spans[1].reshape(-1)
    bad = jnp.logical_not(fits).astype(jnp.int32)

    # both kernels fully unroll the channel loop; chunk wide features. Caps
    # are VMEM-budget-tuned for 2-byte dtypes; 4-byte dtypes double the window
    # scratch and the patch pass's slab/temporaries, so halve the fold width
    # (f32 FILM's 36-channel fold at 540p overflowed scoped VMEM by 1.5 MB).
    # mxu path: cap must be a multiple of 8 (C rides the window sublane dim)
    cap = 24 if zeros else (32 if mxu else 36)
    if jnp.dtype(img.dtype).itemsize >= 4:
        cap //= 2
        if mxu:
            cap = max(8, cap // 8 * 8)

    def one_chunk(planes_c):
        # bulk pass (garbage on non-fitting tiles) + in-place exact patch
        if mxu:
            # rows-major layout for the MXU kernel; the patch pass stays on
            # the planes layout (rare tiles — not worth a second kernel).
            # C rides the window's sublane dim, so pad it to a multiple of 8
            # (Mosaic rejects unaligned sublane slices).
            cc = planes_c.shape[1]
            c8 = -(-cc // 8) * 8
            rows_c = planes_c.transpose(0, 2, 1, 3)
            if c8 != cc:
                rows_c = jnp.pad(
                    rows_c, ((0, 0), (0, 0), (0, c8 - cc), (0, 0))
                )
            bulk = warp_pallas_rows_v3(
                rows_c, fx, fy, win_h=wh, win_w=ww, zeros=zeros,
                frame_hw=(hb, wb), bases=(tymin, by, bx, tfast),
            ).transpose(0, 2, 1, 3)[:, :cc]
        else:
            bulk = warp_pallas_planes_v2(
                planes_c, fx, fy, win_h=wh, win_w=ww, zeros=zeros,
                frame_hw=(hb, wb), bases=(tymin, by, bx, tfast),
            )
        return _run_patch(
            bulk, planes_c, fx, fy, bad, ymin, ymax, hb, wb, zeros
        )

    if c <= cap:
        out = one_chunk(planes)
    else:
        # wide features: FOLD equal zero-padded channel chunks into the batch
        # axis — one kernel-pair launch total (the [B, n, cap, H, W] reshape
        # is free: chunks are contiguous in C), instead of one launch + layout
        # copies per chunk. FILM's 960-channel coarse-feature warps ran 144
        # chunk calls per forward otherwise. Flow/base arrays repeat per
        # chunk; per-tile flags repeat to match the folded tile order.
        n_ch = -(-c // cap)
        c_pad = n_ch * cap
        if c_pad != c:
            planes = jnp.pad(planes, ((0, 0), (0, c_pad - c), (0, 0), (0, 0)))
        planes_f = planes.reshape(b * n_ch, cap, h, w)
        rep = lambda a: jnp.repeat(a, n_ch, axis=0)  # noqa: E731
        fx_f = rep(fx)
        fy_f = rep(fy)
        rep_t = lambda a: jnp.repeat(  # noqa: E731
            a.reshape(b, -1), n_ch, axis=0
        ).reshape(-1)
        fold_bases = (rep_t(tymin), rep_t(by), rep_t(bx), rep_t(tfast))
        if mxu:
            # cap is a multiple of 8 on this path, so no sublane padding
            bulk = warp_pallas_rows_v3(
                planes_f.transpose(0, 2, 1, 3), fx_f, fy_f, win_h=wh,
                win_w=ww, zeros=zeros, frame_hw=(hb, wb), bases=fold_bases,
            ).transpose(0, 2, 1, 3)
        else:
            bulk = warp_pallas_planes_v2(
                planes_f, fx_f, fy_f, win_h=wh, win_w=ww, zeros=zeros,
                frame_hw=(hb, wb), bases=fold_bases,
            )
        out = _run_patch(
            bulk, planes_f, fx_f, fy_f, rep_t(bad), rep_t(ymin), rep_t(ymax),
            hb, wb, zeros,
        )
        out = out.reshape(b, c_pad, h, w)[:, :c]
    return out.transpose(0, 2, 3, 1)


def warp_pallas_tiered(
    img: Array, flow: Array, zeros: bool = False, prefer_mxu: bool = False
) -> Array:
    """NHWC warp (border or zeros padding), always exact vs ``warp_xla``.

    Dispatch between the two bulk kernels: the MXU rows-layout kernel
    (``_warp_kernel_rows_mxu``) amortizes its per-tile one-hot builds over
    all channels of a chunk, so it targets WIDE bf16 features; f32 stays on
    the lane-crossbar diagonal kernel regardless (its MXU matmul is a bf16x3
    decomposition — not bit-exact).

    ``CFI_WARP_MXU``: unset (default) honors the caller's ``prefer_mxu``
    flag (models opt WIDE-channel warps in per call — e.g. FILM's in-flow
    C=64..256 feature warps); ``0`` forces the diag kernel everywhere;
    ``auto`` uses rows for bf16 c>=5; ``force`` always (kernel A/B).

    Measured history (v5e): the r4 `warpshapes` A/B — which drives SYNTHETIC
    rough flows — showed rows winning every bf16 c>=5 shape (c7: 171 vs 219
    ms; c64 1080p: 416 vs 995), and flipping the default to `auto` on that
    data collapsed the real RIFE headline 28.4 -> 12.5 f/s. Root cause: the
    diagonal kernel's cost scales with per-tile flow VARIATION (diagonals
    touched), so synthetic rough flows are its worst case, while the rows
    kernel's one-hot-matmul cost is flow-independent. Real model flows are
    locally smooth — diag wins there by >2x. The rows kernel stays for A/B
    and as the escape hatch for genuinely rough-flow workloads; `warpshapes`
    numbers must not be read as real-flow rankings."""
    env = os.environ.get("CFI_WARP_MXU", "")
    b, h, w, c = img.shape
    if env == "0":
        mxu = False
    elif env == "force":
        mxu = True
    elif env in ("auto", "1"):
        mxu = c >= 5 and jnp.dtype(img.dtype).itemsize <= 2
    else:  # unset: per-call opt-in (rows kernel needs multi-byte-packed C)
        mxu = prefer_mxu and jnp.dtype(img.dtype).itemsize <= 2
    # pad the bottom by the bulk kernel's diagonal reach so window bases for
    # the last tile rows are never clipped (see _diag_bases_fits /
    # _rows_bases_fits — the unaligned rows path needs the full win_h); edge
    # replicate keeps border-clamp semantics identical
    ph = (-h % TILE_H) + (K0_WIN[0] if mxu else K0_WIN[0] - TILE_H)
    pw = -w % TILE_W
    if ph or pw or w < TILE_W:
        pw = max(pw, TILE_W - w)
        img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        flow = jnp.pad(flow, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    out = warp_pallas_nhwc_tiered(
        img, flow[..., 0], flow[..., 1], zeros=zeros, frame_hw=(h, w),
        mxu=mxu,
    )
    return out[:, :h, :w, :]
