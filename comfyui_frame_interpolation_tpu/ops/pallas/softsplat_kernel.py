"""Forward-splat (softsplat) Pallas kernel for TPU.

The reference op is a CUDA ``atomicAdd`` scatter (``cupy_ops/softsplat.py:
140-192``): every source pixel adds its value into the 4 bilinear neighbors of
``(x + flow_x, y + flow_y)``. XLA lowers the equivalent ``scatter-add`` to a
serial loop on TPU (~475 ms for one 1080p 3-channel splat) — two orders of
magnitude off the roofline.

This kernel inverts the scatter into per-output-tile *gathers expressed as
matmuls*: for each (8, 128) output tile it DMAs a fixed window of the source
(values + flow) centered on the tile and accumulates

    out[m, n] += sum_j L[m, j] * R[j, n]

where ``j`` ranges over window pixels, ``L`` carries the y-tap one-hot times
the bilinear y-weight times the source value, and ``R`` carries the x-tap
one-hot times the x-weight. ``R`` is shared across channels, and the
contraction runs on the MXU. Bilinear 4-tap structure folds into a single
matmul per (row-group, chunk, channel): L sums both y-taps, R both x-taps.

Locality contract: a source pixel's contribution is accumulated by the output
tile that owns its target, and every tile sees a window spanning
``[-(WIN_H-OFF_Y-8), OFF_Y]`` rows and ``(-(WIN_W-OFF_X-128), OFF_X]`` columns
of displacement around it. :func:`softsplat_pallas_banded` partitions the
displacement plane into the base band (fy ∈ [-32, 24), fx ∈ [-128, 128)) plus
four conditional straight bands reaching fy ∈ [-88, 80) and fx ∈ [-384, 384);
each source belongs to exactly one band (in-kernel membership mask), so the
band-pass sum is exact with no double counting. Sources beyond every band are
handled by ``ops/softsplat.py`` as a masked XLA-scatter residual — there is no
all-or-nothing fallback.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_H = 8
TILE_W = 128
DEF_WIN_H = 64
DEF_WIN_W = 384
DEF_OFF_Y = 24
DEF_OFF_X = 128


def _splat_kernel(
    vals_ref,  # ANY [B, C, H, W] (native dtype)
    flow_ref,  # ANY [B, 2, H, W] float32 (fx, fy)
    out_ref,  # VMEM block [1, C, 8, 128]
    win_ref,  # VMEM scratch [2, C, WIN_H, WIN_W]
    fwin_ref,  # VMEM scratch [2, 2, WIN_H, WIN_W] float32
    sem,
    *,
    h: int,
    w: int,
    win_h: int,
    win_w: int,
    off_y: int,
    off_x: int,
    c: int,
    grid_hw: Tuple[int, int],
    band: Optional[Tuple[float, float, float, float]] = None,
):
    gh, gw = grid_hw
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    wi = pl.program_id(2)
    t = (bi * gh + hi) * gw + wi
    n_tiles = pl.num_programs(0) * gh * gw

    def bases(hi_, wi_):
        by = jnp.clip(hi_ * TILE_H - off_y, 0, h - win_h)
        bx = jnp.clip(wi_ * TILE_W - off_x, 0, w - win_w)
        return pl.multiple_of(by, TILE_H), pl.multiple_of(bx, TILE_W)

    def dmas(tile_idx, slot):
        b_k = tile_idx // (gh * gw)
        r = tile_idx - b_k * gh * gw
        hi_ = r // gw
        wi_ = r - hi_ * gw
        by, bx = bases(hi_, wi_)
        return (
            pltpu.make_async_copy(
                vals_ref.at[b_k, :, pl.ds(by, win_h), pl.ds(bx, win_w)],
                win_ref.at[slot],
                sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                flow_ref.at[b_k, :, pl.ds(by, win_h), pl.ds(bx, win_w)],
                fwin_ref.at[slot],
                sem.at[slot, 1],
            ),
        )

    @pl.when(t == 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    @pl.when(t + 1 < n_tiles)
    def _():
        for d in dmas(t + 1, (t + 1) % 2):
            d.start()

    for d in dmas(t, t % 2):
        d.wait()
    slot = t % 2

    by, bx = bases(hi, wi)
    ty0 = hi * TILE_H  # tile origin in the output
    tx0 = wi * TILE_W

    n_groups = win_h // TILE_H
    n_chunks = win_w // TILE_W

    iota_l = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)

    accs = [jnp.zeros((TILE_H, TILE_W), jnp.float32) for _ in range(c)]
    for g in range(n_groups):
        r0 = g * TILE_H
        for ci in range(n_chunks):
            c0 = ci * TILE_W
            fx = fwin_ref[slot, 0, r0 : r0 + TILE_H, c0 : c0 + TILE_W]
            fy = fwin_ref[slot, 1, r0 : r0 + TILE_H, c0 : c0 + TILE_W]
            # global source coords of this window block
            sx = (bx + c0 + iota_l).astype(jnp.float32)
            sy = (by + r0 + iota_s).astype(jnp.float32)
            tx = sx + fx
            ty = sy + fy
            # non-finite flows must not contribute anywhere
            bad = ~(jnp.isfinite(tx) & jnp.isfinite(ty))
            if band is not None:
                # displacement-band membership (half-open on the high side in
                # y, low side closed — bands partition the displacement plane
                # exactly, so multi-band passes never double-count a source)
                lo_y, hi_y, lo_x, hi_x = band
                bad = bad | ~(
                    (fy >= lo_y) & (fy < hi_y) & (fx >= lo_x) & (fx < hi_x)
                )
            tx = jnp.where(bad, -1e9, tx)
            ty = jnp.where(bad, -1e9, ty)
            y0 = jnp.floor(ty)
            wy1 = ty - y0
            # tile-local integer taps; out-of-tile (incl. out-of-frame) lands
            # outside [0, TILE) and the one-hots reject it
            ly = y0.astype(jnp.int32) - ty0
            # valid-target masks per y-tap (frame bounds)
            fy0v = (y0 >= 0) & (y0 <= h - 1)
            fy1v = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)

            # R[j, n]: x-tap one-hot * x-weight, j = window pixel (this block,
            # laid out r-major), shared across channels. Only the f32 target-x
            # is transposed; everything else is re-derived in the transposed
            # domain (Mosaic cannot transpose i1 masks).
            txT = jnp.transpose(tx)  # [128, 8]
            n_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE_W, TILE_W), 1)
            vals = [
                win_ref[slot, ch, r0 : r0 + TILE_H, c0 : c0 + TILE_W].astype(
                    jnp.float32
                )
                for ch in range(c)
            ]
            for rr in range(TILE_H):
                # R slab for window row rr: x-tap one-hot * x-weight,
                # [128 j, 128 n]; shared across channels, single one live.
                tx_col = jax.lax.broadcast_in_dim(
                    txT[:, rr : rr + 1], (TILE_W, TILE_W), (0, 1)
                )
                x0_col = jnp.floor(tx_col)
                wx1_col = tx_col - x0_col
                lx_col = x0_col.astype(jnp.int32) - tx0
                vx0_col = (x0_col >= 0) & (x0_col <= w - 1)
                vx1_col = (x0_col + 1 >= 0) & (x0_col + 1 <= w - 1)
                slab = jnp.where(
                    (lx_col == n_iota) & vx0_col, 1.0 - wx1_col, 0.0
                ) + jnp.where((lx_col + 1 == n_iota) & vx1_col, wx1_col, 0.0)

                # y-tap one-hot * y-weight for this window row, shared
                ly_r = jax.lax.broadcast_in_dim(
                    ly[rr : rr + 1, :], (TILE_H, TILE_W), (0, 1)
                )
                wy1_r = jax.lax.broadcast_in_dim(
                    wy1[rr : rr + 1, :], (TILE_H, TILE_W), (0, 1)
                )
                vy0_r = jax.lax.broadcast_in_dim(
                    fy0v[rr : rr + 1, :], (TILE_H, TILE_W), (0, 1)
                )
                vy1_r = jax.lax.broadcast_in_dim(
                    fy1v[rr : rr + 1, :], (TILE_H, TILE_W), (0, 1)
                )
                ymask = jnp.where(
                    (ly_r == iota_s) & vy0_r, 1.0 - wy1_r, 0.0
                ) + jnp.where((ly_r + 1 == iota_s) & vy1_r, wy1_r, 0.0)
                for ch in range(c):
                    val_r = jax.lax.broadcast_in_dim(
                        vals[ch][rr : rr + 1, :], (TILE_H, TILE_W), (0, 1)
                    )
                    # MXU-default (bf16-input) precision: full-f32 passes blow
                    # the scoped-VMEM stack; resulting relative error ~1e-3,
                    # invisible after the mode wrappers' normalization
                    accs[ch] = accs[ch] + jnp.dot(
                        ymask * val_r, slab,
                        preferred_element_type=jnp.float32,
                    )

    for ch in range(c):
        out_ref[0, ch] = accs[ch].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("win_h", "win_w", "off_y", "off_x", "band")
)
def softsplat_pallas_planes(
    vals: Array,  # [B, C, H, W]
    flow: Array,  # [B, 2, H, W] float32
    win_h: int = DEF_WIN_H,
    win_w: int = DEF_WIN_W,
    off_y: int = DEF_OFF_Y,
    off_x: int = DEF_OFF_X,
    band: Optional[Tuple[float, float, float, float]] = None,
) -> Array:
    b, c, h, w = vals.shape
    assert h % TILE_H == 0 and w % TILE_W == 0, (h, w)
    win_h = min(win_h, h)
    win_w = min(win_w, w)
    gh, gw = h // TILE_H, w // TILE_W
    kernel = functools.partial(
        _splat_kernel,
        h=h, w=w, win_h=win_h, win_w=win_w,
        off_y=off_y, off_x=off_x, c=c, grid_hw=(gh, gw), band=band,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, c, TILE_H, TILE_W), lambda bi, hi, wi: (bi, 0, hi, wi),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, c, win_h, win_w), vals.dtype),
            pltpu.VMEM((2, 2, win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(vals, flow)


def _planes_maybe_chunked(vals: Array, flow: Array, **kw) -> Array:
    """Channel-chunked kernel dispatch for 4-byte dtypes. The kernel body's
    scoped-VMEM stack scales with C x itemsize; f32 inputs at C=4 overflow
    the 16 MB scoped limit by ~11% (hit by the fp32 PSNR gate through M2M —
    bf16, the production dtype, fits at every supported C). Channels splat
    independently, so slicing C is exact."""
    c = vals.shape[1]
    if jnp.dtype(vals.dtype).itemsize < 4 or c <= 2:
        return softsplat_pallas_planes(vals, flow, **kw)
    outs = [
        softsplat_pallas_planes(vals[:, i : i + 2], flow, **kw)
        for i in range(0, c, 2)
    ]
    return jnp.concatenate(outs, axis=1)


def softsplat_pallas(ten_in: Array, ten_flow: Array, **win_kw) -> Array:
    """NHWC raw bilinear forward splat (reference ``softsplat_out``) via the
    windowed matmul-scatter kernel. See the module docstring for the locality
    contract."""
    n, h, w, c = ten_in.shape
    ph = -h % TILE_H
    pw = -w % TILE_W
    if ph or pw:
        # zero-pad: padded sources carry zero values and zero flow, so they
        # only splat zeros onto pad positions, which are cropped below
        ten_in = jnp.pad(ten_in, ((0, 0), (0, ph), (0, pw), (0, 0)))
        ten_flow = jnp.pad(ten_flow, ((0, 0), (0, ph), (0, pw), (0, 0)))
    vals = ten_in.transpose(0, 3, 1, 2)
    flow = ten_flow.astype(jnp.float32).transpose(0, 3, 1, 2)
    out = _planes_maybe_chunked(vals, flow, **win_kw)
    out = out.transpose(0, 2, 3, 1)[:, :h, :w, :]
    return out.astype(ten_in.dtype)


# ---------------------------------------------------------------------------
# Displacement-banded exact splat: partition the displacement plane into the
# base window band plus four conditional straight bands (fast vertical or
# horizontal motion); a source belongs to exactly one band, so summing the
# band passes is exact. Sources beyond every band (extreme diagonal motion)
# are counted by the caller and handled with a masked XLA scatter.
# ---------------------------------------------------------------------------

# (lo_y, hi_y, lo_x, hi_x): half-open [lo, hi) displacement ranges. Window
# geometry per band: off = hi (exclusive top), width (hi-lo) + tile + bilinear.
BAND_BASE = (-32.0, 24.0, -128.0, 128.0)
BANDS_EXTRA = (
    # fast downward / upward motion at ordinary horizontal displacement
    (24.0, 80.0, -128.0, 128.0),
    (-88.0, -32.0, -128.0, 128.0),
    # fast rightward / leftward motion at ordinary vertical displacement
    (-32.0, 24.0, 128.0, 384.0),
    (-32.0, 24.0, -384.0, -128.0),
)


def _band_geometry(band):
    lo_y, hi_y, lo_x, hi_x = band
    win_h = int(hi_y - lo_y) + TILE_H
    win_w = int(hi_x - lo_x) + TILE_W
    return win_h, win_w, int(hi_y), int(hi_x)


def usable_bands(h: int, w: int):
    """Extra bands whose windows fit an image padded to (h, w)."""
    hp = h + (-h % TILE_H)
    wp = w + (-w % TILE_W)
    out = []
    for band in BANDS_EXTRA:
        wh, ww, _, _ = _band_geometry(band)
        if wh <= hp and ww <= wp:
            out.append(band)
    return tuple(out)


def band_membership(ten_flow: Array, h: int, w: int):
    """(per-band presence flags incl. base, remainder mask): a source is in
    the remainder when no usable band covers it. Non-finite flows belong
    nowhere (all paths drop them)."""
    fx = ten_flow[..., 0]
    fy = ten_flow[..., 1]
    finite = jnp.isfinite(fx) & jnp.isfinite(fy)

    def in_band(band):
        lo_y, hi_y, lo_x, hi_x = band
        return (
            finite & (fy >= lo_y) & (fy < hi_y) & (fx >= lo_x) & (fx < hi_x)
        )

    memb = [in_band(BAND_BASE)] + [in_band(b) for b in usable_bands(h, w)]
    covered = memb[0]
    for m in memb[1:]:
        covered = covered | m
    present = [jnp.any(m) for m in memb]
    remainder = finite & jnp.logical_not(covered)
    return present, remainder


# meta columns for the stacked kernel (int32; band bounds are integral)
_M_OFFY, _M_OFFX = 0, 1
_M_LOY, _M_HIY, _M_LOX, _M_HIX = 2, 3, 4, 5
_M_PRESENT, _M_NXT, _M_RANK, _M_NLIVE = 6, 7, 8, 9
_M_COLS = 10


def _splat_kernel_stacked(
    meta_ref,  # scalar-prefetched [nb, _M_COLS] int32
    vals_ref,  # ANY [B, C, H, W] (native dtype)
    flow_ref,  # ANY [B, 2, H, W] float32 (fx, fy)
    out_ref,  # VMEM block [1, C, 8, 128], revisited across the band dim
    win_ref,  # VMEM scratch [2, C, WIN_H, WIN_W]
    fwin_ref,  # VMEM scratch [2, 2, WIN_H, WIN_W] float32
    sem,
    acc_ref,  # VMEM scratch [C, 8, 128] float32 step accumulator
    *,
    h: int,
    w: int,
    win_h: int,
    win_w: int,
    c: int,
    grid_hw: Tuple[int, int],
    nb: int,
    fold: int = 1,
):
    """All displacement bands in ONE kernel: the band index is the innermost
    grid dimension, so each output tile accumulates its band passes while the
    block stays resident in VMEM. Band geometry (window offsets + membership
    bounds) is scalar-prefetched, so every band — and every launch of this
    kernel at a given shape — shares a single Mosaic compilation (the per-band
    static specialization of ``_splat_kernel`` compiled 5 kernels).

    Absent bands (no source in the band, precomputed presence flags in the
    meta) skip their DMA and compute entirely; the DMA pipeline chains
    LIVE steps only (each live step prefetches the next live step's window,
    hopping over absent ones via the meta's NXT column).

    ``fold``: wide-channel inputs arrive with channel chunks folded into the
    batch axis (``vals_ref`` batch = true batch x fold); the flow array is NOT
    repeated — flow windows are DMA'd from ``flow_ref`` at the true batch
    index ``b_k // fold``."""
    gh, gw = grid_hw
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    wi = pl.program_id(2)
    k = pl.program_id(3)
    tile = (bi * gh + hi) * gw + wi
    n_tiles = pl.num_programs(0) * gh * gw
    g = tile * nb + k

    present = meta_ref[k, _M_PRESENT]
    n_live = meta_ref[0, _M_NLIVE]
    live_idx = tile * n_live + meta_ref[k, _M_RANK]

    def dmas(g_step, slot):
        k_ = jax.lax.rem(g_step, nb)
        tile_ = jax.lax.div(g_step, nb)
        b_k = tile_ // (gh * gw)
        r = tile_ - b_k * gh * gw
        hi_ = r // gw
        wi_ = r - hi_ * gw
        by = jnp.clip(hi_ * TILE_H - meta_ref[k_, _M_OFFY], 0, h - win_h)
        bx = jnp.clip(wi_ * TILE_W - meta_ref[k_, _M_OFFX], 0, w - win_w)
        by = pl.multiple_of(by, TILE_H)  # offsets are multiples of the tile
        bx = pl.multiple_of(bx, TILE_W)
        return (
            pltpu.make_async_copy(
                vals_ref.at[b_k, :, pl.ds(by, win_h), pl.ds(bx, win_w)],
                win_ref.at[slot],
                sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                flow_ref.at[
                    b_k // fold, :, pl.ds(by, win_h), pl.ds(bx, win_w)
                ],
                fwin_ref.at[slot],
                sem.at[slot, 1],
            ),
        )

    @pl.when(present == 1)
    def _():
        @pl.when(live_idx == 0)
        def _():
            for d in dmas(g, 0):
                d.start()

        # prefetch the next LIVE step's window (absent bands never get one)
        g_next = g + meta_ref[k, _M_NXT]
        @pl.when(jax.lax.div(g_next, nb) < n_tiles)
        def _():
            for d in dmas(g_next, jax.lax.rem(live_idx + 1, 2)):
                d.start()

        slot = jax.lax.rem(live_idx, 2)
        for d in dmas(g, slot):
            d.wait()

        by = jnp.clip(hi * TILE_H - meta_ref[k, _M_OFFY], 0, h - win_h)
        bx = jnp.clip(wi * TILE_W - meta_ref[k, _M_OFFX], 0, w - win_w)
        ty0 = hi * TILE_H  # tile origin in the output
        tx0 = wi * TILE_W
        lo_y = meta_ref[k, _M_LOY].astype(jnp.float32)
        hi_y = meta_ref[k, _M_HIY].astype(jnp.float32)
        lo_x = meta_ref[k, _M_LOX].astype(jnp.float32)
        hi_x = meta_ref[k, _M_HIX].astype(jnp.float32)

        n_groups = win_h // TILE_H
        n_chunks = win_w // TILE_W

        iota_l = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)

        acc_ref[...] = jnp.zeros((c, TILE_H, TILE_W), jnp.float32)
        for grp in range(n_groups):
            r0 = grp * TILE_H
            for ci in range(n_chunks):
                c0 = ci * TILE_W
                fx = fwin_ref[slot, 0, r0 : r0 + TILE_H, c0 : c0 + TILE_W]
                fy = fwin_ref[slot, 1, r0 : r0 + TILE_H, c0 : c0 + TILE_W]
                # global source coords of this window block
                sx = (bx + c0 + iota_l).astype(jnp.float32)
                sy = (by + r0 + iota_s).astype(jnp.float32)
                tx = sx + fx
                ty = sy + fy
                # non-finite flows must not contribute anywhere; band
                # membership is half-open on the high side — the bands
                # partition the displacement plane exactly, so the stacked
                # passes never double-count a source
                bad = ~(jnp.isfinite(tx) & jnp.isfinite(ty))
                bad = bad | ~(
                    (fy >= lo_y) & (fy < hi_y) & (fx >= lo_x) & (fx < hi_x)
                )
                # block-level skip: a source contributes to THIS output tile
                # only if a bilinear tap lands inside it. Real flows are
                # locally smooth, so for most (window block, tile) pairs no
                # source hits the tile and the whole one-hot/matmul pass is
                # dead work — the dominant cost at production shapes. The
                # test is exact-or-conservative (tap-weight-0 edges included)
                # so skipping cannot change the result.
                hit = ~bad
                hit &= (tx >= tx0 - 1.0) & (tx < tx0 + TILE_W)
                hit &= (ty >= ty0 - 1.0) & (ty < ty0 + TILE_H)

                @pl.when(jnp.any(hit))
                def _(tx=tx, ty=ty, bad=bad, r0=r0, c0=c0):
                    tx = jnp.where(bad, -1e9, tx)
                    ty = jnp.where(bad, -1e9, ty)
                    txT = jnp.transpose(tx)  # [128, 8]
                    # tent form: the bilinear tap weight at output column
                    # tx0+n is max(0, 1 - |tx - (tx0+n)|) — same taps as the
                    # two one-hots (1-frac at floor, frac at floor+1) at ~half
                    # the VPU passes (no floor/int casts/eq-masks; weight
                    # agreement is within 1 ulp, far under the op tolerance).
                    # Frame-validity masks are redundant here: a tap only
                    # matches an in-tile column/row, which is in-frame by
                    # construction (w, h are tile-padded dims). NOTE a per-row
                    # pl.when skip + acc_ref accumulation was measured and
                    # REJECTED: smooth-flow splats improved but the composed
                    # rough-flow GMFSS bench regressed 1.61 -> 1.12 f/s (the
                    # row branches + [C,8,128] read-modify-writes cost more
                    # than the skipped slab math when live rows are sparse).
                    n_iota = jax.lax.broadcasted_iota(
                        jnp.int32, (TILE_W, TILE_W), 1
                    )
                    xcols = (tx0 + n_iota).astype(jnp.float32)
                    yrows = (ty0 + iota_s).astype(jnp.float32)
                    # [C, TILE_H, TILE_W] source block: ALL channels ride one
                    # slab/ymask build per source row rr below — the tent
                    # construction (flow-dependent, VPU) is channel-invariant,
                    # and stacking channels into a single [C*8, 128] LHS turns
                    # c tiny 8-row MXU passes into one full-height matmul.
                    block = win_ref[
                        slot, :, r0 : r0 + TILE_H, c0 : c0 + TILE_W
                    ].astype(jnp.float32)
                    acc3 = jnp.zeros((c * TILE_H, TILE_W), jnp.float32)
                    for rr in range(TILE_H):
                        tx_col = jax.lax.broadcast_in_dim(
                            txT[:, rr : rr + 1], (TILE_W, TILE_W), (0, 1)
                        )
                        slab = jnp.maximum(0.0, 1.0 - jnp.abs(tx_col - xcols))
                        ty_r = jax.lax.broadcast_in_dim(
                            ty[rr : rr + 1, :], (TILE_H, TILE_W), (0, 1)
                        )
                        ymask = jnp.maximum(0.0, 1.0 - jnp.abs(ty_r - yrows))
                        lhs = block[:, rr : rr + 1, :] * ymask[None]
                        acc3 = acc3 + jnp.dot(
                            lhs.reshape(c * TILE_H, TILE_W), slab,
                            preferred_element_type=jnp.float32,
                        )
                    acc_ref[...] = acc_ref[...] + acc3.reshape(
                        c, TILE_H, TILE_W
                    )

        @pl.when(k == 0)
        def _():
            out_ref[0] = acc_ref[...].astype(out_ref.dtype)

        @pl.when(k > 0)
        def _():
            out_ref[0] = out_ref[0] + acc_ref[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("win_h", "win_w", "nb", "fold")
)
def softsplat_pallas_stacked(
    vals: Array,  # [B*fold, C, H, W]
    flow: Array,  # [B, 2, H, W] float32
    meta: Array,  # [nb, _M_COLS] int32
    win_h: int,
    win_w: int,
    nb: int,
    fold: int = 1,
) -> Array:
    b, c, h, w = vals.shape
    assert h % TILE_H == 0 and w % TILE_W == 0, (h, w)
    assert meta.shape == (nb, _M_COLS), meta.shape
    assert b % fold == 0 and flow.shape[0] * fold == b, (b, fold, flow.shape)
    gh, gw = h // TILE_H, w // TILE_W
    kernel = functools.partial(
        _splat_kernel_stacked,
        h=h, w=w, win_h=win_h, win_w=win_w, c=c, grid_hw=(gh, gw), nb=nb,
        fold=fold,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, gh, gw, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, c, TILE_H, TILE_W),
            lambda bi, hi, wi, k, *_: (bi, 0, hi, wi),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, c, win_h, win_w), vals.dtype),
            pltpu.VMEM((2, 2, win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((c, TILE_H, TILE_W), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
    )(meta, vals, flow)


def _stacked_meta(present) -> Array:
    """Band meta rows for the stacked kernel from per-band presence scalars.

    The base band row is forced present — it both covers the common case and
    initializes the output block (the k==0 write). ``NXT`` is the global-step
    distance to the next live band (presence is periodic in the band index,
    so the same distances chain across tiles); ``RANK``/``NLIVE`` give each
    live step its position in the live-only sequence for DMA slot parity."""
    geoms = [BAND_BASE] + list(BANDS_EXTRA)
    nb_all = len(present)
    pres = jnp.stack(
        [jnp.ones((), jnp.int32)]
        + [present[i].astype(jnp.int32) for i in range(1, nb_all)]
    )
    rank = jnp.cumsum(pres) - pres
    n_live = jnp.sum(pres)
    nxt = jnp.zeros((nb_all,), jnp.int32)
    found = jnp.zeros((nb_all,), bool)
    idx = jnp.arange(nb_all)
    for d in range(1, nb_all + 1):
        p = pres[(idx + d) % nb_all] == 1
        nxt = jnp.where(~found & p, d, nxt)
        found = found | p
    rows = []
    for i in range(nb_all):
        lo_y, hi_y, lo_x, hi_x = geoms[i]
        _, _, oy, ox = _band_geometry(geoms[i])
        rows.append(
            jnp.stack([
                jnp.full((), oy, jnp.int32),
                jnp.full((), ox, jnp.int32),
                jnp.full((), int(lo_y), jnp.int32),
                jnp.full((), int(hi_y), jnp.int32),
                jnp.full((), int(lo_x), jnp.int32),
                jnp.full((), int(hi_x), jnp.int32),
                pres[i],
                nxt[i],
                rank[i],
                n_live,
            ])
        )
    return jnp.stack(rows)


def softsplat_pallas_banded(ten_in: Array, ten_flow: Array) -> Array:
    """NHWC forward splat, exact for displacements within the band union
    (fy in [-88, 80), fx in [-384, 384) around the base window). The caller
    handles the remainder (see ``ops.softsplat.softsplat_func``).

    All usable bands run as ONE stacked kernel launch (band = innermost grid
    dim): a single Mosaic compilation per shape instead of one per band, one
    launch instead of up to five, with absent bands skipped in-kernel via the
    prefetched presence flags."""
    n, h, w, c = ten_in.shape
    ph = -h % TILE_H
    pw = -w % TILE_W
    if ph or pw:
        ten_in = jnp.pad(ten_in, ((0, 0), (0, ph), (0, pw), (0, 0)))
        ten_flow = jnp.pad(ten_flow, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = ten_in.shape[1:3]
    vals = ten_in.transpose(0, 3, 1, 2)
    flow = ten_flow.astype(jnp.float32).transpose(0, 3, 1, 2)

    present, _ = band_membership(ten_flow, h, w)
    bands = [BAND_BASE] + list(usable_bands(h, w))
    nb = len(bands)
    # all bands share one window geometry by construction; assert it
    wh, ww, _, _ = _band_geometry(BAND_BASE)
    for bnd in bands[1:]:
        assert _band_geometry(bnd)[:2] == (wh, ww), bnd
    wh = min(wh, hp)
    ww = min(ww, wp)
    meta = _stacked_meta(present[:nb])

    # the kernel's window scratch scales with C x itemsize; wide channels
    # FOLD equal zero-padded chunks into the batch axis — one launch, flow
    # windows DMA'd per fold step (channels splat independently under the
    # same flow, so this is exact). Every fold chunk re-pays the per-row
    # one-hot slab builds, so the cap is as high as the register file
    # allows: 16 channels stack to a [128, 128] matmul LHS (full MXU
    # height) while acc3/slab/block fit in vregs without spilling.
    cap = 16
    if c <= cap:
        out = softsplat_pallas_stacked(vals, flow, meta, wh, ww, nb)
    else:
        n_ch = -(-c // cap)
        c_pad = n_ch * cap
        if c_pad != c:
            vals = jnp.pad(vals, ((0, 0), (0, c_pad - c), (0, 0), (0, 0)))
        vals_f = vals.reshape(n * n_ch, cap, hp, wp)
        out = softsplat_pallas_stacked(
            vals_f, flow, meta, wh, ww, nb, fold=n_ch
        )
        out = out.reshape(n, c_pad, hp, wp)[:, :c]
    out = out.transpose(0, 2, 3, 1)[:, :h, :w, :]
    return out.astype(ten_in.dtype)
