"""AMT — All-pairs Multi-field Transforms (S/L/G variants).

Reference: ``vfi_models/amt/amt_arch.py``. RAFT-style all-pairs correlation
computed with plain matmuls (``BidirCorrBlock``, lines 1076-1151): a
``[B, H/8*W/8, H/8, W/8]`` volume (scaled by 1/sqrt(dim)), avg-pooled into a
4-level pyramid and bilinearly looked up in a ±radius window around the
time-scaled flow endpoints (zeros padding, align_corners=True). Cascaded
decoders (Init → 2x Intermediate → MultiFlow, lines 824-938) refine
bidirectional flows with GRU-ish conv update blocks (969-1074); the final
``num_flows`` flow fields warp both inputs which are mask-blended, residual-
corrected, averaged, and combined by ``comb_block``
(``multi_flow_combine``, 869-903).

All-pairs correlation is a perfect MXU fit: one ``[B, HW, C] @ [B, C, HW]``
batched matmul. The windowed pyramid lookup reuses :func:`~..ops.warp.
bilinear_sample` over a flattened ``B*H*W`` batch.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.warp import bilinear_sample, warp
from .common import cast_params, conv2d, conv_transpose2d, leaky_relu, prelu, resize_by_scale

Array = jnp.ndarray
Params = Dict

CKPT_CONFIGS = {
    "amt-s.pth": {"variant": "S", "num_flows": 3},
    "amt-l.pth": {"variant": "L", "num_flows": 5},
    "amt-g.pth": {"variant": "G", "num_flows": 5},
    "gopro_amt-s.pth": {"variant": "S", "num_flows": 3},
}

_CHANNELS = {"S": [20, 32, 44, 56], "L": [48, 64, 72, 128], "G": [84, 96, 112, 128]}
_RADIUS = 3
_LEVELS = 4


def _inorm(x: Array) -> Array:
    """InstanceNorm2d(affine=False): per-sample, per-channel over H, W."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


def _residual_block(p: Params, x: Array, stride: int) -> Array:
    y = jax.nn.relu(_inorm(conv2d(x, p["conv1"], stride=stride, padding=1)))
    y = jax.nn.relu(_inorm(conv2d(y, p["conv2"], stride=1, padding=1)))
    if stride != 1:
        x = _inorm(conv2d(x, p["downsample"]["0"], stride=stride, padding=0))
    return jax.nn.relu(x + y)


def _bottleneck_block(p: Params, x: Array, stride: int) -> Array:
    y = jax.nn.relu(_inorm(conv2d(x, p["conv1"], stride=1, padding=0)))
    y = jax.nn.relu(_inorm(conv2d(y, p["conv2"], stride=stride, padding=1)))
    y = jax.nn.relu(_inorm(conv2d(y, p["conv3"], stride=1, padding=0)))
    if stride != 1:
        x = _inorm(conv2d(x, p["downsample"]["0"], stride=stride, padding=0))
    return jax.nn.relu(x + y)


def _feat_encoder(p: Params, x: Array, variant: str) -> Array:
    """Small/Basic/LargeEncoder with norm_fn='instance' (amt_arch.py:515-744)."""
    block = _bottleneck_block if variant == "S" else _residual_block
    x = jax.nn.relu(_inorm(conv2d(x, p["conv1"], stride=2, padding=3)))
    for layer, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
        x = block(p[layer]["0"], x, stride)
        x = block(p[layer]["1"], x, 1)
    if variant == "G":
        x = block(p["layer3_2"]["0"], x, 1)
        x = block(p["layer3_2"]["1"], x, 1)
    return conv2d(x, p["conv2"], stride=1, padding=0)


def _convrelu(p: Params, x: Array, stride=1, padding=1) -> Array:
    x = conv2d(x, p["0"], stride=stride, padding=padding)
    return prelu(x, p["1"])


def _pyramid_encoder(p: Params, x: Array, variant: str) -> List[Array]:
    feats = []
    for i in range(1, 5):
        node = p[f"pyramid{i}"]
        pad = 3 if (variant in ("L", "G") and i == 1) else 1
        x = _convrelu(node["0"], x, stride=2, padding=pad)
        x = _convrelu(node["1"], x, stride=1, padding=1)
        feats.append(x)
    return feats


def _resblock(p: Params, x: Array, side: int) -> Array:
    """AMT ResBlock (amt_arch.py:762-799) — concat-split form."""
    out = _convrelu(p["conv1"], x)
    out = jnp.concatenate(
        [out[..., :-side], _convrelu(p["conv2"], out[..., -side:])], -1
    )
    out = _convrelu(p["conv3"], out)
    out = jnp.concatenate(
        [out[..., :-side], _convrelu(p["conv4"], out[..., -side:])], -1
    )
    out = conv2d(out, p["conv5"], stride=1, padding=1)
    return prelu(x + out, p["prelu"])


def _decoder_block(p: Params, f_in: Array, side: int) -> Array:
    x = _convrelu(p["convblock"]["0"], f_in)
    x = _resblock(p["convblock"]["1"], x, side)
    return conv_transpose2d(x, p["convblock"]["2"], stride=2, padding=1)


# ---------------------------------------------------------------- correlation


def _avg_pool_nhwc(x: Array) -> Array:
    from .common import avg_pool2d

    return avg_pool2d(x, 2, 2)


class _BidirCorr:
    """Factorized bidirectional RAFT-style correlation (amt_arch.py:1076-1151).

    The reference materializes the all-pairs volume ``corr[i, j] = <f0_i,
    f1_j>/sqrt(c)`` as a ``[B*H*W, H, W]`` tensor plus its transpose and
    avg-pooled pyramids of both — at 1080p (H/8*W/8 = 32640 positions) that is
    ~8.5 GB of HBM traffic per direction before a single lookup. Because the
    correlation is LINEAR in each feature map, the volume never needs to
    exist: avg-pooling corr over the target dims equals correlating against
    the avg-pooled target features, and bilinear-sampling the pooled volume
    equals bilinear-sampling the pooled target features and dotting with the
    (full-resolution) query feature:

        pool_l(corr)(i, j_l)           = <f0_i, pool_l(f1)_{j_l}> / sqrt(c)
        bilin(pool_l(corr))(i, p)      = <f0_i, bilin(pool_l(f1))(p)> / sqrt(c)

    (zeros padding commutes too: an out-of-range tap contributes a zero
    feature and hence a zero dot). So this class keeps only the two feature
    pyramids — O(B*HW*C) instead of O(B*HW^2) — and each lookup gathers
    pooled features in a window and contracts over channels, which is
    mathematically identical to the reference volume lookup and maps onto
    dense gathers + a small matmul instead of a giant scattered gather.
    Window taps are processed in rows of 2r+1 to bound the gathered
    ``[..., taps, C]`` transient."""

    def __init__(self, f0: Array, f1: Array, num_levels=_LEVELS, radius=_RADIUS):
        self.radius = radius
        self.b, self.h, self.w, self.c = f0.shape
        self.f0 = f0
        self.f1 = f1
        self.f0_pyr = [f0]
        self.f1_pyr = [f1]
        for _ in range(num_levels - 1):
            self.f0_pyr.append(_avg_pool_nhwc(self.f0_pyr[-1]))
            self.f1_pyr.append(_avg_pool_nhwc(self.f1_pyr[-1]))

    def _windowed(self, query: Array, pyr, coords: Array) -> Array:
        """[B,H,W,levels*(2r+1)^2]: <query_q, bilin(pool_l(target))(coords_q/2^l
        + delta)>/sqrt(c) for the (2r+1)^2 delta window at every level.

        The deltas are INTEGERS, so every tap shares one fractional part per
        axis: the whole window is a bilinear lerp of four integer-shifted
        (2r+1)² sub-windows of ONE (2r+2)² integer patch around
        floor(coords). The patch arrives as 2r+2 WIDE contiguous row slices
        (vmapped dynamic_slice → gather with [1, 2r+2, C] slice sizes) from a
        zero-padded target — the layout XLA lowers well — instead of the
        per-tap scattered bilinear gather this replaced (which dominated
        AMT's runtime: 1177 GFLOP measured at 0.31 TFLOP/s). Each row is
        contracted with the query immediately, so only the [.., P, P] dot
        field is materialized. Tap-order quirk preserved: the reference adds
        the (dy,dx)-ordered meshgrid to (x,y)-ordered coords directly
        (amt_arch.py:1119-1121), so the OUTER tap index perturbs x."""
        r = self.radius
        n = 2 * r + 1
        pp = 2 * r + 2
        b, h, w, c = query.shape
        q_flat = query.reshape(b, h * w, c)
        scale = 1.0 / math.sqrt(self.c)

        def _slice_rows(t, ry, rx):
            return jax.lax.dynamic_slice(
                t, (ry, rx, 0), (1, pp, t.shape[-1])
            )[0]

        slice_q = jax.vmap(_slice_rows, in_axes=(None, 0, 0))
        slice_b = jax.vmap(slice_q, in_axes=(0, 0, 0))

        outs = []
        for i, tgt in enumerate(pyr):
            hl, wl = tgt.shape[1:3]
            tp = jnp.pad(tgt, ((0, 0), (pp, pp), (pp, pp), (0, 0)))
            cl = coords.reshape(b, h * w, 2).astype(jnp.float32) / (2**i)
            cx, cy = cl[..., 0], cl[..., 1]
            fx0, fy0 = jnp.floor(cx), jnp.floor(cy)
            tx = (cx - fx0)[..., None, None]
            ty = (cy - fy0)[..., None, None]
            bx_v = fx0.astype(jnp.int32) - r
            by_v = fy0.astype(jnp.int32) - r
            # windows that intersect the image map exactly under the pp-pad
            # (no clip engages); fully-outside windows would be mis-mapped by
            # the clip, but all their taps are out of range → zeroed below
            ok = (
                (bx_v + n >= 0) & (bx_v <= wl - 1)
                & (by_v + n >= 0) & (by_v <= hl - 1)
            )
            bx = jnp.clip(bx_v + pp, 0, wl + pp)
            rows = []
            for ay in range(pp):
                ry = jnp.clip(by_v + pp + ay, 0, hl + 2 * pp - 1)
                sl = slice_b(tp, ry, bx)  # [B, HW, pp, C]
                rows.append(jnp.einsum("bqpc,bqc->bqp", sl, q_flat))
            d_f = jnp.stack(rows, axis=-2)  # [B, HW, pp(y), pp(x)]
            d_f = jnp.where(ok[..., None, None], d_f, 0.0)
            dy_l = (1.0 - ty) * d_f[..., 0:n, :] + ty * d_f[..., 1:pp, :]
            dxy_l = (1.0 - tx) * dy_l[..., 0:n] + tx * dy_l[..., 1:pp]
            # dxy_l axes are [.., j(y-offset), k(x-offset)]; tap index is
            # k*n + j (outer index = x) → swap before flattening
            taps = jnp.swapaxes(dxy_l, -1, -2).reshape(b, h, w, n * n)
            outs.append(taps * scale)
        return jnp.concatenate(outs, axis=-1)

    def lookup(self, coords0: Array, coords1: Array) -> Tuple[Array, Array]:
        """coords*: [B, H, W, 2] pixel coords; returns [B,H,W,levels*(2r+1)^2] x2."""
        return (
            self._windowed(self.f0, self.f1_pyr, coords0),
            self._windowed(self.f1, self.f0_pyr, coords1),
        )


# ---------------------------------------------------------------- update blocks


def _conv_seq3(p: Params, x: Array) -> Array:
    x = conv2d(x, p["0"], stride=1, padding=1)
    x = leaky_relu(x, 0.1)
    return conv2d(x, p["2"], stride=1, padding=1)


def _update_block(p: Params, net, flow, corr, variant: str, scale_factor):
    """Small/BasicUpdateBlock (amt_arch.py:969-1074)."""
    if scale_factor is not None:
        net = resize_by_scale(net, 1.0 / scale_factor)
    cor = leaky_relu(conv2d(corr, p["convc1"], stride=1, padding=0), 0.1)
    if variant in ("L", "G"):
        cor = leaky_relu(conv2d(cor, p["convc2"], stride=1, padding=1), 0.1)
    flo = leaky_relu(conv2d(flow, p["convf1"], stride=1, padding=3), 0.1)
    flo = leaky_relu(conv2d(flo, p["convf2"], stride=1, padding=1), 0.1)
    inp = leaky_relu(
        conv2d(jnp.concatenate([cor, flo], -1), p["conv"], stride=1, padding=1), 0.1
    )
    inp = jnp.concatenate([inp, flow, net], -1)
    out = _conv_seq3(p["gru"], inp)
    delta_net = _conv_seq3(p["feat_head"], out)
    delta_flow = _conv_seq3(p["flow_head"], out)
    if scale_factor is not None:
        delta_net = resize_by_scale(delta_net, scale_factor)
        delta_flow = scale_factor * resize_by_scale(delta_flow, scale_factor)
    return delta_net, delta_flow


# ---------------------------------------------------------------- full model


def _corr_scale_lookup(corr_fn, coord, flow0, flow1, embt, downsample):
    t1_scale = 1.0 / embt
    t0_scale = 1.0 / (1.0 - embt)
    if downsample != 1:
        inv = 1.0 / downsample
        flow0 = inv * resize_by_scale(flow0, inv)
        flow1 = inv * resize_by_scale(flow1, inv)
    corr0, corr1 = corr_fn.lookup(coord + flow1 * t1_scale, coord + flow0 * t0_scale)
    corr = jnp.concatenate([corr0, corr1], -1)
    flow = jnp.concatenate([flow0, flow1], -1)
    return corr, flow


def apply(
    params: Params,
    img0: Array,
    img1: Array,
    timestep,
    variant: str = "S",
    num_flows: int = 3,
    scale_factor: float = 1.0,
) -> Array:
    """``AMT_{S,L,G}.forward`` (amt_arch.py:1206-1289, 1352-1441, 1495-1589),
    eval path. Inputs must be pre-padded to a multiple of 16 (the node pads the
    whole clip once, ``amt/__init__.py:71-72``)."""
    n, h, w, _ = img0.shape
    skip = {"S": 20, "L": 48, "G": 84}[variant]

    embt = jnp.broadcast_to(
        jnp.asarray(timestep, img0.dtype).reshape(-1, 1, 1, 1), (n, 1, 1, 1)
    )

    mean_ = jnp.mean(
        jnp.concatenate([img0, img1], 1), axis=(1, 2, 3), keepdims=True
    )
    img0 = img0 - mean_
    img1 = img1 - mean_
    img0_ = resize_by_scale(img0, scale_factor) if scale_factor != 1.0 else img0
    img1_ = resize_by_scale(img1, scale_factor) if scale_factor != 1.0 else img1
    hh, ww = img0_.shape[1], img0_.shape[2]

    xs = jnp.arange(ww // 8, dtype=img0.dtype)
    ys = jnp.arange(hh // 8, dtype=img0.dtype)
    coord = jnp.stack(
        [
            jnp.broadcast_to(xs[None, None, :], (n, hh // 8, ww // 8)),
            jnp.broadcast_to(ys[None, :, None], (n, hh // 8, ww // 8)),
        ],
        axis=-1,
    )

    fmap0 = _feat_encoder(params["feat_encoder"], img0_, variant)
    fmap1 = _feat_encoder(params["feat_encoder"], img1_, variant)
    corr_fn = _BidirCorr(fmap0, fmap1)

    f0 = _pyramid_encoder(params["encoder"], img0_, variant)
    f1 = _pyramid_encoder(params["encoder"], img1_, variant)

    # decoder 4 (InitDecoder)
    h4, w4 = f0[3].shape[1], f0[3].shape[2]
    embt_map = jnp.broadcast_to(embt, (n, h4, w4, 1))
    out4 = _decoder_block(
        params["decoder4"], jnp.concatenate([f0[3], f1[3], embt_map], -1), skip
    )
    up_flow0, up_flow1 = out4[..., :2], out4[..., 2:4]
    ft_ = out4[..., 4:]

    def residue_update(upd_key, ft_, up_flow0, up_flow1, downsample, sf):
        corr, flow = _corr_scale_lookup(
            corr_fn, coord, up_flow0, up_flow1, embt, downsample
        )
        d_ft, d_flow = _update_block(
            params[upd_key], ft_, flow, corr, variant, sf
        )
        return (
            ft_ + d_ft,
            up_flow0 + d_flow[..., 0:2],
            up_flow1 + d_flow[..., 2:4],
            corr,
        )

    ft_, up_flow0, up_flow1, _ = residue_update(
        "update4", ft_, up_flow0, up_flow1, 1, None
    )

    # decoder 3
    def intermediate(dec_key, ft_, f0l, f1l, up_flow0, up_flow1):
        f0w = warp(f0l, up_flow0)
        f1w = warp(f1l, up_flow1)
        out = _decoder_block(
            params[dec_key],
            jnp.concatenate([ft_, f0w, f1w, up_flow0, up_flow1], -1),
            skip,
        )
        nf0 = out[..., :2] + 2.0 * resize_by_scale(up_flow0, 2.0)
        nf1 = out[..., 2:4] + 2.0 * resize_by_scale(up_flow1, 2.0)
        return nf0, nf1, out[..., 4:]

    up_flow0, up_flow1, ft_ = intermediate(
        "decoder3", ft_, f0[2], f1[2], up_flow0, up_flow1
    )
    if variant == "G":
        ft_, up_flow0, up_flow1, corr3 = residue_update(
            "update3_low", ft_, up_flow0, up_flow1, 2, 2.0
        )
        corr3 = resize_by_scale(corr3, 2.0)
        d_ft, d_flow = _update_block(
            params["update3_high"],
            ft_,
            jnp.concatenate([up_flow0, up_flow1], -1),
            corr3,
            variant,
            None,
        )
        ft_ = ft_ + d_ft
        up_flow0 = up_flow0 + d_flow[..., 0:2]
        up_flow1 = up_flow1 + d_flow[..., 2:4]
    else:
        ft_, up_flow0, up_flow1, _ = residue_update(
            "update3", ft_, up_flow0, up_flow1, 2, 2.0
        )

    # decoder 2
    up_flow0, up_flow1, ft_ = intermediate(
        "decoder2", ft_, f0[1], f1[1], up_flow0, up_flow1
    )
    if variant == "G":
        ft_, up_flow0, up_flow1, corr2 = residue_update(
            "update2_low", ft_, up_flow0, up_flow1, 4, 4.0
        )
        corr2 = resize_by_scale(corr2, 4.0)
        d_ft, d_flow = _update_block(
            params["update2_high"],
            ft_,
            jnp.concatenate([up_flow0, up_flow1], -1),
            corr2,
            variant,
            None,
        )
        ft_ = ft_ + d_ft
        up_flow0 = up_flow0 + d_flow[..., 0:2]
        up_flow1 = up_flow1 + d_flow[..., 2:4]
    else:
        ft_, up_flow0, up_flow1, _ = residue_update(
            "update2", ft_, up_flow0, up_flow1, 4, 4.0
        )

    # decoder 1 (MultiFlowDecoder)
    f0w = warp(f0[0], up_flow0)
    f1w = warp(f1[0], up_flow1)
    out = _decoder_block(
        params["decoder1"],
        jnp.concatenate([ft_, f0w, f1w, up_flow0, up_flow1], -1),
        skip,
    )
    nf = num_flows
    d_flow0, d_flow1, mask, img_res = (
        out[..., : 2 * nf],
        out[..., 2 * nf : 4 * nf],
        out[..., 4 * nf : 5 * nf],
        out[..., 5 * nf :],
    )
    mask = jax.nn.sigmoid(mask)
    up_flow0 = d_flow0 + jnp.tile(2.0 * resize_by_scale(up_flow0, 2.0), (1, 1, 1, nf))
    up_flow1 = d_flow1 + jnp.tile(2.0 * resize_by_scale(up_flow1, 2.0), (1, 1, 1, nf))

    if scale_factor != 1.0:
        inv = 1.0 / scale_factor
        up_flow0 = resize_by_scale(up_flow0, inv) * inv
        up_flow1 = resize_by_scale(up_flow1, inv) * inv
        mask = resize_by_scale(mask, inv)
        img_res = resize_by_scale(img_res, inv)

    # multi_flow_combine (amt_arch.py:869-903), flows flattened into batch
    fh, fw = up_flow0.shape[1], up_flow0.shape[2]

    def flat(x, ch):
        return (
            x.reshape(n, fh, fw, nf, ch).transpose(0, 3, 1, 2, 4)
            .reshape(n * nf, fh, fw, ch)
        )

    fl0 = flat(up_flow0, 2)
    fl1 = flat(up_flow1, 2)
    m = flat(mask, 1)
    res = flat(img_res, 3)
    i0 = jnp.tile(img0[:, None], (1, nf, 1, 1, 1)).reshape(n * nf, fh, fw, 3)
    i1 = jnp.tile(img1[:, None], (1, nf, 1, 1, 1)).reshape(n * nf, fh, fw, 3)
    mn = jnp.tile(mean_[:, None], (1, nf, 1, 1, 1)).reshape(n * nf, 1, 1, 1)

    w0 = warp(i0, fl0)
    w1 = warp(i1, fl1)
    img_warps = m * w0 + (1 - m) * w1 + mn + res
    img_warps = img_warps.reshape(n, nf, fh, fw, 3)
    # comb_block input is the flow-major channel stack (torch view(b, -1, h, w))
    stacked = img_warps.transpose(0, 2, 3, 1, 4).reshape(n, fh, fw, nf * 3)
    pad = 3 if variant in ("L", "G") else 1
    comb = conv2d(stacked, params["comb_block"]["0"], stride=1, padding=pad)
    comb = prelu(comb, params["comb_block"]["1"])
    comb = conv2d(comb, params["comb_block"]["2"], stride=1, padding=pad)
    pred = jnp.mean(img_warps, axis=1) + comb
    return jnp.clip(pred, 0.0, 1.0)


def make_model_fn(params: Params, ckpt_name: str, dtype=jnp.float32):
    params = cast_params(params, dtype)
    cfg = CKPT_CONFIGS[ckpt_name]

    @jax.jit
    def model_fn(f0, f1, t):
        out = apply(
            params,
            f0.astype(dtype),
            f1.astype(dtype),
            t.astype(dtype),
            variant=cfg["variant"],
            num_flows=cfg["num_flows"],
        )
        return out.astype(jnp.float32)

    return model_fn
