"""ATM-VFI — Attention-To-Motion transformer interpolation (base and lite).

Reference: ``vfi_models/atm/{network_base,network_lite,attention,flow_warp}.py``.
A 4-level conv pyramid feeds a cross-scale feature fusion; windowed
"attention-to-motion" transformer blocks (regular + shifted) read bidirectional
flows directly out of the attention maps (attention-weighted relative
coordinates, ``attention.py:126-215``); an optional coarse global-motion pass
(optionally ensembled over 3 input scales with per-sample photometric selection,
``network_base.py:547-580``) pre-aligns the inputs; Swin RefineBottlenecks
enhance features, a deconv pyramid upscales motion+features to full resolution,
and a U-Net refinement head adds a residual (``network_base.py:406-543``).

Window padding masks, shift masks and relative-coordinate tensors are static per
shape and precomputed host-side in numpy. All attention is batched matmul.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.warp import warp
from .common import (
    cast_params,
    conv2d,
    conv_transpose2d,
    linear,
    prelu,
    resize_by_scale,
)

Array = jnp.ndarray
Params = Dict

CKPT_NAMES = ["atm-vfi-base.pt", "atm-vfi-lite.pt", "atm-vfi-base-pct.pt"]

_CFG = {
    "base": {"dims": [24, 48, 96, 192], "mlp_ratio": 4.0, "local_hidden_frac": 0.75,
             "last_extra": 96, "global_hidden": 768},
    "lite": {"dims": [16, 32, 64, 96], "mlp_ratio": 2.0, "local_hidden_frac": 0.5,
             "last_extra": 32, "global_hidden": None},
}

LOCAL_WINDOW = 8
GLOBAL_WINDOW = 12
NUM_HEADS = 8


def variant_for_ckpt(ckpt_name: str) -> str:
    return "lite" if "lite" in ckpt_name else "base"


def _layer_norm(x: Array, node: Params) -> Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * node["weight"] + node["bias"]


def _conv_p(p: Params, x: Array, stride=1, padding=1, dilation=1) -> Array:
    x = conv2d(x, p["0"], stride=stride, padding=padding, dilation=dilation)
    return prelu(x, p["1"])


def _deconv_p(p: Params, x: Array, k=4, stride=2, padding=1) -> Array:
    x = conv_transpose2d(x, p["0"], stride=stride, padding=padding)
    return prelu(x, p["1"])


def _flow_warp(x: Array, flow: Array) -> Array:
    """flow_warp.py: zeros padding, align_corners=True → pixel offsets."""
    return warp(x, flow, padding_mode="zeros")


def _upsample_flow(flow: Array, factor: int) -> Array:
    return resize_by_scale(flow, float(factor), align_corners=True) * factor


# ---------------------------------------------------------------- windows


def _window_partition(x: Array, ws: Tuple[int, int]) -> Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws[0], ws[0], w // ws[1], ws[1], c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws[0] * ws[1], c)


def _window_reverse(win: Array, ws: Tuple[int, int], h: int, w: int) -> Array:
    nwb, n, c = win.shape
    b = nwb // ((h // ws[0]) * (w // ws[1]))
    x = win.reshape(b, h // ws[0], w // ws[1], ws[0], ws[1], c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _pad_sizes(h: int, w: int, ws: Tuple[int, int]):
    ph = math.ceil(h / ws[0]) * ws[0] - h
    pw = math.ceil(w / ws[1]) * ws[1] - w
    return ph, pw


def _boundary_region_mask(h: int, w: int, ws, ph: int, pw: int) -> np.ndarray:
    """pad_if_needed's window mask (attention.py:28-63) in numpy."""
    img = np.zeros((h + ph, w + pw), np.float32)
    cnt = 0
    for hs in (slice(0, ph // 2), slice(ph // 2, h + ph // 2), slice(h + ph // 2, None)):
        for wsl in (slice(0, pw // 2), slice(pw // 2, w + pw // 2), slice(w + pw // 2, None)):
            img[hs, wsl] = cnt
            cnt += 1
    hp, wp = h + ph, w + pw
    win = img.reshape(hp // ws[0], ws[0], wp // ws[1], ws[1]).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws[0] * ws[1])
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _shift_mask_np(hp: int, wp: int, ws, ss) -> np.ndarray:
    img = np.zeros((hp, wp), np.float32)
    cnt = 0
    for hs in (slice(0, -ws[0]), slice(-ws[0], -ss[0]), slice(-ss[0], None)):
        for wsl in (slice(0, -ws[1]), slice(-ws[1], -ss[1]), slice(-ss[1], None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(hp // ws[0], ws[0], wp // ws[1], ws[1]).transpose(0, 2, 1, 3)
    win = win.reshape(-1, ws[0] * ws[1])
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _attn_masks(h: int, w: int, window: int, shift: int) -> Optional[np.ndarray]:
    """Combined pad-boundary + shift mask per (shape, window, shift)."""
    ws = (window, window)
    ph, pw = _pad_sizes(h, w, ws)
    pad_mask = _boundary_region_mask(h, w, ws, ph, pw) if (ph or pw) else None
    if shift:
        sm = _shift_mask_np(h + ph, w + pw, ws, (shift, shift))
        if pad_mask is not None:
            sm = np.where(pad_mask != 0, -100.0, sm)
        return sm
    return pad_mask


def _relative_coord(ws: int) -> np.ndarray:
    """AttentionToMotion relative coordinates [2, N, N] (attention.py:152-166)."""
    rc = np.zeros((2, ws * ws, ws * ws), np.float32)
    for y in range(ws):
        for x in range(ws):
            vx = np.linspace(-x, ws - (x + 1), ws, dtype=np.float32)
            vy = np.linspace(-y, ws - (y + 1), ws, dtype=np.float32)
            xx, yy = np.meshgrid(vx, vy)
            rc[0, y * ws + x] = xx.flatten()
            rc[1, y * ws + x] = yy.flatten()
    return rc


# ---------------------------------------------------------------- attention


def _mha(q: Array, k: Array, v: Array, heads: int, mask) -> Tuple[Array, Array]:
    """Windowed MHA returning (output, attention probabilities)."""
    b, n, c = q.shape
    hd = c // heads
    q = q.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd**-0.5)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(b // nw, nw, heads, n, n) + mask[None, :, None]
        attn = attn.reshape(b, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(b, n, c)
    return out, attn


def _attention_to_motion(p: Params, x1, x2, window: int, mask):
    """AttentionToMotion.forward (attention.py:190-215)."""
    b, n, c = x1.shape
    q = linear(x1, p["q"])
    kv = linear(x2, p["kv"])
    k, v = kv[..., :c], kv[..., c:]
    out, attn = _mha(q, k, v, NUM_HEADS, mask)
    out = linear(out, p["proj"])

    rc = jnp.asarray(_relative_coord(window))  # [2, N, N]
    motion = jnp.einsum("bhqk,cqk->bhcq", attn, rc)  # [B, heads, 2, N]
    # shared head-mlp applied to x and y expectation stacks
    m = motion.transpose(0, 2, 3, 1).reshape(b * 2, n, NUM_HEADS)
    m = linear(m, p["mlp"]["0"])
    m = jax.nn.gelu(m, approximate=False)
    m = linear(m, p["mlp"]["2"])  # [2B, N, 1]
    motion = m.reshape(b, 2, n).transpose(0, 2, 1)  # [B, N, 2]
    return out, motion


def _mlp_dw(p: Params, x: Array, h: int, w: int) -> Array:
    """Mlp with depthwise conv (attention.py:90-125)."""
    b, n, c_in = x.shape
    x = linear(x, p["fc1"])
    ch = x.shape[-1]
    xs = x.reshape(b, h, w, ch)
    xs = conv2d(xs, p["dwconv"]["dwconv"], stride=1, padding=1, groups=ch)
    x = xs.reshape(b, n, ch)
    x = jax.nn.gelu(x, approximate=False)
    return linear(x, p["fc2"])


def _atmformer(p: Params, x: Array, window: int, shift: int):
    """ATMFormer.forward (attention.py:265-335). x: [2B, H, W, C]."""
    b2, h, w, c = x.shape
    ws = (window, window)
    ph, pw = _pad_sizes(h, w, ws)
    mask = _attn_masks(h, w, window, shift)
    mask_j = jnp.asarray(mask) if mask is not None else None
    xp = x
    if ph or pw:
        xp = jnp.pad(
            x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
        )
    if shift:
        xp = jnp.roll(xp, (-shift, -shift), axis=(1, 2))
    hp, wp = xp.shape[1], xp.shape[2]
    xw = _window_partition(xp, ws)
    xn = _layer_norm(xw, p["norm1"])
    nwb = xn.shape[0]
    x_rev = jnp.concatenate([xn[nwb // 2 :], xn[: nwb // 2]], axis=0)
    x_app, x_motion = _attention_to_motion(p["attn"], xn, x_rev, window, mask_j)
    xn = xn + x_app
    xb = _window_reverse(xn, ws, hp, wp)
    xm = _window_reverse(x_motion, ws, hp, wp)
    if shift:
        xb = jnp.roll(xb, (shift, shift), axis=(1, 2))
        xm = jnp.roll(xm, (shift, shift), axis=(1, 2))
    if ph or pw:
        xb = xb[:, ph // 2 : ph // 2 + h, pw // 2 : pw // 2 + w, :]
        xm = xm[:, ph // 2 : ph // 2 + h, pw // 2 : pw // 2 + w, :]
    xf = xb.reshape(b2, h * w, c)
    xmf = xm.reshape(b2, h * w, 2)
    xf = xf + _mlp_dw(p["mlp"], _layer_norm(xf, p["norm2"]), h, w)
    return xf, xmf


def _refine_bottleneck(p: Params, x: Array, window: int, shift: int) -> Array:
    """RefineBottleneck.forward (attention.py:433-497). x: [B, H, W, C]."""
    b, h, w, c = x.shape
    ws = (window, window)
    ph, pw = _pad_sizes(h, w, ws)
    mask = _attn_masks(h, w, window, shift)
    mask_j = jnp.asarray(mask) if mask is not None else None
    xp = x
    if ph or pw:
        xp = jnp.pad(
            x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
        )
    if shift:
        xp = jnp.roll(xp, (-shift, -shift), axis=(1, 2))
    hp, wp = xp.shape[1], xp.shape[2]
    xw = _window_partition(xp, ws)
    xn = _layer_norm(xw, p["norm1"])
    qkv = linear(xn, p["attn"]["qkv"])
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    out, _ = _mha(q, k, v, NUM_HEADS, mask_j)
    out = linear(out, p["attn"]["proj"])
    xn = xn + out
    xb = _window_reverse(xn, ws, hp, wp)
    if shift:
        xb = jnp.roll(xb, (shift, shift), axis=(1, 2))
    if ph or pw:
        xb = xb[:, ph // 2 : ph // 2 + h, pw // 2 : pw // 2 + w, :]
    xf = xb.reshape(b, h * w, c)
    xf = xf + _mlp_dw(p["mlp"], _layer_norm(xf, p["norm2"]), h, w)
    return xf


# ---------------------------------------------------------------- fusion


def _cross_scale_fusion(p: Params, xs: List[Array]):
    """CrossScaleFeatureFusion.forward (network_base.py:74-87)."""
    ys = []
    k = 0
    for i in range(len(xs) - 1):
        for j in range(2**i):
            ys.append(
                conv2d(
                    xs[-2 - i], p["layers"][str(k)], stride=2 ** (i + 1),
                    padding=1 + j, dilation=1 + j,
                )
            )
            k += 1
    ys.append(xs[-1])
    x = conv2d(jnp.concatenate(ys, -1), p["proj"], stride=1, padding=0)
    b, h, w, c = x.shape
    x = _layer_norm(x.reshape(b, h * w, c), p["norm"])
    return x, h, w


# ---------------------------------------------------------------- network


def _feat_extract(p: Params, x: Array):
    feats = []
    for i in range(4):
        node = p["feat_extracts"][str(i)]
        x = _conv_p(node["0"], x, stride=1 if i == 0 else 2)
        x = _conv_p(node["1"], x, stride=1)
        if i != 0:
            feats.append(x)
    return x, feats


def _estimate_local_motion(p: Params, feat: Array):
    """estimate_local_motion (network_base.py:345-366). feat: [2B, H, W, C]."""
    b2, h, w, c = feat.shape
    motions = []
    x = feat
    for k, shift in enumerate((0, LOCAL_WINDOW // 2)):
        node = p["local_motion_atmformer"][str(k)]
        xf, xm = _atmformer(node, x, LOCAL_WINDOW, shift)
        x = xf.reshape(b2, h, w, c)
        b = b2 // 2
        xm = jnp.concatenate([xm[:b], xm[b:]], axis=-1)  # [B, L, 4]
        motions.append(xm)
    b = b2 // 2
    xflat = x.reshape(b2, h * w, c)
    feat_concat = jnp.concatenate([xflat[:b], xflat[b:]], axis=-1).reshape(
        b, h, w, 2 * c
    )
    motion = jnp.concatenate(motions, axis=-1).reshape(b, h, w, 8)
    out = jnp.concatenate([motion, feat_concat], -1)
    out = _conv_p(p["local_motion_mlp"]["0"], out)
    out = _conv_p(p["local_motion_mlp"]["1"], out)
    out = conv2d(out, p["local_motion_mlp"]["2"], stride=1, padding=0)
    flow0 = out[..., :2]
    flow1 = out[..., 2:4]
    occ = jax.nn.sigmoid(out[..., 4:5])
    return flow0, flow1, occ, xflat, out


def _estimate_global_motion(p: Params, x: Array, feat_scale_level: List[Array]):
    """estimate_global_motion (network_base.py:368-392)."""
    feat_last = _conv_p(p["last_feat_extract"]["0"], x, stride=2)
    feat_last = _conv_p(p["last_feat_extract"]["1"], feat_last, stride=1)
    levels = feat_scale_level[1:] + [feat_last]
    feat_, h_, w_ = _cross_scale_fusion(p["global_feature_fusion"], levels)
    b2 = feat_.shape[0]
    c = feat_.shape[-1]
    xg = feat_.reshape(b2, h_, w_, c)
    motions = []
    for k, shift in enumerate((0, GLOBAL_WINDOW // 2)):
        node = p["global_motion_atmformer"][str(k)]
        xf, xm = _atmformer(node, xg, GLOBAL_WINDOW, shift)
        xg = xf.reshape(b2, h_, w_, c)
        b = b2 // 2
        motions.append(jnp.concatenate([xm[:b], xm[b:]], axis=-1))
    b = b2 // 2
    feat_cat = jnp.concatenate(
        [xg[:b], xg[b:]], axis=-1
    )
    motion = jnp.concatenate(motions, axis=-1).reshape(b, h_, w_, 8)
    out = jnp.concatenate([motion, feat_cat], -1)
    out = _conv_p(p["global_motion_mlp"]["0"], out)
    out = _conv_p(p["global_motion_mlp"]["1"], out)
    out = conv2d(out, p["global_motion_mlp"]["2"], stride=1, padding=0)
    return out[..., :2], out[..., 2:4], jax.nn.sigmoid(out[..., 4:5])


def _residual_refinement(p: Params, feat, im0, it0, im1, it1, it, dec_feats):
    """residual_refinement (network_base.py:394-410)."""
    f0 = jnp.concatenate([feat, im0, it0, im1, it1, it], -1)
    f0 = _conv_p(p["proj"], f0)
    f1 = _conv_p(p["down1"]["0"], f0, stride=2)
    f2 = _conv_p(
        p["down2"]["0"], jnp.concatenate([f1, dec_feats.pop()], -1), stride=2
    )
    f2 = _conv_p(p["down2"]["1"], f2)
    f3 = _conv_p(
        p["down3"]["0"], jnp.concatenate([f2, dec_feats.pop()], -1), stride=2
    )
    f3 = _conv_p(p["down3"]["1"], f3)
    f3 = _conv_p(p["down3"]["2"], f3)
    f2_ = _deconv_p(p["up1"]["0"], f3, k=2, stride=2, padding=0)
    f2_ = _conv_p(p["up1"]["1"], f2_)
    f1_ = _deconv_p(p["up2"]["0"], jnp.concatenate([f2_, f2], -1), k=2, stride=2, padding=0)
    f1_ = _conv_p(p["up2"]["1"], f1_)
    f0_ = _deconv_p(p["up3"]["0"], jnp.concatenate([f1_, f1], -1), k=2, stride=2, padding=0)
    res = _conv_p(p["refine_head"]["0"], jnp.concatenate([f0_, f0], -1))
    res = _conv_p(p["refine_head"]["1"], res)
    return 2.0 * jax.nn.sigmoid(res) - 1.0


def _global_alignmentness(flow0, flow1, im0, im1):
    h0 = im0.shape[1]
    factor = h0 // flow0.shape[1]
    f0 = _upsample_flow(flow0, factor)
    f1 = _upsample_flow(flow1, factor)
    w0 = _flow_warp(im0, f0)
    w1 = _flow_warp(im1, f1)
    return jnp.mean(jnp.abs(w0 - w1), axis=(1, 2, 3))


def apply(
    params: Params,
    im0: Array,
    im1: Array,
    timestep=None,
    variant: str = "base",
    global_motion: bool = True,
    ensemble_global_motion: bool = False,
) -> Array:
    """Network.forward (network_base.py:433-543 / 601-713 for the ensemble).
    ``timestep`` ignored — ATM synthesizes the midpoint (bisection schedule).
    Inputs pre-padded to 64 (the node pads per call)."""
    del timestep
    cfg = _CFG[variant]
    fused_dim = cfg["dims"][-1] + cfg["dims"][-2] + 2 * cfg["dims"][-3]
    fused_dims = [fused_dim, fused_dim // 2, fused_dim // 4, 2 * fused_dim]
    b = im0.shape[0]

    im0_list = [im0]
    im1_list = [im1]
    for _ in range(3):
        im0_list.append(resize_by_scale(im0_list[-1], 0.5, align_corners=True))
        im1_list.append(resize_by_scale(im1_list[-1], 0.5, align_corners=True))

    both = jnp.concatenate([im0, im1], axis=0)
    feat_, feat_scale_level = _feat_extract(params, both)
    feat, h, w = _cross_scale_fusion(params["cross_scale_feature_fusion"], feat_scale_level)

    if global_motion:
        if ensemble_global_motion:
            gflow0, gflow1 = _multiscale_global_ensemble(params, im0, im1)
        else:
            gflow0, gflow1, gocc = _estimate_global_motion(
                params, feat_, feat_scale_level
            )
        gflow0 = _upsample_flow(gflow0, 2)
        gflow1 = _upsample_flow(gflow1, 2)
        fmap = feat.reshape(2 * b, h, w, -1)
        f0w = _flow_warp(fmap[:b], gflow0)
        f1w = _flow_warp(fmap[b:], gflow1)
        feat4d = jnp.concatenate([f0w, f1w], axis=0)
        for i in reversed(range(4)):
            im0_list[i] = _flow_warp(im0_list[i], gflow0)
            im1_list[i] = _flow_warp(im1_list[i], gflow1)
            if i != 0:
                gflow0 = _upsample_flow(gflow0, 2)
                gflow1 = _upsample_flow(gflow1, 2)
    else:
        feat4d = feat.reshape(2 * b, h, w, -1)

    flow0, flow1, occ1, featx, out = _estimate_local_motion(params, feat4d)
    occ2 = 1.0 - occ1

    # shared_feat_enhancement (network_base.py:334-344)
    x = featx.reshape(2 * b, h, w, -1)
    for k, shift in enumerate((0, LOCAL_WINDOW // 2)):
        node = params["feat_enhance_transformer"][str(k)]
        xf = _refine_bottleneck(node, x, LOCAL_WINDOW, shift)
        x = xf.reshape(2 * b, h, w, -1)
    feat_enh = jnp.concatenate([x[:b], x[b:]], axis=-1)  # [B, h, w, 2C]

    it0 = _flow_warp(im0_list[-1], flow0)
    it1 = _flow_warp(im1_list[-1], flow1)
    it = occ1 * it0 + occ2 * it1

    f1w = _flow_warp(feat_enh[..., : fused_dims[0]], flow0)
    f2w = _flow_warp(feat_enh[..., fused_dims[0] : fused_dims[-1]], flow1)
    feat_cur = jnp.concatenate([f1w, f2w, out], -1)

    dec_feats = []
    for i, scale in enumerate(reversed(range(3))):
        node = params["upsample_pyramid"][str(i)]
        if i == 0:
            x = _deconv_p(node["0"], feat_cur, k=2, stride=2, padding=0)
            x = _conv_p(node["1"], x)
            x = conv2d(x, node["2"], stride=1, padding=1)
        else:
            x = prelu(feat_cur, node["0"])
            x = _deconv_p(node["1"], x, k=2, stride=2, padding=0)
            x = _conv_p(node["2"], x)
            x = conv2d(x, node["3"], stride=1, padding=1)
        feat_cur = x
        out_m = feat_cur[..., -5:]
        flow0 = out_m[..., :2]
        flow1 = out_m[..., 2:4]
        occ1 = jax.nn.sigmoid(out_m[..., 4:5])
        occ2 = 1.0 - occ1
        if scale != 0:
            dec_feats.append(feat_cur[..., :-5])
        it0 = _flow_warp(im0_list[scale], flow0)
        it1 = _flow_warp(im1_list[scale], flow1)
        it = occ1 * it0 + occ2 * it1

    res = _residual_refinement(params, feat_cur, im0, it0, im1, it1, it, dec_feats)
    return jnp.clip(it + res, 0.0, 1.0)


def _multiscale_global_ensemble(params: Params, im0: Array, im1: Array):
    """multiscale_global_motion_ensemble (network_base.py:547-580): run the
    global estimator at 3 input scales, pick per-sample by photometric loss."""
    b = im0.shape[0]
    im = jnp.concatenate([im0, im1], axis=0)
    flows = []
    losses = []
    for lvl in range(3):
        if lvl > 0:
            im = resize_by_scale(im, 0.5, align_corners=True)
        feat_, levels = _feat_extract(params, im)
        f0, f1, _ = _estimate_global_motion(params, feat_, levels)
        if lvl > 0:
            f0u = _upsample_flow(f0, 2**lvl)
            f1u = _upsample_flow(f1, 2**lvl)
        else:
            f0u, f1u = f0, f1
        flows.append((f0u, f1u))
        losses.append(_global_alignmentness(f0, f1, im0, im1))
    loss = jnp.stack(losses, axis=0)  # [3, B]
    best = jnp.argmin(loss, axis=0)  # [B]
    sel0 = jnp.stack([f[0] for f in flows], 0)  # [3, B, h, w, 2]
    sel1 = jnp.stack([f[1] for f in flows], 0)
    idx = best[None, :, None, None, None]
    f0 = jnp.take_along_axis(sel0, jnp.broadcast_to(idx, (1,) + sel0.shape[1:]), 0)[0]
    f1 = jnp.take_along_axis(sel1, jnp.broadcast_to(idx, (1,) + sel1.shape[1:]), 0)[0]
    return f0, f1


def make_model_fn(
    params: Params,
    variant: str = "base",
    global_motion: bool = True,
    ensemble_global_motion: bool = False,
    dtype=jnp.float32,
):
    params = cast_params(params, dtype)
    @jax.jit
    def model_fn(f0, f1, t):
        n, h, w, _ = f0.shape
        ph = (-h) % 64
        pw = (-w) % 64
        top, left = ph // 2, pw // 2
        x0 = jnp.pad(
            f0.astype(dtype),
            ((0, 0), (top, ph - top), (left, pw - left), (0, 0)),
            mode="edge",
        )
        x1 = jnp.pad(
            f1.astype(dtype),
            ((0, 0), (top, ph - top), (left, pw - left), (0, 0)),
            mode="edge",
        )
        out = apply(
            params, x0, x1, t, variant=variant,
            global_motion=global_motion,
            ensemble_global_motion=ensemble_global_motion,
        )
        out = out[:, top : top + h, left : left + w, :]
        return jnp.clip(out, 0.0, 1.0).astype(jnp.float32)

    return model_fn
