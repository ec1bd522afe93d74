"""IFUnet — RIFE-style flow with a UNet/CBAM feature extractor, convex flow
upsampling, RRDB fusion, and a ResynNet refinement pass.

Reference: ``vfi_models/ifunet/IFUNet_arch.py``. Three stages
(``IFUNetModel.forward``, lines 746-765):

1. ``IFUNet`` flow net: a shared ``FeatureNet`` U-Net with CBAM attention
   ("early-exit" depth per level, lines 566-598) feeds three ``IFBlock``s whose
   flows are RAFT-style convex-upsampled by x16/x8/x4 learned masks
   (``upsample_flow``, lines 627-638); optional ensemble averages a swapped-input
   second pass *without* channel-swapping the flow (lines 692-737 — literal).
2. ``RRDBNet`` fusion: ESRGAN residual-dense blocks on quarter-res warped inputs
   producing the blend mask (lines 269-329).
3. ``ResynNet`` refinement: per-input 3-block flow pyramid toward the merged
   frame plus a contextual decode, blended by a softmax over masks and the
   merged frame itself (lines 117-192).

Inputs pad to 64 (line 754-759). BatchNorm layers run with stored running stats.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..ops.warp import warp
from .common import (
    cast_params,
    batch_norm,
    conv2d,
    conv_transpose2d,
    linear,
    max_pool2d,
    prelu,
    resize_by_scale,
)

Array = jnp.ndarray
Params = Dict

CKPT_NAMES = ["IFUNet.pth"]


def _conv_p(p: Params, x: Array, stride=1, padding=1) -> Array:
    x = conv2d(x, p["0"], stride=stride, padding=padding)
    return prelu(x, p["1"])


def _conv_bn(p: Params, x: Array, stride=1) -> Array:
    x = conv2d(x, p["0"], stride=stride, padding=1)
    x = batch_norm(x, p["1"])
    return prelu(x, p["2"])


# ---------------------------------------------------------------- CBAM


def _channel_gate(p: Params, x: Array) -> Array:
    n, h, w, c = x.shape

    def mlp(v):  # v: [N, C]
        v = linear(v, p["mlp"]["1"])
        v = jax.nn.relu(v)
        return linear(v, p["mlp"]["3"])

    avg = mlp(jnp.mean(x, axis=(1, 2)))
    mx = mlp(jnp.max(x, axis=(1, 2)))
    scale = jax.nn.sigmoid(avg + mx).reshape(n, 1, 1, c)
    return x * scale


def _spatial_gate(p: Params, x: Array) -> Array:
    pooled = jnp.concatenate(
        [jnp.max(x, axis=-1, keepdims=True), jnp.mean(x, axis=-1, keepdims=True)], -1
    )
    y = conv2d(pooled, p["spatial"]["conv"], stride=1, padding=3)
    y = batch_norm(y, p["spatial"]["bn"])
    return x * jax.nn.sigmoid(y)


def _cbam(p: Params, x: Array) -> Array:
    x = _channel_gate(p["ChannelGate"], x)
    return _spatial_gate(p["SpatialGate"], x)


# ---------------------------------------------------------------- FeatureNet


def _unet_conv(p: Params, x: Array, att: bool) -> Array:
    x = _conv_p(p["conv1"], x, stride=2)
    x = _conv_p(p["conv2"], x)
    if att:
        x = _cbam(p["cbam"], x)
    return x


def _up_conv(p: Params, x1: Array, x2: Array, att: bool) -> Array:
    x1 = conv_transpose2d(x1, p["deconv"]["0"], stride=2, padding=1)
    x1 = prelu(x1, p["deconv"]["1"])
    y = _conv_p(p["conv1"], jnp.concatenate([x1, x2], -1))
    y = _conv_p(p["conv2"], y)
    if att:
        y = _cbam(p["cbam"], y)
    return y


def _feature_net(p: Params, x: Array, level: int) -> Array:
    if x.shape[-1] != 17:
        x = _conv_p(p["conv0"], x, stride=1, padding=0)
    x2 = _unet_conv(p["conv1"], x, att=False)
    x4 = _unet_conv(p["conv2"], x2, att=True)
    x8 = _unet_conv(p["conv3"], x4, att=True)
    x16 = _unet_conv(p["conv4"], x8, att=True)
    x32 = _unet_conv(p["conv5"], x16, att=True)
    y = _up_conv(p["deconv5"], x32, x16, att=True)
    if level != 0:
        y = _up_conv(p["deconv4"], y, x8, att=False)
        if level == 2:
            y = _up_conv(p["deconv3"], y, x4, att=False)
    return y


# ---------------------------------------------------------------- IFBlock


def _neighborhood9(x: Array) -> Array:
    """9 zero-padded 3x3-shifted copies, k = (dy+1)*3+(dx+1): [N,H,W,9,C]."""
    n, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        padded[:, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w, :]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ]
    return jnp.stack(taps, axis=3)


def _if_block(p: Params, x: Array, level: int, scale: float) -> Array:
    h = x
    for i in range(6):
        h = _conv_p(p["convblock"][str(i)], h)
    x = h + x
    flow = conv2d(x, p["flowconv"], stride=1, padding=1)
    mask = conv2d(x, p[f"maskconvx{level}"], stride=1, padding=0)

    # convex upsampling (IFUNet_arch.py:627-638)
    n, hh, ww, _ = flow.shape
    l = level
    taps = _neighborhood9(l * flow)  # [N,H,W,9,4]
    m = mask.reshape(n, hh, ww, 9, l * l)
    m = jax.nn.softmax(m, axis=3)
    up = jnp.einsum("nhwkc,nhwkp->nhwpc", taps, m)  # [N,H,W,l*l,4]
    up = up.reshape(n, hh, ww, l, l, 4)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh * l, ww * l, 4)
    if scale != 1.0:
        up = resize_by_scale(up, scale) * scale
    return up


# ---------------------------------------------------------------- flow net


def _ifunet_flow(p: Params, img0, img1, tmap, scale: float, ensemble: bool):
    warped0, warped1 = img0, img1
    flow: Optional[Array] = None
    levels = [16, 8, 4]
    for i in range(3):
        if flow is not None:
            x = jnp.concatenate([img0, img1, tmap, warped0, warped1], -1)
            flowtmp = flow
            if scale != 1:
                x = resize_by_scale(x, scale)
                flowtmp = resize_by_scale(flow, scale) * scale
            x = jnp.concatenate([x, flowtmp], -1)
            fmap = _feature_net(p["fmap"], x, level=i)
            flow = flow + _if_block(p[f"block{i}"], fmap, levels[i], 1.0 / scale)
            if ensemble:
                x = jnp.concatenate([img1, img0, 1 - tmap, warped0, warped1], -1)
                flowtmp = flow
                if scale != 1:
                    x = resize_by_scale(x, scale)
                    flowtmp = resize_by_scale(flow, scale) * scale
                x = jnp.concatenate([x, flowtmp], -1)
                fmap = _feature_net(p["fmap"], x, level=i)
                flow2 = flow + _if_block(p[f"block{i}"], fmap, levels[i], 1.0 / scale)
                flow = (flow + flow2) / 2
        else:
            x = jnp.concatenate([img0, img1, tmap], -1)
            if scale != 1:
                x = resize_by_scale(x, scale)
            fmap = _feature_net(p["fmap"], x, level=i)
            flow = _if_block(p["block0"], fmap, 16, 1.0 / scale)
            if ensemble:
                x = jnp.concatenate([img1, img0, 1 - tmap], -1)
                if scale != 1:
                    x = resize_by_scale(x, scale)
                fmap = _feature_net(p["fmap"], x, level=i)
                flow2 = _if_block(p["block0"], fmap, 16, 1.0 / scale)
                flow = (flow + flow2) / 2
        warped0 = warp(img0, flow[..., :2])
        warped1 = warp(img1, flow[..., 2:4])
    return flow, warped0, warped1


# ---------------------------------------------------------------- RRDB fusion


def _rdb(p: Params, x: Array) -> Array:
    lr = lambda v: jnp.where(v >= 0, v, 0.2 * v)
    x1 = lr(conv2d(x, p["conv1"], padding=1))
    x2 = lr(conv2d(jnp.concatenate([x, x1], -1), p["conv2"], padding=1))
    x3 = lr(conv2d(jnp.concatenate([x, x1, x2], -1), p["conv3"], padding=1))
    x4 = lr(conv2d(jnp.concatenate([x, x1, x2, x3], -1), p["conv4"], padding=1))
    x5 = conv2d(jnp.concatenate([x, x1, x2, x3, x4], -1), p["conv5"], padding=1)
    return x5 * 0.2 + x


def _rrdb(p: Params, x: Array) -> Array:
    out = _rdb(p["rdb1"], x)
    out = _rdb(p["rdb2"], out)
    out = _rdb(p["rdb3"], out)
    return out * 0.2 + x


def _rrdbnet(p: Params, img0, img1, w0, w1, flow) -> Array:
    lr = lambda v: jnp.where(v >= 0, v, 0.2 * v)
    x = jnp.concatenate([img0, img1, w0, w1], -1)
    x = resize_by_scale(x, 0.25)
    flow = resize_by_scale(flow, 0.25) * 0.25
    feat = conv2d(jnp.concatenate([x, flow], -1), p["conv_first"], padding=1)
    body = feat
    for i in range(6):
        body = _rrdb(p["body"][str(i)], body)
    feat = feat + conv2d(body, p["conv_body"], padding=1)
    feat = lr(conv2d(resize_by_scale(feat, 2.0, mode="nearest"), p["conv_up1"], padding=1))
    feat = lr(conv2d(resize_by_scale(feat, 2.0, mode="nearest"), p["conv_up2"], padding=1))
    out = conv2d(lr(conv2d(feat, p["conv_hr"], padding=1)), p["conv_last"], padding=1)
    return jax.nn.sigmoid(out)


# ---------------------------------------------------------------- ResynNet


def _flow_block(p: Params, x: Array, flow: Optional[Array], scale: float):
    x = resize_by_scale(x, 1.0 / scale)
    if flow is not None:
        flow = resize_by_scale(flow, 1.0 / scale) * (1.0 / scale)
        x = jnp.concatenate([x, flow], -1)
    f = x
    for i in range(3):
        f = _conv_bn(p["conv0"][str(i)], f, stride=2)
    h = f
    for i in range(6):
        h = _conv_bn(p["convblock"][str(i)], h)
    f = h + f
    tmp = conv_transpose2d(f, p["lastconv"], stride=2, padding=1)
    tmp = resize_by_scale(tmp, scale * 4)
    return tmp[..., :2] * (scale * 4), tmp[..., 2:3]


def _calflow(p: Params, img0: Array, lowres: Array, scales: List[int]):
    flow = None
    mask = None
    warped = None
    for i in range(3):
        node = p[f"block{i}"]
        if flow is not None:
            fd, md = _flow_block(
                node, jnp.concatenate([img0, lowres, warped, mask], -1), flow, scales[i]
            )
            flow = flow + fd
            mask = mask + md
        else:
            flow, mask = _flow_block(
                node, jnp.concatenate([img0, lowres], -1), None, scales[i]
            )
        warped = warp(img0, flow)
    flow_down = resize_by_scale(flow, 0.25) * 0.25
    c0 = warp(_ctx(p["context0"], img0), flow_down)
    c1 = _ctx(p["context1"], warped)
    dec = jnp.concatenate([c0, c1], -1)
    dec = conv_transpose2d(dec, p["decode"]["0"], stride=2, padding=1)
    dec = conv_transpose2d(dec, p["decode"]["1"], stride=2, padding=1)
    warped = warped + jnp.tanh(dec)
    return flow, mask, jnp.clip(warped, 0.0, 1.0)


def _ctx(p: Params, x: Array) -> Array:
    x = _conv_p(p["0"], x, stride=2)
    return _conv_p(p["1"], x, stride=2)


def _resynnet(p: Params, imgs: Array, deg: Array, scales: List[int]) -> Array:
    n_imgs = imgs.shape[-1] // 3
    warped_list, mask_list = [], []
    for i in range(n_imgs):
        img = imgs[..., 3 * i : 3 * i + 3]
        _, m, w = _calflow(p, img, deg, scales)
        mask_list.append(m)
        warped_list.append(w)
    mask_list.append(mask_list[-1] * 0)
    warped_list.append(deg)
    mask = jax.nn.softmax(
        jnp.clip(jnp.concatenate(mask_list, -1), -4.0, 4.0), axis=-1
    )
    merged = 0.0
    for i in range(n_imgs + 1):
        merged = merged + warped_list[i] * mask[..., i : i + 1]
    return merged


# ---------------------------------------------------------------- full model


def apply(
    params: Params,
    img0: Array,
    img1: Array,
    timestep,
    scale: float = 1.0,
    ensemble: bool = False,
) -> Array:
    """``IFUNetModel.forward`` (IFUNet_arch.py:753-765)."""
    n, h, w, _ = img0.shape
    ph = ((h - 1) // 64 + 1) * 64
    pw = ((w - 1) // 64 + 1) * 64
    pad = ((0, 0), (0, ph - h), (0, pw - w), (0, 0))
    img0 = jnp.pad(img0, pad)
    img1 = jnp.pad(img1, pad)

    tmap = jnp.broadcast_to(
        jnp.asarray(timestep, img0.dtype).reshape(-1, 1, 1, 1), (n, ph, pw, 1)
    )

    flow, w0, w1 = _ifunet_flow(
        params["flownet"], img0, img1, tmap, scale, ensemble
    )
    mask = _rrdbnet(params["fusionnet"], img0, img1, w0, w1, flow)
    merged = w0 * mask + w1 * (1 - mask)
    imgs = jnp.concatenate([img0, img1], -1)
    merged = _resynnet(params["refinenet"], imgs, merged, [4, 2, 1])
    return merged[:, :h, :w, :]


def make_model_fn(
    params: Params, scale: float = 1.0, ensemble: bool = False, dtype=jnp.float32
):
    params = cast_params(params, dtype)
    @jax.jit
    def model_fn(f0, f1, t):
        out = apply(
            params,
            f0.astype(dtype),
            f1.astype(dtype),
            t.astype(dtype),
            scale=scale,
            ensemble=ensemble,
        )
        return out.astype(jnp.float32)

    return model_fn
