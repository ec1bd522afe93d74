"""ST-MFNet — 4-frame 2x interpolation with multi-scale AdaCoF + softsplat.

Reference: ``vfi_models/stmfnet/stmfnet_arch.py``. Per window (I0, I1, I2, I3):

1. ``UMultiScaleResNext`` texture features over (I1, I2) — dual-kernel ResNext
   blocks (grouped convs / grouped transposed convs) with SE attention and
   BatchNorm (lines 1373-1583);
2. ``KernelEstimation`` — 18 subnets producing AdaCoF weights/offsets at three
   scales (lines 2490-2672); I1/I2 filtered by :func:`~..ops.adacof.adacof_func`
   at 1/2 (gaussian-blurred), original, and 8-tap-upsampled 2x scales;
3. an internal PWCNet (81-ch correlation via :func:`~..ops.correlation`,
   masked-zeros backwarp with the W/(W-1) flow scaling quirk, lines 38-96,
   99-582) provides bidirectional flows; ``Metric`` scores them and both frames
   are softmax-splatted to the midpoint;
4. ``MIMOGridNet`` fuses the three scale streams (lines 1636-1695);
5. ``UNet3d_18`` (R3D-18 with BatchNorm3d) generates a dynamic-texture residual
   over all four frames + the synthesis (lines 2391-2487).

Frames pad reflect to x128 (lines 2743-2757); 2x only.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.adacof import adacof_func
from ..ops.correlation import correlation_func
from ..ops.softsplat import function_softsplat
from ..ops.warp import bilinear_sample, warp
from .common import (
    cast_params,
    batch_norm,
    conv2d,
    conv3d,
    conv_transpose2d,
    conv_transpose3d,
    leaky_relu,
    linear,
    prelu,
    resize_bilinear,
    resize_by_scale,
)

Array = jnp.ndarray
Params = Dict

CKPT_NAMES = ["stmfnet.pth"]

KERNEL_SIZE = 5
DILATION = 1


# ------------------------------------------------------------------ backwarp


def _backwarp_masked(x: Array, flow: Array) -> Array:
    """stmfnet_arch.py:38-96: half-pixel grid + align_corners=False reduces to
    sampling at ``x + fx*W/(W-1)`` with zeros padding; an appended ones channel
    is binarized (>0.999) and masks the output."""
    n, h, w, c = x.shape
    fx = flow[..., 0] * (w / (w - 1.0))
    fy = flow[..., 1] * (h / (h - 1.0))
    aug = jnp.concatenate([x, jnp.ones_like(x[..., :1])], -1)
    # grid + scaled flow with zeros padding == ops.warp.warp semantics, which
    # routes to the Pallas windowed kernel (the XLA form gathered here)
    out = warp(aug, jnp.stack([fx, fy], -1), padding_mode="zeros")
    mask = (out[..., -1:] > 0.999).astype(x.dtype)
    return out[..., :-1] * mask


# ------------------------------------------------------------------ PWCNet


def _conv_lr(p: Params, x: Array, stride=1, padding=1, dilation=1) -> Array:
    return leaky_relu(
        conv2d(x, p, stride=stride, padding=padding, dilation=dilation), 0.1
    )


def _pwc_extract(p: Params, x: Array) -> List[Array]:
    feats = []
    for name in ("netOne", "netTwo", "netThr", "netFou", "netFiv", "netSix"):
        node = p[name]
        x = _conv_lr(node["0"], x, stride=2)
        x = _conv_lr(node["2"], x)
        x = _conv_lr(node["4"], x)
        feats.append(x)
    return feats


_PWC_BACKWARP = {5: 0.625, 4: 1.25, 3: 2.5, 2: 5.0}


def _pwc_decoder(p: Params, f1: Array, f2: Array, prev, level: int):
    if prev is None:
        vol = leaky_relu(correlation_func(f1, f2), 0.1)
        feat = vol
        flow = None
    else:
        flow = conv_transpose2d(prev["flow"], p["netUpflow"], stride=2, padding=1)
        up_feat = conv_transpose2d(prev["feat"], p["netUpfeat"], stride=2, padding=1)
        warped = _backwarp_masked(f2, flow * _PWC_BACKWARP[level])
        vol = leaky_relu(correlation_func(f1, warped), 0.1)
        feat = jnp.concatenate([vol, f1, flow, up_feat], -1)

    feat = jnp.concatenate([_conv_lr(p["netOne"]["0"], feat), feat], -1)
    feat = jnp.concatenate([_conv_lr(p["netTwo"]["0"], feat), feat], -1)
    feat = jnp.concatenate([_conv_lr(p["netThr"]["0"], feat), feat], -1)
    feat = jnp.concatenate([_conv_lr(p["netFou"]["0"], feat), feat], -1)
    feat = jnp.concatenate([_conv_lr(p["netFiv"]["0"], feat), feat], -1)
    flow = conv2d(feat, p["netSix"]["0"], stride=1, padding=1)
    return {"flow": flow, "feat": feat}


def _pwc_refiner(p: Params, feat: Array) -> Array:
    m = p["netMain"]
    x = _conv_lr(m["0"], feat, padding=1)
    x = _conv_lr(m["2"], x, padding=2, dilation=2)
    x = _conv_lr(m["4"], x, padding=4, dilation=4)
    x = _conv_lr(m["6"], x, padding=8, dilation=8)
    x = _conv_lr(m["8"], x, padding=16, dilation=16)
    x = _conv_lr(m["10"], x, padding=1)
    return conv2d(x, m["12"], stride=1, padding=1)


def _pwc_flow(p: Params, pyr1: List[Array], pyr2: List[Array]) -> Array:
    est = _pwc_decoder(p["netSix"], pyr1[-1], pyr2[-1], None, 6)
    est = _pwc_decoder(p["netFiv"], pyr1[-2], pyr2[-2], est, 5)
    est = _pwc_decoder(p["netFou"], pyr1[-3], pyr2[-3], est, 4)
    est = _pwc_decoder(p["netThr"], pyr1[-4], pyr2[-4], est, 3)
    est = _pwc_decoder(p["netTwo"], pyr1[-5], pyr2[-5], est, 2)
    return est["flow"] + _pwc_refiner(p["netRefiner"], est["feat"])


# ------------------------------------------------------------------ ResNext


def _se_block(p: Params, x: Array) -> Array:
    n, h, w, c = x.shape
    y = jnp.mean(x, axis=(1, 2))
    y = jax.nn.relu(linear(y, p["fc"]["0"]))
    y = jax.nn.sigmoid(linear(y, p["fc"]["2"]))
    return x * y.reshape(n, 1, 1, c)


def _resnext_block(p: Params, x: Array, down: bool, ks: int, stride: int) -> Array:
    groups = 32
    out = jax.nn.relu(batch_norm(conv2d(x, p["conv1"], padding=0), p["bn1"]))
    if down:
        out = conv2d(
            out, p["conv2"], stride=stride, padding=(ks - 1) // 2, groups=groups
        )
    else:
        out = conv_transpose2d(
            out, p["conv2"], stride=stride, padding=(ks - stride) // 2, groups=groups
        )
    out = jax.nn.relu(batch_norm(out, p["bn2"]))
    out = batch_norm(conv2d(out, p["conv3"], padding=0), p["bn3"])
    if "downsample" in p:
        if down:
            ident = conv2d(x, p["downsample"]["0"], stride=stride, padding=0)
        else:
            ident = conv_transpose2d(x, p["downsample"]["0"], stride=stride, padding=0)
        ident = batch_norm(ident, p["downsample"]["1"])
    else:
        ident = x
    return jax.nn.relu(out + ident)


def _ms_resnext(p: Params, x: Array, down: bool, ks_s, ks_l, stride) -> Array:
    small = _resnext_block(p["resnext_small"], x, down, ks_s, stride)
    large = _resnext_block(p["resnext_large"], x, down, ks_l, stride)
    return _se_block(p["attention"], jnp.concatenate([small, large], -1))


def _feature_extractor(p: Params, im0: Array, im2: Array) -> Array:
    x = jnp.concatenate([im0, im2], -1)
    c1 = _ms_resnext(p["conv1"], x, True, 3, 7, 2)
    c2 = _ms_resnext(p["conv2"], c1, True, 3, 7, 2)
    c3 = _ms_resnext(p["conv3"], c2, True, 3, 5, 2)
    c4 = _ms_resnext(p["conv4"], c3, True, 3, 5, 2)
    d4 = _ms_resnext(p["deconv4"], c4, True, 3, 5, 1)
    d3 = _ms_resnext(p["deconv3"], d4 + c4, False, 4, 6, 2)
    d2 = _ms_resnext(p["deconv2"], d3 + c3, False, 4, 8, 2)
    d1 = _ms_resnext(p["deconv1"], d2 + c2, False, 4, 8, 2)
    return d1


# ------------------------------------------------------------------ kernels


def _subnet(p: Params, x: Array, kind: str) -> Array:
    """Kernel-estimation subnets (stmfnet_arch.py:2496-2612); layer indices per
    Sequential: conv/relu x3 then optional upsample+conv, weight ends in softmax."""
    x = jax.nn.relu(conv2d(x, p["0"], padding=1))
    x = jax.nn.relu(conv2d(x, p["2"], padding=1))
    x = conv2d(x, p["4"], padding=1)
    if kind in ("offset", "weight"):
        x = jax.nn.relu(x)
        x = resize_by_scale(x, 2.0, align_corners=True)
        x = conv2d(x, p["7"], padding=1)
    elif kind in ("offset_us", "weight_us"):
        x = jax.nn.relu(x)
        x = resize_by_scale(x, 4.0, align_corners=True)
        x = conv2d(x, p["7"], padding=1)
    if kind.startswith("weight"):
        x = jax.nn.softmax(x, axis=-1)
    return x


# ------------------------------------------------------------------ upsampler


def _upsampler_8tap(gauss_like_filter: Array, im: Array) -> Array:
    """Upsampler_8tap (stmfnet_arch.py:638-676): polyphase 2x with the fixed
    8-tap filter, reflect padding (3 left, 4 right)."""
    filt = gauss_like_filter  # (3, 1, 1, 8) torch layout
    n, h, w, c = im.shape

    def hconv(x):
        pad = jnp.pad(x, ((0, 0), (0, 0), (3, 4), (0, 0)), mode="reflect")
        return conv2d(pad, {"weight": filt}, stride=1, padding=0, groups=c)

    row = hconv(im)  # [n, h, w, c] — samples at x+0.5
    colT = hconv(im.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    cross_in = jnp.zeros((n, h, w, c), im.dtype)

    up = jnp.zeros((n, 2 * h, 2 * w, c), im.dtype)
    up = up.at[:, ::2, ::2, :].set(im)
    up = up.at[:, 0::2, 1::2, :].set(row)
    up = up.at[:, 1::2, 0::2, :].set(colT)
    cross = hconv(up[:, 1::2, ::2, :])
    up = up.at[:, 1::2, 1::2, :].set(cross)
    return up


# ------------------------------------------------------------------ GridNet


def _grid_conv_pair(p: Params, x: Array, stride1: int) -> Array:
    x = prelu(x, p["0"])
    x = conv2d(x, p["1"], stride=stride1, padding=1)
    x = prelu(x, p["2"])
    return conv2d(x, p["3"], stride=1, padding=1)


def _lateral(p: Params, x: Array) -> Array:
    fx = _grid_conv_pair(p["f"], x, 1)
    if fx.shape[-1] != x.shape[-1]:
        x = conv2d(x, p["conv"], stride=1, padding=1)
    return fx + x


def _down_block(p: Params, x: Array) -> Array:
    return _grid_conv_pair(p["f"], x, 2)


def _up_block(p: Params, x: Array) -> Array:
    x = resize_by_scale(x, 2.0)
    f = p["f"]
    x = prelu(x, f["1"])
    x = conv2d(x, f["2"], stride=1, padding=1)
    x = prelu(x, f["3"])
    return conv2d(x, f["4"], stride=1, padding=1)


def _mimo_gridnet(p: Params, rows: List[Array], n_row=3, n_col=4, outrow=(1,)):
    cur = list(rows)
    half = n_col // 2
    for c in range(half):
        for r in range(n_row):
            cur[r] = _lateral(p[f"lateral_{r}_{c}"], cur[r])
            if r != 0:
                cur[r] = cur[r] + _down_block(p[f"down_{r-1}_{c}"], cur[r - 1])
    for c in range(half, n_col):
        for r in range(n_row - 1, -1, -1):
            cur[r] = _lateral(p[f"lateral_{r}_{c}"], cur[r])
            if r != n_row - 1:
                cur[r] = cur[r] + _up_block(p[f"up_{r}_{c-half}"], cur[r + 1])
    return [_lateral(p[f"lateral_final_{r}"], cur[r]) for r in outrow]


# ------------------------------------------------------------------ UNet3d


def _bn3(x: Array, node: Params) -> Array:
    return batch_norm(x, node)


def _se3(p: Params, x: Array) -> Array:
    y = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    y = conv3d(y, p["attn_layer"]["0"], stride=1, padding=0)
    return x * jax.nn.sigmoid(y)


def _r3d_block(p: Params, x: Array, stride) -> Array:
    out = jax.nn.relu(
        _bn3(conv3d(x, p["conv1"]["0"], stride=stride, padding=1), p["conv1"]["1"])
    )
    out = _bn3(conv3d(out, p["conv2"]["0"], stride=1, padding=1), p["conv2"]["1"])
    out = _se3(p["fg"], out)
    if "downsample" in p:
        x = _bn3(conv3d(x, p["downsample"]["0"], stride=stride, padding=0), p["downsample"]["1"])
    return jax.nn.relu(out + x)


def _unet3d(p: Params, i0, i1, i2, i3, tilde) -> Array:
    clip = jnp.stack([i0, i1, tilde, i2, i3], axis=1)  # NDHWC
    enc = p["encoder"]
    x0 = jax.nn.relu(
        _bn3(
            conv3d(clip, enc["stem"]["0"], stride=(1, 2, 2), padding=(1, 3, 3)),
            enc["stem"]["1"],
        )
    )
    feats = [x0]
    x = x0
    for layer, stride in (
        ("layer1", 1), ("layer2", (1, 2, 2)), ("layer3", (1, 2, 2)), ("layer4", 1)
    ):
        x = _r3d_block(enc[layer]["0"], x, stride)
        x = _r3d_block(enc[layer]["1"], x, 1)
        feats.append(x)
    x0, x1, x2, x3, x4 = feats

    dec = p["decoder"]

    # unlike FLAVR's blocks, STMFNet's Conv_3d/upConv3D append a BatchNorm3d
    # after the SEGating (stmfnet_arch.py:1093-1095,1125-1127)
    def conv3d_se(node, v):
        v = conv3d(v, node["conv"]["0"], stride=1, padding=1)
        v = _se3(node["conv"]["1"], v)
        return batch_norm(v, node["conv"]["2"])

    def up3d_se(node, v):
        v = conv_transpose3d(v, node["upconv"]["0"], stride=(1, 2, 2), padding=1)
        v = _se3(node["upconv"]["1"], v)
        return batch_norm(v, node["upconv"]["2"])

    lr = lambda v: leaky_relu(v, 0.2)
    d3 = jnp.concatenate([lr(conv3d_se(dec["0"], x4)), x3], -1)
    d2 = jnp.concatenate([lr(up3d_se(dec["1"], d3)), x2], -1)
    d1 = jnp.concatenate([lr(up3d_se(dec["2"], d2)), x1], -1)
    d0 = jnp.concatenate([lr(conv3d_se(dec["3"], d1)), x0], -1)
    dout = lr(up3d_se(dec["4"], d0))

    b, t, h, w, c = dout.shape
    fused = dout.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
    out = conv2d(fused, p["feature_fuse"]["0"], stride=1, padding=0)
    out = lr(batch_norm(out, p["feature_fuse"]["1"]))
    out = jnp.pad(out, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    return conv2d(out, p["outconv"]["1"], stride=1, padding=0)


# ------------------------------------------------------------------ model


_RGB_MEAN = (0.4631, 0.4352, 0.3990)


def _pad128(i0, i1, i2, i3):
    h0, w0 = i1.shape[1], i1.shape[2]
    pad_h = (-h0) % 128
    pad_w = (-w0) % 128
    if pad_h or pad_w:
        pad = ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
        i0, i1, i2, i3 = (jnp.pad(x, pad, mode="reflect") for x in (i0, i1, i2, i3))
    return i0, i1, i2, i3


_KSTREAMS = {
    "": (("Weight1", "weight"), ("Alpha1", "offset"), ("Beta1", "offset"),
         ("Weight2", "weight"), ("Alpha2", "offset"), ("Beta2", "offset")),
    "_ds": (("Weight1_ds", "weight_ds"), ("Alpha1_ds", "offset_ds"),
            ("Beta1_ds", "offset_ds"), ("Weight2_ds", "weight_ds"),
            ("Alpha2_ds", "offset_ds"), ("Beta2_ds", "offset_ds")),
    "_us": (("Weight1_us", "weight_us"), ("Alpha1_us", "offset_us"),
            ("Beta1_us", "offset_us"), ("Weight2_us", "weight_us"),
            ("Alpha2_us", "offset_us"), ("Beta2_us", "offset_us")),
}


def stage_feats(params: Params, i1: Array, i2: Array) -> Array:
    """Shared MS-ResNeXt feature extractor (stmfnet_arch.py:2752-2760)."""
    mean = jnp.asarray(_RGB_MEAN, i1.dtype)
    return _feature_extractor(
        params["feature_extractor"], i1 - mean, i2 - mean
    )


def stage_stream(
    params: Params, feats: Array, i1: Array, i2: Array, suffix: str
):
    """One scale stream end-to-end: its 6 kernel-prediction subnets + the two
    AdaCoF applications (stmfnet_arch.py:2761-2824 for the given scale).
    Fusing prediction+application per stream keeps the bulky per-pixel
    kernel/offset maps (the `_us` set alone is ~0.8 GB bf16 at 540p) out of
    the inter-program HBM footprint — materializing all 18 across a stage
    boundary RESOURCE_EXHAUSTED v5e."""
    h, w = i1.shape[1], i1.shape[2]
    ke = params["get_kernel"]
    k = {
        name: _subnet(ke[f"module{name}"], feats, kind)
        for name, kind in _KSTREAMS[suffix]
    }
    pad2 = ((0, 0), (2, 2), (2, 2), (0, 0))

    def adacof(img, wname, aname, bname):
        return adacof_func(
            jnp.pad(img, pad2, mode="edge"), k[wname], k[aname], k[bname], DILATION
        )

    if suffix == "_ds":
        # 1/2-scale stream with fixed gaussian blur (groups=3)
        gk = params["gauss_kernel"]  # (3,1,5,5)

        def blur(x):
            p2 = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
            return conv2d(p2, {"weight": gk}, stride=1, padding=0, groups=3)

        i1, i2 = (
            resize_bilinear(blur(i1), (h // 2, w // 2)),
            resize_bilinear(blur(i2), (h // 2, w // 2)),
        )
    elif suffix == "_us":
        # 2x-scale stream via the fixed 8-tap upsampler
        filt = params["upsampler"]["filter"]  # (3,1,1,8)
        i1, i2 = _upsampler_8tap(filt, i1), _upsampler_8tap(filt, i2)

    return (
        adacof(i1, f"Weight1{suffix}", f"Alpha1{suffix}", f"Beta1{suffix}"),
        adacof(i2, f"Weight2{suffix}", f"Alpha2{suffix}", f"Beta2{suffix}"),
    )


def stage_flowsplat(params: Params, i1: Array, i2: Array):
    """PWC flows both directions + photometric metrics + the two softmax
    splats (stmfnet_arch.py:2824-2840)."""
    h, w = i1.shape[1], i1.shape[2]
    pwc = params["flow_estimator"]
    pyr1 = _pwc_extract(pwc["netExtractor"], i1)
    pyr2 = _pwc_extract(pwc["netExtractor"], i2)
    flow_12 = 20.0 * _pwc_flow(pwc, pyr1, pyr2)
    flow_12 = resize_bilinear(flow_12, (h, w))
    flow_21 = 20.0 * _pwc_flow(pwc, pyr2, pyr1)
    flow_21 = resize_bilinear(flow_21, (h, w))

    scale = params["metric"]["paramScale"].reshape(1, 1, 1, 1)
    metric_12 = scale * jnp.mean(
        jnp.abs(i1 - _backwarp_masked(i2, flow_12)), -1, keepdims=True
    )
    metric_21 = scale * jnp.mean(
        jnp.abs(i2 - _backwarp_masked(i1, flow_21)), -1, keepdims=True
    )
    splat1 = function_softsplat(i1, 0.5 * flow_12, metric_12, "softmax")
    splat2 = function_softsplat(i2, 0.5 * flow_21, metric_21, "softmax")
    return splat1, splat2


def stage_synth(params: Params, adas, splats) -> Array:
    """MIMO-GridNet scale synthesis (stmfnet_arch.py:2841-2848)."""
    ada1, ada2, ada1_ds, ada2_ds, ada1_us, ada2_us = adas
    splat1, splat2 = splats
    rows = [
        jnp.concatenate([ada1_us, ada2_us], -1),
        jnp.concatenate([ada1, ada2, splat1, splat2], -1),
        jnp.concatenate([ada1_ds, ada2_ds], -1),
    ]
    return _mimo_gridnet(params["scale_synthesis"], rows)[0]


def stage_dyntex(params: Params, i0, i1, i2, i3, tilde) -> Array:
    """UNet3d dynamic-texture residual + sum (stmfnet_arch.py:2849-2856)."""
    dyntex = _unet3d(params["dyntex_generator"], i0, i1, i2, i3, tilde)
    return tilde + dyntex


def apply(params: Params, i0: Array, i1: Array, i2: Array, i3: Array) -> Array:
    """``STMFNet_Model.forward`` (stmfnet_arch.py:2733-2856)."""
    n, h0, w0, _ = i1.shape
    i0, i1, i2, i3 = _pad128(i0, i1, i2, i3)
    feats = stage_feats(params, i1, i2)
    ada1, ada2 = stage_stream(params, feats, i1, i2, "")
    ada1_ds, ada2_ds = stage_stream(params, feats, i1, i2, "_ds")
    ada1_us, ada2_us = stage_stream(params, feats, i1, i2, "_us")
    splats = stage_flowsplat(params, i1, i2)
    tilde = stage_synth(
        params, (ada1, ada2, ada1_ds, ada2_ds, ada1_us, ada2_us), splats
    )
    out = stage_dyntex(params, i0, i1, i2, i3, tilde)
    return out[:, :h0, :w0, :]


def make_model_fn(params: Params, dtype=jnp.float32):
    """Chained per-stage jitted programs, NOT one monolithic jit: the merged
    STMFNet program compiles pathologically (40+ min at 540p, helper HTTP 500
    at 1080p) and ran at 0.24 f/s — the same mono-jit pathology EISAI had
    (docs/PROBES_r5.md SS1). Kernel prediction + AdaCoF are fused PER SCALE
    STREAM so the 18 per-pixel kernel/offset maps never cross a program
    boundary (materializing them RESOURCE_EXHAUSTED v5e HBM)."""
    params = cast_params(params, dtype)

    feats_j = jax.jit(lambda a, b: stage_feats(params, a, b))
    stream_j = {
        sfx: jax.jit(
            functools.partial(
                lambda f, a, b, _s: stage_stream(params, f, a, b, _s), _s=sfx
            )
        )
        for sfx in ("", "_ds", "_us")
    }
    flowsplat_j = jax.jit(lambda a, b: stage_flowsplat(params, a, b))
    synth_j = jax.jit(lambda adas, splats: stage_synth(params, adas, splats))
    dyntex_j = jax.jit(
        lambda i0, i1, i2, i3, tilde: stage_dyntex(params, i0, i1, i2, i3, tilde)
    )

    def model_fn(f0, f1, f2, f3):
        h0, w0 = f1.shape[1], f1.shape[2]
        i0, i1, i2, i3 = _pad128(
            f0.astype(dtype), f1.astype(dtype), f2.astype(dtype),
            f3.astype(dtype),
        )
        feats = feats_j(i1, i2)
        adas = []
        for sfx in ("", "_ds", "_us"):
            adas.extend(stream_j[sfx](feats, i1, i2))
        ada1, ada2, ada1_ds, ada2_ds, ada1_us, ada2_us = adas
        splats = flowsplat_j(i1, i2)
        tilde = synth_j(
            (ada1, ada2, ada1_ds, ada2_ds, ada1_us, ada2_us), splats
        )
        out = dyntex_j(i0, i1, i2, i3, tilde)
        return out[:, :h0, :w0, :].astype(jnp.float32)

    return model_fn
