"""GMFSS Fortuna — anime-specialist VFI (base and union variants).

Reference: ``vfi_models/gmfss_fortuna/GMFSS_Fortuna_arch.py`` (+``_union_arch``).
Four sub-networks (``Model``, lines 1691-1857):

* ``GMFlow`` — CNN encoder (InstanceNorm residual blocks + trident conv for two
  scales), a 6-layer shared Swin-window FeatureTransformer over both frames
  (shifted windows on odd layers), global/local correlation softmax matching,
  feature-flow self-attention propagation, and RAFT-style convex x4 upsampling;
  run bidirectionally at half resolution (lines 69-1375).
* ``MetricNet`` — occlusion metrics from photometric error, forward/backward
  consistency occlusion and normalized flows (lines 1421-1468).
* ``FeatureNet`` — 3-scale features of each full-res frame (lines 1471-1501).
* softmax splatting of images + 3 feature scales to time t, fused by a
  ``GridNet`` with a PixelShuffle tail (lines 1583-1688, 1779-1849).

The union variant additionally runs a frozen RIFE 4.6 IFNet on the half-res pair
and feeds its prediction into the fusion head (9-channel head, union arch diff).

All attention/correlation is plain batched matmul — MXU-native. Attention masks
and positional encodings are static per shape and precomputed host-side.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.softsplat import softsplat
from ..ops.warp import bilinear_sample, warp
from .common import (
    cast_params,
    conv2d,
    conv_transpose2d,
    linear,
    pixel_shuffle,
    prelu,
    resize_by_scale,
)
from . import rife as rife_model

Array = jnp.ndarray
Params = Dict

CKPTS = ["GMFSS_fortuna", "GMFSS_fortuna_union"]


def _instance_norm(x: Array) -> Array:
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


def _layer_norm(x: Array, node: Params) -> Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    return out * node["weight"] + node["bias"]


# ---------------------------------------------------------------- CNN encoder


def _res_block(p: Params, x: Array, stride: int, dilation: int = 1) -> Array:
    y = jax.nn.relu(
        _instance_norm(conv2d(x, p["conv1"], stride=stride, padding=dilation, dilation=dilation))
    )
    y = jax.nn.relu(
        _instance_norm(conv2d(y, p["conv2"], stride=1, padding=dilation, dilation=dilation))
    )
    if "downsample" in p:
        x = _instance_norm(conv2d(x, p["downsample"]["0"], stride=stride, padding=0))
    return jax.nn.relu(x + y)


def _cnn_encoder(p: Params, x: Array, num_scales: int = 2) -> List[Array]:
    x = jax.nn.relu(_instance_norm(conv2d(x, p["conv1"], stride=2, padding=3)))
    for layer, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2 if num_scales == 1 else 1)):
        x = _res_block(p[layer]["0"], x, stride)
        x = _res_block(p[layer]["1"], x, 1)
    x = conv2d(x, p["conv2"], stride=1, padding=0)
    if num_scales > 1:
        # trident conv: shared weight, per-branch stride (high→low res)
        strides = (1, 2) if num_scales == 2 else (1, 2, 4)
        w = {"weight": p["trident_conv"]["weight"]}
        return [conv2d(x, w, stride=s, padding=1) for s in strides]
    return [x]


# ---------------------------------------------------------------- attention


def _split_windows(x: Array, k: int) -> Array:
    """[B, H, W, C] → [B*k*k, H/k, W/k, C] (reference split_feature)."""
    b, h, w, c = x.shape
    x = x.reshape(b, k, h // k, k, w // k, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * k * k, h // k, w // k, c)


def _merge_windows(x: Array, k: int) -> Array:
    b, h, w, c = x.shape
    nb = b // (k * k)
    x = x.reshape(nb, k, k, h, w, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(nb, k * h, k * w, c)


def _shift_window_mask(h: int, w: int, k: int) -> np.ndarray:
    """generate_shift_window_attn_mask (lines 327-366), computed in numpy."""
    wh, ww = h // k, w // k
    sh, sw = wh // 2, ww // 2
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -sh), slice(-sh, None)):
        for ws in (slice(0, -ww), slice(-ww, -sw), slice(-sw, None)):
            img[hs, ws] = cnt
            cnt += 1
    # split into k*k windows
    win = img.reshape(k, wh, k, ww).transpose(0, 2, 1, 3).reshape(k * k, wh * ww)
    diff = win[:, None, :] - win[:, :, None]
    mask = np.where(diff != 0, -100.0, 0.0).astype(np.float32)
    return mask  # [k*k, wh*ww, wh*ww]


def _window_attention(
    q: Array, k_: Array, v: Array, h: int, w: int, splits: int,
    with_shift: bool, attn_mask: Optional[np.ndarray],
) -> Array:
    """single_head_split_window_attention (lines 368-438). q/k/v: [B, L, C]."""
    b, L, c = q.shape
    if splits <= 1:
        scores = jnp.einsum("blc,bmc->blm", q, k_) / math.sqrt(c)
        return jnp.einsum("blm,bmc->blc", jax.nn.softmax(scores, axis=-1), v)
    q = q.reshape(b, h, w, c)
    k_ = k_.reshape(b, h, w, c)
    v = v.reshape(b, h, w, c)
    if with_shift:
        sh, sw = (h // splits) // 2, (w // splits) // 2
        q = jnp.roll(q, (-sh, -sw), axis=(1, 2))
        k_ = jnp.roll(k_, (-sh, -sw), axis=(1, 2))
        v = jnp.roll(v, (-sh, -sw), axis=(1, 2))
    qs = _split_windows(q, splits).reshape(b * splits * splits, -1, c)
    ks = _split_windows(k_, splits).reshape(b * splits * splits, -1, c)
    vs = _split_windows(v, splits).reshape(b * splits * splits, -1, c)
    scores = jnp.einsum("blc,bmc->blm", qs, ks) / math.sqrt(c)
    if with_shift:
        mask = jnp.asarray(attn_mask)  # [k*k, L, L]
        scores = scores + jnp.tile(mask, (b, 1, 1))
    out = jnp.einsum("blm,bmc->blc", jax.nn.softmax(scores, axis=-1), vs)
    out = _merge_windows(
        out.reshape(b * splits * splits, h // splits, w // splits, c), splits
    )
    if with_shift:
        out = jnp.roll(out, (sh, sw), axis=(1, 2))
    return out.reshape(b, L, c)


def _transformer_layer(
    p: Params, source: Array, target: Array, h, w, splits, with_shift, attn_mask,
    no_ffn: bool,
) -> Array:
    q = linear(source, p["q_proj"])
    k_ = linear(target, p["k_proj"])
    v = linear(target, p["v_proj"])
    msg = _window_attention(q, k_, v, h, w, splits, with_shift, attn_mask)
    msg = _layer_norm(linear(msg, p["merge"]), p["norm1"])
    if not no_ffn:
        x = jnp.concatenate([source, msg], axis=-1)
        x = linear(x, p["mlp"]["0"])
        x = jax.nn.gelu(x, approximate=False)
        msg = _layer_norm(linear(x, p["mlp"]["2"]), p["norm2"])
    return source + msg


def _transformer(p: Params, f0: Array, f1: Array, splits: int) -> Tuple[Array, Array]:
    """FeatureTransformer.forward (lines 629-686)."""
    b, c, = f0.shape[0], f0.shape[-1]
    h, w = f0.shape[1], f0.shape[2]
    attn_mask = _shift_window_mask(h, w, splits) if splits > 1 else None
    concat0 = jnp.concatenate(
        [f0.reshape(b, -1, c), f1.reshape(b, -1, c)], axis=0
    )
    concat1 = jnp.concatenate(
        [f1.reshape(b, -1, c), f0.reshape(b, -1, c)], axis=0
    )
    for i in range(6):
        node = p["layers"][str(i)]
        with_shift = i % 2 == 1
        concat0 = _transformer_layer(
            node["self_attn"], concat0, concat0, h, w, splits, with_shift,
            attn_mask, no_ffn=True,
        )
        concat0 = _transformer_layer(
            node["cross_attn_ffn"], concat0, concat1, h, w, splits, with_shift,
            attn_mask, no_ffn=False,
        )
        concat1 = jnp.concatenate([concat0[b:], concat0[:b]], axis=0)
    return (
        concat0[:b].reshape(b, h, w, c),
        concat0[b:].reshape(b, h, w, c),
    )


# ---------------------------------------------------------------- matching


def _coords_grid(b: int, h: int, w: int, dtype) -> Array:
    xs = jnp.arange(w, dtype=dtype)
    ys = jnp.arange(h, dtype=dtype)
    gx = jnp.broadcast_to(xs[None, None, :], (b, h, w))
    gy = jnp.broadcast_to(ys[None, :, None], (b, h, w))
    return jnp.stack([gx, gy], axis=-1)  # [B, H, W, 2] (x, y)


def _global_corr_softmax(f0: Array, f1: Array) -> Array:
    b, h, w, c = f0.shape
    corr = jnp.einsum("bic,bjc->bij", f0.reshape(b, -1, c), f1.reshape(b, -1, c))
    corr = corr / math.sqrt(c)
    prob = jax.nn.softmax(corr, axis=-1)
    grid = _coords_grid(b, h, w, f0.dtype).reshape(b, -1, 2)
    corresp = jnp.einsum("bij,bjc->bic", prob, grid).reshape(b, h, w, 2)
    return corresp - _coords_grid(b, h, w, f0.dtype)


def _local_corr_softmax(f0: Array, f1: Array, r: int) -> Array:
    """local_correlation_softmax (lines 847-914)."""
    b, h, w, c = f0.shape
    n = 2 * r + 1
    coords = _coords_grid(b, h, w, f0.dtype)  # [B,H,W,2]
    dx, dy = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1))
    # reference window grid ordering: row-major over (dy, dx)
    offs = np.stack([dx, dy], -1).reshape(-1, 2)  # [(2r+1)^2, 2] int
    # every sample point is integer-grid + integer offset, so the "bilinear
    # sample" is a pure shifted-window read: zero-pad f1 by r and take one
    # static slice per offset (XLA fuses the 81 mul-reduces; the previous
    # [B, H*W, 81]-indexed gather is the layout XLA lowers worst on TPU)
    f1p = jnp.pad(f1, ((0, 0), (r, r), (r, r), (0, 0)))
    corr = jnp.stack(
        [
            jnp.sum(
                f0 * f1p[:, r + oy : r + oy + h, r + ox : r + ox + w, :],
                axis=-1,
            )
            for ox, oy in offs
        ],
        axis=-1,
    ).reshape(b, h * w, n * n) / math.sqrt(c)
    sample = coords[:, :, :, None, :] + jnp.asarray(
        offs.astype(np.float32)
    )[None, None, None]
    sx = sample[..., 0].reshape(b, h * w, n * n)
    sy = sample[..., 1].reshape(b, h * w, n * n)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    corr = jnp.where(valid, corr, -1e9)
    prob = jax.nn.softmax(corr, axis=-1)
    corresp = jnp.einsum(
        "bpk,bpkd->bpd", prob, jnp.stack([sx, sy], -1)
    ).reshape(b, h, w, 2)
    return corresp - coords


def _flow_warp(feat: Array, flow: Array) -> Array:
    """flow_warp (lines 986-993): zeros padding, align_corners=True."""
    return warp(feat, flow, padding_mode="zeros")


def _fb_consistency(fwd: Array, bwd: Array, alpha=0.01, beta=0.5):
    mag = jnp.linalg.norm(fwd, axis=-1) + jnp.linalg.norm(bwd, axis=-1)
    warped_bwd = _flow_warp(bwd, fwd)
    warped_fwd = _flow_warp(fwd, bwd)
    diff_fwd = jnp.linalg.norm(fwd + warped_bwd, axis=-1)
    diff_bwd = jnp.linalg.norm(bwd + warped_fwd, axis=-1)
    thr = alpha * mag + beta
    return (diff_fwd > thr).astype(fwd.dtype), (diff_bwd > thr).astype(fwd.dtype)


# ---------------------------------------------------------------- positions


def _position_embedding(h: int, w: int, num_feats: int = 64) -> np.ndarray:
    """PositionEmbeddingSine (lines 1016-1057), static → numpy, NHWC output."""
    scale = 2 * math.pi
    eps = 1e-6
    y_embed = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x_embed = np.ones((h, 1), np.float32) * np.arange(1, w + 1, dtype=np.float32)[None]
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = np.arange(num_feats, dtype=np.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3
                     ).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3
                     ).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1)  # [H, W, C]


def _add_position(f0: Array, f1: Array, splits: int) -> Tuple[Array, Array]:
    b, h, w, c = f0.shape
    if splits > 1:
        f0s = _split_windows(f0, splits)
        f1s = _split_windows(f1, splits)
        pos = jnp.asarray(_position_embedding(h // splits, w // splits, c // 2))
        f0 = _merge_windows(f0s + pos, splits)
        f1 = _merge_windows(f1s + pos, splits)
    else:
        pos = jnp.asarray(_position_embedding(h, w, c // 2))
        f0 = f0 + pos
        f1 = f1 + pos
    return f0, f1


# ---------------------------------------------------------------- flow attn


def _neighborhood9(x: Array) -> Array:
    n, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        padded[:, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w, :]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ]
    return jnp.stack(taps, axis=3)  # [N,H,W,9,C]


def _flow_attn(p: Params, feat: Array, flow: Array, local: bool, radius: int) -> Array:
    """FeatureFlowAttention (lines 689-805)."""
    b, h, w, c = feat.shape
    q = linear(feat.reshape(b, -1, c), p["q_proj"])
    if not local:
        # reference quirk (lines 727-733): in the global path the key projects
        # the *query projection*, not the raw features
        k_ = linear(q, p["k_proj"])
        v = flow.reshape(b, -1, 2)
        scores = jnp.einsum("blc,bmc->blm", q, k_) / math.sqrt(c)
        out = jnp.einsum("blm,bmd->bld", jax.nn.softmax(scores, -1), v)
        return out.reshape(b, h, w, 2)
    assert radius == 1
    # local path (lines 746-805): keys project the raw features
    k_ = linear(feat.reshape(b, -1, c), p["k_proj"])
    qs = q.reshape(b, h, w, c)
    ks = k_.reshape(b, h, w, c)
    kwin = _neighborhood9(ks)  # [B,H,W,9,C]
    fwin = _neighborhood9(flow)  # [B,H,W,9,2]
    scores = jnp.einsum("bhwc,bhwkc->bhwk", qs, kwin) / math.sqrt(c)
    prob = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhwk,bhwkd->bhwd", prob, fwin)


# ---------------------------------------------------------------- GMFlow


def _convex_upsample4(p: Params, flow: Array, feat: Array) -> Array:
    """GMFlow.upsample_flow convex path (lines 1238-1259), factor 4."""
    k = 4
    x = jnp.concatenate([flow, feat], axis=-1)
    m = jax.nn.relu(conv2d(x, p["0"], stride=1, padding=1))
    m = conv2d(m, p["2"], stride=1, padding=0)  # [B,H,W,9*16]
    n, h, w, _ = flow.shape
    mask = m.reshape(n, h, w, 9, k * k)
    mask = jax.nn.softmax(mask, axis=3)
    taps = _neighborhood9(k * flow)  # [B,H,W,9,2]
    up = jnp.einsum("nhwkc,nhwkp->nhwpc", taps, mask)
    up = up.reshape(n, h, w, k, k, 2).transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(n, h * k, w * k, 2)


_ATTN_SPLITS = (2, 8)
_CORR_RADIUS = (-1, 4)
_PROP_RADIUS = (-1, 1)

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _gmflow(p: Params, img0: Array, img1: Array) -> Array:
    """GMFlow.forward (lines 1263-1372), 2 scales, unidirectional."""
    mean = jnp.asarray(_IMAGENET_MEAN, img0.dtype)
    std = jnp.asarray(_IMAGENET_STD, img0.dtype)
    img0 = (img0 - mean) / std
    img1 = (img1 - mean) / std

    both = jnp.concatenate([img0, img1], axis=0)
    feats = _cnn_encoder(p["backbone"], both, num_scales=2)[::-1]  # low→high
    b = img0.shape[0]
    f0_list = [f[:b] for f in feats]
    f1_list = [f[b:] for f in feats]

    flow = None
    for scale_idx in range(2):
        f0, f1 = f0_list[scale_idx], f1_list[scale_idx]
        if scale_idx > 0:
            flow = 2.0 * resize_by_scale(flow, 2.0, align_corners=True)
            f1 = _flow_warp(f1, flow)
        splits = _ATTN_SPLITS[scale_idx]
        f0, f1 = _add_position(f0, f1, splits)
        f0, f1 = _transformer(p["transformer"], f0, f1, splits)
        if _CORR_RADIUS[scale_idx] == -1:
            flow_pred = _global_corr_softmax(f0, f1)
        else:
            flow_pred = _local_corr_softmax(f0, f1, _CORR_RADIUS[scale_idx])
        flow = flow + flow_pred if flow is not None else flow_pred
        flow = _flow_attn(
            p["feature_flow_attn"], f0, flow,
            local=_PROP_RADIUS[scale_idx] > 0, radius=max(_PROP_RADIUS[scale_idx], 1),
        )
        if scale_idx == 1:
            flow = _convex_upsample4(p["upsampler"], flow, f0)
    return flow


# ---------------------------------------------------------------- metric/feat


def _prelu_conv(p: Params, x: Array, idx0: str, idx1: str, stride=1) -> Array:
    x = prelu(x, p[idx0])
    return conv2d(x, p[idx1], stride=stride, padding=1)


def _metricnet(p: Params, img0, img1, flow01, flow10):
    """MetricNet.forward (lines 1430-1468)."""
    metric0 = jnp.mean(
        jnp.abs(img0 - warp(img1, flow01, padding_mode="zeros")), -1, keepdims=True
    )
    metric1 = jnp.mean(
        jnp.abs(img1 - warp(img0, flow10, padding_mode="zeros")), -1, keepdims=True
    )
    fwd_occ, bwd_occ = _fb_consistency(flow01, flow10)

    h, w = img0.shape[1], img0.shape[2]
    norm = jnp.asarray([(w - 1.0) / 2.0, (h - 1.0) / 2.0], img0.dtype)
    f01 = flow01 / norm
    f10 = flow10 / norm

    x = jnp.concatenate(
        [img0, img1, -metric0, -metric1, f01, f10, fwd_occ[..., None], bwd_occ[..., None]],
        axis=-1,
    )
    feat = conv2d(x, p["metric_in"], stride=1, padding=1)
    for name in ("metric_net1", "metric_net2", "metric_net3"):
        feat = _prelu_conv(p[name], feat, "0", "1") + feat
    metric = _prelu_conv(p["metric_out"], feat, "0", "1")
    metric = jnp.tanh(metric) * 10.0
    return metric[..., :1], metric[..., 1:2]


def _featurenet(p: Params, x: Array):
    feats = []
    for name in ("block1", "block2", "block3"):
        node = p[name]
        x = prelu(x, node["0"])
        x = conv2d(x, node["1"], stride=2, padding=1)
        x = prelu(x, node["2"])
        x = conv2d(x, node["3"], stride=1, padding=1)
        feats.append(x)
    return feats


# ---------------------------------------------------------------- GridNet


def _res_pair(p: Params, x: Array, stride1=1, transpose=False) -> Array:
    x = prelu(x, p["0"])
    if transpose:
        x = conv_transpose2d(x, p["1"], stride=2, padding=1)
    else:
        x = conv2d(x, p["1"], stride=stride1, padding=1)
    x = prelu(x, p["2"])
    return conv2d(x, p["3"], stride=stride1 if not transpose and stride1 != 2 else 1, padding=1)


def _residual(p: Params, x: Array) -> Array:
    # ResidualBlock(in, out, stride=1): both convs stride 1
    x = prelu(x, p["0"])
    x = conv2d(x, p["1"], stride=1, padding=1)
    x = prelu(x, p["2"])
    return conv2d(x, p["3"], stride=1, padding=1)


def _downsample(p: Params, x: Array) -> Array:
    x = prelu(x, p["0"])
    x = conv2d(x, p["1"], stride=2, padding=1)
    x = prelu(x, p["2"])
    return conv2d(x, p["3"], stride=1, padding=1)


def _upsample(p: Params, x: Array) -> Array:
    x = prelu(x, p["0"])
    x = conv_transpose2d(x, p["1"], stride=2, padding=1)
    x = prelu(x, p["2"])
    return conv2d(x, p["3"], stride=1, padding=1)


def _pixelshuffle_tail(p: Params, x: Array) -> Array:
    x = conv2d(x, p["conv_before_upsample"]["0"], stride=1, padding=1)
    x = prelu(x, p["conv_before_upsample"]["1"])
    x = conv2d(x, p["upsample"]["0"], stride=1, padding=1)
    x = pixel_shuffle(x, 2)
    return conv2d(x, p["conv_last"], stride=1, padding=1)


def _gridnet(p: Params, x, x1, x2, x3, head_key: str) -> Array:
    """GridNet.forward (lines 1641-1688)."""
    x00 = _residual(p[head_key], x) + _residual(p["residual_model_head1"], x1)
    x01 = _residual(p["residual_model_01"], x00) + x00
    x10 = _downsample(p["downsample_model_10"], x00) + _residual(
        p["residual_model_head2"], x2
    )
    x20 = _downsample(p["downsample_model_20"], x10) + _residual(
        p["residual_model_head3"], x3
    )
    res11 = _residual(p["residual_model_11"], x10) + x10
    x11 = res11 + _downsample(p["downsample_model_11"], x01)
    res21 = _residual(p["residual_model_21"], x20) + x20
    x21 = res21 + _downsample(p["downsample_model_21"], x11)
    x24 = _residual(p["residual_model_24"], x21) + x21
    x25 = _residual(p["residual_model_25"], x24) + x24
    x14 = _upsample(p["upsample_model_14"], x24) + (
        _residual(p["residual_model_14"], x11) + x11
    )
    x04 = _upsample(p["upsample_model_04"], x14) + (
        _residual(p["residual_model_04"], x01) + x01
    )
    x15 = _upsample(p["upsample_model_15"], x25) + (
        _residual(p["residual_model_15"], x14) + x14
    )
    x05 = _upsample(p["upsample_model_05"], x15) + (
        _residual(p["residual_model_05"], x04) + x04
    )
    return _pixelshuffle_tail(p["residual_model_tail"], x05)


# ---------------------------------------------------------------- model


def reuse(params: Params, img0: Array, img1: Array, scale: float = 1.0):
    """Model.reuse (lines 1721-1777): flows, metrics and features for a pair."""
    feat1 = _featurenet(params["feat_ext"], img0)
    feat2 = _featurenet(params["feat_ext"], img1)

    img0h = resize_by_scale(img0, 0.5)
    img1h = resize_by_scale(img1, 0.5)
    if scale != 1.0:
        f0 = resize_by_scale(img0h, scale)
        f1 = resize_by_scale(img1h, scale)
    else:
        f0, f1 = img0h, img1h
    flow01 = _gmflow(params["flownet"], f0, f1)
    flow10 = _gmflow(params["flownet"], f1, f0)
    if scale != 1.0:
        flow01 = resize_by_scale(flow01, 1.0 / scale) / scale
        flow10 = resize_by_scale(flow10, 1.0 / scale) / scale

    metric0, metric1 = _metricnet(params["metricnet"], img0h, img1h, flow01, flow10)
    return flow01, flow10, metric0, metric1, feat1, feat2


def inference(
    params: Params,
    img0: Array,
    img1: Array,
    reuse_out,
    timestep,
    union: bool = False,
) -> Array:
    """Model.inference (lines 1779-1849; union diff for the fusion head)."""
    head, x1, x2, x3, head_key = _splat_head(
        params, img0, img1, reuse_out, timestep, union=union
    )
    out = _gridnet(params["fusionnet"], head, x1, x2, x3, head_key)
    return jnp.clip(out, 0.0, 1.0)


def _splat_head(
    params: Params, img0: Array, img1: Array, reuse_out, timestep,
    union: bool = False,
):
    """The splat half of ``Model.inference``: forward-splat images and the
    3-scale feature pyramids to time t and assemble the GridNet inputs
    (everything before the fusion GridNet — split out so the stage bench can
    time splats vs fusion separately)."""
    flow01, flow10, metric0, metric1, feat1, feat2 = reuse_out
    t = jnp.asarray(timestep, img0.dtype).reshape(-1, 1, 1, 1)

    f1t = t * flow01
    f2t = (1 - t) * flow10
    z1t = t * metric0
    z2t = (1 - t) * metric1

    img0h = resize_by_scale(img0, 0.5)
    img1h = resize_by_scale(img1, 0.5)
    i1t = softsplat(img0h, f1t, z1t, "soft")
    i2t = softsplat(img1h, f2t, z2t, "soft")

    feat1t1 = softsplat(feat1[0], f1t, z1t, "soft")
    feat2t1 = softsplat(feat2[0], f2t, z2t, "soft")

    f1td = resize_by_scale(f1t, 0.5) * 0.5
    z1d = resize_by_scale(z1t, 0.5)
    feat1t2 = softsplat(feat1[1], f1td, z1d, "soft")
    f2td = resize_by_scale(f2t, 0.5) * 0.5
    z2d = resize_by_scale(z2t, 0.5)
    feat2t2 = softsplat(feat2[1], f2td, z2d, "soft")

    f1tdd = resize_by_scale(f1t, 0.25) * 0.25
    z1dd = resize_by_scale(z1t, 0.25)
    feat1t3 = softsplat(feat1[2], f1tdd, z1dd, "soft")
    f2tdd = resize_by_scale(f2t, 0.25) * 0.25
    z2dd = resize_by_scale(z2t, 0.25)
    feat2t3 = softsplat(feat2[2], f2tdd, z2dd, "soft")

    if union:
        rife = rife_model.apply(
            params["ifnet"], img0h, img1h, jnp.ravel(t), [8, 4, 2, 1],
            arch_ver="4.6",
        )
        head = jnp.concatenate([i1t, rife, i2t], axis=-1)
        head_key = "residual_model_head0"
    else:
        head = jnp.concatenate([img0h, i1t, i2t, img1h], axis=-1)
        head_key = "residual_model_head"

    return (
        head,
        jnp.concatenate([feat1t1, feat2t1], -1),
        jnp.concatenate([feat1t2, feat2t2], -1),
        jnp.concatenate([feat1t3, feat2t3], -1),
        head_key,
    )


def apply(
    params: Params,
    img0: Array,
    img1: Array,
    timestep,
    scale: float = 1.0,
    union: bool = False,
) -> Array:
    """CommonModelInference.forward (gmfss_fortuna/__init__.py:42-78): pad to
    64/scale, reuse + inference (the node recomputes reuse per timestep)."""
    n, h, w, _ = img0.shape
    tmp = max(64, int(64 / scale))
    ph = ((h - 1) // tmp + 1) * tmp
    pw = ((w - 1) // tmp + 1) * tmp
    pad = ((0, 0), (0, ph - h), (0, pw - w), (0, 0))
    img0 = jnp.pad(img0, pad)
    img1 = jnp.pad(img1, pad)
    r = reuse(params, img0, img1, scale)
    out = inference(params, img0, img1, r, timestep, union=union)
    return out[:, :h, :w, :]


def make_model_fn(params: Params, union: bool = False, scale: float = 1.0, dtype=jnp.float32):
    params = cast_params(params, dtype)
    @jax.jit
    def model_fn(f0, f1, t):
        out = apply(
            params, f0.astype(dtype), f1.astype(dtype), t.astype(dtype),
            scale=scale, union=union,
        )
        return out.astype(jnp.float32)

    return model_fn


def make_pair_fns(
    params: Params, union: bool = False, scale: float = 1.0, dtype=jnp.float32
):
    """Split the model into a per-pair ``reuse_fn`` and a per-timestep
    ``infer_fn`` so the flow/metric/feature computation is shared across a
    pair's timesteps. The reference node recomputes ``reuse`` for every
    timestep (``gmfss_fortuna/__init__.py:55-78``, called per
    ``return_middle_frame``); semantics are identical since ``reuse`` does not
    depend on the timestep."""
    params = cast_params(params, dtype)

    def _pad(img):
        n, h, w, _ = img.shape
        tmp = max(64, int(64 / scale))
        ph = ((h - 1) // tmp + 1) * tmp
        pw = ((w - 1) // tmp + 1) * tmp
        return jnp.pad(img, ((0, 0), (0, ph - h), (0, pw - w), (0, 0)))

    @jax.jit
    def reuse_fn(f0, f1):
        return reuse(params, _pad(f0.astype(dtype)), _pad(f1.astype(dtype)), scale)

    @jax.jit
    def infer_fn(f0, f1, r, t):
        h, w = f0.shape[1], f0.shape[2]
        out = inference(
            params, _pad(f0.astype(dtype)), _pad(f1.astype(dtype)), r,
            t.astype(dtype), union=union,
        )
        return out[:, :h, :w, :].astype(jnp.float32)

    return reuse_fn, infer_fn
