"""FLAVR — flow-free 4-frame interpolation with 3D convolutions.

Reference: ``vfi_models/flavr/{flavr_arch.py, resnet_3D.py}``. ``UNet_3D_3D``:
an R3D-18 video-ResNet encoder (3x3x3 convs, SEGating channel attention, no
batchnorm in the shipped weights, ``resnet_3D.py:119-199``) over the stacked
4-frame clip, a 3-D transposed-conv decoder with SEGating (``flavr_arch.py:
150-157``), temporal unbind+concat, a 1x1 2-D fuse conv (bias-free) and a
reflection-padded 7x7 output head producing ``3*n_outputs`` channels; batch-mean
normalization added back per output (``flavr_arch.py:168-198``).

Layout: clips are NDHWC ``[B, T=4, H, W, C]``. ``n_outputs`` is inferred from
the checkpoint's ``outconv.1.weight`` (``flavr/__init__.py:19``); the node uses
only the 2x model (first output).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from .common import cast_params, conv2d, conv3d, conv_transpose3d, leaky_relu

Array = jnp.ndarray
Params = Dict

CKPT_NAMES = ["FLAVR_2x.pth", "FLAVR_4x.pth", "FLAVR_8x.pth"]


def _se_gating(p: Params, x: Array) -> Array:
    """SEGating (flavr_arch.py:13-29): global pool + 1x1x1 conv + sigmoid gate."""
    y = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    y = conv3d(y, p["attn_layer"]["0"], stride=1, padding=0)
    return x * jax.nn.sigmoid(y)


def _basic_block(p: Params, x: Array, stride) -> Array:
    """resnet_3D BasicBlock (identity batchnorm)."""
    out = jax.nn.relu(conv3d(x, p["conv1"]["0"], stride=stride, padding=1))
    out = conv3d(out, p["conv2"]["0"], stride=1, padding=1)
    out = _se_gating(p["fg"], out)
    if "downsample" in p:
        x = conv3d(x, p["downsample"]["0"], stride=stride, padding=0)
    return jax.nn.relu(out + x)


def _encoder(p: Params, x: Array) -> List[Array]:
    """R3D-18 (unet_18): stem + 4 layers of 2 blocks."""
    x0 = jax.nn.relu(conv3d(x, p["stem"]["0"], stride=(1, 2, 2), padding=(1, 3, 3)))
    feats = [x0]
    x = x0
    for layer, stride in (
        ("layer1", 1),
        ("layer2", (1, 2, 2)),
        ("layer3", (1, 2, 2)),
        ("layer4", 1),
    ):
        x = _basic_block(p[layer]["0"], x, stride)
        x = _basic_block(p[layer]["1"], x, 1)
        feats.append(x)
    return feats


def _conv_3d_block(p: Params, x: Array) -> Array:
    """Conv_3d: conv3d k3 p1 + SEGating."""
    x = conv3d(x, p["conv"]["0"], stride=1, padding=1)
    return _se_gating(p["conv"]["1"], x)


def _up_conv3d(p: Params, x: Array) -> Array:
    """upConv3D transpose mode: ConvT3d k(3,4,4) s(1,2,2) p1 + SEGating."""
    x = conv_transpose3d(x, p["upconv"]["0"], stride=(1, 2, 2), padding=(1, 1, 1))
    return _se_gating(p["upconv"]["1"], x)


def apply(params: Params, clip: Array, n_outputs: int = 1) -> List[Array]:
    """``UNet_3D_3D.forward`` (flavr_arch.py:168-198).

    ``clip``: [B, 4, H, W, 3] NDHWC (H, W multiples of 16 — the node pads the
    whole sequence once with InputPadder)."""
    mean_ = jnp.mean(clip, axis=(1, 2, 3), keepdims=True)  # per (B, C)
    x = clip - mean_

    x0, x1, x2, x3, x4 = _encoder(params["encoder"], x)

    dec = params["decoder"]
    dx3 = leaky_relu(_conv_3d_block(dec["0"], x4), 0.2)
    dx3 = jnp.concatenate([dx3, x3], axis=-1)
    dx2 = leaky_relu(_up_conv3d(dec["1"], dx3), 0.2)
    dx2 = jnp.concatenate([dx2, x2], axis=-1)
    dx1 = leaky_relu(_up_conv3d(dec["2"], dx2), 0.2)
    dx1 = jnp.concatenate([dx1, x1], axis=-1)
    dx0 = leaky_relu(_conv_3d_block(dec["3"], dx1), 0.2)
    dx0 = jnp.concatenate([dx0, x0], axis=-1)
    dx_out = leaky_relu(_up_conv3d(dec["4"], dx0), 0.2)

    # torch: cat(unbind(dx_out, 2), 1) — temporal slices stacked along channels
    b, t, h, w, c = dx_out.shape
    fused_in = dx_out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
    out = leaky_relu(
        conv2d(fused_in, params["feature_fuse"]["conv"]["0"], stride=1, padding=0),
        0.2,
    )
    out = jnp.pad(out, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    out = conv2d(out, params["outconv"]["1"], stride=1, padding=0)

    mean2d = mean_[:, 0]  # [B,1,1,C]
    return [out[..., 3 * i : 3 * (i + 1)] + mean2d for i in range(n_outputs)]


def infer_n_outputs(params: Params) -> int:
    return params["outconv"]["1"]["weight"].shape[0] // 3


def make_model_fn(params: Params, dtype=jnp.float32):
    """Window-4 model callable: (f0, f1, f2, f3) -> mid(f1, f2)."""
    params = cast_params(params, dtype)
    n_out = infer_n_outputs(params)

    @jax.jit
    def model_fn(f0, f1, f2, f3):
        clip = jnp.stack([f0, f1, f2, f3], axis=1).astype(dtype)
        return apply(params, clip, n_out)[0].astype(jnp.float32)

    return model_fn
