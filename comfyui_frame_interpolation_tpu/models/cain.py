"""CAIN — Channel Attention Is All You Need for VFI.

Reference: ``vfi_models/cain/{cain_arch.py, common.py}``. Flow-free: per-channel
mean subtraction (``common.py:7-10``), centered reflection padding to a multiple
of 128 (``InOutPaddings``, ``common.py:12-23``), PixelShuffle(1/8) space-to-depth
(channel-major ordering, ``common.py:198-215``), a fusion trunk of 5 residual
groups x 12 RCAB channel-attention blocks over 192 features
(``common.py:252-284,160-186``), PixelShuffle(8) back to pixels, and the mean
added back. The model has no timestep input — the node drives it with the
recursive-midpoint schedule (``cain/__init__.py:61``, ``use_timestep=False``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .common import cast_params, conv2d, leaky_relu

Array = jnp.ndarray
Params = Dict

CKPT_NAMES = ["pretrained_cain.pth"]

DEPTH = 3  # PixelShuffle factor 2**3 = 8


def _space_to_depth(x: Array, b: int) -> Array:
    """torch ``pixel_shuffle(x, 1/b)`` (common.py:205-210): output channel index
    = c*b*b + by*b + bx (channel-major)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // b, b, w // b, b, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h/b, w/b, c, by, bx
    return x.reshape(n, h // b, w // b, c * b * b)


def _depth_to_space(x: Array, b: int) -> Array:
    """torch ``pixel_shuffle(x, b)`` — inverse of :func:`_space_to_depth`."""
    n, h, w, cbb = x.shape
    c = cbb // (b * b)
    x = x.reshape(n, h, w, c, b, b)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, by, w, bx, c
    return x.reshape(n, h * b, w * b, c)


def _conv_norm(p: Params, x: Array, k: int = 3) -> Array:
    """``ConvNorm`` (common.py:27-47): reflection pad k//2 + unpadded conv."""
    r = k // 2
    if r:
        x = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")
    return conv2d(x, p["conv"], stride=1, padding=0)


def _ca_layer(p: Params, x: Array) -> Array:
    """``CALayer`` (common.py:136-153): global-average-pool channel gate."""
    y = jnp.mean(x, axis=(1, 2), keepdims=True)
    y = conv2d(y, p["conv_du"]["0"], stride=1, padding=0)
    y = jax.nn.relu(y)
    y = conv2d(y, p["conv_du"]["2"], stride=1, padding=0)
    return x * jax.nn.sigmoid(y)


def _rcab(p: Params, x: Array) -> Array:
    """``RCAB`` (common.py:157-186) with LeakyReLU(0.2) activation."""
    out = _conv_norm(p["body"]["0"], x)
    out = leaky_relu(out, 0.2)
    out = _conv_norm(p["body"]["2"], out)
    out = _ca_layer(p["body"]["3"], out)
    return out + x


def _residual_group(p: Params, x: Array, n_blocks: int = 12) -> Array:
    res = x
    for i in range(n_blocks):
        res = _rcab(p["body"][str(i)], res)
    res = _conv_norm(p["body"][str(n_blocks)], res)
    return res + x


def _interpolation(p: Params, x0: Array, x1: Array, n_groups: int = 5) -> Array:
    """``Interpolation`` (common.py:252-284)."""
    x = jnp.concatenate([x0, x1], axis=-1)
    x = conv2d(x, p["headConv"], stride=1, padding=1)
    res = x
    for g in range(n_groups):
        res = _residual_group(p["body"][str(g)], res)
    res = res + x
    return conv2d(res, p["tailConv"], stride=1, padding=1)


def apply(params: Params, x1: Array, x2: Array, timestep=None) -> Array:
    """``CAIN.forward`` (cain_arch.py:56-71), inference path (centered reflect
    padding to x128). ``timestep`` is ignored — CAIN has no t input."""
    del timestep
    b = 2**DEPTH
    m1 = jnp.mean(x1, axis=(1, 2), keepdims=True)
    m2 = jnp.mean(x2, axis=(1, 2), keepdims=True)
    x1 = x1 - m1
    x2 = x2 - m2

    n, h, w, c = x1.shape
    pad_h = (-h) % 128
    pad_w = (-w) % 128
    top, left = pad_h // 2, pad_w // 2
    pad = ((0, 0), (top, pad_h - top), (left, pad_w - left), (0, 0))
    if pad_h or pad_w:
        x1 = jnp.pad(x1, pad, mode="reflect")
        x2 = jnp.pad(x2, pad, mode="reflect")

    f1 = _space_to_depth(x1, b)
    f2 = _space_to_depth(x2, b)
    feats = _interpolation(params["encoder"]["interpolate"], f1, f2)
    out = _depth_to_space(feats, b)

    if pad_h or pad_w:
        out = out[:, top : top + h, left : left + w, :]
    return out + (m1 + m2) / 2


def make_model_fn(params: Params, dtype=jnp.float32):
    params = cast_params(params, dtype)
    @jax.jit
    def model_fn(f0, f1, t):
        out = apply(params, f0.astype(dtype), f1.astype(dtype))
        return out.astype(jnp.float32)

    return model_fn
