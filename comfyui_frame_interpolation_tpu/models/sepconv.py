"""Revisiting-SepConv — adaptive separable convolution synthesis.

Reference: ``vfi_models/sepconv/sepconv_enhanced.py``. A shared grid
encoder/decoder (5 rows, channels 32..512; the single Encode pass seeds rows
top-down with strided "vertical" blocks, the Decode pass refines each row and
cascades upsampled coarser rows back down, trimming odd-size offshoots,
``sepconv_enhanced.py:314-525``) estimates four 51-tap 1-D kernel fields from the
half-res decode row; each replicate-padded (+25) input with an appended ones
channel is filtered by :func:`~..ops.sepconv.sepconv_func`, summed, and
normalized by the filtered ones channel (|norm| < 0.01 → 1,
``sepconv_enhanced.py:689-695``). Inputs are padded to even size and jointly
mean/std-normalized per sample (unbiased std, ``:623-639``).

The model has no timestep input; the node drives it with the recursive-midpoint
schedule (``sepconv/__init__.py:55``).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from ..ops.sepconv import sepconv_func
from .common import cast_params, conv2d, prelu, resize_by_scale

Array = jnp.ndarray
Params = Dict

CKPT_NAMES = ["sepconv.pth"]

CHANNELS = [32, 64, 128, 256, 512]
K = 51


def _conv_p(p, x, stride=1):
    return conv2d(x, p, stride=stride, padding=1)


def _enc_ver(p: Params, x: Array) -> Array:
    """Basic("prelu(0.25)-sconv(3)-prelu(0.25)-conv(3)")."""
    m = p["netMain"]
    x = prelu(x, m["0"])
    x = _conv_p(m["1"], x, stride=2)
    x = prelu(x, m["2"])
    return _conv_p(m["3"], x)


def _dec_hor(p: Params, x: Array) -> Array:
    """Basic("prelu-conv-prelu-conv+skip") with identity shortcut."""
    m = p["netMain"]
    h = prelu(x, m["0"])
    h = _conv_p(m["1"], h)
    h = prelu(h, m["2"])
    h = _conv_p(m["3"], h)
    return h + x


def _dec_ver(p: Params, x: Array) -> Array:
    """Basic("prelu-up(bilinear)-conv-prelu-conv")."""
    m = p["netMain"]
    x = prelu(x, m["0"])
    x = resize_by_scale(x, 2.0)
    x = _conv_p(m["2"], x)
    x = prelu(x, m["3"])
    return _conv_p(m["4"], x)


def _kernel_head(p: Params, x: Array) -> Array:
    """Basic("up(bilinear)-conv(3)-prelu(0.25)-conv(3)")."""
    m = p["netMain"]
    x = resize_by_scale(x, 2.0)
    x = _conv_p(m["1"], x)
    x = prelu(x, m["2"])
    return _conv_p(m["3"], x)


def apply(params: Params, x1: Array, x2: Array, timestep=None) -> Array:
    """``Network.forward`` (sepconv_enhanced.py:605-698)."""
    del timestep
    n, h, w, _ = x1.shape
    padr = (-w) % 2
    padb = (-h) % 2
    if padr or padb:
        pad = ((0, 0), (0, padb), (0, padr), (0, 0))
        x1 = jnp.pad(x1, pad, mode="edge")
        x2 = jnp.pad(x2, pad, mode="edge")
    one, two = x1, x2

    stack = jnp.stack([one, two], 1).reshape(n, -1)
    mean = jnp.mean(stack, axis=1).reshape(n, 1, 1, 1)
    std = jnp.std(stack, axis=1, ddof=1).reshape(n, 1, 1, 1)
    s1 = (one - mean) / (std + 1e-7)
    s2 = (two - mean) / (std + 1e-7)

    # encode: row 0 = concat of per-frame input convs; rows seeded top-down
    f0 = jnp.concatenate(
        [
            conv2d(s1, params["netInput"], stride=1, padding=1),
            conv2d(s2, params["netInput"], stride=1, padding=1),
        ],
        axis=-1,
    )
    enc = params["netEncode"]["0"]
    rows: List[Array] = [f0]
    for r in range(1, len(CHANNELS)):
        rows.append(_enc_ver(enc["netVer"][str(r)], rows[r - 1]))

    # decode (sepconv_enhanced.py:471-520): netHor/netVer ModuleLists are built
    # coarse-to-fine, so list index k corresponds to row (intRows-1-k)
    dec = params["netDecode"]["0"]
    n_rows = len(CHANNELS)
    for r in range(n_rows - 1, 0, -1):
        rows[r] = _dec_hor(dec["netHor"][str(n_rows - 1 - r)], rows[r])
    for r in range(n_rows - 2, 0, -1):
        v = _dec_ver(dec["netVer"][str(n_rows - 1 - r)], rows[r + 1])
        # trim the upsample overshoot on odd level sizes (':498-516')
        v = v[:, : rows[r].shape[1], : rows[r].shape[2], :]
        rows[r] = rows[r] + v

    ten_out = rows[1]

    pad25 = ((0, 0), (25, 25), (25, 25), (0, 0))
    one_p = jnp.pad(one, pad25, mode="edge")
    two_p = jnp.pad(two, pad25, mode="edge")
    one_p = jnp.concatenate([one_p, jnp.ones_like(one_p[..., :1])], -1)
    two_p = jnp.concatenate([two_p, jnp.ones_like(two_p[..., :1])], -1)

    ver1 = _kernel_head(params["netVerone"], ten_out)
    ver2 = _kernel_head(params["netVertwo"], ten_out)
    hor1 = _kernel_head(params["netHorone"], ten_out)
    hor2 = _kernel_head(params["netHortwo"], ten_out)

    out = sepconv_func(one_p, ver1, hor1) + sepconv_func(two_p, ver2, hor2)
    norm = out[..., -1:]
    norm = jnp.where(jnp.abs(norm) < 0.01, 1.0, norm)
    out = out[..., :-1] / norm
    return out[:, :h, :w, :]


def make_model_fn(params: Params, dtype=jnp.float32):
    params = cast_params(params, dtype)
    @jax.jit
    def model_fn(f0, f1, t):
        return apply(params, f0.astype(dtype), f1.astype(dtype)).astype(jnp.float32)

    return model_fn
