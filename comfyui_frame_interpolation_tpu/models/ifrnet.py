"""IFRNet — intermediate feature refine network (S and L variants).

Reference: ``vfi_models/ifrnet/IFRNet_S_arch.py`` / ``IFRNet_L_arch.py`` (identical
structure; L widens channels and uses a 7x7 stem). Encoder pyramid (4 levels of
stride-2 conv+PReLU pairs) → 4 cascaded decoders jointly refining bidirectional
flows and an intermediate feature, each upsampling via ConvTranspose2d; final
sigmoid-mask blend of two backward warps plus residual, joint per-batch mean
normalization (``IFRNet_S_arch.py:246-254``), 64-px padding contract
(``:232-236``).

Note: the reference *node* (``ifrnet/__init__.py:50-51``) passes ``timestep`` and
``scale_factor`` positionally into ``forward(img0, img1, scale_factor, timestep)``
— i.e. swapped, so the torch node actually runs with ``scale_factor=t`` and
``embt=user_scale``. We implement the architecture's documented semantics
(timestep → embt, scale_factor → resize) rather than replicating the swap.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.warp import warp
from .common import cast_params, conv2d, conv_transpose2d, prelu, resize_by_scale

Array = jnp.ndarray
Params = Dict

# (pyramid channels, side_channels, stem kernel)
_CFG = {
    "S": ((24, 36, 54, 72), 24, 3),
    "L": ((64, 96, 144, 192), 64, 7),
}

CKPT_NAMES = [
    "IFRNet_S_Vimeo90K.pth",
    "IFRNet_L_Vimeo90K.pth",
    "IFRNet_S_GoPro.pth",
    "IFRNet_L_GoPro.pth",
]


def variant_for_ckpt(ckpt_name: str) -> str:
    return "S" if "S" in ckpt_name else "L"


def _convrelu(p: Params, x: Array, stride=1, padding=1) -> Array:
    x = conv2d(x, p["0"], stride=stride, padding=padding)
    return prelu(x, p["1"])


def _resblock(p: Params, x: Array, side: int) -> Array:
    """``ResBlock`` (IFRNet_S_arch.py:69-122): the side-channel convs overwrite
    the trailing channels in place — functionally: split, transform, re-concat."""
    out = _convrelu(p["conv1"], x)
    out = jnp.concatenate([out[..., :-side], _convrelu(p["conv2"], out[..., -side:])], -1)
    out = _convrelu(p["conv3"], out)
    out = jnp.concatenate([out[..., :-side], _convrelu(p["conv4"], out[..., -side:])], -1)
    out = conv2d(out, p["conv5"], stride=1, padding=1)
    return prelu(x + out, p["prelu"])


def _encoder(p: Params, img: Array, stem_k: int) -> Tuple[Array, ...]:
    feats = []
    x = img
    for i in range(1, 5):
        node = p[f"pyramid{i}"]
        k_pad = (stem_k // 2) if i == 1 else 1
        x = _convrelu(node["0"], x, stride=2, padding=k_pad)
        x = _convrelu(node["1"], x, stride=1, padding=1)
        feats.append(x)
    return tuple(feats)


def _decoder(p: Params, f_in: Array, side: int) -> Array:
    x = _convrelu(p["convblock"]["0"], f_in)
    x = _resblock(p["convblock"]["1"], x, side)
    return conv_transpose2d(x, p["convblock"]["2"], stride=2, padding=1)


def apply(
    params: Params,
    img0: Array,
    img1: Array,
    timestep,
    scale_factor: float = 1.0,
    variant: str = "S",
) -> Array:
    """``IRFNet_S.forward`` / ``IRFNet_L.forward`` (IFRNet_S_arch.py:217-293)."""
    chans, side, stem_k = _CFG[variant]
    n, h, w, _ = img0.shape
    ph = ((h - 1) // 64 + 1) * 64
    pw = ((w - 1) // 64 + 1) * 64
    pad = ((0, 0), (0, ph - h), (0, pw - w), (0, 0))
    img0 = jnp.pad(img0, pad)
    img1 = jnp.pad(img1, pad)

    embt = jnp.broadcast_to(
        jnp.asarray(timestep, img0.dtype).reshape(-1, 1, 1, 1), (n, 1, 1, 1)
    )

    mean_ = jnp.mean(
        jnp.concatenate([img0, img1], axis=1), axis=(1, 2, 3), keepdims=True
    )
    img0 = img0 - mean_
    img1 = img1 - mean_

    img0_ = resize_by_scale(img0, scale_factor)
    img1_ = resize_by_scale(img1, scale_factor)

    f0 = _encoder(params["encoder"], img0_, stem_k)
    f1 = _encoder(params["encoder"], img1_, stem_k)

    # decoder 4
    hh, ww = f0[3].shape[1], f0[3].shape[2]
    embt_map = jnp.broadcast_to(embt, (n, hh, ww, 1))
    out4 = _decoder(
        params["decoder4"], jnp.concatenate([f0[3], f1[3], embt_map], -1), side
    )
    up_flow0, up_flow1 = out4[..., 0:2], out4[..., 2:4]
    ft_ = out4[..., 4:]

    for lvl, dec in ((2, "decoder3"), (1, "decoder2"), (0, "decoder1")):
        f0_w = warp(f0[lvl], up_flow0)
        f1_w = warp(f1[lvl], up_flow1)
        f_in = jnp.concatenate([ft_, f0_w, f1_w, up_flow0, up_flow1], -1)
        out = _decoder(params[dec], f_in, side)
        up_flow0 = out[..., 0:2] + 2.0 * resize_by_scale(up_flow0, 2.0)
        up_flow1 = out[..., 2:4] + 2.0 * resize_by_scale(up_flow1, 2.0)
        ft_ = out[..., 4:]

    up_mask = jax.nn.sigmoid(out[..., 4:5])
    up_res = out[..., 5:]

    inv = 1.0 / scale_factor
    up_flow0 = resize_by_scale(up_flow0, inv) * inv
    up_flow1 = resize_by_scale(up_flow1, inv) * inv
    up_mask = resize_by_scale(up_mask, inv)
    up_res = resize_by_scale(up_res, inv)

    img0_warp = warp(img0, up_flow0)
    img1_warp = warp(img1, up_flow1)
    merged = up_mask * img0_warp + (1 - up_mask) * img1_warp + mean_
    pred = jnp.clip(merged + up_res, 0.0, 1.0)
    return pred[:, :h, :w, :]


def make_model_fn(params: Params, variant: str, scale_factor: float = 1.0, dtype=jnp.float32):
    params = cast_params(params, dtype)
    @jax.jit
    def model_fn(f0, f1, t):
        out = apply(
            params,
            f0.astype(dtype),
            f1.astype(dtype),
            t.astype(dtype),
            scale_factor=scale_factor,
            variant=variant,
        )
        return out.astype(jnp.float32)

    return model_fn
