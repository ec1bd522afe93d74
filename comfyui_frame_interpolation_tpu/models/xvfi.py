"""XVFI (X4K1000FPS) — TPU-native reimplementation of the reference
architecture (``vfi_models/xvfi/xvfi_arch.py``): shared-weight recursive
feature pyramid, coarse-to-fine bidirectional flow with Complementary Flow
Reversal (gaussian z-weighted forward warping), and a RefineUNet blender
(``xvfi_arch.py:12-80`` XVFInet, ``82-244`` VFInet, ``415-446`` RefineUNet).

Layout: NHWC; flows keep the reference's (x, y) channel order. Every 3D conv
in the reference has temporal extent 1 over T=2 frames (``kernel [1,3,3]``),
so they are executed as 2D convs on a folded [B*2, H, W, C] batch — identical
numerics, and XLA sees plain MXU convolutions.

Inference-only quirks mirrored/noted from the reference:
- ``rec_ext_ds`` and ``rec_ctx_ds`` are single modules appended repeatedly, so
  the downsampling stack genuinely shares weights across repetitions/levels
  (``xvfi_arch.py:27-36``).
- ``VFInet.forward`` bicubically downsamples ``x`` at every level but in
  inference uses it only at level 0 (``xvfi_arch.py:149-166``); the dead
  resizes are skipped here.
- ``z_fwarp``/``sample_one`` name flow channel 0 "y" but add it to the
  column index (``xvfi_arch.py:340-417``) — i.e. standard (x, y) order.

Parameters: mechanically nested ``state_dict_Model`` (see ``utils/ckpt.py``).
Config per checkpoint: ``CKPT_CONFIGS`` (reference ``xvfi/__init__.py:12-23``).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.warp import bilinear_sample, warp
from .common import conv2d, pixel_shuffle, resize_bilinear

Array = jax.Array
Params = Dict[str, "Params | Array"]

CKPT_CONFIGS = {
    "XVFInet_X4K1000FPS_exp1_latest.pt": {
        "module_scale_factor": 4, "S_tst": 5,
    },
    "XVFInet_Vimeo_exp1_latest.pt": {
        "module_scale_factor": 2, "S_tst": 1,
    },
}


def _conv3d_t1(x: Array, node: Params, stride: int = 1, padding: int = 1) -> Array:
    """A [1,kh,kw] Conv3d applied to a folded [B*T, H, W, C] batch."""
    w = node["weight"][:, :, 0]  # (O, I, 1, kh, kw) → (O, I, kh, kw)
    return conv2d(x, {"weight": w, "bias": node.get("bias")}, stride=stride,
                  padding=padding)


def _resblock2d3d(p: Params, x: Array) -> Array:
    """ResBlock2D_3D (xvfi_arch.py:448-468)."""
    out = _conv3d_t1(jax.nn.relu(_conv3d_t1(x, p["conv3x3_1"])), p["conv3x3_2"])
    return x + out


def _rresblock(p: Params, x: Array) -> Array:
    """RResBlock2D_3D, T_reduce_flag=False (xvfi_arch.py:470-490)."""
    out = _resblock2d3d(p["resblock1"], x)
    out = _resblock2d3d(p["resblock2"], out)
    return out + x


def feat_pyramid(
    p: Params, x01: Array, scale: int, s_tst: int
) -> List[Array]:
    """XVFInet feature extraction (xvfi_arch.py:23-36, 52-58) on the folded
    [B*2, H, W, 3] frame batch. Returns feats per level, [B*2, H', W', nf]."""
    ext = p["rec_ext_ds_module"]
    n = int(math.log2(scale))
    x = jax.nn.relu(_conv3d_t1(x01, ext["0"]["0"]))  # channel_converter
    for i in range(n):
        # indices 1, 3, ... alias the same shared rec_ext_ds weights
        x = jax.nn.relu(_conv3d_t1(x, ext[str(2 * i + 1)], stride=2))
    x = _conv3d_t1(x, ext[str(2 * n + 1)])
    x = _rresblock(ext[str(2 * n + 2)], x)
    feats = [x]
    for _ in range(s_tst):
        x = _conv3d_t1(x, p["rec_ctx_ds"], stride=2)  # no relu (xvfi_arch.py:57)
        feats.append(x)
    return feats


def _bwarp(x: Array, flow_xy: Array) -> Array:
    """VFInet.bwarp (xvfi_arch.py:246-268): align_corners=True zeros-padded
    backwarp with a warped-ones validity mask thresholded at 0.999."""
    n, h, w, c = x.shape
    # grid + flow with zeros padding == ops.warp.warp semantics: one warp of
    # the ones-augmented stack rides the Pallas windowed kernel (the XLA form
    # paid two full gathers here — image and mask)
    aug = jnp.concatenate([x, jnp.ones((n, h, w, 1), x.dtype)], -1)
    out = warp(aug, flow_xy.astype(jnp.float32), padding_mode="zeros")
    mask = jnp.where(out[..., -1:] < 0.999, 0.0, 1.0)
    return out[..., :-1] * mask


def _z_fwarp(img: Array, flo_xy: Array, z: Array) -> Tuple[Array, Array]:
    """VFInet.z_fwarp (xvfi_arch.py:320-417): 4-tap gaussian-weighted forward
    scatter with metric z; returns (accumulated, normalization).

    Expressed EXACTLY as one bilinear forward splat with reparameterized
    flow: the reference's per-tap weight ``z * exp(-(frac-dx)^2-(frac-dy)^2)``
    is separable per axis, and per axis the two taps (floor, floor+1) carry
    gaussian weights ``(g0, g1) = (exp(-t^2), exp(-(1-t)^2))`` while a
    bilinear splat puts ``(1-t', t')`` — so splatting with fraction
    ``t' = g1/(g0+g1)`` and scaling the value by ``(g0+g1)_x (g0+g1)_y z``
    reproduces all four gaussian tap weights. This routes XVFI's forward
    warp through the banded Pallas splat kernel (one call, value+norm
    packed) instead of 8 full-frame XLA scatter-adds; out-of-bounds-tap
    dropping matches ``softsplat_func`` semantics."""
    from ..ops.softsplat import softsplat_func

    c = img.shape[-1]
    fx = flo_xy[..., 0].astype(jnp.float32)
    fy = flo_xy[..., 1].astype(jnp.float32)
    zz = z.astype(jnp.float32) + 1e-5  # [N, H, W, 1]
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    tx = fx - x1
    ty = fy - y1
    gx0 = jnp.exp(-jnp.square(tx))
    gx1 = jnp.exp(-jnp.square(1.0 - tx))
    gy0 = jnp.exp(-jnp.square(ty))
    gy1 = jnp.exp(-jnp.square(1.0 - ty))
    sx = gx0 + gx1
    sy = gy0 + gy1
    flow_adj = jnp.stack([x1 + gx1 / sx, y1 + gy1 / sy], axis=-1)
    scale = zz * (sx * sy)[..., None]
    packed = jnp.concatenate([img.astype(jnp.float32) * scale, scale], -1)
    out = softsplat_func(packed, flow_adj)
    return out[..., :c].astype(img.dtype), out[..., c:].astype(img.dtype)


def _seq_flow(p: Params, x: Array, idxs_strides) -> Array:
    """Run a Sequential of (conv, relu?, nearest-up?) steps described by
    (index, kind) tuples."""
    for idx, kind in idxs_strides:
        if kind == "up":
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        elif kind.startswith("c"):
            stride = 2 if kind == "c2" else 1
            k = p[str(idx)]["weight"].shape[-1]
            pad = 1 if k in (3, 4) else 0
            x = conv2d(x, p[str(idx)], stride=stride, padding=pad)
        elif kind == "relu":
            x = jax.nn.relu(x)
    return x


def _conv_flow_bottom(p: Params, x: Array) -> Array:
    """conv_flow_bottom (xvfi_arch.py:92-104)."""
    return _seq_flow(p, x, [
        (0, "c2"), (None, "relu"), (2, "c2"), (None, "relu"), (None, "up"),
        (5, "c1"), (None, "relu"), (None, "up"), (8, "c1"), (None, "relu"),
        (10, "c1"),
    ])


def _conv_flow2(p: Params, x: Array) -> Array:
    """conv_flow2 (xvfi_arch.py:108-120) — same topology as bottom."""
    return _seq_flow(p, x, [
        (0, "c2"), (None, "relu"), (2, "c2"), (None, "relu"), (None, "up"),
        (5, "c1"), (None, "relu"), (None, "up"), (8, "c1"), (None, "relu"),
        (10, "c1"),
    ])


def _conv_flow3(p: Params, x: Array) -> Array:
    """conv_flow3 (xvfi_arch.py:122-136)."""
    return _seq_flow(p, x, [
        (0, "c1x1"), (None, "relu"), (2, "c2"), (None, "relu"), (4, "c2"),
        (None, "relu"), (None, "up"), (7, "c1"), (None, "relu"), (None, "up"),
        (10, "c1"), (None, "relu"), (12, "c1"),
    ])


def _refine_unet(p: Params, x: Array) -> Array:
    """RefineUNet (xvfi_arch.py:415-446)."""
    enc1 = jax.nn.relu(conv2d(x, p["enc1"], stride=2, padding=1))
    enc2 = jax.nn.relu(conv2d(enc1, p["enc2"], stride=2, padding=1))
    out = jax.nn.relu(conv2d(enc2, p["enc3"], stride=2, padding=1))
    out = jax.nn.relu(conv2d(out, p["dec0"], padding=1))
    out = jnp.repeat(jnp.repeat(out, 2, axis=1), 2, axis=2)
    out = jax.nn.relu(
        conv2d(jnp.concatenate([out, enc2], -1), p["dec1"], padding=1)
    )
    out = jnp.repeat(jnp.repeat(out, 2, axis=1), 2, axis=2)
    out = jax.nn.relu(
        conv2d(jnp.concatenate([out, enc1], -1), p["dec2"], padding=1)
    )
    out = jnp.repeat(jnp.repeat(out, 2, axis=1), 2, axis=2)
    return conv2d(out, p["dec3"], padding=1)


def _vfinet_level(
    p: Params,
    img0: Array,
    img1: Array,
    feat01: Array,  # [B*2, H', W', nf]
    flow_prev: Optional[Array],
    t_value,
    level: int,
    scale: int,
):
    """VFInet.forward for one level (xvfi_arch.py:139-244)."""
    flow, flow_tmp = _level_flow(p, feat01, flow_prev)
    if level != 0:
        return flow
    return _level0_synth(p, img0, img1, feat01, flow, flow_tmp, t_value, scale)


def _level_flow(p: Params, feat01: Array, flow_prev: Optional[Array]):
    """The t-independent flow half of a VFInet level (xvfi_arch.py:139-185)."""
    b2 = feat01.shape[0]
    b = b2 // 2
    feat0 = feat01[:b]
    feat1 = feat01[b:]

    if flow_prev is None:
        flow_tmp = _conv_flow_bottom(
            p["conv_flow_bottom"], jnp.concatenate([feat0, feat1], -1)
        )
        flow = flow_tmp[..., :4]
    else:
        h2, w2 = feat0.shape[1], feat0.shape[2]
        up = 2.0 * resize_bilinear(flow_prev, (h2, w2), align_corners=False)
        wf1 = _bwarp(feat1, up[..., :2])
        wf0 = _bwarp(feat0, up[..., 2:4])
        a = conv2d(jnp.concatenate([feat0, wf1], -1), p["conv_flow1"], padding=1)
        bb = conv2d(jnp.concatenate([feat1, wf0], -1), p["conv_flow1"], padding=1)
        flow_tmp = _conv_flow2(
            p["conv_flow2"], jnp.concatenate([a, bb, up], -1)
        )
        flow = flow_tmp[..., :4] + up
    return flow, flow_tmp


def _level0_synth(
    p: Params, img0: Array, img1: Array, feat01: Array,
    flow: Array, flow_tmp: Array, t_value, scale: int,
) -> Array:
    """The t-dependent synthesis tail of level 0 (xvfi_arch.py:186-244):
    Complementary Flow Reversal + backwarps + RefineUNet blend."""
    b = feat01.shape[0] // 2
    feat0 = feat01[:b]
    feat1 = feat01[b:]
    t = t_value
    flow01 = flow[..., :2]
    flow10 = flow[..., 2:4]
    z01 = jax.nn.sigmoid(flow_tmp[..., 4:5])
    z10 = jax.nn.sigmoid(flow_tmp[..., 5:6])

    # Complementary Flow Reversal (xvfi_arch.py:195-207)
    flow_fwd, norm0 = _z_fwarp(flow01, t * flow01, z01)
    flow_bwd, norm1 = _z_fwarp(flow10, (1.0 - t) * flow10, z10)
    flow_t0 = -(1.0 - t) * (t * flow_fwd) + t * (t * flow_bwd)
    flow_t1 = (1.0 - t) * ((1.0 - t) * flow_fwd) - t * ((1.0 - t) * flow_bwd)
    norm = (1.0 - t) * norm0 + t * norm1
    mask = (norm > 0).astype(norm.dtype)
    flow_t0 = (1 - mask) * flow_t0 + mask * (flow_t0 / (norm + (1 - mask)))
    flow_t1 = (1 - mask) * flow_t1 + mask * (flow_t1 / (norm + (1 - mask)))

    warped0 = _bwarp(feat0, flow_t0)
    warped1 = _bwarp(feat1, flow_t1)

    refine = _conv_flow3(
        p["conv_flow3"],
        jnp.concatenate([feat0, warped0, warped1, feat1, flow_t0, flow_t1], -1),
    ) + jnp.concatenate([flow_t0, flow_t1], -1)
    flow_t0 = refine[..., :2]
    flow_t1 = refine[..., 2:4]

    warped0 = _bwarp(feat0, flow_t0)
    warped1 = _bwarp(feat1, flow_t1)

    h2, w2 = flow_t0.shape[1], flow_t0.shape[2]
    flow_t0_up = scale * resize_bilinear(
        flow_t0, (h2 * scale, w2 * scale), align_corners=False
    )
    flow_t1_up = scale * resize_bilinear(
        flow_t1, (h2 * scale, w2 * scale), align_corners=False
    )
    warped_img0 = _bwarp(img0, flow_t0_up)
    warped_img1 = _bwarp(img1, flow_t1_up)

    shuffled = pixel_shuffle(
        jnp.concatenate([feat0, feat1, warped0, warped1], -1), scale
    )
    refine_out = _refine_unet(
        p["refine_unet"],
        jnp.concatenate(
            [shuffled, img0, img1, warped_img0, warped_img1,
             flow_t0_up, flow_t1_up], -1,
        ),
    )
    occ0 = jax.nn.sigmoid(refine_out[..., 0:1])
    occ1 = 1.0 - occ0
    out = (1.0 - t) * occ0 * warped_img0 + t * occ1 * warped_img1
    out = out / ((1.0 - t) * occ0 + t * occ1) + refine_out[..., 1:4]
    return out


def apply(
    params: Params,
    img0: Array,
    img1: Array,
    t_value,
    module_scale_factor: int = 4,
    s_tst: int = 5,
) -> Array:
    """XVFInet.forward, inference path (xvfi_arch.py:41-80). Inputs must be
    padded so H, W divide 2**s_tst * scale * 4 (the node pads)."""
    b, h, w, _ = img0.shape
    feat01_0, flow, flow_tmp = _flow_stage(
        params, img0, img1, module_scale_factor, s_tst
    )
    t = jnp.asarray(t_value, jnp.float32)
    if t.ndim > 0:
        t = t.reshape(-1, 1, 1, 1)
    return _level0_synth(
        params["vfinet"], img0, img1, feat01_0, flow, flow_tmp, t,
        module_scale_factor,
    )


def _flow_stage(
    params: Params, img0: Array, img1: Array, scale: int, s_tst: int
):
    """Everything t-independent: feature pyramid + the flow half of every
    level (xvfi_arch.py:41-80 loop + :139-185). Reused across timesteps by
    ``make_pair_fns`` — the reference recomputes it per timestep."""
    x01 = jnp.concatenate([img0, img1], axis=0)  # folded T into batch
    feats = feat_pyramid(params, x01, scale, s_tst)
    flow = None
    for level in range(s_tst, 0, -1):
        flow, _ = _level_flow(params["vfinet"], feats[level], flow)
    flow, flow_tmp = _level_flow(params["vfinet"], feats[0], flow)
    return feats[0], flow, flow_tmp


def make_model_fn(params: Params, ckpt_name: str, dtype=jnp.float32):
    from .common import cast_params

    cfg = CKPT_CONFIGS[ckpt_name]
    divide = 2 ** cfg["S_tst"] * cfg["module_scale_factor"] * 4
    params = cast_params(params, dtype)

    def model_fn(f0: Array, f1: Array, t) -> Array:
        h, w = f0.shape[1], f0.shape[2]
        ph = (divide - h % divide) % divide
        pw = (divide - w % divide) % divide
        f0 = f0.astype(dtype)
        f1 = f1.astype(dtype)
        if ph or pw:
            pad = ((0, 0), (0, ph), (0, pw), (0, 0))
            f0 = jnp.pad(f0, pad)
            f1 = jnp.pad(f1, pad)
        out = apply(
            params, f0, f1, t,
            module_scale_factor=cfg["module_scale_factor"], s_tst=cfg["S_tst"],
        )
        return out[:, :h, :w, :].astype(jnp.float32)

    return model_fn


def make_pair_fns(params: Params, ckpt_name: str, dtype=jnp.float32):
    """Per-pair reuse split for ``run_plan_pair_cached``: the feature pyramid
    and ALL flow levels (xvfi_arch.py:41-80 + :139-185) are t-independent and
    run once per pair; only the level-0 CFR + RefineUNet synthesis re-runs
    per timestep. The reference recomputes the whole stack per timestep."""
    from .common import cast_params

    cfg = CKPT_CONFIGS[ckpt_name]
    scale, s_tst = cfg["module_scale_factor"], cfg["S_tst"]
    divide = 2 ** s_tst * scale * 4
    params = cast_params(params, dtype)

    def _pad(f):
        h, w = f.shape[1], f.shape[2]
        ph = (divide - h % divide) % divide
        pw = (divide - w % divide) % divide
        if ph or pw:
            f = jnp.pad(f, ((0, 0), (0, ph), (0, pw), (0, 0)))
        return f

    @jax.jit
    def reuse_fn(f0, f1):
        return _flow_stage(
            params, _pad(f0.astype(dtype)), _pad(f1.astype(dtype)),
            scale, s_tst,
        )

    @jax.jit
    def infer_fn(f0, f1, cache, t):
        h, w = f0.shape[1], f0.shape[2]
        feat01, flow, flow_tmp = cache
        tt = jnp.asarray(t, jnp.float32).reshape(-1, 1, 1, 1)
        out = _level0_synth(
            params["vfinet"], _pad(f0.astype(dtype)), _pad(f1.astype(dtype)),
            feat01, flow, flow_tmp, tt, scale,
        )
        return out[:, :h, :w, :].astype(jnp.float32)

    return reuse_fn, infer_fn
