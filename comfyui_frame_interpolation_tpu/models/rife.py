"""RIFE IFNet — TPU-native reimplementation of the reference architecture
(``vfi_models/rife/rife_arch.py``), all registered arch versions:
4.0 (sudo_rife4), 4.7 (rife47/rife49), 4.17 (rife417), 4.26 (rife426), plus the
4.2-4.10 variants the reference supports.

Coarse-to-fine intermediate-flow estimation: 4 (5 for 4.26) ``IFBlock`` stages at a
static scale pyramid, each refining a 4-channel bidirectional flow + blend mask via
stride-4 conv encoders, 8 residual convs, and a transposed-conv/pixel-shuffle head
(``rife_arch.py:177-276``); frames are backward-warped (``ops.warp``) at every stage
and sigmoid-mask blended (``rife_arch.py:707-723``); arch ≤4.3 optionally refines
with ContextNet + UNet when ``fastmode=False`` (``rife_arch.py:725-730``).

Layout: NHWC, flow channels (x0, y0, x1, y1) on the last axis. Parameters are the
mechanically nested torch state dict (see ``utils/ckpt.py``); tree keys mirror the
torch module names exactly.

Everything is shape-static given (arch_ver, scale_list, H, W): the whole pyramid —
including arch 4.0's data-dependent scale-doubling rescue (``rife_arch.py:598-626``),
expressed as a ``lax.cond`` over the recomputed tail — compiles to one XLA program.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.warp import warp
from .common import (
    cast_params,
    conv2d,
    conv_transpose2d,
    leaky_relu,
    pixel_shuffle,
    prelu,
    resize_by_scale,
)

Array = jnp.ndarray
Params = Dict

ARCH_VERSIONS = ("4.0", "4.2", "4.3", "4.5", "4.6", "4.7", "4.10", "4.17", "4.26")

# ckpt → arch version (reference rife/__init__.py:10-20)
CKPT_NAME_VER_DICT = {
    "rife47.pth": "4.7",
    "rife49.pth": "4.7",
    "rife417.pth": "4.17",
    "rife426.pth": "4.26",
    "sudo_rife4_269.662_testV1_scale1.pth": "4.0",
}


def _conv_act(p: Params, x: Array, arch: str, stride=1, padding=1, dilation=1) -> Array:
    """reference ``conv()``: Conv2d + (PReLU for 4.0, LeakyReLU(0.2) otherwise)."""
    x = conv2d(x, p["0"], stride=stride, padding=padding, dilation=dilation)
    if arch == "4.0":
        return prelu(x, p["1"])
    return leaky_relu(x, 0.2)


def _deconv_act(p: Params, x: Array, arch: str) -> Array:
    x = conv_transpose2d(x, p["0"], stride=2, padding=1)
    if arch == "4.0":
        return prelu(x, p["1"])
    return leaky_relu(x, 0.2)


def _resconv(p: Params, x: Array) -> Array:
    """``ResConv`` (rife_arch.py:20-28): lrelu(conv(x) * beta + x)."""
    beta = p["beta"].reshape(1, 1, 1, -1)  # torch (1,C,1,1) → NHWC broadcast
    return leaky_relu(conv2d(x, p["conv"], stride=1, padding=1) * beta + x, 0.2)


def _if_block(
    p: Params, x, flow: Optional[Array], scale: float, arch: str
) -> Tuple[Array, Array, Optional[Array]]:
    """``IFBlock.forward`` (rife_arch.py:237-276). Returns (flow, mask, feat|None).

    ``x`` may be a list of input planes: they are downsampled individually and
    concatenated at the block's working resolution (bilinear resize is
    channelwise, so this is exact vs resize-of-concat) — materializing the
    full-resolution concat costs an 8 ms layout copy per stage at 1080p b8."""
    if isinstance(x, (list, tuple)):
        if scale != 1.0:
            x = [resize_by_scale(q, 1.0 / scale, align_corners=False) for q in x]
        x = jnp.concatenate(x, axis=-1) if len(x) > 1 else x[0]
    else:
        x = resize_by_scale(x, 1.0 / scale, align_corners=False)
    if flow is not None:
        flow = resize_by_scale(flow, 1.0 / scale, align_corners=False) * (1.0 / scale)
        x = jnp.concatenate([x, flow], axis=-1)
    feat = _conv_act(p["conv0"]["0"], x, arch, stride=2)
    feat = _conv_act(p["conv0"]["1"], feat, arch, stride=2)

    if arch in ("4.0", "4.2", "4.3"):
        h = feat
        for i in range(8):
            h = _conv_act(p["convblock"][str(i)], h, arch)
        feat = h + feat if arch == "4.0" else h
        tmp = conv_transpose2d(feat, p["lastconv"], stride=2, padding=1)
        tmp = resize_by_scale(tmp, scale * 2.0, align_corners=False)
        out_flow = tmp[..., :4] * (scale * 2.0)
    else:
        h = feat
        for i in range(8):
            h = _resconv(p["convblock"][str(i)], h)
        feat = h
        tmp = conv_transpose2d(feat, p["lastconv"]["0"], stride=2, padding=1)
        tmp = pixel_shuffle(tmp, 2)
        tmp = resize_by_scale(tmp, scale, align_corners=False)
        out_flow = tmp[..., :4] * scale

    mask = tmp[..., 4:5]
    if arch == "4.26":
        return out_flow, mask, tmp[..., 5:]
    return out_flow, mask, None


def _encode(p: Params, x: Array, arch: str) -> Array:
    """Feature encoders for 4.7/4.10/4.17/4.26 (rife_arch.py:356-397,414-433,457)."""
    if arch == "4.7":
        h = conv2d(x, p["0"], stride=2, padding=1)
        return conv_transpose2d(h, p["1"], stride=2, padding=1)
    if arch == "4.10":
        h = leaky_relu(conv2d(x, p["0"], stride=2, padding=1), 0.2)
        h = leaky_relu(conv2d(h, p["2"], stride=1, padding=1), 0.2)
        h = leaky_relu(conv2d(h, p["4"], stride=1, padding=1), 0.2)
        return conv_transpose2d(h, p["6"], stride=2, padding=1)
    # 4.17 (Head_417) and 4.26 (Head): cnn0..cnn3 with LeakyReLU between
    h = leaky_relu(conv2d(x, p["cnn0"], stride=2, padding=1), 0.2)
    h = leaky_relu(conv2d(h, p["cnn1"], stride=1, padding=1), 0.2)
    h = leaky_relu(conv2d(h, p["cnn2"], stride=1, padding=1), 0.2)
    return conv_transpose2d(h, p["cnn3"], stride=2, padding=1)


def _contextnet(p: Params, x: Array, flow: Array, arch: str) -> List[Array]:
    """``Contextnet`` (rife_arch.py:279-313)."""
    feats = []
    for i in range(1, 5):
        node = p[f"conv{i}"]
        x = _conv_act(node["conv1"], x, arch, stride=2)
        x = _conv_act(node["conv2"], x, arch, stride=1)
        flow = resize_by_scale(flow, 0.5, align_corners=False) * 0.5
        feats.append(warp(x, flow))
    return feats


def _unet(p: Params, img0, img1, w0, w1, mask, flow, c0, c1, arch) -> Array:
    """``Unet`` (rife_arch.py:316-342)."""

    def conv2(node, x):
        x = _conv_act(node["conv1"], x, arch, stride=2)
        return _conv_act(node["conv2"], x, arch, stride=1)

    s0 = conv2(p["down0"], jnp.concatenate([img0, img1, w0, w1, mask, flow], -1))
    s1 = conv2(p["down1"], jnp.concatenate([s0, c0[0], c1[0]], -1))
    s2 = conv2(p["down2"], jnp.concatenate([s1, c0[1], c1[1]], -1))
    s3 = conv2(p["down3"], jnp.concatenate([s2, c0[2], c1[2]], -1))
    x = _deconv_act(p["up0"], jnp.concatenate([s3, c0[3], c1[3]], -1), arch)
    x = _deconv_act(p["up1"], jnp.concatenate([x, s2], -1), arch)
    x = _deconv_act(p["up2"], jnp.concatenate([x, s1], -1), arch)
    x = _deconv_act(p["up3"], jnp.concatenate([x, s0], -1), arch)
    x = conv2d(x, p["conv"], stride=1, padding=1)
    return jax.nn.sigmoid(x)


def _swap_flow(f: Array) -> Array:
    return jnp.concatenate([f[..., 2:4], f[..., :2]], axis=-1)


def _warp_pair(img: Array, feat: Array, fl2: Array) -> Tuple[Array, Array]:
    """Warp an image and its encoder features with one flow in a single kernel
    call. Bilinear warping is per-channel independent, so concatenating the
    planes is exact; sharing one call amortises the per-tile index math and
    window DMA of the Pallas kernel across all 7 planes."""
    both = warp(jnp.concatenate([img[..., :3], feat], axis=-1), fl2)
    return both[..., :3], both[..., 3:]


def _warp_both(img0: Array, img1: Array, flow: Array) -> Tuple[Array, Array]:
    """Warp img0 by flow[..,:2] and img1 by flow[..,2:4] in ONE kernel call by
    stacking along the batch axis (exact: images are independent); halves the
    per-call fixed cost (tier selection, DMA warm-up, dispatch)."""
    n = img0.shape[0]
    both = warp(
        jnp.concatenate([img0, img1], axis=0),
        jnp.concatenate([flow[..., :2], flow[..., 2:4]], axis=0),
    )
    return both[:n], both[n:]


def _warp_both_pairs(
    img0: Array, f0: Array, img1: Array, f1: Array, flow: Array
) -> Tuple[Array, Array, Array, Array]:
    """Both directions' (image, features) warps fused into a single call."""
    n = img0.shape[0]
    both = warp(
        jnp.concatenate(
            [
                jnp.concatenate([img0[..., :3], f0], axis=-1),
                jnp.concatenate([img1[..., :3], f1], axis=-1),
            ],
            axis=0,
        ),
        jnp.concatenate([flow[..., :2], flow[..., 2:4]], axis=0),
    )
    w0, w1 = both[:n], both[n:]
    return w0[..., :3], w0[..., 3:], w1[..., :3], w1[..., 3:]


def apply(
    params: Params,
    img0: Array,
    img1: Array,
    timestep: Array,
    scale_list: Sequence[float],
    arch_ver: str = "4.7",
    fastmode: bool = True,
    ensemble: bool = False,
) -> Array:
    """``IFNet.forward`` (rife_arch.py:465-732), inference semantics
    (``training=False``). ``timestep``: scalar or [B] vector."""
    assert arch_ver in ARCH_VERSIONS, arch_ver
    n, h, w, _ = img0.shape
    img0 = jnp.clip(img0, 0.0, 1.0)
    img1 = jnp.clip(img1, 0.0, 1.0)
    ph = ((h - 1) // 64 + 1) * 64
    pw = ((w - 1) // 64 + 1) * 64
    pad = ((0, 0), (0, ph - h), (0, pw - w), (0, 0))
    img0 = jnp.pad(img0, pad)
    img1 = jnp.pad(img1, pad)

    timestep = jnp.asarray(timestep, img0.dtype)
    tmap = jnp.broadcast_to(timestep.reshape(-1, 1, 1, 1), (n, ph, pw, 1))

    if arch_ver in ("4.7", "4.10", "4.17", "4.26"):
        # one batched call: the encoders end in a 4-channel full-res transposed
        # conv whose MXU utilization is lane-starved — at least share the pass
        both = _encode(
            params["encode"],
            jnp.concatenate([img0[..., :3], img1[..., :3]], axis=0),
            arch_ver,
        )
        f0, f1 = both[:n], both[n:]
    else:
        f0 = f1 = None

    num_blocks = 5 if arch_ver == "4.26" else 4
    blocks = [params[f"block{i}"] for i in range(num_blocks)]
    scale_list = list(scale_list)

    if arch_ver == "4.26":
        return _forward_426(
            blocks, img0, img1, f0, f1, tmap, scale_list, h, w
        )

    # ---- stage 0 -----------------------------------------------------------
    if arch_ver in ("4.0", "4.2", "4.3", "4.5", "4.6"):
        x0 = [img0[..., :3], img1[..., :3], tmap]
        flow, mask, _ = _if_block(blocks[0], x0, None, scale_list[0], arch_ver)
        if ensemble:
            x0r = [img1[..., :3], img0[..., :3], 1 - tmap]
            fr, mr, _ = _if_block(blocks[0], x0r, None, scale_list[0], arch_ver)
            flow = (flow + _swap_flow(fr)) / 2
            mask = (mask + (-mr)) / 2
    else:  # 4.7 / 4.10 / 4.17
        x0 = [img0[..., :3], img1[..., :3], f0, f1, tmap]
        flow, mask, _ = _if_block(blocks[0], x0, None, scale_list[0], arch_ver)
        if ensemble:
            x0r = [img1[..., :3], img0[..., :3], f1, f0, 1 - tmap]
            fr, mr, _ = _if_block(blocks[0], x0r, None, scale_list[0], arch_ver)
            flow = (flow + _swap_flow(fr)) / 2
            mask = (mask + (-mr)) / 2

    if arch_ver in ("4.0", "4.2", "4.3", "4.5", "4.6"):
        warped0, warped1 = _warp_both(img0, img1, flow)
        wf0c = wf1c = None
    else:
        # stage 1's feature warp uses this same flow — fuse it into the image
        # warp (exact: warping is per-channel independent).
        warped0, wf0c, warped1, wf1c = _warp_both_pairs(img0, f0, img1, f1, flow)

    # ---- stages 1..N -------------------------------------------------------
    def later_stage(i, scales, flow, mask, warped0, warped1, wf0c, wf1c):
        if arch_ver in ("4.0", "4.2", "4.3", "4.5", "4.6"):
            x = [warped0[..., :3], warped1[..., :3], tmap, mask]
            fd, m0, _ = _if_block(blocks[i], x, flow, scales[i], arch_ver)
            if ensemble:
                xr = [warped1[..., :3], warped0[..., :3], 1 - tmap, -mask]
                fr, mr, _ = _if_block(
                    blocks[i], xr, _swap_flow(flow), scales[i], arch_ver
                )
                fd = (fd + _swap_flow(fr)) / 2
                m0 = (m0 + (-mr)) / 2
            new_flow = flow + fd
            new_mask = mask + m0
            new_w0, new_w1 = _warp_both(img0, img1, new_flow)
            return new_flow, new_mask, new_w0, new_w1, None, None
        # 4.7/4.10/4.17: wf0c/wf1c are warp(f{0,1}, flow) computed fused with
        # the previous stage's image warps (same flow).
        x = [warped0[..., :3], warped1[..., :3], wf0c, wf1c, tmap, mask]
        fd, m0, _ = _if_block(blocks[i], x, flow, scales[i], arch_ver)
        # reference quirk (rife_arch.py:645,672-692): flow is updated with the
        # un-averaged fd BEFORE the ensemble pass, which then warps/receives
        # the updated flow; the averaged fd is discarded — only the mask is
        # ensemble-averaged.
        new_flow = flow + fd
        want_feats = ensemble or i < 3
        if want_feats:
            new_w0, wf0n, new_w1, wf1n = _warp_both_pairs(
                img0, f0, img1, f1, new_flow
            )
        else:  # last stage, no ensemble: features are never consumed again
            new_w0, new_w1 = _warp_both(img0, img1, new_flow)
            wf0n = wf1n = None
        if ensemble:
            xr = [warped1[..., :3], warped0[..., :3], wf1n, wf0n, 1 - tmap, -mask]
            fr, mr, _ = _if_block(
                blocks[i], xr, _swap_flow(new_flow), scales[i], arch_ver
            )
            new_mask = (m0 + (-mr)) / 2
        else:
            new_mask = m0
        return new_flow, new_mask, new_w0, new_w1, wf0n, wf1n

    def run_tail(scales, flow, mask, warped0, warped1, start, wf0c, wf1c):
        for i in range(start, 4):
            flow, mask, warped0, warped1, wf0c, wf1c = later_stage(
                i, scales, flow, mask, warped0, warped1, wf0c, wf1c
            )
        return flow, mask, warped0, warped1

    if arch_ver == "4.0":
        # data-dependent rescue (rife_arch.py:598-626): if stage-1 flow exceeds
        # ±32, restart from block0 with doubled scales; the rescue happens BEFORE
        # the stage-1 ensemble averaging, which then runs on the rescued state
        # with the (globally) doubled scale list. Both tails have identical
        # shapes, so this is a runtime lax.cond over the remaining pyramid.
        x1 = [warped0[..., :3], warped1[..., :3], tmap, mask]
        fd1, m01, _ = _if_block(blocks[1], x1, flow, scale_list[1], arch_ver)
        big = (jnp.max(jnp.abs(fd1[..., :2])) > 32) & (
            jnp.max(jnp.abs(fd1[..., 2:4])) > 32
        )

        def finish_stage1(scales, fl, mk, w0, w1, fd, m0):
            if ensemble:
                xr = [w1[..., :3], w0[..., :3], 1 - tmap, -mk]
                fr, mr, _ = _if_block(
                    blocks[1], xr, _swap_flow(fl), scales[1], arch_ver
                )
                fd = (fd + _swap_flow(fr)) / 2
                m0 = (m0 + (-mr)) / 2
            nf = fl + fd
            nm = mk + m0
            nw0, nw1 = _warp_both(img0, img1, nf)
            return run_tail(scales, nf, nm, nw0, nw1, 2, None, None)

        def normal(_):
            return finish_stage1(
                scale_list, flow, mask, warped0, warped1, fd1, m01
            )

        def rescued(_):
            scales2 = [s * 2 for s in scale_list]
            x0b = [img0[..., :3], img1[..., :3], tmap]
            fl, mk, _ = _if_block(blocks[0], x0b, None, scales2[0], arch_ver)
            w0, w1 = _warp_both(img0, img1, fl)
            xb = [w0[..., :3], w1[..., :3], tmap, mk]
            fdb, m0b, _ = _if_block(blocks[1], xb, fl, scales2[1], arch_ver)
            return finish_stage1(scales2, fl, mk, w0, w1, fdb, m0b)

        flow, mask, warped0, warped1 = jax.lax.cond(big, rescued, normal, None)
    else:
        flow, mask, warped0, warped1 = run_tail(
            scale_list, flow, mask, warped0, warped1, 1, wf0c, wf1c
        )

    raw_mask = mask  # the UNet refine receives the pre-sigmoid mask: the
    # reference sigmoids mask_list[3] in place (rife_arch.py:716), leaving the
    # `mask` variable passed to unet (line 728) un-sigmoided.
    mask = jax.nn.sigmoid(mask)
    merged = warped0 * mask + warped1 * (1 - mask)

    if not fastmode and arch_ver in ("4.0", "4.2", "4.3"):
        c0 = _contextnet(params["contextnet"], img0, flow[..., :2], arch_ver)
        c1 = _contextnet(params["contextnet"], img1, flow[..., 2:4], arch_ver)
        tmp = _unet(
            params["unet"], img0, img1, warped0, warped1, raw_mask, flow, c0, c1,
            arch_ver,
        )
        res = tmp[..., :3] * 2 - 1
        merged = jnp.clip(merged + res, 0.0, 1.0)

    return merged[:, :h, :w, :]


def _forward_426(blocks, img0, img1, f0, f1, tmap, scale_list, h, w) -> Array:
    """4.26 path (rife_arch.py:512-587,708-711): 5 blocks, feat threading."""
    x0 = [img0[..., :3], img1[..., :3], f0, f1, tmap]
    flow, mask, feat = _if_block(blocks[0], x0, None, scale_list[0], "4.26")
    # stage i's feature warp uses the same flow as stage i-1's image warp —
    # fuse them into one 7-plane kernel call (exact; see _warp_pair).
    warped0, wf0, warped1, wf1 = _warp_both_pairs(img0, f0, img1, f1, flow)
    for i in range(1, 5):
        x = [warped0[..., :3], warped1[..., :3], wf0, wf1, tmap, mask, feat]
        fd, m0, feat = _if_block(blocks[i], x, flow, scale_list[i], "4.26")
        flow = flow + fd
        mask = m0
        if i < 4:
            warped0, wf0, warped1, wf1 = _warp_both_pairs(
                img0, f0, img1, f1, flow
            )
        else:
            warped0, warped1 = _warp_both(img0, img1, flow)
    final_mask = jax.nn.sigmoid(mask)
    merged = warped0 * final_mask + warped1 * (1 - final_mask)
    return merged[:, :h, :w, :]


def default_scale_list(arch_ver: str, scale_factor: float = 1.0) -> List[float]:
    """reference rife/__init__.py:156-160."""
    if arch_ver == "4.26":
        return [s / scale_factor for s in (16, 8, 4, 2, 1)]
    return [s / scale_factor for s in (8, 4, 2, 1)]


def make_model_fn(
    params: Params,
    arch_ver: str,
    scale_factor: float = 1.0,
    fastmode: bool = True,
    ensemble: bool = False,
    dtype=jnp.float32,
):
    """Build the jitted batched model callable for the plan executor."""
    if arch_ver == "4.26":
        ensemble = False  # reference rife/__init__.py:123-125
    scale_list = default_scale_list(arch_ver, scale_factor)
    # cast weights to the compute dtype once (analog of the reference's
    # model.half() for its fp16 mode, rife/__init__.py:134)
    params = cast_params(params, dtype)

    @jax.jit
    def model_fn(f0, f1, t):
        out = apply(
            params,
            f0.astype(dtype),
            f1.astype(dtype),
            t.astype(dtype),
            scale_list,
            arch_ver=arch_ver,
            fastmode=fastmode,
            ensemble=ensemble,
        )
        return jnp.clip(out, 0.0, 1.0).astype(jnp.float32)

    return model_fn


# ---------------------------------------------------------------------------
# Random initialization (tests / benchmarks without checkpoints)
# ---------------------------------------------------------------------------


def _rand_conv(key, o, i, kh=3, kw=3, bias=True):
    k1, k2 = jax.random.split(key)
    fan_in = i * kh * kw
    bound = 1.0 / np.sqrt(fan_in)
    p = {"weight": jax.random.uniform(k1, (o, i, kh, kw), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (o,), jnp.float32, -bound, bound)
    return p


def _rand_convT(key, i, o, kh=4, kw=4):
    k1, k2 = jax.random.split(key)
    fan_in = o * kh * kw
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "weight": jax.random.uniform(k1, (i, o, kh, kw), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(k2, (o,), jnp.float32, -bound, bound),
    }


def init_params(key, arch_ver: str = "4.7") -> Params:
    """Random IFNet parameter tree with the reference's state-dict shapes."""
    assert arch_ver in ("4.7", "4.17", "4.26"), "random init supports 4.7/4.17/4.26"
    keys = iter(jax.random.split(key, 512))

    def conv_act(o, i):
        return {"0": _rand_conv(next(keys), o, i)}

    def if_block(in_planes, c, out_mult):
        p = {
            "conv0": {
                "0": conv_act(c // 2, in_planes),
                "1": conv_act(c, c // 2),
            },
            "convblock": {
                str(j): {
                    "conv": _rand_conv(next(keys), c, c),
                    "beta": jnp.ones((1, c, 1, 1), jnp.float32),
                }
                for j in range(8)
            },
            "lastconv": {"0": _rand_convT(next(keys), c, 4 * out_mult)},
        }
        return p

    if arch_ver == "4.7":
        params = {
            "block0": if_block(7 + 8, 192, 6),
            "block1": if_block(8 + 4 + 8, 128, 6),
            "block2": if_block(8 + 4 + 8, 96, 6),
            "block3": if_block(8 + 4 + 8, 64, 6),
            "encode": {
                "0": _rand_conv(next(keys), 16, 3),
                "1": _rand_convT(next(keys), 16, 4),
            },
        }
    elif arch_ver == "4.17":
        params = {
            "block0": if_block(7 + 16, 192, 6),
            "block1": if_block(8 + 4 + 16, 128, 6),
            "block2": if_block(8 + 4 + 16, 96, 6),
            "block3": if_block(8 + 4 + 16, 64, 6),
            "encode": {
                "cnn0": _rand_conv(next(keys), 32, 3),
                "cnn1": _rand_conv(next(keys), 32, 32),
                "cnn2": _rand_conv(next(keys), 32, 32),
                "cnn3": _rand_convT(next(keys), 32, 8),
            },
        }
    else:  # 4.26
        params = {
            "block0": if_block(7 + 8, 192, 13),
            "block1": if_block(8 + 4 + 8 + 8, 128, 13),
            "block2": if_block(8 + 4 + 8 + 8, 96, 13),
            "block3": if_block(8 + 4 + 8 + 8, 64, 13),
            "block4": if_block(8 + 4 + 8 + 8, 32, 13),
            "encode": {
                "cnn0": _rand_conv(next(keys), 16, 3),
                "cnn1": _rand_conv(next(keys), 16, 16),
                "cnn2": _rand_conv(next(keys), 16, 16),
                "cnn3": _rand_convT(next(keys), 16, 4),
            },
        }
    return params
