"""M2M — Many-to-Many splatting VFI.

Reference: ``vfi_models/m2m/M2M_arch.py``. Pipeline:

1. ``Network.bidir`` — a PWC-like pyramid flow net at 2/ratio resolution: a
   3-stage strided extractor (+2 avg-pools) and five ``Decoder`` stages, each
   concatenating features, a PReLU-activated 81-channel cost volume against the
   backwarped other image (``ops.costvol``), and the upsampled flow
   (``M2M_arch.py:414-541``).
2. ``MotionRefineNet`` — upsamples both flows by ``ratio``, builds an image
   pyramid, and an encoder-decoder with C/H/W attention cubes produces
   ``branch=4`` residual flow candidates + reliability masks
   (``M2M_arch.py:649-892``).
3. Multi-branch forward-splat merge ``forwarp_mframe_mask``
   (``M2M_arch.py:551-581``): each branch/direction softsplats
   ``img * t * exp(metric)`` with its flow; sums are normalized jointly and
   holes filled with the time-blended inputs; photometric-consistency metrics
   scaled by the learned ``paramAlpha`` (``M2M_arch.py:966-1022``).

Layout notes: ``backwarp`` is align_corners=True + zeros padding
(``M2M_arch.py:24-92``) → ``ops.warp(padding_mode="zeros")``. Inputs are padded
replicate to a multiple of ``ratio*16`` and jointly mean/std-normalized
(``M2M_arch.py:901-935``). The eight branch-direction splats are batched into a
single ``softsplat_func`` call.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ..ops.costvol import costvol_func
from ..ops.softsplat import softsplat_func
from ..ops.warp import warp
from .common import cast_params, avg_pool2d, conv2d, conv_transpose2d, prelu, resize_by_scale

Array = jnp.ndarray
Params = Dict

BRANCH = 4


def _backwarp(x: Array, flow: Array) -> Array:
    return warp(x, flow, padding_mode="zeros")


def _conv_repl(p: Params, x: Array, k: int = 3, stride: int = 1) -> Array:
    """Conv2d with padding_mode='replicate' (edge-pad then valid conv)."""
    r = k // 2
    if r:
        x = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
    return conv2d(x, p, stride=stride, padding=0)


def _extractor_block(p: Params, x: Array) -> Array:
    """Basic("evenize(replpad)-sconv(2)-prelu-conv(3,replpad)-prelu-conv(3,replpad)-prelu")."""
    # evenize: replicate-pad odd H/W to even
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    m = p["netMain"]
    x = conv2d(x, m["0"], stride=2, padding=0)  # sconv(2): k2 s2 p0
    x = prelu(x, m["1"])
    x = _conv_repl(m["2"], x)
    x = prelu(x, m["3"])
    x = _conv_repl(m["4"], x)
    x = prelu(x, m["5"])
    return x


def _extract(p: Params, x: Array) -> List[Array]:
    one = _extractor_block(p["netOne"], x)
    two = _extractor_block(p["netTwo"], one)
    thr = _extractor_block(p["netThr"], two)
    fou = avg_pool2d(thr, 2, 2)
    fiv = avg_pool2d(fou, 2, 2)
    return [one, two, thr, fou, fiv]


def _decoder(p: Params, one: Array, two: Array, flow: Optional[Array]) -> Array:
    """``Decoder.forward`` (M2M_arch.py:457-504)."""
    if flow is not None:
        flow = 2.0 * resize_by_scale(flow, 2.0)
        cost = prelu(costvol_func(one, _backwarp(two, flow)), p["netCostacti"])
        main = jnp.concatenate([one, cost, flow], axis=-1)
    else:
        cost = prelu(costvol_func(one, two), p["netCostacti"])
        main = jnp.concatenate([one, cost], axis=-1)

    m = p["netMain"]["netMain"]
    x = main
    for i in range(0, 10, 2):
        x = _conv_repl(m[str(i)], x)
        x = prelu(x, m[str(i + 1)])
    x = _conv_repl(m["10"], x)
    return (flow if flow is not None else 0.0) + x


def _bidir(p: Params, one: Array, two: Array):
    feats = _extract(p["netExtractor"], jnp.concatenate([one, two], axis=0))
    n = one.shape[0]
    f_one = [f[:n] for f in feats]
    f_two = [f[n:] for f in feats]

    def run(a, b):
        flow = None
        for name, lvl in (
            ("netFiv", 4), ("netFou", 3), ("netThr", 2), ("netTwo", 1), ("netOne", 0)
        ):
            flow = _decoder(p[name], a[lvl], b[lvl], flow)
        return flow

    return run(f_one, f_two), run(f_two, f_one)


def _conv_prelu(p: Params, x: Array, k=3, stride=1, padding=1) -> Array:
    x = conv2d(x, p["0"], stride=stride, padding=padding)
    return prelu(x, p["1"])


def _conv2_block(p: Params, x: Array, stride=2) -> Array:
    x = _conv_prelu(p["conv1"], x, stride=stride)
    return _conv_prelu(p["conv2"], x, stride=1)


def _deconv(p: Params, x: Array) -> Array:
    x = conv_transpose2d(x, p["0"], stride=2, padding=1)
    return prelu(x, p["1"])


def _img_pyramid(p: Params, x: Array) -> List[Array]:
    x1 = _conv2_block(p["conv1"], x)
    x2 = _conv2_block(p["conv2"], x1)
    x3 = _conv2_block(p["conv3"], x2)
    x4 = _conv2_block(p["conv4"], x3)
    return [x1, x2, x3, x4]


def _attention_cube(p: Params, s: Array) -> Array:
    """conv_C/H/W attention (M2M_arch.py:786-812), NHWC."""
    n, h, w, c = s.shape
    gc = jnp.mean(s, axis=(1, 2), keepdims=True)
    cc = jax.nn.sigmoid(conv2d(gc, p["conv_C"]["1"], padding=0))  # [n,1,1,16c*16]
    cc = cc.reshape(n, 16, c)
    ch = jax.nn.sigmoid(
        conv2d(jnp.mean(s, axis=2, keepdims=True), p["conv_H"]["1"], padding=0)
    )  # [n,h,1,16]
    ch = ch[:, :, 0, :].transpose(0, 2, 1)  # [n,16,h]
    cw = jax.nn.sigmoid(
        conv2d(jnp.mean(s, axis=1, keepdims=True), p["conv_W"]["1"], padding=0)
    )  # [n,1,w,16]
    cw = cw[:, 0, :, :].transpose(0, 2, 1)  # [n,16,w]
    cube = jnp.einsum("nic,nih,niw->nhwc", cc, ch, cw) / 16.0
    return s * cube


def _encdec(p: Params, flow0, flow1, im0, im1, c0, c1):
    """``EncDec.forward`` (M2M_arch.py:717-849)."""
    wim1 = _backwarp(im1, flow0)
    wim0 = _backwarp(im0, flow1)
    s0 = _conv2_block(p["down0"], jnp.concatenate([flow0, im0, wim1], -1))
    s1 = _conv2_block(p["down0"], jnp.concatenate([flow1, im1, wim0], -1))
    s0_levels, s1_levels = [s0], [s1]

    for i, down in enumerate(("down1", "down2", "down3")):
        flow0 = resize_by_scale(flow0, 0.5) * 0.5
        flow1 = resize_by_scale(flow1, 0.5) * 0.5
        a0 = jnp.concatenate([s0_levels[-1], c0[i]], -1)
        a1 = jnp.concatenate([s1_levels[-1], c1[i]], -1)
        wf0 = _backwarp(a0, flow1)
        wf1 = _backwarp(a1, flow0)
        s0_levels.append(_conv2_block(p[down], jnp.concatenate([a0, wf1], -1)))
        s1_levels.append(_conv2_block(p[down], jnp.concatenate([a1, wf0], -1)))

    s0_levels[3] = _attention_cube(p, s0_levels[3])
    s1_levels[3] = _attention_cube(p, s1_levels[3])

    flow0 = resize_by_scale(flow0, 0.5) * 0.5
    flow1 = resize_by_scale(flow1, 0.5) * 0.5
    a0 = jnp.concatenate([s0_levels[3], c0[3]], -1)
    a1 = jnp.concatenate([s1_levels[3], c1[3]], -1)
    wf0 = _backwarp(a0, flow1)
    wf1 = _backwarp(a1, flow0)
    x0 = _deconv(p["up0"], jnp.concatenate([a0, wf1], -1))
    x1 = _deconv(p["up0"], jnp.concatenate([a1, wf0], -1))
    for lvl, up in ((2, "up1"), (1, "up2"), (0, "up3")):
        x0 = _deconv(p[up], jnp.concatenate([s0_levels[lvl], x0], -1))
        x1 = _deconv(p[up], jnp.concatenate([s1_levels[lvl], x1], -1))

    m0 = jax.nn.sigmoid(conv2d(x0, p["conv_m"], padding=1)) * 0.8 + 0.1
    m1 = jax.nn.sigmoid(conv2d(x1, p["conv_m"], padding=1)) * 0.8 + 0.1
    r0 = conv2d(x0, p["conv"], padding=1)
    r1 = conv2d(x1, p["conv"], padding=1)
    return r0, r1, jnp.tile(m0, (1, 1, 1, BRANCH)), jnp.tile(m1, (1, 1, 1, BRANCH))


def pair_reuse(params: Params, im0: Array, im1: Array, ratio: int = 4):
    """Timestep-independent per-pair state (flow pyramid, MotionRefineNet
    branches, photometric metrics) — everything in ``M2M_PWC.forward`` up to
    the per-timestep splat. The reference recomputes all of it for every
    timestep (M2M_arch.py:939-1027 driven per-t by ``m2m/__init__.py:48-52``);
    sharing it across a pair's timesteps is exact since none of it reads t."""
    n, h, w, _ = im0.shape
    align = ratio * 16
    padr = (-w) % align
    padb = (-h) % align
    if padr or padb:
        pad = ((0, 0), (0, padb), (0, padr), (0, 0))
        im0 = jnp.pad(im0, pad, mode="edge")
        im1 = jnp.pad(im1, pad, mode="edge")

    # joint mean/std normalization (M2M_arch.py:915-935); biased std
    m0 = jnp.mean(im0, axis=(1, 2, 3), keepdims=True)
    m1 = jnp.mean(im1, axis=(1, 2, 3), keepdims=True)
    mean_ = (m0 + m1) / 2
    var0 = jnp.var(im0, axis=(1, 2, 3), keepdims=True) + (mean_ - m0) ** 2
    var1 = jnp.var(im1, axis=(1, 2, 3), keepdims=True) + (mean_ - m1) ** 2
    std_ = jnp.sqrt((var0 + var1) / 2)
    im0_o = (im0 - mean_) / (std_ + 1e-7)
    im1_o = (im1 - mean_) / (std_ + 1e-7)

    im0_s = resize_by_scale(im0_o, 2.0 / ratio)
    im1_s = resize_by_scale(im1_o, 2.0 / ratio)

    fwd, bwd = _bidir(params["netFlow"], im0_s, im1_s)

    # MotionRefineNet (M2M_arch.py:860-892)
    mrn = params["MRN"]
    fwd = ratio * resize_by_scale(fwd, float(ratio))
    bwd = ratio * resize_by_scale(bwd, float(ratio))
    c0 = _img_pyramid(mrn["img_pyramid"], im0_o)
    c1 = _img_pyramid(mrn["img_pyramid"], im1_o)
    r0, r1, wei_f, wei_b = _encdec(mrn["motion_encdec"], fwd, bwd, im0_o, im1_o, c0, c1)
    fwd = jnp.tile(fwd, (1, 1, 1, BRANCH)) + r0
    bwd = jnp.tile(bwd, (1, 1, 1, BRANCH)) + r1

    hp, wp = im0_o.shape[1], im0_o.shape[2]

    # flatten branch dim into batch: [n*branch, hp, wp, .]
    def split_branch(x, ch):
        return (
            x.reshape(n, hp, wp, BRANCH, ch).transpose(0, 3, 1, 2, 4)
            .reshape(n * BRANCH, hp, wp, ch)
        )

    fwd_b = split_branch(fwd, 2)
    bwd_b = split_branch(bwd, 2)
    wf_b = split_branch(wei_f, 1)
    wb_b = split_branch(wei_b, 1)
    im0_b = jnp.tile(im0_o[:, None], (1, BRANCH, 1, 1, 1)).reshape(n * BRANCH, hp, wp, 3)
    im1_b = jnp.tile(im1_o[:, None], (1, BRANCH, 1, 1, 1)).reshape(n * BRANCH, hp, wp, 3)

    photo0 = jnp.square(jnp.clip(
        1.0 - wf_b * jnp.mean(jnp.abs(im0_b - _backwarp(im1_b, fwd_b)), -1, keepdims=True),
        0.001, None,
    ))
    photo1 = jnp.square(jnp.clip(
        1.0 - wb_b * jnp.mean(jnp.abs(im1_b - _backwarp(im0_b, bwd_b)), -1, keepdims=True),
        0.001, None,
    ))

    alpha = params["paramAlpha"].reshape(1, 1, 1, 1)
    metric0 = alpha * photo0
    metric1 = alpha * photo1
    return {
        "im0_o": im0_o, "im1_o": im1_o, "im0_b": im0_b, "im1_b": im1_b,
        "fwd_b": fwd_b, "bwd_b": bwd_b,
        "metric0": metric0, "metric1": metric1,
        "mean": mean_, "std": std_,
    }


def pair_infer(
    params: Params, cache, timestep, orig_hw, ratio: int = 4
) -> Array:
    """Per-timestep splat + merge (M2M_arch.py:551-581,1029-1035) from cached
    pair state."""
    h, w = orig_hw
    im0_o, im1_o = cache["im0_o"], cache["im1_o"]
    im0_b, im1_b = cache["im0_b"], cache["im1_b"]
    fwd_b, bwd_b = cache["fwd_b"], cache["bwd_b"]
    metric0, metric1 = cache["metric0"], cache["metric1"]
    mean_, std_ = cache["mean"], cache["std"]
    n, hp, wp, _ = im0_o.shape

    t = jnp.broadcast_to(
        jnp.asarray(timestep, im0_o.dtype).reshape(-1, 1, 1, 1), (n, 1, 1, 1)
    )
    t_b = jnp.tile(t[:, None], (1, BRANCH, 1, 1, 1)).reshape(n * BRANCH, 1, 1, 1)
    flow0 = fwd_b * t_b
    flow1 = bwd_b * (1.0 - t_b)
    t0w = 1.0 - t_b  # td for the forward direction (t1 in the reference)
    t1w = t_b

    # batched multi-branch splat (M2M_arch.py:551-581): one softsplat over the
    # 2*branch*n stacked fields, then sum the per-(branch,direction) groups
    def aug(img, td, metric):
        e = jnp.exp(jnp.clip(metric, -20.0, 20.0))
        return jnp.concatenate([img * td * e, jnp.broadcast_to(td, e.shape) * e], -1)

    splat_in = jnp.concatenate([aug(im0_b, t0w, metric0), aug(im1_b, t1w, metric1)], 0)
    splat_flow = jnp.concatenate([flow0, flow1], 0)
    out = softsplat_func(splat_in, splat_flow)
    out = out.reshape(2, n, BRANCH, hp, wp, 4).sum(axis=(0, 2))

    ten_out = out[..., :-1]
    # each of the 2*BRANCH one_fdir calls adds 1e-7 to its normalizer before the
    # sum (M2M_arch.py:566,576-579); the hole mask compares the epsilon-inclusive
    # total against 1e-5
    norm = out[..., -1:] + 2 * BRANCH * 1e-7
    mask = (norm < 0.00001).astype(ten_out.dtype)
    ten_out = ten_out / norm
    fill = jnp.mean(t0w.reshape(n, BRANCH, 1, 1, 1), 1) * im0_o + jnp.mean(
        t1w.reshape(n, BRANCH, 1, 1, 1), 1
    ) * im1_o
    ten_out = ten_out + mask * fill

    result = ten_out * (std_ + 1e-7) + mean_
    return result[:, :h, :w, :]


def apply(params: Params, im0: Array, im1: Array, timestep, ratio: int = 4) -> Array:
    """``M2M_PWC.forward`` (M2M_arch.py:894-1037) for a single timestep."""
    h, w = im0.shape[1], im0.shape[2]
    cache = pair_reuse(params, im0, im1, ratio)
    return pair_infer(params, cache, timestep, (h, w), ratio)


def make_model_fn(params: Params, dtype=jnp.float32):
    params = cast_params(params, dtype)
    @jax.jit
    def model_fn(f0, f1, t):
        out = apply(params, f0.astype(dtype), f1.astype(dtype), t.astype(dtype))
        return out.astype(jnp.float32)

    return model_fn


def make_pair_fns(params: Params, dtype=jnp.float32):
    """Per-pair reuse split for ``run_plan_pair_cached``: the PWC flow pyramid,
    MotionRefineNet branches and photometric metrics run once per pair instead
    of once per timestep (the reference recomputes them per t)."""
    params = cast_params(params, dtype)

    @jax.jit
    def reuse_fn(f0, f1):
        return pair_reuse(params, f0.astype(dtype), f1.astype(dtype))

    @jax.jit
    def infer_fn(f0, f1, cache, t):
        h, w = f0.shape[1], f0.shape[2]
        out = pair_infer(params, cache, t.astype(dtype), (h, w))
        return out.astype(jnp.float32)

    return reuse_fn, infer_fn
