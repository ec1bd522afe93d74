"""EISAI (anime interpolation) — TPU-native reimplementation of the reference
architecture (``vfi_models/eisai/eisai_arch.py``): RAFT-style RFR flow network
(``eisai_arch.py:772-953``), SoftsplatLite forward-splatting synthesis
(``eisai_arch.py:2456-2538``) and the DTM distance-transform refinement module
(``eisai_arch.py:2539-2559``), wired together as in the node wrapper
(``vfi_models/eisai/__init__.py:30-40``).

Layout: NHWC. Flow conventions mirror the reference exactly: the RFR core
produces (x, y) displacement channels (RAFT convention); the ``RAFT`` wrapper
flips them so everything downstream of it — FlowZMetric, HalfWarper, the
softsplat calls — consumes (y, x) flows (``eisai_arch.py:2583-2585``,
``flow_backwarp`` at 954-994 normalizes channel 0 by H).

Deliberate divergences from the reference, all documented inline:
- The synthesis resolution follows the *input* frames instead of the
  hard-coded (540, 960) of ``SoftsplatLite.__init__`` (2459-2484); for
  540x960 inputs — the model's native training size — behavior is identical.
- ``ResnetFeatureExtractor``'s ``T.Resize(256)`` is implemented as plain
  bilinear resize of the smaller edge to 256 (torchvision's tensor backend
  default, ``antialias=False``, at the torchvision version the model was
  trained with).
- The RFR ``flow_init`` branch (``eisai_arch.py:817-852``) is dead code for
  the node (it always calls RAFT with ``flow0=None``) and is not implemented.

Parameters are the mechanically nested torch state dicts (``utils/ckpt.py``)
of the three checkpoints the node loads: ``raft`` (the RFR submodule of
``eisai_anime_interp_full.ckpt``), ``ssl`` and ``dtm``.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.edt import batch_edt
from ..ops.softsplat import function_softsplat
from ..ops.warp import bilinear_sample, warp
from .common import (
    cast_params,
    avg_pool2d,
    batch_norm,
    conv2d,
    prelu,
    resize_bilinear,
)

Array = jax.Array
Params = Dict[str, "Params | Array"]


# =========================================================================
# small image utilities (eisai_arch.py:95-101, 1518-1576, 2235-2263)
# =========================================================================


def pixel_logit(x: Array, pixel_margin: float = 1.0) -> Array:
    """eisai_arch.py:98-101."""
    x = (x * (255.0 - 2.0 * pixel_margin) + pixel_margin) / 255.0
    return jnp.log(x / (1.0 - x))


def _gauss_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    """kornia ``get_gaussian_kernel1d`` semantics: discrete gaussian over
    ``arange(ksize) - (ksize-1)/2``, normalized to sum 1."""
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(xs**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: Array, ksize: int, sigma: float) -> Array:
    """kornia ``filters.gaussian_blur2d(..., border_type="replicate")``:
    separable gaussian with edge-replicated padding (NHWC, per channel)."""
    n, h, w, c = x.shape
    k = _gauss_kernel1d(ksize, sigma)
    pad = ksize // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    kv = jnp.asarray(k, x.dtype)
    # depthwise separable: rows then cols
    wr = jnp.zeros((ksize, 1, 1, c), x.dtype) + kv[:, None, None, None]
    out = jax.lax.conv_general_dilated(
        xp, wr, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    wc = jnp.zeros((1, ksize, 1, c), x.dtype) + kv[None, :, None, None]
    return jax.lax.conv_general_dilated(
        out, wc, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def rgb_to_grayscale(x: Array) -> Array:
    """kornia ``color.rgb_to_grayscale`` weights."""
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    return 0.299 * r + 0.587 * g + 0.114 * b


def rgb_to_lab(x: Array) -> Array:
    """kornia ``color.rgb_to_lab``: sRGB → linear → XYZ (D65) → CIELAB."""
    lin = jnp.where(
        x > 0.04045, jnp.power((x + 0.055) / 1.055, 2.4), x / 12.92
    )
    r, g, b = lin[..., 0], lin[..., 1], lin[..., 2]
    xx = 0.412453 * r + 0.357580 * g + 0.180423 * b
    yy = 0.212671 * r + 0.715160 * g + 0.072169 * b
    zz = 0.019334 * r + 0.119193 * g + 0.950227 * b
    xyz = jnp.stack(
        [xx / 0.950456, yy, zz / 1.088754], axis=-1
    )
    thr = 0.008856
    f = jnp.where(
        xyz > thr, jnp.power(xyz, 1.0 / 3.0), 7.787 * xyz + 4.0 / 29.0
    )
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    bb = 200.0 * (fy - fz)
    return jnp.stack([L, a, bb], axis=-1)


def batch_dog(
    x: Array,
    t: float = 1.0,
    sigma: float = 1.0,
    k: float = 1.6,
    epsilon: float = 0.01,
    kernel_factor: float = 4.0,
    clip: bool = True,
) -> Array:
    """eisai_arch.py:1541-1576 (difference of gaussians on grayscale)."""
    if x.shape[-1] in (3, 4):
        x = rgb_to_grayscale(x[..., :3])
    kern0 = max(2 * int(sigma * kernel_factor) + 1, 3)
    kern1 = max(2 * int(sigma * k * kernel_factor) + 1, 3)
    g0 = gaussian_blur(x, kern0, sigma)
    g1 = gaussian_blur(x, kern1, sigma * k)
    ans = 0.5 + t * (g1 - g0) - epsilon
    return jnp.clip(ans, 0.0, 1.0) if clip else ans


def nedt(
    img: Array,
    t: float = 2.0,
    sigma_factor: float = 1.0 / 540.0,
    k: float = 1.6,
    epsilon: float = 0.01,
    kernel_factor: float = 4.0,
    exp_factor: float = 540.0 / 15.0,
) -> Array:
    """NEDT (eisai_arch.py:2235-2263): normalized euclidean distance transform
    of the thresholded DoG edge map."""
    h, w = img.shape[1], img.shape[2]
    dog = batch_dog(
        img, t=t, sigma=h * sigma_factor, k=k, epsilon=epsilon,
        kernel_factor=kernel_factor, clip=False,
    )
    edt = batch_edt((dog > 0.5).astype(jnp.float32))
    return 1.0 - jnp.exp(-edt * exp_factor / max(h, w))


def flow_backwarp(img: Array, flow_yx: Array, padding_mode: str = "border") -> Array:
    """eisai_arch.py:954-994: backwarp with a (y, x)-ordered flow normalized by
    the image size (align_corners=False grid_sample semantics)."""
    n, h, w, _ = img.shape
    fy = flow_yx[..., 0].astype(jnp.float32)
    fx = flow_yx[..., 1].astype(jnp.float32)
    # base grid linspace(-1, 1, n) mapped to pixels under align_corners=False:
    # px = fx + j*W/(W-1) - 0.5. Expressed as grid + adjusted-flow so it rides
    # ops.warp.warp (Pallas windowed kernel) instead of an XLA gather.
    jj = jnp.arange(w, dtype=jnp.float32)
    ii = jnp.arange(h, dtype=jnp.float32)
    off_x = jj * (w / max(w - 1, 1)) - jj - 0.5
    off_y = ii * (h / max(h - 1, 1)) - ii - 0.5
    adj = jnp.stack(
        [fx + off_x[None, None, :], fy + off_y[None, :, None]], axis=-1
    )
    return warp(img, adj, padding_mode=padding_mode)


def _morph_open(x: Array, k: int) -> Array:
    """kornia ``morphology.opening`` with a k×k ones structuring element and
    geodesic borders (erosion ignores outside via +inf pad, dilation via -inf)."""
    if k == 0:
        return x
    pad = ((0, 0), (k // 2, k - 1 - k // 2), (k // 2, k - 1 - k // 2), (0, 0))
    er = -jax.lax.reduce_window(
        jnp.pad(-x, pad, constant_values=-jnp.inf),
        -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1), "VALID",
    )
    di = jax.lax.reduce_window(
        jnp.pad(er, pad, constant_values=-jnp.inf),
        -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1), "VALID",
    )
    return di


def _resize(x: Array, out_hw: Tuple[int, int], is_flow: bool = False) -> Array:
    """``Interpolator`` (eisai_arch.py:1438-1478): bilinear, align_corners=False;
    flows ((y, x) channels) are rescaled by the size ratio."""
    h, w = x.shape[1], x.shape[2]
    if (h, w) != tuple(out_hw):
        x = resize_bilinear(x, out_hw, align_corners=False)
    if is_flow:
        x = x * jnp.asarray(
            [out_hw[0] / h, out_hw[1] / w], x.dtype
        )[None, None, None, :]
    return x


# =========================================================================
# RFR flow network (eisai_arch.py:179-228, 230-435, 497-571, 772-953)
# =========================================================================


def _resblock_none(p: Params, x: Array, stride: int = 1) -> Array:
    """ResidualBlock with norm_fn='none' (eisai_arch.py:381-434)."""
    y = jax.nn.relu(conv2d(x, p["conv1"], stride=stride, padding=1))
    y = jax.nn.relu(conv2d(y, p["conv2"], padding=1))
    if stride != 1:
        x = conv2d(x, p["downsample"]["0"], stride=stride)
    return jax.nn.relu(x + y)


def _basic_encoder(p: Params, x: Array) -> Array:
    """BasicEncoder(output_dim=256, norm='none') (eisai_arch.py:497-571)."""
    x = jax.nn.relu(conv2d(x, p["conv1"], stride=2, padding=3))
    x = _resblock_none(p["layer1"]["0"], x)
    x = _resblock_none(p["layer1"]["1"], x)
    x = _resblock_none(p["layer2"]["0"], x, stride=2)
    x = _resblock_none(p["layer2"]["1"], x)
    x = _resblock_none(p["layer3"]["0"], x, stride=2)
    x = _resblock_none(p["layer3"]["1"], x)
    return conv2d(x, p["conv2"])


def _corr_pyramid(f1: Array, f2: Array, num_levels: int = 4) -> List[Array]:
    """CorrBlock.__init__ (eisai_arch.py:179-195): all-pairs correlation as a
    single batched matmul (MXU-friendly), then an avg-pooled pyramid over the
    target spatial dims. Returns [B*H1*W1, h2, w2, 1] per level.

    Memory bound: the level-0 volume is O((H/8 * W/8)^2) f32 — ~258 MB per
    image at the model's native 540x960 (the reference hard-codes that
    synthesis size, eisai_arch.py:2485), ~2.6 GB at 1080p, growing quartically.
    Same bound as the reference CorrBlock; above ~720p prefer tiling the
    query batch externally. Measured build cost on v5e: 14 ms at 540p b4."""
    b, h, w, c = f1.shape
    a = f1.reshape(b, h * w, c).astype(jnp.float32)
    bm = f2.reshape(b, h * w, c).astype(jnp.float32)
    corr = jnp.einsum("bnc,bmc->bnm", a, bm) / math.sqrt(c)
    corr = corr.reshape(b * h * w, h, w, 1)
    pyr = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2d(corr, 2)
        pyr.append(corr)
    return pyr


def _corr_lookup(
    pyr: List[Array], coords_xy: Array, radius: int = 4
) -> Array:
    """CorrBlock.__call__ (eisai_arch.py:196-217): sample a (2r+1)² window
    around the current correspondence at every pyramid level.

    coords_xy: [B, H, W, 2] (x, y) pixel coords at 1/8 resolution.
    Returns [B, H, W, levels*(2r+1)²]."""
    b, h, w, _ = coords_xy.shape
    n = b * h * w
    r = radius
    nt = 2 * r + 1
    # delta semantics (eisai_arch.py:203-205): meshgrid(dy, dx, 'ij') added to
    # (x, y) centroids — the reference adds a (dy, dx) delta to (x, y), so
    # tap (i, j) samples at x = cx + d[i], y = cy + d[j]. The window is
    # SEPARABLE in (i, j), and bilinear sampling with zeros padding is a tent
    # weight over each axis independently, so the whole 81-tap lookup is two
    # tiny batched matmuls against tent-weight matrices — no gather at all
    # (XLA lowers a B*H*W-deep batched gather catastrophically on TPU; this
    # was the dominant cost of the RAFT iteration, ~518 ms/iter at 540p b2).
    # Out-of-range taps get all-zero tent weights = zeros-padding semantics.
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    out = []
    for i, corr in enumerate(pyr):
        h2, w2 = corr.shape[1:3]
        cen = coords_xy.reshape(n, 2).astype(jnp.float32) / (2**i)
        sx = cen[:, 0:1] + d[None]  # [N, nt]
        sy = cen[:, 1:2] + d[None]
        yg = jnp.arange(h2, dtype=jnp.float32)
        xg = jnp.arange(w2, dtype=jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[..., None] - yg))  # [N,nt,h2]
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[..., None] - xg))  # [N,nt,w2]
        tmp = jnp.einsum("njh,nhw->njw", wy, corr[..., 0])
        taps = jnp.einsum("niw,njw->nij", wx, tmp)  # [N, nt(i), nt(j)]
        out.append(taps.reshape(b, h, w, nt * nt))
    return jnp.concatenate(out, axis=-1)


def _motion_encoder(p: Params, flow: Array, corr: Array) -> Array:
    """BasicMotionEncoder (eisai_arch.py:318-337)."""
    cor = jax.nn.relu(conv2d(corr, p["convc1"]))
    cor = jax.nn.relu(conv2d(cor, p["convc2"], padding=1))
    flo = jax.nn.relu(conv2d(flow, p["convf1"], padding=3))
    flo = jax.nn.relu(conv2d(flo, p["convf2"], padding=1))
    out = jax.nn.relu(
        conv2d(jnp.concatenate([cor, flo], -1), p["conv"], padding=1)
    )
    return jnp.concatenate([out, flow], -1)


def _sep_conv_gru(p: Params, h: Array, x: Array) -> Array:
    """SepConvGRU (eisai_arch.py:259-298)."""
    for a, b_ in (("1", (0, 2)), ("2", (2, 0))):
        hx = jnp.concatenate([h, x], -1)
        z = jax.nn.sigmoid(conv2d(hx, p[f"convz{a}"], padding=b_))
        r = jax.nn.sigmoid(conv2d(hx, p[f"convr{a}"], padding=b_))
        q = jnp.tanh(
            conv2d(jnp.concatenate([r * h, x], -1), p[f"convq{a}"], padding=b_)
        )
        h = (1 - z) * h + z * q
    return h


def _update_block(
    p: Params, net: Array, inp: Array, corr: Array, flow: Array
) -> Tuple[Array, Array, Array]:
    """BasicUpdateBlock (eisai_arch.py:355-379)."""
    mf = _motion_encoder(p["encoder"], flow, corr)
    x = jnp.concatenate([inp, mf], -1)
    net = _sep_conv_gru(p["gru"], net, x)
    delta = conv2d(
        jax.nn.relu(conv2d(net, p["flow_head"]["conv1"], padding=1)),
        p["flow_head"]["conv2"], padding=1,
    )
    mask = 0.25 * conv2d(
        jax.nn.relu(conv2d(net, p["mask"]["0"], padding=1)), p["mask"]["2"]
    )
    return net, mask, delta


def _convex_upsample_flow(flow: Array, mask: Array) -> Array:
    """RFR.upsample_flow (eisai_arch.py:803-815): softmax-convex combination
    of the 3x3 neighborhood, 8x upsample."""
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    f = 8.0 * flow
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = jnp.stack(
        [
            fp[:, di : di + h, dj : dj + w, :]
            for di in range(3)
            for dj in range(3)
        ],
        axis=3,
    )  # [B, H, W, 9, 2]
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", m, taps)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


def rfr_flow(p: Params, image1: Array, image2: Array, iters: int = 12) -> Array:
    """RFR.forward with flow_init=None — see ``_rfr_forward`` docstring."""
    b, h, w, _ = image1.shape
    h8, w8 = h // 8 * 8, w // 8 * 8
    im1, im2 = image1, image2
    if (h8, w8) != (h, w):
        im1 = resize_bilinear(im1, (h8, w8), align_corners=False)
        im2 = resize_bilinear(im2, (h8, w8), align_corners=False)

    fmap1 = _basic_encoder(p["fnet"], im1).astype(jnp.float32)
    fmap2 = _basic_encoder(p["fnet"], im2).astype(jnp.float32)
    pyr = _corr_pyramid(fmap1, fmap2)

    cnet = _basic_encoder(p["fnet"], im1)
    # recurrent GRU state stays f32: the correlation features are f32 by
    # construction, so the update block returns an f32 net — under bf16
    # params a bf16 initial carry would make the scan carry dtype-unstable
    net = jnp.tanh(cnet[..., :128]).astype(jnp.float32)
    inp = jax.nn.relu(cnet[..., 128:])

    gh, gw = h8 // 8, w8 // 8
    gx, gy = jnp.meshgrid(
        jnp.arange(gw, dtype=jnp.float32),
        jnp.arange(gh, dtype=jnp.float32),
        indexing="xy",
    )
    coords0 = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (b, gh, gw, 2))

    def step(net, coords1):
        corr = _corr_lookup(pyr, coords1)
        flow = coords1 - coords0
        net, up_mask, delta = _update_block(
            p["update_block"], net, inp, corr, flow
        )
        return net, coords1 + delta, up_mask

    def body(carry, _):
        net, coords1 = carry
        net, coords1, _ = step(net, coords1)
        return (net, coords1), None

    if iters > 1:
        (net, coords1), _ = jax.lax.scan(
            body, (net, coords0), None, length=iters - 1
        )
    else:
        coords1 = coords0
    net, coords1, up_mask = step(net, coords1)
    f12 = _convex_upsample_flow(coords1 - coords0, up_mask)

    # rescale to the original size (eisai_arch.py:884-889)
    f12 = f12 * jnp.asarray(
        [w / w8, h / h8], jnp.float32
    )[None, None, None, :]
    if (h8, w8) != (h, w):
        f12 = resize_bilinear(f12, (h, w), align_corners=False)
    return f12


def raft_flow(p: Params, img0: Array, img1: Array, iters: int = 12) -> Array:
    """RAFT wrapper (eisai_arch.py:2561-2586): runs RFR(img1, img0) and flips
    the flow channels to the (y, x) order the synthesis stack consumes."""
    f = rfr_flow(p, img1, img0, iters=iters)
    return f[..., ::-1]


# =========================================================================
# SoftsplatLite (eisai_arch.py:2143-2538)
# =========================================================================


def _flow_z_metric(
    img0: Array, img1: Array, flow0: Array, flow1: Array
) -> Tuple[Array, Array]:
    """FlowZMetric (eisai_arch.py:2217-2232)."""
    lab0 = rgb_to_lab(img0[..., :3])
    lab1 = rgb_to_lab(img1[..., :3])
    z0 = -0.1 * jnp.linalg.norm(
        lab1 - flow_backwarp(lab0, flow0), axis=-1, keepdims=True
    )
    z1 = -0.1 * jnp.linalg.norm(
        lab0 - flow_backwarp(lab1, flow1), axis=-1, keepdims=True
    )
    return z0, z1


def _forewarp_soft(img: Array, flow_yx: Array, metric: Array) -> Array:
    """flow_forewarp(mode='sm', mask=True) (eisai_arch.py:1003-1056): append a
    ones channel, flip the flow to (x, y) and softmax-splat."""
    n, h, w, c = img.shape
    inp = jnp.concatenate(
        [img, jnp.ones((n, h, w, 1), img.dtype)], axis=-1
    ).astype(jnp.float32)
    return function_softsplat(
        inp, flow_yx[..., ::-1].astype(jnp.float32), metric.astype(jnp.float32),
        "soft",
    )


def _half_warper(
    img0: Array, img1: Array, flow0: Array, flow1: Array,
    z0: Array, z1: Array, k: int, t,
) -> Tuple[List[Array], List[Array], List[Array]]:
    """HalfWarper (eisai_arch.py:2266-2309)."""
    flow0_ = (1.0 - t) * flow0
    flow1_ = t * flow1
    f01 = _forewarp_soft(img0, flow1_, z1)
    f10 = _forewarp_soft(img1, flow0_, z0)
    f01i, f01m = f01[..., :-1], _morph_open(f01[..., -1:], k)
    f10i, f10m = f10[..., :-1], _morph_open(f10[..., -1:], k)
    base0 = f01m * f01i + (1 - f01m) * f10i
    base1 = f10m * f10i + (1 - f10m) * f01i
    return [base0, base1, f01i, f10i], [flow0_, flow1_], [f01m, f10m]


# --- resnet50 trunk (torchvision structure; eisai_arch.py:2312-2384) --------

_RESNET_MEAN = (0.485, 0.456, 0.406)
_RESNET_STD = (0.229, 0.224, 0.225)


def _bottleneck(p: Params, x: Array, stride: int = 1) -> Array:
    y = jax.nn.relu(batch_norm(conv2d(x, p["conv1"]), p["bn1"]))
    y = jax.nn.relu(
        batch_norm(conv2d(y, p["conv2"], stride=stride, padding=1), p["bn2"])
    )
    y = batch_norm(conv2d(y, p["conv3"]), p["bn3"])
    if "downsample" in p:
        x = batch_norm(
            conv2d(x, p["downsample"]["0"], stride=stride), p["downsample"]["1"]
        )
    return jax.nn.relu(x + y)


def _max_pool_3x3s2p1(x: Array) -> Array:
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf
    )
    return jax.lax.reduce_window(
        xp, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _resize_smaller_edge(x: Array, target: int = 256) -> Array:
    """torchvision ``T.Resize(256)`` tensor semantics: smaller edge to 256,
    bilinear, antialias per the pre-0.17 tensor default (off)."""
    h, w = x.shape[1], x.shape[2]
    if h <= w:
        out = (target, int(round(w * target / h)))
    else:
        out = (int(round(h * target / w)), target)
    return resize_bilinear(x, out, align_corners=False)


def _resnet_features(p: Params, x: Array) -> List[Array]:
    """ResnetFeatureExtractor.forward (eisai_arch.py:2364-2382): resize,
    imagenet-normalize, return [conv1, layer1, layer2] activations."""
    x = _resize_smaller_edge(x[..., :3])
    x = (x - jnp.asarray(_RESNET_MEAN, x.dtype)) / jnp.asarray(
        _RESNET_STD, x.dtype
    )
    x = jax.nn.relu(batch_norm(conv2d(x, p["conv1"], stride=2, padding=3), p["bn1"]))
    ans = [x]
    x = _max_pool_3x3s2p1(x)
    for i in range(3):
        x = _bottleneck(p["layer1"][str(i)], x, stride=1)
    ans.append(x)
    for i in range(4):
        x = _bottleneck(p["layer2"][str(i)], x, stride=2 if i == 0 else 1)
    ans.append(x)
    return ans


# --- gridnet (eisai_arch.py:1261-1436) --------------------------------------


def _pconv_bn(p: Params, x: Array, padding=1, stride=1) -> Array:
    """nn.Sequential(PReLU, Conv2d, BatchNorm2d) with torch indices 0/1/2."""
    x = prelu(x, p["0"])
    x = conv2d(x, p["1"], stride=stride, padding=padding)
    return batch_norm(x, p["2"])


def _gridnet_resnet(p: Params, x: Array) -> Array:
    y = prelu(x, p["net"]["0"])
    y = conv2d(y, p["net"]["1"], padding=1)
    y = batch_norm(y, p["net"]["2"])
    y = prelu(y, p["net"]["3"])
    y = conv2d(y, p["net"]["4"], padding=1)
    y = batch_norm(y, p["net"]["5"])
    return x + y


def _gridnet_downsample(p: Params, x: Array) -> Array:
    y = prelu(x, p["net"]["0"])
    y = conv2d(y, p["net"]["1"], stride=2, padding=1)
    y = batch_norm(y, p["net"]["2"])
    y = prelu(y, p["net"]["3"])
    y = conv2d(y, p["net"]["4"], padding=1)
    return batch_norm(y, p["net"]["5"])


def _gridnet_upsample(p: Params, x: Array) -> Array:
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
    y = prelu(y, p["net"]["1"])
    y = conv2d(y, p["net"]["2"], padding=1)
    y = batch_norm(y, p["net"]["3"])
    y = prelu(y, p["net"]["4"])
    y = conv2d(y, p["net"]["5"], padding=1)
    return batch_norm(y, p["net"]["6"])


def _gridnet(p: Params, xs: List[Array], depth: int = 1) -> List[Array]:
    """Gridnet (eisai_arch.py:1261-1331), eval mode (dropout inert)."""
    t = xs
    for e in range(depth):
        enc = p["encoders"][str(e)]
        o0 = _gridnet_resnet(enc["resnet_0"], t[0])
        o1 = _gridnet_resnet(enc["resnet_1"], t[1]) + _gridnet_downsample(
            enc["downsample_01"], o0
        )
        o2 = _gridnet_resnet(enc["resnet_2"], t[2]) + _gridnet_downsample(
            enc["downsample_12"], o1
        )
        t = [o0, o1, o2]
    for d in range(depth):
        dec = p["decoders"][str(d)]
        o2 = _gridnet_resnet(dec["resnet_2"], t[2])
        o1 = _gridnet_resnet(dec["resnet_1"], t[1]) + _gridnet_upsample(
            dec["upsample_21"], o2
        )
        o0 = _gridnet_resnet(dec["resnet_0"], t[0]) + _gridnet_upsample(
            dec["upsample_10"], o1
        )
        t = [o0, o1, o2]
    return t


# --- synthesizer (eisai_arch.py:2161-2215) ----------------------------------


def _synth_resnet(p: Params, x: Array) -> Array:
    y = prelu(x, p["net"]["0"])
    y = conv2d(y, p["net"]["1"], padding=1)
    y = batch_norm(y, p["net"]["2"])
    y = prelu(y, p["net"]["3"])
    y = conv2d(y, p["net"]["4"], padding=1)
    y = batch_norm(y, p["net"]["5"])
    return x + y


def _synthesizer(
    p: Params, size: Tuple[int, int],
    images: List[Array], flows: List[Array], masks: List[Array],
    features: List[Array],
) -> Array:
    """Synthesizer.forward (eisai_arch.py:2194-2213)."""
    dia = math.sqrt(size[0] ** 2 + size[1] ** 2)
    images = [(images[0] + images[1]) / 2.0] + list(images)
    logimgs = [_resize(pixel_logit(i[..., :3]), size) for i in images]
    cat = jnp.concatenate(
        logimgs
        + [
            jnp.linalg.norm(_resize(f, size), axis=-1, keepdims=True) / dia
            for f in flows
        ]
        + [_resize(m, size) for m in masks]
        + [_resize(f, size) for f in features],
        axis=-1,
    )
    x = conv2d(cat, p["net"]["0"])
    x = _synth_resnet(p["net"]["1"], x)
    x = _pconv_bn(p["net"]["2"], x)
    x = _synth_resnet(p["net"]["3"], x)
    x = _pconv_bn(p["net"]["4"], x)
    x = _synth_resnet(p["net"]["5"], x)
    x = prelu(x, p["net"]["6"]["0"])
    residual = conv2d(x, p["net"]["6"]["1"], padding=1)
    return jax.nn.sigmoid(logimgs[0] + 0.5 * residual)


def ssl_forward(
    p: Params, img0: Array, img1: Array, flow0: Array, flow1: Array,
    t=0.5, k: int = 5,
) -> Tuple[Array, dict]:
    """SoftsplatLite.forward (eisai_arch.py:2485-2538). Returns the prediction
    and the intermediates DTM consumes (hw_imgs, hw_masks).

    Divergence: the synthesis size follows the input frames (the reference
    hard-codes (540, 960); identical for native-size inputs)."""
    h, w = img0.shape[1], img0.shape[2]
    size = (h, w)
    z0, z1 = _flow_z_metric(img0, img1, flow0, flow1)
    img0 = jnp.concatenate([img0, nedt(img0)], axis=-1)
    img1 = jnp.concatenate([img1, nedt(img1)], axis=-1)

    hw_imgs, hw_flows, hw_masks = _half_warper(
        img0, img1, flow0, flow1, z0, z1, k, t
    )

    feats0 = _resnet_features(p["feature_extractor"], img0)
    feats1 = _resnet_features(p["feature_extractor"], img1)
    warps = []
    for fi, (ft0, ft1) in enumerate(zip(feats0, feats1)):
        fsz = (ft0.shape[1], ft0.shape[2])
        (w_, _, _) = _half_warper(
            ft0, ft1,
            _resize(flow0, fsz, is_flow=True), _resize(flow1, fsz, is_flow=True),
            _resize(z0, fsz), _resize(z1, fsz),
            k, t,
        )
        warps.append((w_[0] + w_[1]) / 2.0)

    conv_feats = [
        _pconv_bn(p["gridnet_converter"]["nets"][str(i)], wv, padding=0)
        for i, wv in enumerate(warps)
    ]
    feats = _gridnet(p["gridnet"], conv_feats)

    pred = _synthesizer(
        p["synthesizer"], size, hw_imgs, hw_flows, hw_masks, [feats[0]]
    )
    return pred, {"hw_imgs": hw_imgs, "hw_masks": hw_masks}


# =========================================================================
# DTM (eisai_arch.py:2386-2454, 2539-2559)
# =========================================================================


def _net_nedt(p: Params, out_base, out_base_nedt, hw_imgs, hw_masks) -> Array:
    """NetNedt (eisai_arch.py:2386-2418)."""
    cat = jnp.concatenate(
        [out_base, out_base_nedt, hw_imgs[0], hw_imgs[1], hw_masks[0], hw_masks[1]],
        axis=-1,
    )
    log = pixel_logit(jnp.clip(cat, 0.0, 1.0))
    x = prelu(log, p["net"]["0"])
    x = conv2d(x, p["net"]["1"], padding=1)
    x = batch_norm(x, p["net"]["2"])
    x = prelu(x, p["net"]["3"])
    x = conv2d(x, p["net"]["4"], padding=1)
    x = batch_norm(x, p["net"]["5"])
    x = prelu(x, p["net"]["6"])
    x = conv2d(x, p["net"]["7"], padding=1)
    return jax.nn.sigmoid(x)


def _net_tail(p: Params, out_base, out_base_nedt, pred_nedt) -> Array:
    """NetTail (eisai_arch.py:2421-2453)."""
    cat = jnp.concatenate([out_base, out_base_nedt, pred_nedt], axis=-1)
    log = pixel_logit(jnp.clip(cat, 0.0, 1.0))
    x = prelu(log, p["net"]["0"])
    x = conv2d(x, p["net"]["1"], padding=1)
    x = batch_norm(x, p["net"]["2"])
    x = prelu(x, p["net"]["3"])
    x = conv2d(x, p["net"]["4"], padding=1)
    x = batch_norm(x, p["net"]["5"])
    x = prelu(x, p["net"]["6"])
    x = conv2d(x, p["net"]["7"], padding=1)
    x = batch_norm(x, p["net"]["8"])
    x = prelu(x, p["net"]["9"])
    x = conv2d(x, p["net"]["10"], padding=1)
    return jax.nn.sigmoid(log[..., :3] + x)


def dtm_forward(p: Params, out_base: Array, locs: dict) -> Array:
    """DTM.forward (eisai_arch.py:2546-2559): returns cat([pred, pred_nedt])."""
    out_base_nedt = nedt(out_base)
    pred_nedt = _net_nedt(
        p["net_nedt"], out_base, out_base_nedt, locs["hw_imgs"], locs["hw_masks"]
    )
    pred = _net_tail(p["net_tail"], out_base, out_base_nedt, pred_nedt)
    return jnp.concatenate([pred, pred_nedt], axis=-1)


# =========================================================================
# full pipeline (vfi_models/eisai/__init__.py:30-40)
# =========================================================================


def apply(
    params: Params, img0: Array, img1: Array, t=0.5, iters: int = 12
) -> Array:
    """EISAI.forward: RAFT flows both directions, SoftsplatLite, DTM; returns
    the refined 3-channel prediction."""
    flow0 = raft_flow(params["raft"], img0, img1, iters=iters)
    flow1 = raft_flow(params["raft"], img1, img0, iters=iters)
    out_ssl, locs = ssl_forward(params["ssl"], img0, img1, flow0, flow1, t=t)
    out_dtm = dtm_forward(params["dtm"], out_ssl, locs)
    return out_dtm[..., :3]


def make_model_fn(params: Params, dtype=jnp.float32):
    """Batched (f0, f1, t) → mid callable for the plan executor."""
    params = cast_params(params, dtype)

    def model_fn(f0: Array, f1: Array, t) -> Array:
        t = jnp.asarray(t, jnp.float32)
        if t.ndim == 0:
            tt = t
        else:
            tt = t.reshape(-1, 1, 1, 1)
        out = apply(params, f0.astype(dtype), f1.astype(dtype), t=tt)
        return out.astype(f0.dtype)

    return model_fn


def make_pair_fns(params: Params, dtype=jnp.float32, iters: int = 12):
    """Per-pair reuse split for ``run_plan_pair_cached``: the two 12-iteration
    RAFT flow computations (the dominant cost) run once per pair; only
    SoftsplatLite + DTM re-run per timestep. The reference recomputes the
    flows for every timestep (``eisai/__init__.py`` drives ``forward`` per t)."""
    params = cast_params(params, dtype)

    @jax.jit
    def reuse_fn(f0, f1):
        img0 = f0.astype(dtype)
        img1 = f1.astype(dtype)
        return (
            raft_flow(params["raft"], img0, img1, iters=iters),
            raft_flow(params["raft"], img1, img0, iters=iters),
        )

    @jax.jit
    def infer_fn(f0, f1, cache, t):
        flow0, flow1 = cache
        tt = jnp.asarray(t, jnp.float32).reshape(-1, 1, 1, 1)
        out_ssl, locs = ssl_forward(
            params["ssl"], f0.astype(dtype), f1.astype(dtype), flow0, flow1,
            t=tt,
        )
        out = dtm_forward(params["dtm"], out_ssl, locs)[..., :3]
        return out.astype(jnp.float32)

    return reuse_fn, infer_fn
