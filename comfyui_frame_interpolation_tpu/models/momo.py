"""MoMo — diffusion-based motion modeling for VFI.

Reference: ``vfi_models/momo/{momo.py, unet.py, synthesis.py, flow.py}``.
A ``ConvexUpUNet2DModel`` (diffusers-style UNet2D: 8x8 patch stems for images
and the flow latent, a DownBlock2D, a nested UNet2DModel core, and a mask head
driving RAFT-style x8 convex upsampling — ``unet.py:130-386``) iteratively
denoises a 4-channel bidirectional-flow latent under a DDPM scheduler
(sample prediction, trailing spacing, linear betas, clip to ±1 —
``momo.py:53-60``; scheduler math reimplemented natively below). The frozen
``SynthesisNet`` renders the frame: a recurrent coarse-to-fine loop of
backward warps (half-pixel-shifted zeros-padding sampler, ``flow.py:64-94``),
a small UNet blender and a sigmoid blend + residual decode
(``synthesis.py:89-129``). All resizes are torch-parity bicubic
(antialias on downscale).

Randomness: the reference draws torch global noise; here the initial latent
and per-step DDPM noise come from an explicit PRNG key (deterministic given the
seed — run-to-run determinism the reference lacks).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.warp import bicubic_sample
from .common import cast_params, conv2d, linear, resize_bicubic

Array = jnp.ndarray
Params = Dict

CKPT_NAMES = ["momo-base.pth", "momo-lite.pth"]

_DIMS = {"momo-base.pth": (256, 256, 512), "momo-lite.pth": (96, 160)}
FLOW_SCALER = 128.0
T_TRAIN = 1000


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _group_norm(x: Array, node: Params, groups: int = 32, eps: float = 1e-5) -> Array:
    n, h, w, c = x.shape
    xg = x.reshape(n, h, w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(n, h, w, c)
    return x * node["weight"] + node["bias"]


def _conv_repl(p: Params, x: Array, stride=1, k=3) -> Array:
    """Conv2d(padding=1, padding_mode='replicate')."""
    r = k // 2
    if r:
        x = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
    return conv2d(x, p, stride=stride, padding=0)


# ------------------------------------------------------------------ BackWarp


def _backwarp(img: Array, flow: Array) -> Array:
    """flow.py BackWarp with SynthesisNet's interpolation='bicubic':
    normalization by /w (not w-1) + align_corners=False reduces to *bicubic*
    grid sampling at ``x + u - 0.5`` with zeros padding."""
    n, h, w, _ = img.shape
    xs = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    ys = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    sx = xs + flow[..., 0] - 0.5
    sy = ys + flow[..., 1] - 0.5
    return bicubic_sample(img, sx, sy, padding_mode="zeros")


# ------------------------------------------------------------------ scheduler


class DDPM:
    """diffusers DDPMScheduler (linear betas, sample prediction, trailing
    spacing, fixed_small variance, clip_sample range 1) — native reimplementation."""

    def __init__(self, num_train_timesteps=T_TRAIN, beta_start=1e-4, beta_end=0.02):
        self.T = num_train_timesteps
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
        alphas = 1.0 - betas
        self.alphas_cumprod = np.cumprod(alphas)
        self.init_noise_sigma = 1.0

    def timesteps(self, num_inference_steps: int) -> np.ndarray:
        step_ratio = self.T / num_inference_steps
        ts = np.round(np.arange(self.T, 0, -step_ratio)).astype(np.int64) - 1
        return ts

    def step(self, model_output, t: int, sample, num_inference_steps: int, noise):
        prev_t = t - self.T // num_inference_steps
        acp_t = self.alphas_cumprod[t]
        acp_prev = self.alphas_cumprod[prev_t] if prev_t >= 0 else 1.0
        beta_prod_t = 1.0 - acp_t
        beta_prod_prev = 1.0 - acp_prev
        current_alpha = acp_t / acp_prev
        current_beta = 1.0 - current_alpha

        pred_x0 = jnp.clip(model_output, -1.0, 1.0)  # clip_sample_range=1

        coeff_x0 = (acp_prev**0.5 * current_beta) / beta_prod_t
        coeff_xt = (current_alpha**0.5) * beta_prod_prev / beta_prod_t
        prev = coeff_x0 * pred_x0 + coeff_xt * sample
        if t > 0:
            var = max(beta_prod_prev / beta_prod_t * current_beta, 1e-20)
            prev = prev + (var**0.5) * noise
        return prev


# ------------------------------------------------------------------ UNet core


def _resnet_block(p: Params, x: Array, temb: Array, eps=1e-5) -> Array:
    """diffusers ResnetBlock2D (pre-norm, default scale/shift)."""
    h = _silu(_group_norm(x, p["norm1"], eps=eps))
    h = conv2d(h, p["conv1"], stride=1, padding=1)
    te = linear(_silu(temb), p["time_emb_proj"])
    h = h + te[:, None, None, :]
    h = _silu(_group_norm(h, p["norm2"], eps=eps))
    h = conv2d(h, p["conv2"], stride=1, padding=1)
    if "conv_shortcut" in p:
        x = conv2d(x, p["conv_shortcut"], stride=1, padding=0)
    return x + h


def _timestep_embedding(t: Array, dim: int) -> Array:
    """diffusers get_timestep_embedding with flip_sin_to_cos=True, shift=0."""
    half = dim // 2
    exponent = -math.log(10000.0) * np.arange(half, dtype=np.float64) / half
    freqs = jnp.asarray(np.exp(exponent), jnp.float32)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _time_embed(p: Params, t: Array, dim: int) -> Array:
    emb = _timestep_embedding(t, dim)
    emb = linear(emb, p["linear_1"])
    emb = _silu(emb)
    return linear(emb, p["linear_2"])


def _unet2d_core(p: Params, sample: Array, t: Array, dims: Tuple[int, ...]) -> Array:
    """diffusers UNet2DModel (DownBlock2D/UpBlock2D only, no attention)."""
    temb = _time_embed(p["time_embedding"], t, dims[0])
    x = conv2d(sample, p["conv_in"], stride=1, padding=1)
    skips = [x]
    n_blocks = len(dims)
    for i in range(n_blocks):
        block = p["down_blocks"][str(i)]
        for j in range(2):
            x = _resnet_block(block["resnets"][str(j)], x, temb)
            skips.append(x)
        if i != n_blocks - 1:
            x = conv2d(x, block["downsamplers"]["0"]["conv"], stride=2, padding=1)
            skips.append(x)
    mid = p["mid_block"]
    x = _resnet_block(mid["resnets"]["0"], x, temb, eps=1e-5)
    x = _resnet_block(mid["resnets"]["1"], x, temb, eps=1e-5)
    for i in range(n_blocks):
        block = p["up_blocks"][str(i)]
        for j in range(3):
            skip = skips.pop()
            x = _resnet_block(
                block["resnets"][str(j)], jnp.concatenate([x, skip], -1), temb
            )
        if i != n_blocks - 1:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest x2
            x = conv2d(x, block["upsamplers"]["0"]["conv"], stride=1, padding=1)
    x = _silu(_group_norm(x, p["conv_norm_out"], eps=1e-5))
    return conv2d(x, p["conv_out"], stride=1, padding=1)


def _neighborhood9(x: Array) -> Array:
    n, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [
        padded[:, 1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w, :]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ]
    return jnp.stack(taps, axis=3)


def _convex_upsampling8_impl(flow: Array, mask: Array) -> Array:
    """unet.py:239-249: RAFT-style x8 convex upsampling of the 4-ch flow."""
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 2, 9, 64)  # (f, 9, ky*kx); the singleton c dim folds
    m = jax.nn.softmax(m, axis=4)
    taps = _neighborhood9(flow).reshape(b, h, w, 9, 2, 2)
    # up[b,h,w,f,c,p] = sum_k m[b,h,w,f,k,p] * taps[b,h,w,k,f,c]
    up = jnp.einsum("bhwfkp,bhwkfc->bhwfcp", m, taps)
    up = up.reshape(b, h, w, 2, 2, 8, 8)
    # torch layout: out[b, f*2+c, h*8+ky, w*8+kx]
    up = up.transpose(0, 1, 5, 2, 6, 3, 4)  # b, h, ky, w, kx, f, c
    return up.reshape(b, h * 8, w * 8, 4) * 8.0


def _convex_up_unet(p: Params, latents, x0, x1, t: Array, dims) -> Array:
    """ConvexUpUNet2DModel.forward (unet.py:252-330)."""
    temb = _time_embed(p["time_embedding"], t, dims[0])

    both = jnp.concatenate([x0, x1], axis=0)
    d = _silu(conv2d(both, p["down_patch"]["0"], stride=8, padding=0))
    b = x0.shape[0]
    dx0, dx1 = d[:b], d[b:]
    dl = _silu(conv2d(latents, p["down_latent"]["0"], stride=8, padding=0))
    sample = conv2d(
        jnp.concatenate([dx0, dx1, dl], -1), p["proj_inputs"], stride=1, padding=0
    )
    skips = [sample]
    for j in range(2):
        sample = _resnet_block(p["first_block"]["resnets"][str(j)], sample, temb)
        skips.append(sample)

    mid = _unet2d_core(p["mid_model"], sample, t, dims[1:])

    # UpMaskBlock2D (unet.py:333-386)
    up = p["out_up"]
    h = mid
    for i in range(3):
        skip = skips.pop()
        h = jnp.concatenate([h, skip], -1)
        if i == 0 and "proj_in" in up:
            h = conv2d(h, up["proj_in"], stride=1, padding=1)
        h = _resnet_block(up["resnets"][str(i)], h, temb)
    mask = _group_norm(h, up["proj_out"]["0"], eps=1e-6)
    mask = _silu(mask)
    mask = conv2d(mask, up["proj_out"]["2"], stride=1, padding=1)
    return _convex_upsampling8_impl(mid, mask)


# ------------------------------------------------------------------ synthesis


def _synth_unet(p: Params, x: Array, n_lvls: int = 2) -> Array:
    """synthesis.py UNet (n_lvls=2, GELU, replicate padding, bicubic ups)."""
    h = _gelu(_conv_repl(p["in_feats"]["0"], x))
    h = _gelu(_conv_repl(p["in_feats"]["2"], h))
    mids = [h]
    for i in range(n_lvls):
        blk = p["down_blocks"][str(i)]["block"]
        h = _gelu(_conv_repl(blk["0"], mids[-1], stride=2))
        h = _gelu(_conv_repl(blk["2"], h))
        mids.append(h)
    h = mids.pop()
    for i in range(n_lvls):
        blk = p["up_blocks"][str(i)]
        skip = mids.pop()
        h = resize_bicubic(h, (skip.shape[1], skip.shape[2]))
        h = _gelu(_conv_repl(blk["conv1"], h))
        h = _gelu(_conv_repl(blk["conv2"], jnp.concatenate([h, skip], -1)))
    return _conv_repl(p["to_out"], h)


def _synthesize(p: Params, frames6: Array, flows4: Array) -> Array:
    """SynthesisNet.forward (synthesis.py:89-129) eval path.

    ``frames6``: [B, H, W, 6] (frame0 || frame1), ``flows4``: [B, H, W, 4]."""
    b, h, w, _ = frames6.shape
    flat = frames6.reshape(b, -1)
    mean = jnp.mean(flat, axis=1).reshape(b, 1, 1, 1)
    std = (jnp.std(flat, axis=1, ddof=1) + 1e-8).reshape(b, 1, 1, 1)
    xn = (frames6 - mean) / std
    # '(f b) c h w' stacking: frame-major batch
    x2 = jnp.concatenate([xn[..., :3], xn[..., 3:]], axis=0)  # [2B, H, W, 3]
    fl2 = jnp.concatenate([flows4[..., :2], flows4[..., 2:]], axis=0)

    n_lvls = int(np.ceil(np.log2(min(h, w) / 64))) + 1
    xt = None
    for i in range(n_lvls - 1, -1, -1):
        s = 1.0 / (2**i)
        oh, ow = int(h * s), int(w * s)
        x_lvl = resize_bicubic(x2, (oh, ow), antialias=True)
        f_lvl = resize_bicubic(fl2, (oh, ow), antialias=True) * s
        warped_rgb = _backwarp(x_lvl, f_lvl)
        w0, w1 = warped_rgb[:b], warped_rgb[b:]
        enc = _conv_repl(p["encoder"]["0"], x_lvl)
        enc = _conv_repl(p["encoder"]["2"], _gelu(enc))
        enc = _conv_repl(p["encoder"]["4"], _gelu(enc))
        if xt is None:
            xt = (w0 + w1) / 2
        else:
            xt = resize_bicubic(xt, (oh, ow), antialias=True)
        warped_feat = _backwarp(enc, f_lvl)
        wf = jnp.concatenate([warped_feat[:b], warped_feat[b:]], axis=-1)
        ffl = jnp.concatenate([f_lvl[:b], f_lvl[b:]], axis=-1)
        xt = _synth_unet(p["blender"], jnp.concatenate([xt, wf, ffl], -1))
        # decode2rgb (synthesis.py:78-88)
        dec = _gelu(xt)
        dec = _conv_repl(p["decoder"]["1"], dec)
        dec = _conv_repl(p["decoder"]["3"], _gelu(dec))
        res_rgb, blend = dec[..., :3], jax.nn.sigmoid(dec[..., 3:4])
        xt = blend * w0 + (1 - blend) * w1 + res_rgb
    return jnp.clip(xt * std + mean, 0.0, 1.0)


# ------------------------------------------------------------------ model


def apply(
    params: Params,
    img0: Array,
    img1: Array,
    timestep=None,
    num_inference_steps: int = 8,
    ckpt_name: str = "momo-base.pth",
    rng_key: Optional[jax.Array] = None,
    init_latents: Optional[Array] = None,
    step_noises: Optional[List[Array]] = None,
) -> Array:
    """MoMo.forward eval path (momo.py:153-224). ``timestep`` ignored (bisection
    schedule, midpoint-only). Inputs pre-padded to 64 by the node.

    ``init_latents``/``step_noises`` override the PRNG draws (initial latent
    and per-step DDPM variance noise) — used by the torch-parity oracle to
    run both implementations on an identical noise sequence."""
    del timestep
    dims = _DIMS[ckpt_name]
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)
    b, h, w, _ = img0.shape

    frames6 = jnp.concatenate([img0, img1], axis=-1)
    flat = frames6.reshape(b, -1)
    mean = jnp.mean(flat, axis=1).reshape(b, 1, 1, 1)
    std = (jnp.std(flat, axis=1, ddof=1) + 1e-8).reshape(b, 1, 1, 1)
    xn = (frames6 - mean) / std
    x0n, x1n = xn[..., :3], xn[..., 3:]

    # min_ds rounding (momo.py:110-140): 64-padded inputs are already multiples
    # of 2**(2 + len(dims)), so the resize is a no-op here.
    scheduler = DDPM()
    ts = scheduler.timesteps(num_inference_steps)

    key, sub = jax.random.split(rng_key)
    if init_latents is None:
        latents = jax.random.normal(sub, (b, h, w, 4))
    else:
        latents = init_latents

    mdl = params["model"]
    for i, t in enumerate(ts):
        t_vec = jnp.full((b,), int(t), jnp.float32)
        pred = _convex_up_unet(mdl, latents, x0n, x1n, t_vec, dims)
        key, sub = jax.random.split(key)
        if step_noises is None:
            noise = jax.random.normal(sub, latents.shape)
        else:
            noise = step_noises[i]
        latents = scheduler.step(pred, int(t), latents, num_inference_steps, noise)

    flows = latents * FLOW_SCALER
    return _synthesize(params["synth_model"], frames6, flows)


def _rand_conv(key, o, i, k=3, bias=True):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(i * k * k)
    p = {"weight": jax.random.uniform(k1, (o, i, k, k), jnp.float32, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (o,), jnp.float32, -bound, bound)
    return p


def _rand_linear(key, o, i):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(i)
    return {
        "weight": jax.random.uniform(k1, (o, i), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(k2, (o,), jnp.float32, -bound, bound),
    }


def _gn(c):
    return {"weight": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def init_params(key, ckpt_name: str = "momo-base.pth") -> Params:
    """Random parameter tree with the reference checkpoints' state-dict shapes
    (``unet.py:87-214``: ConvexUpUNet2DModel(in=3, out=4, block_out_channels=
    ``_DIMS[ckpt_name]``); ``synthesis.py:9-51``: SynthesisNet(latent_dim=32)).
    Used by throughput benchmarks (the torch MoMo arch needs ``diffusers``,
    absent in this image, so random weights can't be built through it) — the
    node path still converts real checkpoints via ``utils.ckpt``."""
    dims = _DIMS[ckpt_name]
    keys = iter(jax.random.split(key, 512))

    def resnet(cin, cout, temb_dim):
        p = {
            "norm1": _gn(cin),
            "conv1": _rand_conv(next(keys), cout, cin),
            "time_emb_proj": _rand_linear(next(keys), cout, temb_dim),
            "norm2": _gn(cout),
            "conv2": _rand_conv(next(keys), cout, cout),
        }
        if cin != cout:
            p["conv_shortcut"] = _rand_conv(next(keys), cout, cin, k=1)
        return p

    def unet2d_core(cin, cout, boc):
        """diffusers UNet2DModel (DownBlock2D/UpBlock2D, layers_per_block=2)."""
        temb = 4 * boc[0]
        n = len(boc)
        p = {
            "time_embedding": {
                "linear_1": _rand_linear(next(keys), temb, boc[0]),
                "linear_2": _rand_linear(next(keys), temb, temb),
            },
            "conv_in": _rand_conv(next(keys), boc[0], cin),
            "down_blocks": {},
            "mid_block": {
                "resnets": {
                    "0": resnet(boc[-1], boc[-1], temb),
                    "1": resnet(boc[-1], boc[-1], temb),
                }
            },
            "up_blocks": {},
            "conv_norm_out": _gn(boc[0]),
            "conv_out": _rand_conv(next(keys), cout, boc[0]),
        }
        for i in range(n):
            c_in_i = boc[i - 1] if i > 0 else boc[0]
            blk = {
                "resnets": {
                    "0": resnet(c_in_i, boc[i], temb),
                    "1": resnet(boc[i], boc[i], temb),
                }
            }
            if i != n - 1:
                blk["downsamplers"] = {
                    "0": {"conv": _rand_conv(next(keys), boc[i], boc[i])}
                }
            p["down_blocks"][str(i)] = blk
        rboc = boc[::-1]
        for i in range(n):
            out_c = rboc[i]
            prev_c = boc[-1] if i == 0 else rboc[i - 1]
            in_c = rboc[min(i + 1, n - 1)]
            blk = {"resnets": {}}
            for j in range(3):
                skip_c = in_c if j == 2 else out_c
                r_in = prev_c if j == 0 else out_c
                blk["resnets"][str(j)] = resnet(r_in + skip_c, out_c, temb)
            if i != n - 1:
                blk["upsamplers"] = {
                    "0": {"conv": _rand_conv(next(keys), out_c, out_c)}
                }
            p["up_blocks"][str(i)] = blk
        return p

    d0 = dims[0]
    temb0 = 4 * d0
    mask_w = 2 * 9 * 64
    hidden = -(-(4 + d0) // 32) * 32  # UpMaskBlock2D hidden_dim (unet.py:325)
    out_up = {
        "resnets": {
            "0": resnet(hidden, d0, temb0),
            "1": resnet(2 * d0, d0, temb0),
            "2": resnet(2 * d0, d0, temb0),
        },
        "proj_out": {
            "0": _gn(d0),
            "2": _rand_conv(next(keys), mask_w, d0),
        },
    }
    if hidden != 4 + d0:
        out_up["proj_in"] = _rand_conv(next(keys), hidden, 4 + d0)
    model = {
        "time_embedding": {
            "linear_1": _rand_linear(next(keys), temb0, d0),
            "linear_2": _rand_linear(next(keys), temb0, temb0),
        },
        "down_patch": {"0": _rand_conv(next(keys), d0 // 2, 3, k=8)},
        "down_latent": {"0": _rand_conv(next(keys), d0, 4, k=8)},
        "proj_inputs": _rand_conv(next(keys), d0, 2 * d0, k=1),
        "first_block": {
            "resnets": {
                "0": resnet(d0, d0, temb0),
                "1": resnet(d0, d0, temb0),
            }
        },
        "mid_model": unet2d_core(d0, 4, tuple(dims[1:])),
        "out_up": out_up,
    }

    ld = 32  # SynthesisNet latent_dim; dim = 2*ld
    synth = {
        "encoder": {
            "0": _rand_conv(next(keys), ld, 3),
            "2": _rand_conv(next(keys), ld, ld),
            "4": _rand_conv(next(keys), ld, ld),
        },
        "decoder": {
            "1": _rand_conv(next(keys), 2 * ld, 2 * ld),
            "3": _rand_conv(next(keys), 4, 2 * ld),
        },
        "blender": {
            "in_feats": {
                "0": _rand_conv(next(keys), 2 * ld, 4 + 3 + 2 * ld),
                "2": _rand_conv(next(keys), 2 * ld, 2 * ld),
            },
            "down_blocks": {
                "0": {"block": {
                    "0": _rand_conv(next(keys), 4 * ld, 2 * ld),
                    "2": _rand_conv(next(keys), 4 * ld, 4 * ld),
                }},
                "1": {"block": {
                    "0": _rand_conv(next(keys), 8 * ld, 4 * ld),
                    "2": _rand_conv(next(keys), 8 * ld, 8 * ld),
                }},
            },
            "up_blocks": {
                "0": {
                    "conv1": _rand_conv(next(keys), 4 * ld, 8 * ld),
                    "conv2": _rand_conv(next(keys), 4 * ld, 8 * ld),
                },
                "1": {
                    "conv1": _rand_conv(next(keys), 2 * ld, 4 * ld),
                    "conv2": _rand_conv(next(keys), 2 * ld, 4 * ld),
                },
            },
            "to_out": _rand_conv(next(keys), 2 * ld, 2 * ld),
        },
    }
    return {"model": model, "synth_model": synth}


def make_model_fn(
    params: Params, ckpt_name: str, num_inference_steps: int = 8,
    seed: int = 0, dtype=jnp.float32,
):
    params = cast_params(params, dtype)
    @jax.jit
    def model_fn(f0, f1, t):
        n, h, w, _ = f0.shape
        ph = (-h) % 64
        pw = (-w) % 64
        top, left = ph // 2, pw // 2
        pad = ((0, 0), (top, ph - top), (left, pw - left), (0, 0))
        x0 = jnp.pad(f0.astype(dtype), pad, mode="edge")
        x1 = jnp.pad(f1.astype(dtype), pad, mode="edge")
        out = apply(
            params, x0, x1, t,
            num_inference_steps=num_inference_steps,
            ckpt_name=ckpt_name,
            rng_key=jax.random.PRNGKey(seed),
        )
        out = out[:, top : top + h, left : left + w, :]
        return jnp.clip(out, 0.0, 1.0).astype(jnp.float32)

    return model_fn
