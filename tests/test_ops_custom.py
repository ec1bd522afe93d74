"""Custom-op correctness vs independent numpy loop oracles transliterating the
reference CUDA kernel semantics (cupy_ops/{softsplat,costvol,correlation,sepconv,
adacof,batch_edt}.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from comfyui_frame_interpolation_tpu.ops.softsplat import (
    softsplat,
    softsplat_func,
    function_softsplat,
)
from comfyui_frame_interpolation_tpu.ops.costvol import costvol_func
from comfyui_frame_interpolation_tpu.ops.correlation import correlation_func
from comfyui_frame_interpolation_tpu.ops.sepconv import sepconv_func
from comfyui_frame_interpolation_tpu.ops.adacof import adacof_func
from comfyui_frame_interpolation_tpu.ops.edt import batch_edt

RNG = np.random.default_rng(42)


# ------------------------------------------------------------- softsplat


def softsplat_oracle(ten_in, flow):
    """cupy_ops/softsplat.py kernel softsplat_out, NHWC."""
    n, h, w, c = ten_in.shape
    out = np.zeros_like(ten_in)
    for b in range(n):
        for y in range(h):
            for x in range(w):
                fx = x + flow[b, y, x, 0]
                fy = y + flow[b, y, x, 1]
                if not (np.isfinite(fx) and np.isfinite(fy)):
                    continue
                x0, y0 = int(np.floor(fx)), int(np.floor(fy))
                for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    xi, yi = x0 + dx, y0 + dy
                    if 0 <= xi < w and 0 <= yi < h:
                        wgt = (1 - abs(fx - xi)) * (1 - abs(fy - yi))
                        out[b, yi, xi] += ten_in[b, y, x] * wgt
    return out


def test_softsplat_func_matches_oracle():
    x = RNG.standard_normal((2, 7, 9, 3)).astype(np.float32)
    flow = (RNG.standard_normal((2, 7, 9, 2)) * 3).astype(np.float32)
    out = np.asarray(softsplat_func(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(out, softsplat_oracle(x, flow), rtol=1e-4, atol=1e-4)


def test_softsplat_nonfinite_flow_skipped():
    x = np.ones((1, 4, 4, 1), np.float32)
    flow = np.zeros((1, 4, 4, 2), np.float32)
    flow[0, 1, 1, 0] = np.nan
    flow[0, 2, 2, 1] = np.inf
    out = np.asarray(softsplat_func(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(out, softsplat_oracle(x, flow), atol=1e-6)


def test_softsplat_modes():
    x = RNG.standard_normal((1, 6, 6, 3)).astype(np.float32)
    flow = (RNG.standard_normal((1, 6, 6, 2)) * 2).astype(np.float32)
    metric = RNG.standard_normal((1, 6, 6, 1)).astype(np.float32)

    # sum mode == raw splat
    np.testing.assert_allclose(
        np.asarray(softsplat(jnp.asarray(x), jnp.asarray(flow), None, "sum")),
        softsplat_oracle(x, flow),
        rtol=1e-4,
        atol=1e-4,
    )
    # avg: splat(x||1) then divide by (norm + 1e-7)
    aug = np.concatenate([x, np.ones_like(x[..., :1])], axis=-1)
    raw = softsplat_oracle(aug, flow)
    expect = raw[..., :-1] / (raw[..., -1:] + 1e-7)
    np.testing.assert_allclose(
        np.asarray(softsplat(jnp.asarray(x), jnp.asarray(flow), None, "avg")),
        expect,
        rtol=1e-4,
        atol=1e-4,
    )
    # soft-zeroeps (legacy softmax): splat(x*e^m || e^m), zeros → 1
    m = np.exp(metric)
    aug = np.concatenate([x * m, m], axis=-1)
    raw = softsplat_oracle(aug, flow)
    norm = raw[..., -1:].copy()
    norm[norm == 0.0] = 1.0
    expect = raw[..., :-1] / norm
    got = np.asarray(
        function_softsplat(jnp.asarray(x), jnp.asarray(flow), jnp.asarray(metric), "softmax")
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- costvol


def costvol_oracle(one, two):
    n, h, w, c = one.shape
    out = np.zeros((n, h, w, 81), np.float32)
    for b in range(n):
        for y in range(h):
            for x in range(w):
                ch = 0
                for oy in range(y - 4, y + 5):
                    for ox in range(x - 4, x + 5):
                        if 0 <= oy < h and 0 <= ox < w:
                            v = np.abs(one[b, y, x] - two[b, oy, ox]).sum()
                        else:
                            v = np.abs(one[b, y, x]).sum()
                        out[b, y, x, ch] = v / c
                        ch += 1
    return out


def test_costvol_matches_oracle():
    one = RNG.standard_normal((1, 6, 7, 4)).astype(np.float32)
    two = RNG.standard_normal((1, 6, 7, 4)).astype(np.float32)
    out = np.asarray(costvol_func(jnp.asarray(one), jnp.asarray(two)))
    np.testing.assert_allclose(out, costvol_oracle(one, two), rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------- correlation


def correlation_oracle(one, two):
    n, h, w, c = one.shape
    out = np.zeros((n, h, w, 81), np.float32)
    for b in range(n):
        for y in range(h):
            for x in range(w):
                for ch in range(81):
                    dx = ch % 9 - 4
                    dy = ch // 9 - 4
                    oy, ox = y + dy, x + dx
                    if 0 <= oy < h and 0 <= ox < w:
                        out[b, y, x, ch] = (one[b, y, x] * two[b, oy, ox]).sum() / c
    return out


def test_correlation_matches_oracle():
    one = RNG.standard_normal((2, 6, 5, 8)).astype(np.float32)
    two = RNG.standard_normal((2, 6, 5, 8)).astype(np.float32)
    out = np.asarray(correlation_func(jnp.asarray(one), jnp.asarray(two)))
    np.testing.assert_allclose(out, correlation_oracle(one, two), rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------- sepconv


def sepconv_oracle(x, ver, hor):
    n, hp, wp, c = x.shape
    _, h, w, k = ver.shape
    out = np.zeros((n, h, w, c), np.float32)
    for b in range(n):
        for y in range(h):
            for xx in range(w):
                acc = np.zeros(c, np.float32)
                for fy in range(k):
                    for fx in range(k):
                        acc += (
                            x[b, y + fy, xx + fx]
                            * ver[b, y, xx, fy]
                            * hor[b, y, xx, fx]
                        )
                out[b, y, xx] = acc
    return out


def test_sepconv_matches_oracle():
    k, h, w = 5, 6, 7
    x = RNG.standard_normal((1, h + k - 1, w + k - 1, 3)).astype(np.float32)
    ver = RNG.standard_normal((1, h, w, k)).astype(np.float32)
    hor = RNG.standard_normal((1, h, w, k)).astype(np.float32)
    out = np.asarray(sepconv_func(jnp.asarray(x), jnp.asarray(ver), jnp.asarray(hor)))
    np.testing.assert_allclose(out, sepconv_oracle(x, ver, hor), rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- adacof


def adacof_oracle(x, weight, alpha, beta, dilation):
    n, hp, wp, c = x.shape
    _, h, w, ff = weight.shape
    f = int(round(ff**0.5))
    out = np.zeros((n, h, w, c), np.float32)
    for b in range(n):
        for i in range(h):
            for j in range(w):
                acc = np.zeros(c, np.float32)
                for k in range(f):
                    for l in range(f):
                        t = k * f + l
                        wgt = weight[b, i, j, t]
                        a = alpha[b, i, j, t]
                        bb = beta[b, i, j, t]
                        A = int(a)  # C truncation
                        B = int(bb)
                        i0 = min(max(i + k * dilation + A, 0), hp - 1)
                        j0 = min(max(j + l * dilation + B, 0), wp - 1)
                        i1 = min(max(i + k * dilation + A + 1, 0), hp - 1)
                        j1 = min(max(j + l * dilation + B + 1, 0), wp - 1)
                        fa, fb = a - A, bb - B
                        acc += wgt * (
                            x[b, i0, j0] * (1 - fa) * (1 - fb)
                            + x[b, i1, j0] * fa * (1 - fb)
                            + x[b, i0, j1] * (1 - fa) * fb
                            + x[b, i1, j1] * fa * fb
                        )
                out[b, i, j] = acc
    return out


def test_adacof_matches_oracle():
    f, d, h, w = 3, 1, 5, 6
    hp, wp = h + (f - 1) * d + 1 - 1, w + (f - 1) * d + 1 - 1
    x = RNG.standard_normal((1, hp, wp, 2)).astype(np.float32)
    weight = RNG.standard_normal((1, h, w, f * f)).astype(np.float32)
    alpha = (RNG.standard_normal((1, h, w, f * f)) * 2).astype(np.float32)
    beta = (RNG.standard_normal((1, h, w, f * f)) * 2).astype(np.float32)
    out = np.asarray(
        adacof_func(
            jnp.asarray(x),
            jnp.asarray(weight),
            jnp.asarray(alpha),
            jnp.asarray(beta),
            d,
        )
    )
    np.testing.assert_allclose(
        out, adacof_oracle(x, weight, alpha, beta, d), rtol=1e-4, atol=1e-4
    )


def test_adacof_dilation2():
    f, d, h, w = 3, 2, 4, 4
    hp = h - 1 + (f - 1) * d + 1
    wp = w - 1 + (f - 1) * d + 1
    x = RNG.standard_normal((1, hp, wp, 1)).astype(np.float32)
    weight = RNG.standard_normal((1, h, w, f * f)).astype(np.float32)
    alpha = np.zeros((1, h, w, f * f), np.float32)
    beta = np.zeros((1, h, w, f * f), np.float32)
    out = np.asarray(
        adacof_func(jnp.asarray(x), jnp.asarray(weight), jnp.asarray(alpha), jnp.asarray(beta), d)
    )
    np.testing.assert_allclose(
        out, adacof_oracle(x, weight, alpha, beta, d), rtol=1e-4, atol=1e-4
    )


# ------------------------------------------------------------- batch_edt


def test_batch_edt_matches_scipy():
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    img = (RNG.uniform(size=(3, 12, 10)) < 0.15).astype(np.float32)
    img[1] = 0  # empty image → diameter
    out = np.asarray(batch_edt(jnp.asarray(img)))
    h, w = img.shape[1:]
    for b in range(3):
        if img[b].sum() == 0:
            np.testing.assert_allclose(out[b], np.sqrt(h * h + w * w), rtol=1e-5)
        else:
            ref = scipy_ndimage.distance_transform_edt(1 - img[b])
            np.testing.assert_allclose(out[b], ref, rtol=1e-4, atol=1e-4)


def test_batch_edt_4d_shapes():
    img = (RNG.uniform(size=(2, 1, 8, 9)) < 0.2).astype(np.float32)
    out = np.asarray(batch_edt(jnp.asarray(img)))
    assert out.shape == (2, 1, 8, 9)
