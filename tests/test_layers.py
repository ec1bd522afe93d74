"""models/common.py layer primitives vs torch numerics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax.numpy as jnp

from comfyui_frame_interpolation_tpu.models import common as L

RNG = np.random.default_rng(7)


def t2j_nchw(x):  # torch NCHW tensor → jnp NHWC
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def j2n(x):  # jnp NHWC → numpy NCHW
    return np.asarray(x).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 1, 1, 1), (2, 1, 1, 1), (1, 0, 1, 1), (1, 2, 2, 1), (1, 1, 1, 2),
])
def test_conv2d(stride, padding, dilation, groups):
    x = torch.randn(2, 6, 13, 11)
    w = torch.randn(8, 6 // groups, 3, 3)
    b = torch.randn(8)
    ref = F.conv2d(x, w, b, stride=stride, padding=padding, dilation=dilation, groups=groups)
    node = {"weight": jnp.asarray(w.numpy()), "bias": jnp.asarray(b.numpy())}
    out = L.conv2d(t2j_nchw(x), node, stride=stride, padding=padding, dilation=dilation, groups=groups)
    np.testing.assert_allclose(j2n(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("k,s,p", [(4, 2, 1), (3, 2, 1), (4, 2, 0), (2, 2, 0)])
def test_conv_transpose2d(k, s, p):
    x = torch.randn(2, 5, 9, 7)
    w = torch.randn(5, 8, k, k)
    b = torch.randn(8)
    ref = F.conv_transpose2d(x, w, b, stride=s, padding=p)
    node = {"weight": jnp.asarray(w.numpy()), "bias": jnp.asarray(b.numpy())}
    out = L.conv_transpose2d(t2j_nchw(x), node, stride=s, padding=p)
    np.testing.assert_allclose(j2n(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(16, 24), (5, 7), (20, 6), (11, 11)])
@pytest.mark.parametrize("align_corners", [False, True])
def test_resize_bilinear(out_hw, align_corners):
    x = torch.randn(2, 3, 10, 12)
    ref = F.interpolate(x, size=out_hw, mode="bilinear", align_corners=align_corners)
    out = L.resize_bilinear(t2j_nchw(x), out_hw, align_corners=align_corners)
    np.testing.assert_allclose(j2n(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("scale", [0.125, 0.25, 0.5, 2.0, 3.0, 4.0, 8.0])
def test_resize_by_scale(scale):
    x = torch.randn(1, 4, 16, 32)
    ref = F.interpolate(x, scale_factor=scale, mode="bilinear", align_corners=False)
    out = L.resize_by_scale(t2j_nchw(x), scale, align_corners=False)
    np.testing.assert_allclose(j2n(out), ref.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out_hw", [
    (8, 8),    # mixed even-down H (x2), even-down W (x4)
    (48, 16),  # up x3 H, even-down x2 W
    (32, 96),  # up x2 H, up x3 W
    (4, 96),   # down x4 H, up x3 W
    (16, 10),  # identity H, non-integer W (gather fallback)
    (80, 32),  # up x5 H, identity W
])
def test_resize_bilinear_fast_paths(out_hw):
    """Integer-factor fast paths (slices/reduce_window) vs torch."""
    x = torch.randn(2, 5, 16, 32)
    ref = F.interpolate(x, size=out_hw, mode="bilinear", align_corners=False)
    out = L.resize_bilinear(t2j_nchw(x), out_hw, align_corners=False)
    np.testing.assert_allclose(j2n(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_resize_nearest():
    x = torch.randn(1, 3, 9, 7)
    ref = F.interpolate(x, size=(18, 21), mode="nearest")
    out = L.resize_nearest(t2j_nchw(x), (18, 21))
    np.testing.assert_allclose(j2n(out), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_pixel_shuffle():
    x = torch.randn(2, 12, 5, 6)
    ref = F.pixel_shuffle(x, 2)
    out = L.pixel_shuffle(t2j_nchw(x), 2)
    np.testing.assert_allclose(j2n(out), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_prelu():
    x = torch.randn(2, 6, 4, 4)
    w = torch.rand(6)
    ref = F.prelu(x, w)
    out = L.prelu(t2j_nchw(x), {"weight": jnp.asarray(w.numpy())})
    np.testing.assert_allclose(j2n(out), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_pools():
    x = torch.randn(2, 3, 8, 10)
    np.testing.assert_allclose(
        j2n(L.avg_pool2d(t2j_nchw(x), 2)),
        F.avg_pool2d(x, 2).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        j2n(L.max_pool2d(t2j_nchw(x), 2)),
        F.max_pool2d(x, 2).numpy(),
        rtol=1e-5,
        atol=1e-6,
    )


@pytest.mark.parametrize("out_hw,antialias", [
    ((32, 48), False), ((32, 48), True), ((8, 6), True), ((8, 6), False),
    ((15, 21), True),
])
def test_resize_bicubic(out_hw, antialias):
    x = torch.randn(2, 3, 16, 24)
    ref = F.interpolate(
        x, size=out_hw, mode="bicubic", align_corners=False, antialias=antialias
    )
    out = L.resize_bicubic(t2j_nchw(x), out_hw, antialias=antialias)
    np.testing.assert_allclose(j2n(out), ref.numpy(), rtol=1e-3, atol=1e-4)


def test_conv2x2_up2x_matches_unfused():
    """Fused nearest-2x + 2x2 'same' conv (FILM fusion decoder fast path) vs
    the literal resize_nearest + conv2d composition it replaces — and vs torch
    F.interpolate + Conv2d(padding='same')."""
    x = torch.randn(2, 6, 9, 13)
    w = torch.randn(5, 6, 2, 2)
    b = torch.randn(5)
    node = {"weight": jnp.asarray(w.numpy()), "bias": jnp.asarray(b.numpy())}
    xj = t2j_nchw(x)

    fused = L.conv2x2_up2x(xj, node)

    up = L.resize_nearest(xj, (18, 26))
    unfused = L.conv2d(up, node, stride=1, padding="same_torch")
    np.testing.assert_allclose(j2n(fused), j2n(unfused), rtol=1e-5, atol=1e-5)

    conv = torch.nn.Conv2d(6, 5, 2, padding="same")
    with torch.no_grad():
        conv.weight.copy_(w)
        conv.bias.copy_(b)
        ref = conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))
    np.testing.assert_allclose(j2n(fused), ref.numpy(), rtol=1e-4, atol=1e-5)
