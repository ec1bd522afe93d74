"""Warp/grid-sample parity vs torch (the load-bearing numeric contract —
every flow model's PSNR hinges on it)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from comfyui_frame_interpolation_tpu.ops.warp import warp, grid_sample

RNG = np.random.default_rng(0)


def rife_warp_torch(img_nchw, flow_nchw):
    """Transliteration of rife_arch.py:31-70 semantics for the oracle."""
    n, c, h, w = img_nchw.shape
    hor = torch.linspace(-1.0, 1.0, w).view(1, 1, 1, w).expand(n, -1, h, -1)
    ver = torch.linspace(-1.0, 1.0, h).view(1, 1, h, 1).expand(n, -1, -1, w)
    grid = torch.cat([hor, ver], 1)
    flow = torch.cat(
        [
            flow_nchw[:, 0:1] / ((w - 1.0) / 2.0),
            flow_nchw[:, 1:2] / ((h - 1.0) / 2.0),
        ],
        1,
    )
    g = (grid + flow).permute(0, 2, 3, 1)
    return torch.nn.functional.grid_sample(
        img_nchw, g, mode="bilinear", padding_mode="border", align_corners=True
    )


@pytest.mark.parametrize("hw", [(8, 8), (13, 17)])
@pytest.mark.parametrize("scale", [0.5, 3.0, 20.0])
def test_warp_matches_torch_border(hw, scale):
    h, w = hw
    img = RNG.standard_normal((2, h, w, 3)).astype(np.float32)
    flow = (RNG.standard_normal((2, h, w, 2)) * scale).astype(np.float32)

    out = np.asarray(warp(jnp.asarray(img), jnp.asarray(flow)))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tflow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    ref = rife_warp_torch(timg, tflow).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(align_corners, padding_mode):
    h, w = 11, 9
    oh, ow = 7, 13
    img = RNG.standard_normal((2, h, w, 4)).astype(np.float32)
    grid = (RNG.uniform(-1.4, 1.4, (2, oh, ow, 2))).astype(np.float32)

    out = np.asarray(
        grid_sample(
            jnp.asarray(img),
            jnp.asarray(grid),
            padding_mode=padding_mode,
            align_corners=align_corners,
        )
    )
    ref = (
        torch.nn.functional.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode=padding_mode,
            align_corners=align_corners,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_warp_zero_flow_identity():
    img = RNG.standard_normal((1, 6, 6, 3)).astype(np.float32)
    out = np.asarray(warp(jnp.asarray(img), jnp.zeros((1, 6, 6, 2), np.float32)))
    np.testing.assert_allclose(out, img, rtol=1e-6, atol=1e-6)
