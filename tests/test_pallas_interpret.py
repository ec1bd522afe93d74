"""Interpret-mode (CPU) logic tests for the Pallas kernels.

The TPU-gated suite (``test_pallas_kernels.py``) asserts bit-exactness on real
hardware; nothing covered kernel LOGIC (indexing, window fits, masks, band
membership) when no TPU is attached — the class of gap that let round 2's
multichip regression ship. These run the kernels under
``pallas_call(interpret=True)`` on tiny shapes.

Tolerance note: on TPU the kernels are bit-exact vs ``warp_xla``; on CPU,
XLA:CPU's FMA contraction rounds ``warp_xla``'s lerp differently than the
interpret path at a handful of pixels (measured: 1 px in 57k, one bf16 ulp),
so these assert to one-bf16-ulp tolerance rather than atol=0.
"""

import functools
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from comfyui_frame_interpolation_tpu.ops.pallas import softsplat_kernel as sk
from comfyui_frame_interpolation_tpu.ops.pallas import warp_kernel as wk
from comfyui_frame_interpolation_tpu.ops.softsplat import _softsplat_xla
from comfyui_frame_interpolation_tpu.ops.warp import warp_xla

# one bf16 ulp at magnitude ~1 (values live in [0, 1])
BF16_ULP = 2.0 ** -8


_ORIG = pl.pallas_call


def _interpret_patch(module):
    def patched(*a, **k):
        k.setdefault("interpret", True)
        return _ORIG(*a, **k)

    return mock.patch.object(module.pl, "pallas_call", patched)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _warp_case(rng, flow, mxu_env, zeros, c=3):
    img = jnp.asarray(rng.random((1, 32, 128, c), np.float32), jnp.bfloat16)
    ref = np.asarray(
        warp_xla(img, flow, "zeros" if zeros else "border").astype(jnp.float32)
    )
    with mock.patch.dict("os.environ", {"CFI_WARP_MXU": mxu_env}):
        with _interpret_patch(wk):
            out = np.asarray(
                wk.warp_pallas_tiered(img, flow, zeros=zeros).astype(
                    jnp.float32
                )
            )
    np.testing.assert_allclose(out, ref, atol=BF16_ULP, rtol=0)


def test_warp_interpret_smoke(rng):
    # default-tier: both bulk kernels on a smooth flow, border mode
    flow = jnp.asarray(rng.random((1, 32, 128, 2), np.float32) * 4 - 2)
    _warp_case(rng, flow, "0", zeros=False)
    _warp_case(rng, flow, "force", zeros=False)


@pytest.mark.slow
@pytest.mark.parametrize("mxu_env", ["0", "force"])
@pytest.mark.parametrize("zeros", [False, True])
def test_warp_interpret_extreme_patch_pass(rng, mxu_env, zeros):
    # extreme flows force the in-place patch pass over most tiles
    flow = jnp.asarray(rng.random((1, 32, 128, 2), np.float32) * 400 - 200)
    _warp_case(rng, flow, mxu_env, zeros)


@pytest.mark.slow
@pytest.mark.parametrize("mxu_env", ["0", "auto"])
def test_warp_interpret_wide_channels(rng, mxu_env):
    # c above the fold cap for the mxu path would be slow in interpret mode;
    # c=17 still exercises the mxu auto policy + sublane padding
    flow = jnp.asarray(rng.random((1, 32, 128, 2), np.float32) * 6 - 3)
    _warp_case(rng, flow, mxu_env, zeros=False, c=17)


@pytest.mark.slow
def test_softsplat_interpret_base_band(rng):
    vals = jnp.asarray(rng.random((1, 32, 128, 2), np.float32))
    flow = jnp.asarray(rng.random((1, 32, 128, 2), np.float32) * 4 - 2)
    ref = np.asarray(_softsplat_xla(vals, flow))
    with _interpret_patch(sk):
        out = np.asarray(sk.softsplat_pallas(vals, flow))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def _banded_ref(vals, flow, bands):
    """Exact scatter restricted to the union of the given bands (what the
    stacked banded kernel must produce; the remainder is the caller's job)."""
    fx = flow[..., 0]
    fy = flow[..., 1]
    memb = jnp.zeros(fx.shape, bool)
    for lo_y, hi_y, lo_x, hi_x in bands:
        memb = memb | (
            (fy >= lo_y) & (fy < hi_y) & (fx >= lo_x) & (fx < hi_x)
        )
    masked = jnp.where(memb[..., None], flow, jnp.inf)
    return np.asarray(_softsplat_xla(vals, masked))


@pytest.mark.slow
def test_softsplat_interpret_stacked_bands(rng, monkeypatch):
    """Stacked multi-band kernel logic: accumulation across live bands, the
    in-kernel skip of absent bands, and the live-step DMA chain — with the
    band table shrunk so interpret mode stays tractable."""
    base = (-8.0, 8.0, -64.0, 64.0)
    extra = (
        (8.0, 24.0, -64.0, 64.0),     # fast down
        (-24.0, -8.0, -64.0, 64.0),   # fast up (left ABSENT in the data)
        (-8.0, 8.0, 64.0, 192.0),     # fast right
        (-8.0, 8.0, -192.0, -64.0),   # fast left (ABSENT)
    )
    monkeypatch.setattr(sk, "BAND_BASE", base)
    monkeypatch.setattr(sk, "BANDS_EXTRA", extra)

    h, w = 32, 256  # windows: (16+8, 128+128) = (24, 256) — fits
    vals = jnp.asarray(rng.random((1, h, w, 2), np.float32))
    f = np.zeros((1, h, w, 2), np.float32)
    f[:, :8] = [3.0, -2.5]        # base band
    f[:, 8:16] = [10.0, 12.0]     # fast down band
    f[:, 16:24] = [100.0, 3.0]    # fast right band
    f[:, 24:, :] = [500.0, 500.0]  # beyond every band -> dropped by kernel
    flow = jnp.asarray(f)

    ref = _banded_ref(vals, flow, [base] + list(extra))
    with _interpret_patch(sk):
        out = np.asarray(sk.softsplat_pallas_banded(vals, flow))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_softsplat_interpret_stacked_base_only(rng, monkeypatch):
    """All sources in the base band: the four absent extra bands must be
    skipped without touching the accumulated output."""
    base = (-8.0, 8.0, -64.0, 64.0)
    extra = (
        (8.0, 24.0, -64.0, 64.0),
        (-24.0, -8.0, -64.0, 64.0),
        (-8.0, 8.0, 64.0, 192.0),
        (-8.0, 8.0, -192.0, -64.0),
    )
    monkeypatch.setattr(sk, "BAND_BASE", base)
    monkeypatch.setattr(sk, "BANDS_EXTRA", extra)

    h, w = 32, 256
    vals = jnp.asarray(rng.random((1, h, w, 2), np.float32))
    flow = jnp.asarray(rng.random((1, h, w, 2), np.float32) * 8 - 4)

    ref = _banded_ref(vals, flow, [base])
    with _interpret_patch(sk):
        out = np.asarray(sk.softsplat_pallas_banded(vals, flow))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_softsplat_interpret_folded_wide_channels(rng, monkeypatch):
    """Wide-channel fold: channel chunks ride the batch axis with flow
    windows DMA'd at the true batch index (fold > 1), batch > 1 so the
    fold/batch index arithmetic is exercised."""
    base = (-8.0, 8.0, -64.0, 64.0)
    extra = ((8.0, 24.0, -64.0, 64.0),)
    monkeypatch.setattr(sk, "BAND_BASE", base)
    monkeypatch.setattr(sk, "BANDS_EXTRA", extra)

    h, w, c = 32, 256, 5  # bf16 cap 16 -> force fold via f32 (cap 2): 3 folds
    vals = jnp.asarray(rng.random((2, h, w, c), np.float32))
    f = rng.random((2, h, w, 2), np.float32) * 8 - 4
    f[:, :8] = [2.0, 10.0]  # some fast-down sources -> band 1 live
    flow = jnp.asarray(f)

    ref = _banded_ref(vals, flow, [base] + list(extra))
    with _interpret_patch(sk):
        out = np.asarray(sk.softsplat_pallas_banded(vals, flow))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_softsplat_interpret_narrow_frame_clamped_window(rng):
    """Frames narrower than the 128 tile: the kernel pads, clamps the window
    to the whole frame (total coverage), and drops out-of-band sources for
    the caller's residual — with the REAL band table (no extra band fits)."""
    h, w, c = 24, 100, 3
    vals = jnp.asarray(rng.random((1, h, w, c), np.float32))
    f = rng.random((1, h, w, 2), np.float32) * 6 - 3
    f[:, :4] = [200.0, 0.0]  # beyond the base band -> dropped by the kernel
    flow = jnp.asarray(f)
    ref = _banded_ref(vals, flow, [sk.BAND_BASE])
    with _interpret_patch(sk):
        out = np.asarray(sk.softsplat_pallas_banded(vals, flow))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
