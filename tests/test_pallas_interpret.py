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
