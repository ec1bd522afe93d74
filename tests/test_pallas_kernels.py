"""TPU-gated exactness tests for the Pallas kernels.

Run with::

    CFI_TEST_TPU=1 python -m pytest tests/test_pallas_kernels.py -m tpu -q

Under the default (CPU-pinned) test configuration every test here skips; on a
real TPU they assert bit-exactness (or the documented bounded error) of

* ``warp_pallas_tiered`` vs ``warp_xla`` — border and zeros padding, flows
  exercising both the bulk (24, 384)-window pass and the exact dynamic-slab
  patch pass (discontinuities, extreme random flows), odd shapes, channel
  counts beyond the per-call VMEM caps;
* ``softsplat_pallas`` / ``softsplat_pallas_banded`` vs ``_softsplat_xla`` —
  in-window flows, the window contract edges, non-finite flows, flows landing
  in each extra displacement band, and the dispatcher's masked-residual path
  for beyond-band flows.

Known semantic difference (documented, not a bug): at pixels whose flow is
non-finite the XLA warp propagates NaN (matching torch ``grid_sample``) while
the kernel's zeros path emits 0. Tests mask those pixels out.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("CFI_TEST_TPU") != "1"
        or jax.default_backend() in ("cpu", "gpu"),
        reason="needs a real TPU (set CFI_TEST_TPU=1)",
    ),
]


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


from contextlib import contextmanager


@contextmanager
def _warp_mxu_env(value):
    prev = os.environ.get("CFI_WARP_MXU")
    os.environ["CFI_WARP_MXU"] = value
    try:
        yield
    finally:
        if prev is None:
            os.environ.pop("CFI_WARP_MXU", None)
        else:
            os.environ["CFI_WARP_MXU"] = prev


def _smooth_flow(b, h, w, amp, scale=200.0):
    gy, gx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            amp * np.sin(gx / scale) + 0.5 * amp * np.cos(gy / scale),
            -amp * np.cos(gx / scale) + 0.4 * amp * np.sin(gy / scale),
        ],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(np.broadcast_to(base, (b, h, w, 2)).copy())


def _assert_warp_exact(img, flow, zeros, atol=0.0):
    from comfyui_frame_interpolation_tpu.ops.pallas.warp_kernel import (
        warp_pallas_tiered,
    )
    from comfyui_frame_interpolation_tpu.ops.warp import warp_xla

    mode = "zeros" if zeros else "border"
    ref = np.asarray(warp_xla(img, flow, padding_mode=mode).astype(jnp.float32))
    out = np.asarray(
        warp_pallas_tiered(img, flow, zeros=zeros).astype(jnp.float32)
    )
    np.testing.assert_allclose(out, ref, atol=atol, rtol=0)


class TestWarpTiered:
    @pytest.mark.parametrize("zeros", [False, True])
    def test_tier0_smooth(self, rng, zeros):
        img = jnp.asarray(rng.standard_normal((2, 256, 512, 7)), jnp.bfloat16)
        flow = _smooth_flow(2, 256, 512, amp=0.4)  # near-constant: tier 0
        _assert_warp_exact(img, flow, zeros)

    @pytest.mark.parametrize("zeros", [False, True])
    def test_tier1_moderate_variation(self, rng, zeros):
        img = jnp.asarray(rng.standard_normal((2, 256, 512, 7)), jnp.bfloat16)
        flow = _smooth_flow(2, 256, 512, amp=20.0, scale=60.0)
        _assert_warp_exact(img, flow, zeros)

    @pytest.mark.parametrize("zeros", [False, True])
    def test_tier2_discontinuity(self, rng, zeros):
        img = jnp.asarray(rng.standard_normal((2, 256, 512, 3)), jnp.bfloat16)
        disc = np.zeros((2, 256, 512, 2), np.float32)
        disc[:, :, :256] = [120.0, 30.0]
        disc[:, :, 256:] = [-120.0, -30.0]
        _assert_warp_exact(img, jnp.asarray(disc), zeros)

    @pytest.mark.parametrize("zeros", [False, True])
    def test_fallback_extreme(self, rng, zeros):
        img = jnp.asarray(rng.standard_normal((2, 256, 512, 3)), jnp.bfloat16)
        flow = jnp.asarray(
            rng.standard_normal((2, 256, 512, 2)) * 400.0, jnp.float32
        )
        _assert_warp_exact(img, flow, zeros)

    def test_large_constant_offset_stays_cheap_tier(self, rng):
        # any constant offset is absorbed by the per-tile window bases
        img = jnp.asarray(rng.standard_normal((1, 256, 512, 3)), jnp.bfloat16)
        flow = _smooth_flow(1, 256, 512, amp=0.3) + jnp.asarray(
            [[[[300.0, -150.0]]]], jnp.float32
        )
        _assert_warp_exact(img, flow, False)

    @pytest.mark.parametrize("zeros", [False, True])
    def test_odd_shapes(self, rng, zeros):
        img = jnp.asarray(rng.standard_normal((1, 137, 261, 5)), jnp.float32)
        flow = jnp.asarray(
            rng.standard_normal((1, 137, 261, 2)) * 3.0, jnp.float32
        )
        _assert_warp_exact(img, flow, zeros)

    @pytest.mark.parametrize("zeros", [False, True])
    def test_wide_channels_chunked(self, rng, zeros):
        # beyond the per-tier channel caps: exercises in-tier chunking
        img = jnp.asarray(rng.standard_normal((1, 256, 512, 40)), jnp.bfloat16)
        flow = jnp.asarray(
            rng.standard_normal((1, 256, 512, 2)) * 4.0, jnp.float32
        )
        _assert_warp_exact(img, flow, zeros)

    @pytest.mark.parametrize("zeros", [False, True])
    def test_mxu_kernel_forced_narrow(self, rng, zeros):
        # force the MXU rows kernel on a narrow image (the policy would pick
        # the diagonal kernel): exactness must hold for the sublane-padded
        # single-chunk path too, across bulk + patch regimes
        with _warp_mxu_env("force"):
            img = jnp.asarray(
                rng.standard_normal((2, 256, 512, 7)), jnp.bfloat16
            )
            for flow in (
                _smooth_flow(2, 256, 512, amp=0.4),
                _smooth_flow(2, 256, 512, amp=20.0, scale=60.0),
                jnp.asarray(
                    rng.standard_normal((2, 256, 512, 2)) * 400.0, jnp.float32
                ),
            ):
                _assert_warp_exact(img, flow, zeros)

    @pytest.mark.parametrize("zeros", [False, True])
    def test_mxu_kernel_wide_smooth_and_const(self, rng, zeros):
        # the MXU kernel's target case: wide bf16 features (FILM/GMFSS
        # feature warps), including the channel fold (c=64 > cap=32).
        # Smooth (multi-row-pair) and constant (fast-path) flows both must
        # be bit-exact vs warp_xla
        with _warp_mxu_env("auto"):
            img = jnp.asarray(
                rng.standard_normal((2, 256, 512, 64)), jnp.bfloat16
            )
            _assert_warp_exact(img, _smooth_flow(2, 256, 512, amp=6.0), zeros)
            const = jnp.full((2, 256, 512, 2), 5.25, jnp.float32)
            _assert_warp_exact(img, const, zeros)

    def test_nonfinite_flow_zeros_contributes_nothing(self, rng):
        from comfyui_frame_interpolation_tpu.ops.pallas.warp_kernel import (
            warp_pallas_tiered,
        )
        from comfyui_frame_interpolation_tpu.ops.warp import warp_xla

        img = jnp.asarray(rng.standard_normal((1, 256, 512, 3)), jnp.bfloat16)
        f = np.array(_smooth_flow(1, 256, 512, amp=2.0))
        bad = np.zeros((256, 512), bool)
        bad[10, 10] = bad[100, 300] = True
        f[0, bad] = np.nan
        flow = jnp.asarray(f)
        out = np.asarray(
            warp_pallas_tiered(img, flow, zeros=True).astype(jnp.float32)
        )
        ref = np.asarray(
            warp_xla(img, flow, padding_mode="zeros").astype(jnp.float32)
        )
        # kernel: non-finite pixels contribute 0; finite pixels bit-exact
        assert np.all(out[0, bad] == 0.0)
        np.testing.assert_array_equal(out[0, ~bad], ref[0, ~bad])

    def test_dispatch_warp_uses_kernel(self, rng):
        # the public ops.warp entry point must route TPU-sized images through
        # the kernel and stay exact
        from comfyui_frame_interpolation_tpu.ops.warp import warp, warp_xla

        img = jnp.asarray(rng.standard_normal((2, 544, 960, 7)), jnp.bfloat16)
        flow = _smooth_flow(2, 544, 960, amp=6.0)
        ref = np.asarray(warp_xla(img, flow).astype(jnp.float32))
        out = np.asarray(warp(img, flow).astype(jnp.float32))
        np.testing.assert_array_equal(out, ref)


class TestSoftsplatPallas:
    def _ref(self, vals, flow):
        from comfyui_frame_interpolation_tpu.ops.softsplat import _softsplat_xla

        return np.asarray(_softsplat_xla(vals, flow))

    def test_in_window_exact(self, rng):
        from comfyui_frame_interpolation_tpu.ops.pallas.softsplat_kernel import (
            softsplat_pallas,
        )

        vals = jnp.asarray(rng.random((2, 256, 512, 4)), jnp.float32)
        flow = _smooth_flow(2, 256, 512, amp=8.0)
        out = np.asarray(softsplat_pallas(vals, flow))
        ref = self._ref(vals, flow)
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)

    def test_window_contract_edges(self, rng):
        from comfyui_frame_interpolation_tpu.ops.pallas.softsplat_kernel import (
            DEF_OFF_X, DEF_OFF_Y, DEF_WIN_H, DEF_WIN_W, softsplat_pallas,
        )

        vals = jnp.asarray(rng.random((1, 256, 512, 2)), jnp.float32)
        # constant flow exactly at the documented inclusive corners
        lo = (-(DEF_WIN_W - DEF_OFF_X - 128 - 1), -(DEF_WIN_H - DEF_OFF_Y - 8 - 1))
        hi = (DEF_OFF_X - 1, DEF_OFF_Y - 1)
        for fx, fy in [(lo[0], lo[1]), (hi[0], hi[1]), (lo[0], hi[1])]:
            flow = jnp.full((1, 256, 512, 2), 0.0).at[..., 0].set(fx).at[..., 1].set(fy)
            out = np.asarray(softsplat_pallas(vals, flow))
            ref = self._ref(vals, flow)
            np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)

    def test_nonfinite_flow_dropped(self, rng):
        from comfyui_frame_interpolation_tpu.ops.pallas.softsplat_kernel import (
            softsplat_pallas,
        )

        vals = jnp.asarray(rng.random((1, 256, 512, 2)), jnp.float32)
        f = np.array(_smooth_flow(1, 256, 512, amp=3.0))
        f[0, 50, 50, 0] = np.inf
        f[0, 60, 60, 1] = np.nan
        flow = jnp.asarray(f)
        out = np.asarray(softsplat_pallas(vals, flow))
        ref = self._ref(vals, flow)
        np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)

    @pytest.mark.parametrize(
        "disp", [(0.0, 50.0), (0.0, -60.0), (200.0, 0.0), (-200.0, 0.0)]
    )
    def test_extra_bands_exact(self, rng, disp):
        # fast straight motion lands in a conditional band pass, not the
        # residual: result must match the exact scatter
        from comfyui_frame_interpolation_tpu.ops.softsplat import softsplat_func

        prev = os.environ.pop("CFI_TPU_SPLAT", None)
        try:
            vals = jnp.asarray(rng.random((1, 256, 512, 2)), jnp.float32)
            fx, fy = disp
            flow = jnp.full((1, 256, 512, 2), 0.0)
            flow = flow.at[..., 0].set(fx).at[..., 1].set(fy)
            # plus some in-base-band content mixed in
            flow = flow.at[:, :64].set(flow[:, :64] * 0 + 2.0)
            out = np.asarray(softsplat_func(vals, flow))
            ref = self._ref(vals, flow)
            np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)
        finally:
            if prev is not None:
                os.environ["CFI_TPU_SPLAT"] = prev

    def test_narrow_frame_gate_exact(self, rng):
        # frames narrower than one 128 tile (EISAI's 540p feature pyramid:
        # 64x114) now route through the kernel (gate relaxed to h*w >= 32*128)
        # — the kernel pads, clamps its window to the whole frame, and the
        # masked residual owns anything beyond it; total must stay exact
        from comfyui_frame_interpolation_tpu.ops.softsplat import softsplat_func

        prev = os.environ.pop("CFI_TPU_SPLAT", None)
        try:
            for h, w, c in ((64, 114, 66), (34, 128, 8)):
                vals = jnp.asarray(rng.random((1, h, w, c)), jnp.float32)
                f = np.asarray(
                    (rng.random((1, h, w, 2)) - 0.5) * 8.0, np.float32
                )
                f[:, :4] = [w + 50.0, 0.0]  # beyond the clamped window
                flow = jnp.asarray(f)
                out = np.asarray(softsplat_func(vals, flow))
                ref = self._ref(vals, flow)
                np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)
        finally:
            if prev is not None:
                os.environ["CFI_TPU_SPLAT"] = prev

    def test_residual_beyond_bands(self, rng):
        # extreme diagonal motion: outside every band -> masked XLA residual
        # must make the total exact
        from comfyui_frame_interpolation_tpu.ops.softsplat import softsplat_func

        prev = os.environ.pop("CFI_TPU_SPLAT", None)
        try:
            vals = jnp.asarray(rng.random((1, 256, 512, 2)), jnp.float32)
            f = np.zeros((1, 256, 512, 2), np.float32)
            f[:, 100:120, 200:220] = [200.0, -150.0]  # diagonal, beyond bands
            f[:, 50:60, 50:60] = [1.5, -2.0]  # ordinary in-band motion
            flow = jnp.asarray(f)
            out = np.asarray(softsplat_func(vals, flow))
            ref = self._ref(vals, flow)
            np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)
        finally:
            if prev is not None:
                os.environ["CFI_TPU_SPLAT"] = prev
