"""MoMo: SynthesisNet parity vs torch (torchvision stubbed); the diffusion UNet
is checked for internal structural consistency (full parity requires the
`diffusers` package, unavailable in this image — the test runs it if present).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import momo
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


def _stub_torchvision():
    if "torchvision.models.optical_flow" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    of = types.ModuleType("torchvision.models.optical_flow")
    of.raft_large = of.raft_small = lambda *a, **k: None
    of.Raft_Large_Weights = of.Raft_Small_Weights = types.SimpleNamespace(DEFAULT=None)
    models.optical_flow = of
    tv.models = models
    sys.modules.setdefault("torchvision", tv)
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.optical_flow"] = of


@pytest.fixture(scope="module")
def ref_synth():
    _stub_torchvision()
    return load_reference_module("vfi_models/momo/synthesis.py", "ref_momo_synthesis")


def test_synthesis_parity(ref_synth):
    torch.manual_seed(0)
    model = ref_synth.SynthesisNet().eval()
    # H=W=128 → n_lvls = ceil(log2(128/64)) + 1 = 2 recurrent levels
    x0 = torch.rand(1, 3, 128, 128)
    x1 = torch.rand(1, 3, 128, 128)
    flows = torch.randn(1, 4, 128, 128) * 4
    x = torch.stack([x0, x1], dim=2)  # [B, 3, 2, H, W]
    with torch.no_grad():
        ref_out = model(x, flows)
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    frames6 = jnp.concatenate(
        [
            jnp.asarray(x0.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(x1.numpy().transpose(0, 2, 3, 1)),
        ],
        axis=-1,
    )
    out = momo._synthesize(params, frames6, jnp.asarray(flows.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-3, atol=5e-4
    )


def test_ddpm_trailing_timesteps():
    sched = momo.DDPM()
    ts = sched.timesteps(8)
    # diffusers 'trailing' spacing for T=1000, 8 steps
    assert ts[0] == 999 and len(ts) == 8
    assert list(ts) == [999, 874, 749, 624, 499, 374, 249, 124]


def _install_diffusers_shim():
    """Make ``import diffusers`` resolve — to the real package if installed,
    else to the clean-room test shim in tests/vendored (covers exactly the
    subset momo/unet.py:22-28 + momo.py:5 import)."""
    import importlib.util

    if importlib.util.find_spec("diffusers") is None:
        vend = os.path.join(os.path.dirname(__file__), "vendored")
        if vend not in sys.path:
            sys.path.insert(0, vend)


def test_momo_full_parity(ref_synth):
    """Composed eval-path parity: full denoise loop + synthesis vs the
    reference MoMo (momo.py:153-224) on an identical injected noise sequence."""
    _install_diffusers_shim()
    _stub_torchvision()
    ref_momo = load_reference_module("vfi_models/momo/momo.py", "ref_momo_full")

    torch.manual_seed(7)
    model = ref_momo.MoMo(synth_model=ref_synth.SynthesisNet()).eval()

    b, hh, ww, steps = 1, 128, 128, 4
    rng = np.random.default_rng(3)
    x0 = rng.random((b, 3, hh, ww), dtype=np.float32)
    x1 = rng.random((b, 3, hh, ww), dtype=np.float32)
    x = torch.stack([torch.from_numpy(x0), torch.from_numpy(x1)], dim=2)

    # deterministic noise: initial latent + one variance draw per t>0 step
    noises = [rng.standard_normal((b, 4, hh, ww)).astype(np.float32) for _ in range(steps + 1)]
    queue = [torch.from_numpy(n) for n in noises]
    orig_randn = torch.randn

    def fake_randn(*shape, **kwargs):
        if shape and isinstance(shape[0], (tuple, torch.Size)):
            shape = tuple(shape[0])
        n = queue.pop(0)
        assert tuple(n.shape) == tuple(shape), (n.shape, shape)
        return n.to(dtype=kwargs.get("dtype") or torch.float32)

    torch.randn = fake_randn
    try:
        with torch.no_grad():
            ref_out, ref_flows = model(x, num_inference_steps=steps)
    finally:
        torch.randn = orig_randn
    assert not queue  # every injected draw was consumed

    params = to_jax_tree(nest_state_dict(model.state_dict()))
    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    out = momo.apply(
        params,
        nhwc(x0),
        nhwc(x1),
        num_inference_steps=steps,
        init_latents=nhwc(noises[0]),
        step_noises=[nhwc(n) for n in noises[1:]],
    )
    got = np.asarray(out).transpose(0, 3, 1, 2)
    want = ref_out.numpy()
    mse = float(np.mean((got - want) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 40.0, f"composed MoMo PSNR {psnr:.1f} dB < 40"


@pytest.mark.parametrize("ckpt", momo.CKPT_NAMES)
def test_init_params_runs_end_to_end(ckpt):
    # the random tree (used by bench_momo; the torch arch needs diffusers)
    # must have exactly the shapes apply() consumes, for both variants
    params = momo.init_params(jax.random.PRNGKey(0), ckpt)
    fn = momo.make_model_fn(params, ckpt, num_inference_steps=2)
    f0 = jnp.zeros((1, 64, 64, 3))
    f1 = jnp.full((1, 64, 64, 3), 0.5)
    out = fn(f0, f1, jnp.full((1,), 0.5))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
