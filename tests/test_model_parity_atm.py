"""ATM-VFI parity vs the reference torch arch (timm stubbed)."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import atm
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


def _install_timm_stub():
    if "timm.models.layers" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std)
            tensor.clamp_(-2 * std, 2 * std)
        return tensor

    class DropPath(torch.nn.Identity):
        def __init__(self, p=0.0):
            super().__init__()

    def to_2tuple(v):
        return v if isinstance(v, (tuple, list)) else (v, v)

    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


@pytest.fixture(scope="module", params=["base", "lite"])
def ref_atm(request):
    _install_timm_stub()
    variant = request.param
    mod = load_reference_module(
        f"vfi_models/atm/network_{variant}.py", f"ref_atm_{variant}"
    )
    return variant, mod


@pytest.mark.parametrize("global_motion", [True, False])
def test_atm_parity(ref_atm, global_motion):
    variant, mod = ref_atm
    torch.manual_seed(0)
    model = mod.Network(global_motion=global_motion, ensemble_global_motion=False)
    model.eval()
    # 192x192: H/16=12 divides the global window; also exercises window padding
    # at other sizes below
    im0 = torch.rand(1, 3, 192, 192)
    im1 = torch.rand(1, 3, 192, 192)
    with torch.no_grad():
        ref_out = model(im0, im1)["I_t"]
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = atm.apply(
        params,
        jnp.asarray(im0.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(im1.numpy().transpose(0, 2, 3, 1)),
        variant=variant,
        global_motion=global_motion,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-3, atol=1e-3
    )


def test_atm_window_padding(ref_atm):
    """128x128 → global tokens 8x8 need padding to the 12-window."""
    variant, mod = ref_atm
    if variant != "base":
        pytest.skip("padding path covered once")
    torch.manual_seed(1)
    model = mod.Network(global_motion=True, ensemble_global_motion=False)
    model.eval()
    im0 = torch.rand(1, 3, 128, 128)
    im1 = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        ref_out = model(im0, im1)["I_t"]
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = atm.apply(
        params,
        jnp.asarray(im0.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(im1.numpy().transpose(0, 2, 3, 1)),
        variant=variant,
        global_motion=True,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-3, atol=1e-3
    )
