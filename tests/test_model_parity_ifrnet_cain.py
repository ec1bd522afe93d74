"""IFRNet (S/L) and CAIN parity vs the reference torch archs (random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import cain, ifrnet
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


def t2j(x):
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 1))


def j2n(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("variant,scale", [("S", 1.0), ("S", 0.5), ("L", 1.0)])
def test_ifrnet_parity(variant, scale):
    ref = load_reference_module(
        f"vfi_models/ifrnet/IFRNet_{variant}_arch.py", f"ref_ifrnet_{variant}"
    )
    torch.manual_seed(0)
    model = (ref.IRFNet_S if variant == "S" else ref.IRFNet_L)().eval()
    img0 = torch.rand(2, 3, 37, 61)
    img1 = torch.rand(2, 3, 37, 61)
    with torch.no_grad():
        ref_out = model(img0, img1, scale_factor=scale, timestep=0.55)
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = ifrnet.apply(
        params, t2j(img0), t2j(img1), 0.55, scale_factor=scale, variant=variant
    )
    np.testing.assert_allclose(j2n(out), ref_out.numpy(), rtol=1e-3, atol=2e-4)


def test_cain_parity():
    ref = load_reference_module("vfi_models/cain/cain_arch.py", "ref_cain_arch")
    torch.manual_seed(0)
    model = ref.CAIN(depth=3).eval()
    x1 = torch.rand(1, 3, 70, 90)
    x2 = torch.rand(1, 3, 70, 90)
    with torch.no_grad():
        ref_out, _ = model(x1.clone(), x2.clone())
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = cain.apply(params, t2j(x1), t2j(x2))
    np.testing.assert_allclose(j2n(out), ref_out.numpy(), rtol=1e-3, atol=2e-4)


def test_cain_aligned_size():
    ref = load_reference_module("vfi_models/cain/cain_arch.py", "ref_cain_arch2")
    torch.manual_seed(1)
    model = ref.CAIN(depth=3).eval()
    x1 = torch.rand(1, 3, 128, 128)
    x2 = torch.rand(1, 3, 128, 128)
    with torch.no_grad():
        ref_out, _ = model(x1.clone(), x2.clone())
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = cain.apply(params, t2j(x1), t2j(x2))
    np.testing.assert_allclose(j2n(out), ref_out.numpy(), rtol=1e-3, atol=2e-4)
