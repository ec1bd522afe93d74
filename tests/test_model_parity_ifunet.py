"""IFUnet parity vs the reference torch arch (random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import ifunet
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def ref_ifunet():
    return load_reference_module("vfi_models/ifunet/IFUNet_arch.py", "ref_ifunet_arch")


def _randomize_bn(model):
    """Give BatchNorms non-trivial running stats so eval-mode parity is real."""
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)


@pytest.mark.parametrize("ensemble", [False, True])
def test_ifunet_parity(ref_ifunet, ensemble):
    torch.manual_seed(0)
    model = ref_ifunet.IFUNetModel().eval()
    _randomize_bn(model)
    img0 = torch.rand(1, 3, 37, 61)
    img1 = torch.rand(1, 3, 37, 61)
    with torch.no_grad():
        ref_out = model(img0, img1, timestep=0.5, scale=1.0, ensemble=ensemble)
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = ifunet.apply(
        params,
        jnp.asarray(img0.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(img1.numpy().transpose(0, 2, 3, 1)),
        0.5,
        scale=1.0,
        ensemble=ensemble,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-3, atol=5e-4
    )
