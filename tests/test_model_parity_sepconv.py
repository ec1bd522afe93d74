"""Sepconv parity vs the reference torch arch (CUDA ops stubbed)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import torch_ops_stub
from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import sepconv
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def ref_sepconv():
    torch_ops_stub.install()
    return load_reference_module(
        "vfi_models/sepconv/sepconv_enhanced.py", "ref_sepconv_arch"
    )


@pytest.mark.parametrize("hw", [(64, 96), (63, 95)])
def test_sepconv_parity(ref_sepconv, hw):
    torch.manual_seed(0)
    model = ref_sepconv.Network().eval()
    h, w = hw
    x1 = torch.rand(1, 3, h, w)
    x2 = torch.rand(1, 3, h, w)
    with torch.no_grad():
        ref_out = model(x1, x2)
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = sepconv.apply(
        params,
        jnp.asarray(x1.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(x2.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-3, atol=5e-4
    )
