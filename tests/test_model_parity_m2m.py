"""M2M parity vs the reference torch arch with random weights (CUDA custom ops
stubbed with CPU torch equivalents)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import torch_ops_stub
from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import m2m
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def ref_m2m():
    torch_ops_stub.install()
    return load_reference_module("vfi_models/m2m/M2M_arch.py", "ref_m2m_arch")


def test_m2m_parity(ref_m2m):
    torch.manual_seed(0)
    model = ref_m2m.M2M_PWC().eval()
    img0 = torch.rand(1, 3, 48, 80)
    img1 = torch.rand(1, 3, 48, 80)
    t = torch.full((1, 1, 1, 1), 0.5)
    with torch.no_grad():
        ref_out = model(img0, img1, [t])[0]

    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = m2m.apply(
        params,
        jnp.asarray(img0.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(img1.numpy().transpose(0, 2, 3, 1)),
        0.5,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-3, atol=5e-4
    )


def test_m2m_parity_t_quarter(ref_m2m):
    torch.manual_seed(2)
    model = ref_m2m.M2M_PWC().eval()
    img0 = torch.rand(2, 3, 64, 64)
    img1 = torch.rand(2, 3, 64, 64)
    t = torch.full((2, 1, 1, 1), 0.25)
    with torch.no_grad():
        ref_out = model(img0, img1, [t])[0]
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = m2m.apply(
        params,
        jnp.asarray(img0.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(img1.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray([0.25, 0.25], jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-3, atol=5e-4
    )
