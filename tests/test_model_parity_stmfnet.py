"""STMFNet parity vs the reference torch arch (random weights; CUDA ops stubbed,
PWCNet's in-constructor weight download bypassed)."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import torch_ops_stub
from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import stmfnet
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def ref_stmfnet():
    torch_ops_stub.install()
    if "vfi_utils" not in sys.modules:
        vu = types.ModuleType("vfi_utils")
        vu.get_ckpt_container_path = lambda mt: "/tmp/ckpts"
        sys.modules["vfi_utils"] = vu
    # the arch's backwarp moves its grid to CUDA unconditionally
    torch.Tensor.cuda = lambda self, *a, **k: self
    return load_reference_module("vfi_models/stmfnet/stmfnet_arch.py", "ref_stmfnet_arch")


def _build_model(ref):
    # PWCNet downloads its weights inside __init__ — keep random init instead
    orig = torch.nn.Module.load_state_dict
    orig_hub = torch.hub.load_state_dict_from_url
    torch.hub.load_state_dict_from_url = lambda *a, **k: {}
    torch.nn.Module.load_state_dict = lambda self, sd, **kw: None
    try:
        model = ref.STMFNet_Model().eval()
    finally:
        torch.nn.Module.load_state_dict = orig
        torch.hub.load_state_dict_from_url = orig_hub
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    return model


def test_stmfnet_parity(ref_stmfnet):
    torch.manual_seed(0)
    model = _build_model(ref_stmfnet)
    frames = [torch.rand(1, 3, 128, 128) for _ in range(4)]
    with torch.no_grad():
        ref_out = model(*frames)
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = stmfnet.apply(
        params,
        *[jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in frames],
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-3, atol=1e-3
    )
