"""FLAVR parity vs the reference torch arch (random weights)."""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from conftest import REFERENCE_DIR, has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import flavr
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def ref_flavr():
    # flavr_arch imports ".resnet_3D" from the literal package "vfi_models.flavr"
    for name, path in (
        ("vfi_models", os.path.join(REFERENCE_DIR, "vfi_models")),
        ("vfi_models.flavr", os.path.join(REFERENCE_DIR, "vfi_models", "flavr")),
    ):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
    return load_reference_module("vfi_models/flavr/flavr_arch.py", "ref_flavr_arch")


def test_flavr_parity(ref_flavr):
    torch.manual_seed(0)
    model = ref_flavr.UNet_3D_3D(
        "unet_18", n_inputs=4, n_outputs=1, joinType="concat", upmode="transpose"
    ).eval()
    frames = [torch.rand(2, 3, 48, 64) for _ in range(4)]
    with torch.no_grad():
        ref_out = model(frames)[0]
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    clip = jnp.stack(
        [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in frames], axis=1
    )
    out = flavr.apply(params, clip, 1)[0]
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-3, atol=5e-4
    )


def test_flavr_multi_output(ref_flavr):
    torch.manual_seed(1)
    model = ref_flavr.UNet_3D_3D(
        "unet_18", n_inputs=4, n_outputs=3, joinType="concat", upmode="transpose"
    ).eval()
    frames = [torch.rand(1, 3, 32, 32) for _ in range(4)]
    with torch.no_grad():
        ref_outs = model(frames)
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    assert flavr.infer_n_outputs(params) == 3
    clip = jnp.stack(
        [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in frames], axis=1
    )
    outs = flavr.apply(params, clip, 3)
    for o, r in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.asarray(o).transpose(0, 3, 1, 2), r.numpy(), rtol=1e-3, atol=5e-4
        )
