"""AMT (S/L/G) parity vs the reference torch arch with random weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import amt
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def ref_amt():
    return load_reference_module("vfi_models/amt/amt_arch.py", "ref_amt_arch")


@pytest.mark.parametrize("variant,num_flows", [("S", 3), ("L", 5), ("G", 5)])
def test_amt_parity(ref_amt, variant, num_flows):
    torch.manual_seed(0)
    cls = {"S": ref_amt.AMT_S, "L": ref_amt.AMT_L, "G": ref_amt.AMT_G}[variant]
    model = cls(corr_radius=3, corr_lvls=4, num_flows=num_flows).eval()
    # H/8, W/8 must stay >= 16: the reference bilinear_sampler divides by
    # (size-1), which is 0 at a 1x1 coarsest corr-pyramid level (amt_arch.py:948)
    img0 = torch.rand(1, 3, 128, 160)
    img1 = torch.rand(1, 3, 128, 160)
    embt = torch.full((1, 1, 1, 1), 0.5)
    with torch.no_grad():
        ref_out = model(img0, img1, embt, scale_factor=1.0, eval=True)["imgt_pred"]
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = amt.apply(
        params,
        jnp.asarray(img0.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(img1.numpy().transpose(0, 2, 3, 1)),
        0.5,
        variant=variant,
        num_flows=num_flows,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-3, atol=5e-4
    )


def test_amt_s_timestep(ref_amt):
    torch.manual_seed(1)
    model = ref_amt.AMT_S(corr_radius=3, corr_lvls=4, num_flows=3).eval()
    img0 = torch.rand(2, 3, 128, 128)
    img1 = torch.rand(2, 3, 128, 128)
    embt = torch.full((2, 1, 1, 1), 0.25)
    with torch.no_grad():
        ref_out = model(img0, img1, embt, eval=True)["imgt_pred"]
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = amt.apply(
        params,
        jnp.asarray(img0.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(img1.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray([0.25, 0.25], jnp.float32),
        variant="S",
        num_flows=3,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-3, atol=5e-4
    )
