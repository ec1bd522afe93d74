"""GMFSS Fortuna (base + union) parity vs the reference torch arch."""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import torch_ops_stub
from conftest import REFERENCE_DIR, has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import gmfss
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


def _setup_pkgs():
    torch_ops_stub.install()
    for name, sub in (("vfi_models", ""), ("vfi_models.rife", "rife")):
        if name not in sys.modules or not hasattr(sys.modules[name], "__path__"):
            pkg = sys.modules.get(name) or types.ModuleType(name)
            pkg.__path__ = [os.path.join(REFERENCE_DIR, "vfi_models", sub)]
            sys.modules[name] = pkg


@pytest.fixture(scope="module")
def ref_gmfss():
    _setup_pkgs()
    return load_reference_module(
        "vfi_models/gmfss_fortuna/GMFSS_Fortuna_arch.py", "ref_gmfss_arch"
    )


@pytest.fixture(scope="module")
def ref_gmfss_union():
    _setup_pkgs()
    return load_reference_module(
        "vfi_models/gmfss_fortuna/GMFSS_Fortuna_union_arch.py", "ref_gmfss_union_arch"
    )


def _params_from(model_obj, union=False):
    tree = {}
    tree["flownet"] = nest_state_dict(model_obj.flownet.state_dict())
    tree["metricnet"] = nest_state_dict(model_obj.metricnet.state_dict())
    tree["feat_ext"] = nest_state_dict(model_obj.feat_ext.state_dict())
    tree["fusionnet"] = nest_state_dict(model_obj.fusionnet.state_dict())
    if union:
        tree["ifnet"] = nest_state_dict(model_obj.ifnet.state_dict())
    return to_jax_tree(tree)


def _run_ref(model_obj, img0, img1, t):
    with torch.no_grad():
        r = model_obj.reuse(img0, img1, 1.0)
        return model_obj.inference(img0, img1, *r, t)


@pytest.mark.parametrize("union", [False, True])
def test_gmfss_parity(ref_gmfss, ref_gmfss_union, union):
    torch.manual_seed(0)
    model = (ref_gmfss_union if union else ref_gmfss).Model()
    model.eval()
    # inputs pre-padded to 64 (the node pads before reuse)
    img0 = torch.rand(1, 3, 128, 192)
    img1 = torch.rand(1, 3, 128, 192)
    ref_out = _run_ref(model, img0, img1, 0.5)

    params = _params_from(model, union)
    out = gmfss.apply(
        params,
        jnp.asarray(img0.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(img1.numpy().transpose(0, 2, 3, 1)),
        0.5,
        union=union,
    )
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)
    diff = np.abs(out_nchw - ref_out.numpy())
    # GMFlow's correlation-softmax expectation amplifies f32 rounding into
    # ~0.1% flow differences at ambiguous matches; with identical flows the
    # rest of the pipeline is bit-exact (verified by feeding torch's reuse()
    # outputs into our inference()). Assert PSNR-style parity instead of
    # elementwise: mean err tiny, large deviations confined to a few pixels.
    assert diff.mean() < 2e-4, diff.mean()
    assert np.quantile(diff, 0.999) < 5e-3, np.quantile(diff, 0.999)
    assert diff.max() < 5e-2, diff.max()


def test_gmfss_inference_exact_given_flows(ref_gmfss):
    """With the reference's own reuse() outputs, inference() is bit-exact."""
    torch.manual_seed(1)
    model = ref_gmfss.Model()
    model.eval()
    img0 = torch.rand(1, 3, 64, 128)
    img1 = torch.rand(1, 3, 64, 128)
    with torch.no_grad():
        r = model.reuse(img0, img1, 1.0)
        ref_out = model.inference(img0, img1, *r, 0.5)
    params = _params_from(model)
    j = lambda t: jnp.asarray(t.numpy().transpose(0, 2, 3, 1))
    r_j = (
        j(r[0]), j(r[1]), j(r[2]), j(r[3]),
        [j(x) for x in r[4:7]],
        [j(x) for x in r[7:10]],
    )
    out = gmfss.inference(params, j(img0), j(img1), r_j, 0.5)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-4, atol=2e-4
    )
