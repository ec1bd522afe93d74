"""Node-layer end-to-end runs for the families the composed PSNR gate
(``bench.py:psnr_torch_mode``: rife/film/ifrnet/m2m/sepconv) does not cover.

Each test builds the reference torch arch with random weights, converts the
state dict mechanically (exactly the node's ``params=`` contract), and runs
the REAL node ``vfi()`` — INPUT_TYPES knobs, plan construction, executor
selection, model factory wiring — on tiny frames. Model-forward numerics are
already pinned by the per-family parity tests; what these catch is node-layer
wiring (wrong planner, factory signature drift, executor misrouting), which
round 2 showed can break silently when only the model layer is tested.
"""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.core.schedule import (
    plan_bisection, plan_timestep, plan_window4,
)
from comfyui_frame_interpolation_tpu.nodes import NODE_CLASS_MAPPINGS
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


def _conv(model):
    return to_jax_tree(nest_state_dict(model.state_dict()))


def _frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((n, h, w, 3), dtype=np.float32)


def _run(node_name, frames, expected_n, **kwargs):
    node = NODE_CLASS_MAPPINGS[node_name]()
    out, = node.vfi(frames=frames, **kwargs)
    out = np.asarray(out)
    assert out.shape == (expected_n,) + frames.shape[1:], out.shape
    assert np.isfinite(out).all()
    return out


def test_cain_node_e2e():
    ref = load_reference_module("vfi_models/cain/cain_arch.py", "e2e_cain")
    torch.manual_seed(0)
    params = _conv(ref.CAIN(depth=3).eval())
    n_out = len(plan_timestep(3, 2).output)
    _run(
        "CAIN VFI", _frames(3, 64, 96), n_out,
        ckpt_name="pretrained_cain.pth", multiplier=2, params=params,
        batch_size=2,
    )


def test_amt_node_e2e():
    ref = load_reference_module("vfi_models/amt/amt_arch.py", "e2e_amt")
    torch.manual_seed(0)
    params = _conv(ref.AMT_S(corr_radius=3, corr_lvls=4, num_flows=3).eval())
    n_out = len(plan_timestep(2, 2).output)
    _run(
        "AMT VFI", _frames(2, 64, 96), n_out,
        ckpt_name="amt-s.pth", multiplier=2, params=params, batch_size=2,
    )


def test_ifunet_node_e2e():
    ref = load_reference_module("vfi_models/ifunet/IFUNet_arch.py", "e2e_ifunet")
    torch.manual_seed(0)
    params = _conv(ref.IFUNetModel().eval())
    n_out = len(plan_timestep(2, 2).output)
    _run(
        "IFUnet VFI", _frames(2, 64, 96), n_out,
        ckpt_name="IFUNet.pth", multiplier=2, params=params,
        scale_factor=1.0, ensemble=False, batch_size=2,
    )


def test_flavr_node_e2e():
    # flavr_arch imports ".resnet_3D" from the literal package
    # "vfi_models.flavr" — register the package stubs like the parity test
    import os
    import sys
    import types

    from conftest import REFERENCE_DIR

    for name, path in (
        ("vfi_models", os.path.join(REFERENCE_DIR, "vfi_models")),
        ("vfi_models.flavr", os.path.join(REFERENCE_DIR, "vfi_models", "flavr")),
    ):
        if name not in sys.modules:
            pkg = types.ModuleType(name)
            pkg.__path__ = [path]
            sys.modules[name] = pkg
    ref = load_reference_module("vfi_models/flavr/flavr_arch.py", "e2e_flavr")
    torch.manual_seed(0)
    params = _conv(
        ref.UNet_3D_3D(
            "unet_18", n_inputs=4, n_outputs=1, joinType="concat",
            upmode="transpose",
        ).eval()
    )
    n_out = len(plan_window4(4, False).output)
    _run(
        "FLAVR VFI", _frames(4, 48, 64), n_out,
        ckpt_name="FLAVR_2x.pth", multiplier=2, params=params, batch_size=2,
    )


def test_stmfnet_node_e2e():
    # same environment the stmfnet parity fixture builds: torch ops stub
    # (vfi_models.ops), vfi_utils stub, cuda no-op
    import sys
    import types

    import torch_ops_stub
    from test_model_parity_stmfnet import _build_model

    torch_ops_stub.install()
    if "vfi_utils" not in sys.modules:
        vu = types.ModuleType("vfi_utils")
        vu.get_ckpt_container_path = lambda mt: "/tmp/ckpts"
        sys.modules["vfi_utils"] = vu
    torch.Tensor.cuda = lambda self, *a, **k: self
    ref = load_reference_module(
        "vfi_models/stmfnet/stmfnet_arch.py", "e2e_stmfnet"
    )
    torch.manual_seed(0)
    params = _conv(_build_model(ref))
    n_out = len(plan_window4(4, True).output)
    _run(
        "STMFNet VFI", _frames(4, 128, 128), n_out,
        ckpt_name="stmfnet.pth", multiplier=2, params=params,
        duplicate_first_last_frames=True, batch_size=1,
    )


def test_gmfss_node_e2e():
    from test_model_parity_gmfss import _params_from, _setup_pkgs

    _setup_pkgs()
    ref = load_reference_module(
        "vfi_models/gmfss_fortuna/GMFSS_Fortuna_arch.py", "e2e_gmfss"
    )
    torch.manual_seed(0)
    model = ref.Model()
    model.eval()
    params = _params_from(model)
    n_out = len(plan_timestep(2, 2).output)
    _run(
        "GMFSS Fortuna VFI", _frames(2, 64, 128), n_out,
        ckpt_name="GMFSS_fortuna", multiplier=2, params=params, batch_size=1,
    )


def test_atm_node_e2e():
    from test_model_parity_atm import _install_timm_stub

    _install_timm_stub()
    ref = load_reference_module("vfi_models/atm/network_lite.py", "e2e_atm")
    torch.manual_seed(0)
    model = ref.Network(global_motion=False, ensemble_global_motion=False)
    model.eval()
    params = _conv(model)
    n_out = len(plan_bisection(2, 2).output)
    _run(
        "ATM VFI", _frames(2, 192, 192), n_out,
        ckpt_name="atm-vfi-lite.pt", multiplier=2, params=params,
        global_motion="Off (fastest)", batch_size=1,
    )


def test_momo_node_e2e():
    from comfyui_frame_interpolation_tpu.models import momo

    params = momo.init_params(jax.random.PRNGKey(0), "momo-base.pth")
    n_out = len(plan_bisection(2, 2).output)
    _run(
        "MOMO VFI", _frames(2, 128, 128), n_out,
        ckpt_name="momo-base.pth", multiplier=2, params=params,
        num_inference_steps=2, batch_size=1,
    )


def test_xvfi_node_e2e():
    ref = load_reference_module("vfi_models/xvfi/xvfi_arch.py", "e2e_xvfi")
    torch.manual_seed(0)
    args = argparse.Namespace(
        gpu=torch.device("cpu"), nf=32, module_scale_factor=2,
        S_trn=1, S_tst=1, img_ch=3,
    )
    params = _conv(ref.XVFInet(args).eval())
    n_out = len(plan_timestep(2, 2, zero_drops_pair=False).output)
    _run(
        "XVFI VFI", _frames(2, 96, 128), n_out,
        ckpt_name="XVFInet_Vimeo_exp1_latest.pt", multipler=2, params=params,
        batch_size=2,
    )


def test_eisai_node_e2e():
    # instantiate-only (no torch forward), but eisai_arch's module level needs
    # the parity suite's kornia/torchvision/cv2 stubs
    import torch_ops_stub
    from test_model_parity_eisai import (
        _install_cv2_stub, _install_kornia_stub, _install_torchvision_stub,
    )

    torch_ops_stub.install()
    _install_kornia_stub()
    _install_torchvision_stub()
    _install_cv2_stub()
    torch.Tensor.cuda = lambda self, *a, **k: self
    ref = load_reference_module("vfi_models/eisai/eisai_arch.py", "e2e_eisai")
    torch.manual_seed(0)
    raft = ref.RAFT(None).eval()
    ssl = ref.SoftsplatLite().eval()
    dtm = ref.DTM().eval()
    params = {
        "raft": _conv(raft)["raft"],
        "ssl": _conv(ssl),
        "dtm": _conv(dtm),
    }
    n_out = len(plan_timestep(2, 2).output)
    _run(
        "EISAI VFI", _frames(2, 64, 96), n_out,
        ckpt_name="eisai", multiplier=2, params=params, batch_size=1,
    )
