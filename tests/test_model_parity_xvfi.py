"""XVFI parity vs the reference torch arch (random weights, both checkpoint
configs at reduced nf for speed — parity is config-generic)."""

import argparse

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import xvfi
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def ref_xvfi():
    return load_reference_module("vfi_models/xvfi/xvfi_arch.py", "ref_xvfi_arch")


@pytest.mark.parametrize(
    "scale,s_tst,nf,hw",
    [
        (2, 1, 32, (96, 128)),   # Vimeo config shape (divide = 16)
        (4, 3, 16, (256, 256)),  # X4K-style multi-level (divide = 128)
    ],
)
def test_xvfi_parity(ref_xvfi, scale, s_tst, nf, hw):
    torch.manual_seed(0)
    args = argparse.Namespace(
        gpu=torch.device("cpu"), nf=nf, module_scale_factor=scale,
        S_trn=s_tst, S_tst=s_tst, img_ch=3,
    )
    model = ref_xvfi.XVFInet(args).eval()
    h, w = hw
    i0 = torch.rand(2, 3, h, w)
    i1 = torch.rand(2, 3, h, w)
    x = torch.stack([i0, i1], dim=2)  # [B, C, T, H, W]
    t = torch.tensor([[0.5], [0.25]])
    with torch.no_grad():
        ref_out = model(x, t, is_training=False)
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = xvfi.apply(
        params,
        jnp.asarray(i0.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(i1.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(t.numpy().reshape(-1)),
        module_scale_factor=scale,
        s_tst=s_tst,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(),
        rtol=1e-3, atol=2e-3,
    )

    # the pair-cached split (node path) must agree with the torch reference
    # too: reuse (feat pyramid + flow levels) once, synth tail per timestep.
    # Exercises make_pair_fns' own padding branch (hw chosen divisible here,
    # so also check an off-size crop which forces padding).
    ckpt = (
        "XVFInet_Vimeo_exp1_latest.pt" if scale == 2 else None
    )
    if ckpt is not None:
        f0 = jnp.asarray(i0.numpy().transpose(0, 2, 3, 1))
        f1 = jnp.asarray(i1.numpy().transpose(0, 2, 3, 1))
        reuse_fn, infer_fn = xvfi.make_pair_fns(params, ckpt)
        split_out = infer_fn(
            f0, f1, reuse_fn(f0, f1), jnp.asarray(t.numpy().reshape(-1))
        )
        np.testing.assert_allclose(
            np.asarray(split_out).transpose(0, 3, 1, 2), ref_out.numpy(),
            rtol=1e-3, atol=2e-3,
        )
        # off-size input -> padding path
        c0, c1 = f0[:, : h - 5, : w - 3], f1[:, : h - 5, : w - 3]
        pout = infer_fn(
            c0, c1, reuse_fn(c0, c1), jnp.asarray(t.numpy().reshape(-1))
        )
        assert pout.shape == (2, h - 5, w - 3, 3)
        assert np.isfinite(np.asarray(pout)).all()
