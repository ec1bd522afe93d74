"""RIFE IFNet numerical parity vs the reference torch architecture.

The reference arch file is loaded directly (comfy host API stubbed), initialized
with random weights, its state dict mechanically converted, and outputs compared —
the strongest parity check available without downloadable checkpoints.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import rife
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def ref_arch():
    return load_reference_module("vfi_models/rife/rife_arch.py", "ref_rife_arch")


def _compare(ref_arch, arch_ver, scale_list, ensemble=False, fastmode=True,
             hw=(37, 61), atol=2e-4):
    torch.manual_seed(0)
    model = ref_arch.IFNet(arch_ver=arch_ver).eval()
    b = 2
    h, w = hw
    img0 = torch.rand(b, 3, h, w)
    img1 = torch.rand(b, 3, h, w)
    ts = torch.tensor([0.3, 0.7]).view(b, 1, 1, 1)
    with torch.no_grad():
        ref_out = model(
            img0, img1, ts, list(scale_list), training=False,
            fastmode=fastmode, ensemble=ensemble,
        )

    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = rife.apply(
        params,
        jnp.asarray(img0.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(img1.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray([0.3, 0.7], jnp.float32),
        list(scale_list),
        arch_ver=arch_ver,
        fastmode=fastmode,
        ensemble=ensemble,
    )
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_nchw, ref_out.numpy(), rtol=1e-3, atol=atol)


def test_rife47_parity(ref_arch):
    _compare(ref_arch, "4.7", [8, 4, 2, 1])


def test_rife47_ensemble_parity(ref_arch):
    _compare(ref_arch, "4.7", [8, 4, 2, 1], ensemble=True)


def test_rife47_scale_factor(ref_arch):
    _compare(ref_arch, "4.7", [16, 8, 4, 2])  # scale_factor 0.5


def test_rife417_parity(ref_arch):
    _compare(ref_arch, "4.17", [8, 4, 2, 1])


def test_rife426_parity(ref_arch):
    _compare(ref_arch, "4.26", [16, 8, 4, 2, 1])


def test_rife40_parity(ref_arch):
    _compare(ref_arch, "4.0", [8, 4, 2, 1])


def test_rife40_ensemble_notfast_parity(ref_arch):
    _compare(ref_arch, "4.0", [8, 4, 2, 1], ensemble=True, fastmode=False)


def test_rife46_parity(ref_arch):
    _compare(ref_arch, "4.6", [8, 4, 2, 1], ensemble=True)


def test_rife_batched_matches_unbatched(ref_arch):
    """True tensor batching (the TPU path) must equal per-pair calls."""
    torch.manual_seed(1)
    model = ref_arch.IFNet(arch_ver="4.7").eval()
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    rng = np.random.default_rng(3)
    f0 = jnp.asarray(rng.random((3, 32, 48, 3), np.float32))
    f1 = jnp.asarray(rng.random((3, 32, 48, 3), np.float32))
    ts = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)
    batched = rife.apply(params, f0, f1, ts, [8, 4, 2, 1], arch_ver="4.7")
    for i in range(3):
        single = rife.apply(
            params, f0[i : i + 1], f1[i : i + 1], ts[i : i + 1], [8, 4, 2, 1],
            arch_ver="4.7",
        )
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single[0]), rtol=1e-4, atol=1e-5
        )
