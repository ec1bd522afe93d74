"""Checkpoint conversion tests: torch pickles, nested containers, and
TorchScript archives (the FILM ``film_net_fp32.pt`` format — reference
``film/__init__.py:74`` loads it via ``torch.jit.load``)."""

import os

import numpy as np
import pytest
import torch

from comfyui_frame_interpolation_tpu.utils.ckpt import (
    flatten_tree,
    is_torchscript_archive,
    load_npz,
    load_torch_state_dict,
    nest_state_dict,
    save_npz,
)

from conftest import has_reference, load_reference_module


class _Small(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = torch.nn.Conv2d(3, 4, 3, padding=1)
        self.head = torch.nn.Sequential(torch.nn.Conv2d(4, 2, 1))

    def forward(self, x):
        return self.head(self.conv(x))


def test_plain_pickle_roundtrip(tmp_path):
    m = _Small()
    path = tmp_path / "m.pth"
    torch.save(m.state_dict(), path)
    tree = load_torch_state_dict(str(path))
    assert not is_torchscript_archive(str(path))
    np.testing.assert_allclose(
        tree["conv"]["weight"], m.conv.weight.detach().numpy()
    )
    np.testing.assert_allclose(
        tree["head"]["0"]["bias"], m.head[0].bias.detach().numpy()
    )


def test_nested_container(tmp_path):
    m = _Small()
    path = tmp_path / "m.pth"
    torch.save({"state_dict": {f"module.{k}": v for k, v in m.state_dict().items()}}, path)
    tree = load_torch_state_dict(str(path))
    np.testing.assert_allclose(
        tree["conv"]["weight"], m.conv.weight.detach().numpy()
    )


def test_torchscript_archive_scripted(tmp_path):
    """A torch.jit.script()ed module saved as a .pt archive converts with the
    same key space as the eager state dict (the FILM crash repro)."""
    m = _Small()
    path = tmp_path / "scripted.pt"
    torch.jit.script(m).save(str(path))
    assert is_torchscript_archive(str(path))
    tree = load_torch_state_dict(str(path))
    eager = nest_state_dict(m.state_dict())
    assert sorted(flatten_tree(tree)) == sorted(flatten_tree(eager))
    np.testing.assert_allclose(
        tree["conv"]["weight"], m.conv.weight.detach().numpy()
    )


def test_torchscript_archive_traced(tmp_path):
    m = _Small()
    path = tmp_path / "traced.pt"
    torch.jit.trace(m, torch.zeros(1, 3, 8, 8)).save(str(path))
    assert is_torchscript_archive(str(path))
    tree = load_torch_state_dict(str(path))
    np.testing.assert_allclose(
        tree["head"]["0"]["weight"], m.head[0].weight.detach().numpy()
    )


def test_npz_roundtrip(tmp_path):
    m = _Small()
    tree = nest_state_dict(m.state_dict())
    path = tmp_path / "m.npz"
    save_npz(tree, str(path))
    back = load_npz(str(path))
    assert sorted(flatten_tree(back)) == sorted(flatten_tree(tree))
    np.testing.assert_allclose(
        back["conv"]["weight"], tree["conv"]["weight"]
    )


@pytest.mark.slow
@pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
def test_film_torchscript_keyspace(tmp_path):
    """Trace the reference FILM Interpolator through TorchScript and verify the
    archive's state-dict key space is exactly the film_arch naming that
    ``models/film.apply`` indexes — validating the real ``film_net_fp32.pt``
    load path end-to-end without network access."""
    import jax.numpy as jnp

    from comfyui_frame_interpolation_tpu.models import film
    from comfyui_frame_interpolation_tpu.utils.ckpt import to_jax_tree

    arch = load_reference_module("vfi_models/film/film_arch.py", "ckpt_film_arch")
    torch.manual_seed(0)
    model = arch.Interpolator().eval()
    x0 = torch.rand(1, 3, 64, 96)
    x1 = torch.rand(1, 3, 64, 96)
    dt = torch.full((1, 1), 0.5)
    with torch.no_grad():
        traced = torch.jit.trace(model, (x0, x1, dt))
        ref_out = model(x0, x1, dt)
    path = tmp_path / "film_net_fp32.pt"
    traced.save(str(path))
    assert is_torchscript_archive(str(path))

    tree = load_torch_state_dict(str(path))
    eager_keys = sorted(nest_state_dict(model.state_dict()).keys())
    assert sorted(tree.keys()) == eager_keys  # extract / predict_flow / fuse

    params = to_jax_tree(tree)
    out = film.apply(
        params,
        jnp.asarray(x0.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(x1.permute(0, 2, 3, 1).numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(out),
        ref_out.permute(0, 2, 3, 1).numpy(),
        atol=2e-4,
        rtol=1e-3,
    )


def test_cli_converts_to_npz_and_orbax(tmp_path):
    torch = pytest.importorskip("torch")
    from comfyui_frame_interpolation_tpu.utils.ckpt import (
        load_npz, load_orbax, main,
    )

    sd = {
        "module.enc.0.weight": torch.arange(12.0).reshape(3, 4),
        "module.enc.0.bias": torch.zeros(3),
        "head.weight": torch.ones(2, 3),
    }
    src = tmp_path / "model.pth"
    torch.save({"state_dict": sd}, str(src))

    dst_npz = tmp_path / "model.npz"
    assert main([str(src), str(dst_npz)]) == 0
    tree = load_npz(str(dst_npz))
    assert tree["enc"]["0"]["weight"].shape == (3, 4)
    np.testing.assert_array_equal(tree["head"]["weight"], np.ones((2, 3)))

    dst_orbax = tmp_path / "model_orbax"
    assert main([str(src), str(dst_orbax)]) == 0
    tree2 = load_orbax(str(dst_orbax))
    np.testing.assert_array_equal(
        tree2["enc"]["0"]["weight"], tree["enc"]["0"]["weight"]
    )
