"""FILM Interpolator numerical parity vs the reference torch port
(``vfi_models/film/film_arch.py``) with random weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import film
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def ref_film():
    return load_reference_module("vfi_models/film/film_arch.py", "ref_film_arch")


@pytest.mark.parametrize("hw", [(128, 128), (96, 160)])
def test_film_parity(ref_film, hw):
    torch.manual_seed(0)
    model = ref_film.Interpolator().eval()
    h, w = hw
    b = 1
    x0 = torch.rand(b, 3, h, w)
    x1 = torch.rand(b, 3, h, w)
    dt = x0.new_full((b, 1), 0.5)
    with torch.no_grad():
        ref_out = model(x0, x1, dt)

    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = film.apply(
        params,
        jnp.asarray(x0.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(x1.numpy().transpose(0, 2, 3, 1)),
    )
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_nchw, ref_out.numpy(), rtol=1e-3, atol=5e-4)


def test_film_odd_sizes(ref_film):
    """Non-64-multiple input (the node feeds native resolution)."""
    torch.manual_seed(1)
    model = ref_film.Interpolator().eval()
    x0 = torch.rand(1, 3, 68, 92)
    x1 = torch.rand(1, 3, 68, 92)
    dt = x0.new_full((1, 1), 0.5)
    with torch.no_grad():
        ref_out = model(x0, x1, dt)
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = film.apply(
        params,
        jnp.asarray(x0.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(x1.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(), rtol=1e-3, atol=5e-4
    )
