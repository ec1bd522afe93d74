"""Gradually_More_Denoise_KSampler orchestration semantics (reference
other_nodes.py:40-88) with an injected fake sampler."""

import numpy as np
import pytest
import jax.numpy as jnp

from comfyui_frame_interpolation_tpu.nodes import NODE_CLASS_MAPPINGS

KS = NODE_CLASS_MAPPINGS["KSampler Gradually Adding More Denoise (efficient)"]


@pytest.fixture(autouse=True)
def _reset_sampler():
    old = KS._sampler_fn
    yield
    KS._sampler_fn = old


def test_denoise_schedule_and_packing():
    calls = []

    def fake_sampler(model, seed, steps, cfg, sampler_name, scheduler,
                     positive, negative, latent, denoise):
        calls.append(denoise)
        return {"samples": latent["samples"] + denoise}

    KS.set_sampler(fake_sampler)
    node = KS()
    lat = {"samples": jnp.zeros((2, 4, 8, 8))}
    out = node.sample(
        model="m", positive="p", negative="n", latent_image=lat,
        start_denoise=0.1, denoise_increment=0.2, denoise_increment_steps=3,
    )
    # per latent sample: denoise 0.1, 0.3, 0.5; two samples -> 6 outputs
    assert np.allclose(calls, [0.1, 0.3, 0.5, 0.1, 0.3, 0.5])
    samples = np.asarray(out[3]["samples"])
    assert samples.shape == (6, 4, 8, 8)
    assert np.allclose(samples[:, 0, 0, 0], [0.1, 0.3, 0.5, 0.1, 0.3, 0.5])
    assert out[0] == "m" and out[1] == "p" and out[2] == "n"


def test_denoise_over_one_rejected():
    node = KS()
    with pytest.raises(Exception, match="can't over 1.0"):
        node.sample(
            model="m", positive="p", negative="n",
            latent_image={"samples": jnp.zeros((1, 4, 8, 8))},
            start_denoise=0.5, denoise_increment=0.1,
            denoise_increment_steps=10,
        )


def test_unbound_sampler_errors():
    KS._sampler_fn = None
    node = KS()
    with pytest.raises(RuntimeError, match="set_sampler"):
        node.sample(
            model="m", positive="p", negative="n",
            latent_image={"samples": jnp.zeros((1, 4, 8, 8))},
            start_denoise=0.0, denoise_increment=0.1,
            denoise_increment_steps=3,
        )
