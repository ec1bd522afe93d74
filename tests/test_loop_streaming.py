"""Streaming executor parity: bounded-HBM mode must be bit-identical to the
resident path for every plan shape (flat timestep, recursive midpoint,
bisection) — same chunking, same padding, same jitted callable."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfyui_frame_interpolation_tpu.core.loop import run_plan
from comfyui_frame_interpolation_tpu.core.schedule import (
    InterpolationStateList,
    plan_bisection,
    plan_midpoint,
    plan_timestep,
)


@jax.jit
def _blend(f0, f1, t):
    t = t[:, None, None, None]
    return (f0 * (1.0 - t) + f1 * t + 0.01 * f0 * f1).astype(jnp.float32)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    return rng.random((9, 16, 24, 3)).astype(np.float32)


def _compare(frames, plan, batch_size):
    dense = np.asarray(
        run_plan(jnp.asarray(frames), plan, _blend, batch_size=batch_size)
    )
    streamed = run_plan(
        frames, plan, _blend, batch_size=batch_size, hbm_budget_bytes=1
    )
    assert isinstance(streamed, np.ndarray)  # host-resident output
    np.testing.assert_array_equal(dense, streamed)


def test_streaming_matches_dense_timestep(frames):
    _compare(frames, plan_timestep(len(frames), 4), batch_size=4)


def test_streaming_matches_dense_timestep_list(frames):
    plan = plan_timestep(len(frames), [3, 0, 2, 5, 1])
    _compare(frames, plan, batch_size=3)


def test_streaming_matches_dense_with_skips(frames):
    states = InterpolationStateList([1, 4], is_skip_list=True)
    _compare(frames, plan_timestep(len(frames), 3, states), batch_size=4)


def test_streaming_matches_dense_midpoint(frames):
    # recursive plan: produced frames are consumed by later levels, so the
    # device-buffer retirement logic is exercised
    _compare(frames, plan_midpoint(len(frames), 8), batch_size=4)


def test_streaming_matches_dense_bisection(frames):
    _compare(frames, plan_bisection(len(frames), 5), batch_size=4)


def test_resident_path_untouched_for_small_clips(frames):
    out = run_plan(jnp.asarray(frames), plan_timestep(len(frames), 2), _blend)
    assert isinstance(out, jnp.ndarray)
