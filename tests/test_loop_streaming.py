"""Streaming executor parity: bounded-HBM mode must be bit-identical to the
resident path for every executor and plan shape (flat timestep, recursive
midpoint, bisection, 4-frame window, pair-cached) — same chunking, same
padding, same jitted callable."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comfyui_frame_interpolation_tpu.core.loop import (
    run_plan,
    run_plan_pair_cached,
    run_plan_window4,
)
from comfyui_frame_interpolation_tpu.core.schedule import (
    InterpolationStateList,
    plan_bisection,
    plan_midpoint,
    plan_timestep,
    plan_window4,
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


@jax.jit
def _window_blend(f0, f1, f2, f3):
    # STMFNet-shaped interface: consume the full 4-frame window
    return (0.1 * f0 + 0.4 * f1 + 0.4 * f2 + 0.1 * f3).astype(jnp.float32)


def test_window4_streaming_matches_dense(frames):
    for dup in (False, True):
        plan = plan_window4(len(frames), duplicate_first_last_frames=dup)
        dense = np.asarray(
            run_plan_window4(
                jnp.asarray(frames), plan, _window_blend, batch_size=3
            )
        )
        streamed = run_plan_window4(
            frames, plan, _window_blend, batch_size=3, hbm_budget_bytes=1
        )
        assert isinstance(streamed, np.ndarray)
        np.testing.assert_array_equal(dense, streamed)


def test_window4_streaming_with_skips(frames):
    states = InterpolationStateList([2, 3], is_skip_list=True)
    plan = plan_window4(len(frames), states=states)
    dense = np.asarray(
        run_plan_window4(jnp.asarray(frames), plan, _window_blend, batch_size=4)
    )
    streamed = run_plan_window4(
        frames, plan, _window_blend, batch_size=4, hbm_budget_bytes=1
    )
    np.testing.assert_array_equal(dense, streamed)


def _reuse(f0, f1):
    # GMFSS-shaped interface: timestep-invariant per-pair state (e.g. flow)
    return {"flow": (f1 - f0) * 0.5, "metric": f0 * f1}


@jax.jit
def _infer(f0, f1, cache, t):
    t = t[:, None, None, None]
    return (
        f0 * (1.0 - t) + f1 * t + cache["flow"] * t + 0.01 * cache["metric"]
    ).astype(jnp.float32)


def test_pair_cached_streaming_matches_dense(frames):
    for mult in (4, [3, 0, 2, 5, 1, 2, 2, 2]):
        plan = plan_timestep(len(frames), mult)
        dense = np.asarray(
            run_plan_pair_cached(
                jnp.asarray(frames), plan, _reuse, _infer, batch_size=3
            )
        )
        streamed = run_plan_pair_cached(
            frames, plan, _reuse, _infer, batch_size=3, hbm_budget_bytes=1
        )
        assert isinstance(streamed, np.ndarray)
        np.testing.assert_array_equal(dense, streamed)


def test_long_clip_bounded_budget():
    """A 500-frame clip through both streaming executors under a budget that
    could never hold the clip resident (the VERDICT long-clip criterion,
    scaled to CPU-test frame sizes: the budget admits ~25 frames of the
    ~1000-frame working set)."""
    rng = np.random.default_rng(11)
    frames = rng.random((500, 8, 16, 3)).astype(np.float32)
    frame_bytes = 8 * 16 * 3 * 4
    budget = 100 * frame_bytes  # max_resident = budget // (4*fb) = 25 frames

    plan = plan_window4(len(frames))
    out = run_plan_window4(
        frames, plan, _window_blend, batch_size=4, hbm_budget_bytes=budget
    )
    assert isinstance(out, np.ndarray) and len(out) == len(plan.output)

    plan = plan_timestep(len(frames), 2)
    out = run_plan_pair_cached(
        frames, plan, _reuse, _infer, batch_size=8, hbm_budget_bytes=budget
    )
    assert isinstance(out, np.ndarray) and len(out) == len(plan.output)


def test_pair_cached_streaming_in_flight_bounded(monkeypatch, frames):
    """Regression: the pair-cached streaming executor must flush D2H inside the
    per-pair timestep loop — a multiplier-m pair otherwise holds m*batch device
    buffers, defeating the HBM bound (found holding ~m*batch in review)."""
    from comfyui_frame_interpolation_tpu.core import loop

    peak = {"v": 0}
    orig_add = loop._StreamOut.add

    def add(self, tid, arr):
        orig_add(self, tid, arr)
        peak["v"] = max(peak["v"], len(self.in_flight))

    monkeypatch.setattr(loop._StreamOut, "add", add)
    batch = 2
    plan = plan_timestep(len(frames), 50)  # 49 timesteps per pair
    out = run_plan_pair_cached(
        frames, plan, _reuse, _infer, batch_size=batch, hbm_budget_bytes=1
    )
    assert isinstance(out, np.ndarray)
    # keep_last=batch in flight + one freshly-added chunk
    assert peak["v"] <= 2 * batch, peak["v"]
