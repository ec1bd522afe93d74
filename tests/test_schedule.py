"""Schedule-expansion semantics tests (pure Python, no device needed).

Expected sequences are derived by hand from the reference loops:
``vfi_utils.py:149-389``, ``vfi_models/film/__init__.py:12-42,89-106``,
``vfi_models/stmfnet/__init__.py:58-83``.
"""

import math

import pytest

from comfyui_frame_interpolation_tpu.core.schedule import (
    InterpolationStateList,
    plan_bisection,
    plan_midpoint,
    plan_timestep,
    plan_window4,
    normalize_multipliers,
)


def seq(plan):
    """Render output as ['f0', 't0', ...] for easy comparison."""
    return [f"f{i}" if k == "orig" else f"t{i}" for k, i in plan.output]


# ---------------------------------------------------------------- timestep


def test_timestep_int_multiplier_basic():
    p = plan_timestep(3, 2)
    # f0 t(0.5) f1 t(0.5) f2
    assert seq(p) == ["f0", "t0", "f1", "t1", "f2"]
    assert [t.t for t in p.tasks] == [0.5, 0.5]
    assert [t.pair for t in p.tasks] == [0, 1]
    assert all(t.depth == 0 for t in p.tasks)


def test_timestep_multiplier_4_timesteps():
    p = plan_timestep(2, 4)
    assert [t.t for t in p.tasks] == [0.25, 0.5, 0.75]
    assert seq(p) == ["f0", "t0", "t1", "t2", "f1"]


def test_timestep_multiplier_1_no_tasks():
    p = plan_timestep(3, 1)
    assert p.tasks == []
    assert seq(p) == ["f0", "f1", "f2"]


def test_timestep_skip_list():
    states = InterpolationStateList([1], is_skip_list=True)
    p = plan_timestep(4, 2, states)
    # pair1 skipped: emits only f1
    assert seq(p) == ["f0", "t0", "f1", "f2", "t1", "f3"]
    assert [t.pair for t in p.tasks] == [0, 2]


def test_timestep_keep_list():
    states = InterpolationStateList([1], is_skip_list=False)
    p = plan_timestep(4, 2, states)
    assert [t.pair for t in p.tasks] == [1]
    assert seq(p) == ["f0", "f1", "t0", "f2", "f3"]


def test_timestep_list_multiplier_pad_with_2():
    # vfi_utils.py:364-366 — list right-padded with 2
    p = plan_timestep(4, [3])
    assert [t.pair for t in p.tasks] == [0, 0, 1, 2]
    assert [t.t for t in p.tasks] == [1 / 3, 2 / 3, 0.5, 0.5]


def test_timestep_list_multiplier_zero_drops_pair():
    # vfi_utils.py:370 — multiplier 0 skips the pair entirely (frame0 dropped)
    p = plan_timestep(4, [2, 0, 2])
    assert seq(p) == ["f0", "t0", "f2", "t1", "f3"]


def test_timestep_list_multiplier_zero_last_pair_drops_final_frame():
    # reference quirk: last pair m==0 → final frame never appended
    p = plan_timestep(3, [2, 0])
    assert seq(p) == ["f0", "t0"]


def test_timestep_list_multiplier_one():
    p = plan_timestep(3, [1, 2])
    assert seq(p) == ["f0", "f1", "t0", "f2"]


def test_normalize_multipliers():
    assert normalize_multipliers(3, 4) == [3, 3, 3, 3]
    assert normalize_multipliers([5], 3) == [5, 2, 2]
    assert normalize_multipliers([1, 2, 3, 4], 2) == [1, 2]


# ---------------------------------------------------------------- midpoint


def test_midpoint_m2():
    p = plan_midpoint(2, 2)
    assert seq(p) == ["f0", "t0", "f1"]
    t = p.tasks[0]
    assert t.t is None and t.src0 == ("orig", 0) and t.src1 == ("orig", 1)


def test_midpoint_m4_ordering():
    # n=3: mid computed (t0), halves each n=1 → [t1, t0, t2]
    p = plan_midpoint(2, 4)
    assert seq(p) == ["f0", "t1", "t0", "t2", "f1"]
    t0, t1, t2 = p.tasks
    assert t0.src0 == ("orig", 0) and t0.src1 == ("orig", 1) and t0.depth == 0
    assert t1.src0 == ("orig", 0) and t1.src1 == ("task", 0) and t1.depth == 1
    assert t2.src0 == ("task", 0) and t2.src1 == ("orig", 1) and t2.depth == 1


def test_midpoint_m3_even_n_discards_middle_from_output():
    # n=2: mid computed (t0) but NOT emitted; halves emit t1, t2
    p = plan_midpoint(2, 3)
    assert seq(p) == ["f0", "t1", "t2", "f1"]
    assert len(p.tasks) == 3  # t0 still computed as shared endpoint


def test_midpoint_m5():
    # n=4 → rec: t0 mid; first half n=2 → [t2,t3] (t1 unemitted); second n=2 → [t5,t6]
    p = plan_midpoint(2, 5)
    assert seq(p) == ["f0", "t2", "t3", "t5", "t6", "f1"]
    assert len(p.tasks) == 7
    # levels: t0 | t1, t4 | t2, t3, t5, t6
    levels = p.levels
    assert [t.id for t in levels[0]] == [0]
    assert sorted(t.id for t in levels[1]) == [1, 4]
    assert sorted(t.id for t in levels[2]) == [2, 3, 5, 6]


def test_midpoint_skip():
    states = InterpolationStateList([0], is_skip_list=True)
    p = plan_midpoint(3, 2, states)
    assert seq(p) == ["f0", "f1", "t0", "f2"]


# ---------------------------------------------------------------- bisection


def test_bisection_m2():
    p = plan_bisection(2, 2)
    assert seq(p) == ["f0", "t0", "f1"]
    assert p.tasks[0].t == 0.5


def test_bisection_m4_order_and_dts():
    # splits = [0, 1/4, 2/4, 3/4, 1]; first insert 1/2 (dt .5 vs f0..f1),
    # then 1/4 (dt .5 in [0, 1/2]) — first-minimal row-major tie-break,
    # then 3/4 (dt .5 in [1/2, 1]).
    p = plan_bisection(2, 4)
    t0, t1, t2 = p.tasks
    assert (t0.src0, t0.src1, t0.t) == (("orig", 0), ("orig", 1), 0.5)
    assert (t1.src0, t1.src1, t1.t) == (("orig", 0), ("task", 0), 0.5)
    assert (t2.src0, t2.src1, t2.t) == (("task", 0), ("orig", 1), 0.5)
    assert seq(p) == ["f0", "t1", "t0", "t2", "f1"]
    assert [t.depth for t in p.tasks] == [0, 1, 1]


def test_bisection_m3_dts():
    # splits = [0, 1/3, 2/3, 1]; both remaining points are equally off-center in
    # [0,1] (|1/3-1/2| = |2/3-1/2|) → row-major picks 1/3 first (dt=1/3);
    # then 2/3 sits in gap [1/3, 1] at relative 0.5.
    p = plan_bisection(2, 3)
    t0, t1 = p.tasks
    assert t0.src0 == ("orig", 0) and t0.src1 == ("orig", 1)
    assert abs(t0.t - 1 / 3) < 1e-12
    assert t1.src0 == ("task", 0) and t1.src1 == ("orig", 1)
    assert abs(t1.t - 0.5) < 1e-12
    assert seq(p) == ["f0", "t0", "t1", "f1"]


def test_bisection_skip_drops_frame():
    # film/__init__.py:89-91 — skipped pairs contribute nothing, not even frame0
    states = InterpolationStateList([0], is_skip_list=True)
    p = plan_bisection(3, 2, states)
    assert seq(p) == ["f1", "t0", "f2"]


def test_bisection_multiplier_list():
    p = plan_bisection(3, [2, 3])
    assert seq(p) == ["f0", "t0", "f1", "t1", "t2", "f2"]


# ---------------------------------------------------------------- window4


def test_window4_basic():
    p = plan_window4(4)
    assert seq(p) == ["f0", "f1", "t0", "f2", "f3"]
    assert p.tasks[0].pair == 0


def test_window4_longer():
    p = plan_window4(6)
    assert seq(p) == ["f0", "f1", "t0", "f2", "t1", "f3", "t2", "f4", "f5"]
    assert [t.pair for t in p.tasks] == [0, 1, 2]


def test_window4_duplicate_first_last():
    p = plan_window4(4, duplicate_first_last_frames=True)
    assert seq(p) == ["f0", "f0", "f1", "t0", "f2", "f3", "f3"]


def test_window4_skip_requires_both_pairs():
    states = InterpolationStateList([0], is_skip_list=True)
    p = plan_window4(5, states=states)  # window0 needs pairs 0 AND 1 skipped
    assert seq(p) == ["f0", "f1", "t0", "f2", "t1", "f3", "f4"]

    states2 = InterpolationStateList([0, 1], is_skip_list=True)
    p2 = plan_window4(5, states=states2)
    # window0 skipped (incl. its first-window framing); window1 needs pairs 1,2
    assert seq(p2) == ["t0", "f3", "f4"]


def test_window4_too_few_frames():
    with pytest.raises(ValueError):
        plan_window4(3)


# ---------------------------------------------------------------- states


def test_state_list_semantics():
    skip = InterpolationStateList([1, 2], True)
    assert not skip.is_frame_skipped(0)
    assert skip.is_frame_skipped(1)
    keep = InterpolationStateList([1, 2], False)
    assert keep.is_frame_skipped(0)
    assert not keep.is_frame_skipped(1)
    assert InterpolationStateList.from_string("1,2", True).frame_indices == [1, 2]


def test_run_plan_pair_cached_matches_run_plan():
    """The pair-cached executor must be output-identical to run_plan for a
    split model (reuse independent of t)."""
    import jax.numpy as jnp

    from comfyui_frame_interpolation_tpu.core.loop import (
        run_plan, run_plan_pair_cached,
    )
    from comfyui_frame_interpolation_tpu.core.schedule import plan_timestep

    frames = jnp.arange(4 * 2 * 3 * 1, dtype=jnp.float32).reshape(4, 2, 3, 1)

    def model_fn(f0, f1, t):
        return f0 * 0.25 + f1 * 0.5 + t[:, None, None, None]

    def reuse_fn(f0, f1):
        return {"a": f0 * 0.25, "b": f1 * 0.5}

    def infer_fn(f0, f1, cache, t):
        return cache["a"] + cache["b"] + t[:, None, None, None]

    states = InterpolationStateList([1], is_skip_list=True)
    for mult, st in ((2, None), (4, states), ([2, 3, 4], None)):
        plan = plan_timestep(4, mult, st)
        a = run_plan(frames, plan, model_fn, batch_size=2)
        b = run_plan_pair_cached(frames, plan, reuse_fn, infer_fn, batch_size=2)
        assert jnp.allclose(a, b), mult
