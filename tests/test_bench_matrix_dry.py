"""Trace-only dry run of every bench-matrix family.

``bench.py --metric matrix`` is the committed TPU artifact; a family whose
bench function raises degrades to an ERROR row, and nothing used to catch
that without a chip (round 3 found bench_amt/bench_eisai broken only when
the TPU matrix ran). This walks every family with the measurement helpers
patched to ``jax.eval_shape`` — full model build (reference torch arch →
converted params → ``make_model_fn``) plus abstract tracing at the bench
resolution, no compute and no Mosaic compiles.
"""

import sys

import jax
import jax.numpy as jnp
import pytest

import bench


@pytest.fixture()
def dry_bench(monkeypatch):
    def dry_measure(fn, *args, **kw):
        leaves = jax.tree_util.tree_leaves(jax.eval_shape(fn, *args))
        assert leaves, "model fn returned nothing"
        return 1.0

    def dry_pair(model_fn, batch, height, width, iters=5, tag=None):
        f0 = bench._rand_frames(batch, height, width, 0)
        f1 = bench._rand_frames(batch, height, width, 1)
        t = jnp.full((batch,), 0.5, jnp.float32)
        dry_measure(model_fn, f0, f1, t)
        bench._LAST_COMPILE_S["value"] = 0.0
        return float(batch)

    monkeypatch.setattr(bench, "_measure_pair_model", dry_pair)
    import comfyui_frame_interpolation_tpu.utils.benchmark as B

    monkeypatch.setattr(B, "measure", dry_measure)
    return dry_pair


@pytest.mark.slow
@pytest.mark.parametrize("family", sorted(bench._RES))
def test_family_bench_traces(dry_bench, family):
    fps = getattr(bench, f"bench_{family}")()
    assert fps > 0


@pytest.mark.slow
def test_rife_bench_traces(dry_bench):
    from comfyui_frame_interpolation_tpu.models import rife

    params = rife.init_params(jax.random.PRNGKey(0), "4.7")
    fn = rife.make_model_fn(
        params, "4.7", scale_factor=1.0, fastmode=True, ensemble=False,
        dtype=jnp.bfloat16,
    )
    f0 = bench._rand_frames(2, 1080, 1920, 0)
    t = jnp.full((2,), 0.5, jnp.float32)
    jax.eval_shape(fn, f0, f0, t)
