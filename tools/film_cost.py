"""Per-stage FLOP/byte census for FILM at 1080p (CPU, no TPU needed).

Splits film.apply into its stages (the same ``film.stage_*`` functions
``bench.py --metric filmstages`` times on-chip) and runs XLA cost_analysis on
each, so optimization targets measured FLOP/byte shares. Run with:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/film_cost.py
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # for _load_ref/_reference_params
from comfyui_frame_interpolation_tpu.models import film
from comfyui_frame_interpolation_tpu.models.common import cast_params

BATCH = int(os.environ.get("B", "1"))
H, W = 1088, 1920  # padded 1080p
DTYPE = jnp.bfloat16


def cost(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    c = lowered.compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return {
        "gflops": round(c.get("flops", 0) / 1e9, 2),
        "gbytes": round(c.get("bytes accessed", 0) / 1e9, 3),
    }


def main():
    params = bench._reference_params(
        lambda: bench._load_ref("vfi_models/film/film_arch.py", "bench_film_arch").Interpolator()
    )
    params = cast_params(params, DTYPE)
    x0 = jnp.zeros((BATCH, H, W, 3), DTYPE)
    x1 = jnp.zeros((BATCH, H, W, 3), DTYPE)
    n = BATCH

    pyr_both = jax.jit(film.stage_pyramid)(x0, x1)
    print("pyramid:", cost(film.stage_pyramid, x0, x1))

    def stage_feat(pyr_both):
        return film.stage_features(params, pyr_both)

    feat_both = jax.jit(stage_feat)(pyr_both)
    print("features:", cost(stage_feat, pyr_both))
    for i, f in enumerate(feat_both):
        print(f"  feat level {i}: {f.shape}")

    def stage_flow(feat_both):
        return film.stage_flow(params, feat_both, n)

    flows = jax.jit(stage_flow)(feat_both)
    print("flow:", cost(stage_flow, feat_both))

    def stage_warp(pyr_both, feat_both, flows):
        return film.stage_warp(pyr_both, feat_both, flows[0], flows[1], n)

    aligned = jax.jit(stage_warp)(pyr_both, feat_both, flows)
    print("warp:", cost(stage_warp, pyr_both, feat_both, flows))
    for i, parts in enumerate(aligned):
        chans = [p.shape[-1] for p in parts]
        print(f"  aligned level {i}: {parts[0].shape[:3]} parts {chans}")

    def stage_fuse(aligned):
        return film.stage_fuse(params, aligned)

    print("fusion:", cost(stage_fuse, aligned))

    def full(x0, x1):
        return film.apply(params, x0, x1)

    print("TOTAL:", cost(full, x0, x1))


if __name__ == "__main__":
    main()
