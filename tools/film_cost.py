"""Per-stage FLOP/byte census for FILM at 1080p (CPU, no TPU needed).

Splits film.apply into its four stages and runs XLA cost_analysis on each so
we know where the 417 ms/frame (2.4 f/s, round-2 TPU) can possibly go before
profiling on the chip. Run with:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/film_cost.py
"""
import os, sys, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench  # for _load_ref/_reference_params
from comfyui_frame_interpolation_tpu.models import film
from comfyui_frame_interpolation_tpu.models.common import cast_params, avg_pool2d
from comfyui_frame_interpolation_tpu.ops.warp import warp

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

    def stage_pyr(x0, x1):
        pyr_both = [jnp.concatenate([x0, x1], axis=0)]
        for _ in range(film.PYRAMID_LEVELS - 1):
            pyr_both.append(avg_pool2d(pyr_both[-1], 2, 2))
        return pyr_both

    pyr_both = jax.jit(stage_pyr)(x0, x1)
    print("pyramid:", cost(stage_pyr, x0, x1))

    def stage_feat(pyr_both):
        return film._extract_features(params["extract"], pyr_both)

    feat_both = jax.jit(stage_feat)(pyr_both)
    print("features:", cost(stage_feat, pyr_both))
    for i, f in enumerate(feat_both):
        print(f"  feat level {i}: {f.shape}")

    feat0 = [f[:n] for f in feat_both]
    feat1 = [f[n:] for f in feat_both]

    def stage_flow(feat0, feat1):
        pa = [jnp.concatenate([a, b], axis=0) for a, b in zip(feat0, feat1)]
        pb = [jnp.concatenate([b, a], axis=0) for a, b in zip(feat0, feat1)]
        return film._predict_flow(params["predict_flow"], pa, pb)

    res_both = jax.jit(stage_flow)(feat0, feat1)
    print("flow:", cost(stage_flow, feat0, feat1))

    pyr0 = [p[:n] for p in pyr_both]
    pyr1 = [p[n:] for p in pyr_both]

    def stage_warp(res_both, pyr0, pyr1, feat0, feat1):
        fwd_res = [r[:n] for r in res_both]
        bwd_res = [r[n:] for r in res_both]
        fwd_flow = film._flow_pyramid_synthesis(fwd_res)[: film.FUSION_PYRAMID_LEVELS]
        bwd_flow = film._flow_pyramid_synthesis(bwd_res)[: film.FUSION_PYRAMID_LEVELS]
        bwd_flow = [f * 0.5 for f in bwd_flow]
        fwd_flow = [f * 0.5 for f in fwd_flow]
        to_warp0 = [jnp.concatenate([pyr0[i], feat0[i]], axis=-1) for i in range(film.FUSION_PYRAMID_LEVELS)]
        to_warp1 = [jnp.concatenate([pyr1[i], feat1[i]], axis=-1) for i in range(film.FUSION_PYRAMID_LEVELS)]
        aligned = []
        for f0_, f1_, bf, ff in zip(to_warp0, to_warp1, bwd_flow, fwd_flow):
            nb = f0_.shape[0]
            both = warp(jnp.concatenate([f0_, f1_], axis=0), jnp.concatenate([bf, ff], axis=0))
            aligned.append(jnp.concatenate([both[:nb], both[nb:], bf, ff], axis=-1))
        return aligned

    aligned = jax.jit(stage_warp)(res_both, pyr0, pyr1, feat0, feat1)
    print("synth+warp:", cost(stage_warp, res_both, pyr0, pyr1, feat0, feat1))
    for i, a in enumerate(aligned):
        print(f"  aligned level {i}: {a.shape}")

    def stage_fuse(aligned):
        return film._fuse(params["fuse"], aligned)

    print("fusion:", cost(stage_fuse, aligned))

    def full(x0, x1):
        return film.apply(params, x0, x1)

    print("TOTAL:", cost(full, x0, x1))


if __name__ == "__main__":
    main()
