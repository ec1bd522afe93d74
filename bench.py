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
import functools
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 25.0  # estimated reference cupy-backend A100 1080p 2x
# rough A100 ESTIMATES for the heavier synthesis models (nothing published;
# scaled from RIFE by the reference models' relative cost on GPU). Emitted
# with "baseline_estimated": true so the denominators are not mistaken for
# measured reference numbers.
SECONDARY_BASELINES = {
    "film": 8.0, "m2m": 12.0, "ifrnet": 20.0, "sepconv": 2.0, "flavr": 4.0,
    # stmfnet: 1080p estimate was 2.0; the committed row runs 540p (1080p
    # and 720p crash the axon compile helper) so the denominator is
    # pixel-scaled 4x
    "gmfss": 4.0, "stmfnet": 8.0, "atm": 3.0, "eisai": 3.0, "cain": 10.0,
    "ifunet": 8.0, "amt": 6.0, "xvfi": 4.0, "momo": 0.5,
}


def _rand_frames(batch, height, width, seed=0):
    rng = np.random.default_rng(seed)
    return jax.device_put(
        jnp.asarray(rng.random((batch, height, width, 3), np.float32))
    )


def bench_rife(height=1080, width=1920, batch=8, iters=10, dtype=jnp.bfloat16):
    from comfyui_frame_interpolation_tpu.models import rife
    from comfyui_frame_interpolation_tpu.utils.benchmark import measure
    from comfyui_frame_interpolation_tpu.utils.profiling import maybe_profile

    params = rife.init_params(jax.random.PRNGKey(0), "4.7")
    model_fn = rife.make_model_fn(
        params, "4.7", scale_factor=1.0, fastmode=True, ensemble=False, dtype=dtype
    )
    f0 = _rand_frames(batch, height, width, 0)
    f1 = _rand_frames(batch, height, width, 1)
    t = jnp.full((batch,), 0.5, jnp.float32)
    import time

    t0 = time.perf_counter()
    float(jnp.sum(model_fn(f0, f1, t)))  # cold compile (or cache hit) + warm
    _LAST_COMPILE_S["value"] = round(time.perf_counter() - t0, 1)
    with maybe_profile("bench_rife"):
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


_LAST_COMPILE_S = {"value": None}  # cold-compile seconds of the last bench


def _measure_pair_model(model_fn, batch, height, width, iters=5, tag=None):
    import time

    from comfyui_frame_interpolation_tpu.utils.benchmark import measure
    from comfyui_frame_interpolation_tpu.utils.profiling import maybe_profile

    if tag is None:  # default the trace dir to the calling bench_* function
        tag = sys._getframe(1).f_code.co_name
    f0 = _rand_frames(batch, height, width, 0)
    f1 = _rand_frames(batch, height, width, 1)
    t = jnp.full((batch,), 0.5, jnp.float32)
    t0 = time.perf_counter()
    float(jnp.sum(model_fn(f0, f1, t)))  # cold compile (or cache hit) + warm
    _LAST_COMPILE_S["value"] = round(time.perf_counter() - t0, 1)
    with maybe_profile(tag):
        sec = measure(model_fn, f0, f1, t, iters=iters)
    return batch / sec


def _measure_pair_split_model(reuse_fn, infer_fn, batch, height, width,
                              iters=5, tag=None):
    """Measure the pair-cached node path (run_plan_pair_cached): reuse_fn once
    per pair + infer_fn once per timestep, chained per measured call — i.e.
    the 2x-interpolation cost of the path the node classes actually execute.

    This exists because ONE family (EISAI) compiles pathologically as a
    single monolithic XLA program (0.22 f/s) while the exact same compute
    split at the node's reuse/infer boundary runs at ~8 f/s — see
    docs/PROBES_r5.md; benches must measure the shipped path."""
    import time

    from comfyui_frame_interpolation_tpu.utils.benchmark import measure
    from comfyui_frame_interpolation_tpu.utils.profiling import maybe_profile

    if tag is None:
        tag = sys._getframe(1).f_code.co_name
    f0 = _rand_frames(batch, height, width, 0)
    f1 = _rand_frames(batch, height, width, 1)
    t = jnp.full((batch,), 0.5, jnp.float32)

    def chain(a, b, tt):
        return infer_fn(a, b, reuse_fn(a, b), tt)

    t0 = time.perf_counter()
    float(jnp.sum(chain(f0, f1, t)))  # cold compile (or cache hit) + warm
    _LAST_COMPILE_S["value"] = round(time.perf_counter() - t0, 1)
    with maybe_profile(tag):
        sec = measure(chain, f0, f1, t, iters=iters)
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


def _install_vfi_utils_stub():
    """Ensure a ``vfi_utils`` stub with EVERY name the reference arch files
    import at module scope (atm/__init__.py:7 pulls four of them). Updates an
    already-installed thinner stub in place — the r4 battery hit an
    ImportError when atm ran after a builder that had installed a stub with
    only ``get_ckpt_container_path``."""
    import types

    vu = sys.modules.get("vfi_utils")
    if vu is None:
        vu = types.ModuleType("vfi_utils")
        sys.modules["vfi_utils"] = vu
    if not hasattr(vu, "get_ckpt_container_path"):
        vu.get_ckpt_container_path = lambda mt: "/tmp/ckpts"
    if not hasattr(vu, "load_file_from_github_release"):
        vu.load_file_from_github_release = lambda *a, **k: None
    if not hasattr(vu, "InterpolationStateList"):
        vu.InterpolationStateList = type("InterpolationStateList", (), {})
    if not hasattr(vu, "preprocess_frames"):
        vu.preprocess_frames = lambda frames: frames
    if not hasattr(vu, "postprocess_frames"):
        vu.postprocess_frames = lambda frames: frames
    return vu


def bench_film(batch=2):
    # batch=2, not 4: the composed 1080p batch-4 FILM program crashes the
    # axon remote compile helper (HTTP 500, subprocess exit 1) in every r4
    # attempt — before AND after the grouped-parts op-count reduction — while
    # batch 2 compiles and measures (batchsweep r4: b2 2.96 f/s; rife showed
    # b8 == b16 throughput, so the batch-4 penalty is small).
    from comfyui_frame_interpolation_tpu.models import film

    def build():
        return _load_ref(
            "vfi_models/film/film_arch.py", "bench_film_arch"
        ).Interpolator()

    params = _reference_params(build)
    return _measure_pair_model(
        film.make_model_fn(params, dtype=jnp.bfloat16), batch, 1080, 1920,
        tag="bench_film",
    )


def bench_m2m(batch=2):
    # Random weights produce unbounded flows, so the masked-residual XLA
    # scatter would dominate and the number would measure the residual, not
    # the engine. Real checkpoints' flows sit inside the displacement bands
    # (fy in [-88, 80), fx in [-384, 384) — exact, no residual), so benchmark
    # the banded kernel path; band/residual EQUIVALENCE is asserted on real
    # flow patterns by tests/test_pallas_kernels.py::TestSoftsplatPallas.
    # Set-and-restore so the forced mode doesn't leak into later benchmarks
    # in the same process (gmfss/eisai also dispatch on CFI_TPU_SPLAT).
    prev = os.environ.get("CFI_TPU_SPLAT")
    os.environ["CFI_TPU_SPLAT"] = "pallas"
    try:
        from comfyui_frame_interpolation_tpu.models import m2m

        def build():
            return _load_ref(
                "vfi_models/m2m/M2M_arch.py", "bench_m2m_arch"
            ).M2M_PWC()

        params = _reference_params(build)
        return _measure_pair_model(
            m2m.make_model_fn(params, dtype=jnp.bfloat16), batch, 1080, 1920
        )
    finally:
        if prev is None:
            os.environ.pop("CFI_TPU_SPLAT", None)
        else:
            os.environ["CFI_TPU_SPLAT"] = prev


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


def _tests_dir_importable():
    """Make tests/ importable WITHOUT pinning JAX to CPU: CFI_TEST_TPU=1 makes
    tests/conftest.py leave the platform alone (see conftest docstring)."""
    os.environ["CFI_TEST_TPU"] = "1"
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
    if d not in sys.path:
        sys.path.insert(0, d)


def bench_gmfss(batch=1):
    # Force the banded Pallas splat like bench_m2m does (and for the same
    # reason): random weights produce unbounded flows, so the masked-residual
    # XLA scatter would dominate and the number would measure the residual,
    # not the engine — r4 slowstages attributed 3.6 s of GMFSS's 3.9 s/frame
    # to the 12-splat infer half under auto dispatch. Real checkpoints'
    # flows sit inside the displacement bands; band/residual EQUIVALENCE is
    # asserted on real flow patterns by tests/test_pallas_kernels.py.
    prev = os.environ.get("CFI_TPU_SPLAT")
    os.environ["CFI_TPU_SPLAT"] = "pallas"
    try:
        _tests_dir_importable()
        import torch

        import test_model_parity_gmfss as G
        from conftest import load_reference_module

        from comfyui_frame_interpolation_tpu.models import gmfss

        G._setup_pkgs()
        arch = load_reference_module(
            "vfi_models/gmfss_fortuna/GMFSS_Fortuna_arch.py", "bench_gmfss_arch"
        )
        torch.manual_seed(0)
        model = arch.Model()
        params = G._params_from(model)
        return _measure_pair_model(
            gmfss.make_model_fn(params, union=False, dtype=jnp.bfloat16),
            batch, 1080, 1920, iters=5,
        )
    finally:
        if prev is None:
            os.environ.pop("CFI_TPU_SPLAT", None)
        else:
            os.environ["CFI_TPU_SPLAT"] = prev


def bench_stmfnet(batch=1, height=540, width=960):
    # The composed STMFNet program (pad-128; AdaCoF + PWC-correlation +
    # softsplat Pallas kernels + r3d convs over 4 frames) crashes the axon
    # remote compile helper (HTTP 500) at BOTH 1080p (3/3 attempts) and 720p
    # (r4 battery, 10:06); the committed matrix row runs 540p until the
    # helper limit moves, with the baseline pixel-scaled to match.
    _tests_dir_importable()
    import types

    import torch

    import test_model_parity_stmfnet as S
    from conftest import load_reference_module

    from comfyui_frame_interpolation_tpu.models import stmfnet
    from comfyui_frame_interpolation_tpu.utils.benchmark import measure
    from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict

    import torch_ops_stub

    torch_ops_stub.install()
    _install_vfi_utils_stub()
    torch.Tensor.cuda = lambda self, *a, **k: self
    ref = load_reference_module(
        "vfi_models/stmfnet/stmfnet_arch.py", "bench_stmfnet_arch"
    )
    model = S._build_model(ref)
    params = nest_state_dict(model.state_dict())
    model_fn = stmfnet.make_model_fn(params, dtype=jnp.bfloat16)
    fs = [_rand_frames(batch, height, width, s) for s in range(4)]
    sec = measure(model_fn, *fs, iters=3)
    return batch / sec


def bench_atm(batch=1):
    _tests_dir_importable()
    import torch

    import test_model_parity_atm as A
    from conftest import load_reference_module

    from comfyui_frame_interpolation_tpu.models import atm

    A._install_timm_stub()
    arch = load_reference_module("vfi_models/atm/network_base.py", "bench_atm_arch")
    torch.manual_seed(0)
    model = arch.Network().eval()
    from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict

    params = nest_state_dict(model.state_dict())
    return _measure_pair_model(
        atm.make_model_fn(params, variant="base", dtype=jnp.bfloat16),
        batch, 1080, 1920, iters=3,
    )


def bench_eisai(batch=1):
    """Native 540x960 (the reference hard-codes this synthesis size)."""
    _tests_dir_importable()
    import torch

    import test_model_parity_eisai as E

    from comfyui_frame_interpolation_tpu.models import eisai
    from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict

    import torch_ops_stub

    torch_ops_stub.install()
    E._install_kornia_stub()
    E._install_torchvision_stub()
    E._install_cv2_stub()
    torch.Tensor.cuda = lambda self, *a, **k: self
    from conftest import load_reference_module

    arch = load_reference_module(
        "vfi_models/eisai/eisai_arch.py", "bench_eisai_arch"
    )
    torch.manual_seed(0)
    raft = arch.RAFT(None).eval()
    ssl = arch.SoftsplatLite().eval()
    dtm = arch.DTM().eval()
    params = {
        "raft": nest_state_dict(raft.state_dict())["raft"],
        "ssl": nest_state_dict(ssl.state_dict()),
        "dtm": nest_state_dict(dtm.state_dict()),
    }
    # Measure the node's execution path (run_plan_pair_cached over
    # make_pair_fns, vfi_nodes.py EISAI): reuse (RAFT x2) + infer (SSL+DTM)
    # as the two jitted programs the node dispatches. The monolithic
    # make_model_fn jit of the SAME compute compiles pathologically
    # (0.22 f/s vs ~8 f/s split at identical shapes — docs/PROBES_r5.md);
    # users never run it: every executor path for EISAI is pair-cached.
    reuse_fn, infer_fn = eisai.make_pair_fns(params, dtype=jnp.bfloat16)
    return _measure_pair_split_model(
        reuse_fn, infer_fn, batch, 540, 960, iters=3, tag="bench_eisai",
    )


def bench_cain(batch=4):
    from comfyui_frame_interpolation_tpu.models import cain

    def build():
        return _load_ref("vfi_models/cain/cain_arch.py", "bench_cain_arch").CAIN(
            depth=3
        )

    params = _reference_params(build)
    return _measure_pair_model(
        cain.make_model_fn(params, dtype=jnp.bfloat16), batch, 1080, 1920
    )


def bench_ifunet(batch=2):
    from comfyui_frame_interpolation_tpu.models import ifunet

    def build():
        return _load_ref(
            "vfi_models/ifunet/IFUNet_arch.py", "bench_ifunet_arch"
        ).IFUNetModel()

    params = _reference_params(build)
    return _measure_pair_model(
        ifunet.make_model_fn(params, dtype=jnp.bfloat16), batch, 1080, 1920
    )


def bench_amt(batch=2):
    from comfyui_frame_interpolation_tpu.models import amt

    def build():
        return _load_ref("vfi_models/amt/amt_arch.py", "bench_amt_arch").AMT_S(
            corr_radius=3, corr_lvls=4, num_flows=3
        )

    params = _reference_params(build)
    # AMT's padding contract is caller-side: the node (like the reference,
    # amt/__init__.py:71-72) pads the whole clip to a multiple of 16 once,
    # so the model processes 1088-row frames. Bench at that padded size.
    return _measure_pair_model(
        amt.make_model_fn(params, "amt-s.pth", dtype=jnp.bfloat16),
        batch, 1088, 1920,
    )


def bench_xvfi(batch=2):
    import argparse as _ap

    from comfyui_frame_interpolation_tpu.models import xvfi

    def build():
        import torch

        args = _ap.Namespace(
            gpu=torch.device("cpu"), nf=64, module_scale_factor=2,
            S_trn=1, S_tst=1, img_ch=3,
        )
        return _load_ref(
            "vfi_models/xvfi/xvfi_arch.py", "bench_xvfi_arch"
        ).XVFInet(args)

    params = _reference_params(build)
    # node path (run_plan_pair_cached over make_pair_fns): feature pyramid +
    # flow levels once per pair, CFR+RefineUNet per timestep; bf16 like the
    # other splat families
    reuse_fn, infer_fn = xvfi.make_pair_fns(
        params, "XVFInet_Vimeo_exp1_latest.pt", dtype=jnp.bfloat16
    )
    return _measure_pair_split_model(
        reuse_fn, infer_fn, batch, 1080, 1920, iters=3, tag="bench_xvfi",
    )


def bench_momo(batch=1):
    """MoMo diffusion VFI at 1080p, node-default 8 denoising steps.

    The torch MoMo arch needs ``diffusers`` (absent in this image), so the
    random weights come from the JAX-side ``momo.init_params`` — same
    state-dict shapes as the reference checkpoints (see its docstring);
    throughput is weight-independent for a fixed architecture."""
    from comfyui_frame_interpolation_tpu.models import momo

    params = momo.init_params(jax.random.PRNGKey(0), "momo-base.pth")
    return _measure_pair_model(
        momo.make_model_fn(
            params, "momo-base.pth", num_inference_steps=8, dtype=jnp.bfloat16
        ),
        batch, 1080, 1920, iters=3,
    )


def _load_demo_pair(height=None, width=None):
    from PIL import Image

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "demo_frames")
    f0 = np.asarray(Image.open(os.path.join(d, "anime0.png")).convert("RGB"),
                    np.float32) / 255.0
    f1 = np.asarray(Image.open(os.path.join(d, "anime1.png")).convert("RGB"),
                    np.float32) / 255.0
    return jnp.asarray(f0)[None], jnp.asarray(f1)[None]


def psnr_mode():
    """bf16-vs-fp32 PSNR per model on demo_frames at native resolution.

    The fp32 TPU path is bit-exact vs the XLA reference ops (tiered warp;
    asserted by tests/test_pallas_kernels.py), and fp32 parity vs the torch
    reference archs is covered at 1e-3 by the parity suite — so this measures
    the full bf16-production-path numerics against the fp32 ground truth.
    Target (BASELINE.md): >= 40 dB.
    """
    f0, f1 = _load_demo_pair()
    t = jnp.full((1,), 0.5, jnp.float32)

    def psnr(a, b):
        mse = float(jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2))
        return 99.0 if mse == 0 else float(10.0 * np.log10(1.0 / mse))

    def emit(name, fn32, fnbf, *args):
        out32 = fn32(*args)
        outbf = fnbf(*args)
        val = psnr(out32, outbf)
        print(json.dumps({
            "metric": f"{name}_bf16_vs_fp32_psnr_db", "value": round(val, 2),
            "unit": "dB", "vs_baseline": round(val / 40.0, 3),
        }))

    from comfyui_frame_interpolation_tpu.models import (
        film, ifrnet, m2m, rife, sepconv,
    )

    params = rife.init_params(jax.random.PRNGKey(0), "4.7")
    emit(
        "rife47",
        rife.make_model_fn(dict(params), "4.7", dtype=jnp.float32),
        rife.make_model_fn(dict(params), "4.7", dtype=jnp.bfloat16),
        f0, f1, t,
    )

    for name, mod, build in (
        (
            "film", film,
            lambda: _load_ref(
                "vfi_models/film/film_arch.py", "psnr_film_arch"
            ).Interpolator(),
        ),
        (
            "ifrnet", ifrnet,
            lambda: _load_ref(
                "vfi_models/ifrnet/IFRNet_S_arch.py", "psnr_ifrnet_arch"
            ).IRFNet_S(),
        ),
        (
            "m2m", m2m,
            lambda: _load_ref(
                "vfi_models/m2m/M2M_arch.py", "psnr_m2m_arch"
            ).M2M_PWC(),
        ),
        (
            "sepconv", sepconv,
            lambda: _load_ref(
                "vfi_models/sepconv/sepconv_enhanced.py", "psnr_sepconv_arch"
            ).Network(),
        ),
    ):
        p = _reference_params(build)
        if name == "ifrnet":
            f32 = mod.make_model_fn(p, "S", dtype=jnp.float32)
            fbf = mod.make_model_fn(p, "S", dtype=jnp.bfloat16)
        else:
            f32 = mod.make_model_fn(p, dtype=jnp.float32)
            fbf = mod.make_model_fn(p, dtype=jnp.bfloat16)
        emit(name, f32, fbf, f0, f1, t)


def _demo_frames_np(n=2, h=None, w=None):
    """n frames from demo_frames as [N,H,W,3] float32 in [0,1]: the anime
    pair for n=2, the seq/ sequence for n>2; optionally bilinear-resized."""
    from PIL import Image

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "demo_frames")
    if n == 2:
        paths = [os.path.join(d, "anime0.png"), os.path.join(d, "anime1.png")]
    else:
        paths = [os.path.join(d, "seq", f"{i}.png") for i in range(n)]
    arrs = []
    for p in paths:
        im = Image.open(p).convert("RGB")
        if h is not None:
            im = im.resize((w, h), Image.BILINEAR)
        arrs.append(np.asarray(im, np.float32) / 255.0)
    return np.stack(arrs)


def psnr_torch_mode(only=None):
    """Composed end-to-end PSNR gate (BASELINE.md: >= 40 dB vs reference
    outputs on demo_frames) for ALL families with a CPU-runnable torch
    reference: the reference torch arch forward on CPU vs the FULL TPU node
    path — Pallas kernels on, padding, scheduling — on the SAME
    (random-seeded, mechanically converted) weights. Results are written to
    PSNR_TORCH.json (the committed artifact).

    This is the composed measurement the per-model small-shape parity tests
    and the bf16-vs-fp32 mode individually miss (VERDICT r2 missing #2).
    fp32 validates the pipeline exactly; bf16 is reported alongside (with
    random weights bf16 error is un-contracted — real checkpoints behave
    better, see the bf16-vs-fp32 psnr mode).

    The fp32 row runs under ``jax.default_matmul_precision("highest")``: the
    gate verifies the composed IMPLEMENTATION, so the TPU's default
    bf16-MXU passes for f32 convs must not alias into it. (Found the hard
    way: sepconv's kernel-normalization channel sits near zero under random
    weights — real checkpoints give ~1 — so default-precision ULP noise
    blew up through the division to a false 22 dB; at highest precision the
    same composed path measures 109 dB.)

    The 5 headline families run at the native demo resolution (540x960); the
    heavier additions run on downscaled demo frames at per-family sizes
    chosen to still exercise each node's padding path (sizes NOT multiples of
    the model's alignment) while keeping the CPU torch forward tractable.
    MoMo has no row: its torch denoiser is diffusers' UNet blocks (absent in
    this image, reference vfi_models/momo/unet.py:22-28); its JAX pieces are
    covered by tests/test_model_parity_momo.py instead."""
    import contextlib
    import torch

    from comfyui_frame_interpolation_tpu.nodes import NODE_CLASS_MAPPINGS
    from comfyui_frame_interpolation_tpu.utils.ckpt import (
        nest_state_dict, to_jax_tree,
    )

    # stub installers (timm/kornia/cupy-ops/...) for the heavier reference
    # archs live in the parity-test modules; CFI_TEST_TPU=1 keeps
    # tests/conftest from pinning this process's JAX to CPU when they import
    os.environ.setdefault("CFI_TEST_TPU", "1")
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
    )

    results = []

    def psnr(a, b):
        mse = float(np.mean((np.asarray(a, np.float32) - np.asarray(b, np.float32)) ** 2))
        return 99.0 if mse == 0 else float(10.0 * np.log10(1.0 / mse))

    def emit(name, dt, val, **extra):
        rec = {
            "metric": f"{name}_node_vs_torch_psnr_db_{dt}",
            "value": None if val is None else round(val, 2), "unit": "dB",
            **extra,
        }
        if val is not None:
            rec["vs_baseline"] = round(val / 40.0, 3)
        results.append(rec)
        print(json.dumps(rec), flush=True)
        _write_psnr_artifact(results)  # incremental + merging: survive timeouts

    def _conv(model):
        return to_jax_tree(nest_state_dict(model.state_dict()))

    def run_case(name, node_name, frames, build, torch_fwd, node_kwargs,
                 out_index=1, params_of=_conv):
        """frames: [N,H,W,3] np; torch_fwd(model, ts) -> NCHW mid-frame tensor
        (ts = per-frame 1xCxHxW tensors); node output frame [out_index] is the
        t=0.5 task both sides computed."""
        if only and name not in only:
            return
        try:
            torch.manual_seed(0)
            model = build()
            if hasattr(model, "eval"):
                # GMFSS's Model.eval() evals its submodules and returns None
                # (GMFSS_Fortuna_arch.py:1699-1703) — keep the model then
                model = model.eval() or model
            ts = [
                torch.from_numpy(f.transpose(2, 0, 1)).unsqueeze(0)
                for f in frames
            ]
            with torch.no_grad():
                ref_mid = torch_fwd(model, ts).numpy().transpose(0, 2, 3, 1)[0]
            params = params_of(model)
        except Exception as exc:  # keep the gate sweeping
            emit(name, "fp32", None, error=repr(exc)[:300])
            return
        node = NODE_CLASS_MAPPINGS[node_name]()
        for dt_name in ("float32", "bfloat16"):
            dt = "fp32" if dt_name == "float32" else "bf16"
            prec = (
                jax.default_matmul_precision("highest")
                if dt_name == "float32" else contextlib.nullcontext()
            )
            try:
                with prec:
                    out, = node.vfi(
                        frames=frames, params=params, dtype=dt_name,
                        **node_kwargs,
                    )
                mid = np.asarray(out)[out_index]
                emit(name, dt, psnr(ref_mid, mid),
                     resolution=f"{frames.shape[1]}x{frames.shape[2]}")
            except Exception as exc:
                emit(name, dt, None, error=repr(exc)[:300])

    frames2 = _demo_frames_np(2)  # native 540x960 anime pair
    t0 = torch.from_numpy(frames2[0].transpose(2, 0, 1)).unsqueeze(0)
    half = torch.full((1, 1, 1, 1), 0.5)
    kw2 = {"multiplier": 2, "batch_size": 1}

    run_case(
        "rife47", "RIFE VFI", frames2,
        lambda: _load_ref("vfi_models/rife/rife_arch.py", "pt_rife").IFNet(
            arch_ver="4.7"
        ),
        lambda m, ts: m(ts[0], ts[1], half, [8, 4, 2, 1], training=False,
                        fastmode=True, ensemble=False),
        {"ckpt_name": "rife47.pth", "fast_mode": True, "ensemble": False,
         **kw2},
    )
    run_case(
        "film", "FILM VFI", frames2,
        lambda: _load_ref("vfi_models/film/film_arch.py", "pt_film").Interpolator(),
        lambda m, ts: m(ts[0], ts[1], ts[0].new_full((1, 1), 0.5)),
        {"ckpt_name": "film_net_fp32.pt", **kw2},
    )
    run_case(
        "ifrnet", "IFRNet VFI", frames2,
        lambda: _load_ref(
            "vfi_models/ifrnet/IFRNet_S_arch.py", "pt_ifrnet"
        ).IRFNet_S(),
        lambda m, ts: m(ts[0], ts[1], scale_factor=1.0, timestep=0.5),
        {"ckpt_name": "IFRNet_S_Vimeo90K.pth", "scale_factor": 1.0, **kw2},
    )
    run_case(
        "m2m", "M2M VFI", frames2,
        lambda: _load_ref("vfi_models/m2m/M2M_arch.py", "pt_m2m").M2M_PWC(),
        lambda m, ts: m(ts[0], ts[1], [half])[0],
        {"ckpt_name": "M2M.pth", **kw2},
    )
    def _build_sepconv():
        # Realistic-weight regime for the kernel-normalization channel
        # (VERDICT r3 weak #6): trained checkpoints predict separable kernels
        # whose 51 taps sum to ~1, so the filtered ones-channel normalizer
        # (sepconv_enhanced.py:693-695) sits near 1; raw random init leaves it
        # near 0 and the division amplifies bf16 ULP noise into a false 17 dB.
        # Scale each kernel head's last conv and bias it to 1/51 so tap sums
        # ~1 — the conditioning real checkpoints actually have. Both sides
        # (torch reference and converted JAX params) see the SAME weights.
        import torch.nn as nn

        m = _load_ref(
            "vfi_models/sepconv/sepconv_enhanced.py", "pt_sepconv"
        ).Network()
        for head in (m.netVerone, m.netVertwo, m.netHorone, m.netHortwo):
            last = [q for q in head.modules() if isinstance(q, nn.Conv2d)][-1]
            with torch.no_grad():
                last.weight.mul_(0.05)
                last.bias.fill_(1.0 / 51.0)
        return m

    run_case(
        "sepconv", "Sepconv VFI", frames2, _build_sepconv,
        lambda m, ts: m(ts[0], ts[1]),
        {"ckpt_name": "sepconv.pth", **kw2},
    )

    # ---- extended families (VERDICT r3 weak #5): same harness, the torch
    # side replicates each reference NODE's caller-side padding so the ground
    # truth is at the original resolution, exactly like the node output.

    run_case(
        "cain", "CAIN VFI", frames2,
        lambda: _load_ref("vfi_models/cain/cain_arch.py", "pt_cain").CAIN(
            depth=3
        ),
        lambda m, ts: m(ts[0].clone(), ts[1].clone())[0],
        {"ckpt_name": "pretrained_cain.pth", **kw2},
    )

    def _amt_fwd(m, ts):
        # reference amt/__init__.py:69-84: InputPadder(shape, 16) around the
        # whole clip, centered replicate pad
        arch = _load_ref("vfi_models/amt/amt_arch.py", "pt_amt_pad")
        padder = arch.InputPadder(ts[0].shape, 16)
        embt = ts[0].new_full((1, 1, 1, 1), 0.5)
        out = m(padder.pad(ts[0]), padder.pad(ts[1]), embt,
                scale_factor=1.0, eval=True)["imgt_pred"]
        return padder.unpad(out)

    run_case(
        "amt", "AMT VFI", frames2,
        lambda: _load_ref("vfi_models/amt/amt_arch.py", "pt_amt").AMT_S(
            corr_radius=3, corr_lvls=4, num_flows=3
        ),
        _amt_fwd,
        {"ckpt_name": "amt-s.pth", **kw2},
    )
    run_case(
        "ifunet", "IFUnet VFI", frames2,
        lambda: _load_ref(
            "vfi_models/ifunet/IFUNet_arch.py", "pt_ifunet"
        ).IFUNetModel(),
        lambda m, ts: m(ts[0], ts[1], timestep=0.5, scale=1.0,
                        ensemble=False),
        {"ckpt_name": "IFUNet.pth", "scale_factor": 1.0, "ensemble": False,
         **kw2},
    )

    def _xvfi_fwd(m, ts):
        # reference xvfi/__init__.py:86-89: zero-pad bottom/right to divide =
        # 2**S_tst * module_scale_factor * 4 = 16 (Vimeo config), crop after
        import torch.nn.functional as F

        h, w = ts[0].shape[-2:]
        ph, pw = (16 - h % 16) % 16, (16 - w % 16) % 16
        i0 = F.pad(ts[0], (0, pw, 0, ph))
        i1 = F.pad(ts[1], (0, pw, 0, ph))
        x = torch.stack([i0, i1], dim=2)
        out = m(x, torch.tensor([[0.5]]), is_training=False)
        return out[..., :h, :w]

    def _build_xvfi():
        import argparse as _ap

        args = _ap.Namespace(
            gpu=torch.device("cpu"), nf=64, module_scale_factor=2,
            S_trn=1, S_tst=1, img_ch=3,
        )
        return _load_ref(
            "vfi_models/xvfi/xvfi_arch.py", "pt_xvfi"
        ).XVFInet(args)

    run_case(
        "xvfi", "XVFI VFI", frames2, _build_xvfi, _xvfi_fwd,
        {"ckpt_name": "XVFInet_Vimeo_exp1_latest.pt", **kw2},
    )

    frames_g = _demo_frames_np(2, 270, 480)  # exercises the /64 pad path

    def _build_gmfss():
        from test_model_parity_gmfss import _setup_pkgs

        _setup_pkgs()
        return _load_ref(
            "vfi_models/gmfss_fortuna/GMFSS_Fortuna_arch.py", "pt_gmfss"
        ).Model()

    def _gmfss_params(model):
        from test_model_parity_gmfss import _params_from

        return _params_from(model)

    def _gmfss_fwd(m, ts):
        # reference gmfss_fortuna/__init__.py:44-48: zero-pad to /64, crop
        import torch.nn.functional as F

        h, w = ts[0].shape[-2:]
        ph, pw = -(-h // 64) * 64, -(-w // 64) * 64
        i0 = F.pad(ts[0], (0, pw - w, 0, ph - h))
        i1 = F.pad(ts[1], (0, pw - w, 0, ph - h))
        r = m.reuse(i0, i1, 1.0)
        return m.inference(i0, i1, *r, 0.5)[..., :h, :w]

    run_case(
        "gmfss", "GMFSS Fortuna VFI", frames_g, _build_gmfss, _gmfss_fwd,
        {"ckpt_name": "GMFSS_fortuna", **kw2}, params_of=_gmfss_params,
    )

    def _build_atm():
        from test_model_parity_atm import _install_timm_stub

        _install_timm_stub()
        return _load_ref("vfi_models/atm/network_lite.py", "pt_atm").Network(
            global_motion=False, ensemble_global_motion=False
        )

    def _atm_fwd(m, ts):
        # reference atm/__init__.py:62-70: centered /64 replicate pad.
        # That module imports vfi_utils at top level — stub it (the r4
        # battery hit this when atm ran in a chunk without stmfnet/amt,
        # whose builders install the stub as a side effect).
        _install_vfi_utils_stub()
        arch = _load_ref("vfi_models/atm/__init__.py", "pt_atm_init")
        padder = arch.InputPadder(ts[0].shape, divisor=64)
        x0, x1 = padder.pad(ts[0], ts[1])
        out = m.forward(x0, x1)["I_t"]
        return padder.unpad(out)

    run_case(
        "atm", "ATM VFI", frames_g, _build_atm, _atm_fwd,
        {"ckpt_name": "atm-vfi-lite.pt", "global_motion": "Off (fastest)",
         **kw2},
    )

    frames4 = _demo_frames_np(4, 240, 424)

    def _flavr_fwd(m, ts):
        arch = _load_ref("vfi_models/flavr/flavr_arch.py", "pt_flavr_pad")
        padder = arch.InputPadder(ts[0].shape, 16)
        out = m([padder.pad(f) for f in ts])[0]
        return padder.unpad(out)

    def _build_flavr():
        import types

        from conftest import REFERENCE_DIR

        for pkg_name, sub in (("vfi_models", ""), ("vfi_models.flavr", "flavr")):
            if pkg_name not in sys.modules:
                pkg = types.ModuleType(pkg_name)
                pkg.__path__ = [os.path.join(REFERENCE_DIR, "vfi_models", sub)]
                sys.modules[pkg_name] = pkg
        return _load_ref(
            "vfi_models/flavr/flavr_arch.py", "pt_flavr"
        ).UNet_3D_3D(
            "unet_18", n_inputs=4, n_outputs=1, joinType="concat",
            upmode="transpose",
        )

    run_case(
        "flavr", "FLAVR VFI", frames4, _build_flavr, _flavr_fwd,
        {"ckpt_name": "FLAVR_2x.pth", **kw2},
        out_index=2,  # plan_window4(4, False).output: [f0, f1, mid12, f2, f3]
    )

    frames4s = _demo_frames_np(4, 256, 448)  # stmfnet arch needs /32 input

    def _build_stmfnet():
        import types

        import torch_ops_stub
        from test_model_parity_stmfnet import _build_model

        torch_ops_stub.install()
        _install_vfi_utils_stub()
        torch.Tensor.cuda = lambda self, *a, **k: self
        ref = _load_ref("vfi_models/stmfnet/stmfnet_arch.py", "pt_stmfnet")
        return _build_model(ref)

    run_case(
        "stmfnet", "STMFNet VFI", frames4s, _build_stmfnet,
        lambda m, ts: m(*ts),
        {"ckpt_name": "stmfnet.pth", "duplicate_first_last_frames": True,
         **kw2},
        out_index=3,  # plan_window4(4, True): [f0, f0, f1, mid12, f2, f3, f3]
    )

    def _build_eisai():
        import torch_ops_stub
        from test_model_parity_eisai import (
            _install_cv2_stub, _install_kornia_stub, _install_torchvision_stub,
        )

        torch_ops_stub.install()
        _install_kornia_stub()
        _install_torchvision_stub()
        _install_cv2_stub()
        torch.Tensor.cuda = lambda self, *a, **k: self
        ref = _load_ref("vfi_models/eisai/eisai_arch.py", "pt_eisai")
        return (
            ref.RAFT(None).eval(), ref.SoftsplatLite().eval(),
            ref.DTM().eval(),
        )

    def _eisai_params(models):
        raft, ssl, dtm = models
        return {
            "raft": _conv(raft)["raft"],
            "ssl": _conv(ssl),
            "dtm": _conv(dtm),
        }

    def _eisai_fwd(models, ts):
        # node wiring per reference eisai/__init__.py:30-40; iters=4 keeps the
        # CPU RAFT tractable at native 540x960 (both sides use the same iters).
        # eisai_arch's softsplat wrapper hops CPU tensors to the GPU with
        # .to("cuda") (eisai_arch.py:1036-1040) — neutralize on CPU-only
        # torch, scoped to this forward so later families see real semantics
        orig_to = torch.Tensor.to

        def _to(self, *args, **kwargs):
            if args and (
                args[0] == "cuda"
                or (isinstance(args[0], torch.device) and args[0].type == "cuda")
            ):
                return self
            return orig_to(self, *args, **kwargs)

        torch.Tensor.to = _to
        try:
            raft, ssl, dtm = models
            flow0, _ = raft(ts[0], ts[1], iters=4)
            flow1, _ = raft(ts[1], ts[0], iters=4)
            x = {
                "images": torch.stack([ts[0], ts[1]], dim=1),
                "flows": torch.stack([flow0, flow1], dim=1),
            }
            out_ssl, locs = ssl(x, t=0.5, return_more=True)
            out_dtm, _ = dtm(x, out_ssl, locs, return_more=False)
            return out_dtm[:, :3]
        finally:
            torch.Tensor.to = orig_to

    run_case(
        "eisai", "EISAI VFI", frames2, _build_eisai, _eisai_fwd,
        {"ckpt_name": "eisai", "iters": 4, **kw2}, params_of=_eisai_params,
    )

    def _momo_case():
        """MoMo composed row: full denoise loop + synthesis (momo.py:153-224)
        on an IDENTICAL injected noise sequence both sides (the only sound
        A/B for a stochastic sampler). Torch oracle = the reference arch
        against the clean-room diffusers shim in tests/vendored (covers
        exactly the subset vfi_models/momo/unet.py:22-28 imports). Runs the
        model-level composed path (apply with noise injection) rather than
        the node wrapper — the node only adds 64-padding around it."""
        from test_model_parity_momo import (
            _install_diffusers_shim, _stub_torchvision,
        )
        from conftest import load_reference_module
        from comfyui_frame_interpolation_tpu.models import momo as momo_jax

        _install_diffusers_shim()
        _stub_torchvision()
        synth_mod = load_reference_module(
            "vfi_models/momo/synthesis.py", "psnr_momo_synthesis")
        ref_momo = load_reference_module(
            "vfi_models/momo/momo.py", "psnr_momo_full")

        torch.manual_seed(0)
        model = ref_momo.MoMo(synth_model=synth_mod.SynthesisNet()).eval()

        b, hh, ww, steps = 1, 128, 192, 8
        fr = _demo_frames_np(2, hh, ww)
        x0 = np.ascontiguousarray(fr[0].transpose(2, 0, 1))[None]
        x1 = np.ascontiguousarray(fr[1].transpose(2, 0, 1))[None]
        x = torch.stack([torch.from_numpy(x0), torch.from_numpy(x1)], dim=2)

        rng = np.random.default_rng(11)
        noises = [rng.standard_normal((b, 4, hh, ww)).astype(np.float32)
                  for _ in range(steps + 1)]
        queue = [torch.from_numpy(n) for n in noises]
        orig_randn = torch.randn

        def fake_randn(*shape, **kwargs):
            if shape and isinstance(shape[0], (tuple, torch.Size)):
                shape = tuple(shape[0])
            n = queue.pop(0)
            assert tuple(n.shape) == tuple(shape), (n.shape, shape)
            return n.to(dtype=kwargs.get("dtype") or torch.float32)

        torch.randn = fake_randn
        try:
            with torch.no_grad():
                ref_out, _ = model(x, num_inference_steps=steps)
        finally:
            torch.randn = orig_randn
        want = ref_out.numpy().transpose(0, 2, 3, 1)[0]

        params = _conv(model)
        nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
        for dt, cast in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
            try:
                ctx = (jax.default_matmul_precision("highest")
                       if dt == "fp32" else contextlib.nullcontext())
                from comfyui_frame_interpolation_tpu.models.common import (
                    cast_params,
                )
                p = cast_params(params, cast) if dt == "bf16" else params
                with ctx:
                    out = momo_jax.apply(
                        p, nhwc(x0).astype(cast), nhwc(x1).astype(cast),
                        num_inference_steps=steps,
                        init_latents=nhwc(noises[0]),
                        step_noises=[nhwc(n) for n in noises[1:]],
                    )
                out = jax.block_until_ready(out)
                emit("momo", dt, psnr(np.asarray(out, np.float32), want),
                     resolution=f"{hh}x{ww}", steps=steps,
                     oracle="tests/vendored diffusers shim, injected noise")
            except Exception as exc:
                emit("momo", dt, None, error=repr(exc)[:300])

    if not only or "momo" in only:
        try:
            _momo_case()
        except Exception as exc:
            emit("momo", "fp32", None, error=repr(exc)[:300])

    if not only:
        path = _write_psnr_artifact(results)
        print(json.dumps({"metric": "psnr_torch_written", "path": path,
                          "rows": len(results)}), flush=True)


def _write_psnr_artifact(results):
    """Write PSNR_TORCH.json (called incrementally after every row: the torch
    CPU forwards run on this host's single core, so a full 15-family sweep
    can outlive the battery stage timeout — partial artifacts must survive).

    MERGES into the existing artifact by metric name (new rows win), so the
    sweep can run as resumable per-family chunks (``--families a,b``) across
    tunnel windows and still accumulate the committed 15-family artifact."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "PSNR_TORCH.json"
    )
    merged = {}
    try:
        with open(path) as f:
            for rec in json.load(f).get("results", []):
                merged[rec.get("metric")] = rec
    except Exception:
        pass
    for rec in results:
        merged[rec.get("metric")] = rec
    results = list(merged.values())
    doc = {
        "comment": (
            "Composed end-to-end PSNR gate (bench.py --metric "
            "psnr_torch): reference torch arch forward on CPU vs the "
            "FULL TPU node path (Pallas kernels on, per-family padding, "
            "scheduling) on identical mechanically-converted "
            "random-seeded weights. BASELINE.md target: >= 40 dB on "
            "fp32 rows (bf16 rows informational: random weights leave "
            "bf16 error un-contracted). The 5 headline families run at "
            "native 540x960; heavier families run on downscaled demo "
            "frames (resolution per row) chosen to exercise each node's "
            "padding path. momo: see its row."
        ),
        "results": results,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    return path


def _emit(metric, fps, baseline, estimated=False):
    rec = {
        "metric": metric,
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / baseline, 3),
    }
    if estimated:
        rec["baseline_estimated"] = True
    print(json.dumps(rec))


_RES = {
    "film": "1080p", "m2m": "1080p", "ifrnet": "1080p", "sepconv": "720p",
    "flavr": "1080p", "gmfss": "1080p", "stmfnet": "540p", "atm": "1080p",
    "eisai": "540p", "cain": "1080p", "ifunet": "1080p", "amt": "1080p",
    "xvfi": "1080p", "momo": "1080p",
}


def _cache_dir_entries():
    """Entry count of the persistent compile cache (None if cache disabled) —
    per-family deltas in matrix_mode tell whether cold compiles are actually
    being persisted (the round-2 M2M 10-min compile mystery)."""
    d = jax.config.jax_compilation_cache_dir
    if not d or not os.path.isdir(d):
        return None, d
    return len(os.listdir(d)), d


def matrix_mode():
    """Run every family config, print the JSON lines, AND write the results
    table to BENCH_MATRIX.md (the committed full-matrix artifact)."""
    import datetime
    import subprocess

    import comfyui_frame_interpolation_tpu  # noqa: F401  (sets the compile-cache config)

    n_cache, cache_dir = _cache_dir_entries()
    print(json.dumps({"metric": "compile_cache_status", "dir": cache_dir,
                      "entries": n_cache}), flush=True)
    rows = []
    for name in ["rife"] + sorted(_RES):
        _LAST_COMPILE_S["value"] = None
        pre_entries, _ = _cache_dir_entries()
        try:
            fps = bench_rife() if name == "rife" else globals()[f"bench_{name}"]()
        except Exception as exc:
            print(json.dumps({"metric": f"{name}_bench_error",
                              "error": repr(exc)[:300]}))
            rows.append((name, None, None, repr(exc)[:120], None))
            continue
        post_entries, _ = _cache_dir_entries()
        if pre_entries is not None and post_entries != pre_entries:
            print(json.dumps({"metric": f"{name}_cache_entries_written",
                              "value": post_entries - pre_entries}), flush=True)
        base, est = (
            (BASELINE_FPS, False) if name == "rife"
            else (SECONDARY_BASELINES[name], True)
        )
        res = "1080p" if name == "rife" else _RES[name]
        _emit(
            f"{name}{'47' if name == 'rife' else ''}_{res}"
            "_2x_interpolated_frames_per_sec",
            fps, base, estimated=est,
        )
        rows.append((name, fps, base, None, _LAST_COMPILE_S["value"]))

    try:
        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except Exception:
        commit = "?"
    dev = jax.devices()[0]
    lines = [
        "# Full benchmark matrix",
        "",
        f"Measured {datetime.date.today().isoformat()} at commit `{commit}` "
        f"on `{dev.device_kind}` ({dev.platform}); interpolated frames/sec, "
        "2x interpolation, bf16, random weights (throughput is "
        "weight-independent), median-of-rounds timing "
        "(`utils/benchmark.py`). Baselines for the secondary families are "
        "ESTIMATES (see `bench.py:SECONDARY_BASELINES`); the RIFE baseline "
        "is BASELINE.md's estimated reference throughput.",
        "",
        "| Config | resolution | frames/sec | vs baseline | cold compile (s) |",
        "|---|---|---|---|---|",
    ]
    for name, fps, base, err, compile_s in rows:
        res = "1080p" if name == "rife" else _RES[name]
        if err is not None:
            lines.append(f"| {name} | {res} | ERROR | `{err}` | — |")
        else:
            cs = "?" if compile_s is None else f"{compile_s:.0f}"
            lines.append(
                f"| {name} | {res} | {fps:.2f} | {fps / base:.2f}x | {cs} |"
            )
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_MATRIX.md"
    )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"metric": "bench_matrix_written", "path": path,
                      "rows": len(rows)}))


# (batch, h, w, c) of every distinct warp call in the two headline configs
# (census via eval_shape probes: RIFE 4.7 batch-8 = 16-batch bidirectional at
# full res; FILM batch-4 = 8-batch bidirectional across the fusion+flow
# pyramid — images and features warp as separate parts since the virtual-
# concat restructure, so the shapes are the natural per-part widths). The
# A/B below drives kernel-dispatch policy for these shapes.
_WARP_SHAPES = [
    ("rife_c3", (16, 1088, 1920, 3)),
    ("rife_c7", (16, 1088, 1920, 7)),
    ("film_l0_img", (8, 1080, 1920, 3)),
    ("film_l0_feat", (8, 1080, 1920, 64)),
    ("film_l1_feat", (8, 540, 960, 192)),
    ("film_l2_feat", (8, 270, 480, 448)),
    ("film_l3_feat", (8, 135, 240, 960)),
    ("film_l4_feat", (8, 67, 120, 960)),
]


def batchsweep_mode():
    """Sweep batch_size for the two headline configs (RIFE, FILM) to find the
    throughput-optimal default — batching is the executor's main lever and the
    right value is an empirical HBM/occupancy tradeoff per model."""
    for name, fn, batches in (
        ("rife", bench_rife, (8, 16, 32)),
        ("film", bench_film, (2, 4, 8)),
    ):
        for b in batches:
            try:
                fps = fn(batch=b)
            except Exception as exc:
                print(json.dumps({"metric": f"{name}_b{b}_error",
                                  "error": repr(exc)[:200]}), flush=True)
                continue
            print(json.dumps({"metric": f"{name}_1080p_2x_batch{b}",
                              "value": round(fps, 2),
                              "unit": "frames/sec"}), flush=True)


def warpshapes_mode(iters=6):
    """A/B the warp implementations (XLA gather, diagonal Pallas kernel,
    MXU rows-layout Pallas kernel) on the real RIFE/FILM call shapes.

    Prints one JSON line per shape with per-variant milliseconds and the
    winner — the data that decides the ``CFI_WARP_MXU`` default and whether
    wide-channel warps should route to the Pallas kernel at all."""
    import time

    from comfyui_frame_interpolation_tpu.ops.warp import warp_xla
    from comfyui_frame_interpolation_tpu.ops.pallas.warp_kernel import (
        warp_pallas_tiered,
    )
    from comfyui_frame_interpolation_tpu.utils.benchmark import measure

    def smooth_flow(b, h, w, amp=12.0, scale=150.0):
        gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        f = np.stack(
            [
                amp * np.sin(gx / scale) + 0.5 * amp * np.cos(gy / scale),
                -amp * np.cos(gx / scale) + 0.4 * amp * np.sin(gy / scale),
            ],
            axis=-1,
        ).astype(np.float32)
        return jnp.asarray(np.broadcast_to(f, (b, h, w, 2)))

    for tag, (b, h, w, c) in _WARP_SHAPES:
        img = _rand_frames(b, h, w, 0)[..., :1] * jnp.ones((c,), jnp.bfloat16)
        img = img.astype(jnp.bfloat16)
        flow = smooth_flow(b, h, w).astype(jnp.bfloat16)
        row = {"metric": f"warpshape_{tag}", "shape": f"{b}x{h}x{w}x{c}"}
        variants = {}
        prev = os.environ.get("CFI_WARP_MXU")
        try:
            for name in ("xla", "diag", "rows"):
                if name == "xla":
                    fn = jax.jit(lambda i, f: warp_xla(i, f, "border"))
                else:
                    os.environ["CFI_WARP_MXU"] = (
                        "0" if name == "diag" else "force"
                    )
                    # distinct wrapper per env so jit caches don't collide
                    fn = jax.jit(
                        functools.partial(
                            lambda i, f, _v: warp_pallas_tiered(i, f), _v=name
                        )
                    )
                try:
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(img, flow))
                    compile_s = time.perf_counter() - t0
                    n = 2 if name == "xla" else iters
                    sec = measure(fn, img, flow, iters=n)
                    variants[name] = round(sec * 1e3, 2)
                    row[f"{name}_compile_s"] = round(compile_s, 1)
                except Exception as exc:
                    variants[name] = None
                    row[f"{name}_error"] = repr(exc)[:160]
        finally:
            if prev is None:
                os.environ.pop("CFI_WARP_MXU", None)
            else:
                os.environ["CFI_WARP_MXU"] = prev
        row.update({f"{k}_ms": v for k, v in variants.items()})
        ok = {k: v for k, v in variants.items() if v is not None}
        if ok:
            row["winner"] = min(ok, key=ok.get)
        print(json.dumps(row), flush=True)


def gridprobe_mode(batch=16, height=1088, width=1920, c=7, iters=6):
    """Floor decomposition for the Pallas warp kernel's cost model.

    Times two trivial kernels over the EXACT same grid/blockspec structure as
    the diagonal warp bulk kernel (``warp_pallas_planes_v2``) at the RIFE
    headline shape:

    - ``step``: writes the output tile from the flow tile — measures pure
      grid-step overhead + flow-tile pipelining + output writeback;
    - ``dma``: additionally double-buffers the same ``[C, 24, 384]`` source
      window DMA per step — adds the window-DMA cost.

    ``(warp_ms - dma_ms)`` ≈ the VPU compute the kernel actually pays;
    ``step_ms`` is the irreducible floor for ANY per-(8,128)-tile kernel at
    this grid. If step_ms dominates warp_ms, the win is fewer/bigger tiles,
    not cheaper tap math."""
    import time

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from comfyui_frame_interpolation_tpu.ops.pallas.warp_kernel import (
        K0_WIN, TILE_H, TILE_W,
    )
    from comfyui_frame_interpolation_tpu.utils.benchmark import measure

    h, w = height, width
    win_h, win_w = min(K0_WIN[0], h), min(K0_WIN[1], w)
    gh, gw = h // TILE_H, w // TILE_W
    dtype = jnp.bfloat16

    def probe_step(fx_ref, fy_ref, img_ref, out_ref):
        x = fx_ref[0] + fy_ref[0]
        for ch in range(c):
            out_ref[0, ch] = x.astype(out_ref.dtype)

    def probe_dma(fx_ref, fy_ref, img_ref, out_ref, win_ref, sem):
        bi = pl.program_id(0)
        hi = pl.program_id(1)
        wi = pl.program_id(2)
        t = (bi * gh + hi) * gw + wi
        n_tiles = batch * gh * gw

        def start_dma(tile_idx, slot):
            b_k = tile_idx // (gh * gw)
            rem = tile_idx % (gh * gw)
            by = pl.multiple_of(
                jnp.minimum((rem // gw) * TILE_H, h - win_h), TILE_H
            )
            bx = pl.multiple_of(
                jnp.minimum((rem % gw) * TILE_W, w - win_w), TILE_W
            )
            return pltpu.make_async_copy(
                img_ref.at[b_k, :, pl.ds(by, win_h), pl.ds(bx, win_w)],
                win_ref.at[slot],
                sem.at[slot],
            )

        @pl.when(t == 0)
        def _():
            start_dma(0, 0).start()

        @pl.when(t + 1 < n_tiles)
        def _():
            start_dma(t + 1, (t + 1) % 2).start()

        start_dma(t, t % 2).wait()
        slot = t % 2
        x = (fx_ref[0] + fy_ref[0]).astype(jnp.float32)
        for ch in range(c):
            out_ref[0, ch] = (
                win_ref[slot, ch, 0:TILE_H, 0:TILE_W].astype(jnp.float32) + x
            ).astype(out_ref.dtype)

    flow_spec = pl.BlockSpec(
        (1, TILE_H, TILE_W), lambda bi, hi, wi: (bi, hi, wi),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, c, TILE_H, TILE_W), lambda bi, hi, wi: (bi, 0, hi, wi),
        memory_space=pltpu.VMEM,
    )
    common = dict(
        grid=(batch, gh, gw),
        in_specs=[flow_spec, flow_spec, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_spec,
    )
    step_call = pl.pallas_call(
        probe_step,
        grid_spec=pl.GridSpec(**common),
        out_shape=jax.ShapeDtypeStruct((batch, c, h, w), dtype),
    )
    dma_call = pl.pallas_call(
        probe_dma,
        grid_spec=pl.GridSpec(
            **common,
            scratch_shapes=[
                pltpu.VMEM((2, c, win_h, win_w), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((batch, c, h, w), dtype),
    )

    key = jax.random.PRNGKey(0)
    planes = jax.random.uniform(key, (batch, c, h, w), dtype)
    fx = jax.random.uniform(key, (batch, h, w), dtype)
    fy = jax.random.uniform(key, (batch, h, w), dtype)

    row = {"metric": "warp_gridprobe_ms",
           "shape": f"{batch}x{h}x{w}x{c}",
           "grid_steps": batch * gh * gw,
           "win": f"{win_h}x{win_w}"}
    for name, fn in (("step", jax.jit(lambda a, b, i: step_call(a, b, i))),
                     ("dma", jax.jit(lambda a, b, i: dma_call(a, b, i)))):
        try:
            t0 = time.perf_counter()
            float(jnp.sum(fn(fx, fy, planes)))
            row[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
            sec = measure(fn, fx, fy, planes, iters=iters)
            row[f"{name}_ms"] = round(sec * 1e3, 2)
        except Exception as exc:
            row[f"{name}_error"] = repr(exc)[:200]
    print(json.dumps(row), flush=True)


def slowstages_mode():
    """Component attribution for the slow-four families the round-4 matrix
    exposed (amt 0.49 / eisai 0.18 / gmfss 0.25 f/s vs 6/3/4 estimates): time
    each family's reuse vs per-timestep halves (the pair-cached split) and the
    RAFT iteration marginal, so optimization attacks measured cost, not
    guesses. One JSON line per component (ms per batch call)."""
    import time

    from comfyui_frame_interpolation_tpu.utils.benchmark import measure

    def timed(tag, fn, *args, iters=3):
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            compile_s = round(time.perf_counter() - t0, 1)
            # measure() fences via float(jnp.sum(out)) — scalarize pytree
            # outputs (eisai's reuse returns a (fwd, bwd) tuple). Unjitted
            # wrapper: the inner fn stays compiled, the per-leaf sums are a
            # few ~5 us dispatches against multi-ms calls.
            def fence(*a):
                return sum(
                    jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree_util.tree_leaves(fn(*a))
                )
            sec = measure(fence, *args, iters=iters)
            print(json.dumps({"metric": f"slowstage_{tag}_ms",
                              "value": round(sec * 1e3, 1),
                              "compile_s": compile_s}), flush=True)
            return fn(*args)
        except Exception as exc:
            print(json.dumps({"metric": f"slowstage_{tag}_error",
                              "error": repr(exc)[:250]}), flush=True)
            return None

    _tests_dir_importable()
    import torch

    from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict

    # --- gmfss 1080p b1: reuse (feat ext + GMFlow + metrics) vs infer
    # (12 softsplats + fusionnet)
    import test_model_parity_gmfss as G
    from conftest import load_reference_module

    from comfyui_frame_interpolation_tpu.models import gmfss

    G._setup_pkgs()
    arch = load_reference_module(
        "vfi_models/gmfss_fortuna/GMFSS_Fortuna_arch.py", "ss_gmfss_arch"
    )
    torch.manual_seed(0)
    gparams = G._params_from(arch.Model())
    reuse_fn, infer_fn = gmfss.make_pair_fns(
        gparams, union=False, dtype=jnp.bfloat16
    )
    f0 = _rand_frames(1, 1080, 1920, 0)
    f1 = _rand_frames(1, 1080, 1920, 1)
    t = jnp.full((1,), 0.5, jnp.float32)
    cache = timed("gmfss_reuse_1080p_b1", reuse_fn, f0, f1)
    if cache is not None:
        timed("gmfss_infer_1080p_b1", infer_fn, f0, f1, cache, t)

    # --- eisai 540p b2: raft reuse (2 x 12-iter RAFT) vs ssl+dtm infer,
    # plus the 1-iter RAFT to split volume-build cost from iteration cost
    import test_model_parity_eisai as E

    E._install_kornia_stub()
    E._install_torchvision_stub()
    E._install_cv2_stub()
    torch.Tensor.cuda = lambda self, *a, **k: self
    earch = load_reference_module("vfi_models/eisai/eisai_arch.py", "ss_eisai_arch")
    torch.manual_seed(0)
    eparams = {
        "raft": nest_state_dict(earch.RAFT(None).eval().state_dict())["raft"],
        "ssl": nest_state_dict(earch.SoftsplatLite().eval().state_dict()),
        "dtm": nest_state_dict(earch.DTM().eval().state_dict()),
    }
    from comfyui_frame_interpolation_tpu.models import eisai

    f0 = _rand_frames(2, 540, 960, 0)
    f1 = _rand_frames(2, 540, 960, 1)
    t = jnp.full((2,), 0.5, jnp.float32)
    for it in (12, 1):
        r_fn, i_fn = eisai.make_pair_fns(eparams, dtype=jnp.bfloat16, iters=it)
        cache = timed(f"eisai_raft{it}_540p_b2", r_fn, f0, f1)
        if it == 12 and cache is not None:
            timed("eisai_ssl_dtm_540p_b2", i_fn, f0, f1, cache, t)

    # --- m2m 1080p b4: PWC-flow reuse vs per-timestep multi-scale softsplat
    from comfyui_frame_interpolation_tpu.models import m2m

    def m2m_build():
        import torch_ops_stub

        torch_ops_stub.install()
        return load_reference_module(
            "vfi_models/m2m/M2M_arch.py", "ss_m2m_arch"
        ).M2M_PWC()

    mparams = _reference_params(m2m_build)
    r_fn, i_fn = m2m.make_pair_fns(mparams, dtype=jnp.bfloat16)
    f0 = _rand_frames(4, 1080, 1920, 0)
    f1 = _rand_frames(4, 1080, 1920, 1)
    t = jnp.full((4,), 0.5, jnp.float32)
    cache = timed("m2m_reuse_1080p_b4", r_fn, f0, f1)
    if cache is not None:
        timed("m2m_infer_1080p_b4", i_fn, f0, f1, cache, t)

    # --- amt 1088p b2 full forward (post-factorized-correlation number; the
    # matrix row is the committed artifact, this is the quick re-measure)
    fps = bench_amt()
    print(json.dumps({"metric": "amt_1080p_2x_refreshed_fps",
                      "value": round(fps, 2)}), flush=True)


def gmfssstages_mode():
    """Attribution INSIDE GMFSS's infer half: r4 slowstages measured reuse at
    325 ms vs infer at 3603 ms (1080p b1), and forcing the banded splat only
    moved the composed number 0.25 -> 0.28 f/s — so the splat-residual
    artifact is NOT the dominator. This times the infer sub-stages (the 10
    soft splats + head assembly vs the GridNet fusion) standalone over
    realistic intermediates, like filmstages does for FILM."""
    import time

    from comfyui_frame_interpolation_tpu.utils.benchmark import measure

    _tests_dir_importable()
    import torch

    import test_model_parity_gmfss as G
    from conftest import load_reference_module

    from comfyui_frame_interpolation_tpu.models import gmfss
    from comfyui_frame_interpolation_tpu.models.common import cast_params

    G._setup_pkgs()
    arch = load_reference_module(
        "vfi_models/gmfss_fortuna/GMFSS_Fortuna_arch.py", "gs_gmfss_arch"
    )
    torch.manual_seed(0)
    gparams = cast_params(G._params_from(arch.Model()), jnp.bfloat16)
    f0 = _rand_frames(1, 1080, 1920, 0).astype(jnp.bfloat16)
    f1 = _rand_frames(1, 1080, 1920, 1).astype(jnp.bfloat16)
    # pad like gmfss.apply does (tmp=64)
    f0 = jnp.pad(f0, ((0, 0), (0, 8), (0, 0), (0, 0)))
    f1 = jnp.pad(f1, ((0, 0), (0, 8), (0, 0), (0, 0)))
    t = jnp.full((1,), 0.5, jnp.bfloat16)

    reuse_j = jax.jit(lambda a, b: gmfss.reuse(gparams, a, b))
    splat_j = jax.jit(
        lambda a, b, r, tt: gmfss._splat_head(gparams, a, b, r, tt)[:4]
    )
    grid_j = jax.jit(
        lambda h, x1, x2, x3: gmfss._gridnet(
            gparams["fusionnet"], h, x1, x2, x3, "residual_model_head"
        )
    )
    infer_j = jax.jit(
        lambda a, b, r, tt: gmfss.inference(gparams, a, b, r, tt)
    )

    def timed(tag, fn, *args, iters=3):
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            compile_s = round(time.perf_counter() - t0, 1)

            def fence(*a):
                return sum(
                    jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree_util.tree_leaves(fn(*a))
                )
            sec = measure(fence, *args, iters=iters)
            print(json.dumps({"metric": f"gmfssstage_{tag}_ms",
                              "value": round(sec * 1e3, 1),
                              "compile_s": compile_s}), flush=True)
            return out
        except Exception as exc:
            print(json.dumps({"metric": f"gmfssstage_{tag}_error",
                              "error": repr(exc)[:250]}), flush=True)
            return None

    cache = timed("reuse", reuse_j, f0, f1)
    if cache is None:
        return
    head = timed("splats", splat_j, f0, f1, cache, t)
    if head is not None:
        timed("gridnet", grid_j, *head)
    timed("infer_total", infer_j, f0, f1, cache, t)

    # Random weights make GMFlow emit rough/out-of-band flows — the splat
    # kernel's worst case (pre-block-skip) or near-free case (post-skip, all
    # sources dropped under forced pallas). Neither is the real-checkpoint
    # cost. Re-time the splat half with the cache's flows replaced by a
    # SMOOTH in-band field (~24 px magnitude, low-frequency), the regime real
    # weights produce: this is the honest per-frame splat estimate.
    fb, fh, fw = cache[0].shape[:3]
    yy = jnp.linspace(0.0, 2.0 * jnp.pi, fh)[None, :, None]
    xx = jnp.linspace(0.0, 2.0 * jnp.pi, fw)[None, None, :]
    fx = 24.0 * jnp.sin(xx + 2 * yy) * jnp.cos(yy)
    fy = 18.0 * jnp.cos(2 * xx - yy) * jnp.sin(yy)
    smooth = jnp.broadcast_to(
        jnp.stack([fx, fy], -1), (fb, fh, fw, 2)
    ).astype(cache[0].dtype)
    cache_s = (smooth, -smooth) + tuple(cache[2:])
    timed("splats_smoothflow", splat_j, f0, f1, cache_s, t)
    timed("infer_total_smoothflow", infer_j, f0, f1, cache_s, t)


def stmfnetstages_mode(height=540, width=960):
    """Per-stage attribution for STMFNet (0.24 f/s at 540p even after the
    stage split — unlike EISAI this is NOT a mono-jit pathology; find the
    slow stage). Stages mirror models/stmfnet.make_model_fn."""
    import time

    _tests_dir_importable()
    import torch

    import test_model_parity_stmfnet as S
    import torch_ops_stub
    from conftest import load_reference_module

    from comfyui_frame_interpolation_tpu.models import stmfnet
    from comfyui_frame_interpolation_tpu.models.common import cast_params
    from comfyui_frame_interpolation_tpu.utils.benchmark import measure
    from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict

    torch_ops_stub.install()
    _install_vfi_utils_stub()
    torch.Tensor.cuda = lambda self, *a, **k: self
    ref = load_reference_module(
        "vfi_models/stmfnet/stmfnet_arch.py", "ss_stmfnet_arch"
    )
    torch.manual_seed(0)
    params = cast_params(
        nest_state_dict(S._build_model(ref).state_dict()), jnp.bfloat16
    )

    i1 = _rand_frames(1, height, width, 0).astype(jnp.bfloat16)
    i2 = _rand_frames(1, height, width, 1).astype(jnp.bfloat16)
    i0, i1, i2, i3 = stmfnet._pad128(i1, i1, i2, i2)

    def timed(tag, fn, *args, iters=3):
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            compile_s = round(time.perf_counter() - t0, 1)

            def fence(*a):
                return sum(
                    jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree_util.tree_leaves(fn(*a))
                )
            sec = measure(fence, *args, iters=iters)
            print(json.dumps({"metric": f"stmfnetstage_{tag}_ms",
                              "value": round(sec * 1e3, 1),
                              "compile_s": compile_s}), flush=True)
            return out
        except Exception as exc:
            print(json.dumps({"metric": f"stmfnetstage_{tag}_error",
                              "error": repr(exc)[:250]}), flush=True)
            return None

    feats_j = jax.jit(lambda a, b: stmfnet.stage_feats(params, a, b))
    feats = timed("feats", feats_j, i1, i2)
    if feats is None:
        return
    adas = []
    for sfx in ("", "_ds", "_us"):
        sj = jax.jit(
            functools.partial(
                lambda f, a, b, _s: stmfnet.stage_stream(params, f, a, b, _s),
                _s=sfx,
            )
        )
        r = timed(f"stream{sfx or '_full'}", sj, feats, i1, i2)
        if r is None:
            return
        adas.extend(r)
    fs_j = jax.jit(lambda a, b: stmfnet.stage_flowsplat(params, a, b))
    splats = timed("flowsplat", fs_j, i1, i2)
    if splats is None:
        return
    synth_j = jax.jit(lambda a, s: stmfnet.stage_synth(params, a, s))
    tilde = timed("synth_gridnet", synth_j, tuple(adas), splats)
    if tilde is None:
        return
    dt_j = jax.jit(
        lambda a, b, c, d, t: stmfnet.stage_dyntex(params, a, b, c, d, t)
    )
    timed("dyntex_unet3d", dt_j, i0, i1, i2, i3, tilde)


def eisaistages_mode():
    """Attribution inside EISAI (VERDICT r5 #1: 0.13 f/s = 0.04x, the worst
    matrix row). The r4 slowstages number (RAFT = 88% at ~518 ms/iter) is now
    known to be a measurement artifact: the probe jits closed over the ~1 GB
    correlation volume as a CONSTANT, which overwhelmed the remote compile
    helper; with the pyramid passed as data (tools/probe_raft_iter.py), one
    full GRU step measures 14 ms and the 12-iter scan 8.3 ms/iter at b4 —
    RAFT is NOT the sink. This times the composed halves and the
    SoftsplatLite sub-stages (12 softmax-splats across 6 scales + 3 NEDTs)
    over realistic intermediates to find where the 7.7 s/pair actually go."""
    import time

    _tests_dir_importable()
    import torch

    import test_model_parity_eisai as E
    import torch_ops_stub

    from comfyui_frame_interpolation_tpu.models import eisai
    from comfyui_frame_interpolation_tpu.utils.benchmark import measure
    from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict

    torch_ops_stub.install()
    E._install_kornia_stub()
    E._install_torchvision_stub()
    E._install_cv2_stub()
    torch.Tensor.cuda = lambda self, *a, **k: self
    from conftest import load_reference_module

    arch = load_reference_module(
        "vfi_models/eisai/eisai_arch.py", "es_eisai_arch"
    )
    torch.manual_seed(0)
    params = {
        "raft": nest_state_dict(arch.RAFT(None).eval().state_dict())["raft"],
        "ssl": nest_state_dict(arch.SoftsplatLite().eval().state_dict()),
        "dtm": nest_state_dict(arch.DTM().eval().state_dict()),
    }
    from comfyui_frame_interpolation_tpu.models.common import cast_params
    dtype = jnp.bfloat16
    params = cast_params(params, dtype)

    f0 = _rand_frames(1, 540, 960, 0).astype(dtype)
    f1 = _rand_frames(1, 540, 960, 1).astype(dtype)
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)

    reuse_fn, infer_fn = eisai.make_pair_fns(params, dtype=dtype)

    def timed(tag, fn, *args, iters=3):
        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(*args))
            compile_s = round(time.perf_counter() - t0, 1)

            def fence(*a):
                return sum(
                    jnp.sum(x.astype(jnp.float32))
                    for x in jax.tree_util.tree_leaves(fn(*a))
                )
            sec = measure(fence, *args, iters=iters)
            print(json.dumps({"metric": f"eisaistage_{tag}_ms",
                              "value": round(sec * 1e3, 1),
                              "compile_s": compile_s}), flush=True)
            return out
        except Exception as exc:
            print(json.dumps({"metric": f"eisaistage_{tag}_error",
                              "error": repr(exc)[:250]}), flush=True)
            return None

    cache = timed("reuse_raft_x2", reuse_fn, f0, f1)
    if cache is None:
        return
    flow0, flow1 = cache

    # SSL sub-stages over realistic flows
    nedt_j = jax.jit(lambda a: eisai.nedt(a))
    timed("nedt_once", nedt_j, f0)
    zs = jax.jit(
        lambda a, b, u, v: eisai._flow_z_metric(a, b, u, v)
    )
    z = timed("z_metric", zs, f0, f1, flow0, flow1)
    if z is not None:
        z0, z1 = z
        img0n = jnp.concatenate([f0, eisai.nedt(f0)], axis=-1)
        img1n = jnp.concatenate([f1, eisai.nedt(f1)], axis=-1)
        hw_j = jax.jit(
            lambda a, b, u, v, x, y: eisai._half_warper(a, b, u, v, x, y, 5, 0.5)
        )
        timed("halfwarp_fullres", hw_j, img0n, img1n, flow0, flow1, z0, z1)
        feats_j = jax.jit(
            lambda a: eisai._resnet_features(params["ssl"]["feature_extractor"], a)
        )
        timed("resnet_feats", feats_j, img0n)
    ssl_j = jax.jit(
        lambda a, b, u, v, tt: eisai.ssl_forward(params["ssl"], a, b, u, v, t=tt)
    )
    ssl_out = timed("ssl_total", ssl_j, f0, f1, flow0, flow1, t)
    if ssl_out is not None:
        out_ssl, locs = ssl_out
        dtm_j = jax.jit(
            lambda o, l: eisai.dtm_forward(params["dtm"], o, l)
        )
        timed("dtm_total", dtm_j, out_ssl, locs)
    timed("infer_total", infer_fn, f0, f1, cache, t)

    # smooth in-band flows — the regime real checkpoints produce (random
    # weights emit rough flows, the splat kernel's worst case)
    fb, fh, fw = flow0.shape[:3]
    yy = jnp.linspace(0.0, 2.0 * jnp.pi, fh)[None, :, None]
    xx = jnp.linspace(0.0, 2.0 * jnp.pi, fw)[None, None, :]
    fx = 24.0 * jnp.sin(xx + 2 * yy) * jnp.cos(yy)
    fy = 18.0 * jnp.cos(2 * xx - yy) * jnp.sin(yy)
    smooth = jnp.broadcast_to(
        jnp.stack([fy, fx], -1), (fb, fh, fw, 2)  # (y, x) order post-raft_flow
    ).astype(flow0.dtype)
    timed("infer_total_smoothflow", infer_fn, f0, f1, (smooth, -smooth), t)


def m2mstages_mode(batch=1):
    """Attribution inside M2M (VERDICT r5 #1: 2.20 f/s = 0.18x, the 2nd-worst
    matrix row, and the reuse-b4 program crashes the compile helper so the
    composed path was never attributed). Times the pair_reuse half (PWC
    pyramid + MotionRefineNet + metrics) and the pair_infer half (the batched
    2*BRANCH*n full-res softsplat + merge) as SEPARATE jitted programs —
    each far below the helper's size ceiling — plus a smooth-in-band-flow
    variant of infer (the regime real checkpoints produce; random weights
    emit rough flows, the splat kernel's worst case)."""
    import time

    from comfyui_frame_interpolation_tpu.models import m2m
    from comfyui_frame_interpolation_tpu.models.common import cast_params
    from comfyui_frame_interpolation_tpu.utils.benchmark import measure

    prev = os.environ.get("CFI_TPU_SPLAT")
    os.environ["CFI_TPU_SPLAT"] = "pallas"  # match bench_m2m (see its note)
    try:
        def build():
            return _load_ref(
                "vfi_models/m2m/M2M_arch.py", "bench_m2m_arch"
            ).M2M_PWC()

        params = cast_params(_reference_params(build), jnp.bfloat16)
        f0 = _rand_frames(batch, 1080, 1920, 0).astype(jnp.bfloat16)
        f1 = _rand_frames(batch, 1080, 1920, 1).astype(jnp.bfloat16)
        t = jnp.full((batch,), 0.5, jnp.bfloat16)

        reuse_j = jax.jit(lambda a, b: m2m.pair_reuse(params, a, b))
        infer_j = jax.jit(
            lambda cache, tt: m2m.pair_infer(params, cache, tt, (1080, 1920))
        )

        def timed(tag, fn, *args, iters=5):
            try:
                t0 = time.perf_counter()
                out = jax.block_until_ready(fn(*args))
                compile_s = round(time.perf_counter() - t0, 1)

                def fence(*a):
                    return sum(
                        jnp.sum(x.astype(jnp.float32))
                        for x in jax.tree_util.tree_leaves(fn(*a))
                    )
                sec = measure(fence, *args, iters=iters)
                print(json.dumps({"metric": f"m2mstage_{tag}_ms",
                                  "value": round(sec * 1e3, 1),
                                  "compile_s": compile_s}), flush=True)
                return out
            except Exception as exc:
                print(json.dumps({"metric": f"m2mstage_{tag}_error",
                                  "error": repr(exc)[:250]}), flush=True)
                return None

        cache = timed("reuse", reuse_j, f0, f1)
        if cache is None:
            return
        timed("infer", infer_j, cache, t)

        # sub-attribution INSIDE reuse (r5: reuse 300 ms = 73% of the pair):
        # PWC bidir flow at 1/2 res vs MotionRefineNet (full-res EncDec) vs
        # the photometric metric backwarps. Realistic intermediates.
        align = 64
        f0p = jnp.pad(f0, ((0, 0), (0, (-1080) % align), (0, 0), (0, 0)),
                      mode="edge")
        f1p = jnp.pad(f1, ((0, 0), (0, (-1080) % align), (0, 0), (0, 0)),
                      mode="edge")
        im0_s = m2m.resize_by_scale(f0p, 0.5)
        im1_s = m2m.resize_by_scale(f1p, 0.5)
        bidir_j = jax.jit(
            lambda a, b: m2m._bidir(params["netFlow"], a, b)
        )
        fl = timed("reuse_bidir_pwc", bidir_j, im0_s, im1_s)
        if fl is not None:
            fwd = 4.0 * m2m.resize_by_scale(fl[0], 4.0)
            bwd = 4.0 * m2m.resize_by_scale(fl[1], 4.0)
            pyr_j = jax.jit(
                lambda a: m2m._img_pyramid(
                    params["MRN"]["img_pyramid"], a
                )
            )
            c0 = timed("reuse_img_pyramid", pyr_j, f0p)
            c1 = pyr_j(f1p)
            if c0 is not None:
                enc_j = jax.jit(
                    lambda u, v, a, b, x, y: m2m._encdec(
                        params["MRN"]["motion_encdec"], u, v, a, b,
                        list(x), list(y),
                    )
                )
                timed("reuse_encdec", enc_j, fwd, bwd, f0p, f1p,
                      tuple(c0), tuple(c1))

        # smooth in-band branch flows (see gmfssstages_mode for rationale)
        nb, hp, wp, _ = cache["fwd_b"].shape
        yy = jnp.linspace(0.0, 2.0 * jnp.pi, hp)[None, :, None]
        xx = jnp.linspace(0.0, 2.0 * jnp.pi, wp)[None, None, :]
        fx = 24.0 * jnp.sin(xx + 2 * yy) * jnp.cos(yy)
        fy = 18.0 * jnp.cos(2 * xx - yy) * jnp.sin(yy)
        smooth = jnp.broadcast_to(
            jnp.stack([fx, fy], -1), (nb, hp, wp, 2)
        ).astype(cache["fwd_b"].dtype)
        cache_s = dict(cache)
        cache_s["fwd_b"] = smooth
        cache_s["bwd_b"] = -smooth
        timed("infer_smoothflow", infer_j, cache_s, t)
    finally:
        if prev is None:
            os.environ.pop("CFI_TPU_SPLAT", None)
        else:
            os.environ["CFI_TPU_SPLAT"] = prev


def filmstages_mode(batch=2, height=1080, width=1920, iters=5):
    """Per-stage on-chip timing of FILM's forward (pyramid / features / flow /
    warp / fuse), plus the composed total — the forensics that localizes the
    film_1080p_2x deficit (2.4 f/s vs the 8 f/s baseline estimate) without
    needing trace tooling. Stage list mirrors ``models/film.py:apply``; each
    stage is jitted standalone over realistic intermediates, so the sum can
    exceed the fused total (XLA fuses across stage boundaries in the real
    forward) — the interesting signal is each stage's share.

    batch=2 (not the headline 4): all stage intermediates are held
    device-resident simultaneously here, which OOMed v5e HBM at batch 4
    (17.07 G of 15.75 G, round-3 session log); per-frame ms is
    batch-normalized so shares stay representative."""
    import time

    from comfyui_frame_interpolation_tpu.models import film
    from comfyui_frame_interpolation_tpu.models.common import cast_params
    from comfyui_frame_interpolation_tpu.utils.benchmark import measure

    def build():
        return _load_ref(
            "vfi_models/film/film_arch.py", "bench_film_arch"
        ).Interpolator()

    dtype = jnp.bfloat16
    params = cast_params(_reference_params(build), dtype)
    n = batch
    x0 = _rand_frames(batch, height, width, 0).astype(dtype)
    x1 = _rand_frames(batch, height, width, 1).astype(dtype)

    def scalarize(fn):
        # measure() fences via float(jnp.sum(out)): reduce pytree outputs to
        # one scalar inside the jit (keeps all compute live, scalar D2H)
        def g(*a):
            leaves = jax.tree_util.tree_leaves(fn(*a))
            return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)
        return jax.jit(g)

    stage_pyramid = jax.jit(film.stage_pyramid)
    stage_features = jax.jit(lambda pyr: film.stage_features(params, pyr))
    stage_flow = jax.jit(lambda feat: film.stage_flow(params, feat, n))
    stage_warp = jax.jit(
        lambda pyr, feat, ff, bf: film.stage_warp(pyr, feat, ff, bf, n)
    )
    stage_fuse = jax.jit(lambda al: film.stage_fuse(params, al))
    total = jax.jit(lambda a, b: film.apply(params, a, b))

    # realistic intermediates, computed once (device-resident pytrees).
    # Warmups individually guarded: a compile-helper crash on one stage (the
    # composed `total` is the usual suspect — biggest program) must not lose
    # the other stages' rows.
    def _warm(tag, fn, *a):
        try:
            return jax.block_until_ready(fn(*a))
        except Exception as exc:
            print(json.dumps({"metric": f"filmstage_{tag}_warmup_error",
                              "error": repr(exc)[:200]}), flush=True)
            return None

    pyr = _warm("pyramid", stage_pyramid, x0, x1)
    feat = _warm("features", stage_features, pyr) if pyr is not None else None
    flows = _warm("flow", stage_flow, feat) if feat is not None else None
    aligned = (
        _warm("warp", stage_warp, pyr, feat, *flows)
        if flows is not None else None
    )
    if aligned is not None:
        _warm("fuse", stage_fuse, aligned)
    _warm("total", total, x0, x1)

    stages = [
        ("pyramid", scalarize(film.stage_pyramid), (x0, x1)),
        ("features",
         scalarize(lambda p: film.stage_features(params, p)), (pyr,)),
        ("flow", scalarize(lambda f: film.stage_flow(params, f, n)), (feat,)),
        ("warp",
         scalarize(lambda p, f, ff, bf: film.stage_warp(p, f, ff, bf, n)),
         (pyr, feat) + tuple(flows)),
        ("fuse", scalarize(lambda al: film.stage_fuse(params, al)), (aligned,)),
        ("total", total, (x0, x1)),
    ]
    results = {}
    for name, fn, args_ in stages:
        try:
            sec = measure(fn, *args_, iters=iters)
            results[name] = round(sec * 1e3 / batch, 2)  # ms per frame
        except Exception as exc:
            results[name] = None
            print(json.dumps({"metric": f"filmstage_{name}_error",
                              "error": repr(exc)[:200]}), flush=True)
    row = {
        "metric": "film_stage_ms_per_frame", "batch": batch,
        "shape": f"{height}x{width}",
        **{k: v for k, v in results.items()},
    }
    tot = results.get("total")
    if tot:
        row["fps"] = round(batch and 1e3 / tot, 2)
        parts = {k: v for k, v in results.items()
                 if k != "total" and v is not None}
        row["stage_sum_ms"] = round(sum(parts.values()), 2)
    print(json.dumps(row), flush=True)


def main():
    if os.environ.get("CFI_COMPILE_DIAG", "") == "1":
        # compile-time forensics for the TPU battery: per-computation compile
        # logs (with durations) and cache-miss explanations go to stderr, so a
        # slow family (round-2: m2m >10 min cold) shows WHERE the time went
        jax.config.update("jax_log_compiles", True)
        try:
            jax.config.update("jax_explain_cache_misses", True)
        except Exception:
            pass
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--metric", default="rife",
        choices=["rife", "psnr", "psnr_torch", "all", "matrix", "warpshapes",
                 "batchsweep", "filmstages", "gridprobe", "slowstages",
                 "gmfssstages", "m2mstages", "eisaistages", "stmfnetstages"]
        + sorted(_RES),
    )
    ap.add_argument(
        "--families", default=None,
        help="comma-separated family subset for --metric psnr_torch "
             "(debugging; the PSNR_TORCH.json artifact is only written on "
             "full runs)",
    )
    args = ap.parse_args()
    if args.metric == "psnr":
        psnr_mode()
        return
    if args.metric == "psnr_torch":
        psnr_torch_mode(
            only=args.families.split(",") if args.families else None
        )
        return
    if args.metric == "matrix":
        matrix_mode()
        return
    if args.metric == "warpshapes":
        warpshapes_mode()
        return
    if args.metric == "batchsweep":
        batchsweep_mode()
        return
    if args.metric == "filmstages":
        filmstages_mode()
        return
    if args.metric == "gridprobe":
        gridprobe_mode()
        return
    if args.metric == "slowstages":
        slowstages_mode()
        return
    if args.metric == "gmfssstages":
        gmfssstages_mode()
        return
    if args.metric == "m2mstages":
        m2mstages_mode()
        return
    if args.metric == "eisaistages":
        eisaistages_mode()
        return
    if args.metric == "stmfnetstages":
        stmfnetstages_mode()
        return
    configs = (
        ["rife"] + sorted(_RES) if args.metric == "all" else [args.metric]
    )
    for name in configs:
        if name == "rife":
            _emit(
                "rife47_1080p_2x_interpolated_frames_per_sec",
                bench_rife(), BASELINE_FPS,
            )
            continue
        try:
            fps = globals()[f"bench_{name}"]()
        except Exception as exc:  # keep the sweep going; report the failure
            print(json.dumps({"metric": f"{name}_bench_error",
                              "error": repr(exc)[:300]}))
            continue
        _emit(
            f"{name}_{_RES[name]}_2x_interpolated_frames_per_sec",
            fps, SECONDARY_BASELINES[name], estimated=True,
        )


if __name__ == "__main__":
    main()
