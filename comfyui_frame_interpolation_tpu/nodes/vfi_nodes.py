"""VFI nodes for the generic-loop model families (reference node files under
``vfi_models/{film,ifrnet,cain}/__init__.py``)."""

from __future__ import annotations

import typing

import jax.numpy as jnp

from ..core.frames import assert_batch_size, postprocess_frames, preprocess_frames
from ..core.loop import run_plan, run_plan_pair_cached
from ..core.schedule import (
    InterpolationStateList,
    plan_bisection,
    plan_midpoint,
    plan_timestep,
)
from ..models import cain as cain_model
from ..models import film as film_model
from ..models import ifrnet as ifrnet_model
from ..utils.download import get_converted_params
from .rife_node import DTYPE_MAP, DTYPE_OPTIONS

_OPTIONAL = {"optional": {"optional_interpolation_states": ("INTERPOLATION_STATES",)}}

# The reference only exposed batching on RIFE/XVFI (SURVEY §2e: its generic
# loop batches in Python with nothing to gain); here every model runs through
# the batched executor, so the knob is first-class on every node.
_BATCH_TOOLTIP = (
    "Frames interpolated per device call. The executor batches tasks into one "
    "XLA program; raising this improves TPU throughput until HBM runs out "
    "(rule of thumb: 4-8 for light flow models at 1080p, 1-2 for heavy "
    "synthesis models)."
)
_DTYPE_TOOLTIP = (
    "bfloat16 is the TPU-native fast path (~2x faster, half the HBM, "
    ">=40 dB vs float32); float32 matches the reference bit-for-bit."
)


def _batch_dtype_inputs(batch_default):
    return {
        "batch_size": (
            "INT",
            {"default": batch_default, "min": 1, "max": 64,
             "tooltip": _BATCH_TOOLTIP},
        ),
        "dtype": (
            DTYPE_OPTIONS, {"default": "float32", "tooltip": _DTYPE_TOOLTIP},
        ),
    }


def _base_inputs(
    ckpts, multiplier_min=2, multiplier_max=1000, batch_default=4, **extra
):
    req = {
        "ckpt_name": (ckpts,),
        "frames": ("IMAGE",),
        "clear_cache_after_n_frames": ("INT", {"default": 10, "min": 1, "max": 1000}),
        "multiplier": ("INT", {"default": 2, "min": multiplier_min, "max": multiplier_max}),
    }
    req.update(extra)
    req.update(_batch_dtype_inputs(batch_default))
    return {"required": req, **_OPTIONAL}


class FILM_VFI:
    """reference ``film/__init__.py:44-113``; timeline-bisection schedule."""

    @classmethod
    def INPUT_TYPES(cls):
        return _base_inputs(["film_net_fp32.pt"], batch_default=2)

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 2,
        dtype: str = "float32",
        **kwargs,
    ):
        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "FILM")
        if params is None:
            params = get_converted_params("film", ckpt_name)
        key = (id(params), dtype)
        if key not in self._cache:
            self._cache[key] = film_model.make_model_fn(
                params, dtype=DTYPE_MAP[dtype]
            )
        model_fn = self._cache[key]
        plan = plan_bisection(
            frames.shape[0], multiplier, optional_interpolation_states
        )
        out = run_plan(frames, plan, model_fn, batch_size=batch_size)
        return (postprocess_frames(out),)


class IFRNet_VFI:
    """reference ``ifrnet/__init__.py:11-57``; generic timestep schedule.

    (The reference node swaps timestep/scale_factor positionally into the arch —
    see ``models/ifrnet.py`` docstring; we pass them correctly.)
    """

    @classmethod
    def INPUT_TYPES(cls):
        return _base_inputs(
            ifrnet_model.CKPT_NAMES,
            scale_factor=([0.25, 0.5, 1.0, 2.0, 4.0], {"default": 1.0}),
        )

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        scale_factor: float = 1.0,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 4,
        dtype: str = "float32",
        **kwargs,
    ):
        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "IFRNet")
        variant = ifrnet_model.variant_for_ckpt(ckpt_name)
        if params is None:
            params = get_converted_params("ifrnet", ckpt_name)
        key = (id(params), variant, scale_factor, dtype)
        if key not in self._cache:
            self._cache[key] = ifrnet_model.make_model_fn(
                params, variant, scale_factor=scale_factor,
                dtype=DTYPE_MAP[dtype],
            )
        model_fn = self._cache[key]
        plan = plan_timestep(
            frames.shape[0], multiplier, optional_interpolation_states
        )
        out = run_plan(frames, plan, model_fn, batch_size=batch_size)
        return (postprocess_frames(out),)


class CAIN_VFI:
    """reference ``cain/__init__.py:12-63``; recursive-midpoint schedule."""

    @classmethod
    def INPUT_TYPES(cls):
        return _base_inputs(cain_model.CKPT_NAMES)

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 4,
        dtype: str = "float32",
        **kwargs,
    ):
        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "CAIN")
        if params is None:
            params = get_converted_params("cain", ckpt_name)
        key = (id(params), dtype)
        if key not in self._cache:
            self._cache[key] = cain_model.make_model_fn(
                params, dtype=DTYPE_MAP[dtype]
            )
        model_fn = self._cache[key]
        plan = plan_midpoint(
            frames.shape[0], multiplier, optional_interpolation_states
        )
        out = run_plan(frames, plan, model_fn, batch_size=batch_size)
        return (postprocess_frames(out),)


class M2M_VFI:
    """reference ``m2m/__init__.py:14-60``; generic timestep schedule."""

    @classmethod
    def INPUT_TYPES(cls):
        return _base_inputs(["M2M.pth"], batch_default=2)

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 2,
        dtype: str = "float32",
        **kwargs,
    ):
        from ..models import m2m as m2m_model

        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "M2M")
        if params is None:
            params = get_converted_params("m2m", ckpt_name)
        key = (id(params), dtype)
        if key not in self._cache:
            self._cache[key] = m2m_model.make_pair_fns(
                params, dtype=DTYPE_MAP[dtype]
            )
        reuse_fn, infer_fn = self._cache[key]
        plan = plan_timestep(frames.shape[0], multiplier, optional_interpolation_states)
        # per-pair reuse: PWC flow pyramid + MotionRefineNet run once per pair
        # instead of once per timestep (reference recomputes per t)
        out = run_plan_pair_cached(
            frames, plan, reuse_fn, infer_fn, batch_size=batch_size
        )
        return (postprocess_frames(out),)


class SepconvVFI:
    """reference ``sepconv/__init__.py:13-57``; recursive-midpoint schedule."""

    @classmethod
    def INPUT_TYPES(cls):
        return _base_inputs(["sepconv.pth"], batch_default=2)

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 2,
        dtype: str = "float32",
        **kwargs,
    ):
        from ..models import sepconv as sepconv_model

        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "Sepconv")
        if params is None:
            params = get_converted_params("sepconv", ckpt_name)
        key = (id(params), dtype)
        if key not in self._cache:
            self._cache[key] = sepconv_model.make_model_fn(
                params, dtype=DTYPE_MAP[dtype]
            )
        plan = plan_midpoint(frames.shape[0], multiplier, optional_interpolation_states)
        out = run_plan(frames, plan, self._cache[key], batch_size=batch_size)
        return (postprocess_frames(out),)


class AMT_VFI:
    """reference ``amt/__init__.py:33-87``; generic timestep schedule with a
    one-time whole-clip pad to a multiple of 16 (``amt/__init__.py:71-72``)."""

    @classmethod
    def INPUT_TYPES(cls):
        from ..models import amt as amt_model

        return _base_inputs(
            list(amt_model.CKPT_CONFIGS.keys()), batch_default=2
        )

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 2,
        dtype: str = "float32",
        **kwargs,
    ):
        import jax.numpy as jnp

        from ..models import amt as amt_model

        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "AMT")
        if params is None:
            params = get_converted_params(
                "amt",
                ckpt_name,
                url=f"https://huggingface.co/lalala125/AMT/resolve/main/{ckpt_name}",
            )
        key = (id(params), ckpt_name, dtype)
        if key not in self._cache:
            self._cache[key] = amt_model.make_model_fn(
                params, ckpt_name, dtype=DTYPE_MAP[dtype]
            )

        # InputPadder(divisor=16) semantics: centered replicate pad, then unpad
        n, h, w, c = frames.shape
        ph = (-h) % 16
        pw = (-w) % 16
        top = ph // 2
        left = pw // 2
        if ph or pw:
            frames = jnp.pad(
                frames,
                ((0, 0), (top, ph - top), (left, pw - left), (0, 0)),
                mode="edge",
            )
        plan = plan_timestep(frames.shape[0], multiplier, optional_interpolation_states)
        out = run_plan(frames, plan, self._cache[key], batch_size=batch_size)
        if ph or pw:
            out = out[:, top : top + h, left : left + w, :]
        return (postprocess_frames(out),)


class FLAVR_VFI:
    """reference ``flavr/__init__.py:28-115``; 4-frame sliding-window 2x schedule
    with a one-time whole-clip pad to a multiple of 16."""

    @classmethod
    def INPUT_TYPES(cls):
        from ..models import flavr as flavr_model

        return {
            "required": {
                "ckpt_name": (flavr_model.CKPT_NAMES,),
                "frames": ("IMAGE",),
                "clear_cache_after_n_frames": ("INT", {"default": 10, "min": 1, "max": 1000}),
                "multiplier": ("INT", {"default": 2, "min": 2, "max": 2}),
                "duplicate_first_last_frames": ("BOOLEAN", {"default": False}),
                **_batch_dtype_inputs(2),
            },
            **_OPTIONAL,
        }

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        duplicate_first_last_frames: bool = False,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 2,
        dtype: str = "float32",
        **kwargs,
    ):
        import warnings

        from ..core.loop import run_plan_window4
        from ..core.schedule import plan_window4
        from ..models import flavr as flavr_model

        if multiplier != 2:
            warnings.warn(
                "Currently, FLAVR only supports 2x interpolation. The process "
                "will continue but please set multiplier=2 afterward"
            )
        frames = preprocess_frames(frames)
        assert_batch_size(frames, 4, "FLAVR")
        if params is None:
            params = get_converted_params("flavr", ckpt_name)
        key = (id(params), dtype)
        if key not in self._cache:
            self._cache[key] = flavr_model.make_model_fn(
                params, dtype=DTYPE_MAP[dtype]
            )

        n, h, w, c = frames.shape
        ph = (-h) % 16
        pw = (-w) % 16
        top, left = ph // 2, pw // 2
        if ph or pw:
            frames = jnp.pad(
                frames,
                ((0, 0), (top, ph - top), (left, pw - left), (0, 0)),
                mode="edge",
            )
        plan = plan_window4(
            frames.shape[0], duplicate_first_last_frames, optional_interpolation_states
        )
        out = run_plan_window4(frames, plan, self._cache[key], batch_size=batch_size)
        if ph or pw:
            out = out[:, top : top + h, left : left + w, :]
        return (postprocess_frames(out),)


class IFUnet_VFI:
    """reference ``ifunet/__init__.py:11-58``; generic timestep schedule."""

    @classmethod
    def INPUT_TYPES(cls):
        return _base_inputs(
            ["IFUNet.pth"],
            scale_factor=("FLOAT", {"default": 1.0, "min": 0.1, "max": 100, "step": 0.1}),
            ensemble=("BOOLEAN", {"default": True}),
            batch_default=2,
        )

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        scale_factor: float = 1.0,
        ensemble: bool = False,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 2,
        dtype: str = "float32",
        **kwargs,
    ):
        from ..models import ifunet as ifunet_model

        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "IFUnet")
        if params is None:
            params = get_converted_params("ifunet", ckpt_name)
        key = (id(params), scale_factor, ensemble, dtype)
        if key not in self._cache:
            self._cache[key] = ifunet_model.make_model_fn(
                params, scale=scale_factor, ensemble=ensemble,
                dtype=DTYPE_MAP[dtype],
            )
        plan = plan_timestep(frames.shape[0], multiplier, optional_interpolation_states)
        out = run_plan(frames, plan, self._cache[key], batch_size=batch_size)
        return (postprocess_frames(out),)


class STMFNet_VFI:
    """reference ``stmfnet/__init__.py:13-100``; 4-frame sliding-window 2x."""

    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "ckpt_name": (["stmfnet.pth"],),
                "frames": ("IMAGE",),
                "clear_cache_after_n_frames": ("INT", {"default": 10, "min": 1, "max": 1000}),
                "multiplier": ("INT", {"default": 2, "min": 2, "max": 2}),
                "duplicate_first_last_frames": ("BOOLEAN", {"default": False}),
                **_batch_dtype_inputs(1),
            },
            **_OPTIONAL,
        }

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        duplicate_first_last_frames: bool = False,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 1,
        dtype: str = "float32",
        **kwargs,
    ):
        import warnings

        from ..core.loop import run_plan_window4
        from ..core.schedule import plan_window4
        from ..models import stmfnet as stmfnet_model

        if multiplier != 2:
            warnings.warn(
                "Currently, ST-MFNet only supports 2x interpolation. The process "
                "will continue but please set multiplier=2 afterward"
            )
        frames = preprocess_frames(frames)
        assert_batch_size(frames, 4, "ST-MFNet")
        if params is None:
            params = get_converted_params("stmfnet", ckpt_name)
        key = (id(params), dtype)
        if key not in self._cache:
            self._cache[key] = stmfnet_model.make_model_fn(
                params, dtype=DTYPE_MAP[dtype]
            )
        plan = plan_window4(
            frames.shape[0], duplicate_first_last_frames, optional_interpolation_states
        )
        out = run_plan_window4(frames, plan, self._cache[key], batch_size=batch_size)
        return (postprocess_frames(out),)


class GMFSS_Fortuna_VFI:
    """reference ``gmfss_fortuna/__init__.py:79-143``; generic timestep schedule.

    Weights are the multi-file .pkl sets (plus rife46 for the union variant);
    conversion assembles them into one tree keyed flownet/metricnet/feat_ext/
    fusionnet[/ifnet] (see ``models/gmfss.py``).
    """

    CKPTS_PATH_CONFIG = {
        "GMFSS_fortuna_union": {
            "ifnet": ("rife", "rife46.pth"),
            "flownet": ("gmfss_fortuna", "GMFSS_fortuna_flownet.pkl"),
            "metricnet": ("gmfss_fortuna", "GMFSS_fortuna_union_metric.pkl"),
            "feat_ext": ("gmfss_fortuna", "GMFSS_fortuna_union_feat.pkl"),
            "fusionnet": ("gmfss_fortuna", "GMFSS_fortuna_union_fusionnet.pkl"),
        },
        "GMFSS_fortuna": {
            "flownet": ("gmfss_fortuna", "GMFSS_fortuna_flownet.pkl"),
            "metricnet": ("gmfss_fortuna", "GMFSS_fortuna_metric.pkl"),
            "feat_ext": ("gmfss_fortuna", "GMFSS_fortuna_feat.pkl"),
            "fusionnet": ("gmfss_fortuna", "GMFSS_fortuna_fusionnet.pkl"),
        },
    }

    @classmethod
    def INPUT_TYPES(cls):
        return _base_inputs(
            list(cls.CKPTS_PATH_CONFIG.keys()), batch_default=2
        )

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}
    _params_cache: typing.Dict[str, dict] = {}

    def _load_params(self, ckpt_name):
        # memoized per ckpt_name: repeated node executions must reuse the same
        # tree object (stable id) so the jitted-model cache below hits
        if ckpt_name in self._params_cache:
            return self._params_cache[ckpt_name]
        from ..utils.ckpt import load_torch_state_dict, to_jax_tree

        from ..utils.download import load_file_from_github_release

        cfg = self.CKPTS_PATH_CONFIG[ckpt_name]
        tree = {}
        for key, (model_type, fname) in cfg.items():
            path = load_file_from_github_release(model_type, fname)
            tree[key] = load_torch_state_dict(path)
        tree = to_jax_tree(tree)
        self._params_cache[ckpt_name] = tree
        return tree

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 2,
        dtype: str = "float32",
        **kwargs,
    ):
        from ..models import gmfss as gmfss_model

        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "GMFSS Fortuna")
        union = "union" in ckpt_name
        if params is None:
            params = self._load_params(ckpt_name)
        key = (id(params), union, dtype)
        if key not in self._cache:
            self._cache[key] = gmfss_model.make_pair_fns(
                params, union=union, dtype=DTYPE_MAP[dtype]
            )
        reuse_fn, infer_fn = self._cache[key]
        plan = plan_timestep(frames.shape[0], multiplier, optional_interpolation_states)
        # per-pair reuse caching: flows/metrics/features are computed once per
        # pair instead of once per timestep (see models/gmfss.make_pair_fns)
        out = run_plan_pair_cached(
            frames, plan, reuse_fn, infer_fn, batch_size=batch_size
        )
        return (postprocess_frames(out),)


class ATM_VFI:
    """reference ``atm/__init__.py:83-182``; bisection schedule, 2x only,
    per-call centered 64-pad (handled inside the model fn)."""

    GLOBAL_MOTION_SETTINGS = {
        "On": [True, False],
        "On with Ensemble (slowest)": [True, True],
        "Off (fastest)": [False, False],
    }

    @classmethod
    def INPUT_TYPES(cls):
        from ..models import atm as atm_model

        return {
            "required": {
                "ckpt_name": (atm_model.CKPT_NAMES,),
                "frames": ("IMAGE",),
                "clear_cache_after_n_frames": ("INT", {"default": 10, "min": 1, "max": 1000}),
                "multiplier": ("INT", {"default": 2, "min": 2, "max": 2}),
                "global_motion": (list(cls.GLOBAL_MOTION_SETTINGS.keys()),),
                **_batch_dtype_inputs(2),
            },
            **_OPTIONAL,
        }

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        global_motion: str = "On",
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 2,
        dtype: str = "float32",
        **kwargs,
    ):
        from ..models import atm as atm_model

        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "ATM")
        variant = atm_model.variant_for_ckpt(ckpt_name)
        gm, gm_ens = self.GLOBAL_MOTION_SETTINGS[global_motion]
        if params is None:
            # the reference strips stale attn_mask/HW buffers (atm/__init__.py:
            # 133-141); our masks are computed per shape so just drop them
            params = get_converted_params(
                "atm",
                ckpt_name,
                convert=lambda tree: _strip_keys(tree, ("attn_mask", "HW")),
            )
        key = (id(params), variant, gm, gm_ens, dtype)
        if key not in self._cache:
            self._cache[key] = atm_model.make_model_fn(
                params, variant=variant, global_motion=gm,
                ensemble_global_motion=gm_ens, dtype=DTYPE_MAP[dtype],
            )
        plan = plan_bisection(frames.shape[0], multiplier, optional_interpolation_states)
        out = run_plan(frames, plan, self._cache[key], batch_size=batch_size)
        return (postprocess_frames(out),)


def _strip_keys(tree: dict, names) -> dict:
    out = {}
    for k, v in tree.items():
        if k in names:
            continue
        out[k] = _strip_keys(v, names) if isinstance(v, dict) else v
    return out


class MOMO_VFI:
    """reference ``momo/__init__.py:77-165``; bisection schedule, 2x only.

    The DDPM loop's noise comes from an explicit PRNG seed (the reference uses
    torch's global RNG and is not run-to-run deterministic).
    """

    @classmethod
    def INPUT_TYPES(cls):
        from ..models import momo as momo_model

        return {
            "required": {
                "ckpt_name": (momo_model.CKPT_NAMES,),
                "frames": ("IMAGE",),
                "clear_cache_after_n_frames": ("INT", {"default": 10, "min": 1, "max": 1000}),
                "multiplier": ("INT", {"default": 2, "min": 2, "max": 2}),
                "num_inference_steps": ("INT", {"default": 8, "min": 2, "max": 20}),
                **_batch_dtype_inputs(1),
            },
            **_OPTIONAL,
        }

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        num_inference_steps: int = 8,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 1,
        dtype: str = "float32",
        seed: int = 0,
        **kwargs,
    ):
        from ..models import momo as momo_model

        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "MoMo")
        if params is None:
            params = get_converted_params("momo", ckpt_name)
        key = (id(params), ckpt_name, num_inference_steps, seed, dtype)
        if key not in self._cache:
            self._cache[key] = momo_model.make_model_fn(
                params, ckpt_name, num_inference_steps=num_inference_steps,
                seed=seed, dtype=DTYPE_MAP[dtype],
            )
        plan = plan_bisection(frames.shape[0], multiplier, optional_interpolation_states)
        out = run_plan(frames, plan, self._cache[key], batch_size=batch_size)
        return (postprocess_frames(out),)

class EISAI_VFI:
    """reference ``eisai/__init__.py:42-84``; generic timestep schedule.

    EISAI loads three checkpoints (``eisai_ssl.pt``, ``eisai_dtm.pt`` and the
    RFR flow weights from ``eisai_anime_interp_full.ckpt`` under the
    ``module.flownet.`` prefix); the assembled param tree has the keys
    ``{"raft", "ssl", "dtm"}`` (see ``models/eisai.py``)."""

    @classmethod
    def INPUT_TYPES(cls):
        return _base_inputs(["eisai"], batch_default=2)

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier=2,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        batch_size: int = 2,
        dtype: str = "float32",
        iters: int = 12,  # RAFT refinement iterations (reference hard-codes
        # 12, eisai_arch.py; exposed for cheap-flow runs and the PSNR gate)
        **kwargs,
    ):
        from ..models import eisai as eisai_model

        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "EISAI")
        if params is None:
            params = {
                "ssl": get_converted_params("eisai", "eisai_ssl.pt"),
                "dtm": get_converted_params("eisai", "eisai_dtm.pt"),
                "raft": get_converted_params(
                    "eisai",
                    "eisai_anime_interp_full.ckpt",
                    convert=lambda sd: sd.get("module", {})
                    .get("flownet", sd.get("flownet", sd)),
                ),
            }
        key = (id(params.get("ssl")), dtype, iters)
        if key not in self._cache:
            self._cache[key] = eisai_model.make_pair_fns(
                params, dtype=DTYPE_MAP[dtype], iters=iters
            )
        reuse_fn, infer_fn = self._cache[key]
        plan = plan_timestep(frames.shape[0], multiplier, optional_interpolation_states)
        # per-pair reuse: the two 12-iteration RAFT flow passes run once per
        # pair; only SoftsplatLite+DTM re-run per timestep
        out = run_plan_pair_cached(
            frames, plan, reuse_fn, infer_fn, batch_size=batch_size
        )
        return (postprocess_frames(out),)

class XVFI_VFI:
    """reference ``xvfi/__init__.py:49-115``; per-pair timestep schedule.

    Reference bugs fixed here (documented divergences):
    - the reference iterates ``optional_interpolation_states`` directly, but
      ``InterpolationStateList`` is not iterable → upstream crashes whenever
      states are supplied; we apply the standard skip semantics instead.
    - the reference assembles output frames by *string*-sorting dict keys
      ("10" < "2"), scrambling the frame order for clips with >10 frames; we
      emit frames in true temporal order.
    The reference also spells the input "multipler"; both spellings are
    accepted (INPUT_TYPES keeps the reference spelling for drop-in parity)."""

    @classmethod
    def INPUT_TYPES(cls):
        from ..models import xvfi as xvfi_model

        return {
            "required": {
                "ckpt_name": (list(xvfi_model.CKPT_CONFIGS.keys()),),
                "frames": ("IMAGE",),
                "batch_size": (
                    "INT",
                    {"default": 2, "min": 1, "max": 100,
                     "tooltip": _BATCH_TOOLTIP},
                ),
                "multipler": ("INT", {"default": 2, "min": 2, "max": 1000}),
                "dtype": (
                    DTYPE_OPTIONS,
                    {"default": "float32", "tooltip": _DTYPE_TOOLTIP},
                ),
            },
            **_OPTIONAL,
        }

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    _cache: typing.Dict = {}

    def vfi(
        self,
        ckpt_name: str,
        frames,
        batch_size: int = 2,
        multipler: int = 2,
        multiplier: int = None,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,
        dtype: str = "float32",
        **kwargs,
    ):
        from ..models import xvfi as xvfi_model

        mult = multiplier if multiplier is not None else multipler
        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "XVFI")
        if params is None:
            params = get_converted_params(
                "xvfi", ckpt_name,
                convert=lambda sd: sd.get("state_dict_Model", sd),
            )
        key = (id(params), ckpt_name, dtype)
        if key not in self._cache:
            self._cache[key] = xvfi_model.make_pair_fns(
                params, ckpt_name, dtype=DTYPE_MAP[dtype]
            )
        plan = plan_timestep(
            frames.shape[0], mult, optional_interpolation_states,
            zero_drops_pair=False,
        )
        # feature pyramid + all flow levels run once per pair; only the
        # level-0 CFR + RefineUNet tail re-runs per timestep (the reference
        # recomputes everything per timestep — xvfi/__init__.py:49-115)
        reuse_fn, infer_fn = self._cache[key]
        out = run_plan_pair_cached(
            frames, plan, reuse_fn, infer_fn, batch_size=batch_size
        )
        return (postprocess_frames(out),)
