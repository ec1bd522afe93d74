"""RIFE VFI node (reference ``vfi_models/rife/__init__.py:34-239``).

Same public schema and loop semantics; execution is the TPU-native path: the flat
(pair, timestep) task list becomes a :func:`plan_timestep` plan run by the batched
executor with a true batch dimension and a ``[B]`` timestep vector — the real
version of the reference's "Opt 7" batching.
"""

from __future__ import annotations

import typing

import jax.numpy as jnp

from ..core.frames import assert_batch_size, postprocess_frames, preprocess_frames
from ..core.loop import run_plan
from ..core.schedule import InterpolationStateList, plan_timestep
from ..models import rife
from ..utils.download import get_converted_params

MODEL_TYPE = "rife"

DTYPE_OPTIONS = ["float32", "float16", "bfloat16"]
DTYPE_MAP = {
    "float32": jnp.float32,
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
}

# (ckpt_name, dtype, fast_mode, ensemble, scale_factor) → jitted model_fn
_model_fn_cache: typing.Dict[typing.Tuple, typing.Callable] = {}
_params_cache: typing.Dict[str, dict] = {}


class RIFE_VFI:
    @classmethod
    def INPUT_TYPES(cls):
        return {
            "required": {
                "ckpt_name": (
                    sorted(rife.CKPT_NAME_VER_DICT.keys()),
                    {"default": "rife49.pth"},
                ),
                "frames": ("IMAGE",),
                "clear_cache_after_n_frames": ("INT", {"default": 10, "min": 1, "max": 1000}),
                "multiplier": ("INT", {"default": 2, "min": 1}),
                "fast_mode": ("BOOLEAN", {"default": True}),
                "ensemble": ("BOOLEAN", {"default": True}),
                "scale_factor": ([0.25, 0.5, 1.0, 2.0, 4.0], {"default": 1.0}),
                "dtype": (DTYPE_OPTIONS, {"default": "float32"}),
                # reference input (rife/__init__.py:53-58) kept for drop-in
                # graph parity; accepted and ignored — every model here is
                # always XLA-jit-compiled, the thing torch.compile opts into
                "torch_compile": ("BOOLEAN", {"default": False}),
                "batch_size": ("INT", {"default": 1, "min": 1, "max": 64}),
            },
            "optional": {
                "optional_interpolation_states": ("INTERPOLATION_STATES",)
            },
        }

    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "vfi"
    CATEGORY = "ComfyUI-Frame-Interpolation/VFI"

    def vfi(
        self,
        ckpt_name: str,
        frames,
        clear_cache_after_n_frames: int = 10,
        multiplier: typing.Union[int, typing.List[int]] = 2,
        fast_mode: bool = False,
        ensemble: bool = False,
        scale_factor: float = 1.0,
        dtype: str = "float32",
        batch_size: int = 1,
        optional_interpolation_states: InterpolationStateList = None,
        params: dict = None,  # extension: inject a converted parameter tree
        **kwargs,
    ):
        arch_ver = rife.CKPT_NAME_VER_DICT[ckpt_name]
        frames = preprocess_frames(frames)
        assert_batch_size(frames, 2, "RIFE")

        if params is None:
            if ckpt_name not in _params_cache:
                _params_cache[ckpt_name] = get_converted_params(MODEL_TYPE, ckpt_name)
            params = _params_cache[ckpt_name]

        key = (id(params), ckpt_name, dtype, fast_mode, ensemble, scale_factor)
        if key not in _model_fn_cache:
            _model_fn_cache[key] = rife.make_model_fn(
                params,
                arch_ver,
                scale_factor=scale_factor,
                fastmode=fast_mode,
                ensemble=ensemble,
                dtype=DTYPE_MAP[dtype],
            )
        model_fn = _model_fn_cache[key]

        plan = plan_timestep(
            frames.shape[0],
            multiplier,
            optional_interpolation_states,
            zero_drops_pair=False,  # RIFE loop keeps m==0 pairs' frames
        )
        out = run_plan(frames, plan, model_fn, batch_size=batch_size)
        return (postprocess_frames(out),)
