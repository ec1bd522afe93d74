"""Frame tensor conventions and padding contracts.

The public IMAGE convention is ComfyUI's: ``[N, H, W, C] float32 in [0, 1]``.
Unlike the reference — which immediately rearranges to NCHW for PyTorch
(``vfi_utils.py:139-143``) — this framework keeps **NHWC end-to-end**: it is the
native layout for XLA:TPU convolutions, so there is no transpose at the boundary
and no layout churn inside models.

``preprocess_frames`` therefore only drops any alpha channel (parity with
``vfi_utils.py:139-140``); ``postprocess_frames`` casts back to float32.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

__all__ = [
    "preprocess_frames",
    "postprocess_frames",
    "assert_batch_size",
    "pad_to_multiple",
    "unpad",
    "pad_size",
]


def preprocess_frames(frames: Union[Array, np.ndarray]) -> Array:
    """NHWC in, NHWC out; drops alpha (reference keeps ``[..., :3]``)."""
    frames = jnp.asarray(frames)
    if frames.ndim != 4:
        raise ValueError(f"expected [N,H,W,C] frames, got shape {frames.shape}")
    return frames[..., :3]


def postprocess_frames(frames: Array) -> Array:
    """Return NHWC float32 RGB (reference ``vfi_utils.py:142-143``)."""
    return frames[..., :3].astype(jnp.float32)


def assert_batch_size(frames, batch_size: int = 2, vfi_name: str = None) -> None:
    """Reference ``vfi_utils.py:145-147``."""
    subject = "Most VFI models require" if vfi_name is None else f"VFI model {vfi_name} requires"
    n = frames.shape[0]
    assert n >= batch_size, (
        f"{subject} at least {batch_size} frames to work with, only found {n}. "
        "Please check the frame input."
    )


def pad_size(h: int, w: int, multiple: int) -> Tuple[int, int]:
    """Padded (H, W) rounded up to ``multiple`` (e.g. RIFE: ``rife_arch.py:479-482``)."""
    ph = ((h - 1) // multiple + 1) * multiple
    pw = ((w - 1) // multiple + 1) * multiple
    return ph, pw


def pad_to_multiple(
    x: Array, multiple: int, mode: str = "constant"
) -> Tuple[Array, Tuple[int, int]]:
    """Pad NHWC frames on the bottom/right to a multiple (torch ``F.pad`` convention
    used across the reference archs). Returns (padded, (orig_h, orig_w))."""
    n, h, w, c = x.shape
    ph, pw = pad_size(h, w, multiple)
    if (ph, pw) == (h, w):
        return x, (h, w)
    pad_cfg = ((0, 0), (0, ph - h), (0, pw - w), (0, 0))
    if mode == "constant":
        x = jnp.pad(x, pad_cfg)
    elif mode == "reflect":
        x = jnp.pad(x, pad_cfg, mode="reflect")
    elif mode == "replicate":
        x = jnp.pad(x, pad_cfg, mode="edge")
    else:
        raise ValueError(f"unknown pad mode {mode}")
    return x, (h, w)


def unpad(x: Array, hw: Tuple[int, int]) -> Array:
    h, w = hw
    return x[:, :h, :w, :]
