"""Softmax splatting (forward warping) — deterministic XLA scatter-add.

Semantics replicate the reference CUDA kernels and wrappers
(``cupy_ops/softsplat.py``):

* ``softsplat_func(in, flow)`` (kernel ``softsplat_out``, lines 140-192): every
  source pixel ``(x, y)`` is splatted to the four bilinear neighbors of
  ``(x + flow_x, y + flow_y)`` with bilinear weights; out-of-bounds corners are
  dropped; non-finite targets are skipped.
* ``softsplat(in, flow, metric, mode)`` (lines 382-436): modes ``sum``, ``avg``
  (append a ones channel), ``linear`` (``in*metric`` + metric channel), ``soft``
  (``in*exp(metric)`` + ``exp(metric)`` channel), each optionally suffixed with an
  epsilon variant for the final normalization: bare/``-addeps`` add 1e-7,
  ``-zeroeps`` maps exact zeros to 1, ``-clipeps`` clamps to at least 1e-7.
* ``FunctionSoftsplat(in, flow, metric, strType)`` (lines 325-358): legacy API with
  ``summation/average/linear/softmax`` names and zeroeps normalization (used by
  EISAI / STMFNet).

The CUDA implementation's ``atomicAdd`` made accumulation order nondeterministic;
XLA's scatter-add on TPU is deterministic — a strict improvement.

Layout: NHWC input, ``[N, H, W, 2]`` flow (x then y), ``[N, H, W, 1]`` metric.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["softsplat_func", "softsplat", "function_softsplat"]


def softsplat_func(ten_in: Array, ten_flow: Array) -> Array:
    """Raw bilinear forward splat (reference ``softsplat_out`` kernel).

    On TPU (ops_backend "pallas") this runs the displacement-banded
    matmul-scatter kernel (``ops/pallas/softsplat_kernel.py``): the base band
    always runs and covers fy ∈ [-32, 24), fx ∈ [-128, 128); four extra band
    passes engage via ``lax.cond`` for fast vertical (fy up to [-88, 80)) or
    horizontal (fx up to [-384, 384)) motion. Only sources OUTSIDE every band
    (extreme diagonal motion) take the dense XLA scatter, as a masked
    *residual* added to the kernel result — never an all-or-nothing
    whole-batch fallback. ``CFI_TPU_SPLAT=pallas`` skips the residual (drops
    out-of-band sources); ``=xla`` forces the scatter path."""
    from .warp import _backend

    n, h, w, c = ten_in.shape
    mode = os.environ.get("CFI_TPU_SPLAT", "auto")  # auto | pallas | xla
    if mode != "xla" and _backend() == "pallas" and h * w >= 32 * 128:
        # No channel cap: wide-channel splats (GMFSS 65-193ch, EISAI 66-514ch
        # feature pyramids) fold channel chunks into the kernel's batch axis
        # — the XLA scatter they previously fell back to is orders of
        # magnitude off the kernel's throughput at these sizes. No minimum
        # width either: the kernel pads to the 128 tile and clamps its window
        # (narrow frames get a base-band-only pass; wider displacements land
        # in the exact residual below). Only genuinely tiny frames keep the
        # scatter, where it is cheap and a Mosaic compile isn't worth it.
        from .pallas.softsplat_kernel import (
            band_membership, softsplat_pallas_banded,
        )

        out = softsplat_pallas_banded(ten_in, ten_flow)
        if mode == "pallas":  # forced: no residual pass (bench/known data)
            return out

        rem = band_membership(ten_flow, h, w)[1]

        def add_residual(o):
            # sources outside every band: re-splat ONLY them via the exact
            # scatter (non-residual sources get non-finite flow → dropped)
            masked_flow = jnp.where(rem[..., None], ten_flow, jnp.inf)
            return o + _softsplat_xla(ten_in, masked_flow).astype(o.dtype)

        return jax.lax.cond(jnp.any(rem), add_residual, lambda o: o, out)
    return _softsplat_xla(ten_in, ten_flow)


def _softsplat_xla(ten_in: Array, ten_flow: Array) -> Array:
    """Exact scatter-add path (any backend, any flow magnitude)."""
    n, h, w, c = ten_in.shape
    dtype = ten_in.dtype

    xs = jnp.arange(w, dtype=dtype)[None, None, :]
    ys = jnp.arange(h, dtype=dtype)[None, :, None]
    fx = xs + ten_flow[..., 0]
    fy = ys + ten_flow[..., 1]

    finite = jnp.isfinite(fx) & jnp.isfinite(fy)
    fx = jnp.where(finite, fx, -2.0 * w)  # send non-finite targets out of bounds
    fy = jnp.where(finite, fy, -2.0 * h)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    wx1 = fx - x0
    wy1 = fy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    out = jnp.zeros((n, h * w, c), dtype=dtype)
    flat_in = ten_in.reshape(n, h * w, c)

    for dy, wy in ((0, wy0), (1, wy1)):
        for dx, wx in ((0, wx0), (1, wx1)):
            xi = x0i + dx
            yi = y0i + dy
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            wgt = (wx * wy * valid.astype(dtype)).reshape(n, h * w, 1)
            idx = jnp.where(valid, yi * w + xi, 0).reshape(n, h * w)
            out = out.at[
                jnp.arange(n)[:, None], idx
            ].add(flat_in * wgt, mode="drop")
    return out.reshape(n, h, w, c)


def softsplat(
    ten_in: Array,
    ten_flow: Array,
    ten_metric: Optional[Array],
    str_mode: str,
) -> Array:
    """Mode/eps-variant wrapper (reference ``softsplat`` at lines 382-436)."""
    parts = str_mode.split("-")
    base = parts[0]
    assert base in ["sum", "avg", "linear", "soft"], str_mode
    if base in ("sum", "avg"):
        assert ten_metric is None
    else:
        assert ten_metric is not None

    if base == "avg":
        ones = jnp.ones_like(ten_in[..., :1])
        ten_in = jnp.concatenate([ten_in, ones], axis=-1)
    elif base == "linear":
        ten_in = jnp.concatenate([ten_in * ten_metric, ten_metric], axis=-1)
    elif base == "soft":
        m = jnp.exp(ten_metric)
        ten_in = jnp.concatenate([ten_in * m, m], axis=-1)

    ten_out = softsplat_func(ten_in, ten_flow)

    if base in ("avg", "linear", "soft"):
        norm = ten_out[..., -1:]
        eps_mode = parts[1] if len(parts) > 1 else "addeps"
        if eps_mode == "addeps":
            norm = norm + 0.0000001
        elif eps_mode == "zeroeps":
            norm = jnp.where(norm == 0.0, 1.0, norm)
        elif eps_mode == "clipeps":
            norm = jnp.clip(norm, 0.0000001, None)
        else:
            raise ValueError(f"unknown eps mode in {str_mode}")
        ten_out = ten_out[..., :-1] / norm
    return ten_out


_LEGACY_MODES = {
    "summation": "sum",
    "average": "avg",
    "linear": "linear",
    "softmax": "soft",
    # short aliases: eisai's flow_forewarp (eisai_arch.py:1003-1056) passes
    # these after Fannovel16's renaming; the reference FunctionSoftsplat
    # still asserts the long names, so that path crashes upstream — we accept
    # both and implement the intended semantics.
    "sum": "sum",
    "avg": "avg",
    "soft": "soft",
}


def function_softsplat(
    ten_input: Array, ten_flow: Array, ten_metric: Optional[Array], str_type: str
) -> Array:
    """Legacy API (reference ``FunctionSoftsplat``, lines 325-358): same modes under
    their long names, with zeroeps normalization."""
    assert str_type in _LEGACY_MODES, str_type
    base = _LEGACY_MODES[str_type]
    if base == "sum":
        return softsplat(ten_input, ten_flow, None, "sum")
    mode = f"{base}-zeroeps"
    if base in ("linear", "soft"):
        return softsplat(ten_input, ten_flow, ten_metric, mode)
    return softsplat(ten_input, ten_flow, None, mode)
