"""Custom-op surface (reference L2: ``vfi_models/ops/__init__.py``).

The reference dispatches between a CuPy/CUDA backend and a Taichi worker-process
backend. Here the op surface is a single JAX implementation per op with two paths:
a pure-jnp/XLA reference (always available, used for correctness tests and CPU) and
fused Pallas TPU kernels for the hot ops, selected via ``config.ops_backend``.

Ops (semantics documented per module against the reference CUDA kernels):
  warp          — backward bilinear warp (grid_sample align_corners=True, border)
  softsplat     — forward softmax splatting (sum/avg/linear/soft modes)
  sepconv       — adaptive separable convolution (51-tap)
  adacof        — AdaCoF deformable adaptive convolution
  costvol       — 81-channel L1 cost volume (±4 window)
  correlation   — PWC-style 81-channel dot-product correlation
  batch_edt     — batched Euclidean distance transform
"""

from .warp import warp
from .softsplat import softsplat, softsplat_func
from .costvol import costvol_func
from .correlation import correlation_func
from .sepconv import sepconv_func
from .adacof import adacof_func
from .edt import batch_edt

__all__ = [
    "warp",
    "softsplat",
    "softsplat_func",
    "costvol_func",
    "correlation_func",
    "sepconv_func",
    "adacof_func",
    "batch_edt",
]
