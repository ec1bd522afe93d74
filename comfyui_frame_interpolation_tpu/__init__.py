"""TPU-native video frame interpolation engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities and public node
semantics of ``Fannovel16/ComfyUI-Frame-Interpolation`` (see SURVEY.md): a zoo of VFI
models driven by schedule plans (timestep, recursive-midpoint, bisection, 4-frame
window), executed as batched jitted programs with frames resident in HBM.

``NODE_CLASS_MAPPINGS`` mirrors the reference registry (``__init__.py:24-48``); nodes
are registered as their model families land.
"""

from . import core, ops
from .nodes import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS

__version__ = "0.1.0"
