"""TPU-native video frame interpolation engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities and public node
semantics of ``Fannovel16/ComfyUI-Frame-Interpolation`` (see SURVEY.md): a zoo of VFI
models driven by schedule plans (timestep, recursive-midpoint, bisection, 4-frame
window), executed as batched jitted programs with frames resident in HBM.

``NODE_CLASS_MAPPINGS`` mirrors the reference registry (``__init__.py:24-48``); nodes
are registered as their model families land.
"""

import os as _os

import jax as _jax

# Persistent compile cache: Mosaic kernel + XLA compiles at 1080p run minutes
# each; cache them across processes. Prefer the repo-local dir (a dev checkout,
# where benches pre-seed it); for site-packages installs where that path isn't
# writable, fall back to ~/.cache/cfi-jax. CFI_JAX_CACHE=0 or an explicit
# JAX_COMPILATION_CACHE_DIR opts out/overrides.
if _os.environ.get("CFI_JAX_CACHE", "1") == "1" and not _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR"
):

    def _writable_cache_dir():
        candidates = [
            _os.path.abspath(
                _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache")
            ),
            _os.path.join(
                _os.environ.get("XDG_CACHE_HOME")
                or _os.path.join(_os.path.expanduser("~"), ".cache"),
                "cfi-jax",
            ),
        ]
        for d in candidates:
            try:
                _os.makedirs(d, exist_ok=True)
                probe = _os.path.join(d, ".cfi_probe")
                with open(probe, "w"):
                    pass
                _os.remove(probe)
                return d
            except OSError:
                continue
        return None

    _cache_dir = _writable_cache_dir()
    if _cache_dir is not None:
        try:
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # older jax without the knobs: run uncached
            pass

from . import core, ops
from .nodes import NODE_CLASS_MAPPINGS, NODE_DISPLAY_NAME_MAPPINGS

__version__ = "0.1.0"
