"""Optional JAX profiler hook (SURVEY §5: "TPU build should add real
timing/throughput counters + optional JAX profiler hooks").

Set ``CFI_PROFILE=<dir>`` to capture an XLA/TPU trace of any executor run
(:func:`core.loop.run_plan` and friends) or ``bench.py`` measurement into
``<dir>/<tag>``. View with TensorBoard's profile plugin or Perfetto
(``trace.json.gz`` inside the run directory).

The hook is zero-cost when the env var is unset (no jax.profiler import).
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

__all__ = ["maybe_profile", "profiling_enabled"]


def profiling_enabled() -> bool:
    return bool(os.environ.get("CFI_PROFILE"))


@contextlib.contextmanager
def maybe_profile(tag: Optional[str] = None) -> Iterator[None]:
    """Wrap a region in ``jax.profiler.trace(CFI_PROFILE[/tag])`` when the
    ``CFI_PROFILE`` env var is set; no-op otherwise. Nested calls don't
    re-enter the profiler (JAX supports one active trace per process)."""
    base = os.environ.get("CFI_PROFILE")
    global _active
    if not base or _active:
        yield
        return
    import jax

    path = os.path.join(base, tag) if tag else base
    os.makedirs(path, exist_ok=True)
    _active = True
    try:
        with jax.profiler.trace(path):
            yield
    finally:
        _active = False


_active = False
