"""Batched plan executor — the TPU-native replacement for ``generic_frame_loop``.

The reference walks frame pairs in Python, shipping one pair to the GPU and one
result back per model call (``vfi_utils.py:199-216``). Here the expanded
:class:`~.schedule.Plan` is executed level-by-level: every task in a DAG level is
independent, so tasks are gathered into ``[B, H, W, C]`` batches and dispatched as a
single jitted call with a real batch dimension and a per-task timestep vector — the
pattern RIFE's node loop approximates in Python (``rife/__init__.py:185-222``), done
properly with one XLA program.

For clips that fit, frames stay device-resident for the whole plan (the BASELINE
"HBM-resident frame window" north star); nothing round-trips through the host
between tasks. For long clips — where holding every input *and* output in HBM would
OOM — ``run_plan`` automatically switches to a **streaming** mode mirroring the
reference's memory discipline (CPU-preallocated output + bounded device residency,
``vfi_utils.py:173,205-216,293-300``) but batched: inputs live on the host, a
bounded LRU window of originals is device-resident, produced frames are copied back
asynchronously as soon as their last consumer has run. The budget comes from
``hbm_budget_bytes`` (default: env ``CFI_HBM_BUDGET_GB`` or 12 GB).

``clear_cache_after_n_frames`` from the reference API is accepted by the node layer
for schema parity; allocation itself is owned by XLA, and the streaming window is
sized from the HBM budget rather than a flush cadence.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.profiling import maybe_profile
from .schedule import Plan, Source, Task

Array = jnp.ndarray

__all__ = ["run_plan", "run_plan_pair_cached", "run_plan_window4"]


def _profiled(tag: str):
    """Wrap an executor in the optional ``CFI_PROFILE`` JAX profiler trace
    (``utils.profiling``); zero-cost when profiling is off."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with maybe_profile(tag):
                return fn(*args, **kwargs)

        return wrapper

    return deco


def _default_hbm_budget() -> int:
    return int(float(os.environ.get("CFI_HBM_BUDGET_GB", "12")) * 2**30)


class _Progress:
    """Opt-in executor observability (CFI_PROGRESS=1): per-level progress and
    throughput, the TPU analog of the reference's per-pair prints
    (``vfi_utils.py:295-298,326-336``)."""

    def __init__(self, what: str, n_tasks: int):
        self.enabled = os.environ.get("CFI_PROGRESS", "") == "1"
        self.what = what
        self.n_tasks = n_tasks
        self.done = 0
        if self.enabled:
            import time

            self._time = time.perf_counter
            self.t0 = self._time()
            print(f"CFI-VFI: {what}: {n_tasks} interpolation tasks")

    def step(self, n: int, level: int) -> None:
        if not self.enabled:
            return
        self.done += n
        dt = self._time() - self.t0
        fps = self.done / dt if dt > 0 else float("inf")
        print(
            f"CFI-VFI: level {level}: {self.done}/{self.n_tasks} frames "
            f"({fps:.2f} frames/s)"
        )

    def finish(self, n_out: int) -> None:
        if self.enabled:
            dt = self._time() - self.t0
            print(
                f"CFI-VFI done! {self.done} frames generated "
                f"({n_out} total) in {dt:.2f}s"
            )


class _OrigLRU:
    """Bounded device-resident cache of original frames for the streaming
    executors (the TPU version of the reference's per-pair ``.to(DEVICE)``,
    ``vfi_utils.py:205-216``, amortized: window/pair overlap means most lookups
    hit the cache)."""

    def __init__(self, frames_np: np.ndarray, max_resident: int):
        self.frames_np = frames_np
        self.max_resident = max_resident
        self.cache: Dict[int, Array] = {}
        self.lru: List[int] = []

    def get(self, idx: int) -> Array:
        if idx in self.cache:
            self.lru.remove(idx)
            self.lru.append(idx)
            return self.cache[idx]
        arr = jax.device_put(self.frames_np[idx])
        self.cache[idx] = arr
        self.lru.append(idx)
        while len(self.cache) > self.max_resident:
            del self.cache[self.lru.pop(0)]
        return arr


class _StreamOut:
    """Async device→host collector for produced frames: each add() starts the
    D2H copy immediately; flush() drains completed copies, keeping a bounded
    number in flight for transfer/compute overlap."""

    def __init__(self):
        self.in_flight: List = []
        self.host: Dict[int, np.ndarray] = {}

    def add(self, task_id: int, arr: Array) -> None:
        try:
            arr.copy_to_host_async()
        except AttributeError:
            pass
        self.in_flight.append((task_id, arr))

    def flush(self, keep_last: int = 0) -> None:
        while len(self.in_flight) > keep_last:
            tid, arr = self.in_flight.pop(0)
            self.host[tid] = np.asarray(arr)

    def materialize(self, task_id: int) -> np.ndarray:
        """Host copy of one produced frame, draining its in-flight D2H if the
        bounded flush hasn't reached it yet."""
        if task_id not in self.host:
            for i, (tid, arr) in enumerate(self.in_flight):
                if tid == task_id:
                    self.host[tid] = np.asarray(arr)
                    self.in_flight.pop(i)
                    break
        return self.host[task_id]


def _gather(
    frames: Array, produced: Dict[int, Array], sources: Sequence[Source]
) -> Array:
    """Stack a batch of frames addressed by plan sources. Original-frame runs are
    fetched with one take(); task outputs are stacked from the produced map."""
    parts: List[Array] = []
    orig_idx: List[int] = []

    def flush():
        nonlocal orig_idx
        if orig_idx:
            parts.append(jnp.take(frames, jnp.asarray(orig_idx), axis=0))
            orig_idx = []

    for kind, idx in sources:
        if kind == "orig":
            orig_idx.append(idx)
        else:
            flush()
            parts.append(produced[idx][None])
    flush()
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


@_profiled("run_plan")
def run_plan(
    frames: Array,
    plan: Plan,
    model_fn: Callable[[Array, Array, Array], Array],
    batch_size: int = 8,
    out_dtype=None,
    hbm_budget_bytes: Optional[int] = None,
) -> Array:
    """Execute ``plan`` over NHWC ``frames`` with a batched model.

    ``model_fn(f0, f1, t) -> mid`` takes ``[B, H, W, C]`` endpoint batches and a
    ``[B]`` timestep vector (ignored by midpoint-mode models) and returns the
    ``[B, H, W, C]`` intermediate frames. It should be jitted by the caller; the
    executor guarantees a fixed batch shape so at most ``ceil(max_level/B)`` distinct
    widths are seen, all equal to ``batch_size``.

    Long clips whose inputs + outputs would exceed ``hbm_budget_bytes`` are executed
    in streaming mode (host-resident frames, bounded device window, outputs
    assembled on the host) with identical results — see :func:`_run_plan_streaming`.

    Returns the assembled ``[n_outputs, H, W, C]`` frame sequence (a device array in
    resident mode, a host numpy array in streaming mode).
    """
    budget = hbm_budget_bytes or _default_hbm_budget()
    n, h, w, c = frames.shape
    frame_bytes = h * w * c * np.dtype(frames.dtype).itemsize
    resident_estimate = (n + len(plan.output) + 4 * batch_size) * frame_bytes
    if resident_estimate > budget:
        return _run_plan_streaming(
            np.asarray(frames), plan, model_fn, batch_size, out_dtype,
            max_resident=max(
                2 * batch_size + 2, budget // (4 * frame_bytes)
            ),
        )
    frames = jnp.asarray(frames)
    produced: Dict[int, Array] = {}
    progress = _Progress("run_plan", len(plan.tasks))

    for li, level in enumerate(plan.levels):
        for start in range(0, len(level), batch_size):
            chunk: List[Task] = level[start : start + batch_size]
            n = len(chunk)
            pad = batch_size - n
            src0 = [t.src0 for t in chunk] + [chunk[0].src0] * pad
            src1 = [t.src1 for t in chunk] + [chunk[0].src1] * pad
            ts = [t.t if t.t is not None else 0.5 for t in chunk]
            ts += [ts[0]] * pad
            f0 = _gather(frames, produced, src0)
            f1 = _gather(frames, produced, src1)
            tvec = jnp.asarray(ts, dtype=frames.dtype)
            mids = model_fn(f0, f1, tvec)
            for i, task in enumerate(chunk):
                produced[task.id] = mids[i]
            progress.step(n, li)

    out = _gather(frames, produced, plan.output)
    progress.finish(len(plan.output))
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def _run_plan_streaming(
    frames_np: np.ndarray,
    plan: Plan,
    model_fn: Callable[[Array, Array, Array], Array],
    batch_size: int,
    out_dtype,
    max_resident: int,
) -> np.ndarray:
    """Bounded-HBM plan execution for long clips.

    Mirrors the reference's long-clip memory story (CPU-preallocated output,
    one device window at a time, ``vfi_utils.py:173,205-216``) with batching
    kept intact: inputs stay in host memory; originals are device-put on demand
    into an LRU cache of at most ``max_resident`` frames; each produced frame
    starts an async device→host copy immediately and its device buffer is
    dropped once its last consuming task has run (recursive/bisection plans) —
    so device residency is O(window), not O(clip). Results are bit-identical to
    the resident path: chunking, padding and batch shapes are the same, so the
    same jitted ``model_fn`` executable is reused.
    """
    # remaining-consumer counts for produced frames (inter-level edges)
    consumers: Dict[int, int] = {}
    for task in plan.tasks:
        for kind, idx in (task.src0, task.src1):
            if kind == "task":
                consumers[idx] = consumers.get(idx, 0) + 1

    dev_produced: Dict[int, Array] = {}  # still needed by later tasks
    orig = _OrigLRU(frames_np, max_resident)
    outs = _StreamOut()

    def get_src(src: Source) -> Array:
        kind, idx = src
        if kind == "orig":
            return orig.get(idx)
        if idx in dev_produced:
            return dev_produced[idx]
        # consumer ran after the buffer was retired (shouldn't happen with
        # correct counts, but stay correct): re-upload the host copy
        return jax.device_put(outs.materialize(idx))

    progress = _Progress("run_plan[streaming]", len(plan.tasks))
    for li, level in enumerate(plan.levels):
        for start in range(0, len(level), batch_size):
            chunk: List[Task] = level[start : start + batch_size]
            n = len(chunk)
            pad = batch_size - n
            src0 = [t.src0 for t in chunk] + [chunk[0].src0] * pad
            src1 = [t.src1 for t in chunk] + [chunk[0].src1] * pad
            ts = [t.t if t.t is not None else 0.5 for t in chunk]
            ts += [ts[0]] * pad
            f0 = jnp.stack([get_src(s) for s in src0])
            f1 = jnp.stack([get_src(s) for s in src1])
            tvec = jnp.asarray(ts, dtype=f0.dtype)
            mids = model_fn(f0, f1, tvec)
            progress.step(n, li)
            for i, task in enumerate(chunk):
                m = mids[i]
                outs.add(task.id, m)
                if consumers.get(task.id, 0) > 0:
                    dev_produced[task.id] = m
            # release device buffers whose consumers have all run
            for task in chunk:
                for kind, idx in (task.src0, task.src1):
                    if kind == "task":
                        consumers[idx] -= 1
                        if consumers[idx] == 0:
                            dev_produced.pop(idx, None)
            # keep one chunk of D2H copies in flight for overlap
            outs.flush(keep_last=batch_size)

    outs.flush(keep_last=0)
    progress.finish(len(plan.output))

    np_dtype = np.dtype(out_dtype) if out_dtype is not None else frames_np.dtype
    out = np.empty((len(plan.output),) + frames_np.shape[1:], np_dtype)
    for i, (kind, idx) in enumerate(plan.output):
        out[i] = frames_np[idx] if kind == "orig" else outs.host[idx]
    return out


@_profiled("run_plan_window4")
def run_plan_window4(
    frames: Array,
    plan: Plan,
    model_fn: Callable[[Array, Array, Array, Array], Array],
    batch_size: int = 4,
    out_dtype=None,
    hbm_budget_bytes: Optional[int] = None,
) -> Array:
    """Execute a :func:`~.schedule.plan_window4` plan.

    ``model_fn(f0, f1, f2, f3) -> mid`` consumes ``[B, H, W, C]`` batches of the four
    window frames (window start = ``task.pair``) and returns the frame interpolated
    between ``f1`` and ``f2``.

    Long clips exceeding ``hbm_budget_bytes`` stream like :func:`run_plan`:
    originals live on the host with a device LRU window (consecutive windows
    overlap 3 frames, so the cache hits), outputs copy back asynchronously.
    STMFNet/FLAVR are exactly the heavy-footprint models where the reference's
    per-window loop survives long clips (``stmfnet/__init__.py:58-70``); this
    keeps that property with batching intact.
    """
    budget = hbm_budget_bytes or _default_hbm_budget()
    n_frames, h, w, c = frames.shape
    frame_bytes = h * w * c * np.dtype(frames.dtype).itemsize
    resident_estimate = (
        n_frames + len(plan.output) + 5 * batch_size
    ) * frame_bytes
    if resident_estimate > budget:
        return _run_plan_window4_streaming(
            np.asarray(frames), plan, model_fn, batch_size, out_dtype,
            max_resident=max(4 * batch_size + 4, budget // (4 * frame_bytes)),
        )
    frames = jnp.asarray(frames)
    produced: Dict[int, Array] = {}
    tasks = plan.tasks
    progress = _Progress("run_plan_window4", len(tasks))
    for start in range(0, len(tasks), batch_size):
        chunk = tasks[start : start + batch_size]
        n = len(chunk)
        starts = [t.pair for t in chunk] + [chunk[0].pair] * (batch_size - n)
        idx = jnp.asarray(starts)
        windows = [jnp.take(frames, idx + k, axis=0) for k in range(4)]
        mids = model_fn(*windows)
        for i, task in enumerate(chunk):
            produced[task.id] = mids[i]
        progress.step(n, 0)
    out = _gather(frames, produced, plan.output)
    progress.finish(len(plan.output))
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def _run_plan_window4_streaming(
    frames_np: np.ndarray,
    plan: Plan,
    model_fn: Callable[[Array, Array, Array, Array], Array],
    batch_size: int,
    out_dtype,
    max_resident: int,
) -> np.ndarray:
    """Bounded-HBM window4 execution; bit-identical to the resident path (same
    chunking and batch shapes, so the same jitted executable runs)."""
    orig = _OrigLRU(frames_np, max_resident)
    outs = _StreamOut()
    tasks = plan.tasks
    progress = _Progress("run_plan_window4[streaming]", len(tasks))
    for start in range(0, len(tasks), batch_size):
        chunk = tasks[start : start + batch_size]
        n = len(chunk)
        starts = [t.pair for t in chunk] + [chunk[0].pair] * (batch_size - n)
        windows = [
            jnp.stack([orig.get(p + k) for p in starts]) for k in range(4)
        ]
        mids = model_fn(*windows)
        for i, task in enumerate(chunk):
            outs.add(task.id, mids[i])
        outs.flush(keep_last=batch_size)
        progress.step(n, 0)
    outs.flush(keep_last=0)
    progress.finish(len(plan.output))

    np_dtype = np.dtype(out_dtype) if out_dtype is not None else frames_np.dtype
    out = np.empty((len(plan.output),) + frames_np.shape[1:], np_dtype)
    for i, (kind, idx) in enumerate(plan.output):
        out[i] = frames_np[idx] if kind == "orig" else outs.host[idx]
    return out


def _pair_groups(plan: Plan):
    """Group a flat plan's tasks by endpoint pair (first-appearance order),
    bucketed by timestep count so every (bucket, chunk) has a static shape."""
    order: List[tuple] = []
    groups: Dict[tuple, List[Task]] = {}
    for task in plan.tasks:
        key = (task.src0, task.src1)
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(task)
    by_count: Dict[int, List[tuple]] = {}
    for key in order:
        by_count.setdefault(len(groups[key]), []).append(key)
    return groups, by_count


@_profiled("run_plan_pair_cached")
def run_plan_pair_cached(
    frames: Array,
    plan: Plan,
    reuse_fn: Callable[[Array, Array], object],
    infer_fn: Callable[[Array, Array, object, Array], Array],
    batch_size: int = 8,
    out_dtype=None,
    hbm_budget_bytes: Optional[int] = None,
) -> Array:
    """Execute a single-level (timestep-mode) plan with per-pair caching.

    ``reuse_fn(f0, f1) -> cache`` computes the timestep-independent state for a
    pair batch once; ``infer_fn(f0, f1, cache, t) -> mid`` produces each
    intermediate. For a multiplier-m schedule this runs the expensive pair
    analysis once instead of m-1 times (the reference recomputes it per
    timestep). Falls back to per-task semantics exactly: tasks are grouped by
    endpoint pair, pairs bucketed by their timestep count so batch shapes stay
    static.

    Long clips exceeding ``hbm_budget_bytes`` stream (host-resident clip,
    device LRU of originals, async D2H of outputs) — GMFSS/M2M/EISAI carry the
    heaviest per-pair state, so bounding residency matters most here (the
    reference's analog is its per-pair CPU loop, ``vfi_utils.py:205-216``).
    """
    assert all(t.depth == 0 for t in plan.tasks), "pair-cached: flat plans only"
    budget = hbm_budget_bytes or _default_hbm_budget()
    n_frames, h, w, c = frames.shape
    frame_bytes = h * w * c * np.dtype(frames.dtype).itemsize
    resident_estimate = (
        n_frames + len(plan.output) + 4 * batch_size
    ) * frame_bytes
    if resident_estimate > budget:
        return _run_plan_pair_cached_streaming(
            np.asarray(frames), plan, reuse_fn, infer_fn, batch_size,
            out_dtype,
            max_resident=max(2 * batch_size + 2, budget // (4 * frame_bytes)),
        )
    frames = jnp.asarray(frames)
    produced: Dict[int, Array] = {}
    groups, by_count = _pair_groups(plan)

    progress = _Progress("run_plan[pair-cached]", len(plan.tasks))
    for m, keys in sorted(by_count.items()):
        for start in range(0, len(keys), batch_size):
            chunk = keys[start : start + batch_size]
            n = len(chunk)
            pad = batch_size - n
            padded = chunk + [chunk[0]] * pad
            f0 = _gather(frames, produced, [k[0] for k in padded])
            f1 = _gather(frames, produced, [k[1] for k in padded])
            cache = reuse_fn(f0, f1)
            for j in range(m):
                ts = [groups[k][j].t for k in chunk]
                ts = [0.5 if t is None else t for t in ts]
                tvec = jnp.asarray(ts + [ts[0]] * pad, dtype=frames.dtype)
                mids = infer_fn(f0, f1, cache, tvec)
                for i, k in enumerate(chunk):
                    produced[groups[k][j].id] = mids[i]
                progress.step(n, 0)

    out = _gather(frames, produced, plan.output)
    progress.finish(len(plan.output))
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def _run_plan_pair_cached_streaming(
    frames_np: np.ndarray,
    plan: Plan,
    reuse_fn: Callable[[Array, Array], object],
    infer_fn: Callable[[Array, Array, object, Array], Array],
    batch_size: int,
    out_dtype,
    max_resident: int,
) -> np.ndarray:
    """Bounded-HBM pair-cached execution; bit-identical to the resident path
    (same grouping, chunking, and batch shapes). Per-pair caches live only for
    their chunk's timestep loop, so device residency is O(batch), not O(clip)."""
    orig = _OrigLRU(frames_np, max_resident)
    outs = _StreamOut()
    groups, by_count = _pair_groups(plan)

    def get_src(src: Source) -> Array:
        kind, idx = src
        assert kind == "orig"  # flat plans: endpoints are original frames
        return orig.get(idx)

    progress = _Progress("run_plan[pair-cached,streaming]", len(plan.tasks))
    for m, keys in sorted(by_count.items()):
        for start in range(0, len(keys), batch_size):
            chunk = keys[start : start + batch_size]
            n = len(chunk)
            pad = batch_size - n
            padded = chunk + [chunk[0]] * pad
            f0 = jnp.stack([get_src(k[0]) for k in padded])
            f1 = jnp.stack([get_src(k[1]) for k in padded])
            cache = reuse_fn(f0, f1)
            for j in range(m):
                ts = [groups[k][j].t for k in chunk]
                ts = [0.5 if t is None else t for t in ts]
                tvec = jnp.asarray(ts + [ts[0]] * pad, dtype=frames_np.dtype)
                mids = infer_fn(f0, f1, cache, tvec)
                for i, k in enumerate(chunk):
                    outs.add(groups[k][j].id, mids[i])
                # flush inside the timestep loop: a multiplier-m pair would
                # otherwise hold m*batch outputs in HBM — exactly the long
                # clip this streaming path exists to bound
                outs.flush(keep_last=batch_size)
                progress.step(n, 0)
    outs.flush(keep_last=0)
    progress.finish(len(plan.output))

    np_dtype = np.dtype(out_dtype) if out_dtype is not None else frames_np.dtype
    out = np.empty((len(plan.output),) + frames_np.shape[1:], np_dtype)
    for i, (kind, idx) in enumerate(plan.output):
        out[i] = frames_np[idx] if kind == "orig" else outs.host[idx]
    return out
