"""On-chip A/B of RAFT correlation-lookup formulations (EISAI 540p shapes).

The RAFT GRU loop is ~88 % of EISAI's runtime (docs/PROBES_r4.md §4) and the
lookup dominates the iteration. Reference semantics: bilinear-sample a
(2r+1)^2 window of the all-pairs volume around coords, per pyramid level
(/root/reference/vfi_models/eisai/eisai_arch.py:196-217). Three formulations
over identical inputs, level-0 shapes (the dominant level):

  tent    — what ships: per-n tent-weight matmuls against the volume
            (einsum 'njh,nhw->njw' then 'niw,njw->nij'); batch=N tiny-M
            matmuls.
  rowslab — vmapped dynamic_slice of [pp, w2] row blocks from each n's own
            volume slab, then shared-fraction lerp (one structured gather).
  feat    — volume-free: vmapped [1, pp, C] row slices of pooled target
            features + immediate query contraction (what regressed EISAI to
            0.02 f/s; included to quantify, cf. models/amt.py _windowed).

Run: python tools/probe_raft_lookup.py  (needs the TPU; ~2 min)
"""
import functools
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from comfyui_frame_interpolation_tpu.utils.benchmark import measure

R = 4
NT = 2 * R + 1
PP = 2 * R + 2


def timeit(fn, *args, iters=20):
    # block_until_ready is a no-op on the axon backend — fence through the
    # host-readback `measure` helper (median-of-rounds) instead
    ms = measure(fn, *args, iters=iters, rounds=3) * 1e3
    return ms, fn(*args)


def make_inputs(b=2, h=68, w=120, c=256, seed=0):
    rng = np.random.default_rng(seed)
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    gy, gx = np.mgrid[0:h, 0:w].astype(np.float32)
    flow = np.stack(
        [2.0 * np.sin(gx / 37.0), -1.5 * np.cos(gy / 29.0)], -1
    )
    coords = np.stack([gx, gy], -1)[None] + flow[None]
    coords = jnp.asarray(np.broadcast_to(coords, (b, h, w, 2)).copy())
    return f1, f2, coords


@jax.jit
def volume(f1, f2):
    b, h, w, c = f1.shape
    a = f1.reshape(b, h * w, c)
    t = f2.reshape(b, h * w, c)
    corr = jnp.einsum("bnc,bmc->bnm", a, t) / math.sqrt(c)
    return corr.reshape(b * h * w, h, w)


@jax.jit
def tent(corr, coords):
    n, h2, w2 = corr.shape
    cen = coords.reshape(n, 2)
    d = jnp.arange(-R, R + 1, dtype=jnp.float32)
    sx = cen[:, 0:1] + d[None]
    sy = cen[:, 1:2] + d[None]
    yg = jnp.arange(h2, dtype=jnp.float32)
    xg = jnp.arange(w2, dtype=jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[..., None] - yg))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[..., None] - xg))
    tmp = jnp.einsum("njh,nhw->njw", wy, corr)
    return jnp.einsum("niw,njw->nij", wx, tmp)


@jax.jit
def rowslab(corr, coords):
    n, h2, w2 = corr.shape
    cen = coords.reshape(n, 2)
    cx, cy = cen[:, 0], cen[:, 1]
    fx0, fy0 = jnp.floor(cx), jnp.floor(cy)
    tx = (cx - fx0)[:, None, None]
    ty = (cy - fy0)[:, None, None]
    bx_v = fx0.astype(jnp.int32) - R
    by_v = fy0.astype(jnp.int32) - R
    ok = (
        (bx_v + NT >= 0) & (bx_v <= w2 - 1)
        & (by_v + NT >= 0) & (by_v <= h2 - 1)
    )
    cp = jnp.pad(corr, ((0, 0), (PP, PP), (PP, PP)))
    by = jnp.clip(by_v + PP, 0, h2 + PP)
    bx = jnp.clip(bx_v + PP, 0, w2 + PP)

    def slab(c2, ry, rx):
        return jax.lax.dynamic_slice(c2, (ry, rx), (PP, PP))

    d = jax.vmap(slab)(cp, by, bx)  # [N, PP, PP]
    d = jnp.where(ok[:, None, None], d, 0.0)
    dy = (1.0 - ty) * d[:, 0:NT, :] + ty * d[:, 1:PP, :]
    dxy = (1.0 - tx) * dy[..., 0:NT] + tx * dy[..., 1:PP]
    return jnp.swapaxes(dxy, -1, -2)


@jax.jit
def feat(f1, f2, coords):
    b, h, w, c = f1.shape
    q = f1.reshape(b, h * w, c)
    hl, wl = h, w
    tp = jnp.pad(f2, ((0, 0), (PP, PP), (PP, PP), (0, 0)))
    cen = coords.reshape(b, h * w, 2)
    cx, cy = cen[..., 0], cen[..., 1]
    fx0, fy0 = jnp.floor(cx), jnp.floor(cy)
    tx = (cx - fx0)[..., None, None]
    ty = (cy - fy0)[..., None, None]
    bx_v = fx0.astype(jnp.int32) - R
    by_v = fy0.astype(jnp.int32) - R
    ok = (
        (bx_v + NT >= 0) & (bx_v <= wl - 1)
        & (by_v + NT >= 0) & (by_v <= hl - 1)
    )
    bx = jnp.clip(bx_v + PP, 0, wl + PP)

    def _slice_rows(t, ry, rx):
        return jax.lax.dynamic_slice(t, (ry, rx, 0), (1, PP, t.shape[-1]))[0]

    slice_q = jax.vmap(_slice_rows, in_axes=(None, 0, 0))
    slice_b = jax.vmap(slice_q, in_axes=(0, 0, 0))
    rows = []
    for ay in range(PP):
        ry = jnp.clip(by_v + PP + ay, 0, hl + 2 * PP - 1)
        sl = slice_b(tp, ry, bx)
        rows.append(jnp.einsum("bqpc,bqc->bqp", sl, q))
    d = jnp.stack(rows, axis=-2)
    d = jnp.where(ok[..., None, None], d, 0.0)
    dy = (1.0 - ty) * d[..., 0:NT, :] + ty * d[..., 1:PP, :]
    dxy = (1.0 - tx) * dy[..., 0:NT] + tx * dy[..., 1:PP]
    return (jnp.swapaxes(dxy, -1, -2) / math.sqrt(c)).reshape(-1, NT, NT)


def main():
    f1, f2, coords = make_inputs()
    corr = volume(f1, f2)
    jax.block_until_ready(corr)
    ms_v, _ = timeit(volume, f1, f2)
    print(f"all-pairs volume build: {ms_v:.2f} ms")
    results = {}
    ms, ref = timeit(tent, corr, coords)
    results["tent"] = ms
    for name, fn, args in (
        ("rowslab", rowslab, (corr, coords)),
        ("feat", feat, (f1, f2, coords)),
    ):
        ms, out = timeit(fn, *args)
        results[name] = ms
        err = float(jnp.max(jnp.abs(out.reshape(ref.shape) - ref)))
        print(f"{name}: {ms:.2f} ms  (max|diff vs tent| {err:.2e})")
    print(f"tent: {results['tent']:.2f} ms")
    print({"probe": "raft_lookup_level0_ms", **results})


if __name__ == "__main__":
    main()
