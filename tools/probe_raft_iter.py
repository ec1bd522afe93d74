"""Per-iteration attribution INSIDE the EISAI RAFT GRU loop (VERDICT r4 #1).

The r4 slowstages probe pinned 88 % of EISAI in the 12-iter RAFT loop at
~520 ms/iter (540p, both directions batched → b=4 at the 1/8 grid), which is
~100x above both the conv FLOP floor and the volume-streaming bandwidth
floor. This probe times each component of one iteration separately, at the
exact composed shapes, to find the real sink:

  lookup   — _corr_lookup over the 4-level volume pyramid
  update   — _update_block (motion encoder + SepConvGRU + heads)
  step     — one full fused iteration (lookup + update + coords add)
  scan12   — the 12-iter lax.scan as composed (amortized per iter)
  upsample — _convex_upsample_flow (runs once, not per iter)

Reference semantics: /root/reference/vfi_models/eisai/eisai_arch.py:772-953.
Run: python tools/probe_raft_iter.py [--dtype bf16] (needs the TPU; ~3 min)
"""
import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from comfyui_frame_interpolation_tpu.models import eisai
from comfyui_frame_interpolation_tpu.utils.benchmark import measure


def tree_cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, tree
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--b", type=int, default=4, help="batch at the 1/8 grid")
    ap.add_argument("--gh", type=int, default=67)
    ap.add_argument("--gw", type=int, default=120)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    # random-init the BasicUpdateBlock param tree at the reference shapes
    # (eisai_arch.py:318-379): torch (O, I, kh, kw) layout per models/common
    rng0 = np.random.default_rng(42)

    def cw(o, i, kh, kw):
        return {
            "weight": jnp.asarray(
                rng0.standard_normal((o, i, kh, kw)) * 0.05, dtype
            ),
            "bias": jnp.asarray(rng0.standard_normal((o,)) * 0.05, dtype),
        }

    p = {"update_block": {
        "encoder": {
            "convc1": cw(256, 324, 1, 1), "convc2": cw(192, 256, 3, 3),
            "convf1": cw(128, 2, 7, 7), "convf2": cw(64, 128, 3, 3),
            "conv": cw(126, 256, 3, 3),
        },
        "gru": {
            "convz1": cw(128, 384, 1, 5), "convr1": cw(128, 384, 1, 5),
            "convq1": cw(128, 384, 1, 5), "convz2": cw(128, 384, 5, 1),
            "convr2": cw(128, 384, 5, 1), "convq2": cw(128, 384, 5, 1),
        },
        "flow_head": {"conv1": cw(256, 128, 3, 3), "conv2": cw(2, 256, 3, 3)},
        "mask": {"0": cw(256, 128, 3, 3), "2": cw(576, 256, 1, 1)},
    }}

    b, gh, gw = args.b, args.gh, args.gw
    rng = np.random.default_rng(0)
    fmap1 = jnp.asarray(rng.standard_normal((b, gh, gw, 256)), jnp.float32)
    fmap2 = jnp.asarray(rng.standard_normal((b, gh, gw, 256)), jnp.float32)
    net = jnp.asarray(rng.standard_normal((b, gh, gw, 128)), jnp.float32)
    inp = jax.nn.relu(
        jnp.asarray(rng.standard_normal((b, gh, gw, 128)), jnp.float32)
    ).astype(dtype)
    gx, gy = np.meshgrid(
        np.arange(gw, dtype=np.float32), np.arange(gh, dtype=np.float32)
    )
    coords0 = jnp.broadcast_to(
        jnp.asarray(np.stack([gx, gy], -1))[None], (b, gh, gw, 2)
    )
    # smooth, in-band displacement — the regime real checkpoints produce
    flow = jnp.stack(
        [2.0 * jnp.sin(coords0[..., 1] / 29.0),
         -1.5 * jnp.cos(coords0[..., 0] / 37.0)], -1
    )
    coords1 = coords0 + flow

    pyr_fn = jax.jit(eisai._corr_pyramid)
    print("building pyramid ...", flush=True)
    pyr = jax.block_until_ready(pyr_fn(fmap1, fmap2))
    pyr_sum = jax.jit(
        lambda a, b: sum(jnp.sum(p) for p in eisai._corr_pyramid(a, b))
    )
    print("measuring pyramid ...", flush=True)
    vol_ms = measure(pyr_sum, fmap1, fmap2, iters=10, rounds=3) * 1e3
    print(f"volume pyramid build: {vol_ms:.2f} ms", flush=True)

    # NB: pass the ~1 GB pyramid as ARGUMENTS, never a closure constant —
    # closed-over arrays can be embedded in the HLO and overwhelm the
    # remote compile helper (this was why earlier probe runs hung here).
    pyr = tuple(pyr)
    lookup = jax.jit(lambda pr, c: eisai._corr_lookup(list(pr), c))
    corr = jax.block_until_ready(lookup(pyr, coords1))
    ms = measure(lookup, pyr, coords1, iters=10, rounds=3) * 1e3
    print(f"lookup (4 levels): {ms:.2f} ms", flush=True)

    upd = jax.jit(
        lambda net, corr, flow: sum(
            jnp.sum(o.astype(jnp.float32))
            for o in eisai._update_block(
                p["update_block"], net, inp, corr.astype(dtype),
                flow.astype(dtype),
            )
        )
    )
    jax.block_until_ready(upd(net, corr, flow))
    ms = measure(upd, net, corr, flow, iters=10, rounds=3) * 1e3
    print(f"update block: {ms:.2f} ms", flush=True)

    def one_step(pr, net, c1):
        corr = eisai._corr_lookup(list(pr), c1)
        fl = c1 - coords0
        net, up_mask, delta = eisai._update_block(
            p["update_block"], net, inp, corr.astype(dtype), fl.astype(dtype)
        )
        return net, c1 + delta.astype(jnp.float32), up_mask

    def _fence3(fn):
        return jax.jit(lambda pr, a, b: sum(
            jnp.sum(o.astype(jnp.float32)) for o in fn(pr, a, b)
        ))

    step = _fence3(lambda pr, net, c1: one_step(pr, net, c1)[:2])
    jax.block_until_ready(step(pyr, net, coords1))
    ms_step = measure(step, pyr, net, coords1, iters=10, rounds=3) * 1e3
    print(f"one full step: {ms_step:.2f} ms", flush=True)

    def scan12(pr, net, c1):
        def body(carry, _):
            net, c1 = carry
            net, c1, _ = one_step(pr, net, c1)
            return (net, c1), None
        (net, c1), _ = jax.lax.scan(body, (net, c1), None, length=12)
        return net, c1

    scan_j = _fence3(scan12)
    jax.block_until_ready(scan_j(pyr, net, coords1))
    ms_scan = measure(scan_j, pyr, net, coords1, iters=3, rounds=3) * 1e3
    print(f"12-iter scan: {ms_scan:.2f} ms ({ms_scan / 12:.2f} /iter)", flush=True)

    mask = jnp.asarray(rng.standard_normal((b, gh, gw, 576)), dtype)
    ups = jax.jit(lambda f, m: eisai._convex_upsample_flow(f, m))
    jax.block_until_ready(ups(flow, mask))
    ms = measure(ups, flow, mask, iters=10, rounds=3) * 1e3
    print(f"convex upsample (once): {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
