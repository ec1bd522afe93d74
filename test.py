"""Manual smoke test — the reference ``test.py`` equivalent: run a VFI node on
demo frame pairs and write the interpolated sequence as JPEGs + a GIF.

Usage:
    python test.py [--node "RIFE VFI"] [--ckpt rife47.pth]
                   [--frames-dir /root/reference/demo_frames]
                   [--pair anime] [--multiplier 4] [--out test_result]
                   [--random-init]

With ``--random-init`` the model runs with randomly initialized weights
(zero-egress environments cannot download checkpoints): output is not a
meaningful interpolation, but the full node path — scheduling, batching,
TPU kernels, postprocessing — is exercised end to end.
"""

import argparse
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.dirname(__file__)))


def load_pair(frames_dir: str, pair: str):
    from PIL import Image

    paths = []
    for i in (0, 1):
        for ext in ("png", "jpg"):
            p = os.path.join(frames_dir, f"{pair}{i}.{ext}")
            if os.path.exists(p):
                paths.append(p)
                break
    if len(paths) != 2:
        raise SystemExit(f"no frame pair '{pair}' under {frames_dir}")
    return [
        np.asarray(Image.open(p).convert("RGB"), dtype=np.float32) / 255.0
        for p in paths
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--node", default="RIFE VFI")
    ap.add_argument("--ckpt", default="rife47.pth")
    default_frames = os.path.join(os.path.dirname(__file__), "demo_frames")
    ap.add_argument(
        "--frames-dir", default=os.environ.get("DEMO_FRAMES", default_frames)
    )
    ap.add_argument("--pair", default="anime")
    ap.add_argument("--multiplier", type=int, default=4)
    ap.add_argument("--out", default="test_result")
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--random-init", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from comfyui_frame_interpolation_tpu.nodes import NODE_CLASS_MAPPINGS

    f0, f1 = load_pair(args.frames_dir, args.pair)
    frames = jnp.asarray(np.stack([f0, f1, f0, f1]))  # 2 pairs like the reference

    node = NODE_CLASS_MAPPINGS[args.node]()
    kwargs = dict(
        ckpt_name=args.ckpt,
        frames=frames,
        multiplier=args.multiplier,
        batch_size=args.batch_size,
    )
    if args.random_init:
        if args.node != "RIFE VFI":
            raise SystemExit("--random-init is wired for RIFE VFI only")
        from comfyui_frame_interpolation_tpu.models import rife

        arch = rife.CKPT_NAME_VER_DICT[args.ckpt]
        kwargs["params"] = rife.init_params(jax.random.PRNGKey(0), arch)

    result = node.vfi(**kwargs)[0]
    print("output:", result.shape)
    print(f"Generated {result.shape[0]} frames")

    if os.path.exists(args.out):
        shutil.rmtree(args.out)
    os.makedirs(f"{args.out}/video0", exist_ok=True)
    imgs = [
        Image.fromarray(
            np.clip(np.asarray(fr) * 255.0, 0, 255).astype(np.uint8)
        )
        for fr in result
    ]
    for j, im in enumerate(imgs):
        im.save(f"{args.out}/video0/{j}.jpg")
    imgs[0].save(
        f"{args.out}/video0.gif", save_all=True, append_images=imgs[1:],
        optimize=True, duration=1 / 3, loop=0,
    )
    print(f"wrote {args.out}/video0.gif")


if __name__ == "__main__":
    main()
