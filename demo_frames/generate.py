"""Deterministic procedural demo-frame generator (zero-egress stand-ins).

The reference ships a demo corpus (``/root/reference/demo_frames``: anime/real
pairs, a 1080p ``bocchi`` jpg pair, a 720p ``violet`` png pair, and the 3-frame
``rick/`` sequence) of copyrighted screenshots that cannot be redistributed
here. This script synthesizes pairs with the SAME names, resolutions, and
formats so every reference workflow/smoke-test path (``test.py``,
``bench.py --metric psnr_torch``) runs unchanged: textured scenes with
moderate inter-frame motion (global pan + local swirl), which is what a VFI
demo needs.

Run ``python demo_frames/generate.py`` to (re)create the corpus.
"""

import os

import numpy as np
from PIL import Image

HERE = os.path.dirname(os.path.abspath(__file__))


def _scene(w, h, seed, t):
    """Textured scene at time t: drifting multi-scale sinusoid field plus a
    swirling disc — smooth but feature-rich, good optical-flow fodder."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    # global pan: ~6 px/frame horizontal, 2 px vertical
    px, py = xx + 6.0 * t, yy + 2.0 * t
    for k in range(6):
        fx_, fy_ = rng.uniform(0.004, 0.05, 2)
        ph = rng.uniform(0, 2 * np.pi, 3)
        amp = rng.uniform(0.1, 0.35)
        for ch in range(3):
            img[..., ch] += amp * np.sin(fx_ * px + fy_ * py + ph[ch])
    # swirling disc (local rotation => non-constant flow)
    cx, cy = w * 0.55, h * 0.45
    r = np.hypot(xx - cx, yy - cy)
    ang = np.arctan2(yy - cy, xx - cx) + 0.06 * t
    disc = np.clip(1.0 - r / (0.25 * min(h, w)), 0, 1)
    for ch in range(3):
        img[..., ch] += disc * 0.5 * np.sin(6 * ang + ch)
    img = (img - img.min()) / (np.ptp(img) + 1e-6)
    return (img * 255).astype(np.uint8)


def main():
    specs = [
        ("anime0.png", "anime1.png", 960, 540, 1),
        ("real0.png", "real1.png", 1280, 720, 2),
        ("violet0.png", "violet1.png", 1280, 720, 3),
        ("bocchi0.jpg", "bocchi1.jpg", 1920, 1080, 4),
    ]
    for n0, n1, w, h, seed in specs:
        for t, name in ((0.0, n0), (1.0, n1)):
            path = os.path.join(HERE, name)
            if os.path.exists(path):
                continue
            Image.fromarray(_scene(w, h, seed, t)).save(path)
            print("wrote", path)
    rick = os.path.join(HERE, "rick")
    os.makedirs(rick, exist_ok=True)
    for i, t in ((3, 0.0), (4, 1.0), (5, 2.0)):
        path = os.path.join(rick, f"{i:05d}.png")
        if not os.path.exists(path):
            Image.fromarray(_scene(848, 480, 5, t)).save(path)
            print("wrote", path)
    seq = os.path.join(HERE, "seq")
    os.makedirs(seq, exist_ok=True)
    for i in range(5):
        path = os.path.join(seq, f"{i}.png")
        if not os.path.exists(path):
            Image.fromarray(_scene(960, 540, 6, float(i))).save(path)
            print("wrote", path)


if __name__ == "__main__":
    main()
