"""Environment check — the TPU build's equivalent of the reference's
``install.py`` (which pip-installs a CUDA-version-sniffed cupy wheel,
``install.py:36-59``). There is nothing to compile or download here: the
compute path is JAX/XLA/Pallas. This script verifies the runtime and reports
which ops backend will be used (see ``config.yaml`` / ``core/config.py``).
"""

import sys


def main() -> int:
    try:
        import jax
    except ImportError:
        print("jax is not installed — install a TPU-enabled jax/jaxlib first")
        return 1
    try:
        devs = jax.devices()
    except Exception as e:  # backend init failure
        print(f"jax backend failed to initialize: {e}")
        return 1
    kinds = {d.platform for d in devs}
    print(f"jax {jax.__version__}: {len(devs)} device(s), platforms={sorted(kinds)}")

    from comfyui_frame_interpolation_tpu.core.config import get_ops_backend

    backend = get_ops_backend()
    print(f"ops backend: {backend}")
    if "tpu" not in kinds and backend == "pallas":
        print(
            "note: no TPU visible — Pallas kernels only engage on TPU; "
            "XLA fallbacks will be used"
        )
    try:
        import torch  # noqa: F401
        print("torch available: original .pth/.pkl checkpoints can be converted")
    except ImportError:
        print(
            "torch not available: only pre-converted .npz checkpoints can be "
            "loaded (utils/ckpt.py)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
