"""XLA FLOP/byte census for the slow-four families (CPU, no TPU needed).

The round-4 matrix measured amt 0.49 / eisai 0.18 / gmfss 0.25 / m2m 2.2
frames/sec. This prints cost_analysis for each family's pair-split halves at
the bench resolutions, so on-chip slowstages timings can be compared against
intrinsic FLOP/byte shares (time >> roofline(flops, bytes) => lowering
problem, not architecture cost). Run:
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu CFI_TPU_SPLAT=xla python tools/slow_cost.py
"""
import os, sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import jax
import jax.numpy as jnp
import numpy as np

import bench
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict

DTYPE = jnp.bfloat16


def cost(tag, fn, *args):
    try:
        lowered = jax.jit(fn).lower(*args)
        c = lowered.compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        print(f"{tag}: gflops={c.get('flops', 0) / 1e9:.1f} "
              f"gbytes={c.get('bytes accessed', 0) / 1e9:.2f}", flush=True)
        return jax.jit(fn)(*args)
    except Exception as exc:
        print(f"{tag}: ERROR {exc!r}"[:300], flush=True)
        return None


def frames(b, h, w, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((b, h, w, 3), np.float32))


def main():
    import torch

    bench._tests_dir_importable()
    from conftest import load_reference_module

    # ---- gmfss (1080p b1)
    import test_model_parity_gmfss as G

    from comfyui_frame_interpolation_tpu.models import gmfss

    G._setup_pkgs()
    arch = load_reference_module(
        "vfi_models/gmfss_fortuna/GMFSS_Fortuna_arch.py", "sc_gmfss"
    )
    torch.manual_seed(0)
    gparams = G._params_from(arch.Model())
    r_fn, i_fn = gmfss.make_pair_fns(gparams, union=False, dtype=DTYPE)
    f0, f1 = frames(1, 1080, 1920, 0), frames(1, 1080, 1920, 1)
    t = jnp.full((1,), 0.5, jnp.float32)
    cache = cost("gmfss_reuse_1080p_b1", r_fn, f0, f1)
    if cache is not None:
        cost("gmfss_infer_1080p_b1", i_fn, f0, f1, cache, t)

    # ---- eisai (540p b2): raft iters=12 vs 1, ssl+dtm
    import test_model_parity_eisai as E

    E._install_kornia_stub()
    E._install_torchvision_stub()
    E._install_cv2_stub()
    torch.Tensor.cuda = lambda self, *a, **k: self
    earch = load_reference_module("vfi_models/eisai/eisai_arch.py", "sc_eisai")
    torch.manual_seed(0)
    eparams = {
        "raft": nest_state_dict(earch.RAFT(None).eval().state_dict())["raft"],
        "ssl": nest_state_dict(earch.SoftsplatLite().eval().state_dict()),
        "dtm": nest_state_dict(earch.DTM().eval().state_dict()),
    }
    from comfyui_frame_interpolation_tpu.models import eisai

    f0, f1 = frames(2, 540, 960, 0), frames(2, 540, 960, 1)
    t = jnp.full((2,), 0.5, jnp.float32)
    for it in (12, 1):
        r_fn, i_fn = eisai.make_pair_fns(eparams, dtype=DTYPE, iters=it)
        cache = cost(f"eisai_raft{it}_540p_b2", r_fn, f0, f1)
        if it == 12 and cache is not None:
            cost("eisai_ssl_dtm_540p_b2", i_fn, f0, f1, cache, t)

    # ---- m2m (1080p b4)
    import torch_ops_stub

    torch_ops_stub.install()
    from comfyui_frame_interpolation_tpu.models import m2m

    march = load_reference_module("vfi_models/m2m/M2M_arch.py", "sc_m2m")
    torch.manual_seed(0)
    from comfyui_frame_interpolation_tpu.utils.ckpt import to_jax_tree

    mparams = to_jax_tree(nest_state_dict(march.M2M_PWC().eval().state_dict()))
    r_fn, i_fn = m2m.make_pair_fns(mparams, dtype=DTYPE)
    f0, f1 = frames(4, 1080, 1920, 0), frames(4, 1080, 1920, 1)
    t = jnp.full((4,), 0.5, jnp.float32)
    cache = cost("m2m_reuse_1080p_b4", r_fn, f0, f1)
    if cache is not None:
        cost("m2m_infer_1080p_b4", i_fn, f0, f1, cache, t)

    # ---- amt (1088p b2, post-factorization)
    from comfyui_frame_interpolation_tpu.models import amt

    def build_amt():
        return bench._load_ref("vfi_models/amt/amt_arch.py", "sc_amt").AMT_S(
            corr_radius=3, corr_lvls=4, num_flows=3
        )

    aparams = bench._reference_params(build_amt)
    model_fn = amt.make_model_fn(aparams, "amt-s.pth", dtype=DTYPE)
    f0, f1 = frames(2, 1088, 1920, 0), frames(2, 1088, 1920, 1)
    t = jnp.full((2,), 0.5, jnp.float32)
    cost("amt_full_1088p_b2", model_fn, f0, f1, t)


if __name__ == "__main__":
    main()
