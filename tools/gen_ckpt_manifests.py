"""Generate tests/fixtures/ckpt_manifests.json — key/shape manifests of the
reference's real released checkpoints, with their container layouts.

Zero-egress environment: the released ``.pth``/``.pkl``/``.pt`` files cannot be
downloaded here, but their tensor manifests are fully determined by the
reference code: every family loads with ``load_state_dict(..., strict)`` (or
TorchScript, which archives the same state dict), so the key/shape set of each
real file equals the reference arch's ``state_dict()`` for the documented
config, and the container layout (raw / nested / prefixed) is spelled out by
each family's loader, cited per entry below. This script captures both into a
committed fixture; ``tests/test_ckpt_manifests.py`` then synthesizes real-layout
checkpoint files from the fixture and proves the conversion CLI
(``utils/ckpt.py``) handles every one.

Run (CPU, needs /root/reference + torch):
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/gen_ckpt_manifests.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import torch  # noqa: E402

import bench  # noqa: E402  (for _load_ref)

OUT = os.path.join(REPO, "tests", "fixtures", "ckpt_manifests.json")


def tensors_of(sd):
    return {k: list(v.shape) for k, v in sd.items()}


def main():
    torch.manual_seed(0)
    entries = {}

    def add(ckpt, container, source, arch, sd, notes=None):
        entries[ckpt] = {
            "container": container,
            "source": source,
            "arch": arch,
            **({"notes": notes} if notes else {}),
            "tensors": tensors_of(sd),
        }
        print(f"{ckpt}: {len(sd)} tensors ({container})")

    # --- rife47.pth: raw state dict (rife/__init__.py:132)
    rife = bench._load_ref("vfi_models/rife/rife_arch.py", "mf_rife").IFNet(
        arch_ver="4.7"
    )
    add("rife47.pth", "raw", "vfi_models/rife/__init__.py:132",
        "IFNet(arch_ver='4.7')", rife.state_dict())

    # --- film_net_fp32.pt: TorchScript archive (film/__init__.py:74); the
    # archived state dict equals the eager port's
    film = bench._load_ref("vfi_models/film/film_arch.py", "mf_film").Interpolator()
    add("film_net_fp32.pt", "torchscript", "vfi_models/film/__init__.py:74",
        "Interpolator()", film.state_dict())

    # --- IFRNet_S_Vimeo90K.pth: raw (ifrnet/__init__.py:45)
    ifr = bench._load_ref(
        "vfi_models/ifrnet/IFRNet_S_arch.py", "mf_ifrnet"
    ).IRFNet_S()
    add("IFRNet_S_Vimeo90K.pth", "raw", "vfi_models/ifrnet/__init__.py:45",
        "IRFNet_S()", ifr.state_dict())

    # --- M2M.pth: raw (m2m/__init__.py:45)
    m2m = bench._load_ref("vfi_models/m2m/M2M_arch.py", "mf_m2m").M2M_PWC()
    add("M2M.pth", "raw", "vfi_models/m2m/__init__.py:45", "M2M_PWC()",
        m2m.state_dict())

    # --- sepconv.pth: raw (sepconv/__init__.py:44)
    sep = bench._load_ref(
        "vfi_models/sepconv/sepconv_enhanced.py", "mf_sepconv"
    ).Network()
    add("sepconv.pth", "raw", "vfi_models/sepconv/__init__.py:44", "Network()",
        sep.state_dict())

    # --- pretrained_cain.pth: {'state_dict': {'module.'-prefixed}}
    # (cain/__init__.py:42-43)
    cain = bench._load_ref("vfi_models/cain/cain_arch.py", "mf_cain").CAIN(depth=3)
    add("pretrained_cain.pth", "state_dict+module",
        "vfi_models/cain/__init__.py:42-43", "CAIN(depth=3)", cain.state_dict())

    # --- amt-s.pth: {'state_dict': ...} (amt/__init__.py:65)
    amt = bench._load_ref("vfi_models/amt/amt_arch.py", "mf_amt").AMT_S(
        corr_radius=3, corr_lvls=4, num_flows=3
    )
    add("amt-s.pth", "state_dict", "vfi_models/amt/__init__.py:65",
        "AMT_S(corr_radius=3, corr_lvls=4, num_flows=3)", amt.state_dict())

    # --- IFUNet.pth: raw (ifunet/__init__.py:46)
    ifu = bench._load_ref(
        "vfi_models/ifunet/IFUNet_arch.py", "mf_ifunet"
    ).IFUNetModel()
    add("IFUNet.pth", "raw", "vfi_models/ifunet/__init__.py:46",
        "IFUNetModel()", ifu.state_dict())

    # --- XVFInet_Vimeo_exp1_latest.pt: {'state_dict_Model': ...}
    # (xvfi/__init__.py:37)
    import argparse

    xargs = argparse.Namespace(
        gpu=torch.device("cpu"), nf=64, module_scale_factor=2, S_trn=1,
        S_tst=1, img_ch=3,
    )
    xvfi = bench._load_ref("vfi_models/xvfi/xvfi_arch.py", "mf_xvfi").XVFInet(xargs)
    add("XVFInet_Vimeo_exp1_latest.pt", "state_dict_Model",
        "vfi_models/xvfi/__init__.py:37", "XVFInet(Vimeo config)",
        xvfi.state_dict())

    # --- FLAVR_2x.pth: {'state_dict': {'module.'-prefixed}}
    # (flavr/__init__.py:15-16)
    import types

    from conftest import REFERENCE_DIR

    for pkg_name, sub in (("vfi_models", ""), ("vfi_models.flavr", "flavr")):
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = [os.path.join(REFERENCE_DIR, "vfi_models", sub)]
            sys.modules[pkg_name] = pkg
    flavr = bench._load_ref(
        "vfi_models/flavr/flavr_arch.py", "mf_flavr"
    ).UNet_3D_3D("unet_18", n_inputs=4, n_outputs=1, joinType="concat",
                 upmode="transpose")
    add("FLAVR_2x.pth", "state_dict+module", "vfi_models/flavr/__init__.py:15-16",
        "UNet_3D_3D('unet_18', n_inputs=4, n_outputs=1)", flavr.state_dict())

    # --- stmfnet.pth: {'state_dict': ...} (stmfnet/__init__.py:52)
    import torch_ops_stub
    from test_model_parity_stmfnet import _build_model as _build_stmf

    torch_ops_stub.install()
    torch.Tensor.cuda = lambda self, *a, **k: self
    if "vfi_utils" not in sys.modules:
        vu = types.ModuleType("vfi_utils")
        vu.get_ckpt_container_path = lambda mt: "/tmp/ckpts"
        sys.modules["vfi_utils"] = vu
    stmf_ref = bench._load_ref("vfi_models/stmfnet/stmfnet_arch.py", "mf_stmfnet")
    stmf = _build_stmf(stmf_ref)
    add("stmfnet.pth", "state_dict", "vfi_models/stmfnet/__init__.py:52",
        "STMFNet()", stmf.state_dict())

    # --- atm-vfi-lite.pt: {'model_state_dict': ...}; loader strips attn_mask/
    # HW buffer keys after load (atm/__init__.py:131-141)
    from test_model_parity_atm import _install_timm_stub

    _install_timm_stub()
    atm = bench._load_ref("vfi_models/atm/network_lite.py", "mf_atm").Network(
        global_motion=False, ensemble_global_motion=False
    )
    add("atm-vfi-lite.pt", "model_state_dict",
        "vfi_models/atm/__init__.py:129-141",
        "network_lite.Network(global_motion=False)", atm.state_dict(),
        notes="real file also carries attn_mask/HW buffers that the loader "
              "deletes before load_state_dict (atm/__init__.py:132-141); "
              "conversion keeps extra leaves harmlessly (apply() indexes "
              "only what it needs)")

    # --- GMFSS_fortuna_*.pkl: four raw per-submodule state dicts
    # (gmfss_fortuna/__init__.py:11-25, GMFSS_Fortuna_arch.py:1711-1719)
    from test_model_parity_gmfss import _setup_pkgs

    _setup_pkgs()
    gm = bench._load_ref(
        "vfi_models/gmfss_fortuna/GMFSS_Fortuna_arch.py", "mf_gmfss"
    ).Model()
    for sub, fname in (
        ("flownet", "GMFSS_fortuna_flownet.pkl"),
        ("metricnet", "GMFSS_fortuna_metric.pkl"),
        ("feat_ext", "GMFSS_fortuna_feat.pkl"),
        ("fusionnet", "GMFSS_fortuna_fusionnet.pkl"),
    ):
        add(fname, "raw",
            "vfi_models/gmfss_fortuna/GMFSS_Fortuna_arch.py:1711-1719",
            f"GMFSS Model().{sub}", getattr(gm, sub).state_dict())

    # --- EISAI: eisai_ssl.pt / eisai_dtm.pt raw (eisai/__init__.py:23,27);
    # eisai_anime_interp_full.ckpt nests under 'model_state_dict' with a
    # 'module.'-prefix strip (eisai_arch.py:2571-2576)
    from test_model_parity_eisai import (
        _install_cv2_stub, _install_kornia_stub, _install_torchvision_stub,
    )

    _install_kornia_stub()
    _install_torchvision_stub()
    _install_cv2_stub()
    eis = bench._load_ref("vfi_models/eisai/eisai_arch.py", "mf_eisai")
    add("eisai_ssl.pt", "raw", "vfi_models/eisai/__init__.py:23",
        "SoftsplatLite()", eis.SoftsplatLite().state_dict())
    add("eisai_dtm.pt", "raw", "vfi_models/eisai/__init__.py:27", "DTM()",
        eis.DTM().state_dict())
    add("eisai_anime_interp_full.ckpt", "model_state_dict+module",
        "vfi_models/eisai/eisai_arch.py:2570-2576", "RAFT().raft (RFR)",
        eis.RAFT(None).raft.state_dict())

    doc = {
        "_comment": (
            "Key/shape manifests of the reference's real released "
            "checkpoints, derived from the reference archs + loader code "
            "(strict load_state_dict makes the real files' tensor manifest "
            "identical to the arch state_dict; 'source' cites the loader "
            "line establishing each container layout). MoMo has no entry: "
            "its denoiser is diffusers' UNet (vfi_models/momo/unet.py:22-28, "
            "absent in this image). Generated by tools/gen_ckpt_manifests.py."
        ),
        "manifests": entries,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    n = sum(len(e["tensors"]) for e in entries.values())
    print(f"wrote {OUT}: {len(entries)} checkpoints, {n} tensors")


if __name__ == "__main__":
    main()
