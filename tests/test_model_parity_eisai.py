"""EISAI parity vs the reference torch arch (kornia/torchvision stubbed with
faithful implementations; the CUDA softsplat/EDT ops come from
torch_ops_stub)."""

import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

from conftest import has_reference, load_reference_module
from comfyui_frame_interpolation_tpu.models import eisai
from comfyui_frame_interpolation_tpu.utils.ckpt import nest_state_dict, to_jax_tree

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not has_reference(), reason="reference not mounted"),
]


# ---------------------------------------------------------------------------
# faithful stubs for kornia / torchvision (neither is installed)
# ---------------------------------------------------------------------------


def _gauss1d(k, sigma):
    xs = torch.arange(k, dtype=torch.float64) - (k - 1) / 2.0
    g = torch.exp(-(xs**2) / (2 * sigma**2))
    return (g / g.sum()).float()


def _gaussian_blur2d(img, ksize, sigma, border_type="replicate"):
    kh, kw = ksize
    sh, sw = sigma
    b, c, h, w = img.shape
    pad = (kw // 2, kw // 2, kh // 2, kh // 2)
    x = TF.pad(img, pad, mode="replicate")
    kr = _gauss1d(kh, sh).view(1, 1, kh, 1).repeat(c, 1, 1, 1)
    kc = _gauss1d(kw, sw).view(1, 1, 1, kw).repeat(c, 1, 1, 1)
    x = TF.conv2d(x, kr, groups=c)
    return TF.conv2d(x, kc, groups=c)


def _rgb_to_grayscale(x):
    return 0.299 * x[:, 0:1] + 0.587 * x[:, 1:2] + 0.114 * x[:, 2:3]


def _rgb_to_lab(x):
    lin = torch.where(
        x > 0.04045, ((x + 0.055) / 1.055) ** 2.4, x / 12.92
    )
    r, g, b = lin[:, 0], lin[:, 1], lin[:, 2]
    xx = (0.412453 * r + 0.357580 * g + 0.180423 * b) / 0.950456
    yy = 0.212671 * r + 0.715160 * g + 0.072169 * b
    zz = (0.019334 * r + 0.119193 * g + 0.950227 * b) / 1.088754
    xyz = torch.stack([xx, yy, zz], dim=1)
    f = torch.where(xyz > 0.008856, xyz ** (1.0 / 3.0), 7.787 * xyz + 4.0 / 29.0)
    L = 116.0 * f[:, 1] - 16.0
    a = 500.0 * (f[:, 0] - f[:, 1])
    bb = 200.0 * (f[:, 1] - f[:, 2])
    return torch.stack([L, a, bb], dim=1)


def _erosion(x, kernel):
    k = kernel.shape[0]
    pad = (k // 2, k - 1 - k // 2, k // 2, k - 1 - k // 2)
    xp = TF.pad(x, pad, mode="constant", value=float("inf"))
    return -TF.max_pool2d(-xp, k, stride=1)


def _dilation(x, kernel):
    k = kernel.shape[0]
    pad = (k // 2, k - 1 - k // 2, k // 2, k - 1 - k // 2)
    xp = TF.pad(x, pad, mode="constant", value=float("-inf"))
    return TF.max_pool2d(xp, k, stride=1)


def _opening(x, kernel):
    return _dilation(_erosion(x, kernel), kernel)


def _install_kornia_stub():
    if "kornia" in sys.modules:
        return
    kornia = types.ModuleType("kornia")
    color = types.ModuleType("kornia.color")
    filters = types.ModuleType("kornia.filters")
    morphology = types.ModuleType("kornia.morphology")
    color.rgb_to_grayscale = _rgb_to_grayscale
    color.rgb_to_lab = _rgb_to_lab
    filters.gaussian_blur2d = _gaussian_blur2d
    morphology.opening = _opening
    kornia.color = color
    kornia.filters = filters
    kornia.morphology = morphology
    # eisai_arch calls kornia.color.* via attribute access only
    sys.modules["kornia"] = kornia
    sys.modules["kornia.color"] = color
    sys.modules["kornia.filters"] = filters
    sys.modules["kornia.morphology"] = morphology


# --- canonical resnet50 trunk (torchvision structure) -----------------------


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idn = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        if self.downsample is not None:
            idn = self.downsample(x)
        return self.relu(idn + y)


class _ResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 64, 3, 1)
        self.layer2 = self._make_layer(256, 128, 4, 2)

    @staticmethod
    def _make_layer(inplanes, planes, blocks, stride):
        downsample = nn.Sequential(
            nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
            nn.BatchNorm2d(planes * 4),
        )
        layers = [_Bottleneck(inplanes, planes, stride, downsample)]
        for _ in range(blocks - 1):
            layers.append(_Bottleneck(planes * 4, planes))
        return nn.Sequential(*layers)


class _Resize:
    """T.Resize(smaller_edge) tensor semantics: bilinear, no antialias."""

    def __init__(self, size):
        self.size = size

    def __call__(self, x):
        h, w = x.shape[-2:]
        t = self.size
        out = (t, int(round(w * t / h))) if h <= w else (int(round(h * t / w)), t)
        if (h, w) == out:
            return x
        return TF.interpolate(x, size=out, mode="bilinear", align_corners=False)


class _Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(1, -1, 1, 1)
        self.std = torch.tensor(std).view(1, -1, 1, 1)

    def __call__(self, x):
        return (x - self.mean) / self.std


def _install_torchvision_stub():
    if "torchvision" in sys.modules and hasattr(
        sys.modules["torchvision"], "models"
    ) and hasattr(sys.modules["torchvision"].models, "resnet50"):
        return
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    models = getattr(tv, "models", None) or types.ModuleType("torchvision.models")
    transforms = types.ModuleType("torchvision.transforms")
    tfunc = types.ModuleType("torchvision.transforms.functional")
    models.resnet50 = lambda pretrained=False, **kw: _ResNet50()
    transforms.Resize = _Resize
    transforms.Normalize = _Normalize
    tv.models = models
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = tfunc


def _install_cv2_stub():
    """eisai_arch uses contrib-only ``cv2.optflow`` at module level; stub it
    when the installed opencv build lacks it (also used by bench_eisai)."""
    import cv2

    if not hasattr(cv2, "optflow"):
        class _AnyFactory(types.SimpleNamespace):
            def __getattr__(self, name):
                return lambda *a, **k: None

        cv2.optflow = _AnyFactory()


@pytest.fixture(scope="module")
def ref_eisai():
    import torch_ops_stub

    torch_ops_stub.install()
    _install_kornia_stub()
    _install_torchvision_stub()
    # stray module-level deps of eisai_arch
    for name in ("cv2", "requests", "scipy", "PIL", "tqdm"):
        pytest.importorskip(name.split(".")[0])
    _install_cv2_stub()
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        mod = load_reference_module("vfi_models/eisai/eisai_arch.py", "ref_eisai_arch")
    finally:
        pass  # keep the cuda patch active for forward passes below

    def _forewarp_cpu(img, flow, mode="average", metric=None, mask=False,
                      retain_device=True):
        # flow_forewarp (eisai_arch.py:1003-1056) minus the hard .to("cuda")
        if mode in ("lin", "linear"):
            mode = "linear" if metric is not None else "avg"
        elif mode in ("sm", "softmax"):
            mode = "soft" if metric is not None else "avg"
        flow = flow.flip(dims=(1,))
        img = img.float()
        if mask:
            img = torch.cat([img, torch.ones_like(img[:, :1])], dim=1)
        met = metric.float() if metric is not None else None
        return mod.FunctionSoftsplat(img, flow.float(), met, mode)

    mod.forewarp = mod.flow_forewarp = _forewarp_cpu
    yield mod
    torch.Tensor.cuda = orig_cuda


def _t2j(x):  # torch NCHW → jnp NHWC
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def _j2n(x):  # jnp NHWC → numpy NCHW
    return np.asarray(x).transpose(0, 3, 1, 2)


def test_rfr_flow_parity(ref_eisai):
    from argparse import Namespace

    torch.manual_seed(0)
    model = ref_eisai.RFR(Namespace(small=False, mixed_precision=False)).eval()
    # H, W >= 128: the smallest corr-pyramid level must keep H/64, W/64 >= 2
    # or the reference's bilinear_sampler divides by (size-1) = 0 -> NaN
    im1 = torch.rand(1, 3, 128, 192)
    im2 = torch.rand(1, 3, 128, 192)
    with torch.no_grad():
        f12, _, _ = model(im1, im2, iters=4)
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out = eisai.rfr_flow(params, _t2j(im1), _t2j(im2), iters=4)
    np.testing.assert_allclose(
        _j2n(out), f12.numpy(), rtol=1e-3, atol=2e-3
    )


def test_nedt_parity(ref_eisai):
    torch.manual_seed(1)
    img = torch.rand(2, 3, 120, 184)
    with torch.no_grad():
        ref, _ = ref_eisai.NEDT()(img)
    out = eisai.nedt(_t2j(img))
    np.testing.assert_allclose(_j2n(out), ref.numpy(), rtol=1e-3, atol=1e-4)


def test_half_warper_parity(ref_eisai):
    torch.manual_seed(2)
    img0 = torch.rand(1, 4, 96, 128)
    img1 = torch.rand(1, 4, 96, 128)
    flow0 = torch.randn(1, 2, 96, 128) * 3
    flow1 = torch.randn(1, 2, 96, 128) * 3
    z0 = -torch.rand(1, 1, 96, 128)
    z1 = -torch.rand(1, 1, 96, 128)
    hw = ref_eisai.HalfWarper()
    with torch.no_grad():
        (imgs, flows, masks), _ = hw(img0, img1, flow0, flow1, z0, z1, k=5, t=0.5)
    jimgs, jflows, jmasks = eisai._half_warper(
        _t2j(img0), _t2j(img1), _t2j(flow0), _t2j(flow1), _t2j(z0), _t2j(z1),
        k=5, t=0.5,
    )
    for a, b in zip(jimgs + jflows + jmasks, imgs + flows + masks):
        np.testing.assert_allclose(_j2n(a), b.numpy(), rtol=1e-3, atol=1e-4)


def test_ssl_parity(ref_eisai):
    torch.manual_seed(3)
    model = ref_eisai.SoftsplatLite().eval()
    img0 = torch.rand(1, 3, 540, 960)
    img1 = torch.rand(1, 3, 540, 960)
    flow0 = torch.randn(1, 2, 540, 960) * 4
    flow1 = torch.randn(1, 2, 540, 960) * 4
    x = {
        "images": torch.stack([img0, img1], dim=1),
        "flows": torch.stack([flow0, flow1], dim=1),
    }
    with torch.no_grad():
        ref_out, locs = model(x, t=0.5, return_more=True)
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    out, jlocs = eisai.ssl_forward(
        params, _t2j(img0), _t2j(img1), _t2j(flow0), _t2j(flow1), t=0.5
    )
    np.testing.assert_allclose(
        _j2n(out), ref_out.numpy(), rtol=1e-3, atol=2e-3
    )
    for a, b in zip(jlocs["hw_imgs"], locs["hw_imgs"]):
        np.testing.assert_allclose(_j2n(a), b.numpy(), rtol=1e-3, atol=1e-3)


def test_dtm_parity(ref_eisai):
    torch.manual_seed(4)
    model = ref_eisai.DTM().eval()
    h, w = 128, 224
    out_base = torch.rand(1, 3, h, w)
    locs = {
        "hw_imgs": [torch.rand(1, 4, h, w) for _ in range(4)],
        "hw_masks": [torch.rand(1, 1, h, w) for _ in range(2)],
    }
    with torch.no_grad():
        ref_out, _ = model(None, out_base, locs)
    params = to_jax_tree(nest_state_dict(model.state_dict()))
    jlocs = {
        "hw_imgs": [_t2j(v) for v in locs["hw_imgs"]],
        "hw_masks": [_t2j(v) for v in locs["hw_masks"]],
    }
    out = eisai.dtm_forward(params, _t2j(out_base), jlocs)
    np.testing.assert_allclose(
        _j2n(out), ref_out.numpy(), rtol=1e-3, atol=1e-3
    )


def test_full_pipeline_parity(ref_eisai):
    """RAFT→SSL→DTM wiring as in the node (eisai/__init__.py:30-40); native
    540x960 size (the reference hard-codes it), iters=2 for test speed."""
    torch.manual_seed(5)
    raft = ref_eisai.RAFT(None).eval()
    ssl = ref_eisai.SoftsplatLite().eval()
    dtm = ref_eisai.DTM().eval()
    img0 = torch.rand(1, 3, 540, 960)
    img1 = torch.rand(1, 3, 540, 960)
    with torch.no_grad():
        flow0, _ = raft(img0, img1, iters=2)
        flow1, _ = raft(img1, img0, iters=2)
        x = {
            "images": torch.stack([img0, img1], dim=1),
            "flows": torch.stack([flow0, flow1], dim=1),
        }
        out_ssl, locs = ssl(x, t=0.5, return_more=True)
        out_dtm, _ = dtm(x, out_ssl, locs, return_more=False)
        ref_out = out_dtm[:, :3]
    params = {
        "raft": to_jax_tree(nest_state_dict(raft.state_dict()))["raft"],
        "ssl": to_jax_tree(nest_state_dict(ssl.state_dict())),
        "dtm": to_jax_tree(nest_state_dict(dtm.state_dict())),
    }
    out = eisai.apply(
        params, _t2j(img0), _t2j(img1), t=0.5, iters=2
    )
    # full-chain drift (two RAFTs + softmax splats) amplifies fp noise at a
    # handful of pixels; bound the error distribution instead of elementwise
    diff = np.abs(_j2n(out) - ref_out.numpy())
    assert diff.mean() < 1e-4, diff.mean()
    assert np.quantile(diff, 0.9999) < 5e-3, np.quantile(diff, 0.9999)
    assert diff.max() < 2e-2, diff.max()
