"""CPU torch implementations of the reference's CUDA custom ops, used to run
reference archs (M2M, GMFSS, STMFNet, EISAI) on CPU for parity testing.

These transliterate the CUDA kernel semantics (cupy_ops/*.py) with vectorized
torch — an independent oracle path: jnp impls are tested against numpy loop
oracles elsewhere; these exist so the full torch models can execute.
"""

import sys
import types

import torch


class costvol_func:
    @staticmethod
    def apply(one, two):
        n, c, h, w = one.shape
        padded = torch.nn.functional.pad(two, (4, 4, 4, 4))
        chans = []
        for dy in range(-4, 5):
            for dx in range(-4, 5):
                shifted = padded[:, :, 4 + dy : 4 + dy + h, 4 + dx : 4 + dx + w]
                chans.append((one - shifted).abs().mean(1))
        return torch.stack(chans, dim=1)


class softsplat_func:
    @staticmethod
    def apply(ten_in, ten_flow):
        n, c, h, w = ten_in.shape
        dev = ten_in.device
        xs = torch.arange(w, dtype=ten_in.dtype, device=dev).view(1, 1, w)
        ys = torch.arange(h, dtype=ten_in.dtype, device=dev).view(1, h, 1)
        fx = xs + ten_flow[:, 0]
        fy = ys + ten_flow[:, 1]
        finite = torch.isfinite(fx) & torch.isfinite(fy)
        fx = torch.where(finite, fx, torch.full_like(fx, -2.0 * w))
        fy = torch.where(finite, fy, torch.full_like(fy, -2.0 * h))
        x0 = torch.floor(fx)
        y0 = torch.floor(fy)
        out = torch.zeros(n, c, h * w, dtype=ten_in.dtype, device=dev)
        src = ten_in.reshape(n, c, h * w)
        for dy in (0, 1):
            for dx in (0, 1):
                xi = (x0 + dx).long()
                yi = (y0 + dy).long()
                wgt = (1 - (fx - x0 - dx).abs()) * (1 - (fy - y0 - dy).abs())
                valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
                idx = torch.where(valid, yi * w + xi, torch.zeros_like(xi)).reshape(
                    n, 1, h * w
                ).expand(n, c, h * w)
                contrib = src * (wgt * valid.to(ten_in.dtype)).reshape(n, 1, h * w)
                out.scatter_add_(2, idx, contrib)
        return out.reshape(n, c, h, w)


class sepconv_func:
    @staticmethod
    def apply(ten_in, ten_ver, ten_hor):
        n, c, hp, wp = ten_in.shape
        _, k, h, w = ten_ver.shape
        out = torch.zeros(n, c, h, w, dtype=torch.float32)
        for fy in range(k):
            for fx in range(k):
                out += (
                    ten_in[:, :, fy : fy + h, fx : fx + w].float()
                    * ten_ver[:, fy : fy + 1].float()
                    * ten_hor[:, fx : fx + 1].float()
                )
        return out.to(ten_in.dtype)


def _warp_border(img, flow):
    n, c, h, w = img.shape
    xs = torch.arange(w, dtype=img.dtype).view(1, 1, w) + flow[:, 0]
    ys = torch.arange(h, dtype=img.dtype).view(1, h, 1) + flow[:, 1]
    gx = xs / max((w - 1) / 2.0, 1) - 1.0
    gy = ys / max((h - 1) / 2.0, 1) - 1.0
    grid = torch.stack([gx, gy], dim=-1)
    return torch.nn.functional.grid_sample(
        img, grid, mode="bilinear", padding_mode="border", align_corners=True
    )


class FunctionAdaCoF:
    @staticmethod
    def apply(x, weight, alpha, beta, dilation):
        n, c, hp, wp = x.shape
        _, ff, h, w = weight.shape
        f = int(round(ff**0.5))
        out = torch.zeros(n, c, h, w, dtype=torch.float32)
        ys = torch.arange(h).view(1, h, 1)
        xs = torch.arange(w).view(1, 1, w)
        for k in range(f):
            for l in range(f):
                t = k * f + l
                a = alpha[:, t]
                b = beta[:, t]
                ai = a.trunc()
                bi = b.trunc()
                fa = (a - ai).unsqueeze(1)
                fb = (b - bi).unsqueeze(1)
                i0 = (ys + k * dilation + ai.long()).clamp(0, hp - 1)
                j0 = (xs + l * dilation + bi.long()).clamp(0, wp - 1)
                i1 = (ys + k * dilation + ai.long() + 1).clamp(0, hp - 1)
                j1 = (xs + l * dilation + bi.long() + 1).clamp(0, wp - 1)

                def g(iy, ix):
                    flat = x.reshape(n, c, hp * wp)
                    idx = (iy * wp + ix).reshape(n, 1, h * w).expand(n, c, h * w)
                    return flat.gather(2, idx).reshape(n, c, h, w)

                tap = (
                    g(i0, j0) * (1 - fa) * (1 - fb)
                    + g(i1, j0) * fa * (1 - fb)
                    + g(i0, j1) * (1 - fa) * fb
                    + g(i1, j1) * fa * fb
                )
                out += weight[:, t : t + 1] * tap
        return out.to(x.dtype)


def _correlation(one, two):
    n, c, h, w = one.shape
    padded = torch.nn.functional.pad(two, (4, 4, 4, 4))
    chans = []
    for dy in range(-4, 5):
        for dx in range(-4, 5):
            shifted = padded[:, :, 4 + dy : 4 + dy + h, 4 + dx : 4 + dx + w]
            chans.append((one * shifted).mean(1))
    return torch.stack(chans, dim=1)


class FunctionCorrelation:
    @staticmethod
    def apply(one, two):
        return _correlation(one, two)


def FunctionCorrelation_fn(tenFirst, tenSecond):
    return _correlation(tenFirst, tenSecond)


def FunctionSoftsplat(tenInput, tenFlow, tenMetric, strType):
    # accept eisai's short names (reference asserts long names only — a bug)
    strType = {"sum": "summation", "avg": "average", "soft": "softmax"}.get(
        strType, strType
    )
    assert strType in ["summation", "average", "linear", "softmax"]
    if strType == "average":
        tenInput = torch.cat([tenInput, torch.ones_like(tenInput[:, :1])], 1)
    elif strType == "linear":
        tenInput = torch.cat([tenInput * tenMetric, tenMetric], 1)
    elif strType == "softmax":
        tenInput = torch.cat([tenInput * tenMetric.exp(), tenMetric.exp()], 1)
    out = softsplat_func.apply(tenInput, tenFlow)
    if strType != "summation":
        norm = out[:, -1:]
        norm = torch.where(norm == 0.0, torch.ones_like(norm), norm)
        out = out[:, :-1] / norm
    return out


class ModuleSoftsplat(torch.nn.Module):
    def __init__(self, strType):
        super().__init__()
        self.strType = strType

    def forward(self, tenInput, tenFlow, tenMetric):
        return FunctionSoftsplat(tenInput, tenFlow, tenMetric, self.strType)


def softsplat(tenIn, tenFlow, tenMetric, strMode):
    base = strMode.split("-")[0]
    if base == "avg":
        tenIn = torch.cat([tenIn, torch.ones_like(tenIn[:, :1])], 1)
    elif base == "linear":
        tenIn = torch.cat([tenIn * tenMetric, tenMetric], 1)
    elif base == "soft":
        tenIn = torch.cat([tenIn * tenMetric.exp(), tenMetric.exp()], 1)
    out = softsplat_func.apply(tenIn, tenFlow)
    if base in ("avg", "linear", "soft"):
        norm = out[:, -1:]
        parts = strMode.split("-")
        mode = parts[1] if len(parts) > 1 else "addeps"
        if mode == "addeps":
            norm = norm + 1e-7
        elif mode == "zeroeps":
            norm = torch.where(norm == 0.0, torch.ones_like(norm), norm)
        elif mode == "clipeps":
            norm = norm.clip(1e-7, None)
        out = out[:, :-1] / norm
    return out


def batch_edt(img, block=1024):
    expand = False
    if img.dim() == 4:
        img = img.squeeze(1)
        expand = True
    bs, h, w = img.shape
    diam2 = float(h * h + w * w)
    data = (1 - img.float()) * diam2

    def dt1d(d):  # min-plus along last axis
        n = d.shape[-1]
        js = torch.arange(n, dtype=torch.float32)
        d2 = (js.view(-1, 1) - js.view(1, -1)) ** 2
        return (d.unsqueeze(-2) + d2).min(-1).values

    inter = dt1d(data)
    out = dt1d(inter.transpose(1, 2)).transpose(1, 2)
    ans = out.sqrt()
    if expand:
        ans = ans.unsqueeze(1)
    return ans.to(img.dtype)


def install():
    """Register a fake ``vfi_models.ops`` module exposing this op surface."""
    vfi_models = sys.modules.get("vfi_models") or types.ModuleType("vfi_models")
    ops = types.ModuleType("vfi_models.ops")
    ops.softsplat_func = softsplat_func
    ops.costvol_func = costvol_func
    ops.sepconv_func = sepconv_func
    ops.FunctionAdaCoF = FunctionAdaCoF
    ops.FunctionCorrelation = FunctionCorrelation_fn
    ops.ModuleCorrelation = None
    ops.FunctionSoftsplat = FunctionSoftsplat
    ops.ModuleSoftsplat = ModuleSoftsplat
    ops.softsplat = softsplat
    ops.batch_edt = batch_edt
    ops.init = lambda: None
    vfi_models.ops = ops
    sys.modules["vfi_models"] = vfi_models
    sys.modules["vfi_models.ops"] = ops
