"""Checkpoint conversion: torch ``state_dict`` → nested JAX parameter trees.

The reference downloads ``.pth``/``.pkl`` torch pickles (multi-mirror failover,
``vfi_utils.py:118-133``) with several container layouts — raw state dicts, nested
under ``state_dict``/``model_state_dict``/``model`` keys, ``module.`` prefixes
(``flavr/__init__.py:16``, ``cain/__init__.py:43-44``, ``stmfnet/__init__.py:52``,
``atm/__init__.py:131``, ``momo/__init__.py:123``) and one TorchScript archive
(FILM). Conversion here is **mechanical**: keys split on ``.`` into a nested dict,
tensors become numpy/jnp leaves in torch layout; layer functions in
``models/common.py`` own the layout transposes, so no per-model mapping tables are
needed — a model's apply() indexes the same tree shape the torch module had.

torch is only required when actually converting a checkpoint (it is not imported at
module load), so the framework runs torch-free once weights are converted. Converted
trees round-trip via numpy ``.npz`` with ``/``-joined keys.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

__all__ = [
    "nest_state_dict",
    "flatten_tree",
    "load_torch_state_dict",
    "to_jax_tree",
    "save_npz",
    "load_npz",
    "save_orbax",
    "load_orbax",
    "main",
]


def nest_state_dict(sd: Mapping[str, Any], strip_prefixes=("module.",)) -> Dict:
    """Flat ``a.b.c -> tensor`` mapping → nested dict tree of numpy leaves."""
    tree: Dict[str, Any] = {}
    for key, value in sd.items():
        for p in strip_prefixes:
            if key.startswith(p):
                key = key[len(p):]
        parts = key.split(".")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise ValueError(f"key conflict at {part} in {key}")
        node[parts[-1]] = _to_numpy(value)
    return tree


def _to_numpy(value):
    if isinstance(value, np.ndarray):
        return value
    # torch tensor without importing torch at module level
    if hasattr(value, "detach"):
        return value.detach().cpu().numpy()
    return np.asarray(value)


def flatten_tree(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(flatten_tree(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def to_jax_tree(tree: Dict, dtype=None) -> Dict:
    """Nested numpy tree → nested jnp tree (optionally casting float leaves)."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = to_jax_tree(v, dtype)
        else:
            arr = jnp.asarray(v)
            if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
                arr = arr.astype(dtype)
            out[k] = arr
    return out


def is_torchscript_archive(path: str) -> bool:
    """True if ``path`` is a TorchScript zip archive (e.g. FILM's
    ``film_net_fp32.pt``, loaded upstream via ``torch.jit.load`` —
    reference ``film/__init__.py:74``) rather than a plain torch pickle.

    TorchScript archives are zip files containing a ``constants.pkl`` member;
    plain ``torch.save`` zips contain ``data.pkl`` instead."""
    import zipfile

    if not zipfile.is_zipfile(path):
        return False
    try:
        with zipfile.ZipFile(path) as zf:
            return any(name.endswith("constants.pkl") for name in zf.namelist())
    except Exception:
        return False


def load_torch_state_dict(
    path: str,
    nested_keys=(
        "state_dict",        # AMT/CAIN/FLAVR/STMFNet (amt/__init__.py:65, ...)
        "model_state_dict",  # ATM (atm/__init__.py:131)
        "model",             # MoMo (momo/__init__.py:123)
        "state_dict_Model",  # XVFI (xvfi/__init__.py:37)
    ),
) -> Dict:
    """Load a torch pickle OR TorchScript archive and return the (un-nested,
    un-prefixed) state dict as a nested numpy tree."""
    import torch

    if is_torchscript_archive(path):
        # TorchScript archive (FILM): torch.load would hand back a
        # RecursiveScriptModule whose .items() crashes; route through jit.load
        module = torch.jit.load(path, map_location="cpu")
        return nest_state_dict(module.state_dict())
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for k in nested_keys:
            if k in obj and isinstance(obj[k], dict):
                obj = obj[k]
                break
    return nest_state_dict(obj)


def save_npz(tree: Dict, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flatten_tree(tree))


def load_npz(path: str) -> Dict:
    flat = np.load(path)
    tree: Dict[str, Any] = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = flat[key]
    return tree


def save_orbax(tree: Dict, path: str) -> None:
    """Save a converted tree as an orbax checkpoint directory (the JAX-native
    format for sharded/async restore; ``.npz`` stays the default cache)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), tree)


def load_orbax(path: str) -> Dict:
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer().restore(os.path.abspath(path))


def main(argv=None) -> int:
    """One-time torch→JAX conversion CLI (SURVEY §5 checkpoint/resume row):

    ``python -m comfyui_frame_interpolation_tpu.utils.ckpt SRC.pth [DST]``

    handles every reference container layout (raw/nested/``module.``-prefixed
    pickles, TorchScript archives). ``DST`` ending in ``.npz`` (default:
    ``SRC`` with ``.npz``) writes the flat-key numpy archive the framework's
    loader caches; a directory path writes an orbax checkpoint instead.
    """
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("src", help="torch .pth/.pkl pickle or TorchScript archive")
    ap.add_argument("dst", nargs="?", help=".npz file or orbax directory")
    args = ap.parse_args(argv)
    tree = load_torch_state_dict(args.src)
    dst = args.dst or os.path.splitext(args.src)[0] + ".npz"
    if dst.endswith(".npz"):
        save_npz(tree, dst)
    else:
        save_orbax(tree, dst)
    n = len(flatten_tree(tree))
    print(f"converted {args.src} -> {dst} ({n} tensors)")
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via tests calling main
    raise SystemExit(main())
