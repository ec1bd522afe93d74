"""Checkpoint acquisition with multi-mirror failover and disk cache
(reference ``vfi_utils.py:84-137``).

Downloads the original torch checkpoints from the same release mirrors as the
reference, caches them under ``config.ckpts_path/<model_type>/``, and (separately)
caches the converted JAX parameter tree as ``<name>.npz`` next to the original so
torch is only needed once per checkpoint. In zero-egress environments, a local file
dropped into the cache directory (or an explicit path) is picked up without any
network access.
"""

from __future__ import annotations

import os
import traceback
import urllib.request
from typing import Callable, Dict, List, Optional

from ..core.config import get_ckpt_container_path

BASE_MODEL_DOWNLOAD_URLS = [
    "https://github.com/styler00dollar/VSGAN-tensorrt-docker/releases/download/models/",
    "https://github.com/Fannovel16/ComfyUI-Frame-Interpolation/releases/download/models/",
    "https://github.com/dajes/frame-interpolation-pytorch/releases/download/v1.0.0/",
]

CKPT_FALLBACK_URLS: Dict[str, List[str]] = {
    "rife47.pth": [
        "https://huggingface.co/marduk191/rife/resolve/main/rife47.pth",
        "https://huggingface.co/wavespeed/misc/resolve/main/rife/rife47.pth",
    ],
    "rife49.pth": [
        "https://huggingface.co/marduk191/rife/resolve/main/rife49.pth",
        "https://huggingface.co/hfmaster/models-moved/resolve/main/rife/rife49.pth",
    ],
    "sudo_rife4_269.662_testV1_scale1.pth": [
        "https://huggingface.co/marduk191/rife/resolve/main/sudo_rife4_269.662_testV1_scale1.pth",
    ],
}

__all__ = [
    "load_file_from_github_release",
    "load_file_from_direct_url",
    "get_converted_params",
]


def _download(url: str, dest_dir: str) -> str:
    os.makedirs(dest_dir, exist_ok=True)
    file_name = os.path.basename(urllib.request.urlparse(url).path)
    cached = os.path.join(dest_dir, file_name)
    if not os.path.exists(cached):
        print(f'Downloading: "{url}" to {cached}')
        tmp = cached + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, cached)
    return cached


def load_file_from_github_release(model_type: str, ckpt_name: str) -> str:
    """Try the cache, then every mirror in order (``vfi_utils.py:118-133``)."""
    dest = get_ckpt_container_path(model_type)
    cached = os.path.join(dest, ckpt_name)
    if os.path.exists(cached):
        return cached
    errors = []
    urls = [base + ckpt_name for base in BASE_MODEL_DOWNLOAD_URLS]
    urls += CKPT_FALLBACK_URLS.get(ckpt_name, [])
    for i, url in enumerate(urls):
        try:
            return _download(url, dest)
        except Exception:
            if i < len(urls) - 1:
                print("Failed! Trying another endpoint.")
            errors.append(f"Error when downloading from: {url}\n\n{traceback.format_exc()}")
    raise Exception(
        f"Tried all urls to download {ckpt_name} but no success. Place the file "
        f"manually at {cached} (or a converted {ckpt_name}.npz). Error log:\n\n"
        + "\n\n".join(errors)
    )


def load_file_from_direct_url(model_type: str, url: str) -> str:
    dest = get_ckpt_container_path(model_type)
    cached = os.path.join(dest, os.path.basename(urllib.request.urlparse(url).path))
    if os.path.exists(cached):
        return cached
    return _download(url, dest)


# in-memory parameter-tree cache keyed by (model_type, ckpt_name): node
# executions must reuse the SAME tree object so the nodes' id(params)-keyed
# model-fn caches hit instead of re-loading + re-jitting every run
_params_memcache: Dict[tuple, object] = {}


def get_converted_params(
    model_type: str,
    ckpt_name: str,
    convert: Optional[Callable[[Dict], Dict]] = None,
    url: Optional[str] = None,
):
    """Return the JAX parameter tree for a checkpoint, converting and caching
    as ``.npz`` on first use. ``convert`` post-processes the nested state dict
    (e.g. stripping buffers); defaults to identity. Repeated calls return the
    same in-memory tree (stable ``id``), so downstream jitted-model caches key
    on it safely."""
    from .ckpt import load_npz, load_torch_state_dict, save_npz, to_jax_tree

    memkey = (model_type, ckpt_name)
    if memkey in _params_memcache:
        return _params_memcache[memkey]
    dest = get_ckpt_container_path(model_type)
    npz_path = os.path.join(dest, ckpt_name + ".npz")
    if os.path.exists(npz_path):
        tree = to_jax_tree(load_npz(npz_path))
        _params_memcache[memkey] = tree
        return tree
    if url is not None:
        pth_path = load_file_from_direct_url(model_type, url)
    else:
        pth_path = load_file_from_github_release(model_type, ckpt_name)
    tree = load_torch_state_dict(pth_path)
    if convert is not None:
        tree = convert(tree)
    save_npz(tree, npz_path)
    tree = to_jax_tree(tree)
    _params_memcache[memkey] = tree
    return tree
