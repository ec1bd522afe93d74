"""Framework configuration (reference: two-key ``config.yaml`` read at
``vfi_utils.py:42-47`` / ``ops/__init__.py:8-16``).

Keys:
  ckpts_path   — where converted model weights live (default ``./ckpts``)
  ops_backend  — "pallas" (TPU kernels) or "xla" (pure-jnp reference ops)
"""

from __future__ import annotations

import os
from typing import Any, Dict

import yaml

_DEFAULTS: Dict[str, Any] = {
    "ckpts_path": "./ckpts",
    "ops_backend": "pallas",
}

_config: Dict[str, Any] = None


def load_config() -> Dict[str, Any]:
    global _config
    if _config is None:
        cfg = dict(_DEFAULTS)
        path = os.environ.get(
            "CFI_TPU_CONFIG",
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "config.yaml"),
        )
        if os.path.exists(path):
            with open(path) as f:
                cfg.update(yaml.safe_load(f) or {})
        _config = cfg
    return _config


def get_ckpt_container_path(model_type: str) -> str:
    cfg = load_config()
    base = cfg["ckpts_path"]
    if not os.path.isabs(base):
        base = os.path.abspath(
            os.path.join(os.path.dirname(os.path.dirname(__file__)), base)
        )
    return os.path.join(base, model_type)


def get_ops_backend() -> str:
    return load_config()["ops_backend"]
