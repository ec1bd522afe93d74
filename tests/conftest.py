"""Test configuration: run everything on CPU with 8 virtual devices so sharding
tests exercise a real Mesh without TPU hardware. Must run before jax imports.

Set ``CFI_TEST_TPU=1`` to keep the real TPU visible instead — used by
``tests/test_pallas_kernels.py`` (TPU-gated kernel exactness tests)."""

import os

_USE_TPU = os.environ.get("CFI_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The environment's sitecustomize registers the axon TPU plugin and pins
# jax_platforms before any test code runs; force CPU after the fact.
import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util
import types

import pytest

REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def load_reference_module(relpath: str, name: str):
    """Load a reference arch file directly by path, bypassing the real package
    __init__ side effects, with the external `comfy` host API stubbed out.

    A synthetic parent package pointing at the file's directory is registered so
    that relative imports inside arch files (e.g. cain_arch's ``from .common
    import *``) resolve without executing the package's node __init__.
    """
    import torch

    if "comfy" not in sys.modules:
        comfy = types.ModuleType("comfy")
        mm = types.ModuleType("comfy.model_management")
        mm.get_torch_device = lambda: torch.device("cpu")
        mm.soft_empty_cache = lambda: None
        mm.is_nvidia = lambda: False
        comfy.model_management = mm
        sys.modules["comfy"] = comfy
        sys.modules["comfy.model_management"] = mm
    path = os.path.join(REFERENCE_DIR, relpath)
    pkg_name = f"refpkg_{os.path.basename(os.path.dirname(path))}"
    if pkg_name not in sys.modules:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [os.path.dirname(path)]
        sys.modules[pkg_name] = pkg
    full_name = f"{pkg_name}.{name}"
    spec = importlib.util.spec_from_file_location(full_name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full_name] = mod
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def reference_dir():
    if not has_reference():
        pytest.skip("reference repo not available")
    return REFERENCE_DIR
