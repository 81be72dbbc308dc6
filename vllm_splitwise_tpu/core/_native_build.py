"""On-demand build of the native (C++) runtime extensions.

The image has no pybind11 and installs nothing at pip time, so native
modules are compiled lazily with the system toolchain (g++) straight
against the CPython C API and cached next to the package.  A build
failure is never fatal: callers fall back to the pure-Python
implementations (mirroring the reference's optional native modules,
vllm/utils.py + setup.py extension gating).
"""
from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
from pathlib import Path
from typing import Optional

from vllm_splitwise_tpu.logger import init_logger

logger = init_logger(__name__)

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_CACHE = Path(__file__).resolve().parent / "_native_cache"

_loaded: dict = {}


def _so_path(name: str) -> Path:
    tag = sysconfig.get_config_var("SOABI") or "cpython"
    return _CACHE / f"{name}.{tag}.so"


def _needs_rebuild(src: Path, so: Path) -> bool:
    if not so.exists():
        return True
    return src.stat().st_mtime > so.stat().st_mtime


def build_extension(name: str, source: str) -> Optional[Path]:
    """Compile ``csrc/<source>`` into a cached shared object.

    Returns the .so path, or None if the toolchain is unavailable or the
    build fails (callers must degrade to the Python implementation).
    """
    src = _CSRC / source
    if not src.exists():
        logger.warning("native source %s missing", src)
        return None
    so = _so_path(name)
    if not _needs_rebuild(src, so):
        return so
    _CACHE.mkdir(exist_ok=True)
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", str(src), "-o", str(so),
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.warning("native build of %s failed to run: %s", name, e)
        return None
    if proc.returncode != 0:
        logger.warning("native build of %s failed:\n%s", name,
                       proc.stderr[-2000:])
        return None
    return so


def load_extension(name: str, source: str):
    """Build (if needed) and import a native extension module.

    Returns the module, or None on any failure.
    """
    if name in _loaded:
        return _loaded[name]
    if os.environ.get("VLLM_TPU_DISABLE_NATIVE", "0") == "1":
        _loaded[name] = None
        return None
    so = build_extension(name, source)
    module = None
    if so is not None:
        try:
            spec = importlib.util.spec_from_file_location(name, so)
            module = importlib.util.module_from_spec(spec)
            sys.modules[name] = module
            spec.loader.exec_module(module)
        except Exception as e:  # pragma: no cover - defensive
            logger.warning("loading native %s failed: %s", name, e)
            module = None
    _loaded[name] = module
    return module
