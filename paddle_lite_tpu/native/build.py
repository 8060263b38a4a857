"""Build/load helper for the native C++ components.

The reference built its native pieces via CMake (``lite.cmake``'s
``lite_cc_library``); here the native surface is small, stable C-ABI shared
libraries compiled on demand with g++ and cached next to the sources
(content-hashed so source edits rebuild automatically).  ctypes binds them —
the environment has no pybind11 (see repo docs), and a C ABI keeps the
Python↔C++ seam trivially debuggable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

_NATIVE_DIR = Path(__file__).parent
_BUILD_DIR = _NATIVE_DIR / "_build"

_CXX_FLAGS = ["-O3", "-std=c++17", "-fPIC", "-shared", "-Wall"]


class NativeBuildError(RuntimeError):
    pass


def _source_hash(src: Path) -> str:
    return hashlib.sha256(src.read_bytes()).hexdigest()[:16]


def build_library(name: str, extra_flags: Optional[list] = None) -> Path:
    """Compile native/<name>.cc into a cached .so; returns its path."""
    src = _NATIVE_DIR / f"{name}.cc"
    if not src.exists():
        raise NativeBuildError(f"no such native source: {src}")
    tag = _source_hash(src)
    out = _BUILD_DIR / f"lib{name}-{tag}.so"
    if out.exists():
        return out
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = ["g++", *_CXX_FLAGS, *(extra_flags or []), str(src), "-o", str(out)]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise NativeBuildError(
            f"g++ failed for {name}:\n{proc.stderr[-2000:]}"
        )
    # drop stale builds of the same lib
    for old in _BUILD_DIR.glob(f"lib{name}-*.so"):
        if old != out:
            old.unlink(missing_ok=True)
    return out


_loaded: dict = {}


def load_library(name: str) -> ctypes.CDLL:
    if name not in _loaded:
        _loaded[name] = ctypes.CDLL(str(build_library(name)))
    return _loaded[name]
