"""Build/load the native tokenization extension (native/nrt_tokenize.cpp).

Compiled lazily on first import with g++ against the running CPython's
headers, cached beside the package. Everything degrades gracefully to the
pure-Python analyzers when a toolchain is unavailable.
"""

from __future__ import annotations

import logging
import subprocess
import sys
import sysconfig
from pathlib import Path

log = logging.getLogger("nrtsearch_tpu.native")

_REPO = Path(__file__).resolve().parent.parent
_SRC = _REPO / "native" / "nrt_tokenize.cpp"
_BUILD_DIR = Path(__file__).resolve().parent / "_native_build"

_module = None
_tried = False


def _so_path() -> Path:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return _BUILD_DIR / f"nrt_native{suffix}"


def _build() -> bool:
    _BUILD_DIR.mkdir(exist_ok=True)
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", f"-I{include}",
        str(_SRC), "-o", str(_so_path()),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        log.warning("native extension build failed (%s); using Python analyzers", e)
        return False


def get() -> object | None:
    """The nrt_native module, or None if unavailable (or NRT_NATIVE=0)."""
    global _module, _tried
    if _module is not None or _tried:
        return _module
    _tried = True
    import os

    if os.environ.get("NRT_NATIVE", "1") == "0":
        return None
    so = _so_path()
    try:
        if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        sys.path.insert(0, str(_BUILD_DIR))
        try:
            import nrt_native  # type: ignore

            _module = nrt_native
        finally:
            sys.path.remove(str(_BUILD_DIR))
    except Exception as e:
        log.warning("native extension unavailable: %s", e)
        _module = None
    return _module
