"""Build the native C++ extensions (ctypes shared libraries)."""

from __future__ import annotations

import os
import subprocess


LIBS = {
    "libotemd.so": "ot_emd.cpp",
    "libhistforest.so": "hist_forest.cpp",
}


def _build_one(here: str, lib: str, src_name: str, verbose: bool) -> str:
    src = os.path.join(here, src_name)
    out = os.path.join(here, lib)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-o", out, src]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed ({src_name}):\n{res.stderr}")
    if verbose:
        print(f"built {out}")
    return out


def build(verbose: bool = False, lib: str = "libotemd.so"):
    """Build one shared library (default: the OT solver) and return its path."""
    here = os.path.dirname(__file__)
    return _build_one(here, lib, LIBS[lib], verbose)


def build_all(verbose: bool = False):
    here = os.path.dirname(__file__)
    return [_build_one(here, lib, src, verbose) for lib, src in LIBS.items()]


def load_native_lib(lib: str):
    """Rebuild-if-stale then dlopen `lib`; None when neither works.

    Always goes through `build()` (a no-op when the .so is newer than its
    source) so source edits don't silently keep loading a stale committed
    binary. Falls back to an existing .so when the toolchain is absent, and
    returns None instead of raising when the binary can't be loaded on this
    platform (callers then use their pure-Python fallbacks).
    """
    import ctypes

    try:
        path = build(lib=lib)
    except Exception:
        path = os.path.join(os.path.dirname(__file__), lib)
        if not os.path.exists(path):
            return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


if __name__ == "__main__":
    build_all(verbose=True)
