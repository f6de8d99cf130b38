"""Build the native C++ extensions (ctypes shared libraries)."""

from __future__ import annotations

import os
import subprocess


def build(verbose: bool = False):
    here = os.path.dirname(__file__)
    src = os.path.join(here, "ot_emd.cpp")
    out = os.path.join(here, "libotemd.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", out, src]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"native build failed:\n{res.stderr}")
    if verbose:
        print(f"built {out}")
    return out


if __name__ == "__main__":
    build(verbose=True)
