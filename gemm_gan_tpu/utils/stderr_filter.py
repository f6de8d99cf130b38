"""Suppress one known-benign XLA:CPU stderr false positive (VERDICT r2 #2).

XLA:CPU embeds an AOT-compiled executable in every persistent-cache entry,
stamped with the LLVM target features it was compiled for. On this host
class the compiler ADDS two tuning pseudo-features (``+prefer-no-gather``,
``+prefer-no-scatter`` — the Sapphire-Rapids gather/scatter slowdown
mitigation) that the load-time host-feature probe never REPORTS, so
reloading a cache entry written by the SAME machine logs
``cpu_aot_loader.cc:210`` "machine type ... doesn't match ... could lead to
execution errors such as SIGILL" errors. Measured 2026-08-20 (BASELINE.md
"Compile cache AOT warnings"):

* a fresh entry written and reloaded on one host reproduces the error — it
  is NOT evidence of cross-box cache pollution;
* the entry is still used despite the warning (reload compile 0.39 s ->
  0.02 s on the probe program);
* the only feature delta is the two ``prefer-no-*`` tuning hints, which
  REMOVE instruction usage — they cannot SIGILL.

This module drops exactly those lines from fd 2. A real cross-ISA mismatch
(any other feature named in the message) is passed through untouched, as is
every other stderr byte. Installed by the driver-facing entry points
(``__graft_entry__``, ``bench.py``) whose output tails are inspected;
deliberately NOT installed under pytest, where captured stderr is part of
the failure diagnostics.
"""

from __future__ import annotations

import atexit
import os
import re
import sys
import threading

_BENIGN = re.compile(
    rb"cpu_aot_loader.*Target machine feature \+prefer-no-(gather|scatter)"
    rb" is not +supported")


def is_benign_aot_line(line: bytes | str) -> bool:
    """True iff `line` is the known-false-positive AOT mismatch error."""
    if isinstance(line, str):
        line = line.encode("utf-8", "replace")
    return _BENIGN.search(line) is not None


_installed = False


def install_stderr_aot_filter() -> None:
    """Route fd 2 through a pump thread that drops benign AOT lines.

    XLA's C++ logger writes straight to fd 2, bypassing `sys.stderr`, so a
    Python-level wrapper cannot see it; this dup2's a pipe over fd 2 and
    forwards everything except `is_benign_aot_line` matches to the original
    stderr. Idempotent; restores fd 2 at interpreter exit.
    """
    global _installed
    if _installed:
        return
    _installed = True

    try:
        sys.stderr.flush()
    except Exception:
        pass
    orig_fd = os.dup(2)
    read_fd, write_fd = os.pipe()
    os.dup2(write_fd, 2)
    os.close(write_fd)

    def _forward(data: bytes) -> bool:
        """Write all of `data` to the original stderr; False once it breaks.

        `os.write` may write partially (loop) or fail outright (EPIPE when
        the consumer of our stderr goes away). On failure the pump MUST keep
        reading `read_fd` and discard — if the thread died instead, the
        64 KB pipe over fd 2 would fill and every subsequent stderr write in
        the process (XLA logs, tracebacks) would block forever, turning a
        broken log consumer into a hung chip run.
        """
        while data:
            try:
                n = os.write(orig_fd, data)
            except OSError:
                return False
            data = data[n:]
        return True

    def _pump():
        buf = b""
        sink_broken = False
        while True:
            try:
                chunk = os.read(read_fd, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for ln in lines:
                if not sink_broken and not is_benign_aot_line(ln):
                    sink_broken = not _forward(ln + b"\n")
        if buf and not sink_broken and not is_benign_aot_line(buf):
            _forward(buf)
        os.close(read_fd)

    t = threading.Thread(target=_pump, name="stderr-aot-filter", daemon=True)
    t.start()

    def _restore():
        try:
            sys.stderr.flush()
        except Exception:
            pass
        os.dup2(orig_fd, 2)  # closes the pipe's last write end for us
        t.join(timeout=5)

    atexit.register(_restore)
