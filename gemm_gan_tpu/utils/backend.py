"""Bounded accelerator-backend probing.

`jax.devices()` HANGS indefinitely while a tunneled backend is down
(observed multi-hour axon outage — CLAUDE.md), which would wedge any
entry point that calls it first. `wait_for_backend` probes in a SUBPROCESS
with a timeout and bounded retries so callers can fail fast with a clear
message instead of hanging; used by `bench.py` and the on-chip scripts
(`quality_experiment.py`, `validate_dynamics.py`).
"""

from __future__ import annotations

import subprocess
import sys
import time


def wait_for_backend(attempts: int = 6, probe_timeout: int = 90,
                     sleep_s: int = 120) -> bool:
    """True once a probe subprocess sees >= 1 device; False after
    `attempts` timed-out probes (~12 min at the defaults).

    Only TIMEOUTS are retried — a tunnel outage looks like a hang, so
    waiting can help. A probe that exits nonzero (import error, backend
    registration failure, UNAVAILABLE raised promptly) is deterministic:
    retrying 6x with 120 s sleeps would cost ~10 min and still fail, and
    swallowing its stderr would hide the actual cause (ADVICE r4) — fail
    fast after TWO such errors (one immediate retry covers the observed
    transient "response body closed" tunnel failures) and print the
    stderr tail."""
    errors = 0
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert len(jax.devices()) >= 1"],
                timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                return True
            errors += 1
            tail = r.stderr.decode(errors="replace").strip().splitlines()[-8:]
            print("backend probe exited nonzero; stderr tail:\n  "
                  + "\n  ".join(tail), file=sys.stderr, flush=True)
            if errors >= 2:
                print("backend probe failed deterministically twice "
                      "(not a timeout) — giving up early",
                      file=sys.stderr, flush=True)
                return False
        except subprocess.TimeoutExpired:
            pass
        more = i < attempts - 1
        # the immediate retry after a deterministic error shouldn't wait
        # out a tunnel-outage-sized sleep
        wait = 10 if errors else sleep_s
        print(f"backend probe {i + 1}/{attempts} failed"
              + (f"; retrying in {wait}s" if more else ""),
              file=sys.stderr, flush=True)
        if more:
            time.sleep(wait)
    return False
