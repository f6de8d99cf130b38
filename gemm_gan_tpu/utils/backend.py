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
    `attempts` timed-out/failed probes (~12 min at the defaults)."""
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert len(jax.devices()) >= 1"],
                timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        more = i < attempts - 1
        print(f"backend probe {i + 1}/{attempts} failed"
              + (f"; retrying in {sleep_s}s" if more else ""),
              file=sys.stderr, flush=True)
        if more:
            time.sleep(sleep_s)
    return False
