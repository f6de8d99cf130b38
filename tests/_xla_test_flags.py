"""Shared XLA_FLAGS construction for the test suite and its subprocess
workers.

MUST be imported and applied before the first `import jax` in a process.
One policy, three consumers (conftest.py and the two multihost workers):
the multihost tests compare worker results BITWISE against in-suite
single-process runs, so every process must compile at the same LLVM
backend optimization level — instruction selection differs across levels.

Level policy: `GEMM_GAN_TEST_XLA_OPT` env (default "0": LLVM -O0 cuts
compile+first-call ~40% for a ~1.7x slower execution of ms-scale test
programs — a large net win for the compile-dominated suite; CLAUDE.md).
"-1" means leave XLA's default level. A `--xla_backend_optimization_level`
already present in the inherited XLA_FLAGS wins over the env policy in
every consumer alike, so a user pinning a level gets it suite-wide.
"""

from __future__ import annotations

import os


def build_xla_flags(device_count: int, base: str | None = None) -> str:
    """Return an XLA_FLAGS string with the virtual device count and the
    suite's backend opt level applied on top of `base` (default: the
    inherited environment value)."""
    flags = os.environ.get("XLA_FLAGS", "") if base is None else base
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags +
                 f" --xla_force_host_platform_device_count={device_count}")
    opt = os.environ.get("GEMM_GAN_TEST_XLA_OPT", "0")
    if opt != "-1" and "xla_backend_optimization_level" not in flags:
        flags = flags + f" --xla_backend_optimization_level={opt}"
    return flags.strip()
