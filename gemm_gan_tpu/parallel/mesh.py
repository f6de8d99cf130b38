"""Device mesh construction and distributed init.

The reference has no distributed backend at all (SURVEY.md §2.5); this module
is the TPU-native green-field replacement: a single `jax.sharding.Mesh` with
(data, model) axes. Collectives (grad psum across `data`, activation
all-gathers across `model`) are emitted by XLA from sharding annotations —
never hand-written. Within a slice traffic rides ICI; across slices, DCN.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def distributed_init():
    """Initialize multi-host JAX if launched under a multi-process runtime.

    Safe to call unconditionally: no-ops for single-process runs.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. data=-1 consumes all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))
