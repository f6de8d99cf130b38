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


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize multi-host JAX if launched under a multi-process runtime.

    Safe to call unconditionally: no-ops for single-process runs without
    coordinator configuration. Two launch modes:

    - managed (TPU pods, SLURM, etc.): the runtime exports
      `JAX_COORDINATOR_ADDRESS`/`COORDINATOR_ADDRESS` and process topology;
      `jax.distributed.initialize()` autodetects everything.
    - manual: pass `coordinator_address` ("host:port" of process 0),
      `num_processes`, and this process's `process_id` explicitly.

    After init, `jax.devices()` is the GLOBAL device list (build the mesh
    from it as usual) and each process feeds the engine its own data shard
    — `Batches(process_index=jax.process_index(),
    process_count=jax.process_count())`; the engine assembles global
    batches per-host via `parallel.sharding.place_batch`.
    """
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
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
