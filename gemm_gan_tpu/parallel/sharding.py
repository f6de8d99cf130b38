"""Sharding rules: batch over `data`, gene-dimension matmuls over `model`.

The model is small (~15M params) so DP is the workload's primary strategy
(SURVEY.md §2.5), but the two matmuls touching the ~18.9k-gene dimension —
the generator's output projection [hidden, n_genes] and the critic's input
projection [n_genes + cond, hidden] — dominate FLOPs and memory, and are
tensor-sharded over the `model` axis. Everything else is replicated. XLA
inserts the all-gather/psum collectives implied by these annotations.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def batch_shardings_like(mesh: Mesh, batch: Any):
    """A pytree of NamedShardings sharding every array's leading axis."""
    return jax.tree.map(lambda _: batch_sharding(mesh), batch)


def place_global(x: Any, sharding: NamedSharding):
    """Place ONE array under `sharding`, multi-process-safe.

    `jax.device_put` accepts jax Arrays only onto fully-addressable
    shardings; on a multi-process mesh it admits host (numpy) inputs only
    — each process materializes its addressable shards from its host copy.
    So when the sharding spans processes, route through host data. Callers
    guarantee the value is process-identical (e.g. params initialized from
    the same seed everywhere). Typed PRNG key arrays are unwrapped to their
    uint32 key data for the host trip and re-wrapped after placement.
    """
    import numpy as np

    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    dtype = getattr(x, "dtype", None)
    if dtype is not None and jax.dtypes.issubdtype(dtype, jax.dtypes.prng_key):
        impl = jax.random.key_impl(x)
        data = jax.device_put(np.asarray(jax.random.key_data(x)), sharding)
        return jax.random.wrap_key_data(data, impl=impl)
    return jax.device_put(np.asarray(x), sharding)


def place_batch(mesh: Mesh, batch: Any, sharding: NamedSharding = None,
                expected_global_rows: int = None):
    """Place a host batch dict on the mesh.

    Single-process mesh (every device addressable): `jax.device_put` of the
    full global batch — unchanged fast path. Multi-process mesh (launched
    via `parallel.mesh.distributed_init`): each process passes its OWN
    process-local shard — e.g. from `Batches(process_index=
    jax.process_index(), process_count=jax.process_count())` — and the
    global array is assembled with `jax.make_array_from_process_local_data`,
    so input loading stays per-host with no cross-host data traffic
    (SURVEY.md §2.5 consequence 4: per-host sharded input). Values that are
    already jax Arrays (e.g. assembled upstream) pass through untouched.

    `expected_global_rows` (multi-process only): the global batch size the
    assembled leading axis must equal. Catches the silent-corruption misuse
    of feeding the FULL global batch as a process-local shard — every sample
    would be duplicated `process_count` times with no error otherwise.
    """
    sb = batch_sharding(mesh) if sharding is None else sharding
    if sb.is_fully_addressable:
        return {k: jax.device_put(v, sb) for k, v in batch.items()}
    import numpy as np

    if expected_global_rows is not None:
        n = jax.process_count()
        for k, v in batch.items():
            rows = getattr(v, "shape", (None,))[0]
            if (rows is not None and not isinstance(v, jax.Array)
                    and rows * n > expected_global_rows):
                # strictly-greater: a ragged epoch-tail batch legitimately
                # assembles FEWER global rows; only an oversized assembly
                # (the full global batch fed as a per-process shard, which
                # would silently duplicate every sample) is a misuse
                raise ValueError(
                    f"batch[{k!r}] has {rows} local rows on each of {n} "
                    f"processes -> {rows * n} global, expected at most "
                    f"{expected_global_rows}. On a multi-process mesh pass "
                    "each process's OWN shard (Batches(process_index=..., "
                    "process_count=...)), not the full global batch.")
    return {k: (v if isinstance(v, jax.Array)
                else jax.make_array_from_process_local_data(sb, np.asarray(v)))
            for k, v in batch.items()}


def _spec_for_param(path: str, ndim: int, gene_dim: int, shape) -> P:
    """Tensor-parallel rules keyed on parameter path + shape."""
    is_kernel = path.endswith("kernel")
    is_bias = path.endswith("bias")
    if is_kernel and ndim == 2:
        if shape[1] == gene_dim:  # generator output projection: shard out dim
            return P(None, "model")
        if shape[0] >= gene_dim:  # critic input projection (n_genes [+cond]): shard in dim
            return P("model", None)
    if is_bias and ndim == 1 and shape[0] == gene_dim:
        return P("model")
    return P()


def param_shardings(mesh: Mesh, params: Any, gene_dim: int):
    """NamedShardings for a param pytree under the TP rules above."""

    def one(path, leaf):
        path_str = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        return NamedSharding(mesh, _spec_for_param(path_str, leaf.ndim, gene_dim, leaf.shape))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(mesh: Mesh, params: Any, gene_dim: int):
    """Device-put params according to the TP rules."""
    shardings = param_shardings(mesh, params, gene_dim)
    return jax.tree.map(jax.device_put, params, shardings)
