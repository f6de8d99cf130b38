"""HBM-resident dataset cache with on-device batch assembly.

SURVEY.md §7 key decision 2: the reference re-reads each case's patch npy
from disk on every `__getitem__` and random-subsamples 256 patches per item
per epoch (/root/reference/src/multi_patch_gan_dataloader.py:31-39). Here the
full (padded) embedding bank lives in HBM once; every batch is a jitted
gather, and the per-item patch subsampling runs on device with a threaded
PRNG key — fresh subsets every step (matching the reference's sampling
semantics, which the host preload in `tcga.load_tcga` freezes), zero host
work, bitwise reproducible.

Subsampling: draw U(0,1) scores per patch slot, push invalid slots to +2,
take the `num_patches` smallest via `lax.top_k` of the negated scores — a
uniform random subset without replacement among the valid slots.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_patches",))
def _subsample_patches(patches, mask, key, num_patches: int):
    scores = jax.random.uniform(key, mask.shape)
    scores = jnp.where(mask, scores, 2.0)
    _, sel = jax.lax.top_k(-scores, num_patches)          # [B, num_patches]
    sub = jnp.take_along_axis(patches, sel[..., None], axis=1)
    sub_mask = jnp.take_along_axis(mask, sel, axis=1)
    return sub * sub_mask[..., None], sub_mask


def _assemble_batch(arrays, idx, key, resample, num_patches, narrowed):
    """Gather + per-item patch subsample + widen: one batch from a bank.

    Shared by `DeviceCache` (replicated bank, global idx) and
    `ShardedDeviceCache` (called inside shard_map on each data shard's
    local bank slice with local idx and a per-shard key)."""
    batch = {k: jnp.take(a, idx, axis=0) for k, a in arrays.items()}
    # subsample BEFORE widening: on whole-slide banks the gathered
    # [B, P_full, D] rows dwarf the [B, num_patches, D] subset, and
    # casting first would materialize the full-width f32 copy the
    # narrow store exists to avoid
    if resample:
        batch["patches"], batch["patch_mask"] = _subsample_patches(
            batch["patches"], batch["patch_mask"], key,
            num_patches=num_patches)
    # batches always leave the cache in f32: the narrow store dtype
    # is an HBM-residency optimization, not a compute precision
    # choice (bf16 compute risks WGAN critic stability)
    for k in narrowed:
        batch[k] = batch[k].astype(jnp.float32)
    return batch


class DeviceCache:
    """Device-resident analogue of `Batches` (same epoch/iter contract)."""

    def __init__(self, data: Dict[str, np.ndarray], batch_size: int,
                 num_patches: Optional[int] = None, seed: int = 42,
                 shuffle: bool = True, drop_remainder: bool = True,
                 sharding=None, embedding_store_dtype=None):
        """`embedding_store_dtype` (e.g. `jnp.bfloat16`): store the large
        float embedding banks (patches/tokens/text_emb) in a narrower dtype
        and cast gathered batches back to f32. Halves the HBM residency of
        the dominant arrays — at real TCGA scale (~10k cases × 256 × 1024
        UNI patches ≈ 10.5 GB f32) the f32 bank alone crowds a 16 GB chip.
        Gene expression, masks, and labels are always stored exactly; the
        cast is an opt-in, documented precision trade on the conditioning
        embeddings only (they were computed by encoders whose activations
        are themselves bf16-tolerant)."""
        n = len(next(iter(data.values())))
        for k, v in data.items():
            assert len(v) == n, f"length mismatch for {k}"
        put = (lambda v: jax.device_put(v, sharding)) if sharding is not None \
            else jax.device_put
        self._narrowed = set()
        if embedding_store_dtype is not None:
            for k in ("patches", "tokens", "text_emb"):
                if k in data:
                    self._narrowed.add(k)

        def prep(k, v):
            v = np.asarray(v)
            if k in self._narrowed:
                v = v.astype(embedding_store_dtype)  # ml_dtypes handles bf16
            return put(v)

        self.arrays = {k: prep(k, v) for k, v in data.items()}
        self.n = n
        self.batch_size = batch_size
        self.num_patches = num_patches
        self.seed = seed
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self._epoch = 0
        self._key = jax.random.key(seed)

        resample = (num_patches is not None and "patches" in self.arrays
                    and self.arrays["patches"].shape[1] > num_patches)

        # The bank is an ARGUMENT of the jitted assemblers, not a closure
        # capture: captured device arrays are serialized into the compiled
        # program as constants, which bloats the executable by the full cache
        # size (and overflows remote-compile request limits on tunneled TPU
        # backends). As an argument it stays a device buffer reference.
        narrowed = frozenset(self._narrowed)

        def assemble(arrays, idx, key):
            return _assemble_batch(arrays, idx, key, resample, num_patches,
                                   narrowed)

        jit_one = jax.jit(assemble)
        # one jitted stacked assembler (a fresh vmap per call would retrace
        # and recompile every epoch)
        jit_many = jax.jit(jax.vmap(assemble, in_axes=(None, 0, 0)))
        self._assemble = lambda idx, key: jit_one(self.arrays, idx, key)
        self._assemble_many = lambda idx, keys: jit_many(self.arrays, idx, keys)
        # pure, untraced assembler for callers that inline the gather into
        # their own program (the engine's streaming scan path) — identical
        # math to the jitted assemblers above
        self.assemble_fn = assemble

    def seek(self, epoch: int):
        """Position the no-arg `epoch()` stream at `epoch` (resume support:
        the next call yields that epoch's deterministic batch order)."""
        self._epoch = epoch

    def __len__(self):
        if self.drop_remainder:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def epoch(self, epoch: Optional[int] = None) -> Iterator[Dict[str, jax.Array]]:
        e = self._epoch if epoch is None else epoch
        if epoch is None:
            self._epoch += 1
        idx = np.arange(self.n)
        if self.shuffle:
            idx = np.random.RandomState(self.seed + e).permutation(idx)
        stop = (self.n // self.batch_size) * self.batch_size \
            if self.drop_remainder else self.n
        ekey = jax.random.fold_in(self._key, e)
        for i, s in enumerate(range(0, stop, self.batch_size)):
            take = idx[s:s + self.batch_size]
            yield self._assemble(jnp.asarray(take),
                                 jax.random.fold_in(ekey, i))

    def __iter__(self):
        return self.epoch()

    @property
    def n_full_batches(self) -> int:
        """Full-size batches per epoch (leading axis of `stacked_epoch`);
        0 means the scan path is unusable — use the per-batch path."""
        return self.n // self.batch_size

    def epoch_spec(self, epoch: Optional[int] = None):
        """(idx [K, B] int32, keys [K]) for one epoch's full-size batches.

        The tiny inputs behind `stacked_epoch`'s gather: callers that inline
        `assemble_fn` into their own scanned program (the engine's streaming
        fit path, `WGANGPEngine.step_many_cached`) consume these directly —
        the whole-epoch [K, B, ...] batch stack is then never materialized,
        so device memory stays O(bank + one batch) instead of O(bank +
        epoch) (at real TCGA scale the stacked patches+tokens alone would be
        ~20 GB). Same idx/keys as `stacked_epoch` — identical training."""
        if self.n_full_batches == 0:
            raise ValueError(
                f"the scan path needs at least one full batch "
                f"(n={self.n}, batch_size={self.batch_size}); "
                "use the per-batch epoch() path")
        e = self._epoch if epoch is None else epoch
        if epoch is None:
            self._epoch += 1
        idx = np.arange(self.n)
        if self.shuffle:
            idx = np.random.RandomState(self.seed + e).permutation(idx)
        # scan requires uniform shapes: a ragged final batch is dropped here
        # regardless of drop_remainder (the per-batch epoch() keeps it)
        K = self.n // self.batch_size
        idx = idx[:K * self.batch_size].reshape(K, self.batch_size)
        ekey = jax.random.fold_in(self._key, e)
        keys = jax.vmap(lambda i: jax.random.fold_in(ekey, i))(jnp.arange(K))
        return jnp.asarray(idx), keys

    def stacked_epoch(self, epoch: Optional[int] = None) -> Dict[str, jax.Array]:
        """Whole epoch as one on-device gather [K, B, ...] (for `lax.scan`
        training: one device program per epoch, zero host dispatch).

        Materializes every batch of the epoch at once — fine at bench/probe
        scale, but at full TCGA scale prefer the streaming path
        (`epoch_spec` + `WGANGPEngine.step_many_cached`), which gathers each
        batch inside the scan body instead."""
        idx, keys = self.epoch_spec(epoch)
        return self._assemble_many(idx, keys)


def _shard_map():
    try:
        from jax import shard_map

        return shard_map, {"check_vma": False}
    except ImportError:  # older jax spells it check_rep under experimental
        from jax.experimental.shard_map import shard_map

        return shard_map, {"check_rep": False}


class ShardedDeviceCache:
    """`DeviceCache` with the bank SHARDED over the mesh's `data` axis.

    The replicated `DeviceCache` puts the full embedding bank on every
    chip; at whole-slide scale that is the binding constraint (10k cases ×
    4,096 × 1024 f32 patches ≈ 170 GB — no chip holds it). Here the case
    axis shards over `data`: per-chip residency is bank/S, and every
    per-step gather is LOCAL to its shard (a `shard_map` around the same
    `_assemble_batch` the replicated cache uses) — zero cross-chip traffic
    for input assembly, matching the per-host sharded-input design of
    SURVEY.md §2.5 (consequence 4) at mesh granularity.

    Sampling contract (documented divergence from `DeviceCache`): each data
    shard draws a fresh without-replacement permutation of ITS OWN cases
    per epoch (key = fold_in(epoch_key, shard_index), computed on device),
    so a global batch is S stacked per-shard blocks of `batch_size/S`
    cases. Same spirit as `Batches(process_index, process_count)` per-host
    sharding: cases never cross shards; every case is visited exactly once
    per epoch within its shard. Patch subsampling stays per-item / per-step
    with per-shard keys.

    Multi-process: each process passes its PROCESS-LOCAL cases; the bank is
    assembled with `jax.make_array_from_process_local_data` (no cross-host
    input traffic). Single-process multi-device: pass the global dataset.
    The epoch's training scan (`WGANGPEngine.step_many_cached`) is one XLA
    program either way — this is the multi-process form of the streaming
    scan fit loop, which the replicated cache cannot provide (its bank
    would re-upload through the host every epoch).
    """

    def __init__(self, data: Dict[str, np.ndarray], batch_size: int, mesh,
                 num_patches: Optional[int] = None, seed: int = 42,
                 embedding_store_dtype=None, shard_patches: bool = False):
        """`shard_patches=True` additionally shards the PATCH axis of
        `patches`/`patch_mask` over the mesh's `model` axis (cases stay on
        `data`) — the sequence-parallel data path (VERDICT r1 #4): at
        whole-slide widths even one data shard's full-width rows exceed a
        chip (4,096×1024 f32 ≈ 16 MB/case ⇒ a 1k-case shard is 16 GB), so
        the bank must shard the same axis `ring_mha` shards. Per-item
        subsampling becomes SHARD-LOCAL: each model shard draws
        num_patches/M of ITS OWN slice with a per-(data,model)-shard key —
        a stratified-by-shard uniform subset (documented divergence from
        the replicated cache's global without-replacement draw), and the
        gathered batch leaves the cache with patches already laid out
        P('data', 'model') — exactly what the `sequence_parallel` fused
        step consumes, no relayout between bank and ring."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        S = int(mesh.shape["data"])
        self.data_shards = S
        M = int(mesh.shape.get("model", 1)) if shard_patches else 1
        self.patch_shards = M
        self.shard_patches = shard_patches and M > 1
        if shard_patches:
            if "patches" not in data:
                raise ValueError("shard_patches=True needs a 'patches' array")
            W = data["patches"].shape[1]
            if W % M:
                raise ValueError(
                    f"patch width {W} not divisible by model axis {M}; pad "
                    "the bank (patch_mask False on the padding)")
            if num_patches is not None and num_patches % M:
                raise ValueError(
                    f"num_patches {num_patches} not divisible by model "
                    f"axis {M} (shard-local subsampling draws "
                    "num_patches/M per shard)")
        if batch_size % S:
            raise ValueError(f"batch_size {batch_size} not divisible by "
                             f"data axis size {S}")
        self.batch_size = batch_size
        self.b_shard = batch_size // S
        self.num_patches = num_patches
        self.seed = seed
        self._epoch = 0
        self._key = jax.random.key(seed)

        sb = NamedSharding(mesh, P("data"))
        if sb.is_fully_addressable:
            shards_here = S
        else:
            nproc = jax.process_count()
            if S % nproc:
                raise ValueError(f"data axis {S} not divisible by "
                                 f"{nproc} processes")
            shards_here = S // nproc
        n_in = len(next(iter(data.values())))
        for k, v in data.items():
            assert len(v) == n_in, f"length mismatch for {k}"
        # equal-size shards are a hard requirement of the single-program
        # gather; surplus cases are dropped (like Batches drop_remainder)
        n_keep = (n_in // shards_here) * shards_here
        if not sb.is_fully_addressable:
            # every process must contribute the SAME case count: a mismatch
            # would give each rank a different idea of the global bank size
            # (make_array_from_process_local_data infers it from local data)
            # and a different epoch length K — the scan's grad collectives
            # would then deadlock far from the real cause. Fail loudly here.
            from jax.experimental import multihost_utils

            counts = np.asarray(multihost_utils.process_allgather(
                np.asarray([n_keep])))
            if not (counts == n_keep).all():
                raise ValueError(
                    "ShardedDeviceCache needs the same per-process case "
                    f"count on every host; got {counts.ravel().tolist()} "
                    "(after trimming to whole shards). Pad or trim the "
                    "per-host datasets to a common size.")

        self._narrowed = set()
        if embedding_store_dtype is not None:
            for k in ("patches", "tokens", "text_emb"):
                if k in data:
                    self._narrowed.add(k)

        if not sb.is_fully_addressable and self.shard_patches:
            # make_array_from_process_local_data gets the FULL patch width
            # from each process; that is only the process's own shard set
            # when every model-axis run of devices stays within one process
            dev = np.asarray(mesh.devices)
            model_ax = list(mesh.axis_names).index("model")
            rows = np.moveaxis(dev, model_ax, -1).reshape(-1, dev.shape[model_ax])
            for row in rows:
                if len({d.process_index for d in row}) > 1:
                    raise NotImplementedError(
                        "shard_patches with a model axis spanning processes "
                        "is not supported; keep each model-axis group within "
                        "one process (e.g. mesh axes ordered (data, model) "
                        "with model size <= local device count)")

        def spec_for(k, ndim):
            if self.shard_patches and k in ("patches", "patch_mask"):
                return NamedSharding(
                    mesh, P(*(["data", "model"] + [None] * (ndim - 2))))
            return sb

        def prep(k, v):
            v = np.asarray(v)[:n_keep]
            if k in self._narrowed:
                v = v.astype(embedding_store_dtype)
            s = spec_for(k, v.ndim)
            if s.is_fully_addressable:
                return jax.device_put(v, s)
            return jax.make_array_from_process_local_data(s, v)

        self.arrays = {k: prep(k, v) for k, v in data.items()}
        self.n = int(next(iter(self.arrays.values())).shape[0])
        self.n_shard = self.n // S
        if self.n_shard < self.b_shard:
            raise ValueError(
                f"{self.n_shard} cases per shard < per-shard batch "
                f"{self.b_shard} (n={self.n}, data={S})")

        resample = (num_patches is not None and "patches" in self.arrays
                    and self.arrays["patches"].shape[1] > num_patches)
        narrowed = frozenset(self._narrowed)
        shard_map, check_kw = _shard_map()
        n_shard, b_shard = self.n_shard, self.b_shard
        patch_sharded = self.shard_patches
        # shard-local subsample target: num_patches/M per model shard
        local_num_patches = (num_patches // M if (resample and patch_sharded)
                             else num_patches)
        P_ = P

        def epoch_perm(ekey):
            """[n] P('data'): each shard's fresh permutation of ITS cases."""

            def local(k):
                s = jax.lax.axis_index("data")
                return jax.random.permutation(jax.random.fold_in(k, s),
                                              n_shard)

            return shard_map(local, mesh=mesh, in_specs=P_(),
                             out_specs=P_("data"), **check_kw)(ekey)

        def _spec(name, ndim):
            if patch_sharded and name in ("patches", "patch_mask"):
                return P_(*(["data", "model"] + [None] * (ndim - 2)))
            return P_("data")

        def gather(arrays, perm, ekey, k):
            """Batch k of the epoch: [batch_size, ...] sharded over data
            (patches additionally over model when `shard_patches`)."""

            def local(arrays_l, perm_l, ek, kk):
                s = jax.lax.axis_index("data")
                idx = jax.lax.dynamic_slice_in_dim(perm_l, kk * b_shard,
                                                   b_shard)
                bk = jax.random.fold_in(jax.random.fold_in(ek, kk), s)
                if patch_sharded:
                    # per-(data, model) shard key so each model shard draws
                    # its own local patch subset
                    bk = jax.random.fold_in(bk, jax.lax.axis_index("model"))
                return _assemble_batch(arrays_l, idx, bk, resample,
                                       local_num_patches, narrowed)

            names = sorted(arrays)
            in_specs = (
                {n: _spec(n, arrays[n].ndim) for n in names}, P_("data"),
                P_(), P_())
            out_specs = {n: _spec(n, arrays[n].ndim) for n in names}
            return shard_map(
                local, mesh=mesh,
                in_specs=in_specs, out_specs=out_specs,
                **check_kw)(arrays, perm, ekey, k)

        # single source of truth for BOTH consumers: the per-batch
        # iterator below and the engine's streaming epoch scan
        # (step_many_cached) inline these, so they yield identical batches
        self.epoch_perm_fn = epoch_perm
        self.gather_fn = gather
        self._jit_gather = jax.jit(
            lambda arrays, ekey, k: gather(arrays, epoch_perm(ekey), ekey, k))

    def seek(self, epoch: int):
        self._epoch = epoch

    def epoch_base_key(self, epoch: Optional[int] = None):
        """The epoch's key (drives per-shard perms + subsample keys)."""
        e = self._epoch if epoch is None else epoch
        if epoch is None:
            self._epoch += 1
        return jax.random.fold_in(self._key, e)

    def __len__(self):
        return self.n_shard // self.b_shard

    @property
    def n_full_batches(self) -> int:
        return len(self)

    def epoch(self, epoch: Optional[int] = None) -> Iterator[Dict[str, jax.Array]]:
        ekey = self.epoch_base_key(epoch)
        for k in range(len(self)):
            yield self._jit_gather(self.arrays, ekey, jnp.asarray(k))

    def __iter__(self):
        return self.epoch()
