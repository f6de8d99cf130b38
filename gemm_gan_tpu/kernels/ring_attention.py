"""Ring attention: sequence-parallel masked attention over a mesh axis.

Capability upgrade beyond the reference (SURVEY.md §5 long-context): the
reference caps conditioning at 256 randomly-subsampled patches because its
`nn.MultiheadAttention` materializes [L, L] scores
(/root/reference/src/multi_patch_gan_dataloader.py:32-35). Here the patch
axis shards across a mesh axis; each device holds one Q/KV block and KV
blocks rotate around the ring via `lax.ppermute` while a running online
softmax (m, l, acc) merges each incoming block — attention over whole-slide
token counts (10k+) with per-device memory O(L/n · L/n) and bandwidth riding
ICI neighbor links.

Numerics match `mha_reference` (same masked online-softmax); fully-masked
rows return 0. Layout: [B, H, L, D] with L sharded; the kv mask [B, L]
shards the same way.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gemm_gan_tpu.kernels.flash_attention import _NEG_INF


def _block_merge(carry, kv):
    """Merge one incoming KV block into the running online softmax."""
    m_prev, l_prev, acc, q, scale = carry
    k, v, mask = kv                                   # [B,H,Lk,D], [B,Lk]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = jnp.where(mask[:, None, None, :], s, _NEG_INF)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    p = jnp.where(mask[:, None, None, :], p, 0.0)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32)
    return (m_new, l_new, acc_new, q, scale)


def _ring_body(q, k, v, mask, axis_name: str, n_shards: int, scale: float):
    """Per-device ring: n_shards merge steps, rotating KV each step."""
    B, H, Lq, D = q.shape
    qf = q.astype(jnp.float32)
    m = jnp.full((B, H, Lq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((B, H, Lq, 1), jnp.float32)
    acc = jnp.zeros((B, H, Lq, D), jnp.float32)

    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    def step(i, state):
        m, l, acc, k, v, mask = state
        (m, l, acc, _, _) = _block_merge((m, l, acc, qf, scale),
                                         (k.astype(jnp.float32), v, mask))
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        mask = jax.lax.ppermute(mask, axis_name, perm)
        return m, l, acc, k, v, mask

    m, l, acc, _, _, _ = jax.lax.fori_loop(
        0, n_shards, step, (m, l, acc, k, v, mask))
    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def ring_mha(q, k, v, kv_mask=None, mesh: Optional[Mesh] = None,
             axis: str = "model", batch_axis: Optional[str] = None,
             scale: Optional[float] = None):
    """Sequence-parallel attention: L sharded over `axis` of `mesh`.

    q, k, v: [B, H, L, D]; kv_mask: [B, L] bool True=valid. Self- or
    cross-attention with Lq == Lk per shard (the Q shard attends to every KV
    shard via the ring). L is padded to a multiple of the axis size (padded
    KV masked out, padded Q rows sliced off). `batch_axis` names the mesh
    axis the batch dim is already sharded over (e.g. "data" inside a DP+SP
    training step) so shard_map does not regather it.
    """
    try:
        from jax import shard_map
        check_kw = {"check_vma": False}
    except ImportError:  # older jax: experimental API spells the kwarg check_rep
        from jax.experimental.shard_map import shard_map
        check_kw = {"check_rep": False}

    if scale is None:
        scale = q.shape[-1] ** -0.5
    if kv_mask is None:
        kv_mask = jnp.ones((q.shape[0], k.shape[2]), dtype=bool)
    if mesh is None or mesh.shape[axis] == 1:
        from gemm_gan_tpu.kernels.flash_attention import mha_reference

        return mha_reference(q, k, v, kv_mask, scale=scale)

    n = mesh.shape[axis]
    L = q.shape[2]
    Lp = -(-L // n) * n
    if Lp != L:
        pad = [(0, 0), (0, 0), (0, Lp - L), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        kv_mask = jnp.pad(kv_mask, [(0, 0), (0, Lp - L)])
    spec = P(batch_axis, None, axis, None)
    mspec = P(batch_axis, axis)

    fn = shard_map(
        functools.partial(_ring_body, axis_name=axis, n_shards=n, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec, mspec),
        out_specs=spec,
        **check_kw,
    )
    out = fn(q, k, v, kv_mask)
    return out[:, :, :L, :] if Lp != L else out
