"""Masked multi-head attention: Pallas flash kernel + jnp reference.

The reference runs `nn.MultiheadAttention` / `nn.TransformerEncoder` with
key-padding masks over <=256 patch tokens and <=300 text tokens
(/root/reference/src/conditional_gan_cross_attention_with_film.py:144-152).
Here the fused softmax(QK^T)V with padding mask is a blockwise (flash-style)
Pallas TPU kernel over the KV axis, so the identical code path scales to
whole-slide patch counts (10k+) where materializing the attention matrix
would blow VMEM/HBM — a capability the reference lacks (it random-subsamples
patches instead, src/multi_patch_gan_dataloader.py:32-35).

Masks are boolean with **True = valid** (the reference inverts HF masks into
torch's True=pad convention, src/multi_patch_multi_token_gan_dataloader.py:46-47;
we standardize on True=valid everywhere and document the inversion at the
data boundary).

`masked_mha` dispatches to the kernel on TPU and to the jnp reference
elsewhere (and always under `jax.grad` until the backward kernel lands).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_NEG_INF = -1e30


def mha_reference(q, k, v, kv_mask=None, scale=None):
    """softmax(QK^T * scale + mask)V in plain jnp.

    q: [B, H, Lq, D]; k, v: [B, H, Lk, D]; kv_mask: [B, Lk] bool True=valid.
    Fully-masked query rows return 0 (torch would NaN; divergence documented).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :], logits, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - m)
    if kv_mask is not None:
        unnorm = jnp.where(kv_mask[:, None, None, :], unnorm, 0.0)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    weights = unnorm / jnp.maximum(denom, 1e-30)
    return jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_scratch, l_scratch, acc_scratch,
                  *, scale, num_k_blocks):
    """One (batch*head, q_block, k_block) grid step of flash attention.

    Grid iterates k blocks innermost; running max/denominator live in scratch
    and the output block is revisited (standard single-pass online softmax).
    """
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0].astype(jnp.float32)          # [bq, D]
    k = k_ref[0].astype(jnp.float32)          # [bk, D]
    v = v_ref[0].astype(jnp.float32)          # [bk, D]
    mask = mask_ref[0]                        # [1, bk] bool

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale  # [bq, bk]
    s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_scratch[:]                     # [bq, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                    # masked cols: exp(-inf - m) = 0
    p = jnp.where(mask, p, 0.0)
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_scratch[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot(
        p, v, preferred_element_type=jnp.float32)
    m_scratch[:] = m_new
    l_scratch[:] = l_new

    @pl.when(ik == num_k_blocks - 1)
    def _finish():
        denom = jnp.maximum(l_scratch[:], 1e-30)
        o_ref[0] = (acc_scratch[:] / denom).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "scale"))
def flash_mha(q, k, v, kv_mask=None, scale=None, block_q: int = 128, block_k: int = 128):
    """Pallas blockwise masked attention. Shapes as `mha_reference`."""
    if pltpu is None:
        raise RuntimeError("Pallas TPU backend unavailable")
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    if scale is None:
        scale = D ** -0.5
    if kv_mask is None:
        kv_mask = jnp.ones((B, Lk), dtype=bool)

    bq = min(block_q, max(8, Lq))
    bk = min(block_k, max(128, Lk))
    Lq_p = -(-Lq // bq) * bq
    Lk_p = -(-Lk // bk) * bk
    qp = _pad_to(q, Lq_p, 2).reshape(B * H, Lq_p, D)
    kp = _pad_to(k, Lk_p, 2).reshape(B * H, Lk_p, D)
    vp = _pad_to(v, Lk_p, 2).reshape(B * H, Lk_p, D)
    maskp = _pad_to(kv_mask, Lk_p, 1)[:, None, :]  # [B, 1, Lk_p]

    n_q = Lq_p // bq
    n_k = Lk_p // bk
    grid = (B * H, n_q, n_k)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, num_k_blocks=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, iq, ik: (bh, iq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, D), lambda bh, iq, ik: (bh, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda bh, iq, ik, h=H: (bh // h, 0, ik),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda bh, iq, ik: (bh, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq_p, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Lq_p * Lk_p * D,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=B * H * Lq_p * Lk_p,
        ),
    )(qp, kp, vp, maskp)
    return out.reshape(B, H, Lq_p, D)[:, :, :Lq, :]


def masked_mha(q, k, v, kv_mask=None, scale=None, use_pallas: bool = True):
    """Dispatch: Pallas kernel on TPU outside autodiff, jnp reference otherwise."""
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if use_pallas and on_tpu and pltpu is not None:
        try:
            return flash_mha(q, k, v, kv_mask, scale=scale)
        except Exception:
            pass
    return mha_reference(q, k, v, kv_mask, scale=scale)
