"""Masked multi-head attention: Pallas flash kernels (fwd + bwd) + jnp reference.

The reference runs `nn.MultiheadAttention` / `nn.TransformerEncoder` with
key-padding masks over <=256 patch tokens and <=300 text tokens
(/root/reference/src/conditional_gan_cross_attention_with_film.py:144-152).
Here the fused softmax(QK^T)V with padding mask is a blockwise (flash-style)
Pallas TPU kernel over the KV axis, so the identical code path scales to
whole-slide patch counts (10k+) where materializing the attention matrix
would blow VMEM/HBM — a capability the reference lacks (it random-subsamples
patches instead, src/multi_patch_gan_dataloader.py:32-35).

A custom VJP pairs the forward kernel with flash backward kernels (dQ and
dK/dV passes over saved logsumexp), so the Pallas path runs everywhere in
the fused WGAN-GP training step. First order suffices even for the
gradient penalty: the engine evaluates the fusion stack once outside the
GP's inner grad (train/wgan.py), so attention is only ever differentiated
once — by the outer parameter gradient.

Masks are boolean with **True = valid** (the reference inverts HF masks into
torch's True=pad convention, src/multi_patch_multi_token_gan_dataloader.py:46-47;
we standardize on True=valid everywhere and document the inversion at the
data boundary).

`masked_mha` dispatches to the kernel on TPU for Lq >= MIN_PALLAS_LQ (the
patch self-attention path); tiny-query (CLS) cross-attentions use the jnp
reference, whose materialized matrices are negligible at Lq ~ 1.
"""

from __future__ import annotations

import contextlib
import functools
import threading
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_NEG_INF = -1e30
MIN_PALLAS_LQ = 128  # below this the jnp reference is faster and tile-friendlier
_INTERPRET = False  # tests flip this to run kernels on CPU in interpret mode
_LANES = 128  # per-row scalars (lse/delta) are broadcast across a lane axis
# to satisfy the TPU (8, 128) tile constraint, as the official TPU flash
# attention does (jax pallas ops flash_attention.py MIN_BLOCK_SIZE residuals)


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


# ------------------------------------------------------------------- forward
def _mxu_in(x, mxu_bf16):
    """MXU operand dtype: bf16 operands with f32 accumulate when enabled
    (the standard production flash-attention precision — softmax statistics
    and accumulators stay f32 regardless), else full f32."""
    return x.astype(jnp.bfloat16 if mxu_bf16 else jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                m_scratch, l_scratch, acc_scratch, *, scale, num_k_blocks,
                mxu_bf16):
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

    q = _mxu_in(q_ref[0], mxu_bf16)           # [bq, D]
    k = _mxu_in(k_ref[0], mxu_bf16)           # [bk, D]
    v = _mxu_in(v_ref[0], mxu_bf16)           # [bk, D]
    mask = mask_ref[0]                        # [1, bk] bool

    # the kernel is VPU(softmax)-bound, not MXU-bound (BASELINE.md), so
    # per-logit VPU passes are the scarce resource: the scale multiply is
    # folded into q by the caller (scale == 1.0 here, statically skipped),
    # and there is no second where() on p — masked columns give
    # exp(-1e30 - m_finite) == 0 exactly; only FULLY-masked rows (running
    # max still -1e30, so s - m == 0, p == 1) need it, and those are zeroed
    # once per q block in _finish instead of once per logit per k block.
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, bk]
    if scale != 1.0:
        s = s * scale
    s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_scratch[:, :1]                 # [bq, 1] (lane-broadcast store)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                    # masked cols: exp(-inf - m) = 0
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_scratch[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot(
        _mxu_in(p, mxu_bf16), v, preferred_element_type=jnp.float32)
    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)

    @pl.when(ik == num_k_blocks - 1)
    def _finish():
        # fully-masked rows: running max never left -1e30; their p was 1
        # per column, so acc/l would be mean(v) — zero them here instead
        fully_masked = m_scratch[:, :1] <= _NEG_INF * 0.5
        l = jnp.maximum(l_scratch[:, :1], 1e-30)
        o = jnp.where(fully_masked, 0.0, acc_scratch[:] / l)
        o_ref[0] = o.astype(o_ref.dtype)
        lse_ref[0] = jnp.broadcast_to(m_scratch[:, :1] + jnp.log(l),
                                      lse_ref.shape[1:])


# ------------------------------------------------------------------ backward
def _bwd_dq_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, acc_scratch, *, scale, num_k_blocks, mxu_bf16):
    """dQ pass: grid (BH, n_q, n_k), k innermost, accumulate dQ in scratch."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = _mxu_in(q_ref[0], mxu_bf16)
    k = _mxu_in(k_ref[0], mxu_bf16)
    v = _mxu_in(v_ref[0], mxu_bf16)
    mask = mask_ref[0]                                # [1, bk]
    do = _mxu_in(do_ref[0], mxu_bf16)                 # [bq, D]
    lse = lse_ref[0][:, :1]                           # [bq, 1]
    delta = delta_ref[0][:, :1]                       # [bq, 1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale != 1.0:
        s = s * scale
    s = jnp.where(mask, s, _NEG_INF)
    p = jnp.exp(s - lse)                              # [bq, bk]
    p = jnp.where(mask, p, 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [bq, bk]
    ds = p * (dp - delta)
    if scale != 1.0:
        ds = ds * scale
    acc_scratch[:] += jax.lax.dot(_mxu_in(ds, mxu_bf16), k,
                                  preferred_element_type=jnp.float32)

    @pl.when(ik == num_k_blocks - 1)
    def _finish():
        dq_ref[0] = acc_scratch[:].astype(dq_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref,
                      delta_ref, dq_ref, dk_ref, dv_ref, *, scale, mxu_bf16):
    """Single-launch backward for the single-block case (n_q == n_k == 1).

    When the whole (padded) sequence fits one (bq, bk) block — every
    canonical-shape attention after the single-pass-k blocking — the split
    dQ/dKV kernels would recompute the same s/p block twice and pay two
    kernel launches. Here one grid step computes dq, dk, dv from one
    softmax reconstruction. No scratch: nothing accumulates across grid.
    """
    q = _mxu_in(q_ref[0], mxu_bf16)                   # [bq, D]
    k = _mxu_in(k_ref[0], mxu_bf16)                   # [bk, D]
    v = _mxu_in(v_ref[0], mxu_bf16)                   # [bk, D]
    mask = mask_ref[0]                                # [1, bk]
    do = _mxu_in(do_ref[0], mxu_bf16)                 # [bq, D]
    lse = lse_ref[0][:, :1]                           # [bq, 1]
    delta = delta_ref[0][:, :1]                       # [bq, 1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale != 1.0:
        s = s * scale
    s = jnp.where(mask, s, _NEG_INF)
    p = jnp.exp(s - lse)
    p = jnp.where(mask, p, 0.0)                       # [bq, bk]
    dv_ref[0] = jax.lax.dot_general(
        _mxu_in(p, mxu_bf16), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)                             # [bq, bk]
    if scale != 1.0:
        ds = ds * scale
    dq_ref[0] = jax.lax.dot(_mxu_in(ds, mxu_bf16), k,
                            preferred_element_type=jnp.float32
                            ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        _mxu_in(ds, mxu_bf16), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scratch, dv_scratch, *, scale,
                    num_q_blocks, mxu_bf16):
    """dK/dV pass: grid (BH, n_k, n_q), q innermost, accumulate in scratch."""
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q = _mxu_in(q_ref[0], mxu_bf16)                   # [bq, D]
    k = _mxu_in(k_ref[0], mxu_bf16)                   # [bk, D]
    v = _mxu_in(v_ref[0], mxu_bf16)                   # [bk, D]
    mask = mask_ref[0]                                # [1, bk]
    do = _mxu_in(do_ref[0], mxu_bf16)                 # [bq, D]
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale != 1.0:
        s = s * scale
    s = jnp.where(mask, s, _NEG_INF)
    p = jnp.exp(s - lse)
    p = jnp.where(mask, p, 0.0)                       # [bq, bk]
    dv_scratch[:] += jax.lax.dot_general(_mxu_in(p, mxu_bf16), do,
                                         (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)                             # [bq, bk]
    if scale != 1.0:
        ds = ds * scale
    dk_scratch[:] += jax.lax.dot_general(_mxu_in(ds, mxu_bf16), q,
                                         (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    @pl.when(iq == num_q_blocks - 1)
    def _finish():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


# ------------------------------------------------- E-layout (ble) fast path
# Kernels that consume q/k/v as [B, L, E] — the raw output of the fused QKV
# projections — and emit [B, Lq, E], with the head split done INSIDE the
# kernel by static lane slices (E = H*D). Why: the classic [B, H, L, D]
# layout forces XLA to materialize a real [B,L,H,D]->[B,H,L,D] transpose
# copy around every pallas call (pallas custom calls demand default
# layouts), measured at ~0.6 ms/step of the canonical fused step — ~8% of
# device-busy (BASELINE.md "copy tax", scripts/probe_mfu.py). A 4-D
# [B,L,H,D] BlockSpec cannot fix it: Mosaic requires a block's last two
# dims to be (8,128)-divisible or span the array, and (1, D) blocks over
# the (H, D) minor dims are neither. [B, L, E] blocks span (L, E) — legal —
# and every head's [b, D] slice is a static lane offset.
#
# Scope: SINGLE-BLOCK shapes only (the whole padded Lq and Lk fit one
# block each — every canonical-shape attention after the single-pass-k
# blocking). Long sequences keep the classic blocked kernels, where the
# one-time transpose is amortized by O(L^2) attention work. No padding is
# needed at all: the block spans the array, so there are no phantom k
# columns (the kv mask alone defines validity).

# VMEM guard: the backward holds several [Lq, Lk] f32 intermediates per head
# plus the (1, L, E) blocks; 512 covers the canonical 257/300-token shapes
# with wide margin while keeping worst-case VMEM ~ a few MB
BLE_MAX_L = 512


def _fwd_kernel_ble(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                    scale, num_heads, head_dim, mxu_bf16):
    mask = mask_ref[0]                                # [1, Lk]
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = _mxu_in(q_ref[0][:, sl], mxu_bf16)        # [Lq, D]
        k = _mxu_in(k_ref[0][:, sl], mxu_bf16)        # [Lk, D]
        v = _mxu_in(v_ref[0][:, sl], mxu_bf16)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        s = jnp.where(mask, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)        # [Lq, 1]
        p = jnp.exp(s - m)                            # masked cols: exact 0
        l = jnp.sum(p, axis=-1, keepdims=True)
        # fully-masked rows (whole sample masked): zero, as the classic
        # kernel's _finish does
        fully_masked = m <= _NEG_INF * 0.5
        acc = jax.lax.dot(_mxu_in(p, mxu_bf16), v,
                          preferred_element_type=jnp.float32)
        o = jnp.where(fully_masked, 0.0, acc / jnp.maximum(l, 1e-30))
        o_ref[0, :, sl] = o.astype(o_ref.dtype)
        lse_ref[0, :, h * _LANES:(h + 1) * _LANES] = jnp.broadcast_to(
            m + jnp.log(jnp.maximum(l, 1e-30)), (q.shape[0], _LANES))


def _bwd_kernel_ble(q_ref, k_ref, v_ref, mask_ref, do_ref, o_ref, lse_ref,
                    dq_ref, dk_ref, dv_ref, *, scale, num_heads, head_dim,
                    mxu_bf16):
    """Single-launch dq/dk/dv, all heads; delta computed in-kernel (the
    classic path materializes it on the host side of the call)."""
    mask = mask_ref[0]
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = _mxu_in(q_ref[0][:, sl], mxu_bf16)
        k = _mxu_in(k_ref[0][:, sl], mxu_bf16)
        v = _mxu_in(v_ref[0][:, sl], mxu_bf16)
        do = do_ref[0][:, sl].astype(jnp.float32)
        o = o_ref[0][:, sl].astype(jnp.float32)
        lse = lse_ref[0][:, h * _LANES:h * _LANES + 1]    # [Lq, 1]
        delta = jnp.sum(do * o, axis=-1, keepdims=True)   # [Lq, 1]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        s = jnp.where(mask, s, _NEG_INF)
        p = jnp.exp(s - lse)
        p = jnp.where(mask, p, 0.0)                       # [Lq, Lk]
        dom = _mxu_in(do, mxu_bf16)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            _mxu_in(p, mxu_bf16), dom, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(dom, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        if scale != 1.0:
            ds = ds * scale
        dsm = _mxu_in(ds, mxu_bf16)
        dq_ref[0, :, sl] = jax.lax.dot(
            dsm, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            dsm, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _ble_call(kernel, inputs, out_shapes, B, scale, num_heads, head_dim,
              mxu_bf16):
    kw = {} if pltpu is None else dict(memory_space=pltpu.VMEM)

    def spec(x):
        return pl.BlockSpec((1,) + x.shape[1:], lambda b: (b,) + (0,) * (x.ndim - 1),
                            **kw)

    return pl.pallas_call(
        functools.partial(kernel, scale=scale, num_heads=num_heads,
                          head_dim=head_dim, mxu_bf16=mxu_bf16),
        grid=(B,),
        in_specs=[spec(x) for x in inputs],
        out_specs=[pl.BlockSpec((1,) + s.shape[1:],
                                lambda b, nd=len(s.shape): (b,) + (0,) * (nd - 1),
                                **kw)
                   for s in out_shapes],
        out_shape=out_shapes,
        interpret=_INTERPRET,
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_core_ble(q, k, v, kv_mask, scale, num_heads, mxu_bf16):
    out, _ = _flash_core_ble_fwd(q, k, v, kv_mask, scale, num_heads, mxu_bf16)
    return out


def _flash_core_ble_fwd(q, k, v, kv_mask, scale, num_heads, mxu_bf16):
    B, Lq, E = q.shape
    D = E // num_heads
    maskp = kv_mask[:, None, :]
    o, lse = _ble_call(
        _fwd_kernel_ble, [q, k, v, maskp],
        [jax.ShapeDtypeStruct((B, Lq, E), q.dtype),
         jax.ShapeDtypeStruct((B, Lq, num_heads * _LANES), jnp.float32)],
        B, scale, num_heads, D, mxu_bf16)
    return o, (q, k, v, kv_mask, o, lse)


def _flash_core_ble_bwd(scale, num_heads, mxu_bf16, res, do):
    q, k, v, kv_mask, o, lse = res
    B, Lq, E = q.shape
    Lk = k.shape[1]
    D = E // num_heads
    maskp = kv_mask[:, None, :]
    dq, dk, dv = _ble_call(
        _bwd_kernel_ble, [q, k, v, maskp, do, o, lse],
        [jax.ShapeDtypeStruct((B, Lq, E), q.dtype),
         jax.ShapeDtypeStruct((B, Lk, E), k.dtype),
         jax.ShapeDtypeStruct((B, Lk, E), v.dtype)],
        B, scale, num_heads, D, mxu_bf16)
    dmask = (None if kv_mask is None
             else np.zeros(kv_mask.shape, dtype=jax.dtypes.float0))
    return dq, dk, dv, dmask


_flash_core_ble.defvjp(_flash_core_ble_fwd, _flash_core_ble_bwd)


def flash_mha_ble(q, k, v, kv_mask=None, scale=None, num_heads: int = 4,
                  mxu_bf16: bool = False):
    """E-layout flash attention: q [B, Lq, E], k/v [B, Lk, E] -> [B, Lq, E].

    Single-block shapes only (see the section comment); same per-head dots
    and masked softmax as `flash_mha` — bit-identical when the classic path
    needs no k padding, few-ulp reduction-order differences otherwise
    (classic contracts over the 128-padded k width; interpret-mode parity
    tests in tests/test_kernels.py)."""
    if pltpu is None and not _INTERPRET:
        raise RuntimeError("Pallas TPU backend unavailable")
    E = q.shape[-1]
    if E % num_heads:
        raise ValueError(f"E={E} not divisible by num_heads={num_heads}")
    if scale is None:
        scale = (E // num_heads) ** -0.5
    if kv_mask is None:
        kv_mask = jnp.ones((q.shape[0], k.shape[1]), dtype=bool)
    q = q * jnp.asarray(scale, q.dtype)  # fold scale outside the VJP core
    return _flash_core_ble(q, k, v, kv_mask, 1.0, num_heads, bool(mxu_bf16))


# ------------------------------------------------------------------ plumbing
def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _prep(q, k, v, kv_mask, block_q, block_k):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    if kv_mask is None:
        kv_mask = jnp.ones((B, Lk), dtype=bool)
    bq = min(block_q, -(-Lq // 8) * 8)
    # Single-pass k axis whenever the whole (128-aligned) k length fits one
    # block of <= max(block_k, 512): rounding Lk up to a multiple of block_k
    # otherwise wastes real work at short-but-not-tiny lengths (canonical
    # 257 patch tokens -> padded 512, 2x the k-axis FLOPs; measured in the
    # step profile, scripts/probe_profile_step.py), and a single k block
    # also skips every online-softmax rescale revisit. Long sequences keep
    # the tuned block_k pipeline.
    bk_single = -(-Lk // 128) * 128
    bk = bk_single if bk_single <= max(block_k, 512) else block_k
    Lq_p = -(-Lq // bq) * bq
    Lk_p = -(-Lk // bk) * bk
    qp = _pad_to(q, Lq_p, 2).reshape(B * H, Lq_p, D)
    kp = _pad_to(k, Lk_p, 2).reshape(B * H, Lk_p, D)
    vp = _pad_to(v, Lk_p, 2).reshape(B * H, Lk_p, D)
    maskp = _pad_to(kv_mask, Lk_p, 1)[:, None, :]  # [B, 1, Lk_p]
    return qp, kp, vp, maskp, bq, bk, Lq_p, Lk_p


def _fwd_call(qp, kp, vp, maskp, bq, bk, scale, H, mxu_bf16=False):
    BH, Lq_p, D = qp.shape
    Lk_p = kp.shape[1]
    n_q, n_k = Lq_p // bq, Lk_p // bk
    grid = (BH, n_q, n_k)
    kw = {} if pltpu is None else dict(memory_space=pltpu.VMEM)
    scratch = ([] if pltpu is None else [
        pltpu.VMEM((bq, _LANES), jnp.float32),
        pltpu.VMEM((bq, _LANES), jnp.float32),
        pltpu.VMEM((bq, D), jnp.float32),
    ])
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, num_k_blocks=n_k,
                          mxu_bf16=mxu_bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, iq, ik: (bh, iq, 0), **kw),
            pl.BlockSpec((1, bk, D), lambda bh, iq, ik: (bh, ik, 0), **kw),
            pl.BlockSpec((1, bk, D), lambda bh, iq, ik: (bh, ik, 0), **kw),
            pl.BlockSpec((1, 1, bk), lambda bh, iq, ik, h=H: (bh // h, 0, ik), **kw),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, iq, ik: (bh, iq, 0), **kw),
            pl.BlockSpec((1, bq, _LANES), lambda bh, iq, ik: (bh, iq, 0), **kw),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lq_p, D), qp.dtype),
            jax.ShapeDtypeStruct((BH, Lq_p, _LANES), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Lq_p * Lk_p * D,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=BH * Lq_p * Lk_p,
        ),
    )(qp, kp, vp, maskp)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_core(q, k, v, kv_mask, scale, block_q, block_k, mxu_bf16):
    out, _ = _flash_core_fwd(q, k, v, kv_mask, scale, block_q, block_k,
                             mxu_bf16)
    return out


def _flash_core_fwd(q, k, v, kv_mask, scale, block_q, block_k, mxu_bf16):
    B, H, Lq, D = q.shape
    qp, kp, vp, maskp, bq, bk, Lq_p, Lk_p = _prep(q, k, v, kv_mask, block_q, block_k)
    out, lse = _fwd_call(qp, kp, vp, maskp, bq, bk, scale, H, mxu_bf16)
    o = out.reshape(B, H, Lq_p, D)[:, :, :Lq, :]
    return o, (q, k, v, kv_mask, o, lse)


def _flash_core_bwd(scale, block_q, block_k, mxu_bf16, res, do):
    q, k, v, kv_mask, o, lse = res
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    qp, kp, vp, maskp, bq, bk, Lq_p, Lk_p = _prep(q, k, v, kv_mask, block_q, block_k)
    dop = _pad_to(do, Lq_p, 2).reshape(B * H, Lq_p, D)
    # delta_i = sum_d dO_i O_i (padded rows contribute 0); lane-broadcast
    delta = jnp.sum(dop.astype(jnp.float32)
                    * _pad_to(o, Lq_p, 2).reshape(B * H, Lq_p, D).astype(jnp.float32),
                    axis=-1)                                   # [BH, Lq_p]
    delta = jnp.broadcast_to(delta[..., None], (B * H, Lq_p, _LANES))
    BH = B * H
    n_q, n_k = Lq_p // bq, Lk_p // bk
    kw = {} if pltpu is None else dict(memory_space=pltpu.VMEM)

    if n_q == 1 and n_k == 1:
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, scale=scale,
                              mxu_bf16=mxu_bf16),
            grid=(BH,),
            in_specs=[
                pl.BlockSpec((1, bq, D), lambda bh: (bh, 0, 0), **kw),
                pl.BlockSpec((1, bk, D), lambda bh: (bh, 0, 0), **kw),
                pl.BlockSpec((1, bk, D), lambda bh: (bh, 0, 0), **kw),
                pl.BlockSpec((1, 1, bk), lambda bh, h=H: (bh // h, 0, 0), **kw),
                pl.BlockSpec((1, bq, D), lambda bh: (bh, 0, 0), **kw),
                pl.BlockSpec((1, bq, _LANES), lambda bh: (bh, 0, 0), **kw),
                pl.BlockSpec((1, bq, _LANES), lambda bh: (bh, 0, 0), **kw),
            ],
            out_specs=[
                pl.BlockSpec((1, bq, D), lambda bh: (bh, 0, 0), **kw),
                pl.BlockSpec((1, bk, D), lambda bh: (bh, 0, 0), **kw),
                pl.BlockSpec((1, bk, D), lambda bh: (bh, 0, 0), **kw),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BH, Lq_p, D), q.dtype),
                jax.ShapeDtypeStruct((BH, Lk_p, D), k.dtype),
                jax.ShapeDtypeStruct((BH, Lk_p, D), v.dtype),
            ],
            interpret=_INTERPRET,
        )(qp, kp, vp, maskp, dop, lse, delta)
        dq = dq.reshape(B, H, Lq_p, D)[:, :, :Lq, :]
        dk = dk.reshape(B, H, Lk_p, D)[:, :, :Lk, :]
        dv = dv.reshape(B, H, Lk_p, D)[:, :, :Lk, :]
        dmask = (None if kv_mask is None
                 else np.zeros(kv_mask.shape, dtype=jax.dtypes.float0))
        return dq, dk, dv, dmask

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, num_k_blocks=n_k,
                          mxu_bf16=mxu_bf16),
        grid=(BH, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, iq, ik: (bh, iq, 0), **kw),
            pl.BlockSpec((1, bk, D), lambda bh, iq, ik: (bh, ik, 0), **kw),
            pl.BlockSpec((1, bk, D), lambda bh, iq, ik: (bh, ik, 0), **kw),
            pl.BlockSpec((1, 1, bk), lambda bh, iq, ik, h=H: (bh // h, 0, ik), **kw),
            pl.BlockSpec((1, bq, D), lambda bh, iq, ik: (bh, iq, 0), **kw),
            pl.BlockSpec((1, bq, _LANES), lambda bh, iq, ik: (bh, iq, 0), **kw),
            pl.BlockSpec((1, bq, _LANES), lambda bh, iq, ik: (bh, iq, 0), **kw),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda bh, iq, ik: (bh, iq, 0), **kw),
        out_shape=jax.ShapeDtypeStruct((BH, Lq_p, D), q.dtype),
        scratch_shapes=([] if pltpu is None else [pltpu.VMEM((bq, D), jnp.float32)]),
        interpret=_INTERPRET,
    )(qp, kp, vp, maskp, dop, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, num_q_blocks=n_q,
                          mxu_bf16=mxu_bf16),
        grid=(BH, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda bh, ik, iq: (bh, iq, 0), **kw),
            pl.BlockSpec((1, bk, D), lambda bh, ik, iq: (bh, ik, 0), **kw),
            pl.BlockSpec((1, bk, D), lambda bh, ik, iq: (bh, ik, 0), **kw),
            pl.BlockSpec((1, 1, bk), lambda bh, ik, iq, h=H: (bh // h, 0, ik), **kw),
            pl.BlockSpec((1, bq, D), lambda bh, ik, iq: (bh, iq, 0), **kw),
            pl.BlockSpec((1, bq, _LANES), lambda bh, ik, iq: (bh, iq, 0), **kw),
            pl.BlockSpec((1, bq, _LANES), lambda bh, ik, iq: (bh, iq, 0), **kw),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, D), lambda bh, ik, iq: (bh, ik, 0), **kw),
            pl.BlockSpec((1, bk, D), lambda bh, ik, iq: (bh, ik, 0), **kw),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Lk_p, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Lk_p, D), v.dtype),
        ],
        scratch_shapes=([] if pltpu is None else [
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ]),
        interpret=_INTERPRET,
    )(qp, kp, vp, maskp, dop, lse, delta)

    dq = dq.reshape(B, H, Lq_p, D)[:, :, :Lq, :]
    dk = dk.reshape(B, H, Lk_p, D)[:, :, :Lk, :]
    dv = dv.reshape(B, H, Lk_p, D)[:, :, :Lk, :]
    dmask = (None if kv_mask is None
             else np.zeros(kv_mask.shape, dtype=jax.dtypes.float0))
    return dq, dk, dv, dmask


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_mha(q, k, v, kv_mask=None, scale=None, block_q: int = 512,
              block_k: int = 256, mxu_bf16: bool = False):
    """Pallas blockwise masked attention (differentiable, custom VJP).

    Shapes as `mha_reference`. Default blocks (512, 256) from a measured
    v5e sweep (fwd+bwd, f32, D=64): vs the (128, 128) naive default they
    are 1.8x at L=4096 and 2.4x at L=8192, and 1.4x FASTER than XLA's
    materialized-attention reference at L=4096 (which stops compiling at
    L=8192) — BASELINE.md. Blocks are clamped to the (padded) sequence
    lengths for short inputs.

    `mxu_bf16=True` feeds the MXU bf16 operands with f32 accumulation in
    every dot of the forward AND backward kernels (softmax statistics,
    lse, and accumulators stay f32) — the standard production flash
    precision; opt-in here because WGAN critics are variance-sensitive.
    """
    if pltpu is None:
        # even interpret mode needs pltpu here: the classic kernels take
        # pltpu.VMEM-typed scratch refs (the BLE kernels are scratch-free
        # and stay interpretable without it)
        raise RuntimeError(
            "Pallas TPU backend unavailable (classic-layout kernels need "
            "pltpu scratch specs; use masked_mha for automatic fallback)")
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if kv_mask is None:
        kv_mask = jnp.ones((q.shape[0], k.shape[2]), dtype=bool)
    # fold the softmax scale into q OUTSIDE the custom-VJP core: the kernels
    # then run with scale == 1.0 (their per-logit scale multiplies are
    # statically skipped — the kernel is VPU-bound), and autodiff applies
    # the scale to dq through this multiply's own chain rule
    q = q * jnp.asarray(scale, q.dtype)
    return _flash_core(q, k, v, kv_mask, 1.0, block_q, block_k,
                       bool(mxu_bf16))


def mha_reference_blocked(q, k, v, kv_mask=None, scale=None,
                          block_q: int = 128):
    """`mha_reference` evaluated one query block at a time via `lax.map`.

    Never materializes the full [B, H, Lq, Lk] logits — peak extra memory is
    one [B, H, block_q, Lk] block — while staying plain jnp, so it is
    differentiable to ANY order. This is the long-sequence fallback when the
    Pallas kernels are unavailable (CPU) or a region genuinely needs
    second-order autodiff through attention (the training engine needs
    neither: the GP inner grad never reaches attention — train/wgan.py): at
    whole-slide patch counts (10k+) the naive reference's L^2 buffer would
    not fit.
    """
    B, H, Lq, D = q.shape
    if Lq <= block_q:
        return mha_reference(q, k, v, kv_mask, scale)
    nb = -(-Lq // block_q)
    Lq_p = nb * block_q
    qp = _pad_to(q, Lq_p, 2)
    qb = qp.reshape(B, H, nb, block_q, D).transpose(2, 0, 1, 3, 4)

    # remat the block: without it lax.map stores every block's
    # [B, H, block_q, Lk] softmax residuals for the backward pass —
    # O(Lq*Lk) again in aggregate, which thrashes HBM at 8k+ tokens
    # (measured: 1343 -> 0.2 steps/s). Recomputing per block restores
    # flash-style O(block) memory at any order of differentiation.
    @jax.checkpoint
    def body(qblk):
        return mha_reference(qblk, k, v, kv_mask, scale)

    out = jax.lax.map(body, qb)  # [nb, B, H, block_q, D]
    return out.transpose(1, 2, 0, 3, 4).reshape(B, H, Lq_p, D)[:, :, :Lq]


_TRACE_FLAGS = threading.local()  # trace-time toggle, see disable_pallas()
# self/cross attention over sequences at least this long takes the blocked
# reference when the Pallas kernels are unavailable or disabled
BLOCKED_REF_MIN_LK = 2048


def _pallas_disabled() -> bool:
    return getattr(_TRACE_FLAGS, "disabled", False)


@contextlib.contextmanager
def disable_pallas():
    """Trace-time escape hatch: ops traced inside this context use the jnp
    reference even when configured for Pallas. The flash kernels carry a
    custom VJP (first-order only); any region differentiated TWICE through
    attention must trace the reference path. The shipped training engine has
    no such region (the GP embeds the condition outside its inner grad), so
    this is unused there — kept for tests and future second-order uses.
    Thread-local so concurrent traces in other threads are unaffected."""
    prev = _pallas_disabled()
    _TRACE_FLAGS.disabled = True
    try:
        yield
    finally:
        _TRACE_FLAGS.disabled = prev


def _warn_flash_fallback(kind: str, err: Exception):
    """The dispatch try/except below catches TRACE-time kernel failures only
    (shape/constraint asserts the predicate didn't cover) and falls back to
    the XLA path — but never silently: a quiet fallback would mask genuine
    kernel bugs and throw away the copy-tax/roofline wins with zero signal.
    Mosaic LOWERING failures are not catchable here at all (they surface at
    jit-compile time, outside any trace-time try), so the shape predicates
    in `masked_mha` are the real gate for those."""
    warnings.warn(
        f"flash_mha{kind} failed at trace time "
        f"({type(err).__name__}: {err}); falling back to the XLA reference "
        "path for this trace. If this is unexpected, the flash perf win is "
        "being lost — check the kernel shape constraints.",
        RuntimeWarning, stacklevel=3)


def _dim_ge(dim, bound: int) -> bool:
    """`dim >= bound`, resolving to False for a symbolic dimension where the
    comparison is inconclusive (jax.export shape polymorphism: a
    dynamic-shape serving export takes the simple polymorphic jnp path —
    the Pallas grid and the blocked reference are shape-specialized)."""
    try:
        return bool(dim >= bound)
    except Exception:
        return False


def masked_mha(q, k, v, kv_mask=None, scale=None, use_pallas: bool = True,
               mxu_bf16: bool = False, layout: str = "bhld",
               num_heads: int = None):
    """Dispatch: Pallas kernel on TPU for non-tiny query lengths, else jnp.

    `layout="ble"` (requires `num_heads`): q/k/v and the output are
    [B, L, E] — the raw projection layout. Single-block shapes
    (MIN_PALLAS_LQ <= Lq, both L <= BLE_MAX_L) take `flash_mha_ble`, which
    consumes that layout in place and so skips the [B,L,H,D]->[B,H,L,D]
    transpose copies the classic layout forces around the custom call
    (BASELINE.md "copy tax"); other shapes split heads here and recurse
    into the classic dispatch (long sequences amortize the transpose under
    O(L^2) attention work; tiny queries use the jnp reference anyway).
    """
    if layout == "ble":
        if num_heads is None:
            raise ValueError("layout='ble' requires num_heads")
        B, Lq, E = q.shape
        Lk = k.shape[1]
        on_tpu_ = jax.default_backend() == "tpu"
        if (use_pallas and not _pallas_disabled()
                and _dim_ge(Lq, MIN_PALLAS_LQ)
                and not _dim_ge(Lq, BLE_MAX_L + 1)
                and not _dim_ge(Lk, BLE_MAX_L + 1)
                and (_INTERPRET or (on_tpu_ and pltpu is not None))):
            try:
                return flash_mha_ble(q, k, v, kv_mask, scale=scale,
                                     num_heads=num_heads, mxu_bf16=mxu_bf16)
            except Exception as e:  # trace-time only; see _warn_flash_fallback
                _warn_flash_fallback("_ble", e)
        D = E // num_heads

        def split(x):
            return x.reshape(B, x.shape[1], num_heads, D).transpose(0, 2, 1, 3)

        out = masked_mha(split(q), split(k), split(v), kv_mask, scale=scale,
                         use_pallas=use_pallas, mxu_bf16=mxu_bf16)
        return out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
    on_tpu = jax.default_backend() == "tpu"
    # classic kernels require pltpu EVEN in interpret mode: their scratch
    # specs are pltpu.VMEM-typed, so on a build where the pallas tpu import
    # failed the call would TypeError into the fallback warning — dispatch
    # straight to the reference instead (the scratch-free BLE kernels above
    # remain interpretable without pltpu)
    if (use_pallas and not _pallas_disabled()
            and _dim_ge(q.shape[2], MIN_PALLAS_LQ)
            and pltpu is not None and (_INTERPRET or on_tpu)):
        try:
            return flash_mha(q, k, v, kv_mask, scale=scale, mxu_bf16=mxu_bf16)
        except Exception as e:  # trace-time only; see _warn_flash_fallback
            _warn_flash_fallback("", e)
    if (_dim_ge(q.shape[2], BLOCKED_REF_MIN_LK)
            or _dim_ge(k.shape[2], BLOCKED_REF_MIN_LK)):
        return mha_reference_blocked(q, k, v, kv_mask, scale=scale)
    return mha_reference(q, k, v, kv_mask, scale=scale)
