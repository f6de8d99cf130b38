"""Masked multi-head attention + transformer encoder (Flax).

Capability parity with the reference's `nn.MultiheadAttention(4 heads)` and
2-layer `nn.TransformerEncoder(d=256, ff=512, dropout=.1, batch_first=True)`
fusion stacks (/root/reference/src/conditional_gan_img_transformer.py:117-122,
src/conditional_gan_cross_attention.py:113-138). Post-LayerNorm blocks with
ReLU feed-forward match torch's `TransformerEncoderLayer` defaults.

Masks use True = valid everywhere (see kernels/flash_attention.py docstring).
The attention core dispatches to the Pallas flash kernels on TPU for both
inference and training. The kernels carry a first-order custom VJP, which
covers the entire fused WGAN-GP step: the gradient penalty differentiates
the critic w.r.t. the expression input only, and the engine evaluates the
fusion stack once *outside* that inner grad (train/wgan.py), so attention is
never differentiated twice. `disable_pallas()` remains as a trace-time
escape hatch for any future genuinely second-order region.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from gemm_gan_tpu.kernels.flash_attention import masked_mha


class MaskedMultiHeadAttention(nn.Module):
    """Cross/self attention with key-padding mask.

    Call: (q_in [B, Lq, E], kv_in [B, Lk, E], kv_mask [B, Lk] or None).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_pallas: bool = False
    mxu_bf16: bool = False    # bf16 MXU operands inside the flash kernels
    mesh: Any = None          # enables ring (sequence-parallel) self-attention
    flash_layout: str = "ble"  # see FusionConfig.flash_layout
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q_in, kv_in, kv_mask=None, deterministic: bool = True):
        E, H = self.embed_dim, self.num_heads
        assert E % H == 0, "num_heads must divide embed_dim"
        D = E // H
        B, Lq, _ = q_in.shape
        Lk = kv_in.shape[1]

        q = nn.Dense(E, dtype=self.dtype, name="q_proj")(q_in)
        k = nn.Dense(E, dtype=self.dtype, name="k_proj")(kv_in)
        v = nn.Dense(E, dtype=self.dtype, name="v_proj")(kv_in)

        def split(x, L):
            return x.reshape(B, L, H, D).transpose(0, 2, 1, 3)

        if (self.mesh is not None and Lq == Lk
                and self.mesh.shape.get("model", 1) > 1):
            from gemm_gan_tpu.kernels.ring_attention import ring_mha

            # shard the batch over `data` only when it divides evenly —
            # ring_mha pads the sequence axis but not the batch axis, and
            # eval/init paths may carry remainder batch sizes
            data_ax = self.mesh.shape.get("data", 1)
            batch_axis = "data" if data_ax > 1 and B % data_ax == 0 else None
            out = ring_mha(split(q, Lq), split(k, Lk), split(v, Lk), kv_mask,
                           mesh=self.mesh, axis="model", batch_axis=batch_axis)
            out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        elif self.flash_layout == "ble":
            # [B, L, E] straight off the projections: the E-layout kernel
            # consumes it in place (head split by lane slices inside), so
            # XLA never materializes the [B,L,H,D]->[B,H,L,D] transpose
            # around the custom call — the "copy tax" fix (BASELINE.md)
            out = masked_mha(q, k, v, kv_mask, use_pallas=self.use_pallas,
                             mxu_bf16=self.mxu_bf16, layout="ble",
                             num_heads=H)
        else:
            # the flash kernels are first-order differentiable (custom VJP),
            # which suffices everywhere: the GP inner grad never reaches
            # attention (the engine embeds the condition outside it)
            out = masked_mha(split(q, Lq), split(k, Lk), split(v, Lk), kv_mask,
                             use_pallas=self.use_pallas,
                             mxu_bf16=self.mxu_bf16)
            out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        out = nn.Dense(E, dtype=self.dtype, name="out_proj")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class TransformerEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.1
    use_pallas: bool = False
    mxu_bf16: bool = False
    mesh: Any = None
    flash_layout: str = "ble"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        attn = MaskedMultiHeadAttention(
            self.embed_dim, self.num_heads, dropout=self.dropout,
            use_pallas=self.use_pallas, mxu_bf16=self.mxu_bf16,
            mesh=self.mesh, flash_layout=self.flash_layout, dtype=self.dtype,
        )(x, x, mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=jnp.float32)(x + attn)
        h = nn.Dense(self.ff_dim, dtype=self.dtype)(x)
        h = nn.relu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.embed_dim, dtype=self.dtype)(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(dtype=jnp.float32)(x + h)


class TransformerEncoder(nn.Module):
    num_layers: int
    embed_dim: int
    num_heads: int
    ff_dim: int
    dropout: float = 0.1
    use_pallas: bool = False
    mxu_bf16: bool = False
    mesh: Any = None
    flash_layout: str = "ble"
    dtype: Optional[jnp.dtype] = None
    # rematerialize each layer in backward: trades recompute for activation
    # memory — required for whole-slide patch counts (>=16k) on one chip
    remat: bool = False

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        # prevent_cse stays at its default (True): the fused train step puts
        # a layer's forward AND backward inside the same lax.scan body, so
        # without the barrier XLA would CSE the recomputation against the
        # forward instance and re-store the activations — undoing the remat
        # that the 16k-patch single-chip envelope depends on (BASELINE.md)
        layer_cls = (nn.remat(TransformerEncoderLayer, static_argnums=(3,))
                     if self.remat else TransformerEncoderLayer)
        for i in range(self.num_layers):
            # explicit name: remat auto-prefixes the class name, which would
            # change param paths (init RNG folding, checkpoint layout)
            x = layer_cls(
                self.embed_dim, self.num_heads, self.ff_dim, self.dropout,
                use_pallas=self.use_pallas, mxu_bf16=self.mxu_bf16,
                mesh=self.mesh, flash_layout=self.flash_layout,
                dtype=self.dtype,
                name=f"TransformerEncoderLayer_{i}",
            )(x, mask, deterministic)
        return x
