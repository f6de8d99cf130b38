"""Conditioning / fusion module zoo.

One Flax module per conditioning architecture of the reference's 8 model
files (SURVEY.md §2.3); each maps a conditioning-input dict to a single
[B, cond_dim] vector. The generator and critic each own an independent copy
(separate params), matching the reference where the fusion stack is duplicated
inside both networks (e.g. /root/reference/src/conditional_gan_cross_attention_with_film.py:97-230).

Batch schema (True = valid masks everywhere):
  genes      [B, n_genes]           — consumed by models, not fusion
  text_emb   [B, text_dim]          — ModernBERT CLS vector
  tokens     [B, T, text_dim]       — ModernBERT token embeddings
  token_mask [B, T] bool
  patches    [B, P, patch_dim]      — UNI patch embeddings
  patch_mask [B, P] bool
  disease    [B] int32, site [B] int32

Documented divergences from the reference (intended-behavior fidelity,
SURVEY.md §7 "hard parts" #2):
  * the pooled-attention variant's BatchNorm1d on the attended vector
    (src/conditional_gan_attention.py:109,123, surrounded by debug prints)
    becomes LayerNorm — batch-coupled norms violate the per-sample gradient
    penalty assumption of WGAN-GP critics;
  * torch returns NaN for fully-masked attention rows; we return 0.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from gemm_gan_tpu.config import FusionConfig
from gemm_gan_tpu.ops.attention import MaskedMultiHeadAttention, TransformerEncoder
from gemm_gan_tpu.ops.film import FiLM


def _masked_mean(x, mask):
    # x: [B, L, D]; mask: [B, L] True=valid
    m = mask.astype(x.dtype)[..., None]
    return (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)


class _PatchTransformer(nn.Module):
    """Shared patch-CLS trunk: prepend learnable CLS, run the encoder stack,
    return (sequence_with_cls [B, P+1, E], mask_with_cls [B, P+1])."""

    cfg: FusionConfig
    encode_mlp: bool = False  # Linear+ReLU+LayerNorm (img_transformer) vs plain Linear
    mesh: Any = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, patches, patch_mask, deterministic=True):
        c = self.cfg
        x = nn.Dense(c.cond_dim, dtype=self.dtype, name="patches_encoder")(patches)
        if self.encode_mlp:
            x = nn.LayerNorm(dtype=jnp.float32)(nn.relu(x))
        B = x.shape[0]
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, 1, c.cond_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (B, 1, c.cond_dim)), x], axis=1)
        mask = jnp.concatenate([jnp.ones((B, 1), dtype=bool), patch_mask], axis=1)
        x = TransformerEncoder(
            num_layers=c.num_layers, embed_dim=c.cond_dim, num_heads=c.num_heads,
            ff_dim=c.ff_dim, dropout=c.dropout, use_pallas=c.use_pallas,
            mxu_bf16=c.flash_mxu_bf16, flash_layout=c.flash_layout,
            mesh=self.mesh if c.sequence_parallel else None,
            dtype=self.dtype, remat=c.remat_layers, name="patches_transformer",
        )(x, mask, deterministic=deterministic)
        return x, mask


class ConcatFusion(nn.Module):
    """Single linear encoder of text CLS or masked-mean of encoded patches
    (parity: src/conditional_gan_concat.py:129-149)."""

    cfg: FusionConfig
    mesh: Any = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, cond, deterministic=True):
        c = self.cfg
        if c.condition_type == "text":
            return nn.Dense(c.cond_dim, dtype=self.dtype, name="encoder")(cond["text_emb"])
        enc = nn.Dense(c.cond_dim, dtype=self.dtype, name="encoder")(cond["patches"])
        return _masked_mean(enc, cond["patch_mask"])


class PooledAttentionFusion(nn.Module):
    """Text CLS as a single query attending over encoded patches
    (parity: src/conditional_gan_attention.py:107-125; BatchNorm -> LayerNorm)."""

    cfg: FusionConfig
    mesh: Any = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, cond, deterministic=True):
        c = self.cfg
        text = nn.Dense(c.cond_dim, dtype=self.dtype, name="text_encoder")(cond["text_emb"])
        patches = nn.Dense(c.cond_dim, dtype=self.dtype, name="patches_encoder")(cond["patches"])
        attn = MaskedMultiHeadAttention(
            c.cond_dim, c.num_heads, use_pallas=c.use_pallas,
            mxu_bf16=c.flash_mxu_bf16, flash_layout=c.flash_layout,
            dtype=self.dtype,
            name="attention",
        )(text[:, None, :], patches, cond["patch_mask"], deterministic=deterministic)
        return nn.LayerNorm(dtype=jnp.float32, name="attn_norm")(attn[:, 0])


class ImageTransformerFusion(nn.Module):
    """Image-only: patch encoder MLP + CLS transformer; CLS out
    (parity: src/conditional_gan_img_transformer.py:111-141)."""

    cfg: FusionConfig
    mesh: Any = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, cond, deterministic=True):
        seq, _ = _PatchTransformer(self.cfg, encode_mlp=True, mesh=self.mesh, dtype=self.dtype)(
            cond["patches"], cond["patch_mask"], deterministic)
        return seq[:, 0]


class FiLMFusion(nn.Module):
    """Text-CLS FiLM over raw patches, then patch CLS transformer
    (parity: src/conditional_gan_film.py:112,126-148)."""

    cfg: FusionConfig
    mesh: Any = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, cond, deterministic=True):
        c = self.cfg
        patches = FiLM(c.patch_dim, beta_clamp=c.film_beta_clamp, dtype=self.dtype,
                       name="film")(cond["text_emb"], cond["patches"])
        seq, _ = _PatchTransformer(c, mesh=self.mesh, dtype=self.dtype)(
            patches, cond["patch_mask"], deterministic)
        return seq[:, 0]


class CrossAttentionFusion(nn.Module):
    """Token-level bidirectional cross-attention
    (parity: src/conditional_gan_cross_attention.py:111-141):
    patch CLS transformer; attn1(Q=text tokens, KV=patch seq);
    attn2(Q=attn1 output, KV=text tokens); cond = attn2[:,0] + attn1[:,0]."""

    cfg: FusionConfig
    mesh: Any = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, cond, deterministic=True):
        c = self.cfg
        text = nn.Dense(c.cond_dim, dtype=self.dtype, name="text_encoder")(cond["tokens"])
        patch_seq, patch_mask = _PatchTransformer(c, mesh=self.mesh, dtype=self.dtype)(
            cond["patches"], cond["patch_mask"], deterministic)
        p2t = MaskedMultiHeadAttention(
            c.cond_dim, c.num_heads, use_pallas=c.use_pallas,
            mxu_bf16=c.flash_mxu_bf16, flash_layout=c.flash_layout,
            dtype=self.dtype,
            name="patch2text_attention",
        )(text, patch_seq, patch_mask, deterministic=deterministic)
        t2p = MaskedMultiHeadAttention(
            c.cond_dim, c.num_heads, use_pallas=c.use_pallas,
            mxu_bf16=c.flash_mxu_bf16, flash_layout=c.flash_layout,
            dtype=self.dtype,
            name="text2patch_attention",
        )(p2t, text, cond["token_mask"], deterministic=deterministic)
        return t2p[:, 0] + p2t[:, 0]


class FiLMCrossAttentionFusion(nn.Module):
    """Full GeMM-GAN fusion (parity: src/conditional_gan_cross_attention_with_film.py:128-155):
    FiLM from text CLS token onto raw patches -> patch CLS transformer ->
    CLS-only-query cross-attention in both directions -> sum of attended CLS."""

    cfg: FusionConfig
    mesh: Any = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, cond, deterministic=True):
        c = self.cfg
        tokens = cond["tokens"]
        patches = FiLM(c.patch_dim, beta_clamp=c.film_beta_clamp, dtype=self.dtype,
                       name="film")(tokens[:, 0, :], cond["patches"])
        text = nn.Dense(c.cond_dim, dtype=self.dtype, name="text_encoder")(tokens)
        patch_seq, patch_mask = _PatchTransformer(c, mesh=self.mesh, dtype=self.dtype)(
            patches, cond["patch_mask"], deterministic)
        p2t = MaskedMultiHeadAttention(
            c.cond_dim, c.num_heads, use_pallas=c.use_pallas,
            mxu_bf16=c.flash_mxu_bf16, flash_layout=c.flash_layout,
            dtype=self.dtype,
            name="patch2text_attention",
        )(text[:, 0:1, :], patch_seq, patch_mask, deterministic=deterministic)
        t2p = MaskedMultiHeadAttention(
            c.cond_dim, c.num_heads, use_pallas=c.use_pallas,
            mxu_bf16=c.flash_mxu_bf16, flash_layout=c.flash_layout,
            dtype=self.dtype,
            name="text2patch_attention",
        )(p2t[:, 0:1, :], text, cond["token_mask"], deterministic=deterministic)
        return t2p[:, 0] + p2t[:, 0]


class LabelEmbedFusion(nn.Module):
    """Oracle conditioning on true labels: two categorical embeddings
    concatenated (parity: src/benchmark_generative_model.py:27-35,119-157)."""

    cfg: FusionConfig
    mesh: Any = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, cond, deterministic=True):
        c = self.cfg
        d = nn.Embed(c.n_disease_types, c.label_embed_dim, name="disease_embed")(cond["disease"])
        s = nn.Embed(c.n_primary_sites, c.label_embed_dim, name="site_embed")(cond["site"])
        return jnp.concatenate([d, s], axis=-1).astype(jnp.float32)


_FUSIONS = {
    "concat": ConcatFusion,
    "attention": PooledAttentionFusion,
    "img_transformer": ImageTransformerFusion,
    "film": FiLMFusion,
    "xattn": CrossAttentionFusion,
    "film_xattn": FiLMCrossAttentionFusion,
    "labels": LabelEmbedFusion,
}


def cond_dim_of(cfg: FusionConfig) -> int:
    if cfg.kind == "none":
        return 0
    if cfg.kind == "labels":
        return 2 * cfg.label_embed_dim
    return cfg.cond_dim


def build_fusion(cfg: FusionConfig, dtype=None, name: str = "fusion", mesh=None):
    if cfg.kind == "none":
        return None
    return _FUSIONS[cfg.kind](cfg, mesh=mesh, dtype=dtype, name=name)
