"""WGAN-GP generator and critic.

One parametric Generator/Critic pair replaces the reference's per-file
`generator`/`discriminator` classes (e.g.
/root/reference/src/conditional_gan_concat.py:97-195,
src/vanilla_gan_unconditional.py:93-184): each owns an independent fusion
module (selected by config) and an MLP trunk over [z ∥ cond] / [x ∥ cond].
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from gemm_gan_tpu.config import ModelConfig
from gemm_gan_tpu.fusion.modules import build_fusion

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


class _Conditioned(nn.Module):
    """Shared base: a `fusion` submodule (set up by subclasses) exposed
    through `embed_cond`, so both halves of trunk([x ∥ fusion(cond)]) are
    independently callable Flax methods."""

    cfg: ModelConfig
    mesh: Any = None

    def _dtype(self):
        return _DTYPES[self.cfg.compute_dtype]

    def embed_cond(self, cond: Optional[dict], deterministic: bool = True):
        """Fusion half: conditioning dict -> [B, cond_dim] f32 (or None)."""
        if self.fusion is None:
            return None
        if cond is None:
            raise ValueError(
                f"fusion kind {self.cfg.fusion.kind!r} requires conditioning inputs "
                f"(batch keys like 'text_emb'/'patches'/'tokens'/'disease'), got none")
        return self.fusion(cond, deterministic=deterministic).astype(jnp.float32)


class Generator(_Conditioned):
    """z [B, latent] (+ cond dict) -> gene-expression vector [B, n_genes].

    Like `Critic`, structured as `score(z, embed_cond(cond))` with both
    halves exposed as Flax methods: the conditioning inputs are constant
    across a fused training step and the generator params are constant
    across its n_critic critic updates, so the engine's opt-in
    `cond_embed_reuse="per_update"` mode embeds once and reuses the vector
    (train/wgan.py). Parameter tree ("fusion", "trunk") is unchanged.
    """

    cfg: ModelConfig

    def setup(self):
        from gemm_gan_tpu.ops.mlp import MLPTrunk

        self.fusion = build_fusion(self.cfg.fusion, dtype=self._dtype(),
                                   name=None, mesh=self.mesh)
        self.trunk = MLPTrunk(
            hidden_dims=self.cfg.gen_dims,
            out_dim=self.cfg.n_genes,
            negative_slope=self.cfg.negative_slope,
            use_batchnorm=self.cfg.use_batchnorm,
            dtype=self._dtype(),
        )

    def score(self, z, cvec=None, train: bool = False):
        """Trunk half: latent [B, latent] (+ fixed cond vector) -> [B, n_genes]."""
        x = z if cvec is None else jnp.concatenate([z, cvec], axis=-1)
        return self.trunk(x, train=train)

    def __call__(self, z, cond: Optional[dict] = None, deterministic: bool = True,
                 train: bool = False):
        return self.score(z, self.embed_cond(cond, deterministic), train=train)


class Critic(_Conditioned):
    """Gene-expression vector [B, n_genes] (+ cond dict) -> score [B, 1].

    Named Critic (it scores, not classifies), but provides the reference's
    `discriminator` capability. The score head stays f32: WGAN losses and the
    gradient penalty are variance-sensitive (SURVEY.md §7 hard part 7).

    Structured as `score(x, embed_cond(cond))` with both halves exposed as
    Flax methods: the critic is trunk([x ∥ fusion(cond)]) and the gradient
    penalty differentiates w.r.t. the expression x only (reference
    /root/reference/src/conditional_gan_concat.py:332-337 takes
    `autograd.grad(..., inputs=interpolated)`), so the training engine
    evaluates `embed_cond` ONCE outside the inner grad and only the MLP
    trunk is differentiated twice. Parameter tree ("fusion", "trunk") is
    identical to the previous single-`__call__` layout.
    """

    cfg: ModelConfig

    def setup(self):
        from gemm_gan_tpu.ops.mlp import MLPTrunk

        self.fusion = build_fusion(self.cfg.fusion, dtype=self._dtype(),
                                   name=None, mesh=self.mesh)
        self.trunk = MLPTrunk(
            hidden_dims=self.cfg.disc_dims,
            out_dim=1,
            negative_slope=self.cfg.negative_slope,
            use_batchnorm=self.cfg.use_batchnorm,
            dtype=self._dtype(),
        )

    def score(self, x, cvec=None, train: bool = False):
        """Trunk half: expression [B, n_genes] (+ fixed cond vector) -> [B, 1]."""
        h = x if cvec is None else jnp.concatenate([x, cvec], axis=-1)
        return self.trunk(h, train=train)

    def __call__(self, x, cond: Optional[dict] = None, deterministic: bool = True,
                 train: bool = False):
        return self.score(x, self.embed_cond(cond, deterministic), train=train)
