"""FiLM (feature-wise linear modulation) of patch embeddings by text.

Capability parity with the reference FiLM conditioning
(/root/reference/src/conditional_gan_film.py:112,126-134 and
src/conditional_gan_cross_attention_with_film.py:129-137): a single Linear
maps the text vector to (gamma, beta) over the raw patch feature dim; gamma
is tanh-squashed, beta clamped to +-clamp; patches are modulated as
gamma * patches + beta before the patch encoder.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class FiLM(nn.Module):
    feature_dim: int  # raw patch feature dim (1024 for UNI)
    beta_clamp: float = 5.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, text_vec, patches):
        # text_vec: [B, T_dim]; patches: [B, P, feature_dim]
        gb = nn.Dense(2 * self.feature_dim, dtype=self.dtype, name="film_proj")(text_vec)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        gamma = jnp.tanh(gamma)
        beta = jnp.clip(beta, -self.beta_clamp, self.beta_clamp)
        return gamma[:, None, :] * patches + beta[:, None, :]
