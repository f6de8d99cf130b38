"""VAE / CVAE baselines.

Capability parity with the reference VAE family
(/root/reference/src/vae/vae.py:20-161, src/vae/cvae.py:56-171,
src/vae/losses.py:5-19): MLP encoder -> (mu, logvar) -> reparameterized
latent -> MLP decoder; the CVAE conditions both encoder and decoder on two
128-d categorical label embeddings. Reconstruction is MSE or Gaussian NLL,
KL is analytic; sampling decodes N(0,1) latents (CVAE: with label
embeddings).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gemm_gan_tpu.config import ModelConfig

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


class _MLP(nn.Module):
    dims: Tuple[int, ...]
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for d in self.dims:
            x = nn.relu(nn.Dense(d, dtype=self.dtype)(x))
        return x


class VAE(nn.Module):
    cfg: ModelConfig

    def setup(self):
        dt = _DTYPES[self.cfg.compute_dtype]
        self.encoder = _MLP(self.cfg.vae_encoder_dims, dtype=dt)
        self.mu_head = nn.Dense(self.cfg.vae_latent_dim, dtype=jnp.float32)
        self.logvar_head = nn.Dense(self.cfg.vae_latent_dim, dtype=jnp.float32)
        self.decoder = _MLP(self.cfg.vae_decoder_dims, dtype=dt)
        self.out_head = nn.Dense(self.cfg.n_genes, dtype=jnp.float32)
        if self.cfg.vae_recon == "gaussian_nll":
            self.out_logvar = nn.Dense(self.cfg.n_genes, dtype=jnp.float32)

    def encode(self, x):
        h = self.encoder(x)
        return self.mu_head(h), self.logvar_head(h)

    def decode(self, z):
        h = self.decoder(z)
        if self.cfg.vae_recon == "gaussian_nll":
            return self.out_head(h), self.out_logvar(h)
        return self.out_head(h)

    def __call__(self, x, rng):
        mu, logvar = self.encode(x)
        eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
        z = mu + jnp.exp(0.5 * logvar) * eps
        return self.decode(z), mu, logvar

    def sample(self, rng, num: int):
        z = jax.random.normal(rng, (num, self.cfg.vae_latent_dim))
        out = self.decode(z)
        return out[0] if isinstance(out, tuple) else out


class CVAE(nn.Module):
    cfg: ModelConfig

    def setup(self):
        dt = _DTYPES[self.cfg.compute_dtype]
        f = self.cfg.fusion
        self.disease_embed = nn.Embed(f.n_disease_types, f.label_embed_dim)
        self.site_embed = nn.Embed(f.n_primary_sites, f.label_embed_dim)
        self.encoder = _MLP(self.cfg.vae_encoder_dims, dtype=dt)
        self.mu_head = nn.Dense(self.cfg.vae_latent_dim, dtype=jnp.float32)
        self.logvar_head = nn.Dense(self.cfg.vae_latent_dim, dtype=jnp.float32)
        self.decoder = _MLP(self.cfg.vae_decoder_dims, dtype=dt)
        self.out_head = nn.Dense(self.cfg.n_genes, dtype=jnp.float32)

    def _labels(self, disease, site):
        return jnp.concatenate(
            [self.disease_embed(disease), self.site_embed(site)], axis=-1)

    def encode(self, x, disease, site):
        h = self.encoder(jnp.concatenate([x, self._labels(disease, site)], axis=-1))
        return self.mu_head(h), self.logvar_head(h)

    def decode(self, z, disease, site):
        h = self.decoder(jnp.concatenate([z, self._labels(disease, site)], axis=-1))
        return self.out_head(h)

    def __call__(self, x, disease, site, rng):
        mu, logvar = self.encode(x, disease, site)
        eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
        z = mu + jnp.exp(0.5 * logvar) * eps
        return self.decode(z, disease, site), mu, logvar

    def sample(self, rng, disease, site):
        z = jax.random.normal(rng, (disease.shape[0], self.cfg.vae_latent_dim))
        return self.decode(z, disease, site)


def kl_divergence(mu, logvar):
    """Analytic KL(N(mu, sigma) || N(0, 1)), summed over latent dims, mean over batch
    (parity: /root/reference/src/vae/losses.py:13-19)."""
    return jnp.mean(-0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=-1))


def recon_loss(x, out, kind: str = "mse"):
    """MSE or Gaussian NLL reconstruction (parity: src/vae/losses.py:5-12)."""
    if kind == "gaussian_nll":
        mean, logvar = out
        return jnp.mean(0.5 * (jnp.exp(-logvar) * (x - mean) ** 2 + logvar))
    return jnp.mean((x - out) ** 2)


def elbo_loss(x, out, mu, logvar, beta: float = 1.0, recon: str = "mse"):
    r = recon_loss(x, out, recon)
    kl = kl_divergence(mu, logvar)
    return r + beta * kl, (r, kl)
