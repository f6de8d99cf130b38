"""Contrastive projection heads + cross-modal alignment training.

The reference *imports* a `contrastive_model` module that was never
published (`UNI_FeatureExtractor`, `HuggingFaceTextEncoder` at
/root/reference/src/preprocess_embeddings.py:17,88-92,127 and
`retrieve_cross_modal` at src/privacy_evaluator.py:3) — checkpoints trained
in a separate repo are loaded from disk. This module provides the capability
natively: linear projection heads over the frozen UNI / ModernBERT
embeddings, trained with a symmetric InfoNCE (CLIP-style) objective in one
jitted step, producing the `emb_dim`-d aligned space used by
`save_text_token_embeddings_contrastive.py` and `preprocess_embeddings.py`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class ContrastiveConfig:
    image_dim: int = 1024   # UNI embedding dim
    text_dim: int = 768     # ModernBERT embedding dim
    emb_dim: int = 128      # shared projection space (reference cache dirs use 128)
    temperature_init: float = 0.07
    learn_temperature: bool = True
    lr: float = 1e-4
    weight_decay: float = 0.01


def _unit(z):
    return z / jnp.linalg.norm(z, axis=-1, keepdims=True).clip(1e-8)


class ProjectionPair(nn.Module):
    """Two linear heads into the shared space + learnable log-temperature."""

    cfg: ContrastiveConfig

    def setup(self):
        self.image_proj = nn.Dense(self.cfg.emb_dim, name="image_proj")
        self.text_proj = nn.Dense(self.cfg.emb_dim, name="text_proj")
        if self.cfg.learn_temperature:
            self.log_temperature = self.param(
                "log_temperature",
                nn.initializers.constant(float(np.log(self.cfg.temperature_init))),
                ())

    def __call__(self, image_emb, text_emb):
        zi = _unit(self.image_proj(image_emb))
        zt = _unit(self.text_proj(text_emb))
        t = (jnp.exp(self.log_temperature) if self.cfg.learn_temperature
             else jnp.asarray(self.cfg.temperature_init))
        return zi, zt, t

    def project_image(self, image_emb):
        return _unit(self.image_proj(image_emb))

    def project_text(self, text_emb):
        return _unit(self.text_proj(text_emb))


def info_nce(zi, zt, temperature):
    """Symmetric InfoNCE over in-batch negatives (CLIP objective)."""
    logits = zi @ zt.T / temperature
    labels = jnp.arange(zi.shape[0])
    li = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    lt = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    return 0.5 * (li + lt)


class ContrastiveEngine:
    """Trains the projection pair on (image_emb, text_emb) pairs."""

    def __init__(self, cfg: ContrastiveConfig):
        self.cfg = cfg
        self.model = ProjectionPair(cfg)
        self.tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
        self._step = None

    def init_state(self, seed: int) -> Dict:
        params = self.model.init(
            jax.random.key(seed),
            jnp.zeros((1, self.cfg.image_dim)),
            jnp.zeros((1, self.cfg.text_dim)))["params"]
        return {"params": params, "opt": self.tx.init(params), "step": 0}

    def _build(self):
        model, tx = self.model, self.tx

        @jax.jit
        def step(params, opt, image_emb, text_emb):
            def loss_fn(p):
                zi, zt, t = model.apply({"params": p}, image_emb, text_emb)
                return info_nce(zi, zt, t)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        return step

    def step(self, state: Dict, image_emb, text_emb) -> Tuple[Dict, float]:
        if self._step is None:
            self._step = self._build()
        params, opt, loss = self._step(state["params"], state["opt"],
                                       jnp.asarray(image_emb),
                                       jnp.asarray(text_emb))
        return ({"params": params, "opt": opt, "step": state["step"] + 1},
                float(loss))

    def fit(self, state: Dict, epochs: int, batches_fn) -> Dict:
        for _ in range(epochs):
            for img, txt in batches_fn():
                state, _ = self.step(state, img, txt)
        return state

    def project(self, state: Dict, image_emb=None, text_emb=None):
        out = []
        if image_emb is not None:
            out.append(np.asarray(self.model.apply(
                {"params": state["params"]}, jnp.asarray(image_emb),
                method=self.model.project_image)))
        if text_emb is not None:
            out.append(np.asarray(self.model.apply(
                {"params": state["params"]}, jnp.asarray(text_emb),
                method=self.model.project_text)))
        return out[0] if len(out) == 1 else tuple(out)
