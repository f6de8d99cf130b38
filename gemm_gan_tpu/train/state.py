"""Full training state as a single pytree — checkpointable and donatable."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


class GANTrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any
    key: jax.Array  # run-level base key; per-step keys fold in `step`
    # EMA of the generator params (beyond reference, `train.ema_decay` > 0);
    # None when disabled so checkpoints/pytrees are unchanged by default
    g_ema: Any = None

    @classmethod
    def create(cls, g_params, d_params, g_opt_state, d_opt_state, key,
               g_ema=None):
        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            g_params=g_params,
            d_params=d_params,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            key=key,
            g_ema=g_ema,
        )


class VAETrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    key: jax.Array

    @classmethod
    def create(cls, params, opt_state, key):
        return cls(step=jnp.zeros((), dtype=jnp.int32), params=params,
                   opt_state=opt_state, key=key)
