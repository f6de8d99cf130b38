"""Threaded PRNG discipline.

The reference relies on global seeding + per-worker seeds
(/root/reference/src/generative_model_utils.py:22-26, src/data_loader.py:82-98)
to approximate reproducibility. Here every consumer receives an explicit
`jax.random` key derived by folding in the step counter, so runs are bitwise
reproducible regardless of host threading.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def key_seq(seed: int):
    """Infinite generator of fresh PRNG keys (host-side convenience)."""
    key = jax.random.key(seed)
    while True:
        key, sub = jax.random.split(key)
        yield sub


def split_like(key, tree):
    """Split a key into one per leaf of a pytree, returned as a matching tree."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))


def step_key(key, step):
    """Deterministic per-step key: fold the step counter into the run key."""
    return jax.random.fold_in(key, jnp.asarray(step, dtype=jnp.uint32))
