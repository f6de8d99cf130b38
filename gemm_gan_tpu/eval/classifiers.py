"""On-device classifiers with an sklearn-style interface.

`MLPClassifier` provides the capability of the reference's
`TorchMLPClassifier` (/root/reference/src/classifiers/mlp.py:29-99:
BatchNorm+Dropout MLP, AdamW + cross-entropy + grad-clip fit, batched
predict/proba) as a jitted JAX training loop; with `hidden=()` it doubles as
the logistic-regression detector (the reference builds LR as a 0-hidden MLP,
src/generative_model_utils.py:72-76).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _init_params(key, dims: Sequence[int]):
    params = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (dims[i], dims[i + 1])) * np.sqrt(2.0 / dims[i])
        params.append({"w": w, "b": jnp.zeros((dims[i + 1],)),
                       "gamma": jnp.ones((dims[i + 1],)),
                       "beta": jnp.zeros((dims[i + 1],))})
    return params


def _init_stats(dims: Sequence[int]):
    """Per-hidden-layer BatchNorm running statistics (torch semantics)."""
    return [{"mean": jnp.zeros((dims[i + 1],)), "var": jnp.ones((dims[i + 1],))}
            for i in range(len(dims) - 2)]


def _forward(params, x, train: bool, drop_key=None, dropout: float = 0.1,
             stats=None, momentum: float = 0.1):
    """MLP with BatchNorm (+ReLU+Dropout) hidden layers.

    Train mode normalizes with the CURRENT batch's moments and returns
    updated running statistics; eval mode normalizes with the RUNNING
    statistics — matching the reference TorchMLPClassifier, which calls
    `model.eval()` before predicting (src/classifiers/mlp.py:79-99), so
    inference is deterministic and independent of batch composition.
    Returns (logits, new_stats)."""
    h = x
    n = len(params)
    new_stats = [] if train else stats
    for i, layer in enumerate(params):
        h = jnp.dot(h, layer["w"], preferred_element_type=jnp.float32) + layer["b"]
        if i < n - 1:
            if train:
                mean = jnp.mean(h, axis=0)
                var = jnp.var(h, axis=0)
                if stats is not None:
                    # torch updates running_var with the UNBIASED estimate
                    m = h.shape[0]
                    unbiased = var * (m / max(m - 1, 1))
                    new_stats.append({
                        "mean": (1 - momentum) * stats[i]["mean"] + momentum * mean,
                        "var": (1 - momentum) * stats[i]["var"] + momentum * unbiased,
                    })
            else:
                mean = stats[i]["mean"]
                var = stats[i]["var"]
            h = (h - mean) / jnp.sqrt(var + 1e-5) * layer["gamma"] + layer["beta"]
            h = jax.nn.relu(h)
            if train and dropout > 0 and drop_key is not None:
                drop_key, sub = jax.random.split(drop_key)
                keep = jax.random.bernoulli(sub, 1 - dropout, h.shape)
                h = jnp.where(keep, h / (1 - dropout), 0.0)
    return h, new_stats


class MLPClassifier:
    def __init__(self, hidden: Tuple[int, ...] = (100,), epochs: int = 30,
                 batch_size: int = 128, lr: float = 1e-3, weight_decay: float = 1e-2,
                 dropout: float = 0.1, clip_grad: float = 1.0, seed: int = 42):
        self.hidden = tuple(hidden)
        self.epochs = epochs
        self.batch_size = batch_size
        self.lr = lr
        self.weight_decay = weight_decay
        self.dropout = dropout
        self.clip_grad = clip_grad
        self.seed = seed
        self.params = None
        self.classes_ = None

    def fit(self, X, y):
        """One scanned device program: the whole fit (epochs x batches) is a
        single dispatch with X uploaded ONCE and batches gathered on device.

        The previous per-minibatch jitted loop uploaded a fresh [bs, D]
        slice per step; over a tunneled backend those unsynchronized
        transfers backlog in host memory — at the canonical detection shape
        (200 epochs x 64 batches x 9.6 MB ≈ 123 GB in flight) it OOM-killed
        the host (observed on the canonical-width quality run) and would
        have taken ~an hour of wire time. Batch composition, permutation
        order, per-batch PRNG splits, and the trailing-partial-batch rule
        (trains unless < 2 rows — BatchNorm needs 2, torch raises the same)
        are IDENTICAL to the loop it replaces."""
        y = np.asarray(y)
        self.classes_, y_idx = np.unique(y, return_inverse=True)
        n_classes = len(self.classes_)
        n, d = X.shape
        dims = (d, *self.hidden, n_classes)
        key = jax.random.key(self.seed)
        key, init_key = jax.random.split(key)
        params = _init_params(init_key, dims)
        tx = optax.chain(optax.clip_by_global_norm(self.clip_grad),
                         optax.adamw(self.lr, weight_decay=self.weight_decay))
        opt_state = tx.init(params)
        dropout = self.dropout

        stats = _init_stats(dims)

        bs = min(self.batch_size, n)
        nb = n // bs
        rem = n - nb * bs
        rng = np.random.RandomState(self.seed)
        perms = np.stack([rng.permutation(n).astype(np.int32)
                          for _ in range(self.epochs)])

        def step_math(params, opt_state, stats, xb, yb, key):
            def loss_fn(p):
                logits, new_stats = _forward(p, xb, True, key, dropout,
                                             stats=stats)
                loss = optax.softmax_cross_entropy_with_integer_labels(
                    logits, yb).mean()
                return loss, new_stats

            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state,
                    jax.lax.stop_gradient(new_stats), loss)

        # Xd/yd/perms are ARGUMENTS, not closure captures: captured device
        # arrays serialize into the compiled program as constants and
        # overflow remote-compile request limits (CLAUDE.md / DeviceCache).
        @jax.jit
        def fit_scan(params, opt_state, stats, key, Xd, yd, perms):
            def take_step(carry, idx):
                params, opt_state, stats, key = carry
                key, sub = jax.random.split(key)
                params, opt_state, stats, loss = step_math(
                    params, opt_state, stats,
                    jnp.take(Xd, idx, axis=0), jnp.take(yd, idx, axis=0), sub)
                return (params, opt_state, stats, key), loss

            def epoch_body(carry, perm):
                # every batch below 2 rows is SKIPPED, exactly like the
                # loop this replaces (BatchNorm cannot normalize one row;
                # torch raises there too) — bs can only be < 2 when
                # batch_size=1 or n=1
                if bs >= 2:
                    carry, _ = jax.lax.scan(
                        take_step, carry, perm[:nb * bs].reshape(nb, bs))
                if rem >= 2:
                    carry, _ = take_step(carry, perm[nb * bs:])
                return carry, 0.0

            carry, _ = jax.lax.scan(epoch_body,
                                    (params, opt_state, stats, key), perms)
            return carry

        Xd = jnp.asarray(X, jnp.float32)  # no-op for device-resident input
        params, opt_state, stats, _ = fit_scan(
            params, opt_state, stats, key, Xd, jnp.asarray(y_idx), perms)
        self.params = jax.device_get(params)
        self.stats = jax.device_get(stats)
        return self

    def predict_proba(self, X):
        # jnp.asarray directly: an np.asarray detour would FETCH a
        # device-resident X to host and re-upload it
        X = jnp.asarray(X, jnp.float32)
        logits, _ = _forward(self.params, X, False, stats=self.stats)
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    def predict(self, X):
        return self.classes_[self.predict_proba(X).argmax(axis=1)]

    def score(self, X, y):
        return float((self.predict(X) == np.asarray(y)).mean())


class KNNClassifier:
    """On-device k-NN (replaces sklearn KNeighborsClassifier in the
    two-sample tests, /root/reference/src/distribution_distances.py:172-201)."""

    def __init__(self, n_neighbors: int = 5):
        self.k = n_neighbors

    def fit(self, X, y):
        # jnp.asarray is a no-op for device arrays: callers feeding
        # device-resident features (in-loop validation proxy) pay no
        # host round trip here
        self.X = jnp.asarray(X, dtype=jnp.float32)
        y = np.asarray(y)
        self.classes_, self.y_idx = np.unique(y, return_inverse=True)
        return self

    def predict(self, X):
        from gemm_gan_tpu.eval.knn_pr import _pairwise_l2sq

        d = _pairwise_l2sq(jnp.asarray(X, dtype=jnp.float32), self.X)
        _, idx = jax.lax.top_k(-d, self.k)
        votes = self.y_idx[np.asarray(idx)]
        n_classes = len(self.classes_)
        counts = np.apply_along_axis(
            lambda r: np.bincount(r, minlength=n_classes), 1, votes)
        return self.classes_[counts.argmax(axis=1)]
