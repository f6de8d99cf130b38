"""k-NN manifold precision/recall (Kynkäänniemi et al.) + realism score.

Formula parity with /root/reference/src/unsupervised_metrics.py:114-345:
L2 pairwise distances, per-point k-NN radius on the reference manifold,
precision = fraction of eval points inside any reference hypersphere, recall
symmetric, realism = max over (radius_clamped / distance) ratios. The
reference batches torch matmuls; here the distance blocks are jitted jnp and
run on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("block",))
def _pairwise_l2sq(x, y, block: int = 4096):
    """Squared L2 distances [N, M] (parity: batch_pairwise_distances :114-138)."""
    n = x.shape[0]
    nb = -(-n // block)
    xp = jnp.pad(x, ((0, nb * block - n), (0, 0)))

    def body(i):
        xb = jax.lax.dynamic_slice_in_dim(xp, i * block, block, 0)
        x2 = jnp.sum(xb * xb, axis=1)[:, None]
        y2 = jnp.sum(y * y, axis=1)[None, :]
        return jnp.maximum(x2 + y2 - 2.0 * jnp.dot(xb, y.T, preferred_element_type=jnp.float32), 0.0)

    out = jax.lax.map(body, jnp.arange(nb))
    return out.reshape(nb * block, y.shape[0])[:n]


class ManifoldEstimator:
    """k-NN hypersphere manifold of a feature set
    (parity: unsupervised_metrics.py:141-244)."""

    def __init__(self, features, nhood_sizes=(3,), clamp_to_percentile=None):
        self.features = jnp.asarray(features, jnp.float32)
        self.nhood_sizes = tuple(nhood_sizes)
        d = _pairwise_l2sq(self.features, self.features)
        radii = []
        for k in self.nhood_sizes:
            # k-th neighbor excluding self: (k+1)-th smallest incl. self-0
            neg = jax.lax.top_k(-d, k + 1)[0]
            radii.append(-neg[:, k])
        self.radii = jnp.stack(radii, axis=1)  # [N, n_sizes]
        if clamp_to_percentile is not None:
            caps = jnp.percentile(self.radii, clamp_to_percentile, axis=0)
            self.radii = jnp.where(self.radii > caps[None, :], 0.0, self.radii)

    def evaluate(self, eval_features, return_realism: bool = False):
        ef = jnp.asarray(eval_features, jnp.float32)
        d = _pairwise_l2sq(ef, self.features)  # [M, N]
        # inside any reference hypersphere?
        preds = []
        for i, _ in enumerate(self.nhood_sizes):
            preds.append(jnp.any(d <= self.radii[None, :, i], axis=1))
        batch_predictions = jnp.stack(preds, axis=1).astype(jnp.int32)
        if return_realism:
            realism = jnp.max(self.radii[None, :, 0] / jnp.maximum(d, 1e-18), axis=1)
            return np.asarray(batch_predictions), np.asarray(realism)
        return np.asarray(batch_predictions)


def knn_precision_recall_features(ref_features, eval_features, nhood_sizes=(3,)):
    ref_manifold = ManifoldEstimator(ref_features, nhood_sizes)
    eval_manifold = ManifoldEstimator(eval_features, nhood_sizes)
    precision = ref_manifold.evaluate(eval_features).mean(axis=0)
    recall = eval_manifold.evaluate(ref_features).mean(axis=0)
    return {"precision": precision, "recall": recall}


def get_precision_recall(real_data, fake_data, nb_nn=(10,)):
    state = knn_precision_recall_features(real_data, fake_data, nhood_sizes=tuple(nb_nn))
    return float(state["precision"][0]), float(state["recall"][0])


def get_realism_score(real_data, fake_data):
    manifold = ManifoldEstimator(real_data, clamp_to_percentile=50)
    _, realism = manifold.evaluate(fake_data, return_realism=True)
    return realism
