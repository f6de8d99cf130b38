"""PRDC (precision / recall / density / coverage), on-device.

Formula parity with /root/reference/src/distribution_distances.py:51-142:
L1 pairwise distances, k-th NN radius per manifold (k+1-th smallest including
self), then the four indicator statistics. The reference shells out to
sklearn `pairwise_distances(n_jobs=8)`; here the distance matrices are
computed in blocked jnp (|x_i - y_j| sums vectorize on the VPU) and the
whole statistic is jitted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("block", "feat_block"))
def _pairwise_l1(x, y, block: int = 512, feat_block: int = 256):
    """[N, M] L1 distances, blocked on rows AND features to bound memory.

    L1 has no matmul identity (unlike L2's x²+y²-2xy), so the broadcast
    |x_i - y_j| tensor is unavoidable — but it must never materialize at
    full width: [rows, M, D] at the canonical test-block shape (2048 x
    4096 x 18,868) is 633 GB, and XLA:CPU was measured actually attempting
    that allocation (TPU fuses it, but the bound should not depend on a
    fusion heuristic). Features are accumulated in `feat_block` chunks, so
    the worst-case intermediate is rows x M x feat_block (512 x 4096 x 256
    x 4 B = 2 GB, transient). Zero-padding both operands' feature tails
    contributes |0-0| = 0 — exact."""
    n, d = x.shape
    nb = -(-n // block)
    npad = nb * block - n
    fb = -(-d // feat_block)
    dpad = fb * feat_block - d
    xp = jnp.pad(x, ((0, npad), (0, dpad)))
    yp = jnp.pad(y, ((0, 0), (0, dpad)))

    def body(i):
        xb = jax.lax.dynamic_slice_in_dim(xp, i * block, block, 0)

        def feat(j, acc):
            xc = jax.lax.dynamic_slice_in_dim(xb, j * feat_block, feat_block, 1)
            yc = jax.lax.dynamic_slice_in_dim(yp, j * feat_block, feat_block, 1)
            return acc + jnp.sum(jnp.abs(xc[:, None, :] - yc[None, :, :]),
                                 axis=-1)

        return jax.lax.fori_loop(
            0, fb, feat, jnp.zeros((block, y.shape[0]), x.dtype))

    blocks = jax.lax.map(body, jnp.arange(nb))
    return blocks.reshape(nb * block, y.shape[0])[:n]


def _kth_value(d, k):
    """k-th smallest along the last axis (1-indexed k, matching np.argpartition[..., :k].max)."""
    neg_topk = jax.lax.top_k(-d, k)[0]
    return -neg_topk[..., k - 1]


def compute_nearest_neighbour_distances(features, nearest_k: int, block: int = 512):
    d = _pairwise_l1(jnp.asarray(features), jnp.asarray(features), block)
    # reference uses get_kth_value(..., k=nearest_k + 1) including self-distance 0
    return _kth_value(d, nearest_k + 1)


def compute_prdc(real_features, fake_features, nearest_k: int, block: int = 512):
    real = jnp.asarray(real_features, jnp.float32)
    fake = jnp.asarray(fake_features, jnp.float32)
    # sets smaller than k+1 have no k-th neighbour (the reference's sklearn
    # kneighbors would error the same way); clamp so tiny smoke/validation
    # sets degrade instead of crashing. A 1-sample set has NO neighbour at
    # all (the k-th-value lookup needs k+1 <= n) — degenerate by definition,
    # return all-zero metrics instead of crashing inside top_k
    if real.shape[0] < 2 or fake.shape[0] < 2:
        return {"precision": 0.0, "recall": 0.0, "density": 0.0,
                "coverage": 0.0}
    nearest_k = max(1, min(nearest_k, real.shape[0] - 1, fake.shape[0] - 1))
    real_nnd = compute_nearest_neighbour_distances(real, nearest_k, block)
    fake_nnd = compute_nearest_neighbour_distances(fake, nearest_k, block)
    d_rf = _pairwise_l1(real, fake, block)  # [N_real, N_fake]

    precision = jnp.mean(jnp.any(d_rf < real_nnd[:, None], axis=0))
    recall = jnp.mean(jnp.any(d_rf < fake_nnd[None, :], axis=1))
    density = jnp.mean(jnp.sum(d_rf < real_nnd[:, None], axis=0)) / nearest_k
    coverage = jnp.mean(jnp.min(d_rf, axis=1) < real_nnd)
    return {
        "precision": float(precision),
        "recall": float(recall),
        "density": float(density),
        "coverage": float(coverage),
    }


# ------------------------------------------------------------ numpy golden
def compute_prdc_np(real_features, fake_features, nearest_k: int):
    """Numpy golden reference (mirrors the cited formulas exactly)."""
    def pair(a, b):
        return np.abs(a[:, None, :] - b[None, :, :]).sum(-1)

    def nnd(a):
        d = pair(a, a)
        part = np.argpartition(d, nearest_k + 1, axis=-1)[..., : nearest_k + 1]
        return np.take_along_axis(d, part, axis=-1).max(-1)

    real_nnd, fake_nnd = nnd(real_features), nnd(fake_features)
    d_rf = pair(real_features, fake_features)
    return {
        "precision": float((d_rf < real_nnd[:, None]).any(0).mean()),
        "recall": float((d_rf < fake_nnd[None, :]).any(1).mean()),
        "density": float((d_rf < real_nnd[:, None]).sum(0).mean() / nearest_k),
        "coverage": float((d_rf.min(1) < real_nnd).mean()),
    }
