"""k-NN manifold precision/recall tests (reference:
/root/reference/src/unsupervised_metrics.py:141-345)."""

import numpy as np

from gemm_gan_tpu.eval.knn_pr import (
    ManifoldEstimator,
    get_precision_recall,
    get_realism_score,
)


def test_identical_sets_perfect(rng):
    x = rng.randn(50, 8).astype(np.float32)
    p, r = get_precision_recall(x, x.copy(), nb_nn=[3])
    assert p == 1.0 and r == 1.0


def test_disjoint_sets_zero(rng):
    x = rng.randn(40, 8).astype(np.float32)
    y = x + 500.0
    p, r = get_precision_recall(x, y, nb_nn=[3])
    assert p == 0.0 and r == 0.0


def test_subset_high_precision(rng):
    real = rng.randn(100, 6).astype(np.float32)
    fake = real[:30] + 1e-4  # generated sits on the real manifold
    p, r = get_precision_recall(real, fake, nb_nn=[5])
    assert p == 1.0
    assert r < 1.0  # fake manifold doesn't cover all real


def test_manifold_evaluate_shapes(rng):
    ref = rng.randn(30, 5).astype(np.float32)
    est = ManifoldEstimator(ref, nhood_sizes=(3, 5))
    out = est.evaluate(rng.randn(12, 5).astype(np.float32))
    assert out.shape == (12, 2)
    assert set(np.unique(out)).issubset({0, 1})


def test_realism_score(rng):
    real = rng.randn(60, 5).astype(np.float32)
    close = real[:10] + 1e-3
    far = real[:10] + 50.0
    r_close = get_realism_score(real, close)
    r_far = get_realism_score(real, far)
    assert r_close.mean() > r_far.mean()
