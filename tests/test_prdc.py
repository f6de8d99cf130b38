"""PRDC golden tests (reference formulas:
/root/reference/src/distribution_distances.py:51-142)."""

import numpy as np

from gemm_gan_tpu.eval.prdc import compute_prdc, compute_prdc_np


def test_prdc_jax_matches_numpy(rng):
    real = rng.randn(60, 12).astype(np.float32)
    fake = (real[::-1] + 0.3 * rng.randn(60, 12)).astype(np.float32)
    got = compute_prdc(real, fake, nearest_k=5)
    want = compute_prdc_np(real, fake, nearest_k=5)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6, err_msg=k)


def test_prdc_identical_sets(rng):
    x = rng.randn(50, 8).astype(np.float32)
    out = compute_prdc(x, x.copy(), nearest_k=5)
    assert out["precision"] == 1.0
    assert out["recall"] == 1.0
    assert out["coverage"] == 1.0


def test_prdc_disjoint_sets(rng):
    real = rng.randn(40, 8).astype(np.float32)
    fake = real + 1000.0
    out = compute_prdc(real, fake, nearest_k=3)
    assert out["precision"] == 0.0
    assert out["recall"] == 0.0
    assert out["coverage"] == 0.0


def test_prdc_blocking_invariance(rng):
    real = rng.randn(70, 10).astype(np.float32)
    fake = rng.randn(55, 10).astype(np.float32)
    a = compute_prdc(real, fake, nearest_k=4, block=16)
    b = compute_prdc(real, fake, nearest_k=4, block=512)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-6, err_msg=k)


def test_prdc_single_sample_set_degrades():
    """A 1-sample set has no k-th neighbour at any k: all-zero metrics
    instead of a top_k crash."""
    import numpy as np

    from gemm_gan_tpu.eval.prdc import compute_prdc

    r = np.random.RandomState(0).randn(1, 4).astype(np.float32)
    f = np.random.RandomState(1).randn(8, 4).astype(np.float32)
    for a, b in ((r, f), (f, r)):
        out = compute_prdc(a, b, nearest_k=5)
        assert out == {"precision": 0.0, "recall": 0.0, "density": 0.0,
                       "coverage": 0.0}
