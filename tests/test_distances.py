"""Distance metrics: exact OT vs scipy, Sinkhorn vs exact, MMD goldens
(reference formulas: /root/reference/src/distribution_distances.py:299-527)."""

import numpy as np
import pytest

from gemm_gan_tpu.eval.distances import (
    compute_distribution_distances,
    emd2,
    linear_mmd2,
    mix_rbf_mmd2,
    poly_mmd2,
    wasserstein,
)


def test_emd2_square_uniform_matches_assignment(rng):
    from scipy.optimize import linear_sum_assignment

    n = 40
    M = rng.rand(n, n)
    a = np.full(n, 1.0 / n)
    got = emd2(a, a, M)
    r, c = linear_sum_assignment(M)
    np.testing.assert_allclose(got, M[r, c].mean(), rtol=1e-9)


def test_emd2_rectangular_matches_linprog(rng):
    from scipy.optimize import linprog

    n, m = 9, 13
    M = rng.rand(n, m)
    a = np.full(n, 1.0 / n)
    b = np.full(m, 1.0 / m)
    A_eq = []
    for i in range(n):
        row = np.zeros(n * m); row[i * m:(i + 1) * m] = 1; A_eq.append(row)
    for j in range(m):
        row = np.zeros(n * m); row[j::m] = 1; A_eq.append(row)
    res = linprog(M.ravel(), A_eq=np.array(A_eq),
                  b_eq=np.concatenate([a, b]), bounds=(0, None), method="highs")
    np.testing.assert_allclose(emd2(a, b, M), res.fun, rtol=1e-8)


def test_wasserstein_powers(rng):
    x = rng.randn(30, 5).astype(np.float32)
    y = rng.randn(25, 5).astype(np.float32)
    w1 = wasserstein(x, y, power=1)
    w2 = wasserstein(x, y, power=2)
    assert w1 > 0 and w2 > 0
    # W2 >= W1 by Jensen
    assert w2 >= w1 - 1e-6
    assert wasserstein(x, x, power=1) == pytest.approx(0.0, abs=1e-5)


def test_sinkhorn_close_to_exact(rng):
    x = rng.randn(40, 4).astype(np.float32)
    y = (rng.randn(40, 4) + 0.5).astype(np.float32)
    exact = wasserstein(x, y, power=1)
    sink = wasserstein(x, y, method="sinkhorn", reg=0.01, power=1)
    assert abs(sink - exact) / exact < 0.1


def test_linear_mmd2_golden(rng):
    X = rng.randn(20, 6).astype(np.float32)
    Y = rng.randn(20, 6).astype(np.float32)
    delta = X - Y
    want = np.mean((delta[:-1] * delta[1:]).sum(1))
    np.testing.assert_allclose(float(linear_mmd2(X, Y)), want, rtol=1e-5)


def test_poly_mmd2_golden(rng):
    X = rng.randn(20, 6).astype(np.float32)
    Y = rng.randn(20, 6).astype(np.float32)
    d, alpha, c = 2, 1.0, 2.0

    def k(u, v):
        return np.mean((alpha * (u[:-1] * v[1:]).sum(1) + c) ** d)

    want = k(X, X) + k(Y, Y) - k(X, Y) - k(Y, X)
    np.testing.assert_allclose(float(poly_mmd2(X, Y)), want, rtol=1e-4)


def test_mix_rbf_mmd2_properties(rng):
    X = rng.randn(30, 5).astype(np.float32)
    Y = (rng.randn(30, 5) + 2.0).astype(np.float32)
    near = mix_rbf_mmd2(X, X + 1e-3 * rng.randn(30, 5).astype(np.float32))
    far = mix_rbf_mmd2(X, Y)
    assert far > near >= 0


def test_compute_distribution_distances_keys(rng):
    x = rng.randn(20, 4).astype(np.float32)
    y = rng.randn(24, 4).astype(np.float32)
    out = compute_distribution_distances(x, y)
    assert set(out) == {"1-Wasserstein", "2-Wasserstein", "Linear_MMD", "Poly_MMD"}
    assert all(np.isfinite(v) for v in out.values())


def test_mix_rbf_mmd2_and_ratio_biased_default_matches_mmd2():
    """The ratio variant defaults to the BIASED estimator like the
    reference (:411-415): its mmd2 must equal mix_rbf_mmd2(biased=True),
    and the unbiased option must equal mix_rbf_mmd2(biased=False)."""
    import numpy as np

    from gemm_gan_tpu.eval.distances import mix_rbf_mmd2, mix_rbf_mmd2_and_ratio

    rng = np.random.RandomState(3)
    X = rng.randn(24, 6).astype(np.float32)
    Y = (rng.randn(24, 6) + 0.5).astype(np.float32)
    m2_b, ratio_b = mix_rbf_mmd2_and_ratio(X, Y)
    np.testing.assert_allclose(m2_b, mix_rbf_mmd2(X, Y, biased=True),
                               rtol=1e-5, atol=1e-7)
    m2_u, _ = mix_rbf_mmd2_and_ratio(X, Y, biased=False)
    np.testing.assert_allclose(m2_u, mix_rbf_mmd2(X, Y, biased=False),
                               rtol=1e-5, atol=1e-7)
    assert m2_b != m2_u
    assert np.isfinite(ratio_b)
