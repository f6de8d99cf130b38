"""Golden tests for the gamma correlation score (reference formulas:
/root/reference/src/corr_score.py:20-120)."""

import numpy as np
import pytest

from gemm_gan_tpu.eval.gamma import (
    correlations_list,
    gamma_coef,
    gamma_coef_np,
    pearson_correlation,
    upper_diag_list,
)


def _ref_standardize(a):
    mean = np.mean(a, axis=0)
    std = np.std(a, axis=0)
    s = (a - mean) / std
    s[np.isnan(s)] = (a - mean)[np.isnan(s)]
    return s


def test_upper_diag_list_order():
    m = np.arange(16, dtype=float).reshape(4, 4)
    out = upper_diag_list(m)
    np.testing.assert_allclose(out, [1, 2, 3, 6, 7, 11])


def test_pearson_matches_manual(rng):
    x = rng.randn(30, 7)
    y = rng.randn(30, 5)
    got = pearson_correlation(x, y)
    want = np.dot(_ref_standardize(x).T, _ref_standardize(y)) / x.shape[0]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pearson_zero_variance_guard(rng):
    x = rng.randn(20, 4)
    x[:, 2] = 3.0  # constant gene
    got = pearson_correlation(x, x)
    assert np.isfinite(got).all()
    # constant column standardizes to centered = 0 -> zero correlations
    np.testing.assert_allclose(got[2, :], 0.0, atol=1e-12)


def test_gamma_jax_matches_numpy(rng):
    x = rng.randn(40, 25).astype(np.float32)
    y = (x + 0.5 * rng.randn(40, 25)).astype(np.float32)
    np.testing.assert_allclose(gamma_coef(x, y), gamma_coef_np(x, y),
                               rtol=1e-4, atol=1e-5)


def test_gamma_blocking_invariance():
    # own RandomState: the assertion compares two fp-accumulation orders of
    # the same tiny coefficient, so the margin is data-dependent — drawing
    # from the shared session `rng` made the test order-sensitive (it failed
    # only when the preceding tests shifted the stream)
    r = np.random.RandomState(7)
    x = r.randn(30, 37).astype(np.float32)
    y = r.randn(30, 37).astype(np.float32)
    a = gamma_coef(x, y, block=8)
    b = gamma_coef(x, y, block=64)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


def test_gamma_self_is_one(rng):
    x = rng.randn(50, 20).astype(np.float32)
    assert gamma_coef(x, x) == pytest.approx(1.0, abs=1e-4)


def test_gamma_uncorrelated_is_small(rng):
    x = rng.randn(200, 30).astype(np.float32)
    y = rng.randn(200, 30).astype(np.float32)
    assert abs(gamma_coef(x, y)) < 0.35


def test_correlations_list_shape(rng):
    x = rng.randn(10, 6)
    assert correlations_list(x, x).shape == (15,)


def test_tf_tg_graph_and_corrs():
    """load_tf_tg_graph TSV parse + compute_tf_tg_corrs output contract
    (parity: corr_score.py:238-290 — per present TF: TF-vs-TG correlation
    list and condensed TG-TG list; absent TFs/TGs skipped)."""
    import os
    import tempfile

    from gemm_gan_tpu.eval.gamma import (compute_tf_tg_corrs,
                                         load_tf_tg_graph,
                                         pearson_correlation,
                                         upper_diag_list)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "graph.tsv")
        with open(path, "w") as f:
            f.write("g0\tx\tg1\ng0\tx\tg2\nMISSING\tx\tg1\ng3\tx\tNOPE\n")
        tf_tg = load_tf_tg_graph(path)
    assert tf_tg == {"g0": ["g1", "g2"], "MISSING": ["g1"], "g3": ["NOPE"]}

    rng = np.random.RandomState(0)
    expr = rng.randn(50, 4).astype(np.float64)
    genes = ["g0", "g1", "g2", "g3"]
    tf_corr, tg_corr = compute_tf_tg_corrs(expr, genes, tf_tg)
    # g0 contributes 2 TF-TG corrs + 1 condensed TG-TG corr; MISSING (absent
    # TF) and g3 (no present targets) contribute nothing
    expected_tf = pearson_correlation(expr[:, [0]], expr[:, [1, 2]]).ravel()
    expected_tg = upper_diag_list(
        pearson_correlation(expr[:, [1, 2]], expr[:, [1, 2]]))
    np.testing.assert_allclose(tf_corr, expected_tf)
    np.testing.assert_allclose(tg_corr, expected_tg)

    nested_tf, nested_tg = compute_tf_tg_corrs(expr, genes, tf_tg, flat=False)
    assert len(nested_tf) == 1 and len(nested_tf[0]) == 2
    assert len(nested_tg) == 1 and len(nested_tg[0]) == 1


def test_gamma_coef_unequal_sample_counts(rng):
    """Real and generated matrices may have different sample counts
    (reference signature: nb_samples_1 vs nb_samples_2)."""
    from gemm_gan_tpu.eval.gamma import gamma_coef, gamma_coef_np

    x = rng.randn(40, 16).astype(np.float32)
    y = (rng.randn(30, 16) * 0.5 + 0.2 * x[:30]).astype(np.float32)
    np.testing.assert_allclose(gamma_coef(x, y), gamma_coef_np(x, y),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gamma_coef(y, x), gamma_coef_np(y, x),
                               rtol=1e-4, atol=1e-5)
