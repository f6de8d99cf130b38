"""Executed-reference parity: run the ACTUAL reference code against ours.

Round 1 validated parity against *transcriptions* of the reference formulas.
These tests close the loop (VERDICT.md "Next round" #3) by importing
`/root/reference/src` and asserting equality on shared fixtures wherever the
reference modules import with the in-image dependencies:

- `corr_score` (numpy+scipy only): gamma_coef / gamma_coeff_score /
  upper_diag_list / pearson_correlation / correlations_list /
  gamma_coefficients (/root/reference/src/corr_score.py:20-236)
- `data_loader.split_data` / `standardize` / `min_max`
  (/root/reference/src/data_loader.py:11-80)
- `vae.losses.reconstruction_loss` / `kl_divergence`
  (/root/reference/src/vae/losses.py:5-19)
- `classifiers.mlp.TorchMLPClassifier` (behavioral, torch is in-image)
  (/root/reference/src/classifiers/mlp.py:8-99)
- `heatmap_corr_eval.CorrelationEvaluator` (/root/reference/src/heatmap_corr_eval.py:7-55)

Reference modules that CANNOT import in this image (documented, not faked):

- `distribution_distances`, `unsupervised_metrics`: need POT (`ot`) — our
  W1/W2 path is instead validated against scipy linprog/assignment
  (tests/test_distances.py).
- `generative_model_utils`: needs `lightgbm` — detection harness validated
  against sklearn + our C++ histogram forest (tests/test_native_forest.py).
- `utility_evaluation` / `utility_primary_s_evaluation`: need `catboost`.
- `privacy_evaluator`: needs the repo's own MISSING `rnaseq_contrastive_model`
  module (unshippable even upstream, SURVEY.md §0).
- `visualization`: needs `umap`.
"""

from __future__ import annotations

import importlib
import sys

import numpy as np
import pytest

REF_SRC = "/root/reference/src"

UNIMPORTABLE = {
    "distribution_distances": "ot",
    "unsupervised_metrics": "ot",
    "generative_model_utils": "lightgbm",
    "utility_evaluation": "catboost",
    "privacy_evaluator": "rnaseq_contrastive_model",
    "visualization": "umap",
}


@pytest.fixture(scope="module")
def ref():
    """Namespace of importable reference modules, path-isolated."""
    sys.path.insert(0, REF_SRC)
    try:
        mods = {
            "corr_score": importlib.import_module("corr_score"),
            "data_loader": importlib.import_module("data_loader"),
            "vae_losses": importlib.import_module("vae.losses"),
            "mlp": importlib.import_module("classifiers.mlp"),
            "heatmap": importlib.import_module("heatmap_corr_eval"),
        }
    finally:
        sys.path.remove(REF_SRC)
    return mods


@pytest.fixture(scope="module")
def expr_pair(rng):
    """Two small expression matrices incl. a zero-variance gene (NaN guard)."""
    x = rng.randn(40, 25).astype(np.float64)
    y = rng.randn(32, 25).astype(np.float64) * 1.3 + 0.2
    x[:, 7] = 3.0  # constant gene: exercises the reference's NaN fallback
    y[:, 7] = -1.0
    return x, y


# ------------------------------------------------------------- corr_score.py
def test_upper_diag_list_matches_reference(ref, rng):
    from gemm_gan_tpu.eval import gamma

    m = rng.randn(9, 9)
    np.testing.assert_allclose(gamma.upper_diag_list(m),
                               ref["corr_score"].upper_diag_list(m.copy()))


def test_pearson_correlation_matches_reference(ref, expr_pair):
    from gemm_gan_tpu.eval import gamma

    x, y = expr_pair
    np.testing.assert_allclose(gamma.pearson_correlation(x, x[:, :12]),
                               ref["corr_score"].pearson_correlation(x, x[:, :12]),
                               rtol=1e-12)


def test_correlations_list_matches_reference(ref, expr_pair):
    from gemm_gan_tpu.eval import gamma

    x, _ = expr_pair
    np.testing.assert_allclose(gamma.correlations_list(x, x),
                               ref["corr_score"].correlations_list(x, x),
                               rtol=1e-12)


def test_gamma_coef_matches_reference(ref, expr_pair):
    """f64 numpy golden vs the EXECUTED reference gamma_coef: exact-tier."""
    from gemm_gan_tpu.eval import gamma

    x, y = expr_pair
    want = float(ref["corr_score"].gamma_coef(x, y))
    assert abs(gamma.gamma_coef_np(x, y) - want) < 1e-12


def test_gamma_coeff_score_matches_reference(ref, expr_pair):
    from gemm_gan_tpu.eval import gamma

    x, y = expr_pair
    want = float(ref["corr_score"].gamma_coeff_score(x, y))
    assert abs(gamma.gamma_coef_np(x, y) - want) < 1e-12


def test_gamma_device_path_matches_f64_golden(expr_pair):
    """Blocked f32 device path vs the f64 golden, load-robust bound.

    VERDICT r4 weak #1: a single 2e-5 bar on device-vs-executed-reference
    sat inside the run-to-run noise of XLA:CPU's threaded f32 reductions —
    it failed at 3.31e-5 under batch load and passed in isolation. The
    reference-parity claim now lives entirely in the f64 assertions above;
    this test only bounds f32 pipeline error (standardized dots, blocked
    streaming moments, then the cancellation-prone var = E[x²]−E[x]²).
    3e-4 is ~10× the worst observed in-batch deviation on this fixture and
    still ~100× below any materially different gamma.
    """
    from gemm_gan_tpu.eval import gamma

    x, y = expr_pair
    want = gamma.gamma_coef_np(x, y)
    assert abs(gamma.gamma_coef(x, y, block=8) - want) < 3e-4
    assert abs(gamma.gamma_coeff_score(x, y) - want) < 3e-4


def test_gamma_coefficients_matches_reference(ref, rng):
    """gamma_coefficients: (D^X,D^Z) and the cophenetic (T^X,T^Z) term.

    The reference computes dendrogrammatic distances with a hand-rolled
    Cluster walk (corr_score.py:183-236); ours uses scipy `cophenet` on the
    same complete-linkage matrix — same quantity, executed-reference check.
    Our 4-tuple's [0]/[3] correspond to the reference 2-tuple.
    """
    from gemm_gan_tpu.eval import gamma

    x = rng.randn(30, 12)
    z = rng.randn(26, 12) * 0.8 + 0.1
    ref_dd, ref_tt = ref["corr_score"].gamma_coefficients(x, z)
    got = gamma.gamma_coefficients(x, z)
    assert abs(got[0] - float(ref_dd)) < 1e-10
    assert abs(got[3] - float(ref_tt)) < 1e-10


def test_dendrogram_distance_equals_scipy_cophenet(ref, rng):
    from scipy.cluster.hierarchy import cophenet

    from gemm_gan_tpu.eval import gamma

    x = rng.randn(24, 10)
    lm = gamma.hierarchical_clustering(x)
    ref_lm = ref["corr_score"].hierarchical_clustering(x)
    np.testing.assert_allclose(lm, ref_lm, rtol=1e-12)
    dists = 1 - gamma.correlations_list(x, x)
    _, coph = cophenet(lm, dists)
    np.testing.assert_allclose(
        coph, ref["corr_score"].dendrogram_distance(ref_lm, condensed=True),
        rtol=1e-12)


# ------------------------------------------------------------ data_loader.py
def test_split_indices_exactly_match_reference_split_data(ref):
    from gemm_gan_tpu.data.splits import split_indices

    for n in (10, 100, 997, 2000):
        for seed in (42, 7):
            want = ref["data_loader"].split_data(n, seed=seed)
            got = split_indices(n, seed=seed)
            for g, w in zip(got, want):
                np.testing.assert_array_equal(g, w)


def test_standardize_matches_reference_plus_fillna(ref, rng):
    """Our train-stats z-score == reference standardize |> fillna(0) on the
    train split (data_loader.py:64-70,146-148). Zero-variance genes are 0
    in both (train rows equal the mean there -> 0/0 -> NaN -> fillna)."""
    import pandas as pd

    from gemm_gan_tpu.data.splits import standardize

    tr = rng.randn(50, 8)
    tr[:, 3] = 2.5  # zero variance
    other = rng.randn(20, 8)

    (got_tr, got_other), (mean, std) = standardize(tr, other)
    ref_std = ref["data_loader"].standardize
    want_tr = pd.DataFrame(ref_std(tr)).fillna(0).to_numpy()
    np.testing.assert_allclose(got_tr, want_tr, rtol=1e-5, atol=1e-6)
    # non-degenerate columns of held-out data use TRAIN stats in both
    m, s = np.mean(tr, axis=0), np.std(tr, axis=0)
    want_other = ref_std(other, mean=m, std=s)
    keep = s > 0
    np.testing.assert_allclose(got_other[:, keep], want_other[:, keep],
                               rtol=1e-5, atol=1e-6)
    # DOCUMENTED DIVERGENCE: on zero-variance train genes the reference
    # yields ±inf for held-out values != mean (fillna(0) only fixes NaN);
    # we map them to 0 — the intended behavior, not the artifact.
    assert np.all(np.isfinite(got_other))
    assert np.all(~np.isfinite(want_other[:, ~keep])
                  | (other[:, ~keep] == m[~keep]))


def test_minmax_matches_reference_min_max(ref, rng):
    from gemm_gan_tpu.data.splits import minmax

    tr = rng.rand(40, 6) * 4 - 1
    (got_tr, ), _ = minmax(tr)
    # reference min_max has a live bug when min is None (assigns std instead,
    # data_loader.py:78) — the loaders always pass explicit stats (:151-155)
    want = ref["data_loader"].min_max(tr, max=np.max(tr, axis=0),
                                      min=np.min(tr, axis=0))
    np.testing.assert_allclose(got_tr, want, rtol=1e-6)


# ------------------------------------------------------------- vae/losses.py
def test_kl_divergence_matches_reference(ref, rng):
    import torch

    from gemm_gan_tpu.models.vae import kl_divergence

    mu = rng.randn(16, 8).astype(np.float32)
    logvar = rng.randn(16, 8).astype(np.float32) * 0.5
    want = float(ref["vae_losses"].kl_divergence(torch.tensor(mu),
                                                 torch.tensor(logvar)))
    got = float(kl_divergence(mu, logvar))
    assert abs(got - want) < 1e-5


def test_reconstruction_mse_matches_reference(ref, rng):
    import torch

    from gemm_gan_tpu.models.vae import recon_loss

    x = rng.randn(12, 20).astype(np.float32)
    xp = rng.randn(12, 20).astype(np.float32)
    want = float(ref["vae_losses"].reconstruction_loss(
        torch.tensor(x), torch.tensor(xp), logscale=None, MSE=True))
    assert abs(float(recon_loss(x, xp, "mse")) - want) < 1e-6


def test_gaussian_nll_identity_vs_reference_logprob(ref, rng):
    """The reference's MSE=False branch returns the SUMMED log-likelihood
    (vae/losses.py:11-13); ours is the mean NLL without the 2π constant.
    Exact identity: ref_sum = -(numel * (ours + 0.5*log(2π))), with
    logvar = 2*logscale (reference parameterizes sigma, we parameterize
    variance)."""
    import torch

    from gemm_gan_tpu.models.vae import recon_loss

    x = rng.randn(10, 6).astype(np.float64)
    mean = rng.randn(10, 6).astype(np.float64)
    logscale = (rng.randn(6) * 0.3).astype(np.float64)
    want = float(ref["vae_losses"].reconstruction_loss(
        torch.tensor(x), torch.tensor(mean),
        torch.tensor(logscale), MSE=False))
    logvar = np.broadcast_to(2.0 * logscale, x.shape)
    ours = float(recon_loss(x, (mean, logvar), "gaussian_nll"))
    derived = -(x.size * (ours + 0.5 * np.log(2 * np.pi)))
    assert abs(derived - want) < 1e-4 * max(1.0, abs(want))


# --------------------------------------------------------- classifiers/mlp.py
def test_mlp_classifier_behavioral_parity(ref, rng):
    """Train the reference TorchMLPClassifier (CPU) and our JAX MLPClassifier
    on the same separable blobs; both must generalize and agree in accuracy."""
    from sklearn.metrics import accuracy_score

    from gemm_gan_tpu.eval.classifiers import MLPClassifier

    n, d = 240, 12
    y = rng.randint(0, 2, size=n)
    x = rng.randn(n, d).astype(np.float32) + 1.6 * (2 * y[:, None] - 1)
    xtr, ytr, xte, yte = x[:180], y[:180], x[180:], y[180:]

    theirs = ref["mlp"].TorchMLPClassifier(
        hidden_dims=[32], num_epochs=25, batch_size=32, device="cpu",
        num_workers=0, verbose=False)
    theirs.fit(xtr, ytr)
    acc_ref = accuracy_score(yte, theirs.predict(xte))

    ours = MLPClassifier(hidden=(32,), epochs=25, batch_size=32)
    ours.fit(xtr, ytr)
    acc_ours = accuracy_score(yte, ours.predict(xte))

    assert acc_ref >= 0.9, f"reference classifier failed its own task: {acc_ref}"
    assert acc_ours >= 0.9, f"our classifier underperforms: {acc_ours}"
    assert abs(acc_ref - acc_ours) <= 0.08


# -------------------------------------------------------- heatmap_corr_eval.py
def test_correlation_mse_matches_reference(ref, rng, tmp_path):
    from gemm_gan_tpu.eval.heatmap import CorrelationEvaluator

    real = rng.randn(64, 15).astype(np.float64)
    gen = (real @ rng.randn(15, 15) * 0.2 + rng.randn(64, 15))
    rp, gp = tmp_path / "r.npy", tmp_path / "g.npy"
    np.save(rp, real)
    np.save(gp, gen)
    theirs = ref["heatmap"].CorrelationEvaluator(str(rp), str(gp),
                                                 base_path=str(tmp_path))
    res = theirs.evaluate()
    ours = CorrelationEvaluator(real, gen)
    assert abs(ours.mse() - res["mse"]) < 1e-5
    np.testing.assert_allclose(ours.corr_real,
                               res["real_correlation_matrix"], atol=1e-5)


# ----------------------------------------------------- documented unimportable
@pytest.mark.parametrize("module,missing", sorted(UNIMPORTABLE.items()))
def test_documented_reference_import_failures(module, missing):
    """These reference modules cannot execute in this image; assert the
    failure is exactly the documented missing dependency so the docstring
    stays honest if the image ever changes."""
    sys.path.insert(0, REF_SRC)
    try:
        for cached in [m for m in sys.modules if m == module]:
            del sys.modules[cached]
        with pytest.raises(ModuleNotFoundError, match=missing):
            importlib.import_module(module)
    finally:
        sys.path.remove(REF_SRC)
