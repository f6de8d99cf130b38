"""Detection harness, metric orchestrator, utility evaluator, heatmap."""

import numpy as np
import pytest

from gemm_gan_tpu.eval.detection import (
    compute_evaluation_metrics,
    detection,
    tissues_classification,
)
from gemm_gan_tpu.eval.utility import (
    UtilityEvaluator,
    UtilityEvaluatorPrimary,
    save_run_artifacts,
)


def test_detection_separable_vs_identical(rng):
    real = rng.randn(80, 10).astype(np.float32)
    fake_far = real + 10.0
    res = detection(real, fake_far, rng.randn(40, 10).astype(np.float32),
                    rng.randn(40, 10).astype(np.float32) + 10.0)
    assert res["LR"]["accuracy"] > 0.9  # trivially separable
    real2 = rng.randn(80, 10).astype(np.float32)
    res2 = detection(real, real2, rng.randn(40, 10).astype(np.float32),
                     rng.randn(40, 10).astype(np.float32))
    assert abs(res2["LR"]["accuracy"] - 0.5) < 0.25  # near chance
    for clf in ("LR", "MLP", "RF"):
        assert set(res[clf]) == {"accuracy", "f1", "auc"}


def test_compute_evaluation_metrics_keys(rng):
    real = rng.randn(60, 12).astype(np.float32)
    gen = (real + 0.5 * rng.randn(60, 12)).astype(np.float32)
    out = compute_evaluation_metrics(real, gen, real[:30], gen[:30],
                                     nn=5, n_components=8)
    for k in ("KNN results", "Logistic results", "Random Forest",
              "precision", "recall", "density", "coverage",
              "precision_test", "precision_PCA", "KNN PCA results"):
        assert k in out, k


def test_tissues_classification(rng):
    X = rng.randn(90, 8).astype(np.float32)
    y = rng.randint(0, 3, 90)
    X[y == 1] += 4.0
    X[y == 2] -= 4.0
    res = tissues_classification(X, y, X + 0.01, y)
    assert res["RF"]["accuracy"] > 0.8


def test_utility_evaluator_roundtrip(tmp_path):
    # dedicated RNG: the shared session fixture makes draws order-dependent
    rng = np.random.RandomState(7)
    n_genes = 6
    for run in range(2):
        y = rng.randint(0, 2, 40)
        X = rng.randn(40, n_genes).astype(np.float32) + 4.0 * y[:, None]
        arrays = {
            "data_real": X, "data_gen": X + 0.1,
            "test_real": X, "test_gen": X + 0.1,
            "train_labels_real": y, "train_labels_gen": y,
            "test_labels_real": y, "test_labels_gen": y,
            "train_labels_primary_site_real": y, "train_labels_primary_site_gen": y,
            "test_labels_primary_site_real": y, "test_labels_primary_site_gen": y,
        }
        save_run_artifacts(str(tmp_path / f"test_{run}_epoch_5"), arrays)

    ev = UtilityEvaluator(str(tmp_path), mlp_epochs=10)
    ev.evaluate()
    rep = ev.report()
    assert set(rep) == {"TRTR", "TSTR", "TR+TSR"}
    mean, std = rep["TRTR"]["RandomForest"]["Accuracy"]
    assert mean > 0.8  # labels trivially predictable from shifted gaussians

    evp = UtilityEvaluatorPrimary(str(tmp_path), mlp_epochs=30)
    evp.evaluate()
    rep = evp.report()
    assert rep["TSTR"]["MLP"]["F1"][0] > 0.5

    # pattern filter: score only one epoch's dump dirs (a run dir can hold
    # both evaluate(which="best") and final-epoch artifacts)
    ev5 = UtilityEvaluator(str(tmp_path), pattern="test_*_epoch_5")
    assert len(ev5.results_dirs) == 2
    ev_none = UtilityEvaluator(str(tmp_path), pattern="test_*_epoch_9")
    assert ev_none.results_dirs == []


def test_mlp_classifier_device_input_matches_host(rng):
    """`classifiers_harness` uploads the feature matrices once and hands the
    JAX classifiers device-resident X; fit/predict on a device array must
    reproduce the host-numpy path exactly (same scanned program, same
    seeds)."""
    import jax.numpy as jnp

    from gemm_gan_tpu.eval.classifiers import MLPClassifier

    X = rng.randn(64, 12).astype(np.float32)
    y = (X[:, 0] > 0).astype(np.int64)
    a = MLPClassifier(hidden=(16,), epochs=5, seed=3).fit(X, y)
    b = MLPClassifier(hidden=(16,), epochs=5, seed=3).fit(jnp.asarray(X), y)
    np.testing.assert_array_equal(a.predict(X), b.predict(jnp.asarray(X)))
    np.testing.assert_allclose(a.predict_proba(X), b.predict_proba(X),
                               rtol=1e-6, atol=1e-7)


def test_heatmap_evaluator(rng, tmp_path):
    from gemm_gan_tpu.eval.heatmap import CorrelationEvaluator

    real = rng.randn(50, 8).astype(np.float32)
    ev_same = CorrelationEvaluator(real, real.copy())
    assert ev_same.mse() == pytest.approx(0.0, abs=1e-10)
    gen = rng.randn(50, 8).astype(np.float32)
    ev_diff = CorrelationEvaluator(real, gen)
    assert ev_diff.mse() > ev_same.mse()
    path = ev_diff.plot_diff(str(tmp_path / "h.png"))
    import os

    assert os.path.exists(path)


def test_knn_detection_matches_sklearn():
    """Device-distance kNN detection proxy vs sklearn KNeighborsClassifier
    on the same fixture: identical predictions -> identical accuracy/f1."""
    from sklearn.metrics import f1_score
    from sklearn.neighbors import KNeighborsClassifier

    from gemm_gan_tpu.eval.detection import knn_detection

    rng = np.random.RandomState(0)
    real_tr = rng.randn(40, 12).astype(np.float32)
    fake_tr = (rng.randn(40, 12) + 1.5).astype(np.float32)
    real_te = rng.randn(24, 12).astype(np.float32)
    fake_te = (rng.randn(24, 12) + 1.5).astype(np.float32)

    out = knn_detection(real_tr, fake_tr, real_te, fake_te, n_neighbors=5)

    X = np.vstack([real_tr, fake_tr])
    y = np.array([0] * 40 + [1] * 40)
    Xte = np.vstack([real_te, fake_te])
    yte = np.array([0] * 24 + [1] * 24)
    sk = KNeighborsClassifier(n_neighbors=5).fit(X, y)
    pred = sk.predict(Xte)
    assert out["KNN"]["accuracy"] == pytest.approx(float((pred == yte).mean()),
                                                   abs=1e-6)
    assert out["KNN"]["f1"] == pytest.approx(
        float(f1_score(yte, pred)), abs=1e-6)


def test_mlp_classifier_inference_is_batch_independent():
    """Reference parity: TorchMLPClassifier predicts under model.eval(), so
    BatchNorm uses RUNNING statistics — predictions for a row must not
    depend on batch composition, and single-row prediction must work."""
    import numpy as np

    from gemm_gan_tpu.eval.classifiers import MLPClassifier

    rng = np.random.RandomState(0)
    X = np.concatenate([rng.randn(60, 8) + 2, rng.randn(60, 8) - 2]).astype(np.float32)
    y = np.array([0] * 60 + [1] * 60)
    clf = MLPClassifier(hidden=(16,), epochs=20, batch_size=32).fit(X, y)
    full = clf.predict_proba(X[:10])
    one_by_one = np.concatenate([clf.predict_proba(X[i:i + 1])
                                 for i in range(10)])
    np.testing.assert_allclose(full, one_by_one, rtol=1e-5, atol=1e-6)
    # distinct single samples get distinct (input-dependent) outputs
    assert not np.allclose(clf.predict_proba(X[:1]), clf.predict_proba(X[70:71]))
    # and the separable problem is actually learned
    assert clf.score(X, y) > 0.9
