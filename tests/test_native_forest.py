"""Native histogram random forest (gemm_gan_tpu/native/hist_forest.cpp).

Replaces the reference's LightGBM rf-mode classifier
(/root/reference/src/generative_model_utils.py:75). Parity bar: accuracy on
separable synthetic blobs comparable to sklearn's RandomForest, deterministic
under a fixed seed, sklearn estimator surface.
"""

import numpy as np
import pytest

from gemm_gan_tpu.native.forest import HistForestClassifier, forest_available

pytestmark = pytest.mark.skipif(not forest_available(),
                                reason="native toolchain not available")


def _blobs(seed=0, n=1500, d=40, k=3):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, d).astype(np.float32)
    y = rng.randint(0, k, n)
    for c in range(k):
        X[y == c, c * 3:(c * 3 + 3)] += 2.0
    return X[:1000], y[:1000], X[1000:], y[1000:]


def test_accuracy_parity_with_sklearn():
    Xtr, ytr, Xte, yte = _blobs()
    ours = HistForestClassifier(random_state=7).fit(Xtr, ytr).score(Xte, yte)
    from sklearn.ensemble import RandomForestClassifier

    skl = RandomForestClassifier(random_state=7, n_jobs=-1).fit(Xtr, ytr)
    assert ours >= skl.score(Xte, yte) - 0.03
    assert ours > 0.9


def test_deterministic_and_probabilistic():
    Xtr, ytr, Xte, _ = _blobs(seed=1)
    a = HistForestClassifier(random_state=3).fit(Xtr, ytr).predict_proba(Xte)
    b = HistForestClassifier(random_state=3).fit(Xtr, ytr).predict_proba(Xte)
    np.testing.assert_allclose(a, b)
    np.testing.assert_allclose(a.sum(axis=1), 1.0, atol=1e-4)
    c = HistForestClassifier(random_state=4).fit(Xtr, ytr).predict_proba(Xte)
    assert not np.allclose(a, c)  # seed actually feeds bagging/features


def test_string_labels_and_classes_attr():
    Xtr, ytr, Xte, yte = _blobs(seed=2, k=2)
    names = np.array(["fake", "real"])
    clf = HistForestClassifier(random_state=0, n_estimators=50).fit(
        Xtr, names[ytr])
    assert list(clf.classes_) == ["fake", "real"]
    pred = clf.predict(Xte)
    assert set(pred) <= {"fake", "real"}
    assert np.mean(pred == names[yte]) > 0.9


def test_detection_harness_prefers_native():
    from gemm_gan_tpu.eval.detection import _rf

    assert isinstance(_rf(), HistForestClassifier)


def test_detection_end_to_end_with_native_rf():
    """Same-distribution real/fake → RF detection AUC near chance;
    shifted fake → AUC near 1 (the §4 statistical-acceptance pattern)."""
    from gemm_gan_tpu.eval.detection import detection

    rng = np.random.RandomState(0)
    real = rng.randn(300, 30).astype(np.float32)
    same = rng.randn(300, 30).astype(np.float32)
    far = rng.randn(300, 30).astype(np.float32) + 3.0
    near = detection(real[:200], same[:200], real[200:], same[200:])
    assert near["RF"]["auc"] < 0.7
    split = detection(real[:200], far[:200], real[200:], far[200:])
    assert split["RF"]["auc"] > 0.95
