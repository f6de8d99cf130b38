"""Real-vs-fake detection harness and the evaluation-metric orchestrator.

Capability parity with:
  * `detection` + `Classifiers` (/root/reference/src/generative_model_utils.py:72-76,220-236):
    train LR / MLP / RF on shuffled real+fake train data, report
    accuracy/F1/AUC on the test pair — ideal score ≈ chance;
  * `compute_evaluation_metrics` (/root/reference/src/unsupervised_metrics.py:15-110):
    kNN/logistic/RF two-sample tests + PRDC, in raw space and PCA-100 space;
  * `tissues_classification` TSTR helper (:104-120).

Classifier substitutions (documented divergences): the reference's RF is
LightGBM in rf-boosting mode — LightGBM is not available here, so RF is
sklearn's RandomForestClassifier; LR and MLP are the on-device JAX
classifiers (eval/classifiers.py). Two-sample logistic uses sklearn
LogisticRegression for report parity when available.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from gemm_gan_tpu.eval.classifiers import KNNClassifier, MLPClassifier
from gemm_gan_tpu.eval.prdc import compute_prdc

SEED = 42


def _rf():
    """Native C++ histogram forest (SURVEY §2.6's LightGBM-RF replacement);
    sklearn RandomForest fallback when the toolchain is absent."""
    from gemm_gan_tpu.native.forest import HistForestClassifier, forest_available

    if forest_available():
        return HistForestClassifier(random_state=SEED, n_jobs=-1)
    from sklearn.ensemble import RandomForestClassifier

    return RandomForestClassifier(random_state=SEED, n_jobs=-1)


def _logistic():
    from sklearn.linear_model import LogisticRegression

    return LogisticRegression(random_state=SEED, n_jobs=-1, max_iter=10000,
                              penalty="l2")


def _two_sample(clf, X_real, X_fake, X_real_test, X_fake_test):
    """[macro-F1, accuracy] of a real-vs-fake two-sample classifier (parity:
    distribution_distances.py:172-268)."""
    from sklearn.metrics import accuracy_score, f1_score

    X = np.concatenate([X_real, X_fake], axis=0)
    y = np.concatenate([np.ones(len(X_real)), np.zeros(len(X_fake))])
    X_test = np.concatenate([X_real_test, X_fake_test], axis=0)
    y_test = np.concatenate([np.ones(len(X_real_test)), np.zeros(len(X_fake_test))])
    clf.fit(X, y)
    y_pred = clf.predict(X_test)
    return [float(f1_score(y_test, y_pred, average="macro")),
            float(accuracy_score(y_test, y_pred))]


def compute_knn_real_fake(X_real, X_fake, X_real_test, X_fake_test, n_neighbors=5):
    return _two_sample(KNNClassifier(n_neighbors), X_real, X_fake,
                       X_real_test, X_fake_test)


def compute_logistic_real_fake(X_real, X_fake, X_real_test, X_fake_test, **_):
    return _two_sample(_logistic(), X_real, X_fake, X_real_test, X_fake_test)


def compute_random_forest_real_fake(X_real, X_fake, X_real_test, X_fake_test, **_):
    return _two_sample(_rf(), X_real, X_fake, X_real_test, X_fake_test)


def compute_evaluation_metrics(data_real, data_gen, data_test, data_fake_test,
                               nn: int = 10, original_space: bool = True,
                               pca: bool = True, n_components: int = 100) -> Dict:
    """Two-sample tests + PRDC in raw and PCA space (parity:
    unsupervised_metrics.py:15-110)."""
    metrics: Dict = {}
    metrics["KNN results"] = compute_knn_real_fake(
        data_real, data_gen, data_test, data_fake_test, n_neighbors=nn)
    metrics["Logistic results"] = compute_logistic_real_fake(
        data_real, data_gen, data_test, data_fake_test)
    metrics["Random Forest"] = compute_random_forest_real_fake(
        data_real, data_gen, data_test, data_fake_test)

    for name, (a, b) in (("", (data_real, data_gen)),
                         ("_test", (data_test, data_fake_test))):
        prdc = compute_prdc(a, b, nearest_k=nn)
        for k, v in prdc.items():
            metrics[k + name] = v

    if pca:
        from sklearn.decomposition import PCA

        n_components = min(n_components, data_real.shape[0], data_real.shape[1])
        p = PCA(n_components=n_components)
        pr = p.fit_transform(data_real)
        pg = p.transform(data_gen)
        pt = p.transform(data_test)
        pf = p.transform(data_fake_test)
        metrics["KNN PCA results"] = compute_knn_real_fake(pr, pg, pt, pf, n_neighbors=nn)
        metrics["Logistic PCA results"] = compute_logistic_real_fake(pr, pg, pt, pf)
        metrics["Random Forest results"] = compute_random_forest_real_fake(pr, pg, pt, pf)
        for name, (a, b) in (("_PCA", (pr, pg)), ("_PCA_test", (pt, pf))):
            prdc = compute_prdc(a, b, nearest_k=nn)
            for k, v in prdc.items():
                metrics[k + name] = v
    return metrics


# ------------------------------------------------------------------ harness
def _classifier_suite():
    """{LR: 0-hidden MLP, MLP: 100-hidden MLP, RF} (parity:
    generative_model_utils.py:72-76)."""
    return {
        "LR": lambda: MLPClassifier(hidden=(), epochs=200, lr=1e-2,
                                    weight_decay=1e-4),
        "MLP": lambda: MLPClassifier(hidden=(100,), epochs=60, lr=2e-3),
        "RF": _rf,
    }


def _single_class_eval(y_pred, y_test, y_scores, detection_mode: bool):
    """Metric report per classifier (parity:
    generative_model_utils.py:124-206)."""
    from sklearn.metrics import (accuracy_score, balanced_accuracy_score,
                                 f1_score, precision_score, recall_score,
                                 roc_auc_score)

    out = {}
    if detection_mode:
        out["auc"] = round(float(roc_auc_score(y_test, y_scores)), 5)
        avg = "binary"
    else:
        avg = "macro"
    out["balanced_accuracy"] = round(float(balanced_accuracy_score(y_test, y_pred)), 5)
    out["accuracy"] = round(float(accuracy_score(y_test, y_pred)), 5)
    out["precision"] = round(float(precision_score(y_test, y_pred, average=avg,
                                                   zero_division=0)), 5)
    out["recall"] = round(float(recall_score(y_test, y_pred, average=avg,
                                             zero_division=0)), 5)
    out["f1_macro"] = round(float(f1_score(y_test, y_pred, average=avg if detection_mode else "macro",
                                           zero_division=0)), 5)
    out["f1_weighted"] = round(float(f1_score(y_test, y_pred,
                                              average=avg if detection_mode else "weighted",
                                              zero_division=0)), 5)
    return out


def classifiers_harness(train_X, train_y, test_X, test_y, detection_mode: bool) -> Dict:
    """Fit the LR/MLP/RF suite; per-model metric dict.

    The feature matrices go to the device ONCE and are shared by the JAX
    classifiers (LR and MLP are both `MLPClassifier`s — their scanned fit
    takes device-resident X as a no-op); the native RF keeps the host
    arrays. At the canonical detection shape this halves the host->device
    traffic of a detection call (2 x 618 MB -> 1 x) — material over a
    ~30 MB/s tunneled backend."""
    import jax.numpy as jnp

    train_Xd = jnp.asarray(np.asarray(train_X, np.float32))
    test_Xd = jnp.asarray(np.asarray(test_X, np.float32))
    results = {}
    for name, make in _classifier_suite().items():
        clf = make()
        on_device = isinstance(clf, MLPClassifier)
        clf.fit(train_Xd if on_device else train_X, train_y)
        y_pred = clf.predict(test_Xd if on_device else test_X)
        if hasattr(clf, "predict_proba"):
            proba = clf.predict_proba(test_Xd if on_device else test_X)
            y_scores = proba[:, 1] if proba.shape[1] == 2 else proba.max(axis=1)
        else:
            y_scores = (y_pred == 1).astype(float)
        results[name] = _single_class_eval(y_pred, test_y, y_scores, detection_mode)
    return results


def detection(data_real, data_gen, data_real_test, data_fake_test) -> Dict:
    """Real-vs-fake detection (parity: generative_model_utils.py:220-236).
    Label convention matches the reference: real=0, fake=1."""
    from sklearn.utils import shuffle

    train_X = shuffle(np.vstack([data_real, data_gen]), random_state=SEED)
    train_y = shuffle(np.array([0] * len(data_real) + [1] * len(data_gen)),
                      random_state=SEED)
    test_X = shuffle(np.vstack([data_real_test, data_fake_test]), random_state=SEED)
    test_y = shuffle(np.array([0] * len(data_real_test) + [1] * len(data_fake_test)),
                     random_state=SEED)
    full = classifiers_harness(train_X, train_y, test_X, test_y, detection_mode=True)
    return {name: {"accuracy": r["accuracy"], "f1": r["f1_macro"], "auc": r["auc"]}
            for name, r in full.items()}


def knn_detection(data_real, data_gen, data_real_test, data_fake_test,
                  n_neighbors: int = 5) -> Dict:
    """Device-distance kNN real-vs-fake two-sample test — the in-loop proxy
    for the host classifier suite (`detection`). Inputs may be device (jax)
    arrays; only the [N_test, k] neighbour indices leave the device, so a
    validation pass transfers kilobytes instead of the full profile
    matrices. Same real=0/fake=1 label convention; no shuffle needed (kNN
    has no fit-order dependence)."""
    import jax.numpy as jnp

    from gemm_gan_tpu.eval.classifiers import KNNClassifier

    train_X = jnp.concatenate([jnp.asarray(data_real, jnp.float32),
                               jnp.asarray(data_gen, jnp.float32)])
    train_y = np.array([0] * len(data_real) + [1] * len(data_gen))
    test_X = jnp.concatenate([jnp.asarray(data_real_test, jnp.float32),
                              jnp.asarray(data_fake_test, jnp.float32)])
    test_y = np.array([0] * len(data_real_test) + [1] * len(data_fake_test))
    pred = KNNClassifier(n_neighbors).fit(train_X, train_y).predict(test_X)
    tp = float(np.sum((pred == 1) & (test_y == 1)))
    fp = float(np.sum((pred == 1) & (test_y == 0)))
    fn = float(np.sum((pred == 0) & (test_y == 1)))
    f1 = 2 * tp / (2 * tp + fp + fn) if (2 * tp + fp + fn) else 0.0
    return {"KNN": {"accuracy": round(float(np.mean(pred == test_y)), 5),
                    "f1": round(f1, 5)}}


def tissues_classification(data_real, tissue_label_real, data_gen, tissue_label) -> Dict:
    """TSTR-style tissue classification (parity:
    generative_model_utils.py:104-120)."""
    full = classifiers_harness(data_real, tissue_label_real, data_gen,
                               tissue_label, detection_mode=False)
    return {name: {"balanced accuracy": r["balanced_accuracy"],
                   "accuracy": r["accuracy"],
                   "f1_weighted": r["f1_weighted"],
                   "f1": r["f1_macro"]}
            for name, r in full.items()}
