"""Utility (TSTR) evaluation over dumped test_* artifact directories.

Capability parity with /root/reference/src/utility_evaluation.py:74-175 and
the byte-identical primary-site variant (src/utility_primary_s_evaluation.py):
for every `test_*` run directory, fit MLP and RF classifiers in three regimes
— TRTR, TSTR, TR+TSR — predicting `data_real` against `train_labels_real`,
and report mean±std of accuracy/F1/precision/recall (weighted averages).

The reference's regime naming is misleading (it *fits* on the arrays named
`test_*` and evaluates on `data_real`; SURVEY.md §3.5). The artifact contract
(8 npy files per run dir, same filenames) is preserved exactly so the two
frameworks' dumps are cross-evaluable; the semantics here follow the
reference so the numbers are comparable.

Classifier substitution: LGBMClassifier(boosting_type='rf') is replaced by
the native C++ histogram forest (gemm_gan_tpu/native/hist_forest.cpp, with an
sklearn RandomForest fallback); MLP is the JAX MLPClassifier
(eval/classifiers.py).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict

import numpy as np

from gemm_gan_tpu.eval.classifiers import MLPClassifier
from gemm_gan_tpu.eval.detection import _rf

FILES = ("data_real", "data_gen", "test_real", "test_gen",
         "train_labels_real", "train_labels_gen",
         "test_labels_real", "test_labels_gen")

SETTINGS = ("TRTR", "TSTR", "TR+TSR")
METRICS = ("Accuracy", "F1", "Precision", "Recall")


def load_data(folder: str, label_infix: str = "") -> Dict[str, np.ndarray]:
    """Load the 8-file artifact contract; label_infix='primary_site_' loads
    the primary-site label variants (parity: utility_primary_s_evaluation.py:86-89)."""
    def name(f):
        if label_infix and "labels" in f:
            a, b = f.split("labels_")
            return f"{a}labels_primary_site_{b}" if label_infix == "primary_site_" else f
        return f

    return {f: np.load(os.path.join(folder, name(f) + ".npy")) for f in FILES}


def save_run_artifacts(run_dir: str, arrays: Dict[str, np.ndarray]):
    """Write the 8-file (12 with primary-site) npy contract
    (parity: conditional_gan_concat.py:756-767, conditional_gan_film.py:756-770)."""
    os.makedirs(run_dir, exist_ok=True)
    for k, v in arrays.items():
        np.save(os.path.join(run_dir, f"{k}.npy"), np.asarray(v))


def _compute_metrics(y_true, y_pred) -> Dict[str, float]:
    from sklearn.metrics import (accuracy_score, f1_score, precision_score,
                                 recall_score)

    return {
        "Accuracy": float(accuracy_score(y_true, y_pred)),
        "F1": float(f1_score(y_true, y_pred, average="weighted", zero_division=0)),
        "Precision": float(precision_score(y_true, y_pred, average="weighted",
                                           zero_division=0)),
        "Recall": float(recall_score(y_true, y_pred, average="weighted",
                                     zero_division=0)),
    }


def tstr_transfer_accuracy(fake, fake_y, real_te, real_te_y) -> float:
    """TSTR reduced to its conditioning-sensitive core: fit a linear
    classifier on (generated, condition-label), score on held-out real
    (reference protocol /root/reference/src/utility_evaluation.py:131-175).
    Materially-above-chance accuracy is direct statistical evidence that
    generation is steered by the condition — a condition-blind generator
    scores ~chance no matter how good its marginals are. LR (not the full
    MLP/RF battery) keeps it deterministic and seconds-fast; the full
    battery is `UtilityEvaluator`."""
    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(max_iter=500)
    clf.fit(fake, fake_y)
    return float((clf.predict(real_te) == real_te_y).mean())


def class_mean_alignment(fake, fake_y, real_te, real_te_y, n_perm: int = 8):
    """(aligned, shuffled): mean over classes of ||mean(fake | label=c) -
    mean(real | label=c)||, under the true generation labels vs the mean of
    `n_perm` label-shuffled controls. A generator that ignores its
    condition scores aligned ~= shuffled (ratio ~1); one that steers by
    label scores far lower aligned than shuffled."""
    classes = np.intersect1d(np.unique(fake_y), np.unique(real_te_y))
    mu_real = np.stack([real_te[real_te_y == c].mean(0) for c in classes])

    def dist(y):
        return float(np.mean([
            np.linalg.norm(fake[y == c].mean(0) - mu_real[i])
            for i, c in enumerate(classes)]))

    rng = np.random.RandomState(0)
    shuffled = float(np.mean([dist(rng.permutation(fake_y))
                              for _ in range(n_perm)]))
    return dist(fake_y), shuffled


class UtilityEvaluator:
    label_infix = ""

    def __init__(self, results_path: str, mlp_epochs: int = 50,
                 pattern: str = "test_*"):
        """`pattern` narrows the run dirs (e.g. `test_*_epoch_10` to score
        only the best-checkpoint dumps when a run dir holds both
        `evaluate(which="best")` and final-epoch artifacts)."""
        self.results_dirs = sorted(glob(os.path.join(results_path, pattern)))
        self._make_classifiers = lambda: {
            "MLP": MLPClassifier(hidden=(100,), epochs=mlp_epochs, seed=42),
            "RandomForest": _rf(),  # shared with eval.detection (one fallback gate)
        }
        self.scores = {
            s: {c: {m: [] for m in METRICS} for c in ("MLP", "RandomForest")}
            for s in SETTINGS
        }

    def evaluate(self):
        for folder in self.results_dirs:
            data = load_data(folder, self.label_infix)
            for clf_name, clf in self._make_classifiers().items():
                regimes = {
                    "TRTR": (data["test_real"], data["test_labels_real"]),
                    "TSTR": (data["test_gen"], data["test_labels_gen"]),
                    "TR+TSR": (
                        np.concatenate([data["test_real"], data["test_gen"]]),
                        np.concatenate([data["test_labels_real"],
                                        data["test_labels_gen"]]),
                    ),
                }
                for setting, (X, y) in regimes.items():
                    clf.fit(X, y)
                    preds = clf.predict(data["data_real"])
                    for m, val in _compute_metrics(
                            data["train_labels_real"], preds).items():
                        self.scores[setting][clf_name][m].append(val)
        return self.scores

    def report(self) -> Dict:
        out = {}
        for setting in self.scores:
            out[setting] = {}
            for clf_name in self.scores[setting]:
                out[setting][clf_name] = {}
                for m in METRICS:
                    vals = self.scores[setting][clf_name][m]
                    if vals:
                        out[setting][clf_name][m] = (float(np.mean(vals)),
                                                     float(np.std(vals)))
        return out


class UtilityEvaluatorPrimary(UtilityEvaluator):
    """Primary-site labels variant (parity: utility_primary_s_evaluation.py:102)."""

    label_infix = "primary_site_"



