"""Privacy metrics: DCR, NNDR, cross-modal retrieval accuracy.

Formula parity with /root/reference/src/privacy_evaluator.py:9-114:
  * DCR — share of synthetic samples strictly closer (L2) to the nearest
    train-real sample than to the nearest test-real sample;
  * NNDR — share of synthetic samples whose 1st/2nd-NN distance ratio against
    train-real is below the same ratio against test-real;
  * retrieval accuracy — top-1 cross-modal retrieval of patch/text
    embeddings for generated profiles, scored by label agreement. The
    reference imports this from a missing module (`rnaseq_contrastive_model`,
    SURVEY.md §0); here it is provided natively via cosine-similarity
    retrieval against the contrastive projection space
    (gemm_gan_tpu/encoders/contrastive.py).

The torch implementations batch on CUDA; here the distance kernels are the
same blocked jnp primitives used by the other evaluators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gemm_gan_tpu.eval.knn_pr import _pairwise_l2sq


def _min_dists(gen, ref):
    d = _pairwise_l2sq(jnp.asarray(gen, jnp.float32), jnp.asarray(ref, jnp.float32))
    return jnp.sqrt(jnp.min(d, axis=1))


def dcr(real_data, gen_data, test_data) -> float:
    d_real = _min_dists(gen_data, real_data)
    d_test = _min_dists(gen_data, test_data)
    return float(jnp.mean(d_real < d_test))


def _nndr_ratio(gen, ref):
    d = jnp.sqrt(_pairwise_l2sq(jnp.asarray(gen, jnp.float32),
                                jnp.asarray(ref, jnp.float32)))
    two = -jax.lax.top_k(-d, 2)[0]  # two smallest
    return two[:, 0] / two[:, 1]


def nndr(real_data, gen_data, test_data) -> float:
    r_real = _nndr_ratio(gen_data, real_data)
    r_test = _nndr_ratio(gen_data, test_data)
    return float(jnp.mean(r_real < r_test))


def retrieve_cross_modal(query_emb, gallery_emb, top_k: int = 1):
    """Cosine-similarity retrieval: indices + scores of top_k gallery items."""
    q = jnp.asarray(query_emb, jnp.float32)
    g = jnp.asarray(gallery_emb, jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    g = g / jnp.maximum(jnp.linalg.norm(g, axis=1, keepdims=True), 1e-12)
    sims = jnp.dot(q, g.T, preferred_element_type=jnp.float32)
    scores, idx = jax.lax.top_k(sims, top_k)
    return np.asarray(idx), np.asarray(scores)


def retrieval_accuracy(gen_embeddings, gen_labels, real_labels,
                       real_patch_embeddings, real_text_embeddings):
    """Label agreement of top-1 cross-modal retrieval (parity:
    privacy_evaluator.py:68-114). `real_patch_embeddings` is a list of
    [P_i, D] arrays (one per real case)."""
    patches_labels = np.concatenate([
        np.full(p.shape[0], real_labels[i])
        for i, p in enumerate(real_patch_embeddings)
    ])
    patches_embeddings = np.concatenate(list(real_patch_embeddings), axis=0)

    idx, _ = retrieve_cross_modal(gen_embeddings, patches_embeddings, top_k=1)
    acc_image = float((patches_labels[idx[:, 0]] == np.asarray(gen_labels)).mean())

    idx, _ = retrieve_cross_modal(gen_embeddings, real_text_embeddings, top_k=1)
    acc_text = float((np.asarray(real_labels)[idx[:, 0]] == np.asarray(gen_labels)).mean())
    return acc_image, acc_text


class PrivacyEvaluator:
    """Directory-scanning privacy evaluator over test_* dumps.

    Two reporting flavors, both from the reference:

      * `dcr_mean` / `nndr_mean` — the class-based evaluator's semantics
        (privacy_evaluator.py:126-188): the MEAN 1-NN L2 distance of
        generated to the dir's `data_real` (absolute memorization proxy;
        smaller = closer to the training sample) and the mean 1st/2nd-NN
        distance ratio against the same reference (→1 = generated points
        sit as close to their nearest real neighbour as that neighbour's
        own runner-up — memorization signal).
      * `dcr` / `nndr` — the function-level comparative shares vs the
        dir's `test_real` held-out set (privacy_evaluator.py:9-66), the
        flavor the reference entry points report
        (conditional_gan_concat.py:1096-1110).

    `train_real` optionally overrides the per-dir `data_real` as the real
    reference (the dumps' `data_real` IS the train-split real sample).
    """

    def __init__(self, results_path: str):
        import glob
        import os

        self.results_dirs = sorted(glob.glob(os.path.join(results_path, "test_*")))
        self.scores: dict = {}

    def evaluate(self, train_real: np.ndarray = None) -> dict:
        import os

        out = {"dcr": [], "nndr": [], "dcr_mean": [], "nndr_mean": []}
        for d in self.results_dirs:
            real_path = os.path.join(d, "data_real.npy")
            try:
                gen = np.load(os.path.join(d, "data_gen.npy"))
                test_real = np.load(os.path.join(d, "test_real.npy"))
                real = (train_real if train_real is not None
                        else np.load(real_path))
            except FileNotFoundError:
                continue  # nonconforming dump dir: skip, never abort the scan
            out["dcr"].append(dcr(real, gen, test_real))
            out["nndr"].append(nndr(real, gen, test_real))
            out["dcr_mean"].append(float(jnp.mean(_min_dists(gen, real))))
            out["nndr_mean"].append(float(jnp.mean(_nndr_ratio(gen, real))))
        self.scores = {k: (float(np.mean(v)), float(np.std(v)))
                       for k, v in out.items() if v}
        return self.scores

    def report(self) -> dict:
        """Print mean±std per metric (parity: privacy_evaluator.py:186-188)."""
        for k, (m, s) in self.scores.items():
            print(f"{k}: {m:.4f} ± {s:.4f}")
        return self.scores
