"""Privacy metric goldens (reference formulas:
/root/reference/src/privacy_evaluator.py:9-66)."""

import numpy as np

from gemm_gan_tpu.eval.privacy import dcr, nndr, retrieval_accuracy


def _dcr_np(real, gen, test):
    d_real = np.sqrt(((gen[:, None] - real) ** 2).sum(2)).min(1)
    d_test = np.sqrt(((gen[:, None] - test) ** 2).sum(2)).min(1)
    return (d_real < d_test).mean()


def _nndr_np(real, gen, test):
    def ratio(ref):
        d = np.sort(np.sqrt(((gen[:, None] - ref) ** 2).sum(2)), axis=1)
        return d[:, 0] / d[:, 1]

    return (ratio(real) < ratio(test)).mean()


def test_dcr_matches_numpy(rng):
    real = rng.randn(40, 6).astype(np.float32)
    test = rng.randn(30, 6).astype(np.float32)
    gen = rng.randn(25, 6).astype(np.float32)
    np.testing.assert_allclose(dcr(real, gen, test), _dcr_np(real, gen, test))


def test_nndr_matches_numpy(rng):
    real = rng.randn(40, 6).astype(np.float32)
    test = rng.randn(30, 6).astype(np.float32)
    gen = rng.randn(25, 6).astype(np.float32)
    np.testing.assert_allclose(nndr(real, gen, test), _nndr_np(real, gen, test))


def test_dcr_memorization_detected(rng):
    real = rng.randn(40, 6).astype(np.float32)
    test = rng.randn(40, 6).astype(np.float32)
    gen = real[:20] + 1e-5  # memorized training data
    assert dcr(real, gen, test) == 1.0


def test_retrieval_accuracy_perfect_alignment(rng):
    # gallery embeddings = query embeddings -> top-1 retrieval is self
    n, d = 20, 8
    emb = rng.randn(n, d).astype(np.float32)
    labels = rng.randint(0, 3, n)
    patches = [emb[i:i + 1] for i in range(n)]  # one patch per case
    acc_img, acc_txt = retrieval_accuracy(emb, labels, labels, patches, emb)
    assert acc_img == 1.0 and acc_txt == 1.0


def test_privacy_evaluator_directory_scan(rng, tmp_path):
    """PrivacyEvaluator reports both reference flavors per test_* dir: the
    comparative shares (privacy_evaluator.py:9-66, what the entry points
    print) and the class-based mean-distance scores (:137-174)."""
    from gemm_gan_tpu.eval.privacy import PrivacyEvaluator

    real = rng.randn(30, 5).astype(np.float32)
    test = rng.randn(20, 5).astype(np.float32)
    gens = []
    for i in range(2):
        d = tmp_path / f"test_{i}_epoch_9"
        d.mkdir()
        gen = rng.randn(15, 5).astype(np.float32)
        gens.append(gen)
        np.save(d / "data_real.npy", real)
        np.save(d / "data_gen.npy", gen)
        np.save(d / "test_real.npy", test)

    ev = PrivacyEvaluator(str(tmp_path))
    assert len(ev.results_dirs) == 2
    scores = ev.evaluate()
    assert set(scores) == {"dcr", "nndr", "dcr_mean", "nndr_mean"}

    def per_dir(gen):
        d1 = np.sort(np.sqrt(((gen[:, None] - real) ** 2).sum(2)), axis=1)
        return (_dcr_np(real, gen, test), _nndr_np(real, gen, test),
                d1[:, 0].mean(), (d1[:, 0] / d1[:, 1]).mean())

    golden = np.array([per_dir(g) for g in gens])  # [2, 4]
    for j, k in enumerate(["dcr", "nndr", "dcr_mean", "nndr_mean"]):
        # atol: the f32 device path vs the f64 golden; the per-dir values can
        # land arbitrarily close together, making a pure-rtol check on their
        # std amplify f32 rounding without bound
        np.testing.assert_allclose(scores[k][0], golden[:, j].mean(),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(scores[k][1], golden[:, j].std(),
                                   rtol=1e-5, atol=1e-5)
    assert ev.report() == scores


def test_privacy_evaluator_skips_dir_missing_data_real(rng, tmp_path):
    """A run dir without data_real.npy is skipped (never aborts the scan)
    unless train_real is passed explicitly."""
    from gemm_gan_tpu.eval.privacy import PrivacyEvaluator

    real = rng.randn(20, 4).astype(np.float32)
    test = rng.randn(15, 4).astype(np.float32)
    good = tmp_path / "test_0_epoch_1"
    bad = tmp_path / "test_1_epoch_1"
    for d in (good, bad):
        d.mkdir()
        np.save(d / "data_gen.npy", rng.randn(10, 4).astype(np.float32))
        np.save(d / "test_real.npy", test)
    np.save(good / "data_real.npy", real)

    ev = PrivacyEvaluator(str(tmp_path))
    scores = ev.evaluate()                       # bad dir silently skipped
    assert all(v[1] == 0.0 for v in scores.values())  # one dir -> std 0
    with_override = PrivacyEvaluator(str(tmp_path)).evaluate(train_real=real)
    assert all(np.isfinite(v[0]) for v in with_override.values())


def test_privacy_evaluator_skips_partial_dump_dirs(tmp_path):
    """A test_* dir missing any of the three npys is skipped, never aborts
    the scan — with and without a train_real override."""
    import numpy as np

    from gemm_gan_tpu.eval.privacy import PrivacyEvaluator

    rng = np.random.RandomState(0)
    good = tmp_path / "test_0_epoch_9"
    good.mkdir()
    for name in ("data_real", "data_gen", "test_real"):
        np.save(good / f"{name}.npy", rng.randn(16, 6).astype(np.float32))
    partial = tmp_path / "test_1_epoch_9"
    partial.mkdir()
    np.save(partial / "data_real.npy", rng.randn(16, 6).astype(np.float32))
    # (no data_gen / test_real in `partial`)
    scores = PrivacyEvaluator(str(tmp_path)).evaluate()
    assert set(scores) == {"dcr", "nndr", "dcr_mean", "nndr_mean"}
    scores2 = PrivacyEvaluator(str(tmp_path)).evaluate(
        train_real=rng.randn(16, 6).astype(np.float32))
    assert set(scores2) == {"dcr", "nndr", "dcr_mean", "nndr_mean"}
