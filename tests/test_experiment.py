"""End-to-end Experiment protocol: fit -> validation evals -> test dumps ->
checkpoint evaluate -> post-hoc utility/privacy (reference protocol
conditional_gan_concat.py:575-1110 on tiny synthetic data)."""

import dataclasses
import glob
import os

import numpy as np
import pytest

from gemm_gan_tpu.cli.experiment import Experiment
from gemm_gan_tpu.data.synthetic import synthetic_dataset


def _splits(tiny_data):
    idx = {"train": np.arange(0, 32), "val": np.arange(32, 40),
           "test": np.arange(40, 48)}
    out = {s: {k: v[i] for k, v in tiny_data.items()} for s, i in idx.items()}
    out["meta"] = {"n_genes": 24}
    return out


@pytest.fixture(scope="module")
def experiment_run(tmp_path_factory):
    from tests.conftest import tiny_cfg

    tiny_data = synthetic_dataset(n=48, n_genes=24, n_classes=3, n_sites=2,
                                  num_patches=8, patch_dim=16, num_tokens=6,
                                  text_dim=12, seed=1)
    out = str(tmp_path_factory.mktemp("exp"))
    cfg = tiny_cfg("benchmark", train_kw=dict(
        n_critic=2, epochs=2, freq_compute_test=1, batch_size=8))
    cfg = dataclasses.replace(
        cfg, output_dir=out, run_name="t",
        eval=dataclasses.replace(cfg.eval, n_runs=2, pca_components=4,
                                 nearest_k=3))
    exp = Experiment(cfg, _splits(tiny_data))
    results = exp.fit()
    return exp, results


def test_fit_produces_summary_and_val_history(experiment_run):
    exp, results = experiment_run
    assert np.isfinite(results["gamma_mean"])
    assert len(results["runs"]) == 2
    # freq_compute_test=1 with 2 epochs -> one validation eval (last epoch
    # goes to the test block instead)
    assert len(exp.val_metrics_history) == 1
    rec = exp.val_metrics_history[0]
    assert "LR" in rec["detection"] and "precision" in rec["metrics"]
    assert os.path.exists(os.path.join(exp.out_dir, "validation_metrics.png"))


def test_dump_contract(experiment_run):
    exp, _ = experiment_run
    dirs = sorted(glob.glob(os.path.join(exp.out_dir, "test_*_epoch_*")))
    assert len(dirs) == 2
    want = {"data_real", "data_gen", "test_real", "test_gen",
            "train_labels_real", "train_labels_gen",
            "test_labels_real", "test_labels_gen",
            "train_labels_primary_site_real", "train_labels_primary_site_gen",
            "test_labels_primary_site_real", "test_labels_primary_site_gen"}
    got = {os.path.splitext(f)[0] for f in os.listdir(dirs[0])
           if f.endswith(".npy")}
    assert want <= got
    real = np.load(os.path.join(dirs[0], "data_real.npy"))
    gen = np.load(os.path.join(dirs[0], "data_gen.npy"))
    assert real.shape == gen.shape and real.shape[1] == 24


def test_evaluate_restores_checkpoint(experiment_run):
    """evaluate() = collective restore + test-block rerun. It names the dump
    dirs by the epoch the restored step reached and OVERWRITES fit's dumps
    (reference semantics: test_{run}_epoch_500 hardcoded at
    conditional_gan_concat.py:907) — and because restore is exact and the
    test-block RNG is reseeded per call, the regenerated dumps must be
    bitwise-identical to fit's (proven on-chip too: BASELINE.md rehearsal)."""
    exp, _ = experiment_run
    dirs = sorted(glob.glob(os.path.join(exp.out_dir, "test_*_epoch_*")))
    before = {d: {f: np.load(os.path.join(d, f)) for f in os.listdir(d)
                  if f.endswith(".npy")} for d in dirs}
    results = exp.evaluate()
    assert np.isfinite(results["gamma_mean"])
    after = sorted(glob.glob(os.path.join(exp.out_dir, "test_*_epoch_*")))
    assert after == dirs  # overwrote, didn't add step-named dirs
    for d, files in before.items():
        for f, arr in files.items():
            np.testing.assert_array_equal(
                arr, np.load(os.path.join(d, f)), err_msg=f"{d}/{f}")


def test_posthoc_utility_and_privacy(experiment_run):
    exp, _ = experiment_run
    util = exp.posthoc_utility()
    assert "disease" in util and "primary_site" in util
    # report: {setting: {clf: {metric: (mean, std)}}}
    assert any("TSTR" in s for s in util["disease"])
    priv = exp.posthoc_privacy()
    assert set(priv) == {"dcr", "nndr"}
    for mean, std in priv.values():
        assert np.isfinite(mean) and np.isfinite(std)


def test_best_checkpoint_selection(tmp_path, monkeypatch):
    """A run whose validation quality peaks MID-run: `evaluate(which="best")`
    must reload the peak checkpoint, while the default `which="last"` keeps
    reference restore-the-final semantics (VERDICT r3 weak #3 / next #2 —
    in the measured drift regime the final checkpoint is the worst evaluated
    model, BASELINE.md canonical-width narrative). The score sequence is
    pinned by monkeypatching `val_score` to a deterministic
    peak-at-the-middle-eval function of the record's epoch, so the selection
    machinery (save-on-strict-improvement, best.json, restore) is tested
    without depending on noisy tiny-run dynamics."""
    import json

    import jax

    from tests.conftest import tiny_cfg

    from gemm_gan_tpu.cli import experiment as expmod
    from gemm_gan_tpu.train.checkpoint import latest_step, restore_state

    tiny_data = synthetic_dataset(n=48, n_genes=24, n_classes=3, n_sites=2,
                                  num_patches=8, patch_dim=16, num_tokens=6,
                                  text_dim=12, seed=1)
    cfg = tiny_cfg("benchmark", train_kw=dict(
        n_critic=2, epochs=4, freq_compute_test=1, batch_size=8))
    cfg = dataclasses.replace(
        cfg, output_dir=str(tmp_path), run_name="best",
        eval=dataclasses.replace(cfg.eval, n_runs=1, pca_components=4,
                                 nearest_k=3))
    # evals run after epochs 0, 1, 2 (the last epoch goes to the test block);
    # quality "peaks" at the middle eval
    scores = {0: 1.0, 1: 5.0, 2: 2.0}
    monkeypatch.setattr(expmod, "val_score", lambda rec: scores[rec["epoch"]])

    exp = Experiment(cfg, _splits(tiny_data))
    exp.fit()
    spe = len(exp.loaders["train"])

    with open(os.path.join(exp.out_dir, "best.json")) as f:
        best = json.load(f)
    # "epoch" = epochs completed = the number evaluate() puts in the
    # best-checkpoint dump-dir names, so it feeds posthoc_utility(epoch=...)
    assert best == {"score": 5.0, "epoch": 2, "eval_epoch": 1,
                    "step": 2 * spe}
    # ckpt_best's newest snapshot IS the peak state (saves happen only on
    # strict improvement, so eval 2's lower score did not overwrite it)
    best_dir = os.path.join(exp.out_dir, "ckpt_best")
    assert latest_step(best_dir) == 2 * spe
    template = jax.device_get(exp.engine.init_state(
        cfg.train.seed, next(iter(exp.loaders["train"].epoch(0)))))
    restored = restore_state(best_dir, template)
    assert int(restored.step) == 2 * spe

    # evaluate(best) reruns the test block from the peak (dump dirs named by
    # the restored epoch); the default stays reference last-checkpoint
    res_best = exp.evaluate(which="best")
    assert np.isfinite(res_best["gamma_mean"])
    assert glob.glob(os.path.join(exp.out_dir, "test_*_epoch_2"))
    # best["epoch"] round-trips into the posthoc epoch filter
    from gemm_gan_tpu.eval.utility import UtilityEvaluator

    ev = UtilityEvaluator(exp.out_dir, pattern=f"test_*_epoch_{best['epoch']}")
    assert len(ev.results_dirs) == 1
    res_last = exp.evaluate()
    assert np.isfinite(res_last["gamma_mean"])
    assert glob.glob(os.path.join(exp.out_dir, "test_*_epoch_4"))

    # a FRESH fit into the same out_dir clears the previous run's gate-best
    # state (ADVICE r4): the rerun's scores all sit BELOW the old 5.0 peak,
    # so if stale best.json/ckpt_best survived, no save would fire and the
    # old record would silently win
    scores.update({0: 0.5, 1: 0.2, 2: 0.1})
    exp2 = Experiment(cfg, _splits(tiny_data))
    exp2.fit()
    with open(os.path.join(exp2.out_dir, "best.json")) as f:
        best2 = json.load(f)
    assert best2["eval_epoch"] == 0 and best2["score"] == 0.5
    assert latest_step(os.path.join(exp2.out_dir, "ckpt_best")) == spe


def test_validation_max_cases_caps_train_regen(tmp_path, monkeypatch):
    """`eval.validation_max_cases` caps the TRAIN-side regeneration during
    periodic validation only (at canonical width the full-train regen on
    top of the resident HBM banks exceeds chip memory); the val split and
    the final test block stay uncapped (reference behavior)."""
    from tests.conftest import tiny_cfg

    tiny_data = synthetic_dataset(n=48, n_genes=24, n_classes=3, n_sites=2,
                                  num_patches=8, patch_dim=16, num_tokens=6,
                                  text_dim=12, seed=1)
    cfg = tiny_cfg("benchmark", train_kw=dict(
        n_critic=2, epochs=2, freq_compute_test=1, batch_size=8))
    cfg = dataclasses.replace(
        cfg, output_dir=str(tmp_path), run_name="cap",
        eval=dataclasses.replace(cfg.eval, n_runs=1, pca_components=4,
                                 nearest_k=3, validation_max_cases=16))
    exp = Experiment(cfg, _splits(tiny_data))  # train split has 32 cases
    seen = []
    orig = exp.engine.generate_samples_all

    def spy(state, key, batches, **kw):
        batches = list(batches() if callable(batches) else batches)
        seen.append(sum(b["genes"].shape[0] for b in batches))
        return orig(state, key, batches, **kw)

    monkeypatch.setattr(exp.engine, "generate_samples_all", spy)
    exp.fit()
    # first validation eval: capped train regen (16 of 32), then the val
    # split (8, uncapped); the final test block regenerates the FULL train
    assert seen[0] == 16 and seen[1] == 8, seen
    assert 32 in seen[2:], seen


def test_evaluate_best_without_validation_raises(tmp_path):
    """which='best' needs a tracked best checkpoint (periodic validation)."""
    from tests.conftest import tiny_cfg

    tiny_data = synthetic_dataset(n=48, n_genes=24, n_classes=3, n_sites=2,
                                  num_patches=8, patch_dim=16, num_tokens=6,
                                  text_dim=12, seed=1)
    cfg = tiny_cfg("benchmark", train_kw=dict(
        n_critic=2, epochs=1, freq_compute_test=100, batch_size=8))
    cfg = dataclasses.replace(cfg, output_dir=str(tmp_path), run_name="nb")
    exp = Experiment(cfg, _splits(tiny_data))
    with pytest.raises(FileNotFoundError, match="best"):
        exp.evaluate(which="best")
    with pytest.raises(ValueError, match="which"):
        exp.evaluate(which="newest")


def test_generate_balanced_oversamples(experiment_run):
    import jax

    exp, _ = experiment_run
    out = exp.generate_balanced(exp.state, jax.random.key(0))
    counts = np.bincount(out["disease"])
    counts = counts[counts > 0]
    # oversampling narrows the class-count spread vs the raw train split
    raw = np.bincount(exp.splits["train"]["disease"])
    assert counts.max() - counts.min() <= raw.max() - raw.min()


def test_vanilla_test_block_reports_pr_at_k(tmp_path):
    """The vanilla preset computes kNN precision/recall@{10,20,50} per test
    run (vanilla_gan_unconditional.py:517-524); sizes >= the manifold are
    dropped, and values agree with a direct get_precision_recall call."""
    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.eval.knn_pr import get_precision_recall
    from tests.conftest import tiny_cfg

    assert variant_config("vanilla").eval.pr_nhood_sizes == (10, 20, 50)
    assert variant_config("concat_text").eval.pr_nhood_sizes == ()

    tiny_data = synthetic_dataset(n=48, n_genes=24, n_classes=3, n_sites=2,
                                  num_patches=8, patch_dim=16, num_tokens=6,
                                  text_dim=12, seed=1)
    cfg = tiny_cfg("vanilla", train_kw=dict(
        n_critic=2, epochs=1, freq_compute_test=5, batch_size=8))
    cfg = dataclasses.replace(
        cfg, output_dir=str(tmp_path), run_name="pr",
        eval=dataclasses.replace(cfg.eval, n_runs=1, pca_components=4,
                                 nearest_k=3, pr_nhood_sizes=(3, 64)))
    splits = {s: {"genes": d["genes"]} for s, d in _splits(tiny_data).items()
              if s != "meta"}
    splits["meta"] = {"n_genes": 24}
    exp = Experiment(cfg, splits)
    results = exp.fit()
    run = results["runs"][0]
    # k=64 exceeds the 8-sample test manifold and is dropped; k=3 is kept
    assert "precision@64" not in run and "recall@64" not in run
    assert 0.0 <= run["precision@3"] <= 1.0 and 0.0 <= run["recall@3"] <= 1.0
    d = os.path.join(exp.out_dir, "test_0_epoch_1")
    p, r = get_precision_recall(np.load(os.path.join(d, "test_real.npy")),
                                np.load(os.path.join(d, "test_gen.npy")),
                                nb_nn=(3,))
    assert run["precision@3"] == pytest.approx(p)
    assert run["recall@3"] == pytest.approx(r)


def test_on_device_validation_proxy(tmp_path):
    """eval.on_device_validation swaps the periodic validation to the
    device-side kNN-detection + PRDC proxy: generation stays on device
    (device_out=True) and the history record carries the proxy keys the
    curve plotter understands."""
    from tests.conftest import tiny_cfg

    tiny_data = synthetic_dataset(n=48, n_genes=24, n_classes=3, n_sites=2,
                                  num_patches=8, patch_dim=16, num_tokens=6,
                                  text_dim=12, seed=1)
    cfg = tiny_cfg("benchmark", train_kw=dict(
        n_critic=2, epochs=2, freq_compute_test=1, batch_size=8))
    cfg = dataclasses.replace(
        cfg, output_dir=str(tmp_path), run_name="proxy",
        eval=dataclasses.replace(cfg.eval, n_runs=1, pca_components=4,
                                 nearest_k=3, on_device_validation=True))
    exp = Experiment(cfg, _splits(tiny_data))
    results = exp.fit()
    assert np.isfinite(results["gamma_mean"])
    assert len(exp.val_metrics_history) == 1
    rec = exp.val_metrics_history[0]
    assert "KNN" in rec["detection"]
    assert 0.0 <= rec["detection"]["KNN"]["accuracy"] <= 1.0
    for k in ("precision", "recall", "density", "coverage"):
        assert np.isfinite(rec["metrics"][k])
    assert os.path.exists(os.path.join(exp.out_dir, "validation_metrics.png"))


def test_fit_profile_window_writes_trace(tmp_path):
    """`fit(profile_dir=...)` captures a steady-state trace (window opens
    after the first epoch, so compiles are excluded) and
    `aggregate_device_trace` parses it (beyond reference — SURVEY §5 lists
    profiling as absent there)."""
    from tests.conftest import tiny_cfg

    from gemm_gan_tpu.utils.metrics import aggregate_device_trace

    tiny_data = synthetic_dataset(n=48, n_genes=24, seed=1)
    splits = {s: {"genes": tiny_data["genes"][i]} for s, i in
              {"train": np.arange(0, 32), "val": np.arange(32, 40),
               "test": np.arange(40, 48)}.items()}
    splits["meta"] = {"n_genes": 24}
    cfg = tiny_cfg("vanilla", train_kw=dict(
        n_critic=2, epochs=3, freq_compute_test=10, batch_size=8))
    cfg = dataclasses.replace(
        cfg, output_dir=str(tmp_path), run_name="p",
        eval=dataclasses.replace(cfg.eval, n_runs=1, pca_components=4,
                                 nearest_k=3))
    prof_dir = str(tmp_path / "prof")
    exp = Experiment(cfg, splits)
    exp.fit(profile_dir=prof_dir, profile_epochs=1)
    agg = aggregate_device_trace(prof_dir)  # raises FileNotFoundError if none
    assert os.path.exists(agg["trace_path"])
    assert "by_source" in agg and "by_category" in agg


def test_whole_slide_bank_subsample_path(tmp_path):
    """The whole-slide product configuration at tiny dims: a patch bank
    WIDER than `data.num_patches` (on-device per-step subsample — the
    reference's protocol, multi_patch_gan_dataloader.py:32-35), stored
    bf16 (`embedding_store_dtype`), with `fusion.remat_layers=True` —
    exactly the library path the on-chip whole-slide quality runs and
    their matched-budget control exercise (BASELINE.md "Whole-slide
    quality gate"). Guards the num_patches/bank-width decoupling through
    the full Experiment protocol (fit -> test block -> dumps)."""
    import jax.numpy as jnp

    from tests.conftest import tiny_cfg

    tiny_data = synthetic_dataset(n=48, n_genes=24, n_classes=3, n_sites=2,
                                  num_patches=16, patch_dim=16, num_tokens=6,
                                  text_dim=12, seed=1)
    cfg = tiny_cfg("film", fusion_kw=dict(remat_layers=True),
                   train_kw=dict(n_critic=2, epochs=2, freq_compute_test=1,
                                 batch_size=8))
    cfg = dataclasses.replace(
        cfg, output_dir=str(tmp_path), run_name="ws",
        data=dataclasses.replace(cfg.data, num_patches=8,
                                 embedding_store_dtype="bfloat16"),
        eval=dataclasses.replace(cfg.eval, n_runs=1, pca_components=4,
                                 nearest_k=3, on_device_validation=True))
    exp = Experiment(cfg, _splits(tiny_data))
    # bank resident at full width in the narrow dtype; batches subsample
    bank = exp.loaders["train"].arrays["patches"]
    assert bank.shape[1] == 16 and bank.dtype == jnp.bfloat16
    batch = next(iter(exp.loaders["train"].epoch(0)))
    assert batch["patches"].shape[1] == 8
    assert batch["patches"].dtype == jnp.float32  # re-emerges f32
    results = exp.fit()
    assert np.isfinite(results["gamma_mean"])
    dumps = glob.glob(os.path.join(exp.out_dir, "test_0_epoch_*"))
    assert dumps and os.path.exists(os.path.join(dumps[0], "data_gen.npy"))
