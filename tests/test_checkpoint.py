"""Full-state checkpoint round-trip and mid-training resume — a capability
the reference lacks entirely (SURVEY.md §5: only final-epoch state_dicts)."""

import os

import pytest

import jax
import numpy as np

from gemm_gan_tpu.data.loader import Batches
from gemm_gan_tpu.train.checkpoint import latest_step, restore_state, save_state
from gemm_gan_tpu.train.wgan import WGANGPEngine


def test_resume_is_exact(tmp_path, tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg("vanilla")
    data = {"genes": tiny_data["genes"]}
    loader = Batches(data, batch_size=8, seed=0)
    batch = next(iter(loader))

    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    state = eng.init_state(0, batch)
    state, _ = eng.step(state, batch)
    state, _ = eng.step(state, batch)
    ckpt = str(tmp_path / "ckpt")
    save_state(ckpt, jax.device_get(state))
    assert latest_step(ckpt) == 2

    # continue original
    cont, m_direct = eng.step(state, batch)

    # restore into a fresh engine and continue
    eng2 = WGANGPEngine(cfg, steps_per_epoch=2)
    template = jax.device_get(eng2.init_state(0, batch))
    restored = restore_state(ckpt, template)
    assert int(restored.step) == 2
    resumed, m_resumed = eng2.step(restored, batch)

    for k in m_direct:
        np.testing.assert_allclose(float(m_direct[k]), float(m_resumed[k]),
                                   rtol=1e-6, err_msg=k)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6),
        jax.device_get(cont.g_params), jax.device_get(resumed.g_params))


def test_experiment_resume_exact(tmp_path, tiny_data, make_tiny_cfg):
    """Experiment.fit(resume=True) continues an interrupted run to the SAME
    final train state an uninterrupted run reaches: a 2-epoch run's final
    checkpoint + 2 resumed epochs must equal 4 straight epochs bitwise
    (full state: both optimizer states, step, PRNG key)."""
    import dataclasses

    from gemm_gan_tpu.cli.experiment import Experiment

    def splits():
        idx = {"train": np.arange(0, 32), "val": np.arange(32, 40),
               "test": np.arange(40, 48)}
        out = {s: {"genes": tiny_data["genes"][i]} for s, i in idx.items()}
        out["meta"] = {"n_genes": 24}
        return out

    def cfg_for(out_dir, epochs):
        cfg = make_tiny_cfg("vanilla", train_kw=dict(
            n_critic=2, epochs=epochs, freq_compute_test=1, batch_size=8,
            checkpoint_every_eval=True))
        return dataclasses.replace(
            cfg, output_dir=str(out_dir), run_name="r",
            eval=dataclasses.replace(cfg.eval, n_runs=1, pca_components=4,
                                     nearest_k=3))

    straight = Experiment(cfg_for(tmp_path / "a", 4), splits())
    straight.fit()

    interrupted = Experiment(cfg_for(tmp_path / "b", 2), splits())
    interrupted.fit()  # final save at step 2*steps_per_epoch
    resumed = Experiment(cfg_for(tmp_path / "b", 4), splits())
    resumed.fit(resume=True)

    # pre-crash validation history rehydrates from val_metrics.json: the
    # resumed run's curves cover epoch 0 (pre-resume) AND epoch 2 (post)
    import json as _json
    with open(os.path.join(str(tmp_path / "b"), "r", "val_metrics.json")) as f:
        epochs_logged = [r["epoch"] for r in _json.load(f)]
    assert epochs_logged == [0, 2]

    a = jax.device_get(straight.state)
    b = jax.device_get(resumed.state)
    assert int(a.step) == int(b.step)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), a.g_params, b.g_params)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), a.d_opt_state, b.d_opt_state)
    np.testing.assert_array_equal(np.asarray(jax.random.key_data(a.key)),
                                  np.asarray(jax.random.key_data(b.key)))


def test_vae_experiment_resume(tmp_path, tiny_data, make_tiny_cfg):
    """VAEExperiment.fit(resume=True): periodic checkpoints exist mid-run
    and the resumed final state matches the straight run exactly."""
    import dataclasses

    from gemm_gan_tpu.cli.vae_experiment import VAEExperiment

    def splits():
        idx = {"train": np.arange(0, 32), "test": np.arange(40, 48)}
        out = {s: {"genes": tiny_data["genes"][i]} for s, i in idx.items()}
        out["meta"] = {"n_genes": 24}
        return out

    def cfg_for(out_dir, epochs):
        cfg = make_tiny_cfg("vae", train_kw=dict(
            epochs=epochs, freq_compute_test=2, batch_size=8))
        return dataclasses.replace(
            cfg, output_dir=str(out_dir), run_name="v",
            eval=dataclasses.replace(cfg.eval, n_runs=1, pca_components=4,
                                     nearest_k=3))

    straight = VAEExperiment(cfg_for(tmp_path / "a", 4), splits())
    straight.fit()

    interrupted = VAEExperiment(cfg_for(tmp_path / "b", 2), splits())
    interrupted.fit()
    resumed = VAEExperiment(cfg_for(tmp_path / "b", 4), splits())
    resumed.fit(resume=True)

    a = jax.device_get(straight.state)
    b = jax.device_get(resumed.state)
    assert int(a.step) == int(b.step)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), a.params, b.params)


def test_resolve_ckpt_dir_pins_best_step(tmp_path):
    """`resolve_ckpt_dir` maps which='best' to the sibling ckpt_best/ and
    pins the restore step to best.json's record — so a stale higher-step
    checkpoint left in ckpt_best/ by a previous run can never silently win
    over the recorded best (ADVICE r4)."""
    import json

    from gemm_gan_tpu.train.checkpoint import resolve_ckpt_dir

    run = tmp_path / "run"
    (run / "ckpt").mkdir(parents=True)
    (run / "ckpt_best").mkdir()
    (run / "best.json").write_text(json.dumps({"score": 1.0, "epoch": 3,
                                               "step": 12}))
    ckpt = str(run / "ckpt")

    assert resolve_ckpt_dir(ckpt, "last") == (ckpt, None)
    best_dir, step = resolve_ckpt_dir(ckpt, "best")
    assert best_dir == str(run / "ckpt_best")
    assert step == 12

    # no best.json: directory still resolves, step stays None (newest wins)
    (run / "best.json").unlink()
    assert resolve_ckpt_dir(ckpt, "best") == (str(run / "ckpt_best"), None)

    # missing ckpt_best/ fails loudly with the how-to-fix message
    import shutil

    shutil.rmtree(run / "ckpt_best")
    with pytest.raises(FileNotFoundError, match="freq_compute_test"):
        resolve_ckpt_dir(ckpt, "best")
    with pytest.raises(ValueError, match="which"):
        resolve_ckpt_dir(ckpt, "latest")
