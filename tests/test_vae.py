"""VAE/CVAE: loss goldens, engine step, sampling
(reference: /root/reference/src/vae/losses.py:5-19, vae/vanilla_vae.py, vae/cvae.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_gan_tpu.data.loader import Batches
from gemm_gan_tpu.models.vae import elbo_loss, kl_divergence, recon_loss
from gemm_gan_tpu.train.vae import VAEEngine


def test_kl_analytic():
    mu = jnp.zeros((4, 3))
    logvar = jnp.zeros((4, 3))
    assert float(kl_divergence(mu, logvar)) == pytest.approx(0.0)
    # KL(N(1,1)||N(0,1)) = 0.5 per dim
    mu = jnp.ones((2, 5))
    assert float(kl_divergence(mu, jnp.zeros((2, 5)))) == pytest.approx(2.5)


def test_recon_mse():
    x = jnp.ones((3, 4))
    out = jnp.zeros((3, 4))
    assert float(recon_loss(x, out, "mse")) == pytest.approx(1.0)


def test_elbo_beta_scales_kl(rng):
    x = jnp.asarray(rng.randn(5, 4).astype(np.float32))
    out = jnp.asarray(rng.randn(5, 4).astype(np.float32))
    mu = jnp.asarray(rng.randn(5, 2).astype(np.float32))
    logvar = jnp.asarray(rng.randn(5, 2).astype(np.float32))
    l1, (r, kl) = elbo_loss(x, out, mu, logvar, beta=1.0)
    l2, _ = elbo_loss(x, out, mu, logvar, beta=2.0)
    assert float(l2 - l1) == pytest.approx(float(kl), rel=1e-5)


@pytest.mark.parametrize("variant", ["vae", "cvae"])
def test_engine_trains_and_samples(variant, tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg(variant,
                        train_kw=dict(vae_lr=3e-3, vae_warmup_epochs=1))
    eng = VAEEngine(cfg, steps_per_epoch=2)
    loader = Batches(tiny_data, batch_size=8, seed=0)
    batch = next(iter(loader))
    state = eng.init_state(0, batch)
    losses = []
    for _ in range(20):
        state, m = eng.step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    # ELBO is stochastic (fresh reparam key per step); compare averaged ends
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    if variant == "cvae":
        out = eng.sample(state, jax.random.key(0),
                         disease=batch["disease"], site=batch["site"])
        assert out.shape == (8, 24)
    else:
        out = eng.sample(state, jax.random.key(0), num=5)
        assert out.shape == (5, 24)
    assert np.isfinite(out).all()


def test_vae_gaussian_nll_head(tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg("vae")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, vae_recon="gaussian_nll"))
    eng = VAEEngine(cfg, steps_per_epoch=2)
    loader = Batches(tiny_data, batch_size=8, seed=0)
    batch = next(iter(loader))
    state = eng.init_state(0, batch)
    state, m = eng.step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_vae_step_many_matches_sequential(tiny_data, make_tiny_cfg):
    import jax.numpy as jnp

    cfg = make_tiny_cfg("vae")
    loader = Batches(tiny_data, batch_size=8, seed=0, shuffle=False)
    batches = list(loader.epoch(0))[:3]

    e1 = VAEEngine(cfg, steps_per_epoch=3)
    s1 = e1.init_state(0, batches[0])
    for b in batches:
        s1, m1 = e1.step(s1, b)

    e2 = VAEEngine(cfg, steps_per_epoch=3)
    s2 = e2.init_state(0, batches[0])
    stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in batches])
               for k in batches[0]}
    s2, m2 = e2.step_many(s2, stacked)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), s1.params, s2.params)


def test_vae_experiment_gate_best_tracking(tmp_path, tiny_data, make_tiny_cfg):
    """VERDICT r4 #6: the VAE experiment tracks its lowest-val-ELBO
    checkpoint symmetrically with the GAN's gate-best protocol — periodic
    validation writes ckpt_best/ + best.json, `evaluate(which="best")`
    restores it (step pinned from best.json), and a fresh fit clears stale
    best state from a reused out_dir."""
    import dataclasses
    import json
    import os

    from gemm_gan_tpu.cli.vae_experiment import VAEExperiment

    idx = {"train": np.arange(0, 32), "val": np.arange(32, 40),
           "test": np.arange(40, 48)}
    splits = {s: {"genes": tiny_data["genes"][i]} for s, i in idx.items()}

    def build(epochs):
        cfg = make_tiny_cfg("vae", train_kw=dict(
            epochs=epochs, freq_compute_test=2, batch_size=8, vae_lr=3e-3,
            vae_warmup_epochs=1))
        cfg = dataclasses.replace(
            cfg, output_dir=str(tmp_path), run_name="v",
            eval=dataclasses.replace(cfg.eval, n_runs=1, pca_components=4,
                                     nearest_k=3))
        return VAEExperiment(cfg, splits)

    exp = build(6)
    exp.fit()
    run_dir = exp.out_dir
    best_path = os.path.join(run_dir, "best.json")
    assert os.path.isdir(os.path.join(run_dir, "ckpt_best"))
    assert os.path.exists(best_path)
    with open(best_path) as f:
        best = json.load(f)
    # evals ran at epochs 1 and 3 (0-indexed; epoch 5 is last, skipped);
    # best.json records whichever scored lower val ELBO
    assert best["eval_epoch"] in (1, 3)
    assert best["val_loss"] == pytest.approx(
        min(r["loss"] for r in exp.val_metrics_history))
    assert len(exp.val_metrics_history) == 2

    res = exp.evaluate(which="best")
    assert np.isfinite(res["gamma_mean"])
    # dump dirs are named by the restored step's epoch, not train.epochs
    assert any(p.endswith(f"_epoch_{best['epoch']}")
               for p in os.listdir(run_dir) if p.startswith("test_"))

    # a stale higher-step checkpoint must not survive a fresh fit: refit
    # with FEWER epochs into the same out_dir and confirm best.json now
    # records the short run's only eval (epoch 1 — epoch 3 is last,
    # skipped), not anything inherited from the 6-epoch run
    exp2 = build(4)
    exp2.fit()
    with open(best_path) as f:
        best2 = json.load(f)
    assert best2["eval_epoch"] == 1
    assert best2["step"] == 2 * 4  # (epoch 1 done) = 2 epochs x 4 batches
