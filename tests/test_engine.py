"""Fused WGAN-GP engine: step smoke for all variants, reproducibility,
learning on a separable toy problem."""

import jax
import numpy as np
import pytest

from gemm_gan_tpu.data.loader import Batches
from gemm_gan_tpu.train.wgan import WGANGPEngine

ALL_VARIANTS = ["vanilla", "concat_text", "concat_image", "attention",
                "img_transformer", "film", "cross_attention",
                "film_cross_attention", "benchmark"]


@pytest.mark.parametrize("variant", ["vanilla", "film_cross_attention", "benchmark"])
def test_step_and_sample(variant, tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg(variant)
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    loader = Batches(tiny_data, batch_size=8, seed=0)
    batch = next(iter(loader))
    state = eng.init_state(0, batch)
    state, m = eng.step(state, batch)
    assert all(np.isfinite(float(v)) for v in m.values())
    fake = eng.generate_samples(state, jax.random.key(0), batch)
    assert fake.shape == (8, 24)
    assert np.isfinite(np.asarray(fake)).all()


def test_bitwise_reproducible(tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg("vanilla")

    def run():
        eng = WGANGPEngine(cfg, steps_per_epoch=2)
        loader = Batches({"genes": tiny_data["genes"]}, batch_size=8, seed=1)
        state = eng.init_state(3, next(iter(loader)))
        for batch in loader.epoch(0):
            state, _ = eng.step(state, batch)
        return jax.tree.map(np.asarray, jax.device_get(state.g_params))

    a, b = run(), run()
    jax.tree.map(np.testing.assert_array_equal, a, b)


def test_step_counter_and_fresh_latents(tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg("vanilla")
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    loader = Batches({"genes": tiny_data["genes"]}, batch_size=8, seed=1)
    batch = next(iter(loader))
    state = eng.init_state(0, batch)
    s1, m1 = eng.step(state, batch)
    s2, m2 = eng.step(s1, batch)
    assert int(s2.step) == 2
    # same batch, different step -> different latents -> different losses
    assert float(m1["g_loss"]) != float(m2["g_loss"])


@pytest.mark.slow
def test_learns_gaussian(make_tiny_cfg):
    """E2E smoke (SURVEY.md §4 plan d): detection-style check that training
    moves the generated distribution toward the data."""
    import dataclasses

    from gemm_gan_tpu.eval.distances import wasserstein

    rng = np.random.RandomState(0)
    data = {"genes": (rng.randn(256, 16) * 0.5 + 2.0).astype(np.float32)}
    cfg = make_tiny_cfg("vanilla")
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, n_genes=16))
    loader = Batches(data, batch_size=32, seed=0)
    eng = WGANGPEngine(cfg, steps_per_epoch=len(loader))
    state = eng.init_state(0, next(iter(loader)))
    w_before = wasserstein(
        np.asarray(eng.generate_samples(state, jax.random.key(9), {"genes": data["genes"][:64]})),
        data["genes"][:64], power=1)
    state = eng.fit(state, epochs=30, batches_fn=lambda: loader.epoch())
    w_after = wasserstein(
        np.asarray(eng.generate_samples(state, jax.random.key(9), {"genes": data["genes"][:64]})),
        data["genes"][:64], power=1)
    assert w_after < w_before


def test_generate_samples_all(tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg("benchmark")
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    loader = Batches(tiny_data, batch_size=8, seed=0, shuffle=False)
    state = eng.init_state(0, next(iter(loader)))
    out = eng.generate_samples_all(state, jax.random.key(0), loader.epoch(0),
                                   num_repeats=2)
    n = (48 // 8) * 8 * 2
    assert out["real"].shape[0] == n
    assert out["fake"].shape == out["real"].shape
    assert out["disease"].shape[0] == n


def test_step_many_matches_sequential(tiny_data, make_tiny_cfg):
    """lax.scan multi-step must equal K sequential fused steps bitwise."""
    import jax.numpy as jnp

    cfg = make_tiny_cfg("vanilla")
    data = {"genes": tiny_data["genes"]}
    loader = Batches(data, batch_size=8, seed=0, shuffle=False)
    batches = list(loader.epoch(0))[:3]

    eng1 = WGANGPEngine(cfg, steps_per_epoch=3)
    s1 = eng1.init_state(0, batches[0])
    for b in batches:
        s1, m1 = eng1.step(s1, b)

    eng2 = WGANGPEngine(cfg, steps_per_epoch=3)
    s2 = eng2.init_state(0, batches[0])
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    s2, m2 = eng2.step_many(s2, stacked)

    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=1e-6,
                                   err_msg=k)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), s1.g_params, s2.g_params)


def test_gp_cond_embed_hoist_is_exact(tiny_data, make_tiny_cfg):
    """The engine computes the critic's condition embedding ONCE outside the
    gradient-penalty inner grad (train/wgan.py). Because the penalty
    differentiates w.r.t. the interpolated expression only (reference
    /root/reference/src/conditional_gan_concat.py:332-337), this must be
    bitwise-identical — value AND outer parameter gradients — to tracing the
    full critic forward inside the inner grad."""
    import jax.numpy as jnp

    from gemm_gan_tpu.train import losses

    cfg = make_tiny_cfg("film_cross_attention")
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    batch = next(iter(Batches(tiny_data, batch_size=8, seed=0, shuffle=False)))
    state = eng.init_state(0, batch)
    disc = eng.disc
    cond = {k: jnp.asarray(batch[k]) for k in
            ("tokens", "token_mask", "patches", "patch_mask") if k in batch}
    real = jnp.asarray(batch["genes"])
    fake = real[::-1]
    ka, kd = jax.random.key(1), jax.random.key(2)

    def gp_full(p):
        return losses.gradient_penalty(
            lambda x: disc.apply({"params": p}, x, cond, deterministic=False,
                                 rngs={"dropout": kd}), real, fake, ka)

    def gp_hoisted(p):
        cvec = disc.apply({"params": p}, cond, deterministic=False,
                          rngs={"dropout": kd}, method="embed_cond")
        return losses.gradient_penalty(
            lambda x: disc.apply({"params": p}, x, cvec, method="score"),
            real, fake, ka)

    v_full, g_full = jax.value_and_grad(gp_full)(state.d_params)
    v_hoist, g_hoist = jax.value_and_grad(gp_hoisted)(state.d_params)
    assert float(v_full) == float(v_hoist)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        g_full, g_hoist)


def test_critic_methods_compose(tiny_data, make_tiny_cfg):
    """Critic.__call__ == Critic.score(x, Critic.embed_cond(cond))."""
    cfg = make_tiny_cfg("film_cross_attention")
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    batch = next(iter(Batches(tiny_data, batch_size=8, seed=0, shuffle=False)))
    state = eng.init_state(0, batch)
    import jax.numpy as jnp
    cond = {k: jnp.asarray(batch[k]) for k in
            ("tokens", "token_mask", "patches", "patch_mask") if k in batch}
    x = jnp.asarray(batch["genes"])
    p = {"params": state.d_params}
    full = eng.disc.apply(p, x, cond, deterministic=True)
    cvec = eng.disc.apply(p, cond, deterministic=True, method="embed_cond")
    composed = eng.disc.apply(p, x, cvec, method="score")
    np.testing.assert_array_equal(np.asarray(full), np.asarray(composed))
