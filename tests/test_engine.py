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


def test_generate_samples_all_callable_batches(tiny_data, make_tiny_cfg):
    """Passing a CALLABLE (fresh iterable per pass) must reproduce the
    list-path output exactly — it is the streaming contract device-resident
    loaders use so the per-call path never materializes a whole epoch of
    gathered conditioning on device (a measured chip OOM at canonical
    width), and under scan it materializes identically to a plain
    iterable."""
    cfg = make_tiny_cfg("benchmark")
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    loader = Batches(tiny_data, batch_size=8, seed=0, shuffle=False)
    state = eng.init_state(0, next(iter(loader)))
    key = jax.random.key(3)
    a = eng.generate_samples_all(state, key, loader.epoch(0), num_repeats=2)
    b = eng.generate_samples_all(state, key, lambda: loader.epoch(0),
                                 num_repeats=2)
    np.testing.assert_array_equal(a["fake"], b["fake"])
    np.testing.assert_array_equal(a["real"], b["real"])
    c = eng.generate_samples_all(state, key, lambda: loader.epoch(0),
                                 num_repeats=2, scan=True)
    np.testing.assert_allclose(a["fake"], c["fake"], atol=1e-5)


def test_generate_samples_all_scan_matches_percall(tiny_data, make_tiny_cfg):
    """scan=True runs the full loader as ONE lax.map program with the
    condition embedding computed once per batch and shared across repeats.
    Both paths draw z from fold_in(fold_in(key, batch), repeat), so the scan
    path must reproduce the per-call samples exactly (incl. the ragged tail
    batch, which scan hands back to the per-call path)."""
    cfg = make_tiny_cfg("film_cross_attention")
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    # batch_size 7 over n=48 -> 6 full batches + a ragged tail of 6
    loader = Batches(tiny_data, batch_size=7, seed=0, shuffle=False,
                     drop_remainder=False)
    state = eng.init_state(0, next(iter(loader.epoch(0))))
    key = jax.random.key(5)
    a = eng.generate_samples_all(state, key, loader.epoch(0), num_repeats=2)
    b = eng.generate_samples_all(state, key, loader.epoch(0), num_repeats=2,
                                 scan=True)
    assert a["fake"].shape == b["fake"].shape == (96, 24)
    np.testing.assert_allclose(a["fake"], b["fake"], atol=1e-5)
    np.testing.assert_array_equal(a["real"], b["real"])
    np.testing.assert_array_equal(a["disease"], b["disease"])
    np.testing.assert_array_equal(a["site"], b["site"])


def test_generate_samples_all_host_dtype(tiny_data, make_tiny_cfg):
    """host_dtype=f16 delivers the same samples as the f32 path cast to f16
    (the cast happens on device, before the wire) on both the per-call and
    scan paths, incl. the ragged tail; real/fake dtypes follow it."""
    cfg = make_tiny_cfg("film_cross_attention")
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    loader = Batches(tiny_data, batch_size=7, seed=0, shuffle=False,
                     drop_remainder=False)
    state = eng.init_state(0, next(iter(loader.epoch(0))))
    key = jax.random.key(5)
    for scan in (False, True):
        # compare against the SAME path in f32: scan and per-call only agree
        # to ~1e-5 in f32, which can straddle an f16 rounding boundary
        full = eng.generate_samples_all(state, key, loader.epoch(0),
                                        num_repeats=2, scan=scan)
        half = eng.generate_samples_all(state, key, loader.epoch(0),
                                        num_repeats=2, scan=scan,
                                        host_dtype=np.float16)
        assert half["fake"].dtype == np.float16
        assert half["real"].dtype == np.float16
        np.testing.assert_array_equal(
            half["fake"], full["fake"].astype(np.float16))
        np.testing.assert_array_equal(
            half["real"], full["real"].astype(np.float16))
        np.testing.assert_array_equal(half["disease"], full["disease"])


def test_generate_samples_all_scan_unconditional(tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg("vanilla")
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    loader = Batches({"genes": tiny_data["genes"]}, batch_size=8, seed=0,
                     shuffle=False)
    state = eng.init_state(0, next(iter(loader.epoch(0))))
    key = jax.random.key(7)
    a = eng.generate_samples_all(state, key, loader.epoch(0), num_repeats=3)
    b = eng.generate_samples_all(state, key, loader.epoch(0), num_repeats=3,
                                 scan=True)
    np.testing.assert_allclose(a["fake"], b["fake"], atol=1e-5)
    np.testing.assert_array_equal(a["real"], b["real"])


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


@pytest.mark.parametrize("variant,reuse", [("vanilla", "per_call"),
                                           ("film", "per_update")])
def test_critic_scan_matches_unrolled(variant, reuse, tiny_data, make_tiny_cfg):
    """`train.critic_scan` rolls the n_critic critic updates into a
    `lax.scan`; same body, same key order, so params and metrics must match
    the unrolled path (tight allclose — scan changes XLA scheduling only)."""
    def run(critic_scan):
        cfg = make_tiny_cfg(variant, train_kw=dict(
            n_critic=2, critic_scan=critic_scan, cond_embed_reuse=reuse))
        eng = WGANGPEngine(cfg, steps_per_epoch=2)
        loader = Batches(tiny_data, batch_size=8, seed=0, shuffle=False)
        batch = next(iter(loader))
        state = eng.init_state(0, batch)
        state, m = eng.step(state, batch)
        return (jax.tree.map(np.asarray, jax.device_get(state.d_params)),
                jax.tree.map(np.asarray, jax.device_get(state.g_params)),
                {k: float(v) for k, v in m.items()})

    d_u, g_u, m_u = run(False)
    d_s, g_s, m_s = run(True)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6,
                                                         atol=1e-7), d_u, d_s)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6,
                                                         atol=1e-7), g_u, g_s)
    for k in m_u:
        np.testing.assert_allclose(m_u[k], m_s[k], rtol=1e-5, err_msg=k)


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


def test_cond_embed_reuse_grads_match_when_no_dropout(tiny_data, make_tiny_cfg):
    """With fusion.dropout == 0, the shared-embedding critic loss of
    cond_embed_reuse='per_update' is the SAME function as the per-call loss
    (each embed is an identical computation), so its parameter gradients
    must match. Tolerance is tight but not bitwise: per_call sums three
    separate fusion VJP contributions where per_update applies one VJP to
    the summed cotangent — equal by VJP linearity, different float
    summation order. (Step-level comparison is deliberately avoided:
    RMSprop's g/sqrt(nu) normalization amplifies that reassociation
    chaotically for near-zero-gradient parameters.)"""
    import jax.numpy as jnp

    from gemm_gan_tpu.train import losses

    cfg = make_tiny_cfg("film_cross_attention", fusion_kw=dict(dropout=0.0))
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    batch = next(iter(Batches(tiny_data, batch_size=8, seed=0, shuffle=False)))
    state = eng.init_state(0, batch)
    disc = eng.disc
    cond = {k: jnp.asarray(batch[k]) for k in
            ("tokens", "token_mask", "patches", "patch_mask") if k in batch}
    real = jnp.asarray(batch["genes"])
    fake = real[::-1]
    ka, kd = jax.random.key(1), jax.random.key(2)

    def critic_loss(p, share):
        if share:
            cvec = disc.apply({"params": p}, cond, deterministic=False,
                              rngs={"dropout": kd}, method="embed_cond")
            d_real = disc.apply({"params": p}, real, cvec, method="score")
            d_fake = disc.apply({"params": p}, fake, cvec, method="score")
        else:
            d_real = disc.apply({"params": p}, real, cond,
                                deterministic=False, rngs={"dropout": kd})
            d_fake = disc.apply({"params": p}, fake, cond,
                                deterministic=False, rngs={"dropout": kd})
            cvec = disc.apply({"params": p}, cond, deterministic=False,
                              rngs={"dropout": kd}, method="embed_cond")
        loss, _, _ = losses.d_loss(d_real, d_fake)
        gp = losses.gradient_penalty(
            lambda x: disc.apply({"params": p}, x, cvec, method="score"),
            real, fake, ka)
        return loss + 10.0 * gp

    v_call, g_call = jax.value_and_grad(critic_loss)(state.d_params, False)
    v_share, g_share = jax.value_and_grad(critic_loss)(state.d_params, True)
    np.testing.assert_allclose(float(v_call), float(v_share), rtol=1e-6)
    scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_call))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6 * scale),
        g_call, g_share)


def test_batched_scores_matches_separate_evaluations(tiny_data, make_tiny_cfg):
    """`train.batched_scores` (one [3B] trunk call for real/fake/interp —
    losses.batched_scores_and_gp) is the same function as the three separate
    per_update evaluations: identical critic loss value and parameter
    gradients up to fp reassociation from the batched matmul."""
    import jax.numpy as jnp

    from gemm_gan_tpu.train import losses

    cfg = make_tiny_cfg("film_cross_attention", fusion_kw=dict(dropout=0.0))
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    batch = next(iter(Batches(tiny_data, batch_size=8, seed=0, shuffle=False)))
    state = eng.init_state(0, batch)
    disc = eng.disc
    cond = {k: jnp.asarray(batch[k]) for k in
            ("tokens", "token_mask", "patches", "patch_mask") if k in batch}
    real = jnp.asarray(batch["genes"])
    fake = real[::-1]
    ka, kd = jax.random.key(1), jax.random.key(2)

    def critic_loss(p, batched):
        cvec = disc.apply({"params": p}, cond, deterministic=False,
                          rngs={"dropout": kd}, method="embed_cond")
        if batched:
            def score_cat(x_cat):
                cv = jnp.concatenate([cvec, cvec, cvec], axis=0)
                return disc.apply({"params": p}, x_cat, cv, method="score")

            d_real, d_fake, gp = losses.batched_scores_and_gp(
                score_cat, real, fake, ka)
        else:
            d_real = disc.apply({"params": p}, real, cvec, method="score")
            d_fake = disc.apply({"params": p}, fake, cvec, method="score")
            gp = losses.gradient_penalty(
                lambda x: disc.apply({"params": p}, x, cvec, method="score"),
                real, fake, ka)
        loss, _, _ = losses.d_loss(d_real, d_fake)
        return loss + 10.0 * gp

    v_sep, g_sep = jax.value_and_grad(critic_loss)(state.d_params, False)
    v_bat, g_bat = jax.value_and_grad(critic_loss)(state.d_params, True)
    np.testing.assert_allclose(float(v_sep), float(v_bat), rtol=1e-6)
    scale = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(g_sep))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6 * scale),
        g_sep, g_bat)


def test_batched_scores_step_trains_vanilla_and_conditional(tiny_data,
                                                            make_tiny_cfg):
    """The engine step with cond_embed_reuse='per_update' (batched_scores
    default True) runs and stays finite for both a conditional variant and
    the unconditional vanilla path (cvec=None row in the batched call)."""
    for variant, keys in (("vanilla", ("genes",)),
                          ("concat_text", None)):
        cfg = make_tiny_cfg(variant,
                            train_kw=dict(cond_embed_reuse="per_update",
                                          hoist_fakes=True))
        assert cfg.train.batched_scores
        eng = WGANGPEngine(cfg, steps_per_epoch=2)
        data = (tiny_data if keys is None
                else {k: tiny_data[k] for k in keys})
        batch = next(iter(Batches(data, batch_size=8, seed=0, shuffle=False)))
        state = eng.init_state(0, batch)
        state, m = eng.step(state, batch)
        assert all(np.isfinite(float(v)) for v in m.values()), (variant, m)


def test_batched_scores_knob_first_update_metrics_match(tiny_data,
                                                        make_tiny_cfg):
    """With n_critic=1 the first critic update's loss terms are pure
    functions of the initial params, so the batched (hoisted fakes + [3B]
    scores) and unbatched per_update paths must agree tightly — no RMSprop
    reassociation amplification in between. Pins that the hoisted generator
    forward draws the SAME z (kz = split(key_i)[0]) as the per-update path."""
    metrics = {}
    for batched in (False, True):
        cfg = make_tiny_cfg("film", fusion_kw=dict(dropout=0.0),
                            train_kw=dict(cond_embed_reuse="per_update",
                                          n_critic=1,
                                          batched_scores=batched,
                                          hoist_fakes=batched))
        eng = WGANGPEngine(cfg, steps_per_epoch=2)
        batch = next(iter(Batches(tiny_data, batch_size=8, seed=0,
                                  shuffle=False)))
        state = eng.init_state(0, batch)
        _, m = eng.step(state, batch)
        metrics[batched] = m
    for k in ("d_loss", "gp", "d_real", "d_fake"):
        np.testing.assert_allclose(float(metrics[False][k]),
                                   float(metrics[True][k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_cond_embed_reuse_with_dropout_trains(tiny_data, make_tiny_cfg):
    """With dropout > 0, per_update is a documented approximation (one
    dropout draw shared within an update): the step must run and stay
    finite; the next step must see fresh draws (different losses)."""
    cfg = make_tiny_cfg("film_cross_attention",
                        train_kw=dict(cond_embed_reuse="per_update"))
    assert cfg.model.fusion.dropout > 0
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    batch = next(iter(Batches(tiny_data, batch_size=8, seed=0, shuffle=False)))
    state = eng.init_state(0, batch)
    state, m1 = eng.step(state, batch)
    state, m2 = eng.step(state, batch)
    assert all(np.isfinite(float(v)) for v in m1.values())
    assert float(m1["g_loss"]) != float(m2["g_loss"])


def test_cond_embed_reuse_rejects_unknown_mode(tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg("vanilla", train_kw=dict(cond_embed_reuse="bogus"))
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    batch = {"genes": tiny_data["genes"][:8]}
    state = eng.init_state(0, batch)
    with pytest.raises(ValueError, match="cond_embed_reuse"):
        eng.step(state, batch)


def test_ema_generator_tracks_params(tiny_data, make_tiny_cfg):
    """train.ema_decay > 0: the state tracks an EMA of the generator params
    (one closed-form step check), and sampling defaults to the EMA decode."""
    cfg = make_tiny_cfg("vanilla", train_kw=dict(ema_decay=0.9))
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    batch = {"genes": tiny_data["genes"][:8]}
    state = eng.init_state(0, batch)
    assert state.g_ema is not None
    g0 = jax.tree.map(np.asarray, jax.device_get(state.g_params))
    jax.tree.map(np.testing.assert_array_equal, g0,
                 jax.tree.map(np.asarray, jax.device_get(state.g_ema)))

    state, _ = eng.step(state, batch)
    g1 = jax.tree.map(np.asarray, jax.device_get(state.g_params))
    want = jax.tree.map(lambda a, b: 0.9 * a + 0.1 * b, g0, g1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        jax.tree.map(np.asarray, jax.device_get(state.g_ema)), want)

    # default sampling decodes with the EMA params; explicit False with raw
    fake_ema = np.asarray(eng.generate_samples(state, jax.random.key(0), batch))
    fake_raw = np.asarray(eng.generate_samples(state, jax.random.key(0), batch,
                                               use_ema=False))
    assert not np.allclose(fake_ema, fake_raw)


def test_ema_off_by_default(tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg("vanilla")
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    batch = {"genes": tiny_data["genes"][:8]}
    state = eng.init_state(0, batch)
    assert state.g_ema is None
    with pytest.raises(ValueError, match="use_ema"):
        eng.generate_samples(state, jax.random.key(0), batch, use_ema=True)


def test_bf16_production_preset_trains_and_keeps_f32_params(
        tiny_data, make_tiny_cfg):
    """The validated production preset (`compute_dtype="bfloat16"`, quality-
    gated at the canonical 18,868-gene width — BASELINE.md "bf16 quality
    gate"): the flagship engine must train with finite moving metrics, keep
    PARAMS in f32 (only compute casts to bf16 — config.py ModelConfig), and
    emit f32 samples."""
    import dataclasses

    import jax.numpy as jnp

    # critic_scan=False on purpose: with the conftest trim defaulting the
    # suite to the scan body, this covers the bf16 casts inside the
    # UNROLLED critic loop — the structure bench.py's production program
    # actually ships (variant_config default critic_scan=False)
    cfg = make_tiny_cfg("film_cross_attention",
                        train_kw=dict(cond_embed_reuse="per_update",
                                      critic_scan=False))
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, compute_dtype="bfloat16"))
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    loader = Batches(tiny_data, batch_size=8, seed=0)
    batch = next(iter(loader))
    state = eng.init_state(0, batch)
    losses = []
    for _ in range(3):
        state, m = eng.step(state, batch)
        assert all(np.isfinite(float(v)) for v in m.values())
        losses.append(float(m["d_loss"]))
    assert len(set(losses)) > 1, f"metrics frozen: {losses}"
    for leaf in jax.tree_util.tree_leaves((state.g_params, state.d_params)):
        assert leaf.dtype == jnp.float32, leaf.dtype
    fake = np.asarray(eng.generate_samples(state, jax.random.key(0), batch))
    assert fake.dtype == np.float32 and fake.shape == (8, 24)
    assert np.isfinite(fake).all()


def test_rejects_batchnorm_and_zero_critic(tiny_data, make_tiny_cfg):
    """use_batchnorm=True must fail FAST with the documented rationale (the
    per-sample GP is incompatible with batch-coupled critic statistics and
    the reference never enables its is_bn option) instead of crashing at
    the first step with a flax collection error; n_critic < 1 must name the
    misconfiguration instead of unpacking None at trace time."""
    import dataclasses

    cfg = make_tiny_cfg("vanilla")
    bn_cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, use_batchnorm=True))
    with pytest.raises(ValueError, match="use_batchnorm"):
        WGANGPEngine(bn_cfg, steps_per_epoch=2)
    for bad in (0, -1):
        zc_cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, n_critic=bad))
        with pytest.raises(ValueError, match="n_critic"):
            WGANGPEngine(zc_cfg, steps_per_epoch=2)
