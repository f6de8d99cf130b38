"""Fusion module semantics: shapes, mask invariance, FiLM clamping
(reference architectures: SURVEY.md §2.3 table)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_gan_tpu.config import FusionConfig
from gemm_gan_tpu.fusion.modules import build_fusion, cond_dim_of

KINDS = ["concat", "attention", "img_transformer", "film", "xattn",
         "film_xattn", "labels"]


def _cfg(kind, condition_type="text"):
    return FusionConfig(kind=kind, condition_type=condition_type, cond_dim=16,
                        text_dim=12, patch_dim=16, num_heads=2, ff_dim=32,
                        num_layers=1, n_disease_types=3, n_primary_sites=2,
                        use_pallas=False)


def _cond(tiny_data, n=6):
    return {k: jnp.asarray(v[:n]) for k, v in tiny_data.items() if k != "genes"}


@pytest.mark.parametrize("kind", KINDS)
def test_output_shape(kind, tiny_data):
    cfg = _cfg(kind)
    mod = build_fusion(cfg)
    cond = _cond(tiny_data)
    params = mod.init(jax.random.key(0), cond, deterministic=True)
    out = mod.apply(params, cond, deterministic=True)
    assert out.shape == (6, cond_dim_of(cfg))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("kind", ["attention", "img_transformer", "film",
                                  "xattn", "film_xattn"])
def test_padded_patches_do_not_affect_output(kind, tiny_data):
    """Changing values at masked patch positions must not change the condition."""
    cfg = _cfg(kind)
    mod = build_fusion(cfg)
    cond = {k: np.asarray(v[:6]).copy() for k, v in tiny_data.items() if k != "genes"}
    params = mod.init(jax.random.key(0), {k: jnp.asarray(v) for k, v in cond.items()},
                      deterministic=True)
    out1 = mod.apply(params, {k: jnp.asarray(v) for k, v in cond.items()},
                     deterministic=True)
    mask = cond["patch_mask"]
    assert (~mask).any(), "fixture must contain padded patches"
    cond2 = dict(cond)
    cond2["patches"] = cond["patches"] + 1e3 * (~mask[:, :, None])
    out2 = mod.apply(params, {k: jnp.asarray(v) for k, v in cond2.items()},
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_concat_image_uses_masked_mean(tiny_data):
    cfg = _cfg("concat", condition_type="image")
    mod = build_fusion(cfg)
    cond = _cond(tiny_data)
    params = mod.init(jax.random.key(0), cond, deterministic=True)
    out1 = mod.apply(params, cond, deterministic=True)
    cond2 = dict(cond)
    cond2["patches"] = cond["patches"] + 1e3 * (~cond["patch_mask"][:, :, None])
    out2 = mod.apply(params, cond2, deterministic=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-3)


def test_film_beta_clamp():
    from gemm_gan_tpu.ops.film import FiLM

    film = FiLM(feature_dim=8, beta_clamp=5.0)
    text = jnp.asarray(np.random.RandomState(0).randn(4, 6) * 100)  # huge input
    patches = jnp.zeros((4, 3, 8))
    params = film.init(jax.random.key(0), text, patches)
    out = film.apply(params, text, patches)
    # patches are 0 => output = beta, which must be clamped
    assert float(jnp.abs(out).max()) <= 5.0 + 1e-6


def test_token_mask_respected(tiny_data):
    cfg = _cfg("xattn")
    mod = build_fusion(cfg)
    cond = {k: np.asarray(v[:6]).copy() for k, v in tiny_data.items() if k != "genes"}
    params = mod.init(jax.random.key(0), {k: jnp.asarray(v) for k, v in cond.items()},
                      deterministic=True)
    out1 = mod.apply(params, {k: jnp.asarray(v) for k, v in cond.items()},
                     deterministic=True)
    tm = cond["token_mask"]
    assert (~tm).any()
    cond2 = dict(cond)
    # masked tokens are only KV in the text2patch attention; perturbing them
    # must not change the output
    cond2["tokens"] = cond["tokens"] + 1e3 * (~tm[:, :, None])
    # note: tokens[:, 0] (CLS) is always valid in the fixture
    out2 = mod.apply(params, {k: jnp.asarray(v) for k, v in cond2.items()},
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_remat_layers_step_matches(tiny_data, make_tiny_cfg):
    """remat_layers trades recompute for memory only — the fused step's
    metrics must be identical to the non-remat configuration."""
    import dataclasses

    import numpy as np

    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    batch = next(iter(Batches(tiny_data, batch_size=8, seed=0, shuffle=False)))

    def run(remat):
        cfg = make_tiny_cfg("film")
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, fusion=dataclasses.replace(
                    cfg.model.fusion, remat_layers=remat)))
        eng = WGANGPEngine(cfg, steps_per_epoch=2)
        s = eng.init_state(0, batch)
        _, m = eng.step(s, batch)
        return m

    m0, m1 = run(False), run(True)
    for k in m0:
        np.testing.assert_allclose(float(m0[k]), float(m1[k]), rtol=1e-5,
                                   atol=1e-6, err_msg=k)
