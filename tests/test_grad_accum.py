"""Gradient accumulation (`train.grad_accum`) — beyond-reference capability.

The accumulated step must equal the full-batch step exactly (fp reduction
order aside) at fusion.dropout == 0: per-sample randomness (z, GP α,
instance noise) is drawn once at full batch size and regrouped into strided
microbatches (train/wgan.py).
"""

import dataclasses

import jax
import numpy as np
import pytest

from gemm_gan_tpu.data.loader import Batches
from gemm_gan_tpu.train.wgan import WGANGPEngine


def _run_steps(cfg, data, keys, n_steps=2, batch_size=8, mesh=None):
    loader = Batches({k: data[k] for k in keys}, batch_size=batch_size,
                     seed=0, shuffle=False)
    eng = WGANGPEngine(cfg, steps_per_epoch=len(loader), mesh=mesh)
    batch = next(iter(loader))
    state = eng.init_state(0, batch)
    metrics = None
    for _ in range(n_steps):
        state, metrics = eng.step(state, batch)
    return jax.device_get(state), {k: float(v) for k, v in metrics.items()}


def _assert_state_close(a, b, rtol=2e-4, atol=1e-5):
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                                rtol=rtol, atol=atol),
        (a.g_params, a.d_params), (b.g_params, b.d_params))


def test_accum_matches_full_batch_vanilla_with_noise(tiny_data, make_tiny_cfg):
    """Even with instance-noise augmentation on: the noise is pre-drawn at
    full batch size, so accumulation changes nothing."""
    base = make_tiny_cfg("vanilla",
                         train_kw=dict(p_aug=0.5, norm_scale=0.3))
    accum = dataclasses.replace(
        base, train=dataclasses.replace(base.train, grad_accum=4))
    s1, m1 = _run_steps(base, tiny_data, ("genes",))
    s2, m2 = _run_steps(accum, tiny_data, ("genes",))
    _assert_state_close(s1, s2)
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=2e-4, atol=1e-5,
                                   err_msg=k)


@pytest.mark.parametrize("variant,keys,train_kw", [
    ("film_cross_attention",
     ("genes", "tokens", "token_mask", "patches", "patch_mask"),
     dict(cond_embed_reuse="per_update", critic_scan=True)),
    ("film_cross_attention",
     ("genes", "tokens", "token_mask", "patches", "patch_mask"),
     dict(cond_embed_reuse="per_call")),
    ("benchmark", ("genes", "disease", "site"), {}),
])
def test_accum_matches_full_batch_conditional(tiny_data, make_tiny_cfg,
                                              variant, keys, train_kw):
    base = make_tiny_cfg(variant, fusion_kw=dict(dropout=0.0),
                         train_kw=train_kw)
    accum = dataclasses.replace(
        base, train=dataclasses.replace(base.train, grad_accum=2))
    s1, m1 = _run_steps(base, tiny_data, keys)
    s2, m2 = _run_steps(accum, tiny_data, keys)
    # params: fp reduction-order differences on near-zero gradients are
    # amplified by RMSprop's g/(sqrt(nu)+eps) normalization (a 1e-13 grad
    # difference becomes ~1e-5 in the update), hence the looser atol here;
    # the pre-optimizer losses below stay tight. atol widened 1e-4 -> 5e-4
    # (2026-08-20): a different host's XLA:CPU codegen shifted reductions
    # enough that 2/32 near-zero g_params elements hit 3.9e-4 after the two
    # RMSprop-amplified steps; losses were still tight — tolerance, not bug.
    _assert_state_close(s1, s2, rtol=1e-3, atol=5e-4)
    # metrics rtol 2e-4 -> 5e-4 (2026-08-20, same host/codegen shift as
    # above): the second step's d_real is computed from the slightly-
    # diverged post-step-1 params, so it inherits the params' amplified
    # noise — observed 2.6e-4 relative on one scalar, losses structurally
    # identical. Tolerance, not bug.
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=5e-4, atol=1e-5,
                                   err_msg=k)


def test_accum_rejects_indivisible_batch(tiny_data, make_tiny_cfg):
    cfg = make_tiny_cfg("vanilla")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum=3))
    with pytest.raises(ValueError, match="not divisible"):
        _run_steps(cfg, tiny_data, ("genes",), n_steps=1, batch_size=8)


def test_accum_on_data_parallel_mesh(tiny_data, make_tiny_cfg):
    """Strided microbatches keep every device busy on a dp mesh: the
    accumulated sharded step matches the unsharded accumulated step."""
    from gemm_gan_tpu.parallel.mesh import make_mesh

    cfg = make_tiny_cfg("vanilla", fusion_kw=dict(dropout=0.0))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum=2))
    s1, m1 = _run_steps(cfg, tiny_data, ("genes",))
    s2, m2 = _run_steps(cfg, tiny_data, ("genes",),
                        mesh=make_mesh(data=4, model=1,
                                       devices=jax.devices()[:4]))
    _assert_state_close(s1, s2, rtol=5e-4, atol=1e-5)
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=5e-4, atol=1e-5,
                                   err_msg=k)


def test_generator_output_f32_under_bf16_compute(make_tiny_cfg):
    """Pins the invariant the accumulated instance-noise draws rely on:
    the trunk's output Dense is float32 even under bf16 compute
    (ops/mlp.py), so fake.dtype == real.dtype == f32 and the accum path's
    `normal(kn1, real.shape, real.dtype)` matches the direct path's
    `normal(kn1, fake.shape, fake.dtype)` bit-for-bit (train/wgan.py)."""
    import dataclasses

    from gemm_gan_tpu.models.gan import Generator

    cfg = make_tiny_cfg("vanilla")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
    gen = Generator(cfg.model)
    z = np.zeros((2, cfg.model.latent_dim), dtype=np.float32)
    params = gen.init({"params": jax.random.key(0)}, z, None,
                      deterministic=True)
    out = gen.apply(params, z, None, deterministic=True)
    assert out.dtype == np.float32, out.dtype
