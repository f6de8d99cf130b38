"""Pallas flash-attention kernel vs jnp reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_gan_tpu.kernels import flash_attention as fa


def _rand_qkv(rng, B=2, H=2, Lq=16, Lk=24, D=8):
    q = jnp.asarray(rng.randn(B, H, Lq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, Lk, D).astype(np.float32))
    lens = rng.randint(1, Lk + 1, B)
    mask = jnp.asarray(np.arange(Lk)[None, :] < lens[:, None])
    return q, k, v, mask


def test_reference_masks_keys(rng):
    q, k, v, mask = _rand_qkv(rng)
    out1 = fa.mha_reference(q, k, v, mask)
    k2 = jnp.where(mask[:, None, :, None], k, 1e3)
    v2 = jnp.where(mask[:, None, :, None], v, -1e3)
    out2 = fa.mha_reference(q, k2, v2, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_reference_matches_softmax(rng):
    q, k, v, _ = _rand_qkv(rng, Lk=8)
    out = fa.mha_reference(q, k, v, None)
    logits = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(8)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", w, np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("Lq,Lk", [(16, 24), (128, 128), (130, 260),
                                   (136, 600)])
def test_flash_kernel_matches_reference_interpret(rng, Lq, Lk, monkeypatch):
    """Run the Pallas kernel in interpreter mode (no TPU in CI) and compare."""
    monkeypatch.setattr(fa, "_INTERPRET", True)
    q, k, v, mask = _rand_qkv(rng, Lq=Lq, Lk=Lk)
    want = fa.mha_reference(q, k, v, mask)
    got = fa.flash_mha(q, k, v, mask, scale=None, block_q=64, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("Lq,Lk", [(16, 24), (130, 260), (136, 600)])
def test_flash_backward_matches_reference_interpret(rng, Lq, Lk, monkeypatch):
    """Custom-VJP flash gradients (dq, dk, dv) vs autodiff of the reference."""
    monkeypatch.setattr(fa, "_INTERPRET", True)
    q, k, v, mask = _rand_qkv(rng, Lq=Lq, Lk=Lk)
    cot = jnp.asarray(np.random.RandomState(7).randn(*q.shape[:2], Lq,
                                                     q.shape[-1]).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_mha(q, k, v, mask, block_q=64, block_k=128) * cot)

    def loss_ref(q, k, v):
        return jnp.sum(fa.mha_reference(q, k, v, mask) * cot)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-4, atol=5e-5, err_msg=f"d{name}")


def test_masked_mha_dispatches_small_query_to_reference(rng):
    """CLS-style (Lq=1) queries must use the jnp path even with use_pallas."""
    q, k, v, mask = _rand_qkv(rng, Lq=1, Lk=24)
    out = fa.masked_mha(q, k, v, mask, use_pallas=True)
    want = fa.mha_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_fully_masked_rows_are_zero(rng):
    q, k, v, _ = _rand_qkv(rng, B=1, Lk=8)
    mask = jnp.zeros((1, 8), dtype=bool)
    out = fa.mha_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_training_step_with_pallas_matches_reference(monkeypatch):
    """Full fused WGAN-GP step with the Pallas attention kernels enabled
    (interpret mode, patch length >= MIN_PALLAS_LQ) must match the jnp
    reference path. The kernels carry ALL attention terms, including inside
    the gradient-penalty region: the engine embeds the condition outside the
    GP's inner grad, so first-order custom VJPs suffice end to end."""
    import dataclasses

    import gemm_gan_tpu as gg
    from gemm_gan_tpu.data import synthetic_dataset
    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    def cfg_with(use_pallas, critic_scan):
        cfg = gg.variant_config(
            "film_cross_attention", n_genes=24,
            fusion_kw=dict(cond_dim=16, text_dim=8, patch_dim=8, ff_dim=32,
                           num_heads=2, num_layers=1, dropout=0.0,
                           use_pallas=use_pallas))
        return dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, gen_dims=(16, 16),
                                      disc_dims=(16, 16), latent_dim=8),
            # n_critic=2: this was the cold suite's single biggest compile
            # sink (97.7 s — TWO full fused-step programs at n_critic=5
            # plus interpret-mode pallas execution of every critic
            # iteration); the pallas-vs-jnp equivalence asserted here is
            # per-attention-call and does not depend on the critic count.
            # The PALLAS engine keeps critic_scan=False on purpose: with
            # the conftest trim defaulting every other test to the scan
            # body, this is the suite's coverage of pallas custom-VJP
            # calls inside the UNROLLED Python critic loop — the library
            # default. The jnp REFERENCE engine uses the scan body (half
            # the compile): scan-vs-unrolled is numerically identical —
            # same ops, same key order — and pinned by its own test
            # (test_engine.py::test_critic_scan_matches_unrolled), so the
            # comparison is transitively against the unrolled reference.
            train=dataclasses.replace(cfg.train, n_critic=2,
                                      critic_scan=critic_scan))

    data = synthetic_dataset(n=8, n_genes=24, num_patches=fa.MIN_PALLAS_LQ,
                             patch_dim=8, num_tokens=4, text_dim=8, seed=0)
    batch = next(iter(Batches(data, batch_size=8, seed=0, shuffle=False)))

    eng_ref = WGANGPEngine(cfg_with(False, critic_scan=True),
                           steps_per_epoch=2)
    s_ref = eng_ref.init_state(0, batch)
    s_ref, m_ref = eng_ref.step(s_ref, batch)

    monkeypatch.setattr(fa, "_INTERPRET", True)
    eng_pal = WGANGPEngine(cfg_with(True, critic_scan=False),
                           steps_per_epoch=2)
    s_pal = eng_pal.init_state(0, batch)
    s_pal, m_pal = eng_pal.step(s_pal, batch)

    for k in m_ref:
        np.testing.assert_allclose(float(m_ref[k]), float(m_pal[k]),
                                   rtol=2e-3, atol=2e-4, err_msg=k)


def test_disable_pallas_context(monkeypatch):
    """Inside disable_pallas() the dispatcher must take the jnp reference
    even when Pallas is configured and the shape qualifies."""
    calls = []
    monkeypatch.setattr(fa, "_INTERPRET", True)
    real_flash = fa.flash_mha
    monkeypatch.setattr(fa, "flash_mha",
                        lambda *a, **k: (calls.append(1), real_flash(*a, **k))[1])
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 2, fa.MIN_PALLAS_LQ, 8).astype(np.float32))
    fa.masked_mha(q, q, q, None, use_pallas=True)
    assert calls, "pallas path should be taken outside the context"
    calls.clear()
    with fa.disable_pallas():
        fa.masked_mha(q, q, q, None, use_pallas=True)
    assert not calls, "pallas path must be disabled inside the context"


def test_blocked_reference_matches_full(rng):
    """Blocked (lax.map over query blocks) reference == full reference,
    including first- and second-order gradients (the GP path contract)."""
    q = jnp.asarray(rng.randn(2, 2, 200, 8).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 2, 48, 8).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 2, 48, 8).astype(np.float32))
    mask = jnp.asarray(np.arange(48)[None, :] < np.array([30, 48])[:, None])
    full = fa.mha_reference(q, k, v, mask)
    blocked = fa.mha_reference_blocked(q, k, v, mask, block_q=64)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(full),
                               rtol=1e-5, atol=1e-6)

    def loss_full(q):
        return jnp.sum(fa.mha_reference(q, k, v, mask) ** 2)

    def loss_blocked(q):
        return jnp.sum(fa.mha_reference_blocked(q, k, v, mask, block_q=64) ** 2)

    g1, g2 = jax.grad(loss_full)(q), jax.grad(loss_blocked)(q)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-4,
                               atol=1e-5)
    # second order: grad of gradient-norm, the exact GP composition
    def gp_like(f):
        def inner(q):
            g = jax.grad(lambda x: jnp.sum(f(x)))(q)
            return jnp.sum(jnp.sqrt(jnp.sum(g ** 2) + 1e-8))
        return jax.grad(inner)(q)

    h1 = gp_like(lambda x: fa.mha_reference(x, k, v, mask))
    h2 = gp_like(lambda x: fa.mha_reference_blocked(x, k, v, mask, block_q=64))
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1), rtol=1e-4,
                               atol=1e-5)


def test_masked_mha_long_sequence_dispatches_blocked(rng, monkeypatch):
    """Above BLOCKED_REF_MIN_LK without Pallas the dispatcher must use the
    blocked reference (and produce the same values)."""
    monkeypatch.setattr(fa, "BLOCKED_REF_MIN_LK", 64)
    calls = []
    real_blocked = fa.mha_reference_blocked
    monkeypatch.setattr(fa, "mha_reference_blocked",
                        lambda *a, **k: (calls.append(1), real_blocked(*a, **k))[1])
    q = jnp.asarray(rng.randn(1, 2, 96, 8).astype(np.float32))
    out = fa.masked_mha(q, q, q, None, use_pallas=False)
    assert calls
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(fa.mha_reference(q, q, q, None)),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("Lq,Lk", [(130, 260)])
def test_flash_mxu_bf16_close_to_f32(rng, Lq, Lk, monkeypatch):
    """mxu_bf16=True quantizes MXU operands to bf16 (f32 softmax/accum):
    forward and gradients must match the f32 kernel within bf16 input
    quantization error."""
    monkeypatch.setattr(fa, "_INTERPRET", True)
    q, k, v, mask = _rand_qkv(rng, Lq=Lq, Lk=Lk)
    out32 = fa.flash_mha(q, k, v, mask, block_q=64, block_k=128)
    out16 = fa.flash_mha(q, k, v, mask, block_q=64, block_k=128,
                         mxu_bf16=True)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=2e-2, atol=2e-2)

    def loss(f16):
        def f(q, k, v):
            return jnp.sum(fa.flash_mha(q, k, v, mask, block_q=64,
                                        block_k=128, mxu_bf16=f16) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    g32, g16 = loss(False), loss(True)
    for a, b, name in zip(g16, g32, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-2, err_msg=f"d{name}")


def _to_ble(x):
    B, H, L, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * D)


def _from_ble(x, H):
    B, L, E = x.shape
    return x.reshape(B, L, H, E // H).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("Lq,Lk", [(136, 24), (128, 128), (136, 300),
                                   (257, 257)])
def test_flash_ble_matches_classic(rng, Lq, Lk, monkeypatch):
    """The E-layout kernel runs the SAME per-head dots and masked softmax as
    the classic single-block path (ble exists purely to kill the transpose
    copies around the custom call). When the classic path needs no k
    padding (Lk a 128-multiple), outputs are bit-identical; otherwise the
    classic kernel contracts over a zero-padded width (`_prep` rounds Lk up
    to 128) and reduction order differs by a few ulps — assert tight
    allclose plus agreement with the jnp reference."""
    monkeypatch.setattr(fa, "_INTERPRET", True)
    q, k, v, mask = _rand_qkv(rng, Lq=Lq, Lk=Lk)
    H = q.shape[1]
    want = fa.flash_mha(q, k, v, mask)  # default blocks -> single-pass k
    got = _from_ble(fa.flash_mha_ble(_to_ble(q), _to_ble(k), _to_ble(v),
                                     mask, num_heads=H), H)
    if Lk % 128 == 0 and Lq % 8 == 0:
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-6)
    ref = fa.mha_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("Lq,Lk", [(136, 24), (257, 257)])
def test_flash_ble_backward_matches_classic(rng, Lq, Lk, monkeypatch):
    monkeypatch.setattr(fa, "_INTERPRET", True)
    q, k, v, mask = _rand_qkv(rng, Lq=Lq, Lk=Lk)
    H = q.shape[1]
    cot = jnp.asarray(np.random.RandomState(7).randn(
        *q.shape[:2], Lq, q.shape[-1]).astype(np.float32))

    def loss_classic(q, k, v):
        return jnp.sum(fa.flash_mha(q, k, v, mask) * cot)

    def loss_ble(q, k, v):
        out = fa.flash_mha_ble(_to_ble(q), _to_ble(k), _to_ble(v), mask,
                               num_heads=H)
        return jnp.sum(_from_ble(out, H) * cot)

    g_a = jax.grad(loss_classic, argnums=(0, 1, 2))(q, k, v)
    g_b = jax.grad(loss_ble, argnums=(0, 1, 2))(q, k, v)
    # few-ulp reduction-order slack: the classic bwd contracts over the
    # 128-padded k width (see test_flash_ble_matches_classic)
    for ga, gb, name in zip(g_a, g_b, "qkv"):
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=2e-5, atol=2e-6, err_msg=f"d{name}")


def test_masked_mha_ble_fallback_paths(rng, monkeypatch):
    """ble through the non-kernel dispatches: tiny query (jnp reference) and
    beyond-BLE_MAX_L (classic blocked kernels) — same numbers either way."""
    monkeypatch.setattr(fa, "_INTERPRET", True)
    for Lq, Lk in [(4, 24), (136, fa.BLE_MAX_L + 72)]:
        q, k, v, mask = _rand_qkv(rng, Lq=Lq, Lk=Lk)
        H = q.shape[1]
        want = fa.masked_mha(q, k, v, mask, use_pallas=True)
        got = fa.masked_mha(_to_ble(q), _to_ble(k), _to_ble(v), mask,
                            use_pallas=True, layout="ble", num_heads=H)
        np.testing.assert_allclose(np.asarray(_from_ble(got, H)),
                                   np.asarray(want), rtol=1e-5, atol=1e-6,
                                   err_msg=f"Lq={Lq},Lk={Lk}")


def test_masked_mha_ble_requires_num_heads(rng):
    q, k, v, mask = _rand_qkv(rng)
    with pytest.raises(ValueError, match="num_heads"):
        fa.masked_mha(_to_ble(q), _to_ble(k), _to_ble(v), mask, layout="ble")


def test_fully_masked_rows_zero_ble(rng, monkeypatch):
    monkeypatch.setattr(fa, "_INTERPRET", True)
    q, k, v, _ = _rand_qkv(rng, Lq=136, Lk=40)
    H = q.shape[1]
    mask = jnp.zeros((q.shape[0], 40), bool).at[1].set(True)
    out = fa.flash_mha_ble(_to_ble(q), _to_ble(k), _to_ble(v), mask,
                           num_heads=H)
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    assert bool(jnp.isfinite(out).all())


def test_classic_dispatch_without_pltpu_uses_reference(monkeypatch, rng):
    """On builds where the pallas TPU import fails (fa.pltpu is None), the
    classic-layout kernels cannot run even in interpret mode — their
    scratch specs are pltpu-typed. The dispatch must route straight to the
    reference path with NO fallback warning (an accidental TypeError->warn
    fallback would silently turn every kernel test into a reference test),
    and a direct flash_mha call must raise the clear RuntimeError."""
    import warnings

    monkeypatch.setattr(fa, "_INTERPRET", True)
    monkeypatch.setattr(fa, "pltpu", None)
    q = jnp.asarray(rng.randn(1, 2, fa.MIN_PALLAS_LQ, 8).astype(np.float32))
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # no fallback warning
        out = fa.masked_mha(q, q, q, None, use_pallas=True)
    ref = fa.mha_reference(q, q, q, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(RuntimeError, match="classic-layout"):
        fa.flash_mha(q, q, q)
