"""WGAN-GP loss goldens, incl. analytic gradient-penalty cases
(reference formulas: /root/reference/src/conditional_gan_concat.py:36-50,319-342)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gemm_gan_tpu.train.losses import d_loss, g_loss, gradient_penalty, wasserstein_loss


def test_wasserstein_loss():
    y_pred = jnp.array([[1.0], [2.0], [3.0]])
    y_true = jnp.array([[-1.0], [-1.0], [-1.0]])
    assert float(wasserstein_loss(y_pred, y_true)) == pytest.approx(-2.0)


def test_g_loss_is_negative_mean_score():
    scores = jnp.array([[2.0], [4.0]])
    assert float(g_loss(scores)) == pytest.approx(-3.0)


def test_d_loss_components():
    real = jnp.array([[3.0], [5.0]])
    fake = jnp.array([[1.0], [1.0]])
    total, lr_, lf_ = d_loss(real, fake)
    assert float(lr_) == pytest.approx(-4.0)
    assert float(lf_) == pytest.approx(1.0)
    assert float(total) == pytest.approx(-3.0)


def test_gp_linear_critic_analytic(rng):
    """For D(x) = w·x the input-gradient is w everywhere, so
    gp = (||w|| - 1)^2 independent of the interpolation points."""
    w = jnp.asarray(rng.randn(6).astype(np.float32))
    real = jnp.asarray(rng.randn(8, 6).astype(np.float32))
    fake = jnp.asarray(rng.randn(8, 6).astype(np.float32))
    gp = gradient_penalty(lambda x: x @ w[:, None], real, fake, jax.random.key(0))
    want = (float(jnp.linalg.norm(w)) - 1.0) ** 2
    assert float(gp) == pytest.approx(want, rel=1e-5)


def test_gp_unit_norm_critic_is_zero(rng):
    w = jnp.zeros((5,)).at[0].set(1.0)  # ||w|| = 1
    real = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    fake = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    gp = gradient_penalty(lambda x: x @ w[:, None], real, fake, jax.random.key(1))
    assert float(gp) == pytest.approx(0.0, abs=1e-10)


def test_gp_differentiable_wrt_params(rng):
    """grad-of-grad: the penalty must backprop to critic params
    (torch create_graph=True semantics)."""
    real = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    fake = jnp.asarray(rng.randn(4, 5).astype(np.float32))

    def loss(w):
        return gradient_penalty(lambda x: jnp.tanh(x @ w).sum(axis=1, keepdims=True),
                                real, fake, jax.random.key(2))

    w = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_rmsprop_matches_torch_semantics():
    """The reference trains with torch.optim.RMSprop (alpha=0.99, eps outside
    the sqrt). The optax defaults (decay=0.9, eps inside) adapt 10x faster
    and destabilized the WGAN critic; pin the trajectory to torch's."""
    import jax.numpy as jnp
    import torch

    from gemm_gan_tpu.config import TrainConfig
    from gemm_gan_tpu.train.schedules import make_optimizer

    cfg = TrainConfig(optimizer="rmsprop", lr_halve_every_epochs=10**9)
    tx = make_optimizer(cfg, lr=5e-4, steps_per_epoch=1)
    rng = np.random.RandomState(0)
    grads = rng.randn(50, 7).astype(np.float32)

    p_jax = jnp.zeros(7)
    state = tx.init(p_jax)
    p_torch = torch.zeros(7, requires_grad=True)
    opt = torch.optim.RMSprop([p_torch], lr=5e-4)

    import optax

    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, p_jax)
        p_jax = optax.apply_updates(p_jax, updates)
        p_torch.grad = torch.from_numpy(g.copy())
        opt.step()
    np.testing.assert_allclose(np.asarray(p_jax), p_torch.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_drift_penalty_value_and_wiring():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from gemm_gan_tpu.train.losses import drift_penalty

    r = jnp.asarray([1.0, -2.0])
    f = jnp.asarray([3.0, 0.0])
    np.testing.assert_allclose(float(drift_penalty(r, f)), 2.5 + 4.5)

    # wiring: with a large epsilon the critic is pulled toward zero scores,
    # so |d_real|+|d_fake| after a few steps is smaller than without it
    import gemm_gan_tpu as gg
    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.data.synthetic import synthetic_dataset
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    data = {"genes": synthetic_dataset(n=32, n_genes=24)["genes"]}
    batch = next(iter(Batches(data, batch_size=16, seed=0, shuffle=False)))

    def scale_after(eps):
        cfg = gg.variant_config("vanilla", n_genes=24)
        # n_critic=2 + critic_scan purely for compile time (conftest trim
        # rationale); the drift-anchor direction holds at any critic count
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, drift_epsilon=eps,
                                           n_critic=2, critic_scan=True))
        eng = WGANGPEngine(cfg, steps_per_epoch=2)
        s = eng.init_state(0, batch)
        m = None
        for _ in range(30):
            s, m = eng.step(s, batch)
        return abs(float(m["d_real"])) + abs(float(m["d_fake"]))

    assert scale_after(1.0) < scale_after(0.0)
