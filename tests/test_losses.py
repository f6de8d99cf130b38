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
