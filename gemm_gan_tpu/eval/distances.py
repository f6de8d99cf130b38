"""Distribution distances: exact/Sinkhorn Wasserstein, linear/poly/RBF MMD.

Formula parity with /root/reference/src/distribution_distances.py:18-48,
299-527. The reference's exact OT calls POT's C++ network simplex
(`ot.emd2`); here the exact path goes through our own C++ network-simplex
extension (gemm_gan_tpu/native/) with a scipy assignment fallback, and the
Sinkhorn path is a jitted log-domain implementation that runs on device.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

min_var_est = 1e-8


# ---------------------------------------------------------------- transport
def _cdist(x, y):
    x2 = jnp.sum(x * x, axis=1)[:, None]
    y2 = jnp.sum(y * y, axis=1)[None, :]
    sq = jnp.maximum(x2 + y2 - 2.0 * jnp.dot(x, y.T, preferred_element_type=jnp.float32), 0.0)
    return jnp.sqrt(sq)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def sinkhorn_cost(M, a, b, reg: float = 0.05, num_iters: int = 500):
    """Log-domain Sinkhorn transport cost <P, M> (parity target: ot.sinkhorn2)."""
    logK = -M / reg
    loga = jnp.log(a)
    logb = jnp.log(b)
    f = jnp.zeros_like(a)

    def body(_, fg):
        f, g = fg
        g = reg * (logb - jax.scipy.special.logsumexp((logK + f[:, None] / reg), axis=0))
        f = reg * (loga - jax.scipy.special.logsumexp((logK + g[None, :] / reg), axis=1))
        return f, g

    f, g = jax.lax.fori_loop(0, num_iters, body, (f, jnp.zeros_like(b)))
    logP = (f[:, None] + g[None, :] - M) / reg
    P = jnp.exp(logP)
    return jnp.sum(P * M)


def emd2(a: np.ndarray, b: np.ndarray, M: np.ndarray) -> float:
    """Exact optimal-transport cost with uniform-ish marginals.

    Uses the native C++ network simplex when built; otherwise falls back to
    scipy `linear_sum_assignment` when the problem reduces to assignment
    (equal sizes, uniform marginals), else to low-regularization Sinkhorn.
    """
    from gemm_gan_tpu.native import exact_emd2, native_available

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    M = np.asarray(M, np.float64)
    if native_available():
        return exact_emd2(a, b, M)
    n, m = M.shape
    uniform = (np.allclose(a, 1.0 / n) and np.allclose(b, 1.0 / m))
    if n == m and uniform:
        from scipy.optimize import linear_sum_assignment

        r, c = linear_sum_assignment(M)
        return float(M[r, c].mean())
    # last resort: tight-regularization sinkhorn on device
    return float(sinkhorn_cost(jnp.asarray(M), jnp.asarray(a), jnp.asarray(b),
                               reg=1e-3 * float(M.mean()), num_iters=2000))


def wasserstein(x0, x1, method: Optional[str] = None, reg: float = 0.05,
                power: int = 2) -> float:
    """1- or 2-Wasserstein between samples (parity:
    distribution_distances.py:299-346): uniform marginals, L2 cost (squared
    for power=2), sqrt of the cost for power=2.

    The exact path builds the cost matrix on host in float64 via true
    pairwise differences: the Gram-trick ``x²+y²-2xy`` in float32 suffers
    catastrophic cancellation (diag errors up to ~0.2 for x vs x), which
    corrupts the optimum.
    """
    assert power in (1, 2)
    a = np.full(x0.shape[0], 1.0 / x0.shape[0])
    b = np.full(x1.shape[0], 1.0 / x1.shape[0])
    if method == "sinkhorn":
        x0j = jnp.asarray(x0, jnp.float32).reshape(x0.shape[0], -1)
        x1j = jnp.asarray(x1, jnp.float32).reshape(x1.shape[0], -1)
        M = _cdist(x0j, x1j)
        if power == 2:
            M = M ** 2
        ret = float(sinkhorn_cost(M, jnp.asarray(a, jnp.float32),
                                  jnp.asarray(b, jnp.float32), reg=reg))
    else:
        h0 = np.asarray(x0, np.float64).reshape(x0.shape[0], -1)
        h1 = np.asarray(x1, np.float64).reshape(x1.shape[0], -1)
        M = np.sqrt(np.sum((h0[:, None, :] - h1[None, :, :]) ** 2, axis=-1))
        if power == 2:
            M = M ** 2
        ret = emd2(a, b, M)
    return math.sqrt(ret) if power == 2 else ret


# --------------------------------------------------------------------- MMDs
@jax.jit
def linear_mmd2(f_of_X, f_of_Y):
    """Linear-time linear-kernel MMD (parity: distribution_distances.py:360-366)."""
    delta = f_of_X - f_of_Y
    return jnp.mean(jnp.sum(delta[:-1] * delta[1:], axis=1))


@functools.partial(jax.jit, static_argnames=("d",))
def poly_mmd2(f_of_X, f_of_Y, d: int = 2, alpha: float = 1.0, c: float = 2.0):
    """Linear-time polynomial-kernel MMD (parity: :370-384)."""
    def k(u, v):
        return jnp.mean((alpha * jnp.sum(u[:-1] * v[1:], axis=1) + c) ** d)

    return k(f_of_X, f_of_X) + k(f_of_Y, f_of_Y) - k(f_of_X, f_of_Y) - k(f_of_Y, f_of_X)


def _mix_rbf_kernel(X, Y, sigma_list):
    Z = jnp.concatenate([X, Y], axis=0)
    ZZT = jnp.dot(Z, Z.T, preferred_element_type=jnp.float32)
    diag = jnp.diag(ZZT)[:, None]
    exponent = diag - 2.0 * ZZT + diag.T
    K = sum(jnp.exp(-(1.0 / (2.0 * s ** 2)) * exponent) for s in sigma_list)
    m = X.shape[0]
    return K[:m, :m], K[:m, m:], K[m:, m:], len(sigma_list)


def mix_rbf_mmd2(X, Y, sigma_list=(1.0, 2.0, 4.0, 8.0, 16.0), biased: bool = True):
    """Mixture-of-RBF-kernels MMD² (parity: :387-430)."""
    X = jnp.asarray(X, jnp.float32)
    Y = jnp.asarray(Y, jnp.float32)
    K_XX, K_XY, K_YY, _ = _mix_rbf_kernel(X, Y, sigma_list)
    val = float(_mmd2(K_XX, K_XY, K_YY, const_diagonal=False, biased=biased))
    # the biased estimator is >= 0 analytically; clamp fp cancellation noise
    return max(val, 0.0) if biased else val


def _mmd2(K_XX, K_XY, K_YY, const_diagonal=False, biased=False):
    m = K_XX.shape[0]
    if biased:
        return K_XX.mean() + K_YY.mean() - 2.0 * K_XY.mean()
    if const_diagonal is not False:
        diag_X = diag_Y = const_diagonal
        sum_diag_X = sum_diag_Y = m * const_diagonal
    else:
        diag_X = jnp.diag(K_XX)
        diag_Y = jnp.diag(K_YY)
        sum_diag_X = jnp.sum(diag_X)
        sum_diag_Y = jnp.sum(diag_Y)
    return ((jnp.sum(K_XX) - sum_diag_X) / (m * (m - 1))
            + (jnp.sum(K_YY) - sum_diag_Y) / (m * (m - 1))
            - 2.0 * jnp.mean(K_XY))


def mix_rbf_mmd2_and_ratio(X, Y, sigma_list=(1.0, 2.0, 4.0, 8.0, 16.0),
                           biased: bool = True):
    """MMD² and its variance-normalized ratio (parity: :433-527).

    `biased=True` is the reference's default (`mix_rbf_mmd2_and_ratio`,
    :411-415): the biased MMD² estimator over the same variance estimate."""
    X = jnp.asarray(X, jnp.float32)
    Y = jnp.asarray(Y, jnp.float32)
    K_XX, K_XY, K_YY, _ = _mix_rbf_kernel(X, Y, sigma_list)
    mmd2, var_est = _mmd2_and_variance(K_XX, K_XY, K_YY, biased=biased)
    ratio = mmd2 / jnp.sqrt(jnp.maximum(var_est, min_var_est))
    return float(mmd2), float(ratio)


def _mmd2_and_variance(K_XX, K_XY, K_YY, const_diagonal=False, biased=False):
    m = K_XX.shape[0]
    if const_diagonal is not False:
        diag_X = diag_Y = const_diagonal * jnp.ones(m)
    else:
        diag_X = jnp.diag(K_XX)
        diag_Y = jnp.diag(K_YY)
    sum_diag_X = jnp.sum(diag_X)
    sum_diag_Y = jnp.sum(diag_Y)
    sum_diag2_X = jnp.sum(diag_X ** 2)
    sum_diag2_Y = jnp.sum(diag_Y ** 2)

    Kt_XX_sums = jnp.sum(K_XX, axis=1) - diag_X
    Kt_YY_sums = jnp.sum(K_YY, axis=1) - diag_Y
    K_XY_sums_0 = jnp.sum(K_XY, axis=0)
    K_XY_sums_1 = jnp.sum(K_XY, axis=1)

    Kt_XX_sum = jnp.sum(Kt_XX_sums)
    Kt_YY_sum = jnp.sum(Kt_YY_sums)
    K_XY_sum = jnp.sum(K_XY_sums_0)

    Kt_XX_2_sum = jnp.sum(K_XX ** 2) - sum_diag2_X
    Kt_YY_2_sum = jnp.sum(K_YY ** 2) - sum_diag2_Y
    K_XY_2_sum = jnp.sum(K_XY ** 2)

    if biased:
        mmd2 = ((Kt_XX_sum + sum_diag_X) / (m * m)
                + (Kt_YY_sum + sum_diag_Y) / (m * m)
                - 2.0 * K_XY_sum / (m * m))
    else:
        mmd2 = (Kt_XX_sum / (m * (m - 1)) + Kt_YY_sum / (m * (m - 1))
                - 2.0 * K_XY_sum / (m * m))
    var_est = (
        2.0 / (m ** 2 * (m - 1) ** 2)
        * (2 * jnp.sum(Kt_XX_sums ** 2) - Kt_XX_2_sum
           + 2 * jnp.sum(Kt_YY_sums ** 2) - Kt_YY_2_sum)
        - (4.0 * m - 6.0) / (m ** 3 * (m - 1) ** 3) * (Kt_XX_sum ** 2 + Kt_YY_sum ** 2)
        + 4.0 * (m - 2.0) / (m ** 3 * (m - 1) ** 2)
        * (jnp.sum(K_XY_sums_1 ** 2) + jnp.sum(K_XY_sums_0 ** 2))
        - 4.0 * (m - 3.0) / (m ** 3 * (m - 1) ** 2) * K_XY_2_sum
        - (8 * m - 12) / (m ** 5 * (m - 1)) * K_XY_sum ** 2
        + 8.0 / (m ** 3 * (m - 1))
        * (1.0 / m * (Kt_XX_sum + Kt_YY_sum) * K_XY_sum
           - jnp.dot(Kt_XX_sums, K_XY_sums_1)
           - jnp.dot(Kt_YY_sums, K_XY_sums_0))
    )
    return mmd2, var_est


# ------------------------------------------------------------- orchestrator
def compute_distribution_distances(pred, true) -> dict:
    """1-/2-Wasserstein + linear/poly MMD summary (parity: :18-48)."""
    pred = np.asarray(pred, np.float32)
    true = np.asarray(true, np.float32)
    min_size = min(pred.shape[0], true.shape[0])
    w1 = wasserstein(pred, true, power=1)
    w2 = wasserstein(pred, true, power=2)
    mmd_lin = float(linear_mmd2(jnp.asarray(pred[:min_size]), jnp.asarray(true[:min_size])))
    mmd_poly = float(poly_mmd2(jnp.asarray(pred[:min_size]), jnp.asarray(true[:min_size])))
    return {"1-Wasserstein": w1, "2-Wasserstein": w2,
            "Linear_MMD": mmd_lin, "Poly_MMD": mmd_poly}
