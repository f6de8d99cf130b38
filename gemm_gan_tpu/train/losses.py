"""WGAN-GP losses.

Semantics-parity with the reference loss trio
(/root/reference/src/conditional_gan_concat.py:36-50) and gradient penalty
(:319-342): the penalty is the squared deviation of the per-sample gradient
L2-norm from 1, with gradients taken w.r.t. the interpolated *expression
vector only* (conditioning inputs held fixed — matching the reference's
`autograd.grad(outputs, inputs=interpolated)`).

In JAX the double-backward (`create_graph=True` in torch) is simply
`jax.grad` applied to an expression containing an inner `jax.grad`; XLA
compiles the whole thing into the one fused train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wasserstein_loss(y_pred, y_true):
    return jnp.mean(y_pred * y_true)


def g_loss(fake_scores):
    """Generator loss: -E[D(G(z))]."""
    return wasserstein_loss(fake_scores, -jnp.ones_like(fake_scores))


def d_loss(real_scores, fake_scores):
    """Critic loss: E[D(fake)] - E[D(real)] (returned with components)."""
    loss_real = wasserstein_loss(-jnp.ones_like(real_scores), real_scores)
    loss_fake = wasserstein_loss(jnp.ones_like(fake_scores), fake_scores)
    return loss_real + loss_fake, loss_real, loss_fake


def drift_penalty(real_scores, fake_scores):
    """ε-drift regularizer E[D(real)² + D(fake)²] (Progressive GAN §A.1).

    Beyond-reference stabilizer, OFF by default (`train.drift_epsilon=0`):
    WGAN-GP constrains only the score *slope*, so on long-horizon small-data
    runs the critic's absolute score scale drifts unboundedly (measured: the
    reference-semantics torch step drifts superlinearly past |D|~1e4 by 3k
    steps on a 200-sample problem, and both frameworks eventually explode).
    A small ε (1e-3) anchors the scale without touching the W-distance
    gradient direction.
    """
    return jnp.mean(real_scores ** 2) + jnp.mean(fake_scores ** 2)


def gradient_penalty(disc_fn, real, fake, alpha_key, alpha=None):
    """((||∇_x D(x̂)||₂ − 1)²).mean() with x̂ = αx + (1−α)G(z), α~U(0,1) per sample.

    `disc_fn` must map a [B, n_genes] expression batch to [B, 1] scores with
    the critic params and conditioning closed over. Per-sample gradients are
    exact because the critic is per-sample (no batch-coupled norms): grad of
    the summed score w.r.t. the input equals the stacked per-sample grads.

    `alpha` (optional [B, 1]): pre-drawn interpolation coefficients. The
    gradient-accumulation path draws α once at full batch size and passes
    per-microbatch slices so the accumulated step equals the full-batch step
    exactly (train/wgan.py).
    """
    if alpha is None:
        alpha = jax.random.uniform(alpha_key, (real.shape[0], 1),
                                   dtype=real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake
    grads = jax.grad(lambda x: jnp.sum(disc_fn(x)))(interp)
    norms = jnp.sqrt(jnp.sum(grads * grads, axis=1) + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def batched_scores_and_gp(score_fn, real, fake, alpha_key, alpha=None):
    """(D(real), D(fake), gradient penalty) from ONE batched trunk call.

    `score_fn` maps [N, n_genes] -> [N, 1] for any leading N (critic params
    and a row-tiled condition vector closed over). The three critic
    evaluations of a WGAN-GP update — real score, fake score, and the
    penalty's interpolate forward (same α law as `gradient_penalty`) — are
    stacked into one [3B] batch with gradients taken w.r.t. the interp slice
    only. Mathematically identical to the three separate calls (the trunk is
    per-sample and dropout-free; grad of a summed output slice w.r.t. its
    input slice is unaffected by the other rows), but the HBM-bound
    [n_genes, hidden] critic input projection (19.3 MB of weights per
    evaluation at batch 8 — BASELINE.md "thin gene-dim matmuls") is read
    once instead of three times, forward and backward.

    Used by the engine's `cond_embed_reuse="per_update"` production path
    (`train.batched_scores`); the reference-parity per_call path keeps
    separate evaluations (its per-call fusion dropout draws cannot batch).
    """
    B = real.shape[0]
    if alpha is None:
        alpha = jax.random.uniform(alpha_key, (B, 1), dtype=real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake

    def summed_interp_score(x):
        scores = score_fn(jnp.concatenate([real, fake, x], axis=0))
        return jnp.sum(scores[2 * B:]), scores

    grads, scores = jax.grad(summed_interp_score, has_aux=True)(interp)
    norms = jnp.sqrt(jnp.sum(grads * grads, axis=1) + 1e-12)
    gp = jnp.mean((norms - 1.0) ** 2)
    return scores[:B], scores[B:2 * B], gp
