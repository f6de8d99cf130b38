"""Learning-rate schedules and optimizer factories.

Parity targets: RMSprop lr 5e-4 (default) or Adam(0.9, 0.99) / AdamW(wd=.01),
with LR halved every 50 epochs (/root/reference/src/conditional_gan_concat.py:291-299,605-613;
src/conditional_gan_film.py:300-302), and the VAE's linear-warmup ->
exponential-decay LambdaLR (/root/reference/src/vae/vanilla_vae.py:190-199).
Implemented as optax schedules on the step counter so they live inside the
fused jitted step instead of a host-side loop mutation.
"""

from __future__ import annotations

from typing import Optional

import optax

from gemm_gan_tpu.config import TrainConfig


def halving_schedule(base_lr: float, steps_per_epoch: int, halve_every_epochs: int):
    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * 0.5 ** (epoch // halve_every_epochs)
    return schedule


def warmup_exp_decay(base_lr: float, steps_per_epoch: int, warmup_epochs: int,
                     decay_per_epoch: float):
    def schedule(step):
        epoch = step / max(steps_per_epoch, 1)
        warm = epoch / max(warmup_epochs, 1e-8)
        decay = decay_per_epoch ** (epoch - warmup_epochs)
        import jax.numpy as jnp
        return base_lr * jnp.where(epoch < warmup_epochs, warm, decay)
    return schedule


def make_optimizer(cfg: TrainConfig, lr: float, steps_per_epoch: int,
                   clip_grad: Optional[float] = None) -> optax.GradientTransformation:
    schedule = halving_schedule(lr, steps_per_epoch, cfg.lr_halve_every_epochs)
    if cfg.optimizer == "rmsprop":
        # match torch.optim.RMSprop semantics the reference trains with:
        # alpha=0.99 (optax default decay=0.9 adapts 10x faster and was
        # observed to destabilize the WGAN critic) and eps OUTSIDE the
        # sqrt (optax default puts it inside)
        tx = optax.rmsprop(schedule, decay=0.99, eps=1e-8, eps_in_sqrt=False)
    elif cfg.optimizer == "adam":
        tx = optax.adam(schedule, b1=cfg.adam_b1, b2=cfg.adam_b2)
    elif cfg.optimizer == "adamw":
        tx = optax.adamw(schedule, b1=cfg.adam_b1, b2=cfg.adam_b2,
                         weight_decay=cfg.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if clip_grad is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad), tx)
    return tx
