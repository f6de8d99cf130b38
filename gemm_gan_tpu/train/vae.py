"""VAE / CVAE training engine.

Capability parity with the reference's functional train loop and trainer
classes (/root/reference/src/vae/training.py:12-69, src/vae/vanilla_vae.py,
src/vae/cvae.py): β-ELBO objective (MSE or Gaussian-NLL reconstruction +
analytic KL), Adam with linear-warmup→exponential-decay schedule, global
grad-norm clip 10, decode-from-prior sampling. One jitted step; the CVAE
conditions on the two categorical labels.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gemm_gan_tpu.config import ExperimentConfig
from gemm_gan_tpu.models.vae import CVAE, VAE, elbo_loss
from gemm_gan_tpu.train.schedules import warmup_exp_decay
from gemm_gan_tpu.train.state import VAETrainState


class VAEEngine:
    def __init__(self, cfg: ExperimentConfig, steps_per_epoch: int = 1,
                 conditional: Optional[bool] = None):
        self.cfg = cfg
        self.conditional = (cfg.variant == "cvae") if conditional is None else conditional
        self.model = CVAE(cfg.model) if self.conditional else VAE(cfg.model)
        t = cfg.train
        schedule = warmup_exp_decay(t.vae_lr, steps_per_epoch, t.vae_warmup_epochs,
                                    t.vae_lr_decay)
        self.tx = optax.chain(optax.clip_by_global_norm(t.vae_clip_grad),
                              optax.adam(schedule))
        self._step = None
        self._step_many = None
        self._sample = None
        self._eval_loss = None

    def init_state(self, seed: int, sample_batch: Dict[str, Any]) -> VAETrainState:
        key = jax.random.key(seed)
        kinit, krng, krun = jax.random.split(key, 3)
        x = jnp.asarray(sample_batch["genes"])
        if self.conditional:
            params = self.model.init(kinit, x, jnp.asarray(sample_batch["disease"]),
                                     jnp.asarray(sample_batch["site"]), krng)["params"]
        else:
            params = self.model.init(kinit, x, krng)["params"]
        return VAETrainState.create(params, self.tx.init(params), krun)

    def _build_step(self):
        model, tx = self.model, self.tx
        beta = self.cfg.train.vae_beta
        recon = self.cfg.model.vae_recon
        conditional = self.conditional

        def step(state: VAETrainState, batch):
            key = jax.random.fold_in(state.key, state.step)
            x = batch["genes"]

            def loss_fn(params):
                if conditional:
                    out, mu, logvar = model.apply({"params": params}, x,
                                                  batch["disease"], batch["site"], key)
                else:
                    out, mu, logvar = model.apply({"params": params}, x, key)
                loss, (r, kl) = elbo_loss(x, out, mu, logvar, beta, recon)
                return loss, (r, kl)

            (loss, (r, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state),
                    {"loss": loss, "recon": r, "kl": kl})

        return step

    def step(self, state, batch):
        if self._step is None:
            self._step = jax.jit(self._build_step(), donate_argnums=(0,))
        return self._step(state, {k: jnp.asarray(v) for k, v in batch.items()})

    def step_many(self, state, stacked):
        """K steps scanned in one device program (see WGANGPEngine.step_many)."""
        if self._step_many is None:
            inner = self._build_step()

            def many(state, stacked):
                state, ms = jax.lax.scan(inner, state, stacked)
                return state, jax.tree.map(lambda m: m[-1], ms)

            self._step_many = jax.jit(many, donate_argnums=(0,))
        return self._step_many(state, {k: jnp.asarray(v)
                                       for k, v in stacked.items()})

    def fit(self, state, epochs: int, batches_fn: Callable[[], Iterable] = None,
            logger=None, stacked_fn: Callable = None,
            on_epoch_end: Callable = None, start_epoch: int = 0):
        """`start_epoch`/`on_epoch_end` mirror `WGANGPEngine.fit`: epochs
        [start_epoch, epochs) train from a (restored) state, with the epoch
        callback available for periodic checkpointing."""
        if batches_fn is None and stacked_fn is None:
            raise ValueError("fit() needs batches_fn or stacked_fn")
        history = {"loss": [], "recon": [], "kl": []}
        for epoch in range(start_epoch, epochs):
            last = None
            if stacked_fn is not None:
                state, last = self.step_many(state, stacked_fn(epoch))
            else:
                for batch in batches_fn():
                    state, last = self.step(state, batch)
            if last is not None:
                for k in history:
                    history[k].append(float(last[k]))
                if logger is not None:
                    logger.log(int(jax.device_get(state.step)), **last)
            if on_epoch_end is not None:
                # same contract as WGANGPEngine.fit: a non-None return
                # becomes the new state
                maybe = on_epoch_end(self, state, epoch)
                if maybe is not None:
                    state = maybe
        self.history = history
        return state

    def eval_loss(self, state, key, batch) -> Dict[str, float]:
        """β-ELBO of one batch WITHOUT a gradient/update — the validation
        criterion for gate-best checkpoint selection (VERDICT r4 #6). Same
        loss the training step optimizes (reference objective
        /root/reference/src/vae/cvae.py:330-346); the reparameterization
        noise comes from the caller's `key` so a validation pass is
        deterministic given (state, key)."""
        if getattr(self, "_eval_loss", None) is None:
            model = self.model
            beta = self.cfg.train.vae_beta
            recon = self.cfg.model.vae_recon
            conditional = self.conditional

            @jax.jit
            def fn(params, key, batch):
                x = batch["genes"]
                if conditional:
                    out, mu, logvar = model.apply(
                        {"params": params}, x, batch["disease"], batch["site"],
                        key)
                else:
                    out, mu, logvar = model.apply({"params": params}, x, key)
                loss, (r, kl) = elbo_loss(x, out, mu, logvar, beta, recon)
                return {"loss": loss, "recon": r, "kl": kl}

            self._eval_loss = fn
        out = self._eval_loss(state.params, key,
                              {k: jnp.asarray(v) for k, v in batch.items()})
        return {k: float(v) for k, v in jax.device_get(out).items()}

    def sample(self, state, key, num: Optional[int] = None,
               disease=None, site=None) -> np.ndarray:
        if self._sample is None:
            model = self.model
            if self.conditional:
                @jax.jit
                def fn(params, key, disease, site):
                    return model.apply({"params": params}, key, disease, site,
                                       method=model.sample)
            else:
                import functools

                @functools.partial(jax.jit, static_argnames=("num",))
                def fn(params, key, num):
                    return model.apply({"params": params}, key, num,
                                       method=model.sample)
            self._sample = fn
        if self.conditional:
            return np.asarray(self._sample(state.params, key,
                                           jnp.asarray(disease), jnp.asarray(site)))
        return np.asarray(self._sample(state.params, key, num=num))
