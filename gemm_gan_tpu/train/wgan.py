"""Fused WGAN-GP training engine.

The reference dispatches 12+ Python-level forward/backward graphs per batch
(5 critic updates + 1 generator update + the GP double-backward, each its own
torch autograd call — SURVEY.md §3.1/§3.2). Here the entire n_critic-unrolled
update — 5 critic steps with fresh latents, gradient penalty via grad-of-grad,
1 generator step, both optimizer updates — is ONE jitted XLA program with
donated buffers, sharded over a (data, model) mesh.

Behavioral parity notes (reference: /root/reference/src/conditional_gan_concat.py):
  * same real batch across the n_critic critic iterations, fresh z each (:445-451);
  * GP weight 10, norm taken w.r.t. interpolated expression only (:319-342,382-383);
  * optional instance-noise augmentation gated per-batch (:369-375) — the
    reference's real-branch bug (undefined `x`) is fixed to the intended
    behavior: the SAME gate draws fresh noise for fake and real;
  * the reference's `loss.requires_grad_(True)` / manual requires_grad
    toggling anti-patterns (:353-359,385,407-413) have no JAX equivalent and
    are dropped.
"""

from __future__ import annotations

import functools
import weakref
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from gemm_gan_tpu.config import ExperimentConfig
from gemm_gan_tpu.models.gan import Critic, Generator
from gemm_gan_tpu.parallel.sharding import (batch_sharding, param_shardings,
                                            place_batch, place_global)
from gemm_gan_tpu.train import losses
from gemm_gan_tpu.train.schedules import make_optimizer
from gemm_gan_tpu.train.state import GANTrainState

COND_KEYS = ("text_emb", "tokens", "token_mask", "patches", "patch_mask",
             "disease", "site")


def cond_of(batch: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    cond = {k: batch[k] for k in COND_KEYS if k in batch}
    return cond or None


class WGANGPEngine:
    def __init__(self, cfg: ExperimentConfig, steps_per_epoch: int = 1, mesh=None):
        if cfg.train.n_critic < 1:
            raise ValueError(
                f"train.n_critic must be >= 1, got {cfg.train.n_critic} "
                "(the WGAN-GP step performs n_critic critic updates before "
                "each generator update — reference "
                "conditional_gan_concat.py:236)")
        if cfg.model.use_batchnorm:
            raise ValueError(
                "model.use_batchnorm=True is not supported by the fused "
                "WGAN-GP engine: the per-sample gradient penalty is "
                "incompatible with batch-coupled critic statistics "
                "(Gulrajani et al. 2017 §4 — 'no critic batch "
                "normalization'), and the reference itself never enables "
                "its is_bn option (is_bn=False in every entry point, "
                "conditional_gan_concat.py:103,159). Where the reference "
                "DOES hard-code a BatchNorm (the attention variant's "
                "attn_bn), the fusion modules use LayerNorm — a documented "
                "divergence (PARITY.md).")
        self.cfg = cfg
        self.mesh = mesh
        sp_mesh = mesh if cfg.model.fusion.sequence_parallel else None
        self.gen = Generator(cfg.model, mesh=sp_mesh)
        self.disc = Critic(cfg.model, mesh=sp_mesh)
        t = cfg.train
        self.g_tx = make_optimizer(t, t.lr_gen, steps_per_epoch, t.clip_grad_gen)
        self.d_tx = make_optimizer(t, t.lr_disc, steps_per_epoch, t.clip_grad_disc)
        self._train_step = None
        self._train_many = None
        # per-DeviceCache compiled streaming programs (weak keys: a dropped
        # cache releases its program)
        self._train_many_cached = weakref.WeakKeyDictionary()
        self._sample = None
        self._sample_scan = None

    # ------------------------------------------------------------------ init
    def init_state(self, seed: int, sample_batch: Dict[str, Any]) -> GANTrainState:
        cfg = self.cfg
        key = jax.random.key(seed)
        kg, kd, krun = jax.random.split(key, 3)
        cond = cond_of(sample_batch)
        z = jnp.zeros((sample_batch["genes"].shape[0], cfg.model.latent_dim))
        g_params = self.gen.init({"params": kg}, z, cond, deterministic=True)["params"]
        d_params = self.disc.init({"params": kd}, jnp.asarray(sample_batch["genes"]),
                                  cond, deterministic=True)["params"]
        g_ema = (jax.tree.map(jnp.copy, g_params)
                 if cfg.train.ema_decay > 0 else None)
        state = GANTrainState.create(
            g_params, d_params, self.g_tx.init(g_params), self.d_tx.init(d_params),
            krun, g_ema=g_ema)
        if self.mesh is not None:
            # place_global = device_put on a single-process mesh; on a
            # multi-process mesh it routes through host data (every process
            # built the identical state from the same seed)
            gs = param_shardings(self.mesh, state.g_params, cfg.model.n_genes)
            ds = param_shardings(self.mesh, state.d_params, cfg.model.n_genes)
            rep = NamedSharding(self.mesh, P())
            # Optimizer accumulators mirror the param pytree (optax nu/trace
            # subtrees keep the same .../kernel leaf paths and shapes), so
            # the SAME TP rules apply: a replicated opt state would store
            # the full gene-dim accumulators on every device and force a
            # per-step all-gather of gradient-sized data over `model` to
            # rebuild them — the exact tensors TP exists to shard. Scalar
            # leaves (step counts) fall through the rules to replicated.
            g_os = param_shardings(self.mesh, state.g_opt_state,
                                   cfg.model.n_genes)
            d_os = param_shardings(self.mesh, state.d_opt_state,
                                   cfg.model.n_genes)
            state = state.replace(
                g_params=jax.tree.map(place_global, state.g_params, gs),
                d_params=jax.tree.map(place_global, state.d_params, ds),
                g_opt_state=jax.tree.map(place_global, state.g_opt_state,
                                         g_os),
                d_opt_state=jax.tree.map(place_global, state.d_opt_state,
                                         d_os),
                step=place_global(state.step, rep),
                key=place_global(state.key, rep),
                g_ema=(None if state.g_ema is None else
                       jax.tree.map(place_global, state.g_ema, gs)),
            )
        return state

    # ------------------------------------------------------------- train step
    def _build_train_step(self):
        cfg = self.cfg
        t, m = cfg.train, cfg.model
        gen, disc = self.gen, self.disc
        g_tx, d_tx = self.g_tx, self.d_tx
        if t.cond_embed_reuse not in ("per_call", "per_update"):
            raise ValueError(
                f"cond_embed_reuse must be 'per_call' or 'per_update', "
                f"got {t.cond_embed_reuse!r}")
        reuse = t.cond_embed_reuse == "per_update"

        def gen_fwd(g_params, z, cond, key):
            return gen.apply({"params": g_params}, z, cond, deterministic=False,
                             rngs={"dropout": key})

        def disc_fwd(d_params, x, cond, key):
            return disc.apply({"params": d_params}, x, cond, deterministic=False,
                              rngs={"dropout": key})

        def augment(x, key, gate):
            if t.p_aug <= 0:
                return x
            noise = jax.random.normal(key, x.shape, dtype=x.dtype) * t.norm_scale
            return x + gate * noise

        def d_loss_terms(d_params, real_a, fake_a, cond, ka, kd2, kd2b, kd3,
                         alpha=None):
            """Critic loss (+aux) on one (micro)batch — shared by the direct
            and the gradient-accumulation update paths."""
            if reuse:
                # one embedding per critic update, shared by the real
                # score, the fake score, and the GP (exact when
                # fusion.dropout == 0 — the three evaluations are then
                # identical computations)
                cvec = None
                if cond is not None:
                    cvec = disc.apply(
                        {"params": d_params}, cond, deterministic=False,
                        rngs={"dropout": kd2}, method="embed_cond")
                if t.batched_scores:
                    # real/fake/interp trunk evaluations stacked into ONE
                    # score call: one read of the HBM-bound gene-dim critic
                    # weights instead of three (losses.batched_scores_and_gp)
                    def score_cat(x_cat):
                        cv = (None if cvec is None else
                              jnp.concatenate([cvec, cvec, cvec], axis=0))
                        return disc.apply({"params": d_params}, x_cat, cv,
                                          method="score")

                    d_real, d_fake, gp = losses.batched_scores_and_gp(
                        score_cat, real_a, fake_a, ka, alpha=alpha)
                    loss, loss_r, loss_f = losses.d_loss(d_real, d_fake)
                    total = loss + t.gp_weight * gp
                    if t.drift_epsilon > 0:
                        total = total + t.drift_epsilon * losses.drift_penalty(
                            d_real, d_fake)
                    return total, (loss, gp, jnp.mean(d_real),
                                   jnp.mean(d_fake))
                d_real = disc.apply({"params": d_params}, real_a, cvec,
                                    method="score")
                d_fake = disc.apply({"params": d_params}, fake_a, cvec,
                                    method="score")
            else:
                # independent dropout keys per forward, matching the
                # reference's per-call torch dropout draws
                d_real = disc_fwd(d_params, real_a, cond, kd2)
                d_fake = disc_fwd(d_params, fake_a, cond, kd2b)
                cvec = None
                if cond is not None:
                    cvec = disc.apply(
                        {"params": d_params}, cond, deterministic=False,
                        rngs={"dropout": kd3}, method="embed_cond")
            loss, loss_r, loss_f = losses.d_loss(d_real, d_fake)
            # GP: the penalty differentiates D w.r.t. the interpolated
            # *expression* only (conditions fixed, reference :332-337),
            # and the critic is trunk([x ∥ fusion(cond)]) — so the fusion
            # stack is evaluated ONCE, outside the inner grad, and
            # enters it as a constant. Only the small MLP trunk is
            # differentiated twice; the Pallas flash kernels (first-order
            # custom VJP) serve the whole step with no jnp fallback and
            # no closed-over-custom_vjp restriction, and at whole-slide
            # patch counts the GP costs O(trunk), not O(attention).
            gp = losses.gradient_penalty(
                lambda x: disc.apply({"params": d_params}, x, cvec,
                                     method="score"),
                real_a, fake_a, ka, alpha=alpha)
            total = loss + t.gp_weight * gp
            if t.drift_epsilon > 0:
                total = total + t.drift_epsilon * losses.drift_penalty(
                    d_real, d_fake)
            return total, (loss, gp, jnp.mean(d_real), jnp.mean(d_fake))

        def critic_update(state, real, cond, key, g_cvec, fake=None):
            kz, ka, kgate, kn1, kn2, kd1, kd2, kd2b, kd3 = \
                jax.random.split(key, 9)
            gate = (jax.random.bernoulli(kgate, t.p_aug) if t.p_aug > 0
                    else jnp.zeros(()))
            if fake is None:
                # `fake` is pre-generated by the train step's hoisted
                # batched generator forward in the per_update+batched_scores
                # production path (same kz draw — see train_step); this
                # per-update generation is the per_call/reference path
                z = jax.random.normal(kz, (real.shape[0], m.latent_dim))
                if g_cvec is not None:
                    # per_update reuse: the generator params (and cond) are
                    # constant across the n_critic critic updates, so the
                    # generator's condition embedding was computed once per
                    # step
                    fake = jax.lax.stop_gradient(gen.apply(
                        {"params": state.g_params}, z, g_cvec,
                        method="score"))
                else:
                    fake = jax.lax.stop_gradient(
                        gen_fwd(state.g_params, z, cond, kd1))
            fake_a = augment(fake, kn1, gate)
            real_a = augment(real, kn2, gate)

            def loss_fn(d_params):
                return d_loss_terms(d_params, real_a, fake_a, cond,
                                    ka, kd2, kd2b, kd3)

            grads, aux = jax.grad(loss_fn, has_aux=True)(state.d_params)
            updates, d_opt = d_tx.update(grads, state.d_opt_state, state.d_params)
            d_params = optax.apply_updates(state.d_params, updates)
            return state.replace(d_params=d_params, d_opt_state=d_opt), aux

        # ---------------- gradient accumulation (config `train.grad_accum`)
        # Microbatches are STRIDED (sample i -> microbatch i % M) so each
        # stays balanced across a data-sharded mesh, and every per-sample
        # random draw (z, GP α, instance noise) happens ONCE at full batch
        # size and is regrouped the same way — the accumulated update is the
        # full-batch update exactly (fp reduction order aside) at
        # fusion.dropout == 0; dropout masks are drawn per microbatch
        # (fold_in(key, m)), the same caveat as cond_embed_reuse.
        def _regroup(x):
            if x is None:
                return None
            M = t.grad_accum
            return x.reshape((x.shape[0] // M, M) + x.shape[1:]).swapaxes(0, 1)

        def _regroup_tree(tree):
            return None if tree is None else jax.tree.map(_regroup, tree)

        def _tree_add(a, b):
            return jax.tree.map(jnp.add, a, b)

        def critic_update_accum(state, real, cond, key, g_cvec, fake=None):
            assert fake is None  # hoisted fakes are grad_accum==1 only
            M = t.grad_accum
            kz, ka, kgate, kn1, kn2, kd1, kd2, kd2b, kd3 = \
                jax.random.split(key, 9)
            z = jax.random.normal(kz, (real.shape[0], m.latent_dim))
            gate = (jax.random.bernoulli(kgate, t.p_aug) if t.p_aug > 0
                    else jnp.zeros(()))
            alpha = jax.random.uniform(ka, (real.shape[0], 1),
                                       dtype=real.dtype)
            # real.dtype == fake.dtype == f32 always (the trunk's output
            # Dense is pinned float32 even under bf16 compute, ops/mlp.py),
            # so these draws match the direct path's augment(x, key, gate)
            # draws in x.dtype bit-for-bit; pinned by
            # test_generator_output_f32_under_bf16_compute
            noise_f = (jax.random.normal(kn1, real.shape, real.dtype)
                       * t.norm_scale if t.p_aug > 0 else None)
            noise_r = (jax.random.normal(kn2, real.shape, real.dtype)
                       * t.norm_scale if t.p_aug > 0 else None)
            xs = (jnp.arange(M), _regroup(z), _regroup(alpha), _regroup(real),
                  _regroup_tree(cond), _regroup(g_cvec),
                  _regroup(noise_f), _regroup(noise_r))

            def micro(carry, xs_m):
                g_acc, aux_acc = carry
                i, z_m, alpha_m, real_m, cond_m, g_cvec_m, nf_m, nr_m = xs_m
                if g_cvec_m is not None:
                    fake = jax.lax.stop_gradient(gen.apply(
                        {"params": state.g_params}, z_m, g_cvec_m,
                        method="score"))
                else:
                    fake = jax.lax.stop_gradient(gen_fwd(
                        state.g_params, z_m, cond_m,
                        jax.random.fold_in(kd1, i)))
                fake_a = fake if nf_m is None else fake + gate * nf_m
                real_a = real_m if nr_m is None else real_m + gate * nr_m

                def loss_fn(d_params):
                    return d_loss_terms(
                        d_params, real_a, fake_a, cond_m, ka,
                        jax.random.fold_in(kd2, i),
                        jax.random.fold_in(kd2b, i),
                        jax.random.fold_in(kd3, i), alpha=alpha_m)

                grads, aux = jax.grad(loss_fn, has_aux=True)(state.d_params)
                return (_tree_add(g_acc, grads),
                        _tree_add(aux_acc, aux)), None

            zero_g = jax.tree.map(jnp.zeros_like, state.d_params)
            zero_aux = (jnp.zeros(()),) * 4
            (g_acc, aux_acc), _ = jax.lax.scan(micro, (zero_g, zero_aux), xs)
            grads = jax.tree.map(lambda g: g / M, g_acc)
            aux = jax.tree.map(lambda a: a / M, aux_acc)
            updates, d_opt = d_tx.update(grads, state.d_opt_state,
                                         state.d_params)
            d_params = optax.apply_updates(state.d_params, updates)
            return state.replace(d_params=d_params, d_opt_state=d_opt), aux

        def gen_update(state, real, cond, key):
            kz, kd1, kd2 = jax.random.split(key, 3)
            z = jax.random.normal(kz, (real.shape[0], m.latent_dim))
            d_cvec = None
            if reuse and cond is not None:
                # the critic scores the fake through trunk([fake ∥ cvec]);
                # no generator gradient flows through the critic's fusion,
                # so its embedding is computed once outside the loss
                d_cvec = disc.apply(
                    {"params": state.d_params}, cond, deterministic=False,
                    rngs={"dropout": kd2}, method="embed_cond")

            def loss_fn(g_params):
                fake = gen_fwd(g_params, z, cond, kd1)
                if d_cvec is not None:
                    scores = disc.apply({"params": state.d_params}, fake,
                                        d_cvec, method="score")
                else:
                    scores = disc_fwd(state.d_params, fake, cond, kd2)
                return losses.g_loss(scores)

            gl, grads = jax.value_and_grad(loss_fn)(state.g_params)
            updates, g_opt = g_tx.update(grads, state.g_opt_state, state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            return state.replace(g_params=g_params, g_opt_state=g_opt), gl

        def gen_update_accum(state, real, cond, key):
            M = t.grad_accum
            kz, kd1, kd2 = jax.random.split(key, 3)
            z = jax.random.normal(kz, (real.shape[0], m.latent_dim))
            d_cvec = None
            if reuse and cond is not None:
                # as in gen_update: no generator gradient flows through the
                # critic's fusion, so one full-batch embedding serves all
                # microbatches (sliced per m)
                d_cvec = disc.apply(
                    {"params": state.d_params}, cond, deterministic=False,
                    rngs={"dropout": kd2}, method="embed_cond")
            xs = (jnp.arange(M), _regroup(z), _regroup_tree(cond),
                  _regroup(d_cvec))

            def micro(carry, xs_m):
                gl_acc, g_acc = carry
                i, z_m, cond_m, d_cvec_m = xs_m

                def loss_fn(g_params):
                    fake = gen_fwd(g_params, z_m, cond_m,
                                   jax.random.fold_in(kd1, i))
                    if d_cvec_m is not None:
                        scores = disc.apply({"params": state.d_params}, fake,
                                            d_cvec_m, method="score")
                    else:
                        scores = disc_fwd(state.d_params, fake, cond_m,
                                          jax.random.fold_in(kd2, i))
                    return losses.g_loss(scores)

                gl, grads = jax.value_and_grad(loss_fn)(state.g_params)
                return (gl_acc + gl, _tree_add(g_acc, grads)), None

            zero_g = jax.tree.map(jnp.zeros_like, state.g_params)
            (gl_acc, g_acc), _ = jax.lax.scan(
                micro, (jnp.zeros(()), zero_g), xs)
            grads = jax.tree.map(lambda g: g / M, g_acc)
            updates, g_opt = g_tx.update(grads, state.g_opt_state,
                                         state.g_params)
            g_params = optax.apply_updates(state.g_params, updates)
            return state.replace(g_params=g_params, g_opt_state=g_opt), gl_acc / M

        critic_up = critic_update_accum if t.grad_accum > 1 else critic_update
        gen_up = gen_update_accum if t.grad_accum > 1 else gen_update

        def train_step(state: GANTrainState, batch: Dict[str, Any]):
            real = batch["genes"]
            cond = cond_of(batch)
            if t.grad_accum > 1 and real.shape[0] % t.grad_accum:
                raise ValueError(
                    f"batch size {real.shape[0]} is not divisible by "
                    f"train.grad_accum={t.grad_accum}")
            key = jax.random.fold_in(state.key, state.step)
            # the extra key only exists in reuse mode so the per_call RNG
            # stream is unchanged from the reference-parity path
            keys = jax.random.split(key, t.n_critic + (2 if reuse else 1))
            g_cvec = None
            if reuse and cond is not None:
                # generator params are constant until the generator update,
                # so one embedding serves all n_critic fake generations
                g_cvec = jax.lax.stop_gradient(gen.apply(
                    {"params": state.g_params}, cond, deterministic=False,
                    rngs={"dropout": keys[t.n_critic + 1]},
                    method="embed_cond"))
            fake_stack = None
            if (reuse and t.batched_scores and t.hoist_fakes
                    and t.grad_accum == 1):
                # hoisted fake generation: g_params (and g_cvec) are constant
                # across the n_critic critic updates and the trunk is
                # dropout-free, so ALL n_critic fake batches come from ONE
                # [n_critic*B] generator forward — one read of the HBM-bound
                # [hidden, n_genes] output projection instead of n_critic.
                # Each update's z uses the same kz = split(key_i)[0] draw the
                # per-update path uses, so the fakes are the same values.
                B = real.shape[0]

                def z_of(k):
                    kz = jax.random.split(k, 9)[0]
                    return jax.random.normal(kz, (B, m.latent_dim))

                zs = jax.vmap(z_of)(keys[:t.n_critic])
                cv = (None if g_cvec is None
                      else jnp.tile(g_cvec, (t.n_critic, 1)))
                fake_stack = jax.lax.stop_gradient(gen.apply(
                    {"params": state.g_params},
                    zs.reshape(t.n_critic * B, m.latent_dim), cv,
                    method="score")).reshape(t.n_critic, B, -1)
            if t.critic_scan and t.n_critic > 1:
                # same body, same keys, same order as the unrolled loop —
                # traced once and iterated by XLA, so the compiled program
                # is ~n_critic times smaller on the critic side (config
                # `critic_scan` docstring). `keys` is a key array; slicing
                # it yields the scan's per-iteration xs.
                if fake_stack is not None:
                    def critic_body(st, xs):
                        k, f = xs
                        return critic_up(st, real, cond, k, g_cvec, f)

                    state, d_auxs = jax.lax.scan(
                        critic_body, state,
                        (keys[:t.n_critic], fake_stack))
                else:
                    def critic_body(st, k):
                        return critic_up(st, real, cond, k, g_cvec)

                    state, d_auxs = jax.lax.scan(
                        critic_body, state, keys[:t.n_critic])
                d_aux = jax.tree.map(lambda a: a[-1], d_auxs)
            else:
                d_aux = None
                for i in range(t.n_critic):
                    state, d_aux = critic_up(
                        state, real, cond, keys[i], g_cvec,
                        None if fake_stack is None else fake_stack[i])
            state, gl = gen_up(state, real, cond, keys[t.n_critic])
            if state.g_ema is not None:
                d = t.ema_decay
                state = state.replace(g_ema=jax.tree.map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state.g_ema, state.g_params))
            d_total, gp, d_real, d_fake = d_aux
            metrics = {"d_loss": d_total, "g_loss": gl, "gp": gp,
                       "d_real": d_real, "d_fake": d_fake}
            return state.replace(step=state.step + 1), metrics

        return train_step

    def step(self, state: GANTrainState, batch: Dict[str, Any]):
        if self._train_step is None:
            # Shardings propagate from the (already-placed) state and batch
            # args; XLA inserts the grad-psum across `data` and the
            # all-gathers across `model` implied by the annotations. Donation
            # reuses both optimizer states' and params' buffers in-place.
            self._train_step = jax.jit(self._build_train_step(),
                                       donate_argnums=(0,))
        if self.mesh is not None:
            # on a multi-process mesh `batch` is this process's local shard
            # (per-host input); single-process it is the full global batch
            batch = place_batch(self.mesh, batch,
                                expected_global_rows=self.cfg.train.batch_size)
        return self._train_step(state, batch)

    def step_many(self, state: GANTrainState, stacked: Dict[str, Any]):
        """Run K fused steps in ONE device program via `lax.scan` over
        batches stacked on a leading axis [K, B, ...].

        Amortizes host dispatch: for this ~15M-param model a single step is
        latency-bound, so scanning an epoch's batches on device is the
        TPU-idiomatic fit loop. Returns (state, metrics of the last step).
        """
        if self._train_many is None:
            inner = self._build_train_step()

            def many(state, stacked):
                state, ms = jax.lax.scan(inner, state, stacked)
                return state, jax.tree.map(lambda m: m[-1], ms)

            self._train_many = jax.jit(many, donate_argnums=(0,))
        if self.mesh is not None:
            stacked = place_batch(self.mesh, stacked,
                                  NamedSharding(self.mesh, P(None, "data")))
        return self._train_many(state, stacked)

    def step_many_cached(self, state: GANTrainState, cache,
                         epoch: Optional[int] = None):
        """One epoch of fused steps in ONE device program, streaming batches
        from a `DeviceCache`: each scan iteration gathers (and
        patch-subsamples) its batch from the HBM bank INSIDE the scan body.

        Numerically identical to `step_many(state, cache.stacked_epoch(e))`
        — same idx/keys, same assembler — but the whole-epoch [K, B, ...]
        batch stack is never materialized: device memory stays
        O(bank + one batch). At real TCGA scale (~10k cases) the stacked
        patches+tokens alone would be ~20 GB, more than the chip; this path
        is what makes the scan fit loop feasible there. (Beyond reference:
        the reference streams from per-item disk reads — SURVEY.md §2.2.)
        """
        # keyed on the cache instance (weak-keyed dict): its assemble_fn
        # (resample policy, narrowed-dtype set) is baked into the traced
        # program, so each cache gets its OWN compiled program — a different
        # cache neither reuses a stale closure nor evicts the previous
        # cache's program (alternating caches would otherwise pay a full
        # remote recompile per switch)
        from gemm_gan_tpu.data.device_cache import ShardedDeviceCache

        if isinstance(cache, ShardedDeviceCache):
            return self._step_many_sharded_cache(state, cache, epoch)
        fn = self._train_many_cached.get(cache)
        if fn is None:
            inner = self._build_train_step()
            assemble = cache.assemble_fn
            mesh = self.mesh
            sb = batch_sharding(mesh) if mesh is not None else None

            def many(state, arrays, idx, keys):
                def body(st, xs):
                    i, k = xs
                    batch = assemble(arrays, i, k)
                    if sb is not None:
                        # same data-axis placement the other step paths give
                        # their batches: shard the assembled batch over
                        # `data` so the fused step runs data-parallel
                        batch = jax.tree.map(
                            lambda v: jax.lax.with_sharding_constraint(v, sb),
                            batch)
                    return inner(st, batch)

                state, ms = jax.lax.scan(body, state, (idx, keys))
                return state, jax.tree.map(lambda m: m[-1], ms)

            fn = jax.jit(many, donate_argnums=(0,))
            self._train_many_cached[cache] = fn
        arrays = cache.arrays
        if self.mesh is not None:
            rep = NamedSharding(self.mesh, P())
            if not rep.is_fully_addressable:
                # The bank and epoch_spec arrays are process-local; routing
                # the bank through place_global's host branch would re-upload
                # the whole HBM bank every epoch (and the jitted scan would
                # still reject the process-local idx/keys). Multi-process
                # runs use the per-host `step()` / `step_many` paths.
                raise NotImplementedError(
                    "step_many_cached supports single-process meshes only; "
                    "on a multi-process mesh use step()/step_many with "
                    "per-host input shards")
            # replicate the bank over the mesh (a metadata no-op once
            # placed); the in-scan gather then feeds the data-sharded batch
            # constraint
            arrays = {k: place_global(v, rep) for k, v in arrays.items()}
        idx, keys = cache.epoch_spec(epoch)
        return fn(state, arrays, idx, keys)

    def _step_many_sharded_cache(self, state: GANTrainState, cache,
                                 epoch: Optional[int] = None):
        """Streaming epoch scan over a `ShardedDeviceCache`: the bank is
        sharded over the mesh's `data` axis and each scan iteration gathers
        its batch shard-locally (shard_map inside the scan body) — the
        multi-process-capable (and HBM-sharded) form of the streaming fit
        loop. Per-shard sampling contract documented on the cache."""
        if self.mesh is None or self.mesh != cache.mesh:
            raise ValueError(
                "ShardedDeviceCache requires the engine and the cache to "
                "share one mesh (engine mesh "
                f"{None if self.mesh is None else self.mesh.shape}, cache "
                f"mesh {cache.mesh.shape})")
        fn = self._train_many_cached.get(cache)
        if fn is None:
            inner = self._build_train_step()
            gather = cache.gather_fn
            perm_fn = cache.epoch_perm_fn
            K = cache.n_full_batches

            def many(state, arrays, ekey):
                # one permutation per shard per epoch, computed ON DEVICE;
                # batches come out of the shard_map already sharded P("data")
                perm = perm_fn(ekey)

                def body(st, k):
                    return inner(st, gather(arrays, perm, ekey, k))

                state, ms = jax.lax.scan(body, state, jnp.arange(K))
                return state, jax.tree.map(lambda m: m[-1], ms)

            fn = jax.jit(many, donate_argnums=(0,))
            self._train_many_cached[cache] = fn
        return fn(state, cache.arrays, cache.epoch_base_key(epoch))

    # --------------------------------------------------------------- sampling
    def _build_sample(self):
        latent = self.cfg.model.latent_dim
        gen = self.gen

        @functools.partial(jax.jit, static_argnames=("n",))
        def sample(g_params, key, cond, n):
            z = jax.random.normal(key, (n, latent))
            return gen.apply({"params": g_params}, z, cond, deterministic=True)

        return sample

    def _build_sample_scan(self):
        latent = self.cfg.model.latent_dim
        gen = self.gen

        @functools.partial(jax.jit, static_argnames=("num_repeats", "batch"))
        def sample_scan(g_params, key, cond_stacked, num_repeats: int, batch: int):
            """[K, B, ...] stacked conditioning -> [K, R, B, n_genes] fakes in
            ONE device program (lax.map over batches, inner map over repeats).

            The condition embedding is computed ONCE per batch and reused by
            all `num_repeats` z-draws — exact, because sampling embeds
            deterministically — so the fusion stack (the dominant generator
            cost at canonical shapes) runs K times instead of K*R, and the
            per-call host dispatch (~30 ms over the tunneled backend) is paid
            once instead of K*R times.

            Key discipline: z for (batch k, repeat r) is
            `normal(fold_in(fold_in(key, k), r))` — the per-call path in
            `generate_samples_all` derives the identical keys, so the two
            paths produce bitwise-comparable samples (parity test in
            tests/test_engine.py).
            """
            def one_batch(k_idx, cond_k):
                cvec = (None if cond_k is None else gen.apply(
                    {"params": g_params}, cond_k, deterministic=True,
                    method="embed_cond"))
                kb = jax.random.fold_in(key, k_idx)

                def one_rep(r):
                    z = jax.random.normal(jax.random.fold_in(kb, r),
                                          (batch, latent))
                    return gen.apply({"params": g_params}, z, cvec,
                                     method="score")

                return jax.lax.map(one_rep, jnp.arange(num_repeats))

            idxs = jnp.arange(jax.tree.leaves(cond_stacked)[0].shape[0])
            return jax.lax.map(lambda args: one_batch(*args),
                               (idxs, cond_stacked))  # [K, R, B, G]

        @functools.partial(jax.jit,
                           static_argnames=("n_batches", "num_repeats", "batch"))
        def sample_scan_uncond(g_params, key, n_batches: int, num_repeats: int,
                               batch: int):
            def one_batch(k_idx):
                kb = jax.random.fold_in(key, k_idx)

                def one_rep(r):
                    z = jax.random.normal(jax.random.fold_in(kb, r),
                                          (batch, latent))
                    return gen.apply({"params": g_params}, z, None,
                                     method="score")

                return jax.lax.map(one_rep, jnp.arange(num_repeats))

            return jax.lax.map(one_batch, jnp.arange(n_batches))

        return sample_scan, sample_scan_uncond

    def _gen_params(self, state: GANTrainState, use_ema: Optional[bool]):
        use_ema = (state.g_ema is not None) if use_ema is None else use_ema
        if use_ema and state.g_ema is None:
            raise ValueError("use_ema=True but the state has no EMA params "
                             "(set train.ema_decay > 0 before init_state)")
        return state.g_ema if use_ema else state.g_params

    def generate_samples(self, state: GANTrainState, key, batch: Dict[str, Any],
                         use_ema: Optional[bool] = None):
        """Generate one batch of fake expressions for the given conditioning.

        `use_ema`: decode with the EMA generator params (`train.ema_decay`>0).
        Default (None) uses EMA whenever the state tracks it.
        """
        if self._sample is None:
            self._sample = self._build_sample()
        cond = cond_of(batch)
        n = batch["genes"].shape[0]
        return self._sample(self._gen_params(state, use_ema), key, cond, n=n)

    def generate_samples_all(self, state, key, batches: Iterable[Dict[str, Any]],
                             num_repeats: int = 1,
                             use_ema: Optional[bool] = None, scan: bool = False,
                             device_out: bool = False, host_dtype=None):
        """Real/fake pairs over a whole loader (parity:
        /root/reference/src/conditional_gan_concat.py:453-560).

        Both paths draw z for (batch k, repeat r) from
        `fold_in(fold_in(key, k), r)`, so they sample identically:

          * per-call (default): one jitted generator dispatch per batch per
            repeat — compiles once, right for small/ad-hoc evaluation sets;
          * `scan=True`: every full-size batch rides ONE `lax.map` device
            program with the condition embedding computed once per batch and
            shared across the `num_repeats` z-draws (exact — sampling embeds
            deterministically). Amortizes the per-call dispatch latency
            (~30 ms over a tunneled backend) for serving-style workloads; a
            ragged tail batch falls back to per-call dispatches. Compiles per
            (n_batches, batch, num_repeats) shape — prefer steady shapes.

        `device_out=True` keeps `real`/`fake` as device (jax) arrays instead
        of fetching them to numpy — for on-device consumers (in-loop metric
        proxies, downstream models) where device->host transfer of full
        profile matrices would dominate. Labels are always numpy.

        `batches` may be an iterable of batches OR a callable returning a
        fresh iterable per pass — pass a callable (e.g.
        `lambda: cache.epoch(e)`) for device-resident loaders so the
        per-call path streams one gathered batch at a time instead of
        holding the whole epoch's conditioning on device (see the comment
        at the materialization site below).

        `host_dtype` (e.g. `np.float16`; ignored under `device_out`): cast
        `real`/`fake` ON DEVICE to a narrower dtype before fetching, so the
        device->host wire carries half the bytes and the returned arrays
        (and any .npy written from them) are half the size. Measured on the
        tunneled backend it buys only ~5% delivered profiles/s (the
        transport is per-transfer-overhead-dominated at these chunk sizes —
        BASELINE.md "f16 delivery"); the win is proportional on genuinely
        bandwidth-bound links. Opt-in precision trade on the DELIVERED copy
        only (profiles are z-scored O(1) values; f16 keeps ~3 significant
        digits); parity evaluation stays f32.
        """
        # `batches` may be a CALLABLE returning a fresh iterable per pass:
        # the streaming contract for device-resident loaders. Materializing
        # a DeviceCache epoch with list() holds EVERY gathered batch on
        # device at once — at canonical width that is ~8 GB (512 batches x
        # ~16 MB of patch/token conditioning) on top of the ~10 GB resident
        # banks, a measured chip OOM in the full-train test block. A
        # callable lets the per-call path stream one batch at a time
        # (constant device memory); plain iterables keep the old list()
        # behavior, and the scan path (which stacks the epoch by design)
        # materializes either way.
        batches_fn = batches if callable(batches) else None
        if batches_fn is None:
            batches = list(batches)  # callers may pass a one-shot iterator
        elif scan:
            batches = list(batches_fn())
            batches_fn = None
        scan_fakes = None
        if scan and batches:
            b0 = batches[0]["genes"].shape[0]
            n_full = 0
            while (n_full < len(batches)
                   and batches[n_full]["genes"].shape[0] == b0):
                n_full += 1
            # a ragged batch anywhere but last disables the scan path (loaders
            # here never produce one, but callers may hand-build batch lists)
            if all(b["genes"].shape[0] < b0 for b in batches[n_full:]) \
                    and n_full * num_repeats > 1:
                if self._sample_scan is None:
                    self._sample_scan = self._build_sample_scan()
                cond_scan, uncond_scan = self._sample_scan
                params = self._gen_params(state, use_ema)
                cond0 = cond_of(batches[0])
                if cond0 is None:
                    out = uncond_scan(params, key, n_batches=n_full,
                                      num_repeats=num_repeats, batch=b0)
                else:
                    stacked = {k: jnp.stack([b[k] for b in batches[:n_full]])
                               for k in cond0}
                    out = cond_scan(params, key, stacked,
                                    num_repeats=num_repeats, batch=b0)
                if device_out:
                    scan_fakes = out  # stays on device
                else:
                    if host_dtype is not None:
                        out = out.astype(host_dtype)  # one device-side cast
                    # chunked device->host fetch: one monolithic device_get
                    # of the [K, R, B, G] result moves ~2.7x slower than
                    # per-batch chunks on the tunneled backend
                    # (scripts/probe_subsystems.py "serving"); per-k slices
                    # match the per-call path's chunking
                    scan_fakes = np.stack(
                        [np.asarray(out[k]) for k in range(out.shape[0])])

        if device_out:
            fetch = lambda a: a
        elif host_dtype is not None:
            # .astype on a device array dispatches on device, so np.asarray
            # then pulls the narrow representation over the wire; on numpy
            # inputs it is a host cast (no wire to save)
            fetch = lambda a: np.asarray(a.astype(host_dtype))
        else:
            fetch = np.asarray
        reals, fakes, diseases, sites = [], [], [], []
        for r in range(num_repeats):
            for k_idx, batch in enumerate(batches_fn() if batches_fn
                                          else batches):
                if scan_fakes is not None and k_idx < scan_fakes.shape[0]:
                    fake = scan_fakes[k_idx, r]
                else:
                    sub = jax.random.fold_in(jax.random.fold_in(key, k_idx), r)
                    fake = fetch(self.generate_samples(
                        state, sub, batch, use_ema=use_ema))
                reals.append(fetch(batch["genes"]))
                fakes.append(fake)
                if "disease" in batch:
                    diseases.append(np.asarray(batch["disease"]))
                if "site" in batch:
                    sites.append(np.asarray(batch["site"]))
        if device_out:
            out = {"real": jnp.concatenate([jnp.asarray(a) for a in reals]),
                   "fake": jnp.concatenate([jnp.asarray(a) for a in fakes])}
        else:
            out = {"real": np.concatenate(reals),
                   "fake": np.concatenate(fakes)}
        if diseases:
            out["disease"] = np.concatenate(diseases)
        if sites:
            out["site"] = np.concatenate(sites)
        return out

    # -------------------------------------------------------------------- fit
    def fit(self, state: GANTrainState, epochs: int,
            batches_fn: Callable[[], Iterable[Dict[str, Any]]] = None,
            on_epoch_end: Optional[Callable] = None,
            logger=None, stacked_fn: Optional[Callable] = None,
            start_epoch: int = 0, scan_cache=None) -> GANTrainState:
        """Fit loop: jitted fused steps + optional epoch callback.

        `scan_cache` (a `DeviceCache`) selects the streaming scan path —
        one device program per epoch with each batch gathered from the HBM
        bank inside the scan body (`step_many_cached`); device memory stays
        O(bank + one batch), the right choice at TCGA scale.
        `stacked_fn(epoch) -> dict of [K, B, ...]` is the materialized
        variant of the same scan (identical numerics). `batches_fn` is the
        per-batch path. The full reference-parity experiment protocol
        (periodic detection / metric evaluation, npy dumps, checkpoints)
        lives in `gemm_gan_tpu.cli.experiment` and plugs in via
        `on_epoch_end`.

        `start_epoch` resumes an interrupted run from a restored state:
        epochs [start_epoch, epochs) are trained, and because both loaders
        draw epoch `e`'s batch stream from `fold_in`/`RandomState(seed+e)`
        the continued run sees exactly the batches the uninterrupted run
        would have (the train-stream PRNG itself rides in `state.key`).
        """
        if batches_fn is None and stacked_fn is None and scan_cache is None:
            raise ValueError("fit() needs batches_fn, stacked_fn, or "
                             "scan_cache")
        history = {"d_loss": [], "g_loss": []}
        for epoch in range(start_epoch, epochs):
            last_metrics = None
            if scan_cache is not None:
                state, last_metrics = self.step_many_cached(
                    state, scan_cache, epoch)
            elif stacked_fn is not None:
                state, last_metrics = self.step_many(state, stacked_fn(epoch))
            else:
                for batch in batches_fn():
                    state, last_metrics = self.step(state, batch)
            if last_metrics is not None:
                if logger is not None:
                    logger.log(int(jax.device_get(state.step)),
                               **last_metrics)
                history["d_loss"].append(float(last_metrics["d_loss"]))
                history["g_loss"].append(float(last_metrics["g_loss"]))
            if on_epoch_end is not None:
                maybe = on_epoch_end(self, state, epoch)
                if maybe is not None:
                    state = maybe
        self.history = history
        return state
