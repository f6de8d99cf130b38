"""VAE/CVAE experiment protocol (mirrors cli/experiment.py for the VAE family;
reference: /root/reference/src/vae/vanilla_vae.py:304-416, src/vae/cvae.py:388-840)."""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

from gemm_gan_tpu.config import ExperimentConfig
from gemm_gan_tpu.data.loader import Batches
from gemm_gan_tpu.eval.detection import compute_evaluation_metrics, detection
from gemm_gan_tpu.eval.gamma import gamma_coef
from gemm_gan_tpu.eval.utility import save_run_artifacts
from gemm_gan_tpu.train.checkpoint import restore_state, save_state
from gemm_gan_tpu.train.vae import VAEEngine
from gemm_gan_tpu.utils.metrics import EpochProfileWindow, MetricLogger


class VAEExperiment:
    def __init__(self, cfg: ExperimentConfig, splits: Dict):
        self.cfg = cfg
        self.splits = splits
        # single-process by design (cli/train.py rejects --shard_bank for the
        # VAE variants); the borrowed Experiment.posthoc_* methods check these
        self.nproc, self.pid, self.is_main = 1, 0, True
        t = cfg.train
        # drop_remainder=False for parity with the reference's
        # DataLoader(drop_last=False): ragged tails train/evaluate instead
        # of vanishing, and tiny splits still yield a batch
        self.loaders = {
            name: Batches(splits[name], t.batch_size, seed=t.seed,
                          shuffle=(name == "train"), drop_remainder=False)
            for name in ("train", "val", "test") if name in splits
        }
        self.engine = VAEEngine(cfg, steps_per_epoch=len(self.loaders["train"]))
        self.out_dir = os.path.join(cfg.output_dir, cfg.run_name)
        os.makedirs(self.out_dir, exist_ok=True)
        self.logger = MetricLogger(self.out_dir, cfg.run_name)
        self.val_metrics_history = []
        self._best = None

    def _validation_eval(self, state, key, epoch):
        """Mean val-split β-ELBO — the VAE family's model-native validation
        criterion (the GAN experiment's detection/PRDC battery scores
        SAMPLES; for an ELBO-trained model the held-out ELBO is the
        selection criterion the objective itself defines)."""
        import jax as _jax

        totals, n = {"loss": 0.0, "recon": 0.0, "kl": 0.0}, 0
        if "val" not in self.loaders:
            return None
        for i, batch in enumerate(self.loaders["val"].epoch(epoch)):
            m = self.engine.eval_loss(state, _jax.random.fold_in(key, i), batch)
            b = len(batch["genes"])
            for k in totals:
                totals[k] += m[k] * b
            n += b
        rec = {"epoch": epoch, **{k: v / n for k, v in totals.items()}}
        self.val_metrics_history.append(rec)
        self.logger.log(epoch, val_elbo=rec["loss"], val_recon=rec["recon"],
                        val_kl=rec["kl"])
        return rec

    def _maybe_save_best(self, state, rec, epoch):
        """Gate-best tracking, symmetric with `Experiment._maybe_save_best`
        (VERDICT r4 #6): lower val ELBO = better; `best.json` keeps the
        GAN contract's higher-is-better `score` as -val_loss."""
        import json

        if rec is None:
            return
        score = -rec["loss"]
        if self._best is not None and score <= self._best["score"]:
            return
        step = save_state(os.path.join(self.out_dir, "ckpt_best"),
                          jax.device_get(state))
        self._best = {"score": float(score), "val_loss": float(rec["loss"]),
                      "epoch": int(epoch) + 1, "eval_epoch": int(epoch),
                      "step": int(step)}
        with open(os.path.join(self.out_dir, "best.json"), "w") as f:
            json.dump(self._best, f, indent=2)

    def _gen_like(self, state, key, loader, epoch: int):
        reals, fakes, diseases, sites = [], [], [], []
        for batch in loader.epoch(epoch):
            key, sub = jax.random.split(key)
            if self.engine.conditional:
                fake = self.engine.sample(state, sub, disease=batch["disease"],
                                          site=batch["site"])
                diseases.append(batch["disease"])
                sites.append(batch["site"])
            else:
                fake = self.engine.sample(state, sub, num=batch["genes"].shape[0])
            reals.append(batch["genes"])
            fakes.append(np.asarray(fake))
        out = {"real": np.concatenate(reals), "fake": np.concatenate(fakes)}
        if diseases:
            out["disease"] = np.concatenate(diseases)
            out["site"] = np.concatenate(sites)
        return out

    def fit(self, resume: bool = False, profile_dir: str = None,
            profile_epochs: int = 1) -> Dict:
        """`resume=True` continues from the newest full-state checkpoint in
        the run dir (fresh start if none) — same exact-resume semantics as
        `Experiment.fit`. A checkpoint is written every `freq_compute_test`
        epochs so an interrupted run has something to continue from.

        `profile_dir`/`profile_epochs`: steady-state `jax.profiler` window,
        same semantics as `Experiment.fit` (opens after the first epoch)."""
        t = self.cfg.train
        state = self.engine.init_state(
            t.seed, next(iter(self.loaders["train"].epoch(0))))
        # scan path needs >=1 full batch per epoch; tiny splits take the
        # per-batch path instead of crashing inside stacked_epoch
        train = self.loaders["train"]
        stacked_fn = train.stacked_epoch if train.n_full_batches else None
        steps_per_epoch = train.n_full_batches if stacked_fn else len(train)
        ckpt_dir = os.path.join(self.out_dir, "ckpt")

        start_epoch = 0
        if resume:
            from gemm_gan_tpu.train.checkpoint import resume_or_fresh

            state, start_epoch = resume_or_fresh(
                ckpt_dir, state, steps_per_epoch, t.epochs, loader=train)

        prof = EpochProfileWindow(profile_dir, profile_epochs)

        if not resume:
            # fresh fit into a reused out_dir must not inherit stale
            # gate-best state (same guard as Experiment.fit, ADVICE r4)
            import shutil

            best_ckpt = os.path.join(self.out_dir, "ckpt_best")
            if os.path.isdir(best_ckpt):
                shutil.rmtree(best_ckpt)
            best_json = os.path.join(self.out_dir, "best.json")
            if os.path.exists(best_json):
                os.remove(best_json)

        val_key = jax.random.key(t.seed + 3)

        def on_epoch_end(engine, state, epoch):
            prof.on_epoch_end(epoch)
            if (epoch + 1) % t.freq_compute_test == 0 and epoch != t.epochs - 1:
                save_state(ckpt_dir, jax.device_get(state))
                rec = self._validation_eval(
                    state, jax.random.fold_in(val_key, epoch), epoch)
                self._maybe_save_best(state, rec, epoch)

        try:
            state = self.engine.fit(state, t.epochs, lambda: train.epoch(),
                                    stacked_fn=stacked_fn, logger=self.logger,
                                    on_epoch_end=on_epoch_end,
                                    start_epoch=start_epoch)
        finally:
            prof.close()
        self.profile_captured = prof.captured
        self.state = state
        save_state(ckpt_dir, jax.device_get(state))
        return self._test_block(state)

    def _test_block(self, state, epoch=None) -> Dict:
        t, ev = self.cfg.train, self.cfg.eval
        epoch = t.epochs if epoch is None else epoch
        key = jax.random.key(t.seed + 2)
        all_results = []
        for run in range(ev.n_runs):
            key, k1, k2 = jax.random.split(key, 3)
            train_out = self._gen_like(state, k1, self.loaders["train"], run)
            test_out = self._gen_like(state, k2, self.loaders["test"], run)
            run_dir = os.path.join(self.out_dir, f"test_{run}_epoch_{epoch}")
            arrays = {"data_real": train_out["real"], "data_gen": train_out["fake"],
                      "test_real": test_out["real"], "test_gen": test_out["fake"]}
            if "disease" in train_out:
                arrays.update({
                    "train_labels_real": train_out["disease"],
                    "train_labels_gen": train_out["disease"],
                    "test_labels_real": test_out["disease"],
                    "test_labels_gen": test_out["disease"],
                    "train_labels_primary_site_real": train_out["site"],
                    "train_labels_primary_site_gen": train_out["site"],
                    "test_labels_primary_site_real": test_out["site"],
                    "test_labels_primary_site_gen": test_out["site"],
                })
            save_run_artifacts(run_dir, arrays)
            all_results.append({
                "gamma": float(gamma_coef(test_out["real"], test_out["fake"])),
                "detection": detection(train_out["real"], train_out["fake"],
                                       test_out["real"], test_out["fake"]),
                "metrics": compute_evaluation_metrics(
                    train_out["real"], train_out["fake"],
                    test_out["real"], test_out["fake"], nn=ev.nearest_k,
                    n_components=min(ev.pca_components,
                                     train_out["real"].shape[0] - 1)),
            })
        return {"gamma_mean": float(np.mean([r["gamma"] for r in all_results])),
                "gamma_std": float(np.std([r["gamma"] for r in all_results])),
                "runs": all_results}

    def evaluate(self, which: str = "last") -> Dict:
        """`which="best"` restores the lowest-val-ELBO checkpoint tracked by
        `_maybe_save_best` (needs train.freq_compute_test < train.epochs and
        a val split); default keeps reference last-state semantics."""
        from gemm_gan_tpu.train.checkpoint import resolve_ckpt_dir

        ckpt_dir, step = resolve_ckpt_dir(os.path.join(self.out_dir, "ckpt"),
                                          which)
        template = jax.device_get(self.engine.init_state(
            self.cfg.train.seed, next(iter(self.loaders["train"].epoch(0)))))
        state = restore_state(ckpt_dir, template, step=step)
        # dump dirs named by the restored step's epoch (same accounting as
        # Experiment.evaluate): the scan path counts full batches per epoch
        train = self.loaders["train"]
        steps_per_epoch = train.n_full_batches or len(train)
        epoch = min(int(jax.device_get(state.step)) // max(steps_per_epoch, 1),
                    self.cfg.train.epochs)
        return self._test_block(state, epoch=epoch)

    def posthoc_utility(self) -> Dict:
        from gemm_gan_tpu.cli.experiment import Experiment

        return Experiment.posthoc_utility(self)  # same dump contract

    def posthoc_privacy(self) -> Dict:
        from gemm_gan_tpu.cli.experiment import Experiment

        return Experiment.posthoc_privacy(self)
