"""Reference-parity experiment protocol around the fused engines.

Reproduces the behavior of the reference trainers' `fit`/`evaluate` blocks
(/root/reference/src/conditional_gan_concat.py:575-1015) on top of
`WGANGPEngine`/`VAEEngine`:

  * validation every `freq_compute_test` epochs: regenerate train+val sets,
    run `detection` + `compute_evaluation_metrics` (:664-689);
  * final epoch: save full-state checkpoint, plot validation metric curves
    (:710-729), run `n_runs` test repetitions dumping the 8-npy artifact
    contract per run into `test_{run}_epoch_{E}/` (:756-767; +4 primary-site
    files as in conditional_gan_film.py:756-770), then per-run gamma /
    evaluation metrics / detection incl. a PCA-100 detection pass (:812-832);
  * balanced class-oversampled generation (generate_samples_all(balanced=True),
    :453-516) capped at `balanced_max_oversample`x;
  * `evaluate()` restores the checkpoint and reruns the test block (:869-1015);
  * post-hoc `UtilityEvaluator`/`UtilityEvaluatorPrimary` + DCR/NNDR privacy
    sweep over the dump dirs (:1075-1110).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import numpy as np

from gemm_gan_tpu.config import ExperimentConfig
from gemm_gan_tpu.data.loader import Batches
from gemm_gan_tpu.eval.detection import compute_evaluation_metrics, detection
from gemm_gan_tpu.eval.gamma import gamma_coef
from gemm_gan_tpu.eval.privacy import dcr, nndr
from gemm_gan_tpu.eval.utility import UtilityEvaluator, UtilityEvaluatorPrimary, save_run_artifacts
from gemm_gan_tpu.train.checkpoint import restore_state, save_state
from gemm_gan_tpu.train.wgan import WGANGPEngine
from gemm_gan_tpu.utils.metrics import EpochProfileWindow, MetricLogger


def _host_subsample_patches(split: Dict, num_patches: int, seed: int) -> Dict:
    """One-time seeded host subsample of a full-width patch bank to
    `num_patches` valid patches per case (zero-padded + masked below that).
    Used for the val/test loaders under `data.shard_bank`, where keeping
    their full-width banks on one chip would defeat the sharding."""
    if "patches" not in split or split["patches"].shape[1] <= num_patches:
        return split
    rng = np.random.RandomState(seed)
    pats, masks = split["patches"], split["patch_mask"]
    n = len(pats)
    out_p = np.zeros((n, num_patches) + pats.shape[2:], pats.dtype)
    out_m = np.zeros((n, num_patches), bool)
    for i in range(n):
        valid = np.flatnonzero(masks[i])
        sel = (rng.choice(valid, num_patches, replace=False)
               if len(valid) > num_patches else valid)
        out_p[i, :len(sel)] = pats[i, sel]
        out_m[i, :len(sel)] = True
    out = dict(split)
    out["patches"], out["patch_mask"] = out_p, out_m
    return out


def val_score(rec: Dict) -> float:
    """Scalar quality of one validation record, higher = better:
    (1 - detection accuracy) + precision + recall + coverage.

    Captures realism (detection falling toward chance) AND coverage — the
    measured late-run failure mode in the drift regime is mode-sharpening
    (recall/coverage collapse while precision holds; BASELINE.md
    canonical-width narrative) — so the earliest gate-clearing eval scores
    highest. Works for both validation modes: the host battery
    (`detection` + `compute_evaluation_metrics`) and the on-device proxy
    (kNN detection + PRDC) record the same keys."""
    # explicit detector choice (ADVICE r4): "LR" in host-battery mode,
    # "KNN" in the on-device-proxy mode — never dict insertion order, so
    # reordering the classifier suite cannot change checkpoint selection
    det_d = rec["detection"]
    det = (det_d.get("LR") or det_d.get("KNN")
           or next(iter(det_d.values())))["accuracy"]
    m = rec["metrics"]
    return float((1.0 - det) + m["precision"] + m["recall"]
                 + m.get("coverage", 0.0))


def _balanced_indices(disease: np.ndarray, max_oversample: int, rng) -> np.ndarray:
    """Class-balanced oversampling capped at max_oversample x
    (parity: conditional_gan_concat.py:465-482)."""
    classes, counts = np.unique(disease, return_counts=True)
    max_count = counts.max()
    out = []
    for cls, cnt in zip(classes, counts):
        idx = np.where(disease == cls)[0]
        target = min(max_count, cnt * max_oversample)
        reps = rng.choice(idx, target, replace=True) if target > cnt else idx
        out.append(reps)
    out = np.concatenate(out)
    rng.shuffle(out)
    return out


class Experiment:
    """Reference experiment protocol; single- OR multi-process.

    Multi-process contract (every process constructs the Experiment with the
    SAME full `splits` and the shared global mesh):

      * training is process-sharded: each process feeds its contiguous
        sub-block of every global batch (`Batches(shard_mode="batch")`), so
        the assembled global batch stream is IDENTICAL to the single-process
        run's — or, under `data.shard_bank`, contributes its contiguous case
        slice to the `ShardedDeviceCache`;
      * validation/test generation is divided by global batch index — rank
        k%P generates batch k with the same fold_in keys the single-process
        path uses, on host-local params — and reassembled with an
        allgather, so every rank holds the full real/fake arrays;
      * the host metric suites, npy dumps, curves, logs run on RANK 0 ONLY
        (`fit()`/`evaluate()` return the results dict there, `{}` on other
        ranks); checkpoint save/restore is collective (Orbax multi-host).

    Reference protocol being reproduced: conditional_gan_concat.py:664-832,
    869-1015 (the reference itself is single-GPU only — SURVEY.md §2.5).
    """

    def __init__(self, cfg: ExperimentConfig, splits: Dict, mesh=None):
        import jax

        self.nproc = jax.process_count()
        self.pid = jax.process_index()
        self.is_main = self.pid == 0
        if self.nproc > 1 and mesh is None:
            raise ValueError("multi-process Experiment requires the global mesh")
        self.cfg = cfg
        self.splits = splits
        t = cfg.train
        self._local_sample = None
        if self.nproc > 1:
            if t.batch_size % self.nproc:
                raise ValueError(
                    f"global batch_size {t.batch_size} must divide evenly "
                    f"across {self.nproc} processes")
            per_host_b = t.batch_size // self.nproc

            if cfg.data.shard_bank:
                from gemm_gan_tpu.data.device_cache import ShardedDeviceCache

                tr = splits["train"]
                n = len(tr["genes"])
                # equal contiguous case slices per process (trailing
                # remainder dropped — the sharded bank needs equal shards)
                per = n // self.nproc
                sl = slice(self.pid * per, (self.pid + 1) * per)
                local = {k: v[sl] for k, v in tr.items()}
                train_loader = ShardedDeviceCache(
                    local, t.batch_size, mesh=mesh,
                    num_patches=cfg.data.num_patches, seed=t.seed,
                    embedding_store_dtype=cfg.data.embedding_store_dtype)
            else:
                train_loader = Batches(
                    splits["train"], per_host_b, seed=t.seed, shuffle=True,
                    drop_remainder=False, process_index=self.pid,
                    process_count=self.nproc, shard_mode="batch")
            self.loaders = {"train": train_loader}

            # generation loaders mirror the single-process host loaders
            # exactly (same batch_size/seed/shuffle), full split on every
            # rank; only the per-batch generation work is divided. Under
            # shard_bank they mirror the single-process shard_bank eval
            # path instead: a one-time host patch subsample to num_patches
            # (full-width banks would reintroduce the per-rank attention
            # memory cliff shard_bank exists to remove), and train trimmed
            # to the cases the sharded bank actually trained (equal slices,
            # remainder dropped above).
            def gen_split(name):
                s = splits[name]
                if cfg.data.shard_bank:
                    if name == "train":
                        n_tr = len(s["genes"])
                        keep = (n_tr // self.nproc) * self.nproc
                        if keep < n_tr:
                            s = {k: v[:keep] for k, v in s.items()}
                    s = _host_subsample_patches(s, cfg.data.num_patches, t.seed)
                return s

            self.gen_loaders = {
                name: Batches(gen_split(name), t.batch_size, seed=t.seed,
                              shuffle=(name == "train"), drop_remainder=False)
                for name in ("train", "val", "test") if name in splits}
        elif cfg.data.shard_bank and mesh is not None:
            # bank sharded over the mesh `data` axis: per-chip residency
            # bank/S, shard-local gathers, streaming epoch scan. Train only;
            # val/test take a replicated DeviceCache over a ONE-TIME host
            # patch subsample to num_patches — their full-width banks would
            # reintroduce the per-chip residency cliff shard_bank exists to
            # remove, and at num_patches width the eval banks are tiny.
            # (Divergence note: eval-time patch subsets are frozen per run
            # here instead of redrawn per pass; training keeps fresh
            # per-step draws.)
            from gemm_gan_tpu.data.device_cache import (DeviceCache,
                                                        ShardedDeviceCache)

            def make(name):
                if name == "train":
                    return ShardedDeviceCache(
                        splits[name], t.batch_size, mesh=mesh,
                        num_patches=cfg.data.num_patches, seed=t.seed,
                        embedding_store_dtype=cfg.data.embedding_store_dtype)
                return DeviceCache(
                    _host_subsample_patches(splits[name],
                                            cfg.data.num_patches, t.seed),
                    t.batch_size, num_patches=cfg.data.num_patches,
                    seed=t.seed, shuffle=False, drop_remainder=False,
                    embedding_store_dtype=cfg.data.embedding_store_dtype)
        elif cfg.data.cache_on_device and mesh is None:
            # HBM-resident cache: jitted gathers + fresh on-device patch
            # subsampling per step (SURVEY.md §7 decision 2). With a mesh the
            # host path is kept — batches get resharded by the engine.
            from gemm_gan_tpu.data.device_cache import DeviceCache

            def make(name):
                return DeviceCache(splits[name], t.batch_size,
                                   num_patches=cfg.data.num_patches,
                                   seed=t.seed, shuffle=(name == "train"),
                                   drop_remainder=False,
                                   embedding_store_dtype=cfg.data.embedding_store_dtype)
        else:
            def make(name):
                # drop_remainder=False for parity with the reference's
                # DataLoader(drop_last=False): ragged tails train/evaluate
                # instead of vanishing, and tiny splits still yield a batch
                return Batches(splits[name], t.batch_size, seed=t.seed,
                               shuffle=(name == "train"), drop_remainder=False)
        if self.nproc == 1:
            self.loaders = {name: make(name)
                            for name in ("train", "val", "test") if name in splits}
            self.gen_loaders = self.loaders
        self.engine = WGANGPEngine(cfg, steps_per_epoch=len(self.loaders["train"]),
                                   mesh=mesh)
        self.out_dir = os.path.join(cfg.output_dir, cfg.run_name)
        os.makedirs(self.out_dir, exist_ok=True)
        self.logger = MetricLogger(self.out_dir, cfg.run_name) if self.is_main else None
        self.val_metrics_history = []
        # gate-best validation checkpoint tracking ({score, epoch, step};
        # rank-0 view — see _maybe_save_best)
        self._best = None

    # --------------------------------------------------- multi-process helpers
    def _state_for_save(self, state):
        """Single-process: host copy (existing behavior). Multi-process: the
        global (possibly sharded) arrays — Orbax's multi-host path saves each
        process's addressable shards; all ranks must call save/restore."""
        return jax.device_get(state) if self.nproc == 1 else state

    def _host_tree(self, tree):
        """Full host-numpy copy of a (possibly globally-sharded) pytree."""
        def one(x):
            if (self.nproc > 1 and isinstance(x, jax.Array)
                    and not x.is_fully_replicated):
                from jax.experimental import multihost_utils

                return np.asarray(multihost_utils.process_allgather(x, tiled=True))
            return np.asarray(jax.device_get(x))

        return jax.tree.map(one, tree)

    def _generate_all(self, state, key, loader, epoch, num_repeats: int = 1,
                      device_out: bool = False, batches=None):
        """`generate_samples_all` over a full-split loader (or an explicit
        `batches` iterable overriding `loader.epoch(epoch)` — used by the
        capped validation regen, `eval.validation_max_cases`).

        Single-process: delegates to the engine (scan path per config).
        Multi-process: every rank enumerates the SAME global batch list;
        rank k%P generates batch k per-call on HOST-LOCAL params with the
        identical `fold_in(fold_in(key, k), r)` keys the single-process
        (and scan — bitwise-parity-tested) paths use, then the fake rows
        are reassembled with one allgather-sum. Every rank returns the full
        arrays; real/labels are assembled locally (each rank holds the full
        split). Sample-for-sample IDENTICAL to the single-process output up
        to fp summation order of the training that produced the params.
        """
        ev = self.cfg.eval
        if batches is None:
            # callable: the engine streams one gathered batch at a time off
            # a device-resident loader instead of materializing the epoch
            # on device (measured chip OOM at canonical width otherwise)
            batches = lambda: loader.epoch(epoch)  # noqa: E731
        if self.nproc == 1:
            return self.engine.generate_samples_all(
                state, key, batches, num_repeats=num_repeats,
                scan=ev.scan_sampling, device_out=device_out)
        if device_out:
            raise NotImplementedError(
                "device_out generation is single-process only; multi-process "
                "validation uses the host metric path")
        from jax.experimental import multihost_utils

        from gemm_gan_tpu.train.wgan import cond_of

        batches = list(batches() if callable(batches) else batches)
        params = self._host_tree(self.engine._gen_params(state, None))
        if self._local_sample is None:
            # the engine's per-call sampler, jitted process-locally (host
            # params + host conds -> runs on this process's devices only)
            self._local_sample = self.engine._build_sample()
        sizes = [b["genes"].shape[0] for b in batches]
        offsets = np.concatenate([[0], np.cumsum(sizes)])
        n_rows = int(offsets[-1])
        n_genes = batches[0]["genes"].shape[1]
        reals, diseases, sites = [], [], []
        mine = []  # this rank's generated rows, in (repeat, batch) order
        for r in range(num_repeats):
            for k_idx, batch in enumerate(batches):
                reals.append(np.asarray(batch["genes"]))
                if "disease" in batch:
                    diseases.append(np.asarray(batch["disease"]))
                if "site" in batch:
                    sites.append(np.asarray(batch["site"]))
                if k_idx % self.nproc != self.pid:
                    continue
                sub = jax.random.fold_in(jax.random.fold_in(key, k_idx), r)
                mine.append(np.asarray(self._local_sample(
                    params, sub, cond_of(batch), n=sizes[k_idx])))
        # compact reassembly: the batch->rank assignment (k % P) and all row
        # counts are deterministic and known to every rank, so each rank
        # gathers only its OWN generated rows (padded to the max per-rank
        # count) — ~1/P the wire bytes and host memory of allgathering a
        # full zero-filled [num_repeats*N, G] buffer from every rank
        counts = [num_repeats * int(sum(sizes[k] for k in range(len(sizes))
                                        if k % self.nproc == p))
                  for p in range(self.nproc)]
        buf = np.zeros((max(counts), n_genes), np.float32)
        if mine:
            local = np.concatenate(mine)
            buf[:local.shape[0]] = local
        gathered = np.asarray(multihost_utils.process_allgather(buf))
        fakes = np.empty((num_repeats * n_rows, n_genes), np.float32)
        cursor = [0] * self.nproc
        for r in range(num_repeats):
            for k_idx in range(len(sizes)):
                p = k_idx % self.nproc
                s = r * n_rows + int(offsets[k_idx])
                fakes[s:s + sizes[k_idx]] = \
                    gathered[p, cursor[p]:cursor[p] + sizes[k_idx]]
                cursor[p] += sizes[k_idx]
        out = {"real": np.concatenate(reals), "fake": fakes}
        if diseases:
            out["disease"] = np.concatenate(diseases)
        if sites:
            out["site"] = np.concatenate(sites)
        return out

    # ----------------------------------------------------------------- train
    def fit(self, resume: bool = False, profile_dir: str = None,
            profile_epochs: int = 1) -> Dict:
        """`resume=True`: continue an interrupted run from the newest full
        train-state checkpoint under this run dir (params, BOTH optimizer
        states, EMA, step counter, PRNG key — `train/checkpoint.py`). The
        continued run is exact: epochs-done is recovered from the saved
        step counter, both loader types replay epoch e's batch stream from
        epoch-indexed seeds, and validation keys are epoch-folded. The
        reference cannot do this at all (only final-epoch G/D state_dicts
        are saved — SURVEY.md §5). No checkpoint found = fresh start.

        `profile_dir`: capture a `jax.profiler` trace of `profile_epochs`
        steady-state training epochs — the window opens after the FIRST
        epoch of this call (its XLA compiles excluded), so it needs >=2
        epochs to produce a trace. Aggregate the result with
        `utils.metrics.aggregate_device_trace` (the `cli.train
        --profile_dir` path prints the tables). Beyond reference: the
        reference has no profiling story (SURVEY.md §5)."""
        cfg, t = self.cfg, self.cfg.train
        eng = self.engine
        sample_batch = next(iter(self.loaders["train"].epoch(0)))
        state = eng.init_state(t.seed, sample_batch)
        # validation/test RNG is folded per epoch, so a resumed run draws
        # the same eval keys the uninterrupted run would
        key = jax.random.key(t.seed + 1)

        # scan path needs >=1 full batch per epoch; tiny splits take the
        # per-batch path instead of crashing inside the epoch spec. A
        # DeviceCache takes the STREAMING scan (batches gathered from the
        # HBM bank inside the scan body, O(bank + one batch) memory); a host
        # Batches loader takes the materialized stacked_epoch variant.
        train = self.loaders["train"]
        scan_cache = None
        stacked_fn = None
        if train.n_full_batches:
            if hasattr(train, "assemble_fn") or hasattr(train, "gather_fn"):
                scan_cache = train           # DeviceCache / ShardedDeviceCache
            else:
                stacked_fn = train.stacked_epoch
        use_scan = scan_cache is not None or stacked_fn is not None
        steps_per_epoch = train.n_full_batches if use_scan else len(train)

        start_epoch = 0
        ckpt_dir = os.path.join(self.out_dir, "ckpt")
        if not resume and self.is_main:
            # a FRESH fit into a previously-used out_dir must not inherit
            # the old run's gate-best state: clear ckpt_best/ + best.json so
            # this run's best can never lose to a stale checkpoint
            # (ADVICE r4). Saves are collective but deletion here races
            # nothing — no rank has saved yet.
            import shutil

            best_ckpt = os.path.join(self.out_dir, "ckpt_best")
            if os.path.isdir(best_ckpt):
                shutil.rmtree(best_ckpt)
            best_json = os.path.join(self.out_dir, "best.json")
            if os.path.exists(best_json):
                os.remove(best_json)
        if resume:
            from gemm_gan_tpu.train.checkpoint import resume_or_fresh

            state, start_epoch = resume_or_fresh(
                ckpt_dir, state, steps_per_epoch, t.epochs, loader=train)
            if start_epoch:
                # rehydrate pre-crash validation history so the final
                # curves/log cover the whole run, not just the resumed tail
                hist_path = os.path.join(self.out_dir, "val_metrics.json")
                if os.path.exists(hist_path):
                    with open(hist_path) as f:
                        self.val_metrics_history = [
                            r for r in json.load(f)
                            if r["epoch"] < start_epoch]
                # ... and the best-checkpoint record, so the resumed tail
                # only overwrites ckpt_best when it genuinely beats the
                # pre-crash peak
                best_path = os.path.join(self.out_dir, "best.json")
                if os.path.exists(best_path):
                    with open(best_path) as f:
                        self._best = json.load(f)

        prof = EpochProfileWindow(profile_dir if self.is_main else None,
                                  profile_epochs)

        def on_epoch_end(engine, state, epoch):
            prof.on_epoch_end(epoch)
            last = (epoch == t.epochs - 1)
            if (epoch + 1) % t.freq_compute_test == 0 and not last:
                sub = jax.random.fold_in(key, epoch)
                rec = self._validation_eval(state, sub, epoch)
                if t.checkpoint_every_eval:
                    save_state(ckpt_dir, self._state_for_save(state))
                self._maybe_save_best(state, rec, epoch)
            return None

        try:
            state = eng.fit(state, t.epochs, lambda: train.epoch(),
                            on_epoch_end=on_epoch_end, logger=self.logger,
                            stacked_fn=stacked_fn, scan_cache=scan_cache,
                            start_epoch=start_epoch)
        finally:
            prof.close()
        self.profile_captured = prof.captured
        self.state = state
        save_state(ckpt_dir, self._state_for_save(state))
        self._plot_val_curves()
        results = self._test_block(state)
        return results

    def _validation_eval(self, state, key, epoch):
        """Periodic detection + metric eval on train vs val regeneration
        (parity: conditional_gan_concat.py:664-689).

        With `eval.on_device_validation` the pass runs as a device-side
        proxy: generation keeps the profile matrices on the chip
        (`device_out=True`) and a kNN detection two-sample test + PRDC are
        computed from them — only scalars and the [N, k] neighbour indices
        are fetched, instead of the full train+val matrices (~GBs at TCGA
        scale through a ~15 MB/s tunnel). The final test block always runs
        the full host classifier suite."""
        ev = self.cfg.eval
        k1, k2 = jax.random.split(key)
        scan = ev.scan_sampling

        def train_batches(loader):
            """The train-side regen stream (a fresh-iterable CALLABLE — the
            engine streams device-resident batches instead of materializing
            the epoch), capped at `eval.validation_max_cases` cases (None =
            full split, the reference behavior)."""
            if ev.validation_max_cases is None:
                return lambda: loader.epoch(epoch)
            import itertools

            # the cap divides by the LOADER's own batch size (ADVICE r4):
            # today every loader here is built with train.batch_size, but a
            # future gen-loader batch-size change must not silently scale
            # the regenerated case count
            b = getattr(loader, "batch_size", self.cfg.train.batch_size)
            n_b = max(1, ev.validation_max_cases // b)
            return lambda: itertools.islice(loader.epoch(epoch), n_b)

        if self.nproc > 1:
            # multi-process: collective sharded generation, rank-0-only
            # host metrics/writes (the on-device proxy is single-process)
            train_out = self._generate_all(
                state, k1, self.gen_loaders["train"], epoch,
                batches=train_batches(self.gen_loaders["train"]))
            val_out = self._generate_all(state, k2, self.gen_loaders["val"],
                                         epoch)
            if not self.is_main:
                return None
            det = detection(train_out["real"], train_out["fake"],
                            val_out["real"], val_out["fake"])
            metrics = compute_evaluation_metrics(
                train_out["real"], train_out["fake"],
                val_out["real"], val_out["fake"], nn=ev.nearest_k,
                n_components=min(ev.pca_components,
                                 train_out["real"].shape[0] - 1))
        elif ev.on_device_validation:
            from gemm_gan_tpu.eval.detection import knn_detection
            from gemm_gan_tpu.eval.prdc import compute_prdc

            train_out = self.engine.generate_samples_all(
                state, k1, train_batches(self.loaders["train"]), scan=scan,
                device_out=True)
            val_out = self.engine.generate_samples_all(
                state, k2, self.loaders["val"].epoch(epoch), scan=scan,
                device_out=True)
            det = knn_detection(train_out["real"], train_out["fake"],
                                val_out["real"], val_out["fake"])
            metrics = compute_prdc(train_out["real"], train_out["fake"],
                                   nearest_k=ev.nearest_k)
        else:
            train_out = self.engine.generate_samples_all(
                state, k1, train_batches(self.loaders["train"]), scan=scan)
            val_out = self.engine.generate_samples_all(
                state, k2, self.loaders["val"].epoch(epoch), scan=scan)
            det = detection(train_out["real"], train_out["fake"],
                            val_out["real"], val_out["fake"])
            metrics = compute_evaluation_metrics(
                train_out["real"], train_out["fake"],
                val_out["real"], val_out["fake"],
                nn=ev.nearest_k,
                n_components=min(ev.pca_components,
                                 train_out["real"].shape[0] - 1))
        rec = {"epoch": epoch, "detection": det, "metrics": metrics}
        self.val_metrics_history.append(rec)
        # persisted after every eval so a resumed run can rehydrate the
        # pre-crash history (fit(resume=True)) and the curves stay complete
        with open(os.path.join(self.out_dir, "val_metrics.json"), "w") as f:
            json.dump(self.val_metrics_history, f, indent=2, default=float)
        det_first = next(iter(det.values()))
        self.logger.log(epoch, val_detection_acc=det_first["accuracy"],
                        val_precision=metrics["precision"],
                        val_recall=metrics["recall"])
        return rec

    def _maybe_save_best(self, state, rec, epoch):
        """Track the gate-best validation checkpoint in `ckpt_best/`.

        The measured drift regime makes this necessary (VERDICT r3 weak #3):
        at canonical width quality peaks at the earliest gate-clearing eval
        and degrades monotonically afterward (mode-sharpening recall
        collapse — BASELINE.md), so the reference's restore-the-final-
        checkpoint semantics ship the WORST evaluated model. Whenever a
        validation eval scores strictly above the best so far (`val_score`:
        strictly-greater keeps the EARLIEST peak on ties), the full train
        state is saved to `ckpt_best/` and `best.json` records
        {score, epoch, step}. `evaluate(which="best")` restores it;
        the default `which="last"` keeps reference semantics.

        Multi-process: `rec` exists on rank 0 only, but Orbax saves are
        collective — the decision is broadcast so every rank calls
        `save_state` together."""
        score = val_score(rec) if rec is not None else None
        new_best = score is not None and (self._best is None
                                          or score > self._best["score"])
        if self.nproc > 1:
            from jax.experimental import multihost_utils

            flag = multihost_utils.broadcast_one_to_all(
                np.asarray([1 if new_best else 0], np.int32))
            new_best = bool(flag[0])
        if not new_best:
            return
        step = save_state(os.path.join(self.out_dir, "ckpt_best"),
                          self._state_for_save(state))
        if self.is_main:
            # "epoch" = epochs COMPLETED at this checkpoint (epoch index +
            # 1) — the same number evaluate() derives from the restored
            # step and uses in its test_*_epoch_{E} dump-dir names, so
            # best["epoch"] feeds posthoc_utility(epoch=...) directly;
            # "eval_epoch" keeps the 0-indexed val_metrics_history index
            self._best = {"score": float(score), "epoch": int(epoch) + 1,
                          "eval_epoch": int(epoch), "step": int(step)}
            with open(os.path.join(self.out_dir, "best.json"), "w") as f:
                json.dump(self._best, f, indent=2)

    def _plot_val_curves(self):
        """Validation metric curves (parity: :710-729)."""
        if not self.val_metrics_history or not self.is_main:
            return
        from gemm_gan_tpu.viz import plot_curves

        hist = {
            # "LR" in host mode; "KNN" in on-device-proxy mode
            "detection_acc": [next(iter(r["detection"].values()))["accuracy"]
                              for r in self.val_metrics_history],
            "precision": [r["metrics"]["precision"] for r in self.val_metrics_history],
            "recall": [r["metrics"]["recall"] for r in self.val_metrics_history],
            "coverage": [r["metrics"]["coverage"] for r in self.val_metrics_history],
        }
        plot_curves(hist, os.path.join(self.out_dir, "validation_metrics.png"),
                    title="validation metrics")

    # ------------------------------------------------------------------ test
    def _test_block(self, state, epoch: Optional[int] = None) -> Dict:
        """n_runs test repetitions + artifact dumps + per-run metrics
        (parity: :732-832)."""
        cfg, t, ev = self.cfg, self.cfg.train, self.cfg.eval
        epoch = t.epochs if epoch is None else epoch
        rng = np.random.RandomState(t.seed)
        key = jax.random.key(t.seed + 2)
        all_results = []
        has_labels = "disease" in self.splits["train"]

        for run in range(ev.n_runs):
            key, k1, k2 = jax.random.split(key, 3)
            train_out = self._generate_all(state, k1, self.gen_loaders["train"],
                                           run)
            test_out = self._generate_all(state, k2, self.gen_loaders["test"],
                                          run)
            if not self.is_main:
                continue  # generation is collective; metrics/dumps are not

            run_dir = os.path.join(self.out_dir, f"test_{run}_epoch_{epoch}")
            arrays = {
                "data_real": train_out["real"], "data_gen": train_out["fake"],
                "test_real": test_out["real"], "test_gen": test_out["fake"],
            }
            if has_labels:
                arrays.update({
                    "train_labels_real": train_out["disease"],
                    "train_labels_gen": train_out["disease"],
                    "test_labels_real": test_out["disease"],
                    "test_labels_gen": test_out["disease"],
                })
                if "site" in train_out:
                    arrays.update({
                        "train_labels_primary_site_real": train_out["site"],
                        "train_labels_primary_site_gen": train_out["site"],
                        "test_labels_primary_site_real": test_out["site"],
                        "test_labels_primary_site_gen": test_out["site"],
                    })
            save_run_artifacts(run_dir, arrays)

            pr_at_k = {}
            if ev.pr_nhood_sizes:
                # vanilla-variant extra: kNN P/R at each k on the test-set
                # real-vs-gen pair (vanilla_gan_unconditional.py:517-524).
                # nhood sizes must fit the manifold (k-th neighbor exists)
                from gemm_gan_tpu.eval.knn_pr import knn_precision_recall_features

                n_ref = min(test_out["real"].shape[0], test_out["fake"].shape[0])
                ks = tuple(k for k in ev.pr_nhood_sizes if k < n_ref)
                if ks:
                    state_pr = knn_precision_recall_features(
                        test_out["real"], test_out["fake"], nhood_sizes=ks)
                    for i, k in enumerate(ks):
                        pr_at_k[f"precision@{k}"] = float(state_pr["precision"][i])
                        pr_at_k[f"recall@{k}"] = float(state_pr["recall"][i])

            res = {
                "gamma": float(gamma_coef(test_out["real"], test_out["fake"])),
                **pr_at_k,
                "detection": detection(train_out["real"], train_out["fake"],
                                       test_out["real"], test_out["fake"]),
                "metrics": compute_evaluation_metrics(
                    train_out["real"], train_out["fake"],
                    test_out["real"], test_out["fake"], nn=ev.nearest_k,
                    n_components=min(ev.pca_components,
                                     train_out["real"].shape[0] - 1)),
            }
            all_results.append(res)

        if not self.is_main:
            return {}
        summary = {
            "gamma_mean": float(np.mean([r["gamma"] for r in all_results])),
            "gamma_std": float(np.std([r["gamma"] for r in all_results])),
            "runs": all_results,
        }
        return summary

    # -------------------------------------------------------------- evaluate
    def evaluate(self, which: str = "last") -> Dict:
        """Restore checkpoint and rerun the test block (parity: :869-1015).

        `which="last"` (default, reference semantics
        /root/reference/src/conditional_gan_concat.py:869-877) restores the
        newest full-state checkpoint; `which="best"` restores the gate-best
        validation checkpoint tracked by `_maybe_save_best` — at canonical
        width the measured drift makes "best" the model a user actually
        wants (BASELINE.md; VERDICT r3 weak #3). CLI: `cli.train
        --evaluate_only --evaluate_which best`.

        Dump dirs are named by the EPOCH the restored step corresponds to
        (the reference hardcodes `test_{run}_epoch_500`, i.e. the final
        epoch, and overwrites fit's dumps with the regenerated equivalents —
        :907-917; the regeneration is bitwise-identical after a full-run
        restore, proven on-chip in BASELINE.md "dress rehearsal").

        Multi-process: restore is collective (every rank calls with the
        global-array template so Orbax re-places shards); the returned
        summary is rank-0-only (`{}` elsewhere)."""
        from gemm_gan_tpu.train.checkpoint import resolve_ckpt_dir

        # which="best" resolves to ckpt_best/ AND pins the restore step to
        # best.json's record — latest_step(ckpt_best) could otherwise prefer
        # a stale higher-step checkpoint left by a previous run in the same
        # out_dir (ADVICE r4)
        ckpt_dir, step = resolve_ckpt_dir(os.path.join(self.out_dir, "ckpt"),
                                          which)
        sample_batch = next(iter(self.loaders["train"].epoch(0)))
        template = self._state_for_save(
            self.engine.init_state(self.cfg.train.seed, sample_batch))
        state = restore_state(ckpt_dir, template, step=step)
        # same steps-per-epoch accounting as fit()/resume_or_fresh: the scan
        # path counts full batches per epoch, the per-batch path counts all
        train = self.loaders["train"]
        steps_per_epoch = train.n_full_batches or len(train)
        epoch = min(int(jax.device_get(state.step)) // max(steps_per_epoch, 1),
                    self.cfg.train.epochs)
        return self._test_block(state, epoch=epoch)

    # -------------------------------------------------------------- post-hoc
    def posthoc_utility(self, epoch: Optional[int] = None) -> Dict:
        """UtilityEvaluator + primary-site variant over the dumps
        (parity: :1075-1083). `epoch` filters to one epoch's dump dirs —
        pass the best epoch (best.json) to score only the
        `evaluate(which="best")` artifacts when a run dir holds dumps from
        several checkpoints."""
        if not self.is_main:
            return {}
        pattern = "test_*" if epoch is None else f"test_*_epoch_{epoch}"
        out = {}
        ev = UtilityEvaluator(self.out_dir, pattern=pattern)
        if ev.results_dirs:
            ev.evaluate()
            out["disease"] = ev.report()
        evp = UtilityEvaluatorPrimary(self.out_dir, pattern=pattern)
        try:
            if evp.results_dirs:
                evp.evaluate()
                out["primary_site"] = evp.report()
        except FileNotFoundError:
            pass
        return out

    def posthoc_privacy(self, epoch: Optional[int] = None) -> Dict:
        """DCR/NNDR over each test_* dir (parity: :1096-1110); `epoch`
        filters like `posthoc_utility`."""
        if not self.is_main:
            return {}
        from glob import glob

        pattern = "test_*" if epoch is None else f"test_*_epoch_{epoch}"
        train_real = self.splits["train"]["genes"]
        results = {"dcr": [], "nndr": []}
        for d in sorted(glob(os.path.join(self.out_dir, pattern))):
            gen = np.load(os.path.join(d, "data_gen.npy"))
            test_real = np.load(os.path.join(d, "test_real.npy"))
            results["dcr"].append(dcr(train_real, gen, test_real))
            results["nndr"].append(nndr(train_real, gen, test_real))
        return {k: (float(np.mean(v)), float(np.std(v)))
                for k, v in results.items() if v}

    def generate_balanced(self, state, key, num_repeats: int = 1,
                          host_dtype=None) -> Dict:
        """Balanced oversampled generation (parity: :453-516). `host_dtype`
        forwards to `generate_samples_all` (device-side cast before fetch)."""
        t, ev = self.cfg.train, self.cfg.eval
        data = self.splits["train"]
        rng = np.random.RandomState(t.seed)
        idx = _balanced_indices(data["disease"], ev.balanced_max_oversample, rng)
        balanced = {k: v[idx] for k, v in data.items()}
        loader = Batches(balanced, 64, seed=t.seed, shuffle=False,
                         drop_remainder=False)
        if self.nproc > 1:
            # sharded-by-batch generation; host_dtype is a wire-size knob
            # for the engine fetch path and does not apply here
            return self._generate_all(state, key, loader, 0,
                                      num_repeats=num_repeats)
        return self.engine.generate_samples_all(state, key,
                                                lambda: loader.epoch(0),
                                                num_repeats=num_repeats,
                                                scan=ev.scan_sampling,
                                                host_dtype=host_dtype)
