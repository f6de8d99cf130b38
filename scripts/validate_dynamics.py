"""Training-dynamics validation of the production configuration (single chip).

Trains the flagship variant (FiLM + patch CLS transformer + bidirectional CLS
cross-attention) with the production performance settings — tuned flash
blocks, `cond_embed_reuse="per_update"`, ε-drift anchor — on structured
synthetic data (low-rank gene-gene correlation + label-dependent means,
TCGA-scale case count) and checks that the fast path trains, not just runs:

  * critic scores stay bounded (no long-horizon runaway);
  * the generator learns structure: PRDC precision/density well above zero,
    Γ correlation > 0 on a held-out split;
  * detection accuracy falls toward chance as training progresses;
  * the CONDITIONING steers generation (not just marginals): TSTR transfer
    accuracy above the majority-class rate + per-class mean alignment vs a
    label-shuffled control (eval/utility.py; VERDICT r3 missing #1).

    python -u scripts/validate_dynamics.py [--epochs 60] [--cases 2048]

Prints one JSON line per evaluation epoch and a final verdict line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# shared with tests/test_dynamics_acceptance.py (the CPU-sized statistical
# acceptance test of the same regime)
from gemm_gan_tpu.data.synthetic import structured_dataset  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--cases", type=int, default=2048)
    ap.add_argument("--genes", type=int, default=2000)
    ap.add_argument("--eval-every", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=None,
                    help="override train.batch_size (default: the canonical "
                         "preset's 8). Used to quality-gate the wide-batch "
                         "preset (B=64 measured +28% samples/s — BASELINE.md "
                         "batch-scaling row) the same way bf16 was gated: "
                         "batch size changes the optimization trajectory the "
                         "reference defined at B=8, so it needs its own gate")
    # reduced shapes for CPU smoke runs; defaults are canonical
    ap.add_argument("--patches", type=int, default=256)
    ap.add_argument("--patch-dim", type=int, default=1024)
    ap.add_argument("--tokens", type=int, default=300)
    ap.add_argument("--text-dim", type=int, default=768)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the container pins "
                         "JAX_PLATFORMS=axon via sitecustomize, so an env "
                         "prefix does NOT stick — CLAUDE.md)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model.compute_dtype: bfloat16 runs dense "
                         "projections at the bf16 MXU rate (critic head/GP "
                         "stay f32 — models/gan.py); this script is the "
                         "quality gate for flipping it on (CLAUDE.md warns "
                         "of WGAN critic-stability risk)")
    ap.add_argument("--ema", type=float, default=0.0,
                    help=">0 tracks an EMA generator (train.ema_decay) and "
                         "evaluates with it — holds sample quality through "
                         "the long-horizon drift the raw generator shows "
                         "(CLAUDE.md training dynamics)")
    ap.add_argument("--critic-scan", action="store_true",
                    help="train.critic_scan=True: lax.scan the critic loop "
                         "(same numerics, ~2.5x faster remote compile)")
    ap.add_argument("--on-device-eval", action="store_true",
                    help="evaluate with the device-side proxy (device_out "
                         "generation + kNN detection + device PRDC): only "
                         "scalars leave the chip")
    args = ap.parse_args()

    import dataclasses

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # bounded probe: jax.devices() hangs while the tunnel is down
        from gemm_gan_tpu.utils.backend import wait_for_backend

        if not wait_for_backend():
            sys.exit("validate_dynamics: accelerator backend unavailable "
                     "(tunnel down?); refusing to hang")

    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.data.device_cache import DeviceCache
    from gemm_gan_tpu.eval.detection import detection
    from gemm_gan_tpu.eval.gamma import gamma_coef
    from gemm_gan_tpu.eval.prdc import compute_prdc
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    t0 = time.time()
    n_test = max(min(256, args.cases), args.cases // 8)
    data = structured_dataset(args.cases + n_test, n_genes=args.genes,
                              num_patches=args.patches, patch_dim=args.patch_dim,
                              num_tokens=args.tokens, text_dim=args.text_dim)
    train = {k: v[:args.cases] for k, v in data.items()}
    test = {k: v[args.cases:] for k, v in data.items()}
    mu, sd = train["genes"].mean(0), train["genes"].std(0) + 1e-8
    train["genes"] = (train["genes"] - mu) / sd
    test["genes"] = (test["genes"] - mu) / sd

    fusion_kw = {}
    if args.patch_dim != 1024 or args.text_dim != 768:
        fusion_kw = dict(patch_dim=args.patch_dim, text_dim=args.text_dim,
                         cond_dim=64, ff_dim=128)
    cfg = variant_config("film_cross_attention", n_genes=args.genes,
                         fusion_kw=fusion_kw)
    train_kw = dict(cond_embed_reuse="per_update", drift_epsilon=1e-3,
                    critic_scan=args.critic_scan, ema_decay=args.ema)
    if args.batch_size is not None:
        train_kw["batch_size"] = args.batch_size
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, compute_dtype=args.dtype),
        train=dataclasses.replace(cfg.train, **train_kw))
    cache = DeviceCache(train, batch_size=cfg.train.batch_size, seed=0)
    test_cache = DeviceCache(test, batch_size=64, seed=0, shuffle=False,
                             drop_remainder=False)
    eng = WGANGPEngine(cfg, steps_per_epoch=cache.n_full_batches)
    state = eng.init_state(cfg.train.seed, next(iter(cache.epoch(0))))
    print(json.dumps({"event": "start", "cases": args.cases,
                      "genes": args.genes,
                      "steps_per_epoch": cache.n_full_batches}), flush=True)

    def evaluate(state, epoch):
        te0 = time.time()
        key = jax.random.key(1234 + epoch)
        h_real = test_cache.n // 2
        if args.on_device_eval:
            from gemm_gan_tpu.eval.detection import knn_detection

            out = eng.generate_samples_all(state, key, test_cache.epoch(0),
                                           device_out=True)
            real, fake = out["real"], out["fake"]
            prdc = compute_prdc(real, fake, nearest_k=10)
            det = knn_detection(real[:h_real], fake[:h_real],
                                real[h_real:], fake[h_real:])
            det_acc = float(det["KNN"]["accuracy"])
        else:
            out = eng.generate_samples_all(state, key, test_cache.epoch(0))
            real, fake = out["real"], out["fake"]
            prdc = compute_prdc(real, fake, nearest_k=10)
            det = detection(real[:h_real], fake[:h_real],
                            real[h_real:], fake[h_real:])
            det_acc = float(np.mean([v["accuracy"] for v in det.values()]))
        rec = {"event": "eval", "epoch": epoch,
               "eval_s": round(time.time() - te0, 1),
               "wall_s": round(time.time() - t0, 1),
               "gamma": round(float(gamma_coef(real, fake)), 4),
               "precision": round(float(prdc["precision"]), 4),
               "recall": round(float(prdc["recall"]), 4),
               "density": round(float(prdc["density"]), 4),
               "coverage": round(float(prdc["coverage"]), 4),
               "detection_acc": round(det_acc, 4)}
        if "disease" in out:
            # Conditional fidelity (VERDICT r3 missing #1): every metric
            # above measures MARGINAL distributions only — a generator that
            # ignores its condition passes them all. The flagship's patch/
            # token embeddings are class-correlated in this regime, so the
            # disease label is recoverable from the condition:
            #   * TSTR: classifier fit on (generated, label) from one case
            #     half transfers to REAL cases of the other half;
            #   * aligned/shuffled: per-class generated means track
            #     per-class real means vs a label-shuffled control.
            from gemm_gan_tpu.eval.utility import (class_mean_alignment,
                                                   tstr_transfer_accuracy)

            def fetch_chunked(a, rows: int = 256):
                """Per-chunk device->host fetch: a monolithic device_get of
                a big array moves ~2.7x slower over the tunnel than chunked
                (CLAUDE.md); numpy inputs pass through untouched."""
                if isinstance(a, np.ndarray):
                    return a
                return np.concatenate([np.asarray(a[i:i + rows])
                                       for i in range(0, a.shape[0], rows)])

            real_h, fake_h = fetch_chunked(real), fetch_chunked(fake)
            y = out["disease"]
            tstr = tstr_transfer_accuracy(fake_h[:h_real], y[:h_real],
                                          real_h[h_real:], y[h_real:])
            aligned, shuffled = class_mean_alignment(
                fake_h[:h_real], y[:h_real], real_h[h_real:], y[h_real:])
            chance = float(np.bincount(y).max() / len(y))  # majority rate
            rec.update(tstr=round(tstr, 4), tstr_chance=round(chance, 4),
                       aligned=round(aligned, 4), shuffled=round(shuffled, 4))
        print(json.dumps(rec), flush=True)
        return rec

    last = None
    for epoch in range(args.epochs):
        state, m = eng.step_many_cached(state, cache, epoch)
        d_loss = float(jax.device_get(m["d_loss"]))
        d_real = float(jax.device_get(m["d_real"]))
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            print(json.dumps({"event": "train", "epoch": epoch,
                              "wall_s": round(time.time() - t0, 1),
                              "d_loss": round(d_loss, 3),
                              "d_real": round(d_real, 3),
                              "gp": round(float(jax.device_get(m["gp"])), 4)}),
                  flush=True)
        assert np.isfinite(d_loss), f"non-finite critic loss at epoch {epoch}"
        assert abs(d_real) < 1e6, f"critic score runaway at epoch {epoch}: {d_real}"
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            last = evaluate(state, epoch + 1)

    ok = (last is not None and last["gamma"] > 0
          and last["precision"] > 0.2 and last["density"] > 0.05)
    if last is not None and "tstr" in last:
        # conditional fidelity: TSTR materially above the majority-class
        # rate AND per-class means aligned better than the shuffled control
        ok = (ok and last["tstr"] > 1.5 * last["tstr_chance"]
              and last["aligned"] < 0.8 * last["shuffled"])
    print(json.dumps({"event": "verdict", "ok": bool(ok),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
