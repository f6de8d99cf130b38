"""Train entry point: `python -m gemm_gan_tpu.cli.train --variant film ...`

Replaces the reference's 8 per-file argparse __main__ blocks
(e.g. /root/reference/src/conditional_gan_concat.py:1023-1109) with one CLI
over the variant presets. Runs the full reference protocol: train -> periodic
validation -> final test dumps -> post-hoc utility + privacy.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def build_parser():
    p = argparse.ArgumentParser(description="gemm_gan_tpu trainer")
    p.add_argument("--variant", default="vanilla")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--output_path", default="outputs")
    p.add_argument("--run_name", default="run")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--latent_dim", type=int, default=256)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--optimizer", default="rmsprop",
                   choices=["rmsprop", "adam", "adamw"])
    p.add_argument("--n_critic", type=int, default=5)
    p.add_argument("--gp_weight", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_patches", type=int, default=256)
    p.add_argument("--freq_compute_test", type=int, default=50)
    p.add_argument("--normalization", default="standardize",
                   choices=["standardize", "minmax", "none"])
    p.add_argument("--mesh_data", type=int, default=-1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--bank_dtype", default=None, choices=(None, "bfloat16"),
                   help="store the HBM bank's patch/token embeddings at "
                        "this dtype (halves their residency; batches are "
                        "upcast on gather so training numerics keep the "
                        "compute dtype)")
    p.add_argument("--validation_max_cases", type=int, default=None,
                   help="cap the train-side regeneration during periodic "
                        "validation (default: full split, reference "
                        "behavior; at canonical width the full-train regen "
                        "plus resident banks can exceed chip memory)")
    p.add_argument("--shard_bank", action="store_true",
                   help="shard the training bank's case axis over the mesh "
                        "data axis (per-chip HBM residency bank/S, "
                        "shard-local gathers, streaming epoch scan)")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    # beyond-reference training options (see docs/scaling.md, BASELINE.md)
    p.add_argument("--cond_embed_reuse", default="per_call",
                   choices=["per_call", "per_update"],
                   help="per_update: reuse the loop-invariant condition "
                        "embedding within each update (~1.8x; exact at "
                        "fusion dropout 0)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA of generator params for sampling (0 = off)")
    p.add_argument("--drift_epsilon", type=float, default=0.0,
                   help="eps-drift critic score anchor for long-horizon runs")
    p.add_argument("--critic_scan", action="store_true",
                   help="lax.scan the n_critic critic updates instead of "
                        "unrolling: same numerics, ~n_critic-x smaller XLA "
                        "program (faster compiles)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="split each update into this many microbatches and "
                        "accumulate gradients: activation/GP memory scales "
                        "with batch/grad_accum (large effective batches, "
                        "whole-slide patch counts); exact vs the full-batch "
                        "step at fusion dropout 0. batch_size must divide")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of steady-state "
                        "training epochs (window opens after the first "
                        "epoch, so compiles are excluded; needs epochs >= 2) "
                        "and print device-time tables from it")
    p.add_argument("--profile_epochs", type=int, default=1,
                   help="how many epochs the --profile_dir trace covers")
    p.add_argument("--evaluate_only", action="store_true")
    p.add_argument("--evaluate_which", default="last",
                   choices=("last", "best"),
                   help="which checkpoint --evaluate_only restores: 'last' "
                        "(reference semantics) or 'best' — the gate-best "
                        "validation checkpoint tracked during fit; in the "
                        "measured drift regime quality peaks at the "
                        "earliest gate-clearing eval, so 'best' is usually "
                        "the model you want (BASELINE.md)")
    p.add_argument("--checkpoint_every_eval", action="store_true",
                   help="save a full train-state checkpoint at every "
                        "validation epoch, not just at the end (always on "
                        "for the film_cross_attention preset, parity with "
                        "conditional_gan_cross_attention_with_film.py:710); "
                        "what --resume continues from after a crash")
    p.add_argument("--resume", action="store_true",
                   help="continue an interrupted run from the newest full "
                        "train-state checkpoint in the run dir (exact: "
                        "optimizer states, EMA, step, PRNG all restore; "
                        "fresh start if none exists)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.data.tcga import load_tcga
    from gemm_gan_tpu.parallel.mesh import distributed_init, make_mesh

    import jax

    distributed_init()
    mesh = None
    if len(jax.devices()) > 1 or args.mesh_model > 1:
        mesh = make_mesh(args.mesh_data, args.mesh_model)
    if args.shard_bank and mesh is None:
        raise ValueError(
            "--shard_bank shards the bank over a mesh data axis and needs "
            "more than one device; on a single device use the replicated "
            "DeviceCache (default) with --num_patches / bf16 bank storage")
    if args.shard_bank and args.variant in ("vae", "cvae"):
        raise ValueError("--shard_bank is not supported for the VAE "
                         "variants (they train through VAEExperiment's "
                         "stacked scan)")

    schema = {"vanilla": "genes", "vae": "genes", "benchmark": "labels",
              "cvae": "labels", "cross_attention": "multi_token",
              "film_cross_attention": "multi_token"}.get(args.variant, "multi_patch")
    # patch_bank keeps the full padded patch set so DeviceCache can draw a
    # fresh subset per step on device (reference per-item resampling) — only
    # when the DeviceCache path will actually engage (single-device, cached).
    use_device_cache = mesh is None or args.shard_bank
    splits = load_tcga(args.data_dir, schema=schema, num_patches=args.num_patches,
                       normalization=args.normalization, seed=args.seed,
                       patch_bank=(use_device_cache
                                   and schema in ("multi_patch", "multi_token")))
    meta = splits["meta"]

    fusion_kw = {}
    if meta["disease_vocab"]:
        fusion_kw = dict(n_disease_types=len(meta["disease_vocab"]),
                         n_primary_sites=len(meta["site_vocab"]))
    # size the fusion stack from the loaded data, not the canonical defaults
    # (contrastive-projected embeddings are 128-d, not 768/1024)
    for src, dst in (("patch_dim", "patch_dim"), ("text_dim", "text_dim"),
                     ("num_tokens", "max_tokens")):
        if src in meta:
            fusion_kw[dst] = meta[src]
    cfg = variant_config(args.variant, n_genes=meta["n_genes"], fusion_kw=fusion_kw)
    cfg = dataclasses.replace(
        cfg,
        run_name=args.run_name,
        output_dir=args.output_path,
        model=dataclasses.replace(
            cfg.model, latent_dim=args.latent_dim,
            gen_dims=(args.hidden_dim, args.hidden_dim),
            disc_dims=(args.hidden_dim, args.hidden_dim),
            compute_dtype=args.compute_dtype),
        train=dataclasses.replace(
            cfg.train, batch_size=args.batch_size, epochs=args.epochs,
            n_critic=args.n_critic, gp_weight=args.gp_weight,
            optimizer=args.optimizer, lr_gen=args.lr, lr_disc=args.lr,
            seed=args.seed, freq_compute_test=args.freq_compute_test,
            cond_embed_reuse=args.cond_embed_reuse,
            checkpoint_every_eval=(args.checkpoint_every_eval
                                   or cfg.train.checkpoint_every_eval),
            ema_decay=args.ema_decay, drift_epsilon=args.drift_epsilon,
            critic_scan=args.critic_scan, grad_accum=args.grad_accum),
        # record the resolved data settings: the Experiment's DeviceCache
        # subsamples to cfg.data.num_patches (NOT the load_tcga argument),
        # and cli/sample.py rebuilds the loaders from the saved config
        data=dataclasses.replace(
            cfg.data, data_dir=args.data_dir, num_patches=args.num_patches,
            normalization=args.normalization, seed=args.seed,
            shard_bank=args.shard_bank,
            embedding_store_dtype=args.bank_dtype),
        eval=dataclasses.replace(
            cfg.eval, validation_max_cases=args.validation_max_cases),
    )

    if args.variant in ("vae", "cvae"):
        from gemm_gan_tpu.cli.vae_experiment import VAEExperiment

        exp = VAEExperiment(cfg, splits)
    else:
        from gemm_gan_tpu.cli.experiment import Experiment

        exp = Experiment(cfg, splits, mesh=mesh)

    from gemm_gan_tpu.config import save_config

    # write the resolved config up front so the run dir is self-describing
    # even if training is interrupted (cli/sample.py restores shapes from it)
    save_config(cfg, os.path.join(exp.out_dir, "config.json"))

    if args.evaluate_only:
        # both experiment families accept which= since r5: the VAE tracks
        # its lowest-val-ELBO checkpoint in ckpt_best/ (VERDICT r4 #6)
        results = exp.evaluate(which=args.evaluate_which)
    else:
        fit_kw = {}
        if args.profile_dir:
            fit_kw = dict(profile_dir=args.profile_dir,
                          profile_epochs=args.profile_epochs)
        results = exp.fit(resume=args.resume, **fit_kw)
        if fit_kw:
            from gemm_gan_tpu.utils.metrics import (aggregate_device_trace,
                                                    format_device_table)

            # `profile_captured` is the real signal: a window that never
            # closed around a full epoch (e.g. a 1-epoch run) still writes a
            # near-empty trace file, which would print misleading zero tables
            if getattr(exp, "profile_captured", False):
                agg = aggregate_device_trace(args.profile_dir)
                for title, k in (("by HLO category", "by_category"),
                                 ("by source line", "by_source")):
                    print(format_device_table(agg[k], f"{title} (total ms)"))
            else:
                print(f"no steady-state trace captured under "
                      f"{args.profile_dir} (the window opens after the first "
                      "epoch — the run needs >= 2 epochs)")
        # TSTR utility needs label dumps — conditional variants only (the
        # reference runs UtilityEvaluator only in the conditional mains,
        # e.g. conditional_gan_concat.py:1075-1083)
        if "disease" in splits["train"]:
            results["utility"] = exp.posthoc_utility()
        results["privacy"] = exp.posthoc_privacy()

    out_file = os.path.join(exp.out_dir, "results.json")
    with open(out_file, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(json.dumps({"gamma_mean": results.get("gamma_mean"),
                      "output": out_file}))
    return results


if __name__ == "__main__":
    main()
