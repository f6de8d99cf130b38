"""Sample entry point: restore a checkpoint and generate expression profiles.

Covers the reference's `generate_samples` / `generate_samples_all` inference
paths (/root/reference/src/conditional_gan_concat.py:453-560) as a CLI, with
optional class-balanced oversampling.
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="gemm_gan_tpu sampler")
    p.add_argument("--variant", default="vanilla")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--which", default="last", choices=["last", "best"],
                   help="'best' restores the gate-best validation checkpoint "
                        "(sibling ckpt_best/ + best.json of the run dir) "
                        "instead of the newest step — mirrors cli.train "
                        "--evaluate_which; at canonical width the measured "
                        "drift makes 'best' the model a user wants")
    p.add_argument("--out", default="generated.npy")
    p.add_argument("--num_repeats", type=int, default=1)
    p.add_argument("--balanced", action="store_true")
    p.add_argument("--scan", action="store_true",
                   help="serving fast path: whole loader in one scanned "
                        "device program, condition embedding shared across "
                        "repeats (one extra XLA compile per shape)")
    # bfloat16 is deliberately not offered: np.save round-trips ml_dtypes
    # bf16 as a raw |V2 void dtype (silently type-corrupted artifact), and
    # f16 carries more mantissa anyway for z-scored O(1) profile values.
    # The engine API accepts any dtype for on-wire use.
    p.add_argument("--host_dtype", default=None,
                   choices=["float16", "float32"],
                   help="cast profiles on device before fetching: halves "
                        "the device->host wire bytes and the output .npy "
                        "size (~5%% faster delivery on the tunneled backend, "
                        "proportional on bandwidth-bound links)")
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from gemm_gan_tpu.cli.experiment import Experiment
    from gemm_gan_tpu.cli.train import main as _  # noqa: F401 (shared presets)
    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.data.tcga import load_tcga
    from gemm_gan_tpu.train.checkpoint import restore_state

    import dataclasses

    from gemm_gan_tpu.config import load_config

    # checkpoint dirs written by cli/train.py are self-describing: the run
    # dir holds config.json with the resolved model/data shapes — restore
    # from it so non-default dims (latent, hidden, num_patches, ...) work
    cfg_path = os.path.join(
        os.path.dirname(os.path.normpath(args.ckpt_dir)), "config.json")
    saved_cfg = load_config(cfg_path) if os.path.exists(cfg_path) else None

    if saved_cfg is not None:
        schema = saved_cfg.data.batch_schema
        splits = load_tcga(args.data_dir, schema=schema,
                           num_patches=saved_cfg.data.num_patches,
                           normalization=saved_cfg.data.normalization,
                           seed=saved_cfg.train.seed)
        cfg = saved_cfg
    else:
        schema = {"vanilla": "genes", "vae": "genes", "benchmark": "labels",
                  "cvae": "labels", "cross_attention": "multi_token",
                  "film_cross_attention": "multi_token"}.get(args.variant,
                                                             "multi_patch")
        splits = load_tcga(args.data_dir, schema=schema, seed=args.seed)
        meta = splits["meta"]
        fusion_kw = {}
        if meta["disease_vocab"]:
            fusion_kw = dict(n_disease_types=len(meta["disease_vocab"]),
                             n_primary_sites=len(meta["site_vocab"]))
        cfg = variant_config(args.variant, n_genes=meta["n_genes"],
                             fusion_kw=fusion_kw)
    if args.scan:
        cfg = dataclasses.replace(
            cfg, eval=dataclasses.replace(cfg.eval, scan_sampling=True))
    exp = Experiment(cfg, splits)
    template = jax.device_get(exp.engine.init_state(
        args.seed, next(iter(exp.loaders["train"].epoch(0)))))
    from gemm_gan_tpu.train.checkpoint import resolve_ckpt_dir

    ckpt_dir, step = resolve_ckpt_dir(args.ckpt_dir, args.which)
    state = restore_state(ckpt_dir, template, step=step)

    key = jax.random.key(args.seed)
    host_dtype = np.float16 if args.host_dtype == "float16" else None
    if args.balanced:
        out = exp.generate_balanced(state, key, num_repeats=args.num_repeats,
                                    host_dtype=host_dtype)
    else:
        out = exp.engine.generate_samples_all(
            state, key, exp.loaders["train"].epoch(0),
            num_repeats=args.num_repeats, scan=args.scan,
            host_dtype=host_dtype)
    np.save(args.out, out["fake"])
    print(f"wrote {out['fake'].shape} -> {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
