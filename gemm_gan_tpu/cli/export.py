"""Export entry point: checkpoint -> portable serving artifact.

Turns a run directory (checkpoint + self-describing ``config.json``) into a
self-contained StableHLO sampling artifact (`gemm_gan_tpu.serving`): the
deterministic generator forward with the trained weights baked in, loadable
without any model code. The reference has no deployment story at all — its
checkpoints can only be reloaded by the experiment script that created them
(/root/reference/src/conditional_gan_concat.py:869-877).
"""

from __future__ import annotations

import argparse
import os


def build_parser():
    p = argparse.ArgumentParser(description="gemm_gan_tpu serving exporter")
    p.add_argument("--ckpt_dir", required=True,
                   help="checkpoint dir written by cli.train (the run dir's "
                        "config.json supplies the model shapes)")
    p.add_argument("--which", default="last", choices=["last", "best"],
                   help="'best' exports the gate-best validation checkpoint "
                        "(sibling ckpt_best/ + best.json of the run dir) "
                        "instead of the newest step — mirrors cli.train "
                        "--evaluate_which")
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets (tpu,cpu,cuda); "
                        "the artifact runs on any of them")
    p.add_argument("--batch", default="dynamic",
                   help="'dynamic' (default: any batch size at call time) "
                        "or a fixed integer batch")
    p.add_argument("--use_ema", action="store_true",
                   help="export the EMA generator params (train.ema_decay>0 "
                        "runs only)")
    p.add_argument("--use_pallas", choices=["auto", "on", "off"],
                   default="auto",
                   help="bake the Pallas flash-attention kernels into the "
                        "artifact (requires --platforms tpu and a fixed "
                        "--batch; Mosaic kernels do not lower for cpu/cuda "
                        "and their block grids are shape-specialized). "
                        "auto = off: the XLA path serves every platform "
                        "with dynamic shapes")
    p.add_argument("--seed", type=int, default=42)
    return p


def _example_batch(cfg):
    """Synthesize a one-row batch with the run's conditioning shapes —
    only shapes/dtypes are read by the exporter."""
    import numpy as np

    m, d, f = cfg.model, cfg.data, cfg.model.fusion
    batch = {"genes": np.zeros((1, m.n_genes), np.float32),
             "text_emb": np.zeros((1, f.text_dim), np.float32),
             "tokens": np.zeros((1, f.max_tokens, f.text_dim), np.float32),
             "token_mask": np.ones((1, f.max_tokens), bool),
             "patches": np.zeros((1, d.num_patches, f.patch_dim), np.float32),
             "patch_mask": np.ones((1, d.num_patches), bool),
             "disease": np.zeros((1,), np.int32),
             "site": np.zeros((1,), np.int32)}
    return batch


def main(argv=None):
    args = build_parser().parse_args(argv)
    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    batch_size = None if args.batch == "dynamic" else int(args.batch)

    import dataclasses

    import jax

    from gemm_gan_tpu.config import load_config
    from gemm_gan_tpu.serving import export_generator
    from gemm_gan_tpu.train.checkpoint import resolve_ckpt_dir, restore_state
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    pallas = {"auto": False, "on": True, "off": False}[args.use_pallas]
    if pallas and platforms != ("tpu",):
        raise SystemExit("--use_pallas on requires --platforms tpu "
                         "(Mosaic kernels only lower for TPU)")
    if pallas and batch_size is None:
        raise SystemExit("--use_pallas on requires a fixed --batch "
                         "(Pallas block grids are shape-specialized)")

    cfg_path = os.path.join(
        os.path.dirname(os.path.normpath(args.ckpt_dir)), "config.json")
    if not os.path.exists(cfg_path):
        raise SystemExit(
            f"no config.json next to {args.ckpt_dir} — export needs the "
            "self-describing run dir cli.train writes")
    cfg = load_config(cfg_path)
    ckpt_dir, ckpt_step = resolve_ckpt_dir(args.ckpt_dir, args.which)
    # use_pallas switches the attention computation, not the param tree, so
    # the checkpoint restores identically either way (ops/attention.py)
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, fusion=dataclasses.replace(cfg.model.fusion,
                                              use_pallas=pallas)))

    batch = _example_batch(cfg)
    if cfg.variant in ("vae", "cvae"):
        from gemm_gan_tpu.serving import export_vae_decoder
        from gemm_gan_tpu.train.vae import VAEEngine

        engine = VAEEngine(cfg)
        template = jax.device_get(engine.init_state(args.seed, batch))
        state = restore_state(ckpt_dir, template, step=ckpt_step)
        artifact = export_vae_decoder(engine, state, batch,
                                      platforms=platforms,
                                      batch_size=batch_size)
    else:
        engine = WGANGPEngine(cfg)
        template = jax.device_get(engine.init_state(args.seed, batch))
        state = restore_state(ckpt_dir, template, step=ckpt_step)
        artifact = export_generator(
            engine, state, batch, platforms=platforms, batch_size=batch_size,
            dynamic_seq=not pallas, use_ema=args.use_ema or None)
    artifact.save(args.out)
    spec = {s["key"]: s["shape"] for s in artifact.manifest["cond_spec"]}
    print(f"exported {cfg.variant} (batch={artifact.manifest['batch']}, "
          f"platforms={','.join(platforms)}, cond={spec or 'none'}) "
          f"-> {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
