"""Profile the canonical fused WGAN-GP step on the real chip.

Captures a `jax.profiler` trace around N fused steps at canonical flagship
shapes (batch 8, 18,868 genes, 256x1024 patches, 300x768 tokens, n_critic=5,
production `cond_embed_reuse="per_update"`), then aggregates the DEVICE-side
op events from the trace (the tunneled axon backend does report
/device:TPU:0 events) into a where-does-the-time-go table: total device-busy
time per HLO op name, top-k, plus device busy vs wall.

Usage: python scripts/probe_profile_step.py [--steps 20] [--tiny]
                                            [--scan-path] [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_engine(tiny: bool, layout: str = None, dtype: str = "float32",
                 patches: int = None, remat: bool = False):
    import jax

    from gemm_gan_tpu.config import variant_config
    import dataclasses

    from gemm_gan_tpu.data.synthetic import synthetic_dataset
    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    from _flagship import dims_and_fusion_kw

    dims, fusion_kw = dims_and_fusion_kw(full=not tiny)
    if layout is not None:
        fusion_kw = dict(fusion_kw, flash_layout=layout)
    if patches is not None:
        # whole-slide profile: override the patch count (BASELINE "Whole-
        # slide quality gate" trains at 4,096); remat mirrors that config
        dims = dict(dims, n_patches=patches)
    if remat:
        fusion_kw = dict(fusion_kw, remat_layers=True)
    n_genes, n_patches, patch_dim, n_tokens, text_dim = (
        dims["n_genes"], dims["n_patches"], dims["patch_dim"],
        dims["n_tokens"], dims["text_dim"])
    cfg = variant_config("film_cross_attention", n_genes=n_genes,
                         fusion_kw=fusion_kw)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, compute_dtype=dtype),
        train=dataclasses.replace(cfg.train, cond_embed_reuse="per_update"))
    data = synthetic_dataset(n=16, n_genes=n_genes, n_classes=3, n_sites=2,
                             num_patches=n_patches, patch_dim=patch_dim,
                             num_tokens=n_tokens, text_dim=text_dim, seed=0)
    batch = next(iter(Batches(data, batch_size=8, seed=0)))
    eng = WGANGPEngine(cfg, steps_per_epoch=8)
    return eng, batch




def main():
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes for a fast smoke of the probe itself")
    ap.add_argument("--scan-path", action="store_true",
                    help="profile step_many (lax.scan of --steps steps, one "
                         "program) instead of per-step dispatches")
    ap.add_argument("--topk", type=int, default=30)
    ap.add_argument("--layout", default=None, choices=["ble", "bhld"],
                    help="override FusionConfig.flash_layout (A/B the "
                         "E-layout kernel vs the classic transposed path)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model.compute_dtype (profile the validated bf16 "
                         "production preset vs the f32 parity default)")
    ap.add_argument("--patches", type=int, default=None,
                    help="override the patch count (e.g. 4096: profile the "
                         "whole-slide regime instead of the canonical 256)")
    ap.add_argument("--remat", action="store_true",
                    help="fusion.remat_layers=True (the whole-slide config)")
    ap.add_argument("--out", default="/tmp/gemm_gan_profile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    eng, batch = build_engine(args.tiny, layout=args.layout, dtype=args.dtype,
                              patches=args.patches, remat=args.remat)
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    dev_batch = {k: jax.device_put(jnp.asarray(v)) for k, v in batch.items()}
    state = eng.init_state(0, dev_batch)

    def sync(metrics):
        return float(jax.device_get(metrics["d_loss"]))

    t0 = time.perf_counter()
    if args.scan_path:
        stacked = {k: jnp.broadcast_to(
            v, (args.steps,) + v.shape) for k, v in dev_batch.items()}
        state, m = eng.step_many(state, stacked)
    else:
        state, m = eng.step(state, dev_batch)
    sync(m)
    print(f"compile+first call: {time.perf_counter() - t0:.1f}s", flush=True)

    # warm steady state, then trace
    for _ in range(2):
        t0 = time.perf_counter()
        if args.scan_path:
            state, m = eng.step_many(state, stacked)
        else:
            state, m = eng.step(state, dev_batch)
        sync(m)
        print(f"warm call: {time.perf_counter() - t0 :.3f}s", flush=True)

    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    if args.scan_path:
        state, m = eng.step_many(state, stacked)
    else:
        for _ in range(args.steps):
            state, m = eng.step(state, dev_batch)
    sync(m)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"traced {args.steps} steps in {wall:.3f}s wall "
          f"({args.steps / wall:.1f} steps/s)", flush=True)

    from gemm_gan_tpu.utils.metrics import (aggregate_device_trace,
                                            format_device_table)

    agg = aggregate_device_trace(args.out)
    total_us = sum(v[0] for v in agg["by_category"].values())
    print(f"\ntrace: {agg['trace_path']}")
    print(f"device op time: {total_us / 1e3:.2f} ms total, "
          f"{total_us / 1e3 / args.steps:.3f} ms/step "
          f"(module row: {agg['module_us'] / 1e3 / args.steps:.3f} ms/step)")
    for title, key, k in (("by HLO category (ms/step)", "by_category", args.topk),
                          ("by source line (ms/step)", "by_source", args.topk),
                          ("by op (ms/step)", "by_op", min(args.topk, 15))):
        print()
        print(format_device_table(agg[key], title, topk=k, per=args.steps))


if __name__ == "__main__":
    main()
