"""Price the documented single-process-only boundaries (VERDICT r2 #8).

Three fit-loop data paths exist on a mesh; two streaming ones are
single-process-only or mesh-shape-constrained, and multi-process users that
can't take them fall back to per-host `step_many`. This probe measures what
that fallback actually costs, on the virtual 8-CPU mesh (relative numbers —
the paths differ in dispatch count and input assembly, which is what the
boundary changes; absolute chip numbers live in BASELINE.md):

  a. `step_many_cached` + replicated `DeviceCache` (single-process only,
     train/wgan.py step_many_cached NotImplementedError branch);
  b. `step_many_cached` + `ShardedDeviceCache` (multi-process capable — the
     intended escape hatch);
  c. `step_many` on a stacked epoch (the per-host fallback: same one-scan
     program, but the epoch is materialized host-side and re-uploaded
     per epoch instead of streaming from the HBM bank);
  d. per-step `step()` dispatch (the worst-case fallback).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/probe_multiprocess_fallbacks.py [--epochs 3]

Prints one JSON line per path: {"path", "steps_per_sec", "epoch_s"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=512)
    ap.add_argument("--genes", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=3,
                    help="timed epochs per path (after a compile epoch)")
    args = ap.parse_args()

    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import dataclasses

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.data.device_cache import (DeviceCache,
                                                ShardedDeviceCache)
    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.data.synthetic import structured_dataset
    from gemm_gan_tpu.parallel.mesh import make_mesh
    from gemm_gan_tpu.train.wgan import WGANGPEngine
    from gemm_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    mesh = make_mesh(data=8, model=1)
    batch = 32
    data = structured_dataset(args.cases, n_genes=args.genes, rank=8,
                              n_classes=4, num_patches=4, patch_dim=8,
                              num_tokens=4, text_dim=8, seed=0)
    train = {"genes": data["genes"].astype(np.float32)}
    cfg = variant_config("vanilla", n_genes=args.genes)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, batch_size=batch, cond_embed_reuse="per_update"))
    steps_per_epoch = args.cases // batch

    def timed(label, init_state_fn, epoch_fn):
        eng, state = init_state_fn()
        state = epoch_fn(eng, state, 0)        # compile + warmup epoch
        jax.block_until_ready(state.g_params)  # local CPU: block is honest
        t0 = time.perf_counter()
        for e in range(1, args.epochs + 1):
            state = epoch_fn(eng, state, e)
        jax.block_until_ready(state.g_params)
        dt = (time.perf_counter() - t0) / args.epochs
        print(json.dumps({"path": label,
                          "steps_per_sec": round(steps_per_epoch / dt, 2),
                          "epoch_s": round(dt, 4)}), flush=True)

    def fresh(engine_kw=None):
        eng = WGANGPEngine(cfg, steps_per_epoch=steps_per_epoch,
                           **(engine_kw or {}))
        first = {k: v[:batch] for k, v in train.items()}
        return eng, eng.init_state(0, first)

    # a. replicated DeviceCache streaming scan (single-process only)
    cache = DeviceCache(train, batch_size=batch, seed=0)
    timed("replicated_cache_scan", lambda: fresh(dict(mesh=mesh)),
          lambda eng, st, e: eng.step_many_cached(st, cache, e)[0])

    # b. ShardedDeviceCache streaming scan (multi-process capable)
    scache = ShardedDeviceCache(train, batch_size=batch, mesh=mesh, seed=0)
    timed("sharded_cache_scan", lambda: fresh(dict(mesh=mesh)),
          lambda eng, st, e: eng.step_many_cached(st, scache, e)[0])

    # c. per-host stacked step_many (the documented multi-process fallback)
    loader = Batches(train, batch_size=batch, seed=0)
    timed("stacked_step_many", lambda: fresh(dict(mesh=mesh)),
          lambda eng, st, e: eng.step_many(st, loader.stacked_epoch(e))[0])

    # d. per-step dispatch (worst-case fallback)
    def per_step(eng, st, e):
        for b in loader.epoch(e):
            st, _ = eng.step(st, b)
        return st

    timed("per_step_dispatch", lambda: fresh(dict(mesh=mesh)), per_step)


if __name__ == "__main__":
    main()
