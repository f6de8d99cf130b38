"""A/B `train.hoist_fakes` at a wide batch on the real chip (VERDICT r2 #3).

The knob's rationale ("kept for wider-batch configs where the weight read
dominates", config.py) shipped unmeasured: the canonical-batch-8 A/B showed
a net loss, and no wide-batch number existed. This probe measures the scan
path (step_many, device_get-synced — CLAUDE.md: block_until_ready does NOT
sync over the tunnel) at a configurable batch with hoist_fakes on vs off,
everything else the production config (per_update, batched_scores, tuned
ble flash kernels).

Usage: python -u scripts/probe_hoist_wide.py [--batch 64] [--scan-len 50]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scan-len", type=int, default=50)
    ap.add_argument("--n-calls", type=int, default=4)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes on CPU for a smoke of the probe itself")
    args = ap.parse_args()

    import dataclasses

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from _flagship import dims_and_fusion_kw

    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.data.synthetic import synthetic_dataset
    from gemm_gan_tpu.train.wgan import WGANGPEngine
    from gemm_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dims, fusion_kw = dims_and_fusion_kw(full=not args.tiny)

    data = synthetic_dataset(
        n=args.batch * 2, n_genes=dims["n_genes"], n_classes=3, n_sites=2,
        num_patches=dims["n_patches"], patch_dim=dims["patch_dim"],
        num_tokens=dims["n_tokens"], text_dim=dims["text_dim"], seed=0)
    batch = next(iter(Batches(data, batch_size=args.batch, seed=0)))
    dev_batch = {k: jax.device_put(v) for k, v in batch.items()}
    stacked = {k: jax.device_put(
        np.broadcast_to(v, (args.scan_len,) + v.shape).copy())
        for k, v in batch.items()}

    results = {}
    for hoist in (False, True):
        cfg = variant_config("film_cross_attention", n_genes=dims["n_genes"],
                             fusion_kw=fusion_kw)
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, batch_size=args.batch, cond_embed_reuse="per_update",
            hoist_fakes=hoist))
        eng = WGANGPEngine(cfg, steps_per_epoch=100)
        state = eng.init_state(0, dev_batch)
        t0 = time.perf_counter()
        state, m = eng.step_many(state, stacked)
        float(jax.device_get(m["d_loss"]))
        print(json.dumps({"hoist_fakes": hoist,
                          "compile_first_call_s":
                              round(time.perf_counter() - t0, 1)}),
              flush=True)
        times = []
        for _ in range(args.n_calls):
            t0 = time.perf_counter()
            state, m = eng.step_many(state, stacked)
            float(jax.device_get(m["d_loss"]))
            times.append(time.perf_counter() - t0)
        best = min(times[1:]) if len(times) > 1 else times[0]
        sps = args.scan_len / best
        results[hoist] = sps
        print(json.dumps({"hoist_fakes": hoist, "batch": args.batch,
                          "steps_per_sec": round(sps, 2),
                          "ms_per_step": round(1e3 * best / args.scan_len,
                                               3)}), flush=True)

    print(json.dumps({"event": "verdict", "batch": args.batch,
                      "hoist_speedup": round(results[True] / results[False],
                                             4)}), flush=True)


if __name__ == "__main__":
    main()
