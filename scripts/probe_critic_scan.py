"""Measure what `train.critic_scan` buys: traced-program size + compile time.

The fused step unrolls n_critic=5 critic updates; `critic_scan=True` rolls
them into one `lax.scan` body. This probe compares, at flagship shapes
(canonical or scaled-down), (a) jaxpr equation count, (b) lowered StableHLO
text size, (c) local compile wall time. Run on CPU for the deterministic
size/compile comparison (the remote axon backend compiles server-side with
minutes of variance); pass --chip to time the real backend's end-to-end
lower+compile too.

Usage: python scripts/probe_critic_scan.py [--full] [--chip]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(critic_scan: bool, full: bool):
    import jax

    from gemm_gan_tpu.config import variant_config
    import dataclasses

    from gemm_gan_tpu.data.synthetic import synthetic_dataset
    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    from _flagship import dims_and_fusion_kw

    dims, fusion_kw = dims_and_fusion_kw(full)
    n_genes, n_patches, patch_dim, n_tokens, text_dim = (
        dims["n_genes"], dims["n_patches"], dims["patch_dim"],
        dims["n_tokens"], dims["text_dim"])
    n, batch = 16, 8
    cfg = variant_config("film_cross_attention", n_genes=n_genes,
                         fusion_kw=fusion_kw)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, critic_scan=critic_scan))
    data = synthetic_dataset(n=n, n_genes=n_genes, n_classes=3, n_sites=2,
                             num_patches=n_patches, patch_dim=patch_dim,
                             num_tokens=n_tokens, text_dim=text_dim, seed=0)
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    batch0 = next(iter(Batches(data, batch_size=batch, seed=0)))
    state = eng.init_state(0, batch0)
    step = jax.jit(eng._build_train_step(), donate_argnums=(0,))
    return step, state, batch0


def probe(critic_scan: bool, full: bool):
    import jax

    step, state, batch = build(critic_scan, full)
    t0 = time.perf_counter()
    traced = step.trace(state, batch)
    t_trace = time.perf_counter() - t0
    n_eqns = sum(1 for _ in traced.jaxpr.eqns)
    t0 = time.perf_counter()
    lowered = traced.lower()
    t_lower = time.perf_counter() - t0
    hlo_chars = len(lowered.as_text())
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    del compiled
    return dict(critic_scan=critic_scan, top_level_eqns=n_eqns,
                stablehlo_chars=hlo_chars, trace_s=round(t_trace, 2),
                lower_s=round(t_lower, 2), compile_s=round(t_compile, 2))


def probe_exec(critic_scan: bool, full: bool, scan_len: int = 100,
               n_calls: int = 4):
    """Steady-state steps/s of the production `step_many` path (synced
    timing: every call fetches a metric value — `jax.block_until_ready`
    does not block on the tunneled backend, BASELINE.md)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.data.synthetic import synthetic_dataset
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    from _flagship import dims_and_fusion_kw

    dims, fusion_kw = dims_and_fusion_kw(full)
    n_genes, n_patches, patch_dim, n_tokens, text_dim = (
        dims["n_genes"], dims["n_patches"], dims["patch_dim"],
        dims["n_tokens"], dims["text_dim"])
    cfg = variant_config("film_cross_attention", n_genes=n_genes,
                         fusion_kw=fusion_kw)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, critic_scan=critic_scan, cond_embed_reuse="per_update"))
    data = synthetic_dataset(n=16, n_genes=n_genes, n_classes=3, n_sites=2,
                             num_patches=n_patches, patch_dim=patch_dim,
                             num_tokens=n_tokens, text_dim=text_dim, seed=0)
    batch = next(iter(Batches(data, batch_size=8, seed=0)))
    eng = WGANGPEngine(cfg, steps_per_epoch=scan_len)
    stacked = {k: jax.device_put(
        np.broadcast_to(np.asarray(v), (scan_len,) + np.asarray(v).shape).copy())
        for k, v in batch.items()}
    st = eng.init_state(0, {k: jax.device_put(jnp.asarray(v))
                            for k, v in batch.items()})
    st, m = eng.step_many(st, stacked)
    float(jax.device_get(m["d_loss"]))
    times = []
    for _ in range(n_calls):
        t0 = time.perf_counter()
        st, m = eng.step_many(st, stacked)
        float(jax.device_get(m["d_loss"]))
        times.append(time.perf_counter() - t0)
    best = min(times[1:]) if len(times) > 1 else times[0]
    return dict(critic_scan=critic_scan, steps_per_sec=round(scan_len / best, 2),
                call_times_s=[round(t, 3) for t in times])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="canonical flagship shapes (18,868 genes, 256x1024 "
                         "patches, 300x768 tokens)")
    ap.add_argument("--chip", action="store_true",
                    help="use the default (axon) backend instead of forcing CPU")
    ap.add_argument("--exec", action="store_true", dest="exec_",
                    help="also time steady-state steps/s of the step_many "
                         "production path (per_update reuse) both ways")
    args = ap.parse_args()
    if not args.chip:
        import jax

        jax.config.update("jax_platforms", "cpu")
    for scan in (False, True):
        if args.exec_:
            print(probe_exec(scan, args.full), flush=True)
        else:
            print(probe(scan, args.full), flush=True)


if __name__ == "__main__":
    main()
