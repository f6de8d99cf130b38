"""MFU accounting for the canonical fused WGAN-GP step (VERDICT r1 #6).

Three ingredients:

1. **FLOPs/step** — XLA's own cost analysis of the EXACT production step
   program (flagship variant, canonical shapes, `cond_embed_reuse=
   "per_update"`, n_critic=5 unrolled, GP grad-of-grad, both optimizer
   updates). Lowered + compiled on CPU: the FLOP count is a property of the
   optimized HLO's dot/elementwise ops, not of the executing backend, and a
   CPU compile avoids a 25-minute remote-compile round trip. (`use_pallas`
   is forced off for the count — the pallas flash kernels are opaque to the
   cost model; their matmul FLOPs are counted via the XLA attention
   fallback, which computes the same algorithm.)

2. **Analytic cross-check** — hand-counted matmul FLOPs of the dominant
   gene-dimension dense layers (generator output projection + critic input
   projection), with explicit fwd/bwd/GP multipliers. Catches a wildly
   wrong XLA number; the full-program count is authoritative.

3. **Device-busy ms/step** — from a `jax.profiler` trace captured on the
   real chip (`scripts/probe_profile_step.py --out DIR`); pass `--trace DIR`
   (default: the probe's default output dir).

MFU = FLOPs/step / (busy_s/step x peak FLOP/s). Peaks used (TPU v5e):
bf16 MXU 197 TFLOP/s (the standard MFU denominator) and the f32-effective
matmul roofline ~49.2 TFLOP/s (f32 operands run the MXU at ~1/4 the bf16
rate; BASELINE.md's measured dense-op ceiling of 44.7 TFLOP/s is 91% of
it). The step computes in f32 by design (WGAN critic stability — BASELINE
"bf16 compute path"), so `util_vs_f32_roofline` is the number that says
"are we at the roofline we chose", while `mfu_bf16_peak` is the
hardware-absolute figure.

Usage:
  python scripts/probe_mfu.py [--trace /tmp/gg_prof_r2] [--tiny]
                              [--busy-ms-per-step X]   # skip trace parsing
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12
V5E_F32_ROOFLINE = V5E_BF16_PEAK / 4.0  # measured dense ceiling: 44.7e12


def analytic_gene_dim_flops(n_genes: int, hidden: int, batch: int,
                            n_critic: int) -> float:
    """Matmul FLOPs/step of the two gene-dim layers only (lower bound).

    Per evaluation of a dense [din, dout] on batch B: fwd 2*B*din*dout;
    backward adds dgrad (2*B*dout*din) + wgrad (2*B*din*dout) = 2x fwd.

    Counts per fused step (cond_embed_reuse="per_update"):
      critic update (x n_critic): D(real)+D(fake) fwd+bwd [2 x 3x fwd],
        G(z) fwd only (no G grad in the critic phase) [1x],
        GP: D fwd + inner grad wrt x + outer bwd of that graph [~4x fwd
        through the critic input layer];
      generator update (x1): G fwd+bwd [3x], D(fake) fwd + bwd-to-input [2x].
    """
    g_out = 2.0 * batch * hidden * n_genes      # generator output projection
    d_in = 2.0 * batch * n_genes * hidden       # critic input projection
    per_critic = (2 * 3) * d_in + 1 * g_out + 4 * d_in
    per_gen = 3 * g_out + 2 * d_in
    return n_critic * per_critic + per_gen


def build_step(tiny: bool, dtype: str = "float32", patches: int = None,
               remat: bool = False):
    import dataclasses

    from _flagship import dims_and_fusion_kw
    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.data.synthetic import synthetic_dataset
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    dims, fusion_kw = dims_and_fusion_kw(full=not tiny)
    if patches is not None:
        dims = dict(dims, n_patches=patches)  # whole-slide FLOP count
    if remat:
        fusion_kw = dict(fusion_kw, remat_layers=True)
    fusion_kw = dict(fusion_kw, use_pallas=False)  # countable attention
    cfg = variant_config("film_cross_attention", n_genes=dims["n_genes"],
                         fusion_kw=fusion_kw)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, compute_dtype=dtype),
        train=dataclasses.replace(cfg.train, cond_embed_reuse="per_update"))
    data = synthetic_dataset(
        n=16, n_genes=dims["n_genes"], n_classes=3, n_sites=2,
        num_patches=dims["n_patches"], patch_dim=dims["patch_dim"],
        num_tokens=dims["n_tokens"], text_dim=dims["text_dim"], seed=0)
    batch = next(iter(Batches(data, batch_size=8, seed=0)))
    eng = WGANGPEngine(cfg, steps_per_epoch=8)
    return eng, cfg, batch


def xla_step_flops(tiny: bool, dtype: str = "float32", patches: int = None,
                   remat: bool = False) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    eng, cfg, batch = build_step(tiny, dtype=dtype, patches=patches,
                                 remat=remat)
    state = eng.init_state(0, batch)
    step = jax.jit(eng._build_train_step(), donate_argnums=(0,))
    compiled = step.lower(state, batch).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"]), cfg


def busy_ms_from_trace(trace_dir: str, steps: int) -> float:
    from gemm_gan_tpu.utils.metrics import aggregate_device_trace

    agg = aggregate_device_trace(trace_dir)
    total_us = sum(v[0] for v in agg["by_op"].values())
    return total_us / 1000.0 / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default="/tmp/gg_prof_r2")
    ap.add_argument("--trace-steps", type=int, default=20,
                    help="how many steps the trace window covered")
    ap.add_argument("--busy-ms-per-step", type=float, default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="model.compute_dtype of the counted program (the "
                         "FLOP count barely moves; the achieved-TFLOP/s and "
                         "MFU lines are what shift under bf16)")
    ap.add_argument("--patches", type=int, default=None,
                    help="override the patch count (whole-slide FLOP count)")
    ap.add_argument("--remat", action="store_true",
                    help="fusion.remat_layers=True (the whole-slide config; "
                         "counted FLOPs include the rematerialized fwd)")
    args = ap.parse_args()

    flops, cfg = xla_step_flops(args.tiny, dtype=args.dtype,
                                patches=args.patches, remat=args.remat)
    analytic = analytic_gene_dim_flops(
        cfg.model.n_genes, cfg.model.gen_dims[-1], cfg.train.batch_size,
        cfg.train.n_critic)
    out = {
        "xla_flops_per_step": flops,
        "analytic_gene_dim_flops": analytic,
        "gene_dim_share": analytic / flops,
    }
    busy = args.busy_ms_per_step
    if busy is None and os.path.isdir(args.trace):
        busy = busy_ms_from_trace(args.trace, args.trace_steps)
    if busy is not None:
        busy_s = busy / 1000.0
        out.update({
            "device_busy_ms_per_step": busy,
            "achieved_tflops": flops / busy_s / 1e12,
            "mfu_bf16_peak": flops / (busy_s * V5E_BF16_PEAK),
            "util_vs_f32_roofline": flops / (busy_s * V5E_F32_ROOFLINE),
        })
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
