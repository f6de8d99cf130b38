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
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_engine(tiny: bool):
    import jax

    from gemm_gan_tpu.config import variant_config
    import dataclasses

    from gemm_gan_tpu.data.synthetic import synthetic_dataset
    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    if tiny:
        n_genes, n_patches, patch_dim, n_tokens, text_dim = 64, 16, 32, 8, 24
        fusion_kw = dict(cond_dim=16, text_dim=text_dim, patch_dim=patch_dim,
                         ff_dim=32, num_heads=2, num_layers=1,
                         n_disease_types=3, n_primary_sites=2, use_pallas=False)
    else:
        n_genes, n_patches, patch_dim, n_tokens, text_dim = \
            18868, 256, 1024, 300, 768
        fusion_kw = dict(use_pallas=jax.default_backend() != "cpu")
    cfg = variant_config("film_cross_attention", n_genes=n_genes,
                         fusion_kw=fusion_kw)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, cond_embed_reuse="per_update"))
    data = synthetic_dataset(n=16, n_genes=n_genes, n_classes=3, n_sites=2,
                             num_patches=n_patches, patch_dim=patch_dim,
                             num_tokens=n_tokens, text_dim=text_dim, seed=0)
    batch = next(iter(Batches(data, batch_size=8, seed=0)))
    eng = WGANGPEngine(cfg, steps_per_epoch=8)
    return eng, batch


def aggregate_trace(out_dir: str):
    """Aggregate the newest trace's device 'XLA Ops' row.

    Returns (by_category, by_source, by_op, module_us, path) where the three
    aggregates map key -> [total_us, count, flops, bytes]. `by_source` keys
    are the Python `source` locations XLA recorded per HLO op — the
    actionable view (which line of model code costs what).
    """
    paths = sorted(glob.glob(os.path.join(
        out_dir, "plugins", "profile", "*", "*.trace.json.gz")),
        key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no trace.json.gz found under {out_dir}")
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tid_names = {(e["pid"], e["tid"]): e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    device_pids = {p for p, n in pid_names.items() if "TPU" in n or "tpu" in n}
    op_rows = {k for k, n in tid_names.items()
               if k[0] in device_pids and n == "XLA Ops"}
    module_rows = {k for k, n in tid_names.items()
                   if k[0] in device_pids and n == "XLA Modules"}

    def bucket():
        return [0.0, 0, 0.0, 0.0]  # us, count, flops, bytes

    by_cat = defaultdict(bucket)
    by_src = defaultdict(bucket)
    by_op = defaultdict(bucket)
    module_us = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        k = (e.get("pid"), e.get("tid"))
        if k in module_rows:
            module_us += float(e.get("dur", 0.0))
        if k not in op_rows:
            continue
        a = e.get("args", {})
        dur = float(e.get("dur", 0.0))
        flops = float(a.get("model_flops", 0) or 0)
        nbytes = float(a.get("bytes_accessed", 0) or 0)
        src = a.get("source", "?")
        # keep the last two path segments of the source location
        src = "/".join(src.split("/")[-2:]) if src != "?" else "?"
        for agg, key in ((by_cat, a.get("hlo_category", "?")),
                         (by_src, src), (by_op, e.get("name", "?"))):
            b = agg[key]
            b[0] += dur
            b[1] += 1
            b[2] += flops
            b[3] += nbytes
    return by_cat, by_src, by_op, module_us, paths[-1]


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
    ap.add_argument("--out", default="/tmp/gemm_gan_profile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    eng, batch = build_engine(args.tiny)
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

    by_cat, by_src, by_op, module_us, path = aggregate_trace(args.out)
    total_us = sum(v[0] for v in by_cat.values())
    print(f"\ntrace: {path}")
    print(f"device op time: {total_us / 1e3:.2f} ms total, "
          f"{total_us / 1e3 / args.steps:.3f} ms/step "
          f"(module row: {module_us / 1e3 / args.steps:.3f} ms/step)")

    def table(title, agg, topk):
        print(f"\n-- {title} "
              f"{'':<36}{'ms/step':>9}{'count':>8}{'GFLOP/s':>9}{'GB/s':>8}")
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        for name, (us, cnt, fl, by) in rows[:topk]:
            gfs = fl / us / 1e3 if us else 0.0
            gbs = by / us / 1e3 if us else 0.0
            print(f"{name[:44]:<48}{us / 1e3 / args.steps:>9.3f}{cnt:>8}"
                  f"{gfs:>9.1f}{gbs:>8.1f}")
        rest = sum(v[0] for _, v in rows[topk:])
        if rest:
            print(f"{'(rest)':<48}{rest / 1e3 / args.steps:>9.3f}")

    table("by HLO category", by_cat, args.topk)
    table("by source line", by_src, args.topk)
    table("by op", by_op, min(args.topk, 15))


if __name__ == "__main__":
    main()
