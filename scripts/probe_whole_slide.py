"""Whole-slide patch-count scaling probe (single chip).

Measures fused WGAN-GP steps/sec on the flagship variant (FiLM + patch CLS
transformer + bidirectional CLS cross-attention) as the patch count grows
from the reference's 256-patch ceiling (it random-subsamples instead of
scaling, /root/reference/src/multi_patch_gan_dataloader.py:32-35) to
whole-slide counts. Run on the real chip:

    python -u scripts/probe_whole_slide.py [P ...]     # default 4096 8192 16384

Prints one JSON line per patch count. Methodology matches bench.py: the
`lax.scan` multi-step path (one device program per call) timed over
steady-state calls after a compile+warmup call.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 8
N_GENES = 18868
PATCH_DIM = 1024
N_TOKENS = 300
TEXT_DIM = 768


def probe(n_patches: int, scan_len: int = 4, n_calls: int = 4,
          remat_layers: bool = False, reuse: bool = False,
          mxu_bf16: bool = False, batch_size: int = B,
          grad_accum: int = 1) -> float:
    import dataclasses

    import jax

    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.train.wgan import WGANGPEngine

    cfg = variant_config(
        "film_cross_attention", n_genes=N_GENES,
        fusion_kw=dict(remat_layers=remat_layers, flash_mxu_bf16=mxu_bf16))
    train_kw = {}
    if reuse:
        train_kw["cond_embed_reuse"] = "per_update"
    if grad_accum > 1:
        train_kw["grad_accum"] = grad_accum
    if train_kw:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **train_kw))
    eng = WGANGPEngine(cfg, steps_per_epoch=100)
    rng = np.random.RandomState(0)
    batch = {
        "genes": rng.randn(batch_size, N_GENES).astype(np.float32),
        "tokens": rng.randn(batch_size, N_TOKENS, TEXT_DIM).astype(np.float32),
        "token_mask": np.ones((batch_size, N_TOKENS), dtype=bool),
        "patches": rng.randn(batch_size, n_patches, PATCH_DIM).astype(np.float32),
        "patch_mask": np.ones((batch_size, n_patches), dtype=bool),
    }
    stacked = {k: jax.device_put(np.broadcast_to(v, (scan_len,) + v.shape).copy())
               for k, v in batch.items()}
    state = eng.init_state(0, {k: jax.device_put(v) for k, v in batch.items()})
    # Every timed call is synced by fetching a metric VALUE: on the axon
    # backend block_until_ready returns before remote execution finishes,
    # so block-based timing measures enqueue rate, not the chip (bench.py).
    state, m = eng.step_many(state, stacked)  # compile
    float(jax.device_get(m["d_loss"]))        # drain compile + warmup
    times = []
    for _ in range(n_calls):
        t0 = time.perf_counter()
        state, m = eng.step_many(state, stacked)
        float(jax.device_get(m["d_loss"]))
        times.append(time.perf_counter() - t0)
    best = min(times[1:]) if len(times) > 1 else times[0]
    return scan_len / best


def main():
    args = sys.argv[1:]
    reuse = "reuse" in args           # cond_embed_reuse="per_update"
    remat = "remat" in args           # fusion.remat_layers=True
    bf16 = "bf16mxu" in args          # fusion.flash_mxu_bf16=True
    batch = B                         # batch=N
    accum = 1                         # accum=M (train.grad_accum)
    scan_len, n_calls = 4, 4          # scan=K calls=C
    sizes = []
    for a in args:
        if a.startswith("batch="):
            batch = int(a.split("=", 1)[1])
        elif a.startswith("accum="):
            accum = int(a.split("=", 1)[1])
        elif a.startswith("scan="):
            scan_len = int(a.split("=", 1)[1])
        elif a.startswith("calls="):
            n_calls = int(a.split("=", 1)[1])
        elif a.isdigit():
            sizes.append(int(a))
    sizes = sizes or [4096, 8192, 16384]
    for p in sizes:
        tag = {"metric": "wgan_gp_steps_per_sec", "n_patches": p,
               "batch": batch, "grad_accum": accum, "reuse": reuse,
               "remat": remat, "mxu_bf16": bf16}
        try:
            sps = probe(p, scan_len=scan_len, n_calls=n_calls,
                        remat_layers=remat, reuse=reuse, mxu_bf16=bf16,
                        batch_size=batch, grad_accum=accum)
            print(json.dumps({**tag, "value": round(sps, 3)}), flush=True)
        except Exception as e:  # OOM at the single-chip ceiling is expected
            print(json.dumps({**tag, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
