"""VPU exp-vs-exp2 microbenchmark — go/no-go for exp2 flash softmax
(VERDICT r3 next #8).

The flash kernels' softmax is VPU-bound: one `jnp.exp` per logit dominates
the 0.74 ms/step custom-call line (BASELINE.md profile). The classic GPU
flash-attention trick folds log2(e) into the q scale and calls exp2
directly, saving one vmul per logit — but that only pays if the TPU VPU's
`exp` actually costs more than `exp2` (the lowering may already be
exp2+mul, or both may be the same-latency transcendental). This probe
times long dependent chains of jitted elementwise exp / exp2 / exp2(c*x)
at the canonical logit shape [B*H, L, L] and prints per-variant ns/element;
if exp2 shows no advantage, the kernel surgery is closed as a measured
negative result (like the mxu_bf16 knob).

    python -u scripts/probe_vpu_exp.py [--cpu] [--iters 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--shape", type=int, nargs=3, default=(32, 304, 304),
                    help="B*H, Lq, Lk (canonical flagship: 8*4 heads, "
                         "~300-token logits)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from gemm_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    LOG2E = float(np.log2(np.e))
    x0 = jnp.asarray(np.random.RandomState(0).randn(*args.shape)
                     .astype(np.float32))

    # dependent chain: each iteration reads the previous result, so the
    # measured time is ITERS full elementwise passes, not one fused pass.
    # exp(-|y|-0.5) keeps values in (0, 0.61) — bounded, non-constant-
    # foldable, identical extra ops (neg/abs/add) across variants.
    def chain(op):
        def body(_, y):
            return op(-jnp.abs(y) - 0.5)

        return jax.jit(lambda x: jax.lax.fori_loop(0, args.iters, body, x))

    variants = {
        "exp": chain(jnp.exp),
        "exp2": chain(jnp.exp2),
        "exp2_mul": chain(lambda v: jnp.exp2(v * LOG2E)),
    }
    n_el = int(np.prod(args.shape)) * args.iters
    results = {}
    for name, fn in variants.items():
        y = fn(x0)
        float(jax.device_get(y.ravel()[0]))  # compile + first call
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = fn(x0)
            float(jax.device_get(y.ravel()[0]))  # sync (tunnel-honest)
            best = min(best, time.perf_counter() - t0)
        results[name] = best
        print(json.dumps({"variant": name, "s": round(best, 4),
                          "ns_per_el": round(best / n_el * 1e9, 4)}),
              flush=True)
    adv = results["exp"] / results["exp2"]
    print(json.dumps({"event": "verdict",
                      "exp_over_exp2": round(adv, 3),
                      "go": bool(adv > 1.1)}), flush=True)


if __name__ == "__main__":
    main()
