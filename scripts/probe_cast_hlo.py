"""Where do the bf16 cast ops live? (VERDICT r3 next #8, cast line.)

The bf16 production profile shows a 0.41 ms/step `convert` line
(linen/dtypes.py: f32 params/activations <-> bf16 compute). The one
structural lever would be hoisting loop-invariant WEIGHT casts out of the
`critic_scan` while-loop body (5 critic iterations re-casting the same f32
weights would be 5x waste). This probe compiles the exact production fused
step and counts f32->bf16 `convert` ops by location — inside while-loop
bodies vs top level — and sizes them, to decide whether a hoist is
available or the cast line is already irreducible activation casts.

    python -u scripts/probe_cast_hlo.py [--cpu] [--genes 18868]

Prints one JSON line per program region and a verdict.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--genes", type=int, default=18868)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from gemm_gan_tpu.config import variant_config
    from gemm_gan_tpu.data.loader import Batches
    from gemm_gan_tpu.data.synthetic import synthetic_dataset
    from gemm_gan_tpu.train.wgan import WGANGPEngine
    from gemm_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    cfg = variant_config("film_cross_attention", n_genes=args.genes)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"),
        train=dataclasses.replace(cfg.train, cond_embed_reuse="per_update",
                                  critic_scan=True))
    data = synthetic_dataset(n=args.batch * 2, n_genes=args.genes,
                             num_patches=256, patch_dim=1024, num_tokens=300,
                             text_dim=768, seed=0)
    batch = next(iter(Batches(data, batch_size=args.batch, seed=0,
                              shuffle=False)))
    eng = WGANGPEngine(cfg, steps_per_epoch=2)
    state = eng.init_state(0, batch)
    if eng._train_step is None:
        eng._train_step = jax.jit(eng._build_train_step(), donate_argnums=(0,))
    compiled = eng._train_step.lower(state, batch).compile()
    txt = compiled.as_text()

    # Each HLO instruction carries op_name metadata with its trace path;
    # casts inside the scanned critic loop carry ".../while/body/...".
    # Count every `= bf16[...] convert` by location and aggregate element
    # counts per op_name prefix (module/layer) for the biggest ones.
    rows = {}
    total, in_loop = 0, 0
    for line in txt.splitlines():
        m = re.search(r"= bf16\[([\d,]*)\][^=]*convert\(", line)
        if not m:
            continue
        dims = [int(d) for d in m.group(1).split(",") if d]
        elems = int(np.prod(dims)) if dims else 1
        is_loop = "while/body" in line
        op_m = re.search(r'op_name="([^"]*)"', line)
        op = op_m.group(1) if op_m else "<no-metadata>"
        # collapse to the owning module path (drop the op leaf)
        op = "/".join(op.split("/")[:6])
        total += elems
        if is_loop:
            in_loop += elems
        key = (op, is_loop)
        agg = rows.setdefault(key, {"op_path": op[:90],
                                    "in_while_body": is_loop,
                                    "n_converts": 0, "elements": 0})
        agg["n_converts"] += 1
        agg["elements"] += elems
    out = sorted(rows.values(), key=lambda r: -r["elements"])
    for r in out[:12]:
        print(json.dumps(r), flush=True)
    print(json.dumps({
        "event": "verdict",
        "total_f32_to_bf16_elements": int(total),
        "in_while_body_elements": int(in_loop),
        "in_loop_fraction": round(in_loop / max(total, 1), 3),
        "note": ("weight casts repeated inside the critic while body — a "
                 "hoist is available" if in_loop / max(total, 1) > 0.5 else
                 "casts are mostly outside loop bodies — XLA already "
                 "hoists/fuses them; the cast line is activation casts"),
    }), flush=True)


if __name__ == "__main__":
    main()
