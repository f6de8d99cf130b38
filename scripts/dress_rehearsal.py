"""Full-scale on-chip dress rehearsal of the experiment protocol (VERDICT r1 #7).

Runs the COMPLETE reference protocol once, assembled, at canonical shapes
(18,868 genes post-filter, 256x1024 patches, 300x768 tokens) on synthetic
TCGA-shaped data, and records wall-clock per phase plus artifact checksums:

  build-data -> load_tcga -> Experiment.fit (train + periodic validation +
  final test dumps + checkpoint) -> posthoc utility -> posthoc privacy ->
  evaluate() (checkpoint reload + test rerun)

This is the assembled pipeline the reference runs per entry-point main
(/root/reference/src/conditional_gan_concat.py:575-1110); every piece is
individually measured in BASELINE.md, but the end-to-end protocol had never
been exercised at full scale on the chip before this probe.

Data: `structured_dataset` (low-rank gene-gene correlation + label-dependent
means — the validated training-dynamics regime) written out in the exact
on-disk layout L0/L1 produce (rna_seq.parquet, per-case patch/token npys,
metainfos.pkl), with 132 extra >90%-zero genes so the reference gene filter
(/root/reference/src/data_loader.py:122-123) actually fires and the
post-filter width is exactly 18,868.

Usage:
  python -u scripts/dress_rehearsal.py [--data-dir /tmp/gg_rehearsal_data]
      [--out /tmp/gg_rehearsal_out] [--cases 512] [--epochs 6]
      [--freq 3] [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import json
import os
import pickle
import time

import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DENSE_GENES = 18868   # canonical post-filter width
SPARSE_GENES = 132    # >90%-zero genes the filter must drop


def build_data_dir(d: str, cases: int, seed: int = 7,
                   genes: int = DENSE_GENES, sparse_genes: int = SPARSE_GENES,
                   num_patches: int = 256, patch_dim: int = 1024,
                   num_tokens: int = 300, text_dim: int = 768) -> None:
    import pandas as pd

    from gemm_gan_tpu.data.synthetic import structured_dataset

    os.makedirs(d, exist_ok=True)
    data = structured_dataset(
        n=cases, n_genes=genes, rank=min(24, max(2, genes // 4)),
        n_classes=8, n_sites=4,
        num_patches=num_patches, patch_dim=patch_dim,
        num_tokens=num_tokens, text_dim=text_dim,
        seed=seed)
    rng = np.random.RandomState(seed + 1)
    case_ids = [f"case-{i:04d}" for i in range(cases)]

    # expression matrix: `genes` informative genes + `sparse_genes` sparse
    # (>90% zeros) interleaved at random column positions, so the filter
    # does real work (canonical: 18,868 + 132)
    sparse = np.zeros((cases, sparse_genes), np.float32)
    nz_rows = rng.rand(cases, sparse_genes) > 0.95     # ~5% nonzero
    sparse[nz_rows] = rng.rand(int(nz_rows.sum())).astype(np.float32)
    full = np.concatenate([data["genes"], sparse], axis=1)
    perm = rng.permutation(full.shape[1])
    full = full[:, perm]
    genes = [f"ENSG{i:08d}" for i in range(full.shape[1])]
    pd.DataFrame(full, index=pd.Index(case_ids, name="case_id"),
                 columns=genes).to_parquet(os.path.join(d, "rna_seq.parquet"))

    # CLS parquet (multi_patch schema consumers; harmless extra for
    # multi_token): mean-pooled tokens, the reference's CLS stand-in
    cls = pd.DataFrame(data["tokens"].mean(axis=1),
                       index=pd.Index(case_ids, name="case_id"))
    cls.columns = [str(c) for c in cls.columns]
    cls.to_parquet(os.path.join(d, "clinical_modernbert_embeddings.parquet"))

    pdir = os.path.join(d, "patch_embeddings_uni")
    tdir = os.path.join(d, "clinical_modernbert_embeddings")
    os.makedirs(pdir, exist_ok=True)
    os.makedirs(tdir, exist_ok=True)
    # variable per-case patch counts (reference cases vary; loader re-pads)
    n_valid = rng.randint(max(1, num_patches // 4), num_patches + 1,
                          size=cases)
    for i, c in enumerate(case_ids):
        np.save(os.path.join(pdir, f"{c}.npy"), data["patches"][i, :n_valid[i]])
        np.save(os.path.join(tdir, f"{c}.npy"), data["tokens"][i])
        np.save(os.path.join(tdir, f"{c}_attention_mask.npy"),
                data["token_mask"][i])

    diseases = [f"disease_{k}" for k in range(8)]
    sites = [f"site_{k}" for k in range(4)]
    metainfos = {c: {"disease_type": diseases[int(data["disease"][i])],
                     "primary_site": sites[int(data["site"][i])]}
                 for i, c in enumerate(case_ids)}
    with open(os.path.join(d, "metainfos.pkl"), "wb") as f:
        pickle.dump(metainfos, f)


def checksums(run_dir: str) -> dict:
    out = {}
    for root, _, files in os.walk(run_dir):
        for fn in sorted(files):
            if fn.endswith(".npy"):
                p = os.path.join(root, fn)
                h = hashlib.md5(open(p, "rb").read()).hexdigest()
                out[os.path.relpath(p, run_dir)] = h
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/gg_rehearsal_data")
    ap.add_argument("--out", default="/tmp/gg_rehearsal_out")
    ap.add_argument("--cases", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--freq", type=int, default=3,
                    help="freq_compute_test (validation every N epochs)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rebuild-data", action="store_true")
    # scale-down knobs so CI can execute the assembled script at toy shapes
    # (tests/test_dress_rehearsal.py); defaults are the canonical run
    ap.add_argument("--genes", type=int, default=DENSE_GENES)
    ap.add_argument("--sparse-genes", type=int, default=SPARSE_GENES)
    ap.add_argument("--patches", type=int, default=256)
    ap.add_argument("--patch-dim", type=int, default=1024)
    ap.add_argument("--tokens", type=int, default=300)
    ap.add_argument("--text-dim", type=int, default=768)
    ap.add_argument("--n-critic", type=int, default=None,
                    help="override the variant preset's n_critic")
    args = ap.parse_args()

    times, t0 = {}, time.monotonic()

    def mark(name):
        nonlocal t0
        now = time.monotonic()
        times[name] = round(now - t0, 2)
        t0 = now
        print(f"[phase] {name}: {times[name]:.1f}s", flush=True)

    if args.rebuild_data or not os.path.exists(
            os.path.join(args.data_dir, "metainfos.pkl")):
        build_data_dir(args.data_dir, args.cases,
                       genes=args.genes, sparse_genes=args.sparse_genes,
                       num_patches=args.patches, patch_dim=args.patch_dim,
                       num_tokens=args.tokens, text_dim=args.text_dim)
        mark("build_data")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache (same dir as tests/conftest.py): a re-run of
    # the rehearsal shouldn't pay the fused-step compile twice
    from gemm_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)

    from gemm_gan_tpu.cli.experiment import Experiment
    from gemm_gan_tpu.config import save_config, variant_config
    from gemm_gan_tpu.data.tcga import load_tcga

    splits = load_tcga(args.data_dir, schema="multi_token",
                       num_patches=args.patches,
                       normalization="standardize", seed=42, patch_bank=True)
    meta = splits["meta"]
    assert meta["n_genes"] == args.genes, meta["n_genes"]
    mark("load_tcga")

    fusion_kw = dict(n_disease_types=len(meta["disease_vocab"]),
                     n_primary_sites=len(meta["site_vocab"]),
                     patch_dim=meta["patch_dim"], text_dim=meta["text_dim"],
                     max_tokens=meta["num_tokens"])
    cfg = variant_config("film_cross_attention", n_genes=meta["n_genes"],
                         fusion_kw=fusion_kw)
    train_kw = dict(epochs=args.epochs, freq_compute_test=args.freq,
                    cond_embed_reuse="per_update", drift_epsilon=1e-3)
    if args.n_critic is not None:
        train_kw["n_critic"] = args.n_critic
    cfg = dataclasses.replace(
        cfg,
        run_name="rehearsal", output_dir=args.out,
        train=dataclasses.replace(cfg.train, **train_kw),
        data=dataclasses.replace(cfg.data, data_dir=args.data_dir,
                                 num_patches=args.patches),
    )
    exp = Experiment(cfg, splits)
    save_config(cfg, os.path.join(exp.out_dir, "config.json"))
    mark("build_experiment")

    results = exp.fit()
    mark("fit")

    results["utility"] = exp.posthoc_utility()
    mark("posthoc_utility")

    results["privacy"] = exp.posthoc_privacy()
    mark("posthoc_privacy")

    eval_results = exp.evaluate()
    mark("evaluate_reload")

    summary = {
        "phase_seconds": times,
        "gamma_mean": results.get("gamma_mean"),
        "eval_gamma_mean": eval_results.get("gamma_mean"),
        "privacy": results.get("privacy"),
        "artifact_md5": checksums(exp.out_dir),
    }
    with open(os.path.join(exp.out_dir, "rehearsal_summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=float)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "artifact_md5"}, indent=2, default=float))
    print(f"artifacts: {len(summary['artifact_md5'])} npy files, "
          f"summary at {exp.out_dir}/rehearsal_summary.json", flush=True)


if __name__ == "__main__":
    main()
