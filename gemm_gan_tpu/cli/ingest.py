"""Dataset ingest CLI: GDC manifests -> expression matrix + patch-embedding cache.

One command replaces the reference's multi-script L0 flow
(/root/reference/src/dataset/download_data.py + src/download_and_preprocess_data.py):

  python -m gemm_gan_tpu.cli.ingest \
      --rna_manifests m1.txt m2.txt --tissue_manifests t1.txt \
      --out_dir /data/tcga [--uni_checkpoint uni.bin] [--tile_size 256]

Stages: map manifests to cases -> select one primary-tumor RNA file + one
bottom-preferred slide per case -> download RNA TSVs -> build
rna_seq.parquet -> fetch case metadata -> (optionally, when OpenSlide and a
UNI checkpoint are available) stream slides through Otsu tiling + the Flax
UNI encoder into patch_embeddings_uni/. Idempotent: re-runs skip existing
artifacts.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pandas as pd


def read_manifest(path: str) -> pd.DataFrame:
    """GDC manifest TSV: columns id, filename, md5, size, state."""
    df = pd.read_csv(path, sep="\t")
    return df.rename(columns={"id": "file_id", "filename": "file_name"})


def build_parser():
    p = argparse.ArgumentParser(description="gemm_gan_tpu dataset ingest")
    p.add_argument("--rna_manifests", nargs="+", required=True)
    p.add_argument("--tissue_manifests", nargs="+", default=[])
    p.add_argument("--out_dir", required=True)
    p.add_argument("--max_workers", type=int, default=5)
    p.add_argument("--tile_size", type=int, default=256)
    p.add_argument("--max_cases", type=int, default=0, help="0 = all")
    p.add_argument("--uni_checkpoint", default="",
                   help="timm UNI state-dict (.bin/.pth); enables embedding")
    p.add_argument("--skip_slides", action="store_true")
    p.add_argument("--encoder_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="UNI embedding compute dtype; outputs are cast back "
                        "to f32 before caching")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from gemm_gan_tpu.data.gdc import (DatasetIndex, GDCClient,
                                       build_expression_matrix, download_many,
                                       select_rna_seq_files,
                                       select_tissue_slides,
                                       write_case_artifacts)

    os.makedirs(args.out_dir, exist_ok=True)
    client = GDCClient()

    rna_manifest = pd.concat([read_manifest(m) for m in args.rna_manifests])
    rna_entities = client.rna_file_entities(rna_manifest["file_name"].tolist())
    rna_sel = select_rna_seq_files(rna_entities)

    if args.tissue_manifests and not args.skip_slides:
        slide_manifest = pd.concat([read_manifest(m)
                                    for m in args.tissue_manifests])
        slide_entities = client.slide_file_entities(
            slide_manifest["file_name"].tolist())
        slide_sel = select_tissue_slides(
            slide_entities, rna_sel["portion_submitter_id"].tolist())
    else:
        slide_sel = pd.DataFrame({"case_id": rna_sel["case_id"],
                                  "file_name": ""})

    index = DatasetIndex.build(rna_sel[["case_id", "file_name"]],
                               slide_sel[["case_id", "file_name"]])
    if args.max_cases:
        keep = index.case_ids()[:args.max_cases]
        index.cases = {c: index.cases[c] for c in keep}
    index.save(os.path.join(args.out_dir, "dataset_index.json"))

    rna_dir = os.path.join(args.out_dir, "rna_seq")
    dl = download_many(client, rna_sel[rna_sel["case_id"].isin(index.cases)],
                       rna_dir, max_workers=args.max_workers)
    print(json.dumps({"rna_downloaded": sum(dl.values()), "rna_total": len(dl)}))

    build_expression_matrix(index, rna_dir,
                            os.path.join(args.out_dir, "rna_seq.parquet"))

    metainfos = client.case_metadata(index.case_ids())
    write_case_artifacts(index, metainfos, args.out_dir)

    if args.uni_checkpoint and args.tissue_manifests and not args.skip_slides:
        _embed_slides(args, client, index, slide_sel)
    print(json.dumps({"cases": len(index.cases), "out_dir": args.out_dir}))


def _embed_slides(args, client, index, slide_sel):
    """Stream slides: download -> Otsu tiles -> Flax UNI -> patch cache."""
    import jax
    import jax.numpy as jnp
    import torch

    from gemm_gan_tpu.data.ingest import IngestPipeline
    from gemm_gan_tpu.data.tiles import (extract_tiles, open_slide, otsu_mask,
                                         read_tile, slide_thumbnail)
    from gemm_gan_tpu.encoders.cache import batched_apply
    from gemm_gan_tpu.encoders.vit import (FlaxViT, ViTParams,
                                           convert_timm_vit_state_dict,
                                           preprocess_tiles)

    p = ViTParams()
    sd = torch.load(args.uni_checkpoint, map_location="cpu")
    params = convert_timm_vit_state_dict(
        {k: v.numpy() for k, v in sd.items()}, p)
    # bf16 compute (f32 params/layernorms/softmax) for the embedding stage:
    # inference-only, cosine > 0.999 vs f32 (probe_subsystems.py vit) — the
    # WGAN-critic bf16 caution does not apply to offline encoders
    dtype = jnp.bfloat16 if args.encoder_dtype == "bfloat16" else jnp.float32
    vit = FlaxViT(p, dtype=dtype)
    embed = jax.jit(lambda x: vit.apply({"params": params},
                                        x).astype(jnp.float32))

    file_by_case = dict(zip(slide_sel["case_id"], slide_sel["file_name"]))
    id_by_case = dict(zip(slide_sel["case_id"], slide_sel["file_id"]))
    slide_dir = os.path.join(args.out_dir, "tissue")
    os.makedirs(slide_dir, exist_ok=True)

    def download(case_id):
        dest = os.path.join(slide_dir, file_by_case[case_id])
        if os.path.exists(dest):
            return dest
        return dest if client.download_file(id_by_case[case_id], dest) else None

    def tile(case_id, path):
        slide = open_slide(path)
        mask = otsu_mask(slide_thumbnail(slide))
        boxes = extract_tiles(mask, slide.level_dimensions[0], args.tile_size)
        tiles = np.stack([read_tile(slide, x, y, args.tile_size)
                          for x, y, _, _ in boxes])
        return preprocess_tiles(tiles)

    def embed_fn(tiles):
        return batched_apply(embed, tiles, batch_size=64)

    pipe = IngestPipeline(download, tile, embed_fn,
                          os.path.join(args.out_dir, "patch_embeddings_uni"),
                          max_download_workers=args.max_workers)
    results = pipe.run([c for c in index.case_ids() if c in file_by_case])
    # per-case patch COUNTS (valid_patches.json carries the {case: {size:
    # boxes}} schema of data/tiles.py — a different artifact)
    pipe.write_tiles_info(os.path.join(args.out_dir, "tiles_info.json"))
    ok = sum(r.status == "ok" for r in results)
    print(json.dumps({"slides_embedded": ok, "slides_total": len(results)}))


if __name__ == "__main__":
    main()
