"""Text preprocessing CLI: descriptions -> ModernBERT embedding caches.

One command replaces the reference's L1 text scripts
(/root/reference/src/preprocessing/text_preprocessing.py,
save_text_embeddings.py, save_text_token_embeddings.py,
save_text_token_embeddings_contrastive.py):

  python -m gemm_gan_tpu.cli.preprocess --data_dir /data/tcga \
      [--generate_descriptions] [--modernbert Simonlee711/Clinical_ModernBERT] \
      [--contrastive_dim 128] [--max_length 300]

Stages (each skipped when its artifact exists):
  1. descriptions.json via the injected biomedical LLM (host-side);
  2. tokenize with the HF tokenizer, encode with the Flax ModernBERT port
     (weights converted from the torch checkpoint), write the CLS parquet
     and per-case token npys + masks;
  3. optionally train the contrastive projection pair on (mean patch
     embedding, CLS) pairs and write the projected caches.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="gemm_gan_tpu text preprocessing")
    p.add_argument("--data_dir", required=True)
    p.add_argument("--modernbert", default="Simonlee711/Clinical_ModernBERT")
    p.add_argument("--llm", default="ContactDoctor/Bio-Medical-Llama-3-8B")
    p.add_argument("--generate_descriptions", action="store_true")
    p.add_argument("--max_length", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--contrastive_dim", type=int, default=0,
                   help=">0 trains the projection pair and writes caches")
    p.add_argument("--contrastive_epochs", type=int, default=50)
    p.add_argument("--encoder_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="ModernBERT embedding compute dtype; cached "
                        "embeddings are cast back to f32")
    return p


def _load_metainfos(data_dir: str) -> dict:
    js = os.path.join(data_dir, "metainfos.json")
    if os.path.exists(js):
        with open(js) as f:
            return json.load(f)
    import pickle

    with open(os.path.join(data_dir, "metainfos.pkl"), "rb") as f:
        return pickle.load(f)


def main(argv=None):
    args = build_parser().parse_args(argv)
    d = args.data_dir

    desc_path = os.path.join(d, "descriptions.json")
    if args.generate_descriptions and not os.path.exists(desc_path):
        from gemm_gan_tpu.data.descriptions import (generate_descriptions,
                                                    hf_causal_generate_fn)

        metainfos = _load_metainfos(d)
        generate_descriptions(hf_causal_generate_fn(args.llm), metainfos,
                              out_path=desc_path)
    with open(desc_path) as f:
        descriptions = json.load(f)

    # ---- tokenize + encode with the Flax ModernBERT port
    import jax
    import torch
    from transformers import AutoModel, AutoTokenizer

    from gemm_gan_tpu.encoders.cache import (build_text_cls_cache,
                                             build_text_token_cache)
    from gemm_gan_tpu.encoders.modernbert import (FlaxModernBert,
                                                  convert_modernbert_state_dict,
                                                  params_from_config)

    tokenizer = AutoTokenizer.from_pretrained(args.modernbert)
    hf = AutoModel.from_pretrained(args.modernbert)
    p = params_from_config(hf.config)
    params = convert_modernbert_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, p)
    del hf
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.encoder_dtype == "bfloat16" else jnp.float32
    model = FlaxModernBert(p, dtype=dtype)
    encode = jax.jit(lambda ids, mask: model.apply(
        {"params": params}, ids, mask).astype(jnp.float32))

    ids_by_case, mask_by_case = {}, {}
    for case, text in descriptions.items():
        enc = tokenizer(text or " ", max_length=args.max_length,
                        padding="max_length", truncation=True)
        ids_by_case[case] = np.asarray(enc["input_ids"], np.int32)
        mask_by_case[case] = np.asarray(enc["attention_mask"], bool)

    cls_path = os.path.join(d, "clinical_modernbert_embeddings.parquet")
    if not os.path.exists(cls_path):
        build_text_cls_cache(encode, ids_by_case, mask_by_case, cls_path,
                             args.batch_size)
    tok_dir = os.path.join(d, "clinical_modernbert_embeddings")
    if not os.path.isdir(tok_dir):
        build_text_token_cache(encode, ids_by_case, mask_by_case, tok_dir,
                               args.batch_size)
    print(json.dumps({"cases_encoded": len(ids_by_case)}))

    if args.contrastive_dim > 0:
        _contrastive(args, d, tok_dir)


def _contrastive(args, d: str, tok_dir: str):
    import pandas as pd

    from gemm_gan_tpu.encoders.cache import build_contrastive_caches
    from gemm_gan_tpu.encoders.contrastive import (ContrastiveConfig,
                                                   ContrastiveEngine)

    patch_dir = os.path.join(d, "patch_embeddings_uni")
    cls_df = pd.read_parquet(
        os.path.join(d, "clinical_modernbert_embeddings.parquet"))
    pairs = []
    for case in cls_df.index:
        ppath = os.path.join(patch_dir, f"{case}.npy")
        if os.path.exists(ppath):
            pairs.append((np.load(ppath).mean(0), cls_df.loc[case].to_numpy()))
    img = np.stack([a for a, _ in pairs]).astype(np.float32)
    txt = np.stack([b for _, b in pairs]).astype(np.float32)

    cfg = ContrastiveConfig(image_dim=img.shape[1], text_dim=txt.shape[1],
                            emb_dim=args.contrastive_dim)
    eng = ContrastiveEngine(cfg)
    state = eng.init_state(0)
    rng = np.random.RandomState(0)
    bs = min(256, img.shape[0])
    for _ in range(args.contrastive_epochs):
        order = rng.permutation(img.shape[0])
        for s in range(0, len(order) - bs + 1, bs):
            idx = order[s:s + bs]
            state, _ = eng.step(state, img[idx], txt[idx])

    build_contrastive_caches(
        project_image=lambda x: eng.project(state, image_emb=x),
        project_text=lambda x: eng.project(state, text_emb=x),
        patch_cache_dir=patch_dir, token_cache_dir=tok_dir, out_root=d,
        emb_dim=args.contrastive_dim)
    print(json.dumps({"contrastive_pairs": len(pairs),
                      "emb_dim": args.contrastive_dim}))


if __name__ == "__main__":
    main()
