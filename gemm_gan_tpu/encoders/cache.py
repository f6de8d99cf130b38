"""Embedding-cache builder: jitted batch inference -> reference cache layout.

Replaces the reference's lock-guarded per-thread CUDA inference writing
`patch_embeddings_uni/{case_id}.npy`
(/root/reference/src/download_and_preprocess_data.py:133-161) and the
text-embedding scripts writing `clinical_modernbert_embeddings.parquet` /
`clinical_modernbert_embeddings/{case_id}.npy` (+ `_attention_mask.npy`)
(/root/reference/src/preprocessing/save_text_embeddings.py:40-54,
save_text_token_embeddings.py) and the contrastive caches
(src/preprocessing/save_text_token_embeddings_contrastive.py,
src/preprocess_embeddings.py:118-158).

All encoder forwards run as ONE jitted program per fixed batch shape (last
batch padded to keep shapes static), so cache building is a straight-line
TPU pipeline instead of thread-pooled GPU calls.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def batched_apply(fn: Callable, inputs: np.ndarray, batch_size: int = 64,
                  extra: Optional[Tuple[np.ndarray, ...]] = None) -> np.ndarray:
    """Run a jitted fn over fixed-size batches; pad the tail to keep the
    compiled shape unique (one compile for the whole sweep)."""
    n = inputs.shape[0]
    outs = []
    for start in range(0, n, batch_size):
        chunk = inputs[start:start + batch_size]
        extras = tuple(e[start:start + batch_size] for e in (extra or ()))
        pad = batch_size - chunk.shape[0]
        if pad > 0:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0)
            extras = tuple(np.concatenate(
                [e, np.repeat(e[-1:], pad, axis=0)], axis=0) for e in extras)
        out = np.asarray(fn(jnp.asarray(chunk),
                            *(jnp.asarray(e) for e in extras)))
        outs.append(out[:batch_size - pad] if pad > 0 else out)
    return np.concatenate(outs, axis=0) if outs else np.empty((0,))


def build_patch_cache(embed_fn: Callable, tiles_by_case: Dict[str, np.ndarray],
                      out_dir: str, batch_size: int = 64) -> Dict[str, str]:
    """Write `{out_dir}/{case_id}.npy` = [N_patches, E] UNI embeddings.

    `embed_fn`: jitted (tiles [B, H, W, 3] -> [B, E]), e.g.
    `jax.jit(lambda x: vit.apply({'params': p}, x))`.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for case_id, tiles in tiles_by_case.items():
        emb = batched_apply(embed_fn, tiles, batch_size)
        path = os.path.join(out_dir, f"{case_id}.npy")
        np.save(path, emb.astype(np.float32))
        paths[case_id] = path
    return paths


def build_text_cls_cache(encode_fn: Callable, ids_by_case: Dict[str, np.ndarray],
                         mask_by_case: Dict[str, np.ndarray], out_parquet: str,
                         batch_size: int = 32) -> None:
    """Write one parquet of CLS vectors per case (columns = dims, index =
    case_id; reference layout save_text_embeddings.py:54)."""
    import pandas as pd

    cases = sorted(ids_by_case)
    ids = np.stack([ids_by_case[c] for c in cases])
    mask = np.stack([mask_by_case[c] for c in cases])
    hidden = batched_apply(encode_fn, ids, batch_size, extra=(mask,))
    cls = hidden[:, 0, :]
    df = pd.DataFrame(cls.astype(np.float32), index=pd.Index(cases, name="case_id"))
    df.columns = [str(c) for c in df.columns]
    os.makedirs(os.path.dirname(out_parquet) or ".", exist_ok=True)
    df.to_parquet(out_parquet)


def build_text_token_cache(encode_fn: Callable, ids_by_case: Dict[str, np.ndarray],
                           mask_by_case: Dict[str, np.ndarray], out_dir: str,
                           batch_size: int = 32) -> None:
    """Write `{case}.npy` [L, E] + `{case}_attention_mask.npy` [L] per case
    (reference layout save_text_token_embeddings.py:50-54). Masks are saved
    True=valid; the reference's torch-convention inversion happens in its
    loader, ours standardizes at the data boundary."""
    os.makedirs(out_dir, exist_ok=True)
    cases = sorted(ids_by_case)
    ids = np.stack([ids_by_case[c] for c in cases])
    mask = np.stack([mask_by_case[c] for c in cases])
    hidden = batched_apply(encode_fn, ids, batch_size, extra=(mask,))
    for i, case in enumerate(cases):
        np.save(os.path.join(out_dir, f"{case}.npy"),
                hidden[i].astype(np.float32))
        np.save(os.path.join(out_dir, f"{case}_attention_mask.npy"),
                mask[i].astype(bool))


def build_contrastive_caches(project_image: Callable, project_text: Callable,
                             patch_cache_dir: str, token_cache_dir: str,
                             out_root: str, emb_dim: int) -> None:
    """Project cached UNI / ModernBERT embeddings into the shared space:
    `text_embeddings_contrastive_{d}/{case}.npy`, mean-pooled
    `image_embeddings_contrastive.parquet` and the averaged
    `embeddings_contrastive.parquet` (reference: preprocess_embeddings.py:
    118-119,157-158)."""
    import pandas as pd

    text_out = os.path.join(out_root, f"text_embeddings_contrastive_{emb_dim}")
    os.makedirs(text_out, exist_ok=True)
    img_rows, both_rows, cases = [], [], []
    for fname in sorted(os.listdir(patch_cache_dir)):
        if not fname.endswith(".npy"):
            continue
        case = fname[:-4]
        patches = np.load(os.path.join(patch_cache_dir, fname))
        zi = np.asarray(project_image(patches)).mean(axis=0)
        zi /= max(np.linalg.norm(zi), 1e-8)
        tok_path = os.path.join(token_cache_dir, f"{case}.npy")
        if not os.path.exists(tok_path):
            continue
        tokens = np.load(tok_path)
        zt_tokens = np.asarray(project_text(tokens))
        np.save(os.path.join(text_out, f"{case}.npy"),
                zt_tokens.astype(np.float32))
        zt = zt_tokens[0]
        cases.append(case)
        img_rows.append(zi)
        both_rows.append((zi + zt) / 2.0)
    idx = pd.Index(cases, name="case_id")
    pd.DataFrame(np.asarray(img_rows, np.float32), index=idx).rename(
        columns=str).to_parquet(
        os.path.join(out_root, "image_embeddings_contrastive.parquet"))
    pd.DataFrame(np.asarray(both_rows, np.float32), index=idx).rename(
        columns=str).to_parquet(
        os.path.join(out_root, "embeddings_contrastive.parquet"))
