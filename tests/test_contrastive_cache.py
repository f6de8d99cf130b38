"""Contrastive engine learns alignment; cache builders write the reference
file layout (patch npys, CLS parquet, token npys + masks, contrastive dirs)."""

import os

import numpy as np
import pytest

from gemm_gan_tpu.encoders.cache import (batched_apply, build_contrastive_caches,
                                         build_patch_cache, build_text_cls_cache,
                                         build_text_token_cache)
from gemm_gan_tpu.encoders.contrastive import (ContrastiveConfig,
                                               ContrastiveEngine, info_nce)
from gemm_gan_tpu.eval.privacy import retrieve_cross_modal


def _paired_data(rng, n=64, image_dim=12, text_dim=8, n_classes=4):
    cls = rng.randint(0, n_classes, n)
    ci = rng.randn(n_classes, image_dim)
    ct = rng.randn(n_classes, text_dim)
    img = (ci[cls] + 0.1 * rng.randn(n, image_dim)).astype(np.float32)
    txt = (ct[cls] + 0.1 * rng.randn(n, text_dim)).astype(np.float32)
    return img, txt, cls


def test_contrastive_training_improves_alignment(rng):
    img, txt, cls = _paired_data(rng)
    cfg = ContrastiveConfig(image_dim=12, text_dim=8, emb_dim=6, lr=5e-3)
    eng = ContrastiveEngine(cfg)
    state = eng.init_state(0)

    def acc(state):
        zi, zt = eng.project(state, img, txt)
        idx, _ = retrieve_cross_modal(zi, zt, top_k=1)
        return float((cls[idx[:, 0]] == cls).mean())

    before = acc(state)
    for _ in range(60):
        state, loss = eng.step(state, img, txt)
    after = acc(state)
    assert np.isfinite(loss)
    assert after > before
    assert after > 0.5  # classes are well separated; alignment must be learned


def test_info_nce_perfect_alignment_is_low(rng):
    import jax.numpy as jnp

    z = rng.randn(16, 4).astype(np.float32)
    z = z / np.linalg.norm(z, axis=1, keepdims=True)
    aligned = float(info_nce(jnp.asarray(z), jnp.asarray(z), 0.05))
    shuffled = float(info_nce(jnp.asarray(z), jnp.asarray(np.roll(z, 1, 0)), 0.05))
    assert aligned < shuffled


def test_batched_apply_pads_tail(rng):
    calls = []

    def fn(x):
        calls.append(x.shape[0])
        return x * 2.0

    x = rng.randn(10, 3).astype(np.float32)
    out = batched_apply(fn, x, batch_size=4)
    np.testing.assert_allclose(out, x * 2.0, rtol=1e-6)
    assert calls == [4, 4, 4]  # tail padded to the compiled shape


def test_cache_builders_write_reference_layout(tmp_path, rng):
    E, L, H = 6, 5, 4
    tiles = {f"case{i}": rng.rand(3, 8, 8, 3).astype(np.float32) for i in range(3)}
    ids = {f"case{i}": rng.randint(0, 50, L) for i in range(3)}
    masks = {f"case{i}": (np.arange(L) < (i + 2)) for i in range(3)}

    def embed_tiles(x):
        return np.asarray(x).reshape(x.shape[0], -1)[:, :E]

    def encode_text(ids, mask):
        ids = np.asarray(ids)
        out = np.tile(ids[:, :, None], (1, 1, H)).astype(np.float32)
        return out

    patch_dir = str(tmp_path / "patch_embeddings_uni")
    build_patch_cache(embed_tiles, tiles, patch_dir, batch_size=2)
    for c in tiles:
        assert np.load(os.path.join(patch_dir, f"{c}.npy")).shape == (3, E)

    pq = str(tmp_path / "clinical_modernbert_embeddings.parquet")
    build_text_cls_cache(encode_text, ids, masks, pq, batch_size=2)
    import pandas as pd

    df = pd.read_parquet(pq)
    assert df.shape == (3, H)

    tok_dir = str(tmp_path / "clinical_modernbert_embeddings")
    build_text_token_cache(encode_text, ids, masks, tok_dir, batch_size=2)
    for c in ids:
        assert np.load(os.path.join(tok_dir, f"{c}.npy")).shape == (L, H)
        assert np.load(os.path.join(tok_dir, f"{c}_attention_mask.npy")).dtype == bool

    build_contrastive_caches(
        project_image=lambda p: np.asarray(p)[:, :4],
        project_text=lambda t: np.asarray(t)[:, :4],
        patch_cache_dir=patch_dir, token_cache_dir=tok_dir,
        out_root=str(tmp_path), emb_dim=4)
    assert (tmp_path / "text_embeddings_contrastive_4" / "case0.npy").exists()
    img_df = pd.read_parquet(tmp_path / "image_embeddings_contrastive.parquet")
    both_df = pd.read_parquet(tmp_path / "embeddings_contrastive.parquet")
    assert img_df.shape == (3, 4) and both_df.shape == (3, 4)
