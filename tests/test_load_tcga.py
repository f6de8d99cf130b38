"""load_tcga against a fabricated on-disk TCGA artifact layout: all four
batch schemas, modality intersection, normalization, label vocab, patch bank."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest

from gemm_gan_tpu.data.tcga import load_tcga

N_CASES = 30
N_GENES = 40
PATCH_DIM = 16
TEXT_DIM = 12
TOKENS = 6


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tcga")
    rng = np.random.RandomState(0)
    cases = [f"case-{i:03d}" for i in range(N_CASES)]

    expr = rng.rand(N_CASES, N_GENES) * 8
    expr[:, -3:] = 0.0  # three all-zero genes -> dropped by the >90% filter
    genes = [f"ENSG{i:05d}" for i in range(N_GENES)]
    pd.DataFrame(expr, index=pd.Index(cases, name="case_id"),
                 columns=genes).to_parquet(os.path.join(d, "rna_seq.parquet"))

    cls = pd.DataFrame(rng.randn(N_CASES, TEXT_DIM).astype(np.float32),
                       index=pd.Index(cases, name="case_id"))
    cls.columns = [str(c) for c in cls.columns]
    cls.to_parquet(os.path.join(d, "clinical_modernbert_embeddings.parquet"))

    pdir = os.path.join(d, "patch_embeddings_uni")
    tdir = os.path.join(d, "clinical_modernbert_embeddings")
    os.makedirs(pdir)
    os.makedirs(tdir)
    for i, c in enumerate(cases):
        n_patches = rng.randint(2, 12)
        np.save(os.path.join(pdir, f"{c}.npy"),
                rng.randn(n_patches, PATCH_DIM).astype(np.float32))
        np.save(os.path.join(tdir, f"{c}.npy"),
                rng.randn(TOKENS, TEXT_DIM).astype(np.float32))
        np.save(os.path.join(tdir, f"{c}_attention_mask.npy"),
                (np.arange(TOKENS) < rng.randint(2, TOKENS + 1)))

    metainfos = {c: {"disease_type": ["Adeno", "Squamous", "Glioma"][i % 3],
                     "primary_site": ["Lung", "Brain"][i % 2]}
                 for i, c in enumerate(cases)}
    with open(os.path.join(d, "metainfos.pkl"), "wb") as f:
        pickle.dump(metainfos, f)
    return str(d)


def test_genes_schema(data_dir):
    splits = load_tcga(data_dir, schema="genes")
    assert splits["meta"]["n_genes"] == N_GENES - 3  # zero genes dropped
    total = sum(splits[s]["genes"].shape[0] for s in ("train", "val", "test"))
    assert total == N_CASES
    # train-stats standardization: train mean ~0, std ~1 on kept genes
    tr = splits["train"]["genes"]
    assert abs(tr.mean()) < 0.2 and abs(tr.std() - 1) < 0.2


def test_multi_patch_schema(data_dir):
    splits = load_tcga(data_dir, schema="multi_patch", num_patches=8)
    tr = splits["train"]
    assert tr["patches"].shape[1:] == (8, PATCH_DIM)
    assert tr["patch_mask"].dtype == bool
    assert tr["text_emb"].shape[1] == TEXT_DIM
    assert tr["disease"].dtype == np.int32
    assert len(splits["meta"]["disease_vocab"]) == 3
    assert len(splits["meta"]["site_vocab"]) == 2
    # padded rows are masked off
    lens = tr["patch_mask"].sum(1)
    assert (lens >= 1).all() and (lens <= 8).all()


def test_multi_token_schema(data_dir):
    splits = load_tcga(data_dir, schema="multi_token", num_patches=8,
                       max_tokens=TOKENS)
    tr = splits["train"]
    assert tr["tokens"].shape[1:] == (TOKENS, TEXT_DIM)
    assert tr["token_mask"].dtype == bool
    assert "patches" in tr


def test_labels_schema(data_dir):
    splits = load_tcga(data_dir, schema="labels")
    tr = splits["train"]
    assert set(tr) >= {"genes", "disease", "site"}
    assert "patches" not in tr


def test_patch_bank_mode(data_dir):
    splits = load_tcga(data_dir, schema="multi_patch", num_patches=4,
                       patch_bank=True)
    P_bank = splits["train"]["patches"].shape[1]
    assert P_bank > 4  # cohort max (<= 4*num_patches cap), not the subsample
    # every real patch retained where counts allow
    assert splits["train"]["patch_mask"].sum(1).max() <= P_bank


def test_split_is_seeded_and_disjoint(data_dir):
    s1 = load_tcga(data_dir, schema="genes", seed=7)
    s2 = load_tcga(data_dir, schema="genes", seed=7)
    np.testing.assert_array_equal(s1["train"]["genes"], s2["train"]["genes"])
    idx = s1["meta"]["split_indices"]
    all_idx = np.concatenate([idx["train"], idx["val"], idx["test"]])
    assert len(set(all_idx.tolist())) == N_CASES
