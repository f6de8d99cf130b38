"""End-to-end CLI integration: `cli.train.main` over a fabricated TCGA
artifact layout (the reference's per-file __main__ protocol, one CLI).
Uses non-canonical embedding dims (12-d text, 16-d patches) to pin the
fusion-sized-from-data behavior (the reference's contrastive embeddings are
128-d, not 768/1024)."""

import json
import os
import pickle

import numpy as np
import pandas as pd
import pytest

N_CASES = 30
N_GENES = 40
PATCH_DIM = 16
TEXT_DIM = 12
TOKENS = 6


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tcga_cli")
    rng = np.random.RandomState(0)
    cases = [f"case-{i:03d}" for i in range(N_CASES)]

    expr = rng.rand(N_CASES, N_GENES) * 8
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
        np.save(os.path.join(pdir, f"{c}.npy"),
                rng.randn(rng.randint(2, 12), PATCH_DIM).astype(np.float32))
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


def test_cli_train_film_end_to_end(data_dir, tmp_path):
    from gemm_gan_tpu.cli.train import main

    out = str(tmp_path / "out")
    main(["--variant", "film", "--data_dir", data_dir,
          "--output_path", out, "--run_name", "cli_smoke",
          "--batch_size", "8", "--epochs", "2", "--latent_dim", "8",
          "--hidden_dim", "16", "--num_patches", "8",
          "--freq_compute_test", "10", "--n_critic", "2", "--critic_scan", "--mesh_model", "1"])
    run_dir = os.path.join(out, "cli_smoke")
    with open(os.path.join(run_dir, "results.json")) as f:
        res = json.load(f)
    assert np.isfinite(res["gamma_mean"])
    dumps = [p for p in os.listdir(run_dir) if p.startswith("test_")]
    assert dumps, "test dump dirs missing"
    assert os.path.exists(os.path.join(run_dir, "ckpt"))


def test_cli_train_evaluate_only(data_dir, tmp_path):
    """--evaluate_only must restore the checkpoint written by a previous run
    (reference `evaluate()` reload protocol)."""
    from gemm_gan_tpu.cli.train import main

    out = str(tmp_path / "out2")
    args = ["--variant", "vanilla", "--data_dir", data_dir,
            "--output_path", out, "--run_name", "cli_eval",
            "--batch_size", "8", "--epochs", "2", "--latent_dim", "8",
            "--hidden_dim", "16", "--freq_compute_test", "10", "--n_critic", "2", "--critic_scan",
            "--mesh_model", "1"]
    main(args)
    main(args + ["--evaluate_only"])
    with open(os.path.join(out, "cli_eval", "results.json")) as f:
        res = json.load(f)
    assert np.isfinite(res["gamma_mean"])


@pytest.mark.parametrize("variant", ["vae", "cvae"])
def test_cli_train_vae_family(variant, data_dir, tmp_path):
    from gemm_gan_tpu.cli.train import main

    out = str(tmp_path / "out_vae")
    res = main(["--variant", variant, "--data_dir", data_dir,
                "--output_path", out, "--run_name", f"cli_{variant}",
                "--batch_size", "8", "--epochs", "2", "--latent_dim", "8",
                "--hidden_dim", "16", "--freq_compute_test", "10", "--n_critic", "2", "--critic_scan",
                "--mesh_model", "1"])
    assert np.isfinite(res["gamma_mean"])
    run_dir = os.path.join(out, f"cli_{variant}")
    dumps = [p for p in os.listdir(run_dir) if p.startswith("test_")]
    assert dumps
    if variant == "cvae":
        files = os.listdir(os.path.join(run_dir, dumps[0]))
        assert "train_labels_primary_site_real.npy" in files


def test_config_json_roundtrip():
    """The resolved config tree must survive JSON (tuples, nested sections,
    defaults for absent fields)."""
    import dataclasses

    from gemm_gan_tpu.config import (config_from_dict, config_to_dict,
                                     variant_config)

    cfg = variant_config("film_cross_attention", n_genes=77,
                         fusion_kw=dict(cond_dim=32, num_heads=2))
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.5,
                                       clip_grad_disc=3.0))
    d = json.loads(json.dumps(config_to_dict(cfg)))
    assert config_from_dict(d) == cfg
    # forward compat: a config written before a field existed still loads
    d["train"].pop("ema_decay")
    assert config_from_dict(d).train.ema_decay == 0.0


def test_cli_sample_restores_saved_config(data_dir, tmp_path):
    """cli.sample rebuilds the model from the run dir's config.json: this
    checkpoint was trained with non-default dims (latent 8, hidden 16,
    num_patches 4, EMA on) which the sampler cannot guess from flags. Also
    exercises the --scan serving path end to end."""
    from gemm_gan_tpu.cli.sample import main as sample_main
    from gemm_gan_tpu.cli.train import main as train_main

    out = str(tmp_path / "out_s")
    train_main(["--variant", "film", "--data_dir", data_dir,
                "--output_path", out, "--run_name", "s",
                "--batch_size", "8", "--epochs", "1", "--latent_dim", "8",
                "--hidden_dim", "16", "--num_patches", "4",
                "--freq_compute_test", "10", "--n_critic", "2", "--critic_scan", "--ema_decay", "0.9"])
    run_dir = os.path.join(out, "s")
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    gen_path = str(tmp_path / "gen.npy")
    sample_main(["--variant", "film", "--data_dir", data_dir,
                 "--ckpt_dir", os.path.join(run_dir, "ckpt"),
                 "--out", gen_path, "--num_repeats", "2", "--scan"])
    gen = np.load(gen_path)
    assert gen.ndim == 2
    assert np.isfinite(gen).all()


def test_cli_evaluate_plots(tmp_path):
    """cli.evaluate --plots writes the post-hoc figure set per test_* dir
    (embedding panels, gene distributions, correlation-distance matrices)
    alongside the per-run gamma/distance records."""
    from gemm_gan_tpu.cli.evaluate import main as eval_main
    from gemm_gan_tpu.eval.utility import save_run_artifacts

    rng = np.random.RandomState(3)
    run_dir = str(tmp_path / "res")
    d = os.path.join(run_dir, "test_0_epoch_2")
    n, g = 24, 30
    save_run_artifacts(d, {
        "data_real": rng.randn(n, g), "data_gen": rng.randn(n, g),
        "test_real": rng.randn(n, g), "test_gen": rng.randn(n, g),
        "train_labels_real": rng.randint(0, 3, n),
        "train_labels_gen": rng.randint(0, 3, n),
        "test_labels_real": rng.randint(0, 3, n),
        "test_labels_gen": rng.randint(0, 3, n)})
    train_real = str(tmp_path / "train_real.npy")
    np.save(train_real, rng.randn(40, g))
    res = eval_main(["--results_path", run_dir, "--train_real", train_real,
                     "--plots", "--plot_genes", "10", "--skip_utility"])
    run = res["per_run"][0]
    assert np.isfinite(run["gamma"]) and 0.0 <= run["dcr"] <= 1.0
    fig_dir = os.path.join(d, "figures")
    for f in ("embedding_panels.png", "gene_distributions.png",
              "corr_distance_matrices.png"):
        path = os.path.join(fig_dir, f)
        assert os.path.exists(path) and os.path.getsize(path) > 0, f


def test_cli_evaluate_privacy_defaults_to_dump_data_real(tmp_path):
    """Without --train_real, cli.evaluate computes dcr/nndr from each run
    dir's own data_real.npy — exactly what the reference main feeds them
    (conditional_gan_concat.py:1090-1102)."""
    from gemm_gan_tpu.cli.evaluate import main as eval_main
    from gemm_gan_tpu.eval.privacy import dcr
    from gemm_gan_tpu.eval.utility import save_run_artifacts

    rng = np.random.RandomState(5)
    run_dir = str(tmp_path / "res")
    n, g = 20, 12
    arrays = {
        "data_real": rng.randn(n, g), "data_gen": rng.randn(n, g),
        "test_real": rng.randn(n, g), "test_gen": rng.randn(n, g)}
    save_run_artifacts(os.path.join(run_dir, "test_0_epoch_1"), arrays)
    res = eval_main(["--results_path", run_dir, "--skip_utility"])
    run = res["per_run"][0]
    want = dcr(arrays["data_real"], arrays["data_gen"], arrays["test_real"])
    assert run["dcr"] == want and 0.0 <= run["nndr"] <= 1.0


def test_cli_train_film_shard_bank(data_dir, tmp_path):
    """--shard_bank: the training bank shards over the mesh data axis and
    the fit loop takes the sharded streaming scan; the run still produces
    the full dump + results protocol."""
    import jax

    from gemm_gan_tpu.cli.train import main

    out = str(tmp_path / "out_sb")
    main(["--variant", "film", "--data_dir", data_dir,
          "--output_path", out, "--run_name", "cli_sb",
          "--batch_size", "8", "--epochs", "2", "--latent_dim", "8",
          "--hidden_dim", "16", "--num_patches", "8",
          "--freq_compute_test", "10", "--n_critic", "2", "--critic_scan", "--shard_bank"])
    run_dir = os.path.join(out, "cli_sb")
    with open(os.path.join(run_dir, "results.json")) as f:
        res = json.load(f)
    assert np.isfinite(res["gamma_mean"])
    with open(os.path.join(run_dir, "config.json")) as f:
        assert json.load(f)["data"]["shard_bank"] is True
    assert [p for p in os.listdir(run_dir) if p.startswith("test_")]


def test_cli_train_shard_bank_rejects_vae(tmp_path):
    from gemm_gan_tpu.cli.train import main

    with pytest.raises(ValueError, match="not supported for the VAE"):
        main(["--variant", "vae", "--data_dir", "/nonexistent",
              "--output_path", str(tmp_path), "--run_name", "x",
              "--shard_bank"])


def test_cli_evaluate_auto_best_epoch(tmp_path):
    """VERDICT r4 #7: with a best.json in the run dir, cli.evaluate defaults
    to that epoch's dump dirs (pure best-checkpoint evidence) instead of
    mixing every checkpoint's dumps; --epoch all forces the old behavior."""
    from gemm_gan_tpu.cli.evaluate import main as eval_main
    from gemm_gan_tpu.eval.utility import save_run_artifacts

    rng = np.random.RandomState(7)
    run_dir = str(tmp_path / "res")
    n, g = 20, 12
    for epoch in (2, 5):
        save_run_artifacts(os.path.join(run_dir, f"test_0_epoch_{epoch}"), {
            "data_real": rng.randn(n, g), "data_gen": rng.randn(n, g),
            "test_real": rng.randn(n, g), "test_gen": rng.randn(n, g)})
    with open(os.path.join(run_dir, "best.json"), "w") as f:
        json.dump({"score": 1.0, "epoch": 2, "step": 8}, f)

    res = eval_main(["--results_path", run_dir, "--skip_utility"])
    assert [r["dir"] for r in res["per_run"]] == ["test_0_epoch_2"]
    res_all = eval_main(["--results_path", run_dir, "--skip_utility",
                         "--epoch", "all"])
    assert len(res_all["per_run"]) == 2
    res_5 = eval_main(["--results_path", run_dir, "--skip_utility",
                       "--epoch", "5"])
    assert [r["dir"] for r in res_5["per_run"]] == ["test_0_epoch_5"]


def test_cli_sample_which_best(data_dir, tmp_path):
    """VERDICT r4 #8: gemmgan-sample --which best restores the gate-best
    checkpoint (ckpt_best/ + best.json) with one flag instead of a manual
    --ckpt_dir edit, and the samples differ from the final checkpoint's
    (different params restored)."""
    from gemm_gan_tpu.cli.sample import main as sample_main
    from gemm_gan_tpu.cli.train import main as train_main

    out = str(tmp_path / "out_wb")
    # freq 1 < epochs 3 => periodic validation runs => ckpt_best exists
    train_main(["--variant", "film", "--data_dir", data_dir,
                "--output_path", out, "--run_name", "wb",
                "--batch_size", "8", "--epochs", "3", "--latent_dim", "8",
                "--hidden_dim", "16", "--num_patches", "4",
                "--freq_compute_test", "1", "--n_critic", "2",
                "--critic_scan"])
    run_dir = os.path.join(out, "wb")
    assert os.path.isdir(os.path.join(run_dir, "ckpt_best"))
    assert os.path.exists(os.path.join(run_dir, "best.json"))
    last_path, best_path = str(tmp_path / "l.npy"), str(tmp_path / "b.npy")
    ckpt = os.path.join(run_dir, "ckpt")
    sample_main(["--variant", "film", "--data_dir", data_dir,
                 "--ckpt_dir", ckpt, "--out", last_path])
    sample_main(["--variant", "film", "--data_dir", data_dir,
                 "--ckpt_dir", ckpt, "--which", "best", "--out", best_path])
    last, best = np.load(last_path), np.load(best_path)
    assert last.shape == best.shape and np.isfinite(best).all()
    # the best eval lands at epoch 0 or 1 — strictly before the final
    # step — so the two restores load different params
    assert not np.array_equal(last, best)
