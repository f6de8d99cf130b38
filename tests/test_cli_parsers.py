"""Parser contracts: every documented CLI flag must keep parsing.

The migration guide, README workflow table, and BASELINE measurement notes
reference these flags by name; a silent rename would strand users following
the docs (the reference's per-script argparse blocks are the counterpart —
e.g. /root/reference/src/conditional_gan_concat.py:1023-1038)."""


def test_train_parser_flags():
    from gemm_gan_tpu.cli.train import build_parser

    a = build_parser().parse_args([
        "--data_dir", "d", "--variant", "film_cross_attention",
        "--batch_size", "8", "--epochs", "2", "--latent_dim", "16",
        "--hidden_dim", "32", "--lr", "1e-4", "--optimizer", "rmsprop",
        "--n_critic", "5", "--gp_weight", "10", "--seed", "1",
        "--num_patches", "64", "--freq_compute_test", "10",
        "--normalization", "standardize", "--mesh_data", "2",
        "--mesh_model", "2", "--compute_dtype", "bfloat16",
        "--cond_embed_reuse", "per_update", "--ema_decay", "0.99",
        "--drift_epsilon", "1e-3", "--critic_scan", "--grad_accum", "4",
        "--profile_dir", "/tmp/p", "--profile_epochs", "2",
        "--checkpoint_every_eval", "--resume", "--shard_bank"])
    assert a.critic_scan and a.resume and a.profile_epochs == 2
    assert a.grad_accum == 4 and a.shard_bank


def test_export_parser_flags():
    from gemm_gan_tpu.cli.export import build_parser

    a = build_parser().parse_args([
        "--ckpt_dir", "c", "--out", "o", "--platforms", "tpu",
        "--batch", "64", "--use_ema", "--use_pallas", "on", "--seed", "1"])
    assert a.use_ema and a.use_pallas == "on" and a.batch == "64"


def test_sample_parser_flags():
    from gemm_gan_tpu.cli.sample import build_parser

    a = build_parser().parse_args([
        "--data_dir", "d", "--ckpt_dir", "c", "--num_repeats", "2",
        "--balanced", "--scan", "--host_dtype", "float16", "--seed", "1"])
    assert a.scan and a.balanced and a.host_dtype == "float16"


def test_evaluate_parser_flags():
    from gemm_gan_tpu.cli.evaluate import build_parser

    a = build_parser().parse_args([
        "--results_path", "r", "--train_real", "t.npy", "--skip_utility",
        "--plots", "--plot_genes", "100", "--out", "o.json"])
    assert a.skip_utility and a.plots and a.plot_genes == 100


def test_ingest_and_preprocess_parser_flags():
    from gemm_gan_tpu.cli.ingest import build_parser as ingest_parser
    from gemm_gan_tpu.cli.preprocess import build_parser as pre_parser

    a = ingest_parser().parse_args([
        "--rna_manifests", "m.txt", "--out_dir", "o",
        "--encoder_dtype", "bfloat16", "--skip_slides"])
    assert a.encoder_dtype == "bfloat16"
    b = pre_parser().parse_args([
        "--data_dir", "d", "--contrastive_dim", "64",
        "--encoder_dtype", "bfloat16"])
    assert b.contrastive_dim == 64 and b.encoder_dtype == "bfloat16"
