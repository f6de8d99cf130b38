"""Single config tree for every experiment variant.

The reference duplicates an argparse block + constructor defaults into each of
its 8 model entry-point files (e.g. /root/reference/src/conditional_gan_concat.py:1023-1038,
src/vanilla_gan_unconditional.py:764-773).  Here one dataclass tree + a preset
table expresses all variants; a variant is a *config*, not a file.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Literal, Optional, Sequence, Tuple

VariantName = Literal[
    "vanilla",                  # unconditional WGAN-GP      (vanilla_gan_unconditional.py)
    "concat_text",              # text-CLS concat            (conditional_gan_concat.py, condition_type='text')
    "concat_image",             # pooled-patch concat        (conditional_gan_concat.py, condition_type='image')
    "attention",                # 1-query pooled attention   (conditional_gan_attention.py)
    "img_transformer",          # patch CLS transformer      (conditional_gan_img_transformer.py)
    "film",                     # FiLM + patch transformer   (conditional_gan_film.py)
    "cross_attention",          # token-level bidirectional  (conditional_gan_cross_attention.py)
    "film_cross_attention",     # full GeMM-GAN              (conditional_gan_cross_attention_with_film.py)
    "benchmark",                # true-label conditional     (benchmark_generative_model.py)
    "vae",                      # vanilla VAE                (vae/vanilla_vae.py)
    "cvae",                     # conditional VAE            (vae/cvae.py)
]


@dataclass(frozen=True)
class FusionConfig:
    """Conditioning/fusion module configuration.

    ``kind`` selects the fusion architecture (reference: one architecture per
    file, see SURVEY.md §2.3). All fusion modules map the conditioning inputs
    to a single ``cond_dim`` vector per sample.
    """

    kind: str = "none"  # none|concat|attention|img_transformer|film|xattn|film_xattn|labels
    condition_type: str = "text"  # for concat: text|image
    cond_dim: int = 256
    text_dim: int = 768
    patch_dim: int = 1024
    num_heads: int = 4
    ff_dim: int = 512
    num_layers: int = 2
    dropout: float = 0.1
    max_patches: int = 256
    max_tokens: int = 300
    # label-conditional (benchmark GAN / CVAE) vocab sizes; 128-d each
    # (reference: benchmark_generative_model.py:27-35,119-120)
    label_embed_dim: int = 128
    n_disease_types: int = 0
    n_primary_sites: int = 0
    # FiLM beta clamp (reference: conditional_gan_film.py:132-133 clamps ±5)
    film_beta_clamp: float = 5.0
    # use the Pallas fused masked-attention kernel on TPU
    use_pallas: bool = True
    # bf16 MXU operands (f32 accumulate) inside the flash kernels — the
    # standard production flash precision (softmax stats stay f32). Opt-in:
    # WGAN critics are variance-sensitive; measured effect in BASELINE.md
    flash_mxu_bf16: bool = False
    # remat each patch-transformer layer (activation memory ∝ one layer):
    # enable for whole-slide patch counts (>=16k) on a single chip
    remat_layers: bool = False
    # flash-kernel layout: "ble" feeds the raw [B, L, E] projection outputs
    # to an E-layout kernel that splits heads INSIDE by static lane slices,
    # so XLA never materializes the [B,L,H,D]->[B,H,L,D] transpose around
    # each custom call (~0.6 ms/step of pure layout copies at canonical
    # shapes — BASELINE.md "copy tax"). Applies to single-block shapes
    # (canonical 257/300 tokens); long sequences take the classic blocked
    # kernels where the transpose is amortized. "bhld" = classic layout.
    flash_layout: str = "ble"

    # shard the patch self-attention sequence over the mesh's `model` axis
    # via ring attention (whole-slide patch counts; beyond the reference)
    sequence_parallel: bool = False


@dataclass(frozen=True)
class ModelConfig:
    n_genes: int = 18868
    latent_dim: int = 256
    gen_dims: Tuple[int, ...] = (256, 256)
    disc_dims: Tuple[int, ...] = (256, 256)
    negative_slope: float = 0.0
    use_batchnorm: bool = False
    fusion: FusionConfig = field(default_factory=FusionConfig)
    # numerics: params always f32; trunk/fusion matmuls may run bf16
    # (critic head / GP / flash softmax stay f32 either way). "bfloat16"
    # is the validated production preset: +12% steps/s, and the canonical
    # 18,868-gene EMA dynamics run clears every quality gate with metrics
    # indistinguishable from f32 (BASELINE.md "bf16 quality gate"). The
    # default stays f32 for reference-parity numerics.
    compute_dtype: str = "float32"
    # VAE family
    vae_latent_dim: int = 64
    vae_encoder_dims: Tuple[int, ...] = (256, 256)
    vae_decoder_dims: Tuple[int, ...] = (256, 256)
    vae_recon: str = "mse"  # mse | gaussian_nll


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8
    epochs: int = 500
    n_critic: int = 5
    gp_weight: float = 10.0
    optimizer: str = "rmsprop"  # rmsprop | adam | adamw
    lr_gen: float = 5e-4
    lr_disc: float = 5e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.99
    weight_decay: float = 0.01  # adamw only
    lr_halve_every_epochs: int = 50  # reference halves LR every 50 epochs in-loop
    seed: int = 42
    # instance-noise augmentation (reference :369-375; off by default)
    p_aug: float = 0.0
    norm_scale: float = 0.5
    # grad-norm clipping (film+xattn variant only in reference :414,457)
    clip_grad_disc: Optional[float] = None
    clip_grad_gen: Optional[float] = None
    # ε-drift penalty on critic score scale (beyond reference, off by
    # default; see train/losses.py drift_penalty) — set ~1e-3 for
    # long-horizon training runs
    drift_epsilon: float = 0.0
    # Condition-embedding reuse inside the fused step (beyond reference).
    # "per_call": reference parity — every G/D forward embeds the
    #   conditioning afresh (independent dropout draws per call).
    # "per_update": the conditioning is constant across the step and the
    #   generator params are constant across the n_critic critic updates,
    #   so embed once per critic/generator update (critic) and once per
    #   step (generator fake path) and reuse the vector — collapses ~22
    #   fusion evaluations per step to ~8. EXACT (bitwise) when
    #   fusion.dropout == 0; with dropout > 0 it shares one dropout draw
    #   across the scores inside an update (tests/test_engine.py).
    cond_embed_reuse: str = "per_call"  # per_call | per_update
    # Batch the per-sample, dropout-free trunk evaluations of the fused step
    # to cut HBM weight re-reads (the gene-dim matmuls are HBM-bound at
    # batch 8 — BASELINE.md "thin gene-dim matmuls"):
    #   (a) each critic update's real/fake/interp scores become ONE [3B]
    #       score call (losses.batched_scores_and_gp) — one read of the
    #       [n_genes, hidden] critic weights instead of three;
    #   (b) all n_critic fake batches come from ONE [n_critic*B] generator
    #       forward hoisted above the critic loop (same per-update z draws,
    #       grad_accum == 1 only) — one read of the [hidden, n_genes]
    #       generator output weights instead of n_critic.
    # Same math either way. Only active with cond_embed_reuse="per_update";
    # the per_call reference path keeps separate evaluations (independent
    # per-call dropout draws cannot batch).
    batched_scores: bool = True
    # Sub-knob of (b): measured A/B on-chip showed the hoisted generator
    # forward does NOT pay for itself at canonical shapes (the [n_critic, B,
    # n_genes] fake stack becomes lax.scan xs whose per-iteration slice
    # DMAs cost more than the saved weight re-reads), so it defaults OFF.
    # Re-measured at batch 64 (scripts/probe_hoist_wide.py, 2026-08-20):
    # exactly neutral there too (23.88 vs 23.91 steps/s) — at wide batch the
    # weight re-read is amortized over more rows, so there is nothing left
    # to save. Kept only as an A/B knob; no config is known where it wins.
    hoist_fakes: bool = False
    # Gradient accumulation (beyond reference): split each update's batch
    # into `grad_accum` microbatches, scan them accumulating gradients, and
    # apply ONE optimizer update on the mean — activation/GP memory scales
    # with B/grad_accum instead of B, so effective batches can exceed what
    # one chip's HBM fits (e.g. large batches at whole-slide patch counts).
    # Per-sample randomness (z, GP α, instance noise) is drawn once at full
    # batch size and sliced, and microbatches are STRIDED (sample i -> micro
    # i % M) so each microbatch stays balanced across a data-sharded mesh;
    # the accumulated step therefore equals the full-batch step exactly at
    # fusion.dropout == 0 (tests/test_grad_accum.py), up to fp reduction
    # order. Batch size must divide evenly.
    grad_accum: int = 1
    # Roll the n_critic critic updates into a `lax.scan` instead of Python
    # unrolling (beyond reference; numerics identical — same ops, same key
    # order, the loop body is traced once instead of n_critic times). The
    # fused step's traced program shrinks ~(n_critic-1)/n_critic on the
    # critic side, cutting XLA compile time — the dominant workflow cost on
    # a remote-compile backend (3-25 min per program, CLAUDE.md). Off by
    # default: the unrolled body lets XLA overlap/schedule across critic
    # iterations, which can be marginally faster at steady state.
    critic_scan: bool = False
    # EMA of generator params for sampling (beyond reference, off by
    # default). Standard GAN practice (e.g. Karras et al.): sampling from
    # the averaged generator reduces step-to-step oscillation. When > 0,
    # the fused step tracks g_ema and `generate_samples(..., use_ema=True)`
    # (the engine default when available) decodes with it.
    ema_decay: float = 0.0
    freq_compute_test: int = 50
    freq_print: int = 10
    n_runs_test: int = 2
    checkpoint_every_eval: bool = False
    # VAE
    vae_beta: float = 1.0
    vae_lr: float = 5e-5
    vae_warmup_epochs: int = 10
    vae_lr_decay: float = 0.999
    vae_clip_grad: float = 10.0


@dataclass(frozen=True)
class DataConfig:
    data_dir: str = ""
    batch_schema: str = "genes"  # genes|multi_patch|multi_token|labels
    num_patches: int = 256
    max_tokens: int = 300
    normalization: str = "standardize"  # standardize | minmax | none
    zero_gene_threshold: float = 0.9  # drop genes with >90% zeros
    val_fraction: float = 0.2   # of train split
    test_fraction: float = 0.2  # of all data
    seed: int = 42
    drop_remainder: bool = True
    cache_on_device: bool = True
    # shard the training bank's case axis over the mesh `data` axis
    # (ShardedDeviceCache): per-chip HBM residency becomes bank/S and the
    # epoch scan gathers shard-locally. Requires a mesh; per-shard sampling
    # contract documented on the cache (data/device_cache.py)
    shard_bank: bool = False
    # store the HBM bank's embedding arrays (patches/tokens/text_emb) at
    # this dtype ("bfloat16" halves their residency — at canonical shapes
    # they are ~8.8 GB of the ~10 GB bank); gathered batches are upcast so
    # training numerics stay the compute dtype. None = store as loaded.
    embedding_store_dtype: Optional[str] = None


@dataclass(frozen=True)
class EvalConfig:
    nearest_k: int = 10
    pca_components: int = 100
    detection_classifiers: Tuple[str, ...] = ("LR", "MLP", "RF")
    balanced_max_oversample: int = 5
    n_runs: int = 2
    # extra per-run kNN precision/recall at these neighborhood sizes during
    # the test block (reference: vanilla_gan_unconditional.py:517-524 calls
    # get_precision_recall at k=10/20/50; other variants skip it). All sizes
    # are computed from ONE manifold build instead of one per k.
    pr_nhood_sizes: Tuple[int, ...] = ()
    # scan-path generation during eval blocks: whole loader in one device
    # program, condition embedding shared across repeats (train/wgan.py
    # generate_samples_all(scan=True)). One extra XLA compile per eval-set
    # shape; off by default because remote-compile latency on tunneled
    # backends (minutes) can exceed the sampling time it saves.
    scan_sampling: bool = False
    # in-loop validation on device: periodic validation generates with
    # device_out=True and evaluates a kNN detection proxy + PRDC from
    # device-resident arrays — only scalars/predictions leave the chip
    # (vs fetching the full train+val profile matrices every eval epoch,
    # ~GBs at TCGA scale). The final test block always runs the full host
    # classifier suite regardless.
    on_device_validation: bool = False
    # cap the TRAIN-side regeneration during periodic validation to this
    # many cases (None = the reference behavior: regenerate the whole train
    # split, conditional_gan_concat.py:664-689). At canonical width with
    # HBM-resident banks the full-train regen can exceed device memory
    # (4,096 cases x 18,868 genes of real+fake device arrays + kNN/PRDC
    # distance matrices on top of ~10 GB of embedding banks); validation
    # statistics saturate long before the full split. The final test block
    # is never capped.
    validation_max_cases: Optional[int] = None


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. data = batch sharding; model = tensor sharding of
    the wide gene-dimension matmuls; replicated when axes are size 1."""

    data_axis: int = -1  # -1: all devices on data axis
    model_axis: int = 1


@dataclass(frozen=True)
class ExperimentConfig:
    variant: str = "vanilla"
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    run_name: str = "run"
    output_dir: str = "outputs"


def _fusion_for(variant: str, **kw) -> FusionConfig:
    kinds = {
        "vanilla": "none",
        "concat_text": "concat",
        "concat_image": "concat",
        "attention": "attention",
        "img_transformer": "img_transformer",
        "film": "film",
        "cross_attention": "xattn",
        "film_cross_attention": "film_xattn",
        "benchmark": "labels",
        "vae": "none",
        "cvae": "labels",
    }
    cond_type = "image" if variant == "concat_image" else "text"
    return FusionConfig(kind=kinds[variant], condition_type=cond_type, **kw)


def _schema_for(variant: str) -> str:
    if variant in ("vanilla", "vae"):
        return "genes"
    if variant in ("benchmark", "cvae"):
        return "labels"
    if variant in ("cross_attention", "film_cross_attention"):
        return "multi_token"
    return "multi_patch"


def variant_config(variant: str, n_genes: int = 18868, **overrides) -> ExperimentConfig:
    """Build the canonical preset for a reference variant (SURVEY.md §2.3 table)."""
    fusion_kw = overrides.pop("fusion_kw", {})
    fusion = _fusion_for(variant, **fusion_kw)
    model = ModelConfig(n_genes=n_genes, fusion=fusion)
    train = TrainConfig()
    if variant == "film_cross_attention":
        # reference adds grad-norm clipping D<=10 / G<=2 and per-eval checkpoints
        # (conditional_gan_cross_attention_with_film.py:414,457,710-711)
        train = dataclasses.replace(
            train, clip_grad_disc=10.0, clip_grad_gen=2.0, checkpoint_every_eval=True
        )
    if variant in ("benchmark", "cvae"):
        train = dataclasses.replace(train, freq_compute_test=100)
    if variant == "vae":
        # reference vanilla-VAE main trains 1000 epochs (vae/vanilla_vae.py:424-460)
        train = dataclasses.replace(train, epochs=1000)
    ev = EvalConfig()
    if variant == "vanilla":
        # 5 test runs + precision/recall@{10,20,50}
        # (vanilla_gan_unconditional.py:517-524,634)
        ev = dataclasses.replace(ev, n_runs=5, pr_nhood_sizes=(10, 20, 50))
    elif variant in ("benchmark", "cvae"):
        ev = dataclasses.replace(ev, n_runs=10)
    data = DataConfig(batch_schema=_schema_for(variant))
    cfg = ExperimentConfig(variant=variant, model=model, train=train, data=data, eval=ev)
    for k, v in overrides.items():
        cfg = dataclasses.replace(cfg, **{k: v})
    return cfg


def replace(cfg, **kw):
    """Convenience dataclasses.replace passthrough."""
    return dataclasses.replace(cfg, **kw)


# ------------------------------------------------------------- serialization
# The reference has no config persistence at all: reproducing or sampling a
# run means re-typing its argparse flags (SURVEY.md §5 "Config / flag
# system"). Here the resolved config tree round-trips through JSON so a
# checkpoint directory is self-describing (cli/train.py writes config.json;
# cli/sample.py restores model shapes from it).

_NESTED = {
    "ExperimentConfig": {"model": "ModelConfig", "train": "TrainConfig",
                         "data": "DataConfig", "eval": "EvalConfig",
                         "mesh": "MeshConfig"},
    "ModelConfig": {"fusion": "FusionConfig"},
}
_CLASSES = {}


def _register():
    for cls in (ExperimentConfig, ModelConfig, TrainConfig, DataConfig,
                EvalConfig, MeshConfig, FusionConfig):
        _CLASSES[cls.__name__] = cls


_register()


def config_to_dict(cfg: ExperimentConfig) -> dict:
    return dataclasses.asdict(cfg)


def _build(cls_name: str, d: dict):
    cls = _CLASSES[cls_name]
    nested = _NESTED.get(cls_name, {})
    kw = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue  # forward compat: absent fields keep their defaults
        v = d[f.name]
        if f.name in nested:
            v = _build(nested[f.name], v)
        elif isinstance(v, list):
            v = tuple(v)
        kw[f.name] = v
    return cls(**kw)


def config_from_dict(d: dict) -> ExperimentConfig:
    return _build("ExperimentConfig", d)


def save_config(cfg: ExperimentConfig, path: str) -> None:
    import json

    with open(path, "w") as f:
        json.dump(config_to_dict(cfg), f, indent=2)


def load_config(path: str) -> ExperimentConfig:
    import json

    with open(path) as f:
        return config_from_dict(json.load(f))
