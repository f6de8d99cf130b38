"""gemm_gan_tpu — TPU-native multimodal generative framework.

A ground-up JAX/Flax/Pallas/pjit rebuild of the capabilities of GeMM-GAN
(francescapia/-GeMM-GAN): WGAN-GP generation of TCGA RNA-seq gene-expression
profiles conditioned on histopathology patch embeddings (UNI ViT) and clinical
text embeddings (Clinical ModernBERT), fused via FiLM / cross-attention, plus
VAE/CVAE and label-conditional baselines, and a full statistical evaluation
suite (gamma correlation, PRDC, k-NN precision/recall, detection, utility,
privacy, Wasserstein/MMD).

Unlike the reference's eight copy-pasted single-GPU PyTorch scripts, this
framework has ONE fused WGAN-GP engine (gradient-penalty double-backward
compiled end-to-end by XLA), a config-selected conditioning-variant zoo,
a device-resident embedding cache, and `jax.sharding.Mesh`-based data/tensor
parallelism.
"""

__version__ = "0.1.0"

from gemm_gan_tpu.config import (  # noqa: F401
    DataConfig,
    EvalConfig,
    ExperimentConfig,
    FusionConfig,
    ModelConfig,
    TrainConfig,
    VariantName,
    variant_config,
)
