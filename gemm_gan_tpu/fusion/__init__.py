from gemm_gan_tpu.fusion.modules import (  # noqa: F401
    ConcatFusion,
    CrossAttentionFusion,
    FiLMCrossAttentionFusion,
    FiLMFusion,
    ImageTransformerFusion,
    LabelEmbedFusion,
    PooledAttentionFusion,
    build_fusion,
)
