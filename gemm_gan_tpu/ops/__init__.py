from gemm_gan_tpu.ops.mlp import MLPTrunk, LinearBlock  # noqa: F401
from gemm_gan_tpu.ops.attention import MaskedMultiHeadAttention, TransformerEncoder  # noqa: F401
from gemm_gan_tpu.ops.film import FiLM  # noqa: F401
