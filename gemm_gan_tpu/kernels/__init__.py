from gemm_gan_tpu.kernels.flash_attention import masked_mha, mha_reference  # noqa: F401
from gemm_gan_tpu.kernels.ring_attention import ring_mha  # noqa: F401
