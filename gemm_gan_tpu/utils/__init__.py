from gemm_gan_tpu.utils.prng import key_seq, split_like  # noqa: F401
from gemm_gan_tpu.utils.metrics import MetricLogger  # noqa: F401
