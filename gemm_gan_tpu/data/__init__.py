from gemm_gan_tpu.data.splits import minmax, split_indices, standardize  # noqa: F401
from gemm_gan_tpu.data.loader import Batches  # noqa: F401
from gemm_gan_tpu.data.synthetic import synthetic_dataset  # noqa: F401
