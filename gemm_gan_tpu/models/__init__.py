from gemm_gan_tpu.models.gan import Critic, Generator  # noqa: F401
from gemm_gan_tpu.models.vae import CVAE, VAE  # noqa: F401
