from gemm_gan_tpu.train.losses import d_loss, g_loss, gradient_penalty, wasserstein_loss  # noqa: F401
from gemm_gan_tpu.train.state import GANTrainState  # noqa: F401
from gemm_gan_tpu.train.wgan import WGANGPEngine  # noqa: F401
