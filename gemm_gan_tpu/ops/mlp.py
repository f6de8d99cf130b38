"""MLP building blocks for generator/critic trunks.

Capability parity with the reference's `build_linear_block` /
`build_generator` / `build_discriminator` factories
(/root/reference/src/conditional_gan_concat.py:54-95): Linear -> [BatchNorm]
-> LeakyReLU stacks with a final un-activated Linear head. Expressed as one
Flax module; hidden matmuls may run in a lower compute dtype (bf16 on TPU)
while parameters stay f32.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class LinearBlock(nn.Module):
    features: int
    negative_slope: float = 0.0
    use_batchnorm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        if self.use_batchnorm:
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.leaky_relu(x, negative_slope=self.negative_slope)


class MLPTrunk(nn.Module):
    """Hidden LeakyReLU blocks followed by a linear output head.

    `hidden_dims` mirrors the reference's generator_dims[:-1]/disc dims;
    `out_dim` is the final Linear (no activation — the reference defines a
    ReLU `final_activation` but never applies it, see
    /root/reference/src/conditional_gan_concat.py:124,146-149).
    """

    hidden_dims: Sequence[int]
    out_dim: int
    negative_slope: float = 0.0
    use_batchnorm: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for h in self.hidden_dims:
            x = LinearBlock(
                h,
                negative_slope=self.negative_slope,
                use_batchnorm=self.use_batchnorm,
                dtype=self.dtype,
            )(x, train=train)
        # output head in f32: the critic score / gene vector feeds the WGAN
        # loss and gradient penalty, which are variance-sensitive.
        return nn.Dense(self.out_dim, dtype=jnp.float32)(x)
