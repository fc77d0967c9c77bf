"""Shared Flax building blocks.

All modules are NHWC (channel-last) — the TPU-native layout. Initializers
mirror torch.nn.Conv2d defaults (kaiming-uniform with a=sqrt(5), i.e.
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias) so training
dynamics match the reference recipes.
"""

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """flax kernel shape: (kh, kw, in_c, out_c); fan_in = kh*kw*in_c."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """Conv2d with torch-default init; 'same' zero padding like the
    reference's padding=k//2 convs.

    ``dtype`` is the flax compute dtype: params stay float32 and are cast
    (with the input) to ``dtype`` for the conv itself — the standard TPU
    mixed-precision recipe. None (default) keeps bit-strict float32."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    use_bias: bool = True
    dilation: int = 1
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        fan_in = self.kernel_size * self.kernel_size * x.shape[-1]
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME" if self.strides == 1 else [
                (self.dilation * (self.kernel_size // 2),) * 2,
                (self.dilation * (self.kernel_size // 2),) * 2,
            ],
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_conv_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


class ResB(nn.Module):
    """Residual block: conv3 -> LeakyReLU -> conv3 -> + identity
    (reference pasmnet/backbone.py:4-15; torch LeakyReLU slope 0.01)."""

    channels: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        y = Conv(self.channels, dtype=self.dtype)(x)
        y = nn.leaky_relu(y, negative_slope=0.01)
        y = Conv(self.channels, dtype=self.dtype)(y)
        return x + y


