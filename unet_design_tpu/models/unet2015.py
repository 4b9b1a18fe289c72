"""Unet2015 — the PDEBench-style original U-Net, TPU-native.

Re-design of ``pdearena/pdearena/modules/twod_unet2015.py:23-143``: four
MaxPool encoder levels, bottleneck, four transposed-conv decoder levels, each
level a conv-BatchNorm-act x2 block (bias-free convs).

BatchNorm state lives in the flax ``batch_stats`` collection; pass
``train=True`` (with ``mutable=['batch_stats']``) during training.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from unet_design_tpu.models import common
from unet_design_tpu.ops import blocks

Dtype = Any


class _BNBlock(nn.Module):
    features: int
    activation: str = "tanh"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = blocks.get_activation(self.activation)
        h = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         name="norm1")(h)
        h = act(h)
        h = nn.Conv(self.features, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         name="norm2")(h)
        return act(h)


class Unet2015(nn.Module):
    n_output_fields: int
    time_future: int = 1
    hidden_channels: int = 64
    activation: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        f = self.hidden_channels
        x4 = common.collapse_time(x).astype(self.dtype)

        enc = []
        h = x4
        for i, mult in enumerate((1, 2, 4, 8)):
            if i > 0:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = _BNBlock(f * mult, self.activation, self.dtype,
                         name=f"encoder{i+1}")(h, train)
            enc.append(h)

        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = _BNBlock(f * 16, self.activation, self.dtype,
                     name="bottleneck")(h, train)

        for i, mult in enumerate((8, 4, 2, 1)):
            h = blocks.ConvTransposeUpsample(f * mult, kernel=2,
                                             dtype=self.dtype,
                                             name=f"upconv{4-i}")(h)
            h = jnp.concatenate([h, enc.pop()], axis=-1)
            h = _BNBlock(f * mult, self.activation, self.dtype,
                         name=f"decoder{4-i}")(h, train)

        out = nn.Conv(self.time_future * self.n_output_fields, (1, 1),
                      dtype=self.dtype, name="conv")(h)
        return common.expand_time(out, self.n_output_fields)
