"""ResNet / DilatedResNet / FNO trunk family, TPU-native.

Re-design of ``pdearena/pdearena/modules/twod_resnet.py``: a pad-9 residual
trunk with pluggable blocks — ``BasicBlock:15``, ``DilatedBasicBlock:56``
(dilations 1-2-4-8-4-2-1), ``FourierBasicBlock:110`` (the FNO configuration) —
entered/exited through 1x1 convs.  I/O: (B,T,H,W,C) trajectories.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from unet_design_tpu.models import common
from unet_design_tpu.ops import blocks, spectral

Dtype = Any


class BasicBlock(nn.Module):
    """Pre-norm basic residual block (``twod_resnet.py:15-53``)."""

    planes: int
    activation: str = "relu"
    norm: bool = True
    num_groups: int = 1
    modes1: int = 16  # unused; uniform ctor signature across blocks
    modes2: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = blocks.get_activation(self.activation)
        in_planes = x.shape[-1]
        h = blocks.GroupNorm(self.num_groups)(x) if self.norm else x
        h = nn.Conv(self.planes, (3, 3), dtype=self.dtype, name="conv1")(act(h))
        h = blocks.GroupNorm(self.num_groups)(h)
        h = nn.Conv(self.planes, (3, 3), dtype=self.dtype, name="conv2")(act(h))
        if in_planes != self.planes:
            s = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                        name="shortcut_conv")(x)
            if self.norm:
                s = blocks.GroupNorm(self.num_groups)(s)
        else:
            s = x
        return h + s


class DilatedBasicBlock(nn.Module):
    """Seven dilated convs 1-2-4-8-4-2-1 with residual (``twod_resnet.py:56-107``)."""

    planes: int
    activation: str = "relu"
    norm: bool = True
    num_groups: int = 1
    modes1: int = 16
    modes2: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = blocks.get_activation(self.activation)
        out = x
        for i, dil in enumerate([1, 2, 4, 8, 4, 2, 1]):
            h = blocks.GroupNorm(self.num_groups)(out) if self.norm else out
            h = nn.Conv(self.planes, (3, 3), kernel_dilation=(dil, dil),
                        dtype=self.dtype, name=f"conv_{i}")(h)
            out = act(h)
        return out + x


class FourierBasicBlock(nn.Module):
    """FNO block: spectral + 1x1 parallel, twice (``twod_resnet.py:110-166``)."""

    planes: int
    activation: str = "gelu"
    norm: bool = False
    num_groups: int = 1
    modes1: int = 16
    modes2: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert not self.norm
        act = blocks.get_activation(self.activation)
        x1 = spectral.SpectralConv2d(self.planes, self.modes1, self.modes2,
                                     name="fourier1")(x)
        x2 = nn.Conv(self.planes, (1, 1), dtype=self.dtype, name="conv1")(x)
        out = act(x1 + x2)
        x1 = spectral.SpectralConv2d(self.planes, self.modes1, self.modes2,
                                     name="fourier2")(out)
        x2 = nn.Conv(self.planes, (1, 1), dtype=self.dtype, name="conv2")(out)
        return act(x1 + x2)


BLOCKS = {
    "basic": BasicBlock,
    "dilated": DilatedBasicBlock,
    "fourier": FourierBasicBlock,
}


class PDEResNet(nn.Module):
    """``ResNet`` trunk (``twod_resnet.py:169-309``)."""

    n_output_fields: int
    block: str = "basic"          # 'basic' | 'dilated' | 'fourier'
    num_blocks: Sequence[int] = (1, 1, 1, 1)
    time_future: int = 1
    hidden_channels: int = 64
    activation: str = "gelu"
    norm: bool = True
    modes1: int = 16
    modes2: int = 16
    padding: int = 9
    usegrid: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = blocks.get_activation(self.activation)
        block_cls = BLOCKS[self.block]
        x4 = common.collapse_time(x).astype(self.dtype)
        h = act(nn.Conv(self.hidden_channels, (1, 1), dtype=self.dtype,
                        name="conv_in1")(x4))
        h = act(nn.Conv(self.hidden_channels, (1, 1), dtype=self.dtype,
                        name="conv_in2")(h))
        if self.padding > 0:
            h = jnp.pad(h, ((0, 0), (0, self.padding), (0, self.padding),
                            (0, 0)))
        bidx = 0
        for n in self.num_blocks:
            for _ in range(n):
                h = block_cls(planes=self.hidden_channels,
                              activation=self.activation, norm=self.norm,
                              modes1=self.modes1, modes2=self.modes2,
                              dtype=self.dtype, name=f"block_{bidx}")(h)
                bidx += 1
        if self.padding > 0:
            h = h[:, :-self.padding, :-self.padding, :]
        h = act(nn.Conv(self.hidden_channels, (1, 1), dtype=self.dtype,
                        name="conv_out1")(h))
        out = nn.Conv(self.time_future * self.n_output_fields, (1, 1),
                      dtype=self.dtype, name="conv_out2")(h)
        return common.expand_time(out, self.n_output_fields)
