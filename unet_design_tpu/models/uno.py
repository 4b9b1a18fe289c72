"""UNO — U-shaped Neural Operator, TPU-native.

Re-design of ``pdearena/pdearena/modules/twod_uno.py:117-297``: operator
blocks pairing a grid-resizing spectral conv ('forward'-normalized FFT) with a
pointwise 1x1 conv + bicubic resize, instance norm, GELU; U-shaped skip
concatenations with hard-coded per-block output grids and modes.

Note: the reference resizes the pointwise path with
``F.interpolate(..., mode='bicubic', align_corners=True, antialias=True)``;
we use ``jax.image.resize(method='cubic')`` (no align-corners/antialias knobs),
an intentional, documented approximation.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unet_design_tpu.models import common
from unet_design_tpu.ops import blocks, spectral

Dtype = Any


class InstanceNorm(nn.Module):
    """Affine instance norm over spatial dims (torch InstanceNorm2d(affine=True))."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        mean = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        var = jnp.var(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (y * scale + bias).astype(x.dtype)


class OperatorBlock2D(nn.Module):
    """Spectral + pointwise-resize pair (``twod_uno.py:148-185``)."""

    out_channels: int
    dim1: int
    dim2: int
    modes1: int
    modes2: int
    norm: bool = True
    nonlin: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, dim1: Optional[int] = None,
                 dim2: Optional[int] = None) -> jnp.ndarray:
        d1 = dim1 if dim1 is not None else self.dim1
        d2 = dim2 if dim2 is not None else self.dim2
        x1 = spectral.SpectralConv2dUno(self.out_channels, self.dim1,
                                        self.dim2, self.modes1, self.modes2,
                                        name="conv")(x, d1, d2)
        x2 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                     name="pointwise")(x)
        x2 = jax.image.resize(x2, (x2.shape[0], d1, d2, x2.shape[3]),
                              method="cubic")
        out = x1 + x2
        if self.norm:
            out = InstanceNorm(name="inorm")(out)
        if self.nonlin:
            out = nn.gelu(out, approximate=False)
        return out


class UNO(nn.Module):
    """``UNO`` (``twod_uno.py:188-297``)."""

    n_output_fields: int
    time_future: int = 1
    hidden_channels: int = 64
    pad: int = 0
    factor: float = 3 / 4
    activation: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = blocks.get_activation(self.activation)
        w = self.hidden_channels
        f = self.factor
        x4 = common.collapse_time(x).astype(self.dtype)

        h = act(nn.Dense(w // 2, dtype=self.dtype, name="fc")(x4))
        h = act(nn.Dense(w, dtype=self.dtype, name="fc0")(h))
        if self.pad:
            h = jnp.pad(h, ((0, 0), (self.pad, self.pad),
                            (self.pad, self.pad), (0, 0)))
        D1, D2 = h.shape[1], h.shape[2]

        L0 = OperatorBlock2D(int(2 * f * w), 48, 48, 18, 18, dtype=self.dtype,
                             name="L0")
        L1 = OperatorBlock2D(int(4 * f * w), 32, 32, 14, 14, dtype=self.dtype,
                             name="L1")
        L2 = OperatorBlock2D(int(8 * f * w), 16, 16, 6, 6, dtype=self.dtype,
                             name="L2")
        L3 = OperatorBlock2D(int(8 * f * w), 16, 16, 6, 6, dtype=self.dtype,
                             name="L3")
        L4 = OperatorBlock2D(int(4 * f * w), 32, 32, 6, 6, dtype=self.dtype,
                             name="L4")
        L5 = OperatorBlock2D(int(2 * f * w), 48, 48, 14, 14, dtype=self.dtype,
                             name="L5")
        L6 = OperatorBlock2D(w, 64, 64, 18, 18, dtype=self.dtype, name="L6")

        c0 = L0(h, int(D1 * f), int(D2 * f))
        c1 = L1(c0, D1 // 2, D2 // 2)
        c2 = L2(c1, D1 // 4, D2 // 4)
        c3 = L3(c2, D1 // 4, D2 // 4)
        c4 = L4(c3, D1 // 2, D2 // 2)
        c4 = jnp.concatenate([c4, c1], axis=-1)
        c5 = L5(c4, int(D1 * f), int(D2 * f))
        c5 = jnp.concatenate([c5, c0], axis=-1)
        c6 = L6(c5, D1, D2)
        c6 = jnp.concatenate([c6, h], axis=-1)

        if self.pad:
            c6 = c6[:, :-self.pad, :-self.pad, :]
        out = act(nn.Dense(4 * w, dtype=self.dtype, name="fc1")(c6))
        out = nn.Dense(self.time_future * self.n_output_fields,
                       dtype=self.dtype, name="fc2")(out)
        return common.expand_time(out, self.n_output_fields)
