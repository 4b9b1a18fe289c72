"""Conditioned ResNet/FNO trunk (``conditioned/twod_resnet.py``).

The FNO configuration with conditioned spectral convs: every block receives
the fourier time(+parameter) embedding.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from unet_design_tpu.models import common
from unet_design_tpu.ops import blocks, embeddings, spectral

Dtype = Any


class CondFourierBasicBlock(nn.Module):
    """Conditioned FNO block (``conditioned/twod_resnet.py`` FourierBasicBlock)."""

    planes: int
    modes1: int = 16
    modes2: int = 16
    activation: str = "gelu"
    norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        assert not self.norm
        act = blocks.get_activation(self.activation)
        x1 = spectral.CondSpectralConv2d(self.planes, self.modes1,
                                         self.modes2,
                                         name="fourier1")(x, emb)
        x2 = nn.Conv(self.planes, (1, 1), dtype=self.dtype,
                     name="conv1")(x)
        # additive embedding into the first sum (conditioned/twod_resnet.py:
        # 43,48-53: cond_emb Linear -> broadcast add before the activation)
        emb_out = nn.Dense(self.planes, dtype=self.dtype,
                           name="cond_emb")(emb.astype(self.dtype))
        out = act(x1 + x2 + emb_out[:, None, None, :])
        x1 = spectral.CondSpectralConv2d(self.planes, self.modes1,
                                         self.modes2,
                                         name="fourier2")(out, emb)
        x2 = nn.Conv(self.planes, (1, 1), dtype=self.dtype,
                     name="conv2")(out)
        return act(x1 + x2)


class CondPDEResNet(nn.Module):
    """Conditioned ResNet trunk; ``__call__(x, time, z)``."""

    n_output_fields: int
    num_blocks: Sequence[int] = (1, 1, 1, 1)
    time_future: int = 1
    hidden_channels: int = 64
    activation: str = "gelu"
    norm: bool = False
    modes1: int = 16
    modes2: int = 16
    padding: int = 9
    param_conditioning: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, time: jnp.ndarray,
                 z: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        act = blocks.get_activation(self.activation)
        nc = self.hidden_channels
        tdim = nc * 4
        x4 = common.collapse_time(x).astype(self.dtype)

        def embed_mlp(v, name):
            e = embeddings.fourier_embedding(v, nc).astype(self.dtype)
            e = nn.Dense(tdim, dtype=self.dtype, name=f"{name}_1")(e)
            return nn.Dense(tdim, dtype=self.dtype, name=f"{name}_2")(act(e))

        emb = embed_mlp(time, "time_embed")
        if z is not None:
            if self.param_conditioning != "scalar":
                raise NotImplementedError(self.param_conditioning)
            emb = emb + embed_mlp(z, "pde_emb")

        h = act(nn.Conv(nc, (1, 1), dtype=self.dtype, name="conv_in1")(x4))
        h = act(nn.Conv(nc, (1, 1), dtype=self.dtype, name="conv_in2")(h))
        if self.padding > 0:
            h = jnp.pad(h, ((0, 0), (0, self.padding), (0, self.padding),
                            (0, 0)))
        bidx = 0
        for n in self.num_blocks:
            for _ in range(n):
                h = CondFourierBasicBlock(nc, self.modes1, self.modes2,
                                          self.activation, self.norm,
                                          self.dtype,
                                          name=f"block_{bidx}")(h, emb)
                bidx += 1
        if self.padding > 0:
            h = h[:, :-self.padding, :-self.padding, :]
        h = act(nn.Conv(nc, (1, 1), dtype=self.dtype, name="conv_out1")(h))
        out = nn.Conv(self.time_future * self.n_output_fields, (1, 1),
                      dtype=self.dtype, name="conv_out2")(h)
        return common.expand_time(out, self.n_output_fields)
