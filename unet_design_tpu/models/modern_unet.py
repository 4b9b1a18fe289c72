"""Modern U-Net family: Unet / FourierUnet / AltFourierUnet, TPU-native.

Re-design of ``pdearena/pdearena/modules/twod_unet.py:389-901``: wide-residual
U-Net with optional per-level attention, optional Fourier (spectral) residual
blocks in the first ``n_fourier_layers`` resolutions with mode scaling
``max(modes // 2^i, 4)``, stride-2 conv downsampling, k4-s2 transposed-conv
upsampling, and GroupNorm(8)+act+conv final head.  I/O: (B,T,H,W,C) trajs.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from unet_design_tpu.models import common
from unet_design_tpu.ops import blocks, spectral

Dtype = Any


class FourierResidualBlock(nn.Module):
    """Pre-norm spectral+1x1 parallel residual block (``twod_unet.py:64-123``)."""

    out_channels: int
    modes1: int = 16
    modes2: int = 16
    activation: str = "gelu"
    norm: bool = False
    n_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = blocks.get_activation(self.activation)
        in_channels = x.shape[-1]
        h = blocks.GroupNorm(self.n_groups)(x) if self.norm else x
        h = act(h)
        x1 = spectral.SpectralConv2d(self.out_channels, self.modes1,
                                     self.modes2, name="fourier1")(h)
        x2 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                     name="conv1")(h)
        out = x1 + x2
        out = blocks.GroupNorm(self.n_groups)(out) if self.norm else out
        out = act(out)
        x1 = spectral.SpectralConv2d(self.out_channels, self.modes1,
                                     self.modes2, name="fourier2")(out)
        x2 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                     name="conv2")(out)
        if in_channels != self.out_channels:
            shortcut = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="shortcut")(x)
        else:
            shortcut = x
        return x1 + x2 + shortcut


def _level_modes(modes1: int, modes2: int, i: int, mode_scaling: bool
                 ) -> Tuple[int, int]:
    if mode_scaling:
        return max(modes1 // 2 ** i, 4), max(modes2 // 2 ** i, 4)
    return modes1, modes2


class ModernUnet(nn.Module):
    """``Unet`` (``twod_unet.py:389-548``); set ``n_fourier_layers > 0`` for
    ``FourierUnet`` (``:724-901``) and ``fourier_up=True`` for
    ``AltFourierUnet`` (``:551-721``)."""

    n_output_fields: int
    time_future: int = 1
    hidden_channels: int = 64
    activation: str = "gelu"
    norm: bool = False
    ch_mults: Sequence[int] = (1, 2, 2, 4)
    is_attn: Sequence[bool] = (False, False, False, False)
    mid_attn: bool = False
    n_blocks: int = 2
    use1x1: bool = False
    n_fourier_layers: int = 0
    fourier_up: bool = False
    modes1: int = 12
    modes2: int = 12
    mode_scaling: bool = True
    # 'keys' = standard attention (default); 'queries' = the reference's
    # softmax(dim=1) over queries (twod_unet.py:170) for exact parity
    attn_softmax_axis: str = "keys"
    # per-level sharding-constraint hook (parallel/mesh.make_spatial_guard):
    # lifts the grid-partitioning resolution floor by explicitly replicating
    # levels that degenerate below the safe rows-per-'spatial'-shard extent
    spatial_guard: Optional[Any] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        guard = self.spatial_guard or (lambda v: v)
        act = blocks.get_activation(self.activation)
        n_res = len(self.ch_mults)
        nc = self.hidden_channels
        x4 = common.collapse_time(x).astype(self.dtype)

        kernel = (1, 1) if self.use1x1 else (3, 3)
        h = nn.Conv(nc, kernel, dtype=self.dtype, name="image_proj")(x4)

        hs = [h]
        in_ch = nc
        bidx = 0
        for i in range(n_res):
            out_ch = in_ch * self.ch_mults[i]
            for _ in range(self.n_blocks):
                if i < self.n_fourier_layers:
                    m1, m2 = _level_modes(self.modes1, self.modes2, i,
                                          self.mode_scaling)
                    h = FourierResidualBlock(out_ch, m1, m2, self.activation,
                                             self.norm, dtype=self.dtype,
                                             name=f"down_{bidx}")(h)
                else:
                    h = blocks.ResidualBlock(out_ch, self.activation,
                                             self.norm, dtype=self.dtype,
                                             name=f"down_{bidx}")(h)
                if self.is_attn[i]:
                    h = blocks.AttentionBlock(softmax_axis=self.attn_softmax_axis,
                                              dtype=self.dtype,
                                              name=f"down_{bidx}_attn")(h)
                in_ch = out_ch
                bidx += 1
                hs.append(h)
            if i < n_res - 1:
                # (1,1) padding matches torch Conv2d(3, stride=2, padding=1)
                # alignment ('SAME' would pad (0,1) on even inputs)
                h = guard(nn.Conv(in_ch, (3, 3), strides=(2, 2),
                                  padding=((1, 1), (1, 1)), dtype=self.dtype,
                                  name=f"downsample_{i}")(h))
                hs.append(h)

        # middle
        h = blocks.ResidualBlock(in_ch, self.activation, self.norm,
                                 dtype=self.dtype, name="middle_res1")(h)
        if self.mid_attn:
            h = blocks.AttentionBlock(softmax_axis=self.attn_softmax_axis,
                                              dtype=self.dtype, name="middle_attn")(h)
        h = blocks.ResidualBlock(in_ch, self.activation, self.norm,
                                 dtype=self.dtype, name="middle_res2")(h)

        bidx = 0
        for i in reversed(range(n_res)):
            out_ch = in_ch
            for _ in range(self.n_blocks):
                s = hs.pop()
                h = jnp.concatenate([h, s], axis=-1)
                if self.fourier_up and i < self.n_fourier_layers:
                    m1, m2 = _level_modes(self.modes1, self.modes2, i,
                                          self.mode_scaling)
                    h = FourierResidualBlock(out_ch, m1, m2, self.activation,
                                             self.norm, dtype=self.dtype,
                                             name=f"up_{bidx}")(h)
                else:
                    h = blocks.ResidualBlock(out_ch, self.activation,
                                             self.norm, dtype=self.dtype,
                                             name=f"up_{bidx}")(h)
                if self.is_attn[i]:
                    h = blocks.AttentionBlock(softmax_axis=self.attn_softmax_axis,
                                              dtype=self.dtype,
                                              name=f"up_{bidx}_attn")(h)
                bidx += 1
            out_ch = in_ch // self.ch_mults[i]
            s = hs.pop()
            h = jnp.concatenate([h, s], axis=-1)
            h = blocks.ResidualBlock(out_ch, self.activation, self.norm,
                                     dtype=self.dtype, name=f"up_{bidx}")(h)
            if self.is_attn[i]:
                h = blocks.AttentionBlock(softmax_axis=self.attn_softmax_axis,
                                              dtype=self.dtype,
                                          name=f"up_{bidx}_attn")(h)
            bidx += 1
            in_ch = out_ch
            if i > 0:
                h = guard(blocks.ConvTransposeUpsample(
                    in_ch, kernel=4, dtype=self.dtype,
                    name=f"upsample_{i}")(h))
        assert not hs

        if self.norm:
            h = blocks.GroupNorm(8)(h)
        h = act(h)
        out = nn.Conv(self.time_future * self.n_output_fields, kernel,
                      dtype=self.dtype, name="final")(h)
        return common.expand_time(out, self.n_output_fields)
