"""Conditioned modern U-Net family (time / PDE-parameter conditioning).

Re-design of ``pdearena/pdearena/modules/conditioned/twod_unet.py``: every
residual block receives a Fourier embedding of the timestep (plus optionally a
scalar PDE parameter, ``param_conditioning='scalar'``) injected additively or
via scale-shift/adaGN (``use_scale_shift_norm``); conditioned spectral convs
apply a per-mode complex scaling (``fourier_cond.py``).  Zero-init final and
second convs mirror ``zero_module`` usage.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from unet_design_tpu.models import common
from unet_design_tpu.models.modern_unet import _level_modes
from unet_design_tpu.ops import blocks, embeddings, spectral

Dtype = Any


class CondResidualBlock(nn.Module):
    """``conditioned/twod_unet.py:17-86``."""

    out_channels: int
    activation: str = "gelu"
    norm: bool = False
    n_groups: int = 1
    use_scale_shift_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        act = blocks.get_activation(self.activation)
        in_channels = x.shape[-1]
        h = blocks.GroupNorm(self.n_groups)(x) if self.norm else x
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    name="conv1")(act(h))
        emb_dim = (2 * self.out_channels if self.use_scale_shift_norm
                   else self.out_channels)
        emb_out = nn.Dense(emb_dim, dtype=self.dtype, name="cond_emb")(emb)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h2 = blocks.GroupNorm(self.n_groups)(h) if self.norm else h
            h2 = h2 * (1 + scale[:, None, None, :]) + shift[:, None, None, :]
            h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                        kernel_init=blocks.zeros_init,
                        name="conv2")(act(h2))
        else:
            h = h + emb_out[:, None, None, :]
            h2 = blocks.GroupNorm(self.n_groups)(h) if self.norm else h
            h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                        kernel_init=blocks.zeros_init,
                        name="conv2")(act(h2))
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return h + x


class CondFourierResidualBlock(nn.Module):
    """``conditioned/twod_unet.py:87-178``."""

    out_channels: int
    modes1: int = 16
    modes2: int = 16
    activation: str = "gelu"
    norm: bool = False
    n_groups: int = 1
    use_scale_shift_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        act = blocks.get_activation(self.activation)
        in_channels = x.shape[-1]
        h = blocks.GroupNorm(self.n_groups)(x) if self.norm else x
        h = act(h)
        x1 = spectral.CondSpectralConv2d(self.out_channels, self.modes1,
                                         self.modes2, name="fourier1")(h, emb)
        x2 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                     name="conv1")(h)
        out = x1 + x2
        emb_dim = (2 * self.out_channels if self.use_scale_shift_norm
                   else self.out_channels)
        emb_out = nn.Dense(emb_dim, dtype=self.dtype, name="cond_emb")(emb)
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h2 = blocks.GroupNorm(self.n_groups)(out) if self.norm else out
            h2 = h2 * (1 + scale[:, None, None, :]) + shift[:, None, None, :]
            h2 = act(h2)
            x1 = spectral.CondSpectralConv2d(self.out_channels, self.modes1,
                                             self.modes2,
                                             name="fourier2")(h2, emb)
            x2 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                         name="conv2")(h2)
        else:
            out = out + emb_out[:, None, None, :]
            out = blocks.GroupNorm(self.n_groups)(out) if self.norm else out
            out = act(out)
            x1 = spectral.CondSpectralConv2d(self.out_channels, self.modes1,
                                             self.modes2,
                                             name="fourier2")(out, emb)
            x2 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                         name="conv2")(out)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="shortcut")(x)
        return x1 + x2 + x


class CondModernUnet(nn.Module):
    """Conditioned ``Unet``/``FourierUnet`` (``conditioned/twod_unet.py``).

    ``__call__(x, time, z)``: x (B,T,H,W,C); ``time`` (B,) fractional; ``z``
    optional scalar parameter (B,) with ``param_conditioning='scalar'``.
    """

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
    modes1: int = 12
    modes2: int = 12
    mode_scaling: bool = True
    param_conditioning: Optional[str] = None
    use_scale_shift_norm: bool = False
    # 'keys' = standard attention; 'queries' = reference softmax(dim=1)
    attn_softmax_axis: str = "keys"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, time: jnp.ndarray,
                 z: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        act = blocks.get_activation(self.activation)
        nc = self.hidden_channels
        tdim = nc * 4
        n_res = len(self.ch_mults)
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

        kernel = (1, 1) if self.use1x1 else (3, 3)
        h = nn.Conv(nc, kernel, dtype=self.dtype, name="image_proj")(x4)
        hs = [h]
        in_ch = nc
        bidx = 0
        common_kw = dict(activation=self.activation, norm=self.norm,
                         use_scale_shift_norm=self.use_scale_shift_norm,
                         dtype=self.dtype)
        for i in range(n_res):
            out_ch = in_ch * self.ch_mults[i]
            for _ in range(self.n_blocks):
                if i < self.n_fourier_layers:
                    m1, m2 = _level_modes(self.modes1, self.modes2, i,
                                          self.mode_scaling)
                    h = CondFourierResidualBlock(out_ch, m1, m2, **common_kw,
                                                 name=f"down_{bidx}")(h, emb)
                else:
                    h = CondResidualBlock(out_ch, **common_kw,
                                          name=f"down_{bidx}")(h, emb)
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
                h = nn.Conv(in_ch, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            name=f"downsample_{i}")(h)
                hs.append(h)

        h = CondResidualBlock(in_ch, **common_kw, name="middle_res1")(h, emb)
        if self.mid_attn:
            h = blocks.AttentionBlock(softmax_axis=self.attn_softmax_axis,
                                              dtype=self.dtype, name="middle_attn")(h)
        h = CondResidualBlock(in_ch, **common_kw, name="middle_res2")(h, emb)

        bidx = 0
        for i in reversed(range(n_res)):
            out_ch = in_ch
            for _ in range(self.n_blocks + 1):
                if _ == self.n_blocks:
                    out_ch = in_ch // self.ch_mults[i]
                s = hs.pop()
                h = jnp.concatenate([h, s], axis=-1)
                h = CondResidualBlock(out_ch, **common_kw,
                                      name=f"up_{bidx}")(h, emb)
                if self.is_attn[i]:
                    h = blocks.AttentionBlock(softmax_axis=self.attn_softmax_axis,
                                              dtype=self.dtype,
                                              name=f"up_{bidx}_attn")(h)
                bidx += 1
            in_ch = out_ch
            if i > 0:
                h = blocks.ConvTransposeUpsample(in_ch, kernel=4,
                                                 dtype=self.dtype,
                                                 name=f"upsample_{i}")(h)
        assert not hs
        if self.norm:
            h = blocks.GroupNorm(8)(h)
        out = nn.Conv(self.time_future * self.n_output_fields, kernel,
                      dtype=self.dtype, kernel_init=blocks.zeros_init,
                      name="final")(act(h))
        return common.expand_time(out, self.n_output_fields)
