"""Unetbase / Unetbase_G — the classic 4-level U-Net and its Multi-ResNet
generalisation, TPU-native.

Re-design of ``pdearena/pdearena/modules/twod_unetbase.py`` (``Unetbase:60``,
``Unetbase_G:254``, ``Down_G:200``, ``Up_G:221``) and the WMH segmentation
variant (``wmh/model.py:102-296``).

The G-variant carries the paper's ideas: parameter-free DWT encoder
(``Down_G`` with ``DWTBlock(J=1)``), per-level heads (``image_proj_list``) and
tails (``final_list``), multi-resolution outputs, ``n_levels_used`` truncation,
``n_extra_resnet_layers`` (re-spending saved encoder parameters in the
decoder), and the ``no_skip_connection`` / ``no_down_up`` ablations.

Non-dyadic resolutions (WMH: 200->100->50->25->13) are handled by a *generic*
shape-fix after upsampling: if the upsampled map mismatches the skip, it is
replicate-padded (top/left) or cropped (top/left) to match.  This subsumes the
reference's two special cases (``wmh/model.py:146-155``) and works at every
level instead of only the coarsest.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from unet_design_tpu.models import common
from unet_design_tpu.ops import blocks, wavelet

Dtype = Any


class Unetbase(nn.Module):
    """The original interpretation: MaxPool down, ConvTranspose up
    (``twod_unetbase.py:60-141``).  I/O: trajectories (B,T,H,W,C)."""

    n_output_fields: int
    time_future: int = 1
    hidden_channels: int = 64
    activation: str = "gelu"
    norm: bool = True
    # per-level sharding-constraint hook (parallel/mesh.make_spatial_guard):
    # lifts the grid-partitioning resolution floor by explicitly replicating
    # levels that degenerate below 2 rows per 'spatial' shard
    spatial_guard: Optional[Any] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.hidden_channels
        guard = self.spatial_guard or (lambda h: h)
        act_kw = dict(activation=self.activation, norm=self.norm,
                      dtype=self.dtype)
        x4 = common.collapse_time(x)
        h = blocks.ConvBlock(c, **act_kw, name="image_proj")(x4)

        skips = [h]
        for i, mult in enumerate((2, 4, 8, 16)):
            d = guard(nn.max_pool(skips[-1], (2, 2), strides=(2, 2)))
            d = blocks.ConvBlock(c * mult, **act_kw, name=f"down_{i}")(d)
            skips.append(d)

        hcur = skips.pop()
        for i, mult in enumerate((8, 4, 2, 1)):
            up = blocks.ConvTransposeUpsample(hcur.shape[-1] // 2, kernel=2,
                                              dtype=self.dtype,
                                              name=f"up_{i}_tconv")(hcur)
            up = guard(up)
            hcur = jnp.concatenate([skips.pop(), up], axis=-1)
            hcur = blocks.ConvBlock(c * mult, **act_kw, name=f"up_{i}")(hcur)

        out = nn.Conv(self.n_output_fields * self.time_future, (3, 3),
                      dtype=self.dtype, name="final")(hcur)
        return common.expand_time(out, self.n_output_fields)


def _match_spatial(h: jnp.ndarray, target_hw) -> jnp.ndarray:
    """Replicate-pad (top/left) or crop (top/left) h to the target H, W."""
    th, tw = target_hw
    dh, dw = h.shape[1] - th, h.shape[2] - tw
    if dh > 0:
        h = h[:, dh:, :, :]
    elif dh < 0:
        h = jnp.pad(h, ((0, 0), (-dh, 0), (0, 0), (0, 0)), mode="edge")
    if dw > 0:
        h = h[:, :, dw:, :]
    elif dw < 0:
        h = jnp.pad(h, ((0, 0), (0, 0), (-dw, 0), (0, 0)), mode="edge")
    return h


class UnetbaseGCore(nn.Module):
    """The Multi-ResNet U-Net core on 4D NHWC feature maps.

    Wrapped by :class:`UnetbaseG` (PDE trajectories) and
    :class:`WMHSegUnet` (2-modality MRI -> sigmoid mask).
    """

    out_channels: int
    hidden_channels: int = 64
    activation: str = "gelu"
    dwt_encoder: bool = False
    up_fct: str = "interpolate_nearest"  # | 'conv'
    n_extra_resnet_layers: int = 0
    multi_res_loss: bool = False
    sequ_mode: bool = False
    no_skip_connection: bool = False
    no_down_up: bool = False
    sigmoid_out: bool = False
    num_groups: int = 1
    # sharding-constraint hook (parallel/mesh.make_spatial_guard); see
    # Unetbase.spatial_guard
    spatial_guard: Optional[Any] = None
    # Rematerialize each conv block in the backward pass (jax.checkpoint):
    # trades ~30% recompute for dropping intra-block activations — the same
    # knob the reference exposes as use_checkpoint on its DDPM U-Net
    # (torch_ddpm/ddpm/models/unet/layers.py:120-165); pdearena never had
    # one.  Math-identical to remat=False.
    remat: bool = False
    dtype: Dtype = jnp.float32

    n_levels: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, n_levels_used: Optional[int] = None
                 ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        n = self.n_levels if n_levels_used is None else n_levels_used
        assert 1 <= n <= self.n_levels
        c = self.hidden_channels
        guard = self.spatial_guard or (lambda v: v)
        kw = dict(num_groups=self.num_groups, activation=self.activation,
                  dtype=self.dtype)
        partial_block = (nn.remat(blocks.PartialResnetConvBlock)
                         if self.remat else blocks.PartialResnetConvBlock)
        full_block = (nn.remat(blocks.FullResnetConvBlock)
                      if self.remat else blocks.FullResnetConvBlock)
        down_in = [c * 2 ** j for j in range(self.n_levels)]           # c,2c,4c,8c
        down_out = [c * 2 ** (j + 1) for j in range(self.n_levels)]    # 2c..16c
        up_in = down_out[::-1]                                         # 16c..2c
        up_out = down_in[::-1]                                         # 8c..c

        heads = {}

        def head(j):
            if j not in heads:
                heads[j] = partial_block(
                    down_in[j], **kw, name=f"image_proj_{j}")
            return heads[j]

        tails = {}

        def tail(j, h):
            if j not in tails:
                tails[j] = nn.Conv(self.out_channels, (3, 3),
                                   dtype=self.dtype, name=f"final_{j}")
            out = tails[j](h)
            return nn.sigmoid(out) if self.sigmoid_out else out

        # head (twod_unetbase.py:341-345: identity heads when not needed)
        entry = self.n_levels - n
        if self.is_initializing() and (self.multi_res_loss or self.sequ_mode):
            # Materialize all per-level heads/tails so a full-depth init
            # covers every staged forward (twod_unetbase.py:341-356 builds
            # them eagerly for all levels in sequ/multi-res mode).
            for j in range(self.n_levels):
                head(j)(x.astype(self.dtype))
                tail(j, jnp.zeros((1, 1, 1, up_out[j]), self.dtype))
        h = head(entry)(x.astype(self.dtype))

        skips = [h]
        for i in range(entry, self.n_levels):
            if self.dwt_encoder:
                octaves = 0 if self.no_down_up else 1
                h = guard(wavelet.dwt_block(h, octaves, down_out[i]))
            else:
                if not self.no_down_up:
                    h = guard(nn.avg_pool(h, (2, 2), strides=(2, 2)))
                h = partial_block(down_out[i], **kw, name=f"down_{i}")(h)
            if i != self.n_levels - 1:
                skips.append(h)

        outs: List[jnp.ndarray] = []
        for j in range(n):
            s = skips.pop()
            # Up_G (twod_unetbase.py:221-251 / wmh/model.py:123-162)
            if self.up_fct == "conv":
                if self.no_down_up:
                    up = h
                else:
                    up = blocks.ConvTransposeUpsample(up_in[j] // 2, kernel=2,
                                                      dtype=self.dtype,
                                                      name=f"up_{j}_tconv")(h)
            elif self.up_fct == "interpolate_nearest":
                up = nn.Conv(up_in[j] // 2, (3, 3), dtype=self.dtype,
                             name=f"up_{j}_chconv")(h)
                if not self.no_down_up:
                    up = blocks.nearest_upsample(up, 2)
            else:
                raise NotImplementedError(self.up_fct)
            up = guard(_match_spatial(up, s.shape[1:3]))
            if self.no_skip_connection:
                s = jnp.zeros_like(s)
            h = jnp.concatenate([s, up], axis=-1)
            h = partial_block(up_out[j], **kw, name=f"up_{j}")(h)
            for r in range(self.n_extra_resnet_layers):
                h = full_block(up_out[j], **kw, name=f"up_{j}_extra_{r}")(h)
            if self.multi_res_loss:
                outs.append(tail(j, h))
        if self.multi_res_loss:
            return outs
        return tail(n - 1, h)


class UnetbaseG(nn.Module):
    """pdearena 'Unetbase-64_G': trajectory I/O wrapper around the core
    (``twod_unetbase.py:254-396``)."""

    n_output_fields: int
    hidden_channels: int = 64
    activation: str = "gelu"
    dwt_encoder: bool = False
    up_fct: str = "interpolate_nearest"
    n_extra_resnet_layers: int = 0
    multi_res_loss: bool = False
    sequ_mode: bool = False
    no_skip_connection: bool = False
    no_down_up: bool = False
    remat: bool = False
    time_future: int = 1
    spatial_guard: Optional[Any] = None
    dtype: Dtype = jnp.float32

    n_levels: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, n_levels_used: Optional[int] = None):
        x4 = common.collapse_time(x)
        out = UnetbaseGCore(
            out_channels=self.time_future * self.n_output_fields,
            hidden_channels=self.hidden_channels,
            activation=self.activation,
            dwt_encoder=self.dwt_encoder,
            up_fct=self.up_fct,
            n_extra_resnet_layers=self.n_extra_resnet_layers,
            multi_res_loss=self.multi_res_loss,
            sequ_mode=self.sequ_mode,
            no_skip_connection=self.no_skip_connection,
            no_down_up=self.no_down_up,
            remat=self.remat,
            spatial_guard=self.spatial_guard,
            dtype=self.dtype,
            name="core")(x4, n_levels_used=n_levels_used)
        if self.multi_res_loss:
            return [common.expand_time(o, self.n_output_fields) for o in out]
        return common.expand_time(out, self.n_output_fields)


class WMHSegUnet(nn.Module):
    """WMH segmentation U-Net: 2 MRI modalities -> 1 sigmoid mask channel
    (``wmh/model.py:165-296``), including non-dyadic 200x200 handling."""

    hidden_channels: int = 16
    activation: str = "gelu"
    dwt_encoder: bool = False
    up_fct: str = "interpolate_nearest"
    n_extra_resnet_layers: int = 0
    multi_res_loss: bool = False
    sequ_mode: bool = False
    no_skip_connection: bool = False
    no_down_up: bool = False
    remat: bool = False
    spatial_guard: Optional[Any] = None
    dtype: Dtype = jnp.float32

    n_levels: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, n_levels_used: Optional[int] = None):
        return UnetbaseGCore(
            out_channels=1,
            hidden_channels=self.hidden_channels,
            activation=self.activation,
            dwt_encoder=self.dwt_encoder,
            up_fct=self.up_fct,
            n_extra_resnet_layers=self.n_extra_resnet_layers,
            multi_res_loss=self.multi_res_loss,
            sequ_mode=self.sequ_mode,
            no_skip_connection=self.no_skip_connection,
            no_down_up=self.no_down_up,
            remat=self.remat,
            sigmoid_out=True,
            spatial_guard=self.spatial_guard,
            dtype=self.dtype,
            name="core")(x, n_levels_used=n_levels_used)
