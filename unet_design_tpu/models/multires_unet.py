"""Multi-ResNet DDPM U-Net — the diff_cifar flagship model, TPU-native.

Re-design of ``UNetWaveletEnc`` (``diff_cifar/model.py:326-496``): a DDPM U-Net
(ch, ch_mult, per-level attention, ``num_res_blocks``) carrying the paper's
three ideas:

1. **DWT encoder** (``dwt_encoder=True``): every encoder ResBlock is replaced
   by a parameter-free channel-tiling identity and every Downsample by a Haar
   LL downsample (``diff_cifar/model.py:342-370``).
2. **Multi-resolution loss** (``multi_res_loss=True``): the decoder emits a
   prediction at every active resolution via per-level tails
   (``model.py:440-496``).
3. **Staged training**: ``n_levels_used`` (a *static* argument — one compiled
   graph per stage) truncates the U to its coarsest ``n_levels_used`` levels
   (``model.py:412-419``).

Per-level time-embedding MLPs (``model.py:337``) and per-level channel-tiling
heads (``model.py:340-347``) follow the reference exactly.

Layout: NHWC.  ``x: (B, H, W, C)``, ``t: (B,) int32``.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from unet_design_tpu.ops import blocks, wavelet

Dtype = Any


class MultiResUNet(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    attn: Sequence[int] = (1,)
    num_res_blocks: int = 2
    dropout: float = 0.1
    out_channels: int = 3
    dwt_encoder: bool = False
    multi_res_loss: bool = False
    downsample_type: str = "conv"  # 'conv' | 'avg_pool'
    use_checkpoint: bool = False   # rematerialize ResBlocks (jax.checkpoint)
    dtype: Dtype = jnp.float32

    @property
    def n_levels(self) -> int:
        return len(self.ch_mult)

    def setup(self):
        assert all(i < self.n_levels for i in self.attn), "attn index out of bound"
        # The reference's gradient checkpointing (unet/layers.py:120-165,
        # use_checkpoint flag) becomes XLA rematerialization of each ResBlock.
        res_block = (nn.remat(blocks.DDPMResBlock, static_argnums=(2,))
                     if self.use_checkpoint else blocks.DDPMResBlock)
        self._res_block_cls = res_block
        tdim = self.ch * 4
        self.time_embedding_list = [
            blocks.TimeEmbedding(d_model=self.ch, dim=tdim, dtype=self.dtype,
                                 name=f"time_emb_{l}")
            for l in range(self.n_levels)
        ]

        # Encoder: mirror the channel bookkeeping of model.py:342-370.
        downs: List[List[Any]] = []
        head_channels: List[int] = []   # channels fed to level l's head tile
        enc_plan: List[List[Tuple[str, int]]] = []  # per level: (kind, out_ch)
        chs = [self.ch]
        now_ch = self.ch
        for l, mult in enumerate(self.ch_mult):
            head_channels.append(now_ch)
            level_mods: List[Any] = []
            level_plan: List[Tuple[str, int]] = []
            out_ch = self.ch * mult
            for i in range(self.num_res_blocks):
                if self.dwt_encoder:
                    level_plan.append(("tile", out_ch))
                    level_mods.append(None)
                else:
                    level_plan.append(("res", out_ch))
                    level_mods.append(res_block(
                        out_channels=out_ch, dropout=self.dropout,
                        attn=(l in self.attn), dtype=self.dtype,
                        name=f"down_{l}_{i}"))
                now_ch = out_ch
                chs.append(now_ch)
            if l != self.n_levels - 1:
                if self.dwt_encoder:
                    level_plan.append(("dwt", now_ch))
                    level_mods.append(None)
                else:
                    level_plan.append(("down", now_ch))
                    level_mods.append(blocks.Downsample(
                        method=self.downsample_type, dtype=self.dtype,
                        name=f"down_{l}_downsample"))
                chs.append(now_ch)
            downs.append(level_mods)
            enc_plan.append(level_plan)
        self.downblocks = downs
        self._enc_plan = enc_plan
        self._head_channels = head_channels

        self.middle = [
            res_block(out_channels=now_ch, dropout=self.dropout,
                                attn=True, dtype=self.dtype, name="middle_0"),
            res_block(out_channels=now_ch, dropout=self.dropout,
                                attn=False, dtype=self.dtype, name="middle_1"),
        ]

        ups: List[List[Any]] = []
        for l, mult in reversed(list(enumerate(self.ch_mult))):
            out_ch = self.ch * mult
            level_mods = []
            for j in range(self.num_res_blocks + 1):
                chs.pop()
                level_mods.append(res_block(
                    out_channels=out_ch, dropout=self.dropout,
                    attn=(l in self.attn), dtype=self.dtype,
                    name=f"up_{l}_{j}"))
                now_ch = out_ch
            if l != 0:
                level_mods.append(blocks.Upsample(dtype=self.dtype,
                                                  name=f"up_{l}_upsample"))
            level_mods_by_level: List[Any] = level_mods
            ups.append(level_mods_by_level)
        assert len(chs) == 0
        # ups was built coarse-to-fine over reversed levels; index by level.
        self.upblocks = ups[::-1]

        self.tails = [
            _Tail(out_channels=self.out_channels, dtype=self.dtype,
                  name=f"tail_{l}")
            for l in range(self.n_levels)
        ]

    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 n_levels_used: Optional[int] = None, train: bool = False
                 ) -> Union[jnp.ndarray, List[jnp.ndarray]]:
        n = self.n_levels if n_levels_used is None else n_levels_used
        assert 1 <= n <= self.n_levels

        if self.is_initializing():
            # Materialize every per-level tail (and time embedding) so that a
            # full-depth init covers all staged/truncated forwards — the
            # reference constructs tail_list/time_embedding_list eagerly for
            # all levels (diff_cifar/model.py:337,393-397).
            for l in range(self.n_levels):
                self.tails[l](jnp.zeros((1, 1, 1, self.ch * self.ch_mult[l]),
                                        self.dtype))
                self.time_embedding_list[l](t)

        # head: channel-tile the input to the entry level's width
        entry = self.n_levels - n
        h = wavelet.channel_tile(x.astype(self.dtype),
                                 self._head_channels[entry])
        hs = [h]
        tembs = {}

        def temb(level):
            if level not in tembs:
                tembs[level] = self.time_embedding_list[level](t)
            return tembs[level]

        # encoder over the coarsest n levels
        for level in range(entry, self.n_levels):
            for mod, (kind, out_ch) in zip(self.downblocks[level],
                                           self._enc_plan[level]):
                if kind == "tile":
                    h = wavelet.channel_tile(h, out_ch)
                elif kind == "dwt":
                    h = wavelet.dwt_block(h, 1, out_ch)
                elif kind == "res":
                    h = mod(h, temb(level), train)
                else:  # 'down'
                    h = mod(h)
                hs.append(h)

        # middle (belongs to the coarsest level, model.py:433-437)
        for mod in self.middle:
            h = mod(h, temb(self.n_levels - 1), train)

        outs: List[jnp.ndarray] = []
        # decoder, coarse-to-fine over the first n levels
        for idx in range(n):
            level = self.n_levels - 1 - idx
            mods = self.upblocks[level]
            res_mods = mods[:self.num_res_blocks + 1]
            up_mod = mods[self.num_res_blocks + 1] if level != 0 else None
            for mod in res_mods:
                h_cat = hs.pop()
                h = jnp.concatenate([h, h_cat], axis=-1)
                h = mod(h, temb(level), train)
            last_level_currently_used = self.n_levels - n
            if level != last_level_currently_used:
                if self.multi_res_loss:
                    outs.append(self.tails[level](h))
                if up_mod is not None:
                    h = up_mod(h)
        assert not hs

        outs.append(self.tails[self.n_levels - n](h))
        if self.multi_res_loss:
            assert len(outs) == n
            return outs
        return outs[-1]


class _Tail(nn.Module):
    """GN32 -> swish -> conv3 with near-zero init (``model.py:393-410``)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        h = blocks.GroupNorm(32)(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                       kernel_init=blocks.xavier_uniform_scaled(1e-5))(h)
