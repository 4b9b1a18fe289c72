"""diff_mnist model family: OpenAI-style wavelet U-Net, baseline U-Net, MLP.

Re-designs of:

- ``UNet_wavelet`` (``diff_mnist/mnist_diff/unet.py:75-556``) — OpenAI-style
  DDPM U-Net (scale-shift/adaGN ResBlocks, zero-init output convs) with
  per-level time-embedding MLPs (``unet.py:155-159``), DWT or ResBlock encoder
  (``unet.py:185-239``), per-level decoder output heads with the
  ``model_out_passed_on`` channel re-injection (``unet.py:476-510``), and
  static ``n_levels_used`` truncation.
- ``UNetModel`` (``torch_ddpm/ddpm/models/unet/unet.py``) — the untouched
  fork baseline.
- ``ScoreNetwork`` (``mnist_diff/layers.py:14-67``) — x/t MLP encoders →
  decoder MLP.

Layout NHWC; ``t`` may be fractional (VP diffusion passes continuous steps).
Note on attention: the reference parses ``attention_resolutions="168"`` as the
single integer 168, so encoder/decoder attention never fires and only the
middle block attends (SURVEY.md §2a quirks); we default to ``()`` accordingly
but support real resolutions.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from unet_design_tpu.ops import blocks, embeddings, wavelet

Dtype = Any


def _norms_entry(norms, section, level, h):
    if norms is not None:
        norms.setdefault(section, {}).setdefault(level, []).append(
            jnp.linalg.norm(h.reshape(h.shape[0], -1), axis=-1).mean())


class WaveletUNetOpenAI(nn.Module):
    in_channels: int = 1
    model_channels: int = 32
    out_channels: int = 1
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[int] = (2, 2, 2, 2)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    dwt_encoder: bool = False
    multi_res_loss: bool = False
    model_out_passed_on: bool = True  # unet.py:457 force-sets True in forward
    dtype: Dtype = jnp.float32

    @property
    def n_levels(self) -> int:
        return len(self.channel_mult)

    def setup(self):
        mc = self.model_channels
        tdim = mc * 4
        self.time_embed = [
            _TimeEmbedMLP(mc, tdim, dtype=self.dtype, name=f"time_embed_{l}")
            for l in range(self.n_levels)
        ]
        if self.num_classes is not None:
            self.label_emb = nn.Embed(self.num_classes, tdim,
                                      name="label_emb")

        # ---- encoder plan (unet.py:176-239)
        enc_mods: List[List[Any]] = []
        enc_plan: List[List[Tuple[str, int]]] = []
        ch = mc * self.channel_mult[0]
        self._input_tile_ch = ch
        chans = [ch]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            mods, plan = [], []
            for i in range(self.num_res_blocks):
                out_ch = int(mult * mc)
                if self.dwt_encoder:
                    plan.append(("tile", out_ch))
                    mods.append(None)
                else:
                    plan.append(("res", out_ch))
                    mods.append(blocks.OpenAIResBlock(
                        out_channels=out_ch, dropout=self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        dtype=self.dtype, name=f"enc_{level}_{i}"))
                    if ds in self.attention_resolutions:
                        plan.append(("attn", out_ch))
                        mods.append(blocks.QKVAttentionBlock(
                            num_heads=self.num_heads, dtype=self.dtype,
                            name=f"enc_{level}_{i}_attn"))
                ch = out_ch
                chans.append(ch)
            if level != self.n_levels - 1:
                if self.dwt_encoder:
                    ch_next = int(self.channel_mult[level + 1] * mc)
                    plan.append(("dwt", ch_next))
                    mods.append(None)
                    ch = ch_next
                else:
                    plan.append(("down", ch))
                    mods.append(_DownsampleOpenAI(
                        use_conv=self.conv_resample, dtype=self.dtype,
                        name=f"enc_{level}_down"))
                chans.append(ch)
                ds *= 2
            enc_mods.append(mods)
            enc_plan.append(plan)
        self.enc_mods = enc_mods
        self._enc_plan = enc_plan

        self.middle = [
            blocks.OpenAIResBlock(out_channels=ch, dropout=self.dropout,
                                  use_scale_shift_norm=self.use_scale_shift_norm,
                                  dtype=self.dtype, name="middle_0"),
            blocks.QKVAttentionBlock(num_heads=self.num_heads,
                                     dtype=self.dtype, name="middle_attn"),
            blocks.OpenAIResBlock(out_channels=ch, dropout=self.dropout,
                                  use_scale_shift_norm=self.use_scale_shift_norm,
                                  dtype=self.dtype, name="middle_1"),
        ]

        # ---- decoder (unet.py:262-330): out_f_list / out_upsample_list
        dec_mods: List[List[Any]] = [[] for _ in range(self.n_levels)]
        ups: List[Any] = [None] * self.n_levels
        nh_up = (self.num_heads if self.num_heads_upsample == -1
                 else self.num_heads_upsample)
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                chans.pop()
                out_ch = int(mc * mult)
                dec_mods[level].append(blocks.OpenAIResBlock(
                    out_channels=out_ch, dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype, name=f"dec_{level}_{i}"))
                ch = out_ch
                if ds in self.attention_resolutions:
                    dec_mods[level].append(blocks.QKVAttentionBlock(
                        num_heads=nh_up, dtype=self.dtype,
                        name=f"dec_{level}_{i}_attn"))
            if level:
                ups[level] = _UpsampleOpenAI(use_conv=self.conv_resample,
                                             dtype=self.dtype,
                                             name=f"dec_{level}_up")
                ds //= 2
        assert not chans
        self.dec_mods = dec_mods
        self.dec_ups = ups
        self._final_ch = ch

        # per-decoder-step output heads (unet.py:306-330); indexed by the
        # decoder step i, as in the reference.
        self.out_activation = [
            _GNSiLU(dtype=self.dtype, name=f"out_act_{i}")
            for i in range(self.n_levels)
        ]
        self.out_reduce = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"out_reduce_{i}")
            for i in range(self.n_levels)
        ]

    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 y: Optional[jnp.ndarray] = None,
                 n_levels_used: int = -1, train: bool = False,
                 return_norms: bool = False):
        n = self.n_levels if n_levels_used == -1 else n_levels_used
        assert 1 <= n <= self.n_levels
        if n < self.n_levels:
            # Truncated forwards tile the input to channel_mult[0]*mc and
            # re-enter the decoder skip path mid-way; this only lines up when
            # all multipliers are equal — which is exactly the reference's
            # G-Net configs ("all channels same", mnist_diff/unet.py:22-31).
            assert len(set(self.channel_mult)) == 1, (
                "staged truncation requires uniform channel_mult, got "
                f"{self.channel_mult}")
        mc = self.model_channels
        norms: Optional[Dict] = {} if return_norms else None

        def temb(level):
            level = max(level, 0)
            e = self.time_embed[level](
                embeddings.openai_timestep_embedding(
                    jnp.reshape(t, (-1,)), mc).astype(self.dtype))
            if self.num_classes is not None:
                e = e + self.label_emb(y)
            return e

        if self.is_initializing():
            # Touch every per-step output head with the channel width decoder
            # step i sees (level n_levels-1-i), so a full-depth init covers
            # all staged forwards.
            for i in range(self.n_levels):
                ch_i = int(mc * self.channel_mult[self.n_levels - 1 - i])
                dummy = jnp.zeros((1, 1, 1, ch_i), self.dtype)
                self.out_reduce[i](self.out_activation[i](dummy))

        entry = self.n_levels - n
        h = wavelet.channel_tile(x.astype(self.dtype), self._input_tile_ch)
        hs = [h]
        _norms_entry(norms, "down", entry, h)
        for level in range(entry, self.n_levels):
            e = temb(level)
            for mod, (kind, out_ch) in zip(self.enc_mods[level],
                                           self._enc_plan[level]):
                if kind == "tile":
                    h = wavelet.channel_tile(h, out_ch)
                elif kind == "dwt":
                    h = wavelet.dwt_block(h, 1, out_ch)
                elif kind == "res":
                    h = mod(h, e, train=train)
                elif kind == "attn":
                    h = mod(h)
                    hs[-1] = h  # attn replaces the last skip entry
                    _norms_entry(norms, "down", level, h)
                    continue
                else:
                    h = mod(h)
                hs.append(h)
                _norms_entry(norms, "down", level, h)

        e = temb(self.n_levels - 1)
        for mod in self.middle:
            h = mod(h, e, train=train) if isinstance(
                mod, blocks.OpenAIResBlock) else mod(h)
        _norms_entry(norms, "middle", 0, h)

        outs: List[jnp.ndarray] = []
        for i, level in enumerate(range(self.n_levels - 1, entry - 1, -1)):
            e = temb(level)
            for mod in self.dec_mods[level]:
                if isinstance(mod, blocks.OpenAIResBlock):
                    h = jnp.concatenate([h, hs.pop()], axis=-1)
                    h = mod(h, e, train=train)
                else:
                    h = mod(h)
                _norms_entry(norms, "up", level, h)
            finest_used = (i == n - 1)
            if self.model_out_passed_on:
                n_state = h.shape[-1]
                h = self.out_activation[i](h)
                h = self.out_reduce[i](h)
                _norms_entry(norms, "up", level, h)
                if self.multi_res_loss:
                    outs.append(h)
                    h = wavelet.channel_tile(h, n_state)
                elif not finest_used:
                    h = wavelet.channel_tile(h, n_state)
                else:
                    outs.append(h)
            if not finest_used:
                h = self.dec_ups[level](h)
                _norms_entry(norms, "up", level, h)

        if not self.model_out_passed_on:
            if self.multi_res_loss:
                raise NotImplementedError(
                    "multi_res_loss without model_out_passed_on uses "
                    "hs_f_dec deferred heads; the reference force-enables "
                    "model_out_passed_on (unet.py:457)")
            h = self.out_activation[n - 1](h)
            h = self.out_reduce[n - 1](h)
            outs.append(h)

        if self.multi_res_loss:
            assert len(outs) == n
            result: Union[jnp.ndarray, List[jnp.ndarray]] = outs
        else:
            result = outs[-1] if outs else h
        if return_norms:
            return result, norms
        return result


class _TimeEmbedMLP(nn.Module):
    model_channels: int
    tdim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.tdim, dtype=self.dtype)(emb)
        return nn.Dense(self.tdim, dtype=self.dtype)(nn.silu(h))


class _GNSiLU(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        return nn.silu(blocks.GroupNorm(32)(h))


class _DownsampleOpenAI(nn.Module):
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            # (1,1) padding matches torch conv_nd(3, stride=2, padding=1)
            # alignment ('SAME' would pad (0,1) on even inputs)
            return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class _UpsampleOpenAI(nn.Module):
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = blocks.nearest_upsample(x, 2)
        if self.use_conv:
            x = nn.Conv(x.shape[-1], (3, 3), dtype=self.dtype)(x)
        return x


class UNetModel(nn.Module):
    """Baseline OpenAI DDPM U-Net (``torch_ddpm/ddpm/models/unet/unet.py``),
    kept for parity with the untouched fork model."""

    in_channels: int = 1
    model_channels: int = 32
    out_channels: int = 1
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 2)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    use_scale_shift_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 y: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        mc = self.model_channels
        tdim = mc * 4
        emb = embeddings.openai_timestep_embedding(jnp.reshape(t, (-1,)), mc)
        emb = nn.Dense(tdim, dtype=self.dtype)(emb.astype(self.dtype))
        emb = nn.Dense(tdim, dtype=self.dtype)(nn.silu(emb))
        if self.num_classes is not None:
            emb = emb + nn.Embed(self.num_classes, tdim)(y)

        h = nn.Conv(mc, (3, 3), dtype=self.dtype, name="in_conv")(
            x.astype(self.dtype))
        hs = [h]
        ch = mc
        ds = 1
        bi = 0
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = int(mult * mc)
                h = blocks.OpenAIResBlock(
                    out_channels=ch, dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype, name=f"enc_{bi}")(h, emb, train=train)
                if ds in self.attention_resolutions:
                    h = blocks.QKVAttentionBlock(num_heads=self.num_heads,
                                                 dtype=self.dtype,
                                                 name=f"enc_{bi}_attn")(h)
                hs.append(h)
                bi += 1
            if level != len(self.channel_mult) - 1:
                h = _DownsampleOpenAI(use_conv=self.conv_resample,
                                      dtype=self.dtype,
                                      name=f"down_{level}")(h)
                hs.append(h)
                ds *= 2

        h = blocks.OpenAIResBlock(out_channels=ch, dropout=self.dropout,
                                  use_scale_shift_norm=self.use_scale_shift_norm,
                                  dtype=self.dtype, name="mid_0")(h, emb,
                                                                  train=train)
        h = blocks.QKVAttentionBlock(num_heads=self.num_heads,
                                     dtype=self.dtype, name="mid_attn")(h)
        h = blocks.OpenAIResBlock(out_channels=ch, dropout=self.dropout,
                                  use_scale_shift_norm=self.use_scale_shift_norm,
                                  dtype=self.dtype, name="mid_1")(h, emb,
                                                                  train=train)

        # NOTE: the fork's forward slices
        # ``output_blocks[:n_levels * (num_res_blocks+1) - 1]``
        # (unet.py:242-246) — the LAST decoder ResBlock never runs and the
        # first skip (the in_conv activation) is never consumed.  Replicated
        # here for execution parity with the fork.
        n_dec = len(self.channel_mult) * (self.num_res_blocks + 1) - 1
        bi = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                if bi >= n_dec:
                    break
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                ch = int(mc * mult)
                h = blocks.OpenAIResBlock(
                    out_channels=ch, dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype, name=f"dec_{bi}")(h, emb, train=train)
                if ds in self.attention_resolutions:
                    h = blocks.QKVAttentionBlock(num_heads=self.num_heads,
                                                 dtype=self.dtype,
                                                 name=f"dec_{bi}_attn")(h)
                bi += 1
            if level:
                h = _UpsampleOpenAI(use_conv=self.conv_resample,
                                    dtype=self.dtype,
                                    name=f"up_{level}")(h)
                ds //= 2
        assert len(hs) == 1  # in_conv skip, unconsumed in the fork
        h = nn.silu(blocks.GroupNorm(32)(h))
        # the fork replaces the original zero-init 3x3 out conv with a 1x1
        # ``out_reduce_channels`` (torch_ddpm/ddpm/models/unet/unet.py:187-192)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                       name="out_conv")(h)


class MLP(nn.Module):
    """``torch_ddpm/ddpm/models/basic/layers.py:8-30``."""

    layer_widths: Sequence[int]
    activate_final: bool = False
    negative_slope: float = 0.01  # LeakyReLU

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = lambda v: nn.leaky_relu(v, self.negative_slope)
        for w in self.layer_widths[:-1]:
            x = act(nn.Dense(w)(x))
        x = nn.Dense(self.layer_widths[-1])(x)
        return act(x) if self.activate_final else x


class ScoreNetwork(nn.Module):
    """x/t MLP score network (``mnist_diff/layers.py:14-67``)."""

    x_dim: int = 2
    encoder_layers: Sequence[int] = (16,)
    pos_dim: int = 16
    decoder_layers: Sequence[int] = (128, 128)

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 n_levels_used: int = -1) -> jnp.ndarray:
        orig_shape = x.shape
        is_image = x.ndim > 2
        if is_image:
            x = x.reshape(x.shape[0], -1)
        t_enc_dim = self.pos_dim * 2
        # fairseq-style embedding, NOT the OpenAI one (time_embedding.py:6-23)
        temb = embeddings.fairseq_timestep_embedding(jnp.reshape(t, (-1,)),
                                                     self.pos_dim)
        temb = MLP(tuple(self.encoder_layers) + (t_enc_dim,),
                   name="t_encoder")(temb)
        xemb = MLP(tuple(self.encoder_layers) + (t_enc_dim,),
                   name="x_encoder")(x)
        h = jnp.concatenate([xemb, temb], axis=-1)
        out = MLP(tuple(self.decoder_layers) + (x.shape[-1],),
                  name="net")(h)
        if is_image:
            out = out.reshape(orig_shape)
        return out
