"""Neural building blocks (L1 ops layer) — flax.linen, NHWC, TPU dtype policy.

Covers the union of the reference's block vocabularies:

- pdearena base blocks: ``ConvBlock`` / ``PartialResnetConvBlock`` /
  ``FullResnetConvBlock`` (``pdearena/modules/twod_unetbase.py:12-162``,
  ``wmh/model.py:24-60``).
- pdearena modern blocks: wide ``ResidualBlock``, ``AttentionBlock``
  (``pdearena/modules/twod_unet.py:16-181``).
- diff_cifar DDPM blocks: ``ResBlock`` / ``AttnBlock`` / ``TimeEmbedding`` /
  ``DownSample`` / ``UpSample`` (``diff_cifar/model.py:9-169``).
- diff_mnist OpenAI-style blocks: scale-shift-norm ``ResBlock``, zero-init
  output convs (``torch_ddpm/ddpm/models/unet/layers.py:250-390``).

Dtype policy: parameters are fp32 (``param_dtype``); compute runs in ``dtype``
(bf16 by default on TPU via the model configs); GroupNorm statistics are always
accumulated in fp32 (the reference's ``GroupNorm32``, ``unet/layers.py:16-18``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from unet_design_tpu.ops import embeddings

Dtype = Any

# ----------------------------------------------------------------------------
# Activations (mirrors ACTIVATION_REGISTRY, pdearena/modules/activations.py)
# ----------------------------------------------------------------------------

ACTIVATIONS: dict = {
    "relu": nn.relu,
    "silu": nn.silu,
    "swish": nn.silu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
}


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if name not in ACTIVATIONS:
        raise NotImplementedError(f"Activation {name} not implemented")
    return ACTIVATIONS[name]


def xavier_uniform_scaled(gain: float = 1.0):
    """Xavier/Glorot uniform with an explicit gain (torch ``init.xavier_uniform_``)."""
    base = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")

    def init(key, shape, dtype=jnp.float32):
        return gain * base(key, shape, dtype)

    return init


zeros_init = nn.initializers.zeros


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics regardless of activation dtype."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        out = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon,
                           dtype=jnp.float32, param_dtype=jnp.float32)(
                               x.astype(jnp.float32))
        return out.astype(orig_dtype)


# ----------------------------------------------------------------------------
# pdearena-base conv blocks
# ----------------------------------------------------------------------------

class ConvBlock(nn.Module):
    """conv3-norm-act x2 (``twod_unetbase.py:12-32``)."""

    out_channels: int
    num_groups: int = 1
    norm: bool = True
    activation: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(x)
        if self.norm:
            h = GroupNorm(self.num_groups)(h)
        h = act(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(h)
        if self.norm:
            h = GroupNorm(self.num_groups)(h)
        return act(h)


class PartialResnetConvBlock(nn.Module):
    """Channel-changing residual conv block (``twod_unetbase.py:154-161``).

    ``h = act(norm(conv1(x))); out = h + act(norm(conv2(h)))``.
    """

    out_channels: int
    num_groups: int = 1
    norm: bool = True
    activation: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(x)
        if self.norm:
            h = GroupNorm(self.num_groups)(h)
        h = act(h)
        h2 = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(h)
        if self.norm:
            h2 = GroupNorm(self.num_groups)(h2)
        return h + act(h2)


class FullResnetConvBlock(nn.Module):
    """ConvBlock with identity skip (``twod_unetbase.py:148-151``)."""

    out_channels: int
    num_groups: int = 1
    norm: bool = True
    activation: str = "gelu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = ConvBlock(self.out_channels, self.num_groups, self.norm,
                      self.activation, self.dtype)(x)
        return h + x


# ----------------------------------------------------------------------------
# pdearena modern blocks
# ----------------------------------------------------------------------------

class ResidualBlock(nn.Module):
    """Wide residual block, pre-norm (``twod_unet.py:16-61``)."""

    out_channels: int
    activation: str = "gelu"
    norm: bool = False
    n_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        in_channels = x.shape[-1]
        h = x
        if self.norm:
            h = GroupNorm(self.n_groups)(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(act(h))
        if self.norm:
            h = GroupNorm(self.n_groups)(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(act(h))
        if in_channels != self.out_channels:
            shortcut = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="shortcut")(x)
        else:
            shortcut = x
        return h + shortcut


class AttentionBlock(nn.Module):
    """Multi-head spatial self-attention (``twod_unet.py:126-181``).

    ``softmax_axis`` controls the normalization axis of the attention
    weights.  The reference normalizes over the *query* axis
    (``attn.softmax(dim=1)``, ``twod_unet.py:170``), which we read as a
    transcription slip of the annotated-DDPM source — but the reference
    *trained and published* with it, so ``'queries'`` reproduces the
    reference bit-for-bit (transplant-parity-tested) while the default
    ``'keys'`` is standard attention.
    """

    n_heads: int = 1
    d_k: Optional[int] = None
    n_groups: int = 1
    softmax_axis: str = "keys"   # 'keys' (standard) | 'queries' (reference)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        d_k = self.d_k or c
        assert self.softmax_axis in ("keys", "queries"), self.softmax_axis
        axis = 2 if self.softmax_axis == "keys" else 1
        seq = x.reshape(b, h * w, c)
        qkv = nn.Dense(self.n_heads * d_k * 3, dtype=self.dtype)(seq)
        qkv = qkv.reshape(b, h * w, self.n_heads, 3 * d_k)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jnp.einsum("bihd,bjhd->bijh", q, k) * (d_k ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32),
                              axis=axis).astype(self.dtype)
        res = jnp.einsum("bijh,bjhd->bihd", attn, v)
        res = res.reshape(b, h * w, self.n_heads * d_k)
        res = nn.Dense(c, dtype=self.dtype)(res)
        return (res + seq).reshape(b, h, w, c)


# ----------------------------------------------------------------------------
# DDPM (diff_cifar) blocks
# ----------------------------------------------------------------------------

class TimeEmbedding(nn.Module):
    """Sinusoid table -> Linear -> swish -> Linear (``diff_cifar/model.py:14-43``)."""

    d_model: int
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = embeddings.ddpm_time_embedding(t, self.d_model).astype(self.dtype)
        emb = nn.Dense(self.dim, dtype=self.dtype,
                       kernel_init=xavier_uniform_scaled())(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.dim, dtype=self.dtype,
                        kernel_init=xavier_uniform_scaled())(emb)


class DDPMAttnBlock(nn.Module):
    """Single-head attention with 1x1-conv projections (``diff_cifar/model.py:84-119``)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        h = GroupNorm(32)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype,
                    kernel_init=xavier_uniform_scaled())(h)
        k = nn.Conv(c, (1, 1), dtype=self.dtype,
                    kernel_init=xavier_uniform_scaled())(h)
        v = nn.Conv(c, (1, 1), dtype=self.dtype,
                    kernel_init=xavier_uniform_scaled())(h)
        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        w = jnp.einsum("bic,bjc->bij", q, k) * (c ** -0.5)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(self.dtype)
        h = jnp.einsum("bij,bjc->bic", w, v).reshape(b, hh, ww, c)
        h = nn.Conv(c, (1, 1), dtype=self.dtype,
                    kernel_init=xavier_uniform_scaled(1e-5))(h)
        return x + h


class DDPMResBlock(nn.Module):
    """GN-swish-conv / +temb / GN-swish-drop-conv / +shortcut [/ attn]
    (``diff_cifar/model.py:122-169``)."""

    out_channels: int
    dropout: float = 0.0
    attn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        in_channels = x.shape[-1]
        h = GroupNorm(32)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    kernel_init=xavier_uniform_scaled())(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     kernel_init=xavier_uniform_scaled(),
                     name="temb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GroupNorm(32)(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    kernel_init=xavier_uniform_scaled(1e-5))(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        kernel_init=xavier_uniform_scaled(),
                        name="shortcut")(x)
        h = h + x
        if self.attn:
            h = DDPMAttnBlock(dtype=self.dtype)(h)
        return h


class Downsample(nn.Module):
    """Stride-2 conv or 2x2 avg-pool downsample (``diff_cifar/model.py:46-63``)."""

    method: str = "conv"  # 'conv' | 'avg_pool'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.method == "conv":
            # explicit (1,1) padding: flax 'SAME' pads (0,1) on even inputs,
            # a half-pixel misalignment vs the reference's torch padding=1
            # (caught by the transplant parity tests)
            return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), dtype=self.dtype,
                           kernel_init=xavier_uniform_scaled())(x)
        if self.method == "avg_pool":
            return nn.avg_pool(x, (2, 2), strides=(2, 2))
        raise NotImplementedError(self.method)


def nearest_upsample(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour spatial upsample (NHWC)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class Upsample(nn.Module):
    """Nearest x2 upsample + 3x3 conv (``diff_cifar/model.py:66-81``)."""

    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nearest_upsample(x, 2)
        if self.use_conv:
            x = nn.Conv(x.shape[-1], (3, 3), dtype=self.dtype,
                        kernel_init=xavier_uniform_scaled())(x)
        return x


class ConvTransposeUpsample(nn.Module):
    """Transposed-conv x2 upsample (pdearena ``Up``/``Upsample`` variants)."""

    out_channels: int
    kernel: int = 2  # 2 (Unetbase Up) or 4 (modern Unet Upsample)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.ConvTranspose(self.out_channels,
                                (self.kernel, self.kernel),
                                strides=(2, 2), padding="SAME",
                                dtype=self.dtype)(x)


# ----------------------------------------------------------------------------
# OpenAI-style (diff_mnist) blocks
# ----------------------------------------------------------------------------

class OpenAIResBlock(nn.Module):
    """OpenAI DDPM residual block with optional scale-shift (adaGN) norm
    (``torch_ddpm/ddpm/models/unet/layers.py:250-340``)."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    use_conv_shortcut: bool = False
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        in_channels = x.shape[-1]
        h = GroupNorm(self.num_groups)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype)(h)
        emb_dim = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = nn.Dense(emb_dim, dtype=self.dtype,
                           name="emb_proj")(nn.silu(emb))
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm(self.num_groups)(h)
            h = h * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
        else:
            h = h + emb_out[:, None, None, :]
            h = GroupNorm(self.num_groups)(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    kernel_init=zeros_init, name="out_conv")(h)
        if in_channels == self.out_channels:
            skip = x
        elif self.use_conv_shortcut:
            skip = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                           name="skip")(x)
        else:
            skip = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name="skip")(x)
        return skip + h


class QKVAttentionBlock(nn.Module):
    """OpenAI multi-head attention with fused qkv 1x1 conv
    (``unet/layers.py:341-391``)."""

    num_heads: int = 1
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        assert c % self.num_heads == 0
        dh = c // self.num_heads
        h = GroupNorm(self.num_groups)(x).reshape(b, hh * ww, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(b, hh * ww, self.num_heads, 3 * dh)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / (dh ** 0.25)
        w = jnp.einsum("bihd,bjhd->bijh", q * scale, k * scale)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=2).astype(self.dtype)
        a = jnp.einsum("bijh,bjhd->bihd", w, v).reshape(b, hh * ww, c)
        a = nn.Dense(c, dtype=self.dtype, kernel_init=zeros_init,
                     name="proj_out")(a)
        return x + a.reshape(b, hh, ww, c)
