"""Sinusoidal / Fourier time-and-condition embeddings.

Three embedding styles coexist in the reference; all are pure functions of the
timestep here, with the MLP heads living in the model blocks:

- DDPM interleaved style (``diff_cifar/model.py:14-43``): frequency table with
  [sin, cos] pairs interleaved along the last dim.
- OpenAI concat style (``torch_ddpm/ddpm/models/unet/layers.py:101-115``):
  ``[cos | sin]`` halves, fractional timesteps allowed.
- pdearena Fourier conditioning (``modules/conditioned/condition_utils.py``):
  ``[sin | cos]`` halves at scale-spaced frequencies.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def ddpm_time_embedding(t: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """Interleaved sin/cos embedding of integer timesteps.  (B,) -> (B, d_model)."""
    assert d_model % 2 == 0
    freqs = jnp.exp(-jnp.arange(0, d_model, 2, dtype=jnp.float32)
                    / d_model * math.log(10000.0))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.stack([jnp.sin(args), jnp.cos(args)], axis=-1)
    return emb.reshape(t.shape[0], d_model)


def fairseq_timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """[sin | cos] fairseq-style embedding used by the MLP ScoreNetwork
    (``torch_ddpm/ddpm/models/basic/time_embedding.py:6-23``): note the
    ``half - 1`` frequency denominator, unlike the OpenAI variant."""
    assert dim >= 4, (
        f"fairseq embedding needs dim >= 4 (got {dim}): the half-1 "
        "denominator would divide by zero and silently yield NaNs")
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / (half - 1))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def openai_timestep_embedding(t: jnp.ndarray, dim: int,
                              max_period: float = 10000.0) -> jnp.ndarray:
    """[cos | sin] embedding; timesteps may be fractional.  (B,) -> (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def fourier_embedding(t: jnp.ndarray, dim: int,
                      max_period: float = 10000.0) -> jnp.ndarray:
    """[cos | sin] embedding used by pdearena's conditioned models.

    Mirrors ``fourier_embedding`` (``conditioned/condition_utils.py:17-36``):
    cos first, then sin, with a zero column appended for odd ``dim``
    (execution-parity-tested against the reference).
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb
