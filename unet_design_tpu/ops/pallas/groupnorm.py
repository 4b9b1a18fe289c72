"""Fused GroupNorm(+activation) Pallas TPU kernel.

The GN -> SiLU/GELU -> conv chain is the per-block hot path of every model in
the zoo; GroupNorm's statistics force two reads of the activation in a naive
schedule.  This kernel computes fp32 group statistics and applies
normalize+affine+activation in a single VMEM-resident pass per batch element.

Group reductions are formulated as lane-dimension matmuls against an in-kernel
one-hot (C x G) membership matrix — TPU-friendly (no lane-splitting reshapes):

  group_sum = row_sum(x) @ M;  mean_c = (group_mean @ M^T)

Falls back to the plain JAX implementation when the feature map exceeds the
VMEM budget or when not running on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One batch element's (HW, C) fp32 slab must fit in scoped VMEM together with
# the kernel's temporaries (x fp32 copy, x*x, y, activation intermediates —
# measured ~8x the slab on v5e: a 4 MB slab compiled to a 31.97 MB scoped
# allocation against the 16 MB limit).  Keep the slab <= 1.5 MB so the whole
# working set stays within scoped VMEM.
_VMEM_SLAB_BYTES = int(1.5 * 1024 * 1024)


def pallas_eligible(shape) -> bool:
    """Whether ``fused_groupnorm_act`` will take the Pallas path for NHWC
    ``shape`` (else it silently falls back to the plain-JAX reference)."""
    _, h, w, c = shape
    return h * w * c * 4 <= _VMEM_SLAB_BYTES


def _activate(y: jnp.ndarray, activation: str) -> jnp.ndarray:
    if activation == "silu":
        return y * jax.nn.sigmoid(y)
    if activation == "gelu":
        return jax.nn.gelu(y, approximate=False)
    if activation == "none":
        return y
    raise NotImplementedError(activation)


def _gn_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int,
               eps: float, activation: str):
    x = x_ref[0].astype(jnp.float32)               # (HW, C)
    hw, c = x.shape
    cg = c // num_groups
    # one-hot group membership (C, G)
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    member = (ch_ids // cg == g_ids).astype(jnp.float32)

    s = jnp.sum(x, axis=0, keepdims=True)          # (1, C)
    ss = jnp.sum(x * x, axis=0, keepdims=True)
    denom = float(hw * cg)
    g_mean = jnp.dot(s, member, preferred_element_type=jnp.float32) / denom
    g_sqmean = jnp.dot(ss, member, preferred_element_type=jnp.float32) / denom
    g_var = g_sqmean - g_mean * g_mean
    g_rstd = jax.lax.rsqrt(g_var + eps)
    mean_c = jnp.dot(g_mean, member.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(g_rstd, member.T, preferred_element_type=jnp.float32)

    y = (x - mean_c) * rstd_c
    y = y * scale_ref[0][None, :].astype(jnp.float32) \
        + bias_ref[0][None, :].astype(jnp.float32)
    o_ref[0] = _activate(y, activation).astype(o_ref.dtype)


def fused_groupnorm_act(x: jnp.ndarray, scale: jnp.ndarray,
                        bias: jnp.ndarray, num_groups: int,
                        eps: float = 1e-5, activation: str = "silu",
                        interpret: bool = False) -> jnp.ndarray:
    """GroupNorm + activation, one pass.  x: (B, H, W, C) NHWC."""
    b, h, w, c = x.shape
    assert c % num_groups == 0
    if not pallas_eligible(x.shape) and not interpret:
        return groupnorm_act_reference(x, scale, bias, num_groups, eps,
                                       activation)
    x3 = x.reshape(b, h * w, c)
    kernel = functools.partial(_gn_kernel, num_groups=num_groups, eps=eps,
                               activation=activation)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
        interpret=interpret,
    )(x3, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(b, h, w, c)


def groupnorm_act_reference(x: jnp.ndarray, scale: jnp.ndarray,
                            bias: jnp.ndarray, num_groups: int,
                            eps: float = 1e-5, activation: str = "silu"
                            ) -> jnp.ndarray:
    """Plain-JAX fallback with identical semantics (fp32 statistics)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale + bias
    return _activate(y, activation).astype(x.dtype)
