"""Fused multi-level Haar LL pyramid as a Pallas TPU kernel.

The multi-resolution loss needs the target downsampled at *every* level
(``diff_cifar/diffusion.py:52-78``); computed separately that is L reads of
HBM.  This kernel reads the input once per (batch, channel-tile) and emits all
L levels from VMEM.

Averaging is expressed as MXU matmuls: one octave is ``A_h @ x @ A_w^T`` where
``A_n`` is the (n/2, n) 2x2-averaging operator (0.5 at columns 2i, 2i+1),
built in-kernel from iota comparisons.  Spatial dims must be even at each
octave (dyadic inputs — the diffusion workloads' case).
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _avg_matrix(n: int) -> jnp.ndarray:
    """(n//2, n) with 0.5 at columns 2i and 2i+1."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n // 2, n), 1)
    return jnp.where(cols // 2 == rows, 0.5, 0.0).astype(jnp.float32)


def _pyramid_kernel(x_ref, *o_refs, n_levels: int):
    x = x_ref[0].astype(jnp.float32)           # (H, W)
    o_refs[0][0] = x.astype(o_refs[0].dtype)
    h, w = x.shape
    for lvl in range(1, n_levels):
        a_h = _avg_matrix(h)
        a_w = _avg_matrix(w)
        x = jnp.dot(a_h, jnp.dot(x, a_w.T,
                                 preferred_element_type=jnp.float32),
                    preferred_element_type=jnp.float32)
        h, w = h // 2, w // 2
        o_refs[lvl][0] = x.astype(o_refs[lvl].dtype)


def haar_pyramid_fused(x: jnp.ndarray, n_levels: int,
                       interpret: bool = False) -> List[jnp.ndarray]:
    """All LL bands ``[x, down1, ..., down_{L-1}]`` in one fused pass.

    x: (B, H, W, C) with H, W divisible by 2^(L-1).  Returns the same list as
    :func:`unet_design_tpu.ops.wavelet.dwt_pyramid`.
    """
    b, h, w, c = x.shape
    assert h % (1 << (n_levels - 1)) == 0 and w % (1 << (n_levels - 1)) == 0
    # grid over (batch * channel); each instance handles one (H, W) plane.
    xp = jnp.moveaxis(x, -1, 1).reshape(b * c, h, w)
    kernel = functools.partial(_pyramid_kernel, n_levels=n_levels)
    out_shapes = [jax.ShapeDtypeStruct((b * c, h >> l, w >> l), x.dtype)
                  for l in range(n_levels)]
    outs = pl.pallas_call(
        kernel,
        grid=(b * c,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((1, h >> l, w >> l), lambda i: (i, 0, 0))
                   for l in range(n_levels)],
        out_shape=out_shapes,
        interpret=interpret,
    )(xp)
    return [jnp.moveaxis(o.reshape(b, c, h >> l, w >> l), 1, -1)
            for l, o in enumerate(outs)]
