"""Haar wavelet (DWT) primitives — the L0 layer of the framework.

The reference framework's single most shared primitive is a "DWT block": a
J-octave Haar low-pass (LL) downsample, rescaled by ``1/2^J`` back to the input
data range, optionally channel-tiled to a target width.  It appears in all four
reference sub-repos (``diff_mnist/mnist_diff/models.py:12-82``,
``diff_cifar/model.py:253-323``, ``wmh/model.py:63-95``,
``pdearena/pdearena/modules/twod_unetbase.py:164-193``) where it is built from
``pytorch_wavelets.DWTForward`` (J octaves, mode='zero', wave='haar') followed
by ``DWTInverse((Yl, []))`` (a no-op on the LL band) and division by ``2^J``.

Mathematically, for the orthonormal Haar filter ``[1/sqrt(2), 1/sqrt(2)]`` the
2D LL band of one octave is ``(a + b + c + d) / 2`` per 2x2 block, i.e. twice
the block mean.  After J octaves the LL amplitude is ``2^J`` times the local
mean, so LL / 2^J is **exactly a chain of J zero-padded 2x2 average poolings**
(odd spatial sizes are zero-padded on the bottom/right before each octave and
the padded zeros participate in the average, matching 'zero' boundary mode).

That identity is the TPU-native design: no wavelet library, no explicit filter
convolution — just a reshape + mean per octave, which XLA fuses into a single
reduce-window read of HBM.  A fused multi-level Pallas pyramid kernel lives in
``unet_design_tpu.ops.pallas.haar`` for the multi-resolution-loss target path.

All functions take NHWC ``(B, H, W, C)`` arrays (TPU-native layout; the
reference is NCHW).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp


def _pad_to_even(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad H and W (bottom/right) to even sizes ('zero' boundary mode)."""
    _, h, w, _ = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x


def haar_downsample_once(x: jnp.ndarray) -> jnp.ndarray:
    """One octave of Haar LL downsampling, rescaled to the data range.

    Equals zero-padded 2x2 average pooling: ``out[i,j] = mean of 2x2 block``
    (with zeros contributing to the mean at odd boundaries).

    Args:
      x: ``(B, H, W, C)``.
    Returns:
      ``(B, ceil(H/2), ceil(W/2), C)``.
    """
    x = _pad_to_even(x)
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    # Mean in fp32 for accuracy, cast back (matters for bf16 activations).
    dtype = x.dtype
    return jnp.mean(x.astype(jnp.float32), axis=(2, 4)).astype(dtype)


def haar_downsample(x: jnp.ndarray, octaves: int) -> jnp.ndarray:
    """J-octave Haar LL downsample + ``1/2^J`` rescale (``DWTBlock`` with J>0).

    ``octaves == 0`` is the identity (reference ``DTWBlock`` 'version 1').
    """
    for _ in range(octaves):
        x = haar_downsample_once(x)
    return x


def haar_upsample_once(ll: jnp.ndarray) -> jnp.ndarray:
    """One level of Haar synthesis from the (range-rescaled) LL band only.

    The inverse of :func:`haar_downsample_once` in the projection sense: each
    pixel is replicated into its 2x2 block (nearest upsampling).  Composing
    ``haar_upsample_once(haar_downsample_once(x))`` is the orthogonal
    projection of ``x`` onto the coarse space (blockwise means).
    """
    b, h, w, c = ll.shape
    x = jnp.broadcast_to(ll[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def channel_tile(x: jnp.ndarray, out_channels: int) -> jnp.ndarray:
    """Tile channels to ``out_channels`` (reference channel-repeat + slice).

    Matches ``x.repeat(1, C_out // C_in + 1, 1, 1)[:, :C_out]`` in NCHW, i.e.
    whole-tensor channel tiling then truncation, covering non-multiple widths.
    """
    c = x.shape[-1]
    if c == out_channels:
        return x
    reps = out_channels // c + 1
    return jnp.tile(x, (1, 1, 1, reps))[..., :out_channels]


def dwt_block(x: jnp.ndarray, octaves: int, out_channels: int) -> jnp.ndarray:
    """The full reference ``DWTBlock`` / ``DTWBlock`` semantics.

    J=0: channel-tiled identity.  J>0: J-octave LL average downsample (with
    ``1/2^J`` range rescale already folded in), then channel tiling.
    """
    x = haar_downsample(x, octaves)
    return channel_tile(x, out_channels)


def dwt_pyramid(x: jnp.ndarray, n_levels: int) -> List[jnp.ndarray]:
    """All LL bands ``[x, down(x, 1), ..., down(x, n_levels - 1)]``.

    Computed incrementally (each level from the previous) so total work is
    O(pixels), unlike the reference which re-runs a fresh J-octave transform
    per level (``diff_cifar/diffusion.py:56-75``).

    Returns a list in **fine-to-coarse** order, ``levels[j] == x`` downsampled
    by ``j`` octaves.
    """
    out = [x]
    for _ in range(n_levels - 1):
        out.append(haar_downsample_once(out[-1]))
    return out


def multires_targets(x: jnp.ndarray, n_levels: int, n_downsample: int = 0
                     ) -> List[jnp.ndarray]:
    """Per-level targets for the multi-resolution loss, in decoder order.

    Mirrors the reference target construction
    (``diff_cifar/diffusion.py:52-78``): for levels ``k = n_levels-1 .. 0``
    (coarse to fine), shifted by ``n_downsample`` under the sequential training
    algorithm, the target is ``x`` downsampled by ``max(k - n_downsample, ...)``
    octaves; levels that would be negative are dropped.

    Args:
      x: the (already stage-downsampled) full-resolution target ``(B,H,W,C)``.
      n_levels: number of U-Net levels.
      n_downsample: octaves already applied to ``x`` by staged training.

    Returns:
      List of ``n_levels - n_downsample`` arrays, coarsest first (decoder
      emission order), finest (== ``x``) last.
    """
    ks = [k - n_downsample for k in reversed(range(n_levels))]
    ks = [k for k in ks if k >= 0]
    if not ks:
        return []
    pyr = dwt_pyramid(x, max(ks) + 1)
    return [pyr[k] for k in ks]


# ----------------------------------------------------------------------------
# 5-D trajectory helpers (PDE workloads): (B, T, H, W, C)
# ----------------------------------------------------------------------------

def haar_downsample_traj(x: jnp.ndarray, octaves: int) -> jnp.ndarray:
    """J-octave Haar downsample of a trajectory ``(B, T, H, W, C)``.

    Mirrors ``PDEModel.dwt_downsample`` (``pdearena/models/pdemodel.py:141-180``)
    which flattens (B, T) before the transform; spatial pooling is independent
    per frame so we just vmap-free reshape.
    """
    b, t = x.shape[:2]
    y = haar_downsample(x.reshape(b * t, *x.shape[2:]), octaves)
    return y.reshape(b, t, *y.shape[1:])


def multires_targets_traj(y: jnp.ndarray, n_levels: int, n_downsample: int,
                          pyramid_fn=None) -> List[jnp.ndarray]:
    """Decoder-order multi-res targets for a trajectory ``(B, T, H, W, C)``.

    Mirrors the multi-res branch of ``PDEModel.dwt_downsample``
    (``pdearena/models/pdemodel.py:150-167``): targets for octaves
    ``j = n_downsample .. n_levels-1``, reversed to decoder (coarse-to-fine
    emission) order.  Note the reference builds each target from the *full
    resolution* ``y`` (so the finest target is ``y`` downsampled by
    ``n_downsample``); we mirror that by downsampling ``y`` by ``n_downsample``
    first and then taking the incremental pyramid.
    """
    base = haar_downsample_traj(y, n_downsample)
    n = n_levels - n_downsample
    b, t = base.shape[:2]
    # pyramid_fn: drop-in pyramid implementation — pass
    # ``ops.pallas.haar.haar_pyramid_fused`` (3.1x at the 128px PDE target
    # shape on v5e, docs/tpu_notes.md) on backends where pallas-in-scan is
    # safe; default is the XLA avg-pool chain.
    pyr = (pyramid_fn or dwt_pyramid)(
        base.reshape(b * t, *base.shape[2:]), n)
    pyr = [p.reshape(b, t, *p.shape[1:]) for p in pyr]
    return pyr[::-1]
