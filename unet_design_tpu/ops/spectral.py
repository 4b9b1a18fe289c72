"""Spectral (Fourier) convolutions — rfft, truncated mode mixing, irfft.

TPU-native port of ``pdearena/pdearena/modules/fourier.py`` (SpectralConv1d/2d/3d)
and the UNO spectral conv (``pdearena/pdearena/modules/twod_uno.py:39-114``).

Complex weights are stored as trailing-dim real pairs in fp32 and the
mode-mixing contraction is performed as **four real einsums**
((a+bi)(c+di) = (ac-bd) + (ad+bc)i) rather than a complex einsum.  This is
deliberate TPU design, not style: real contractions map directly onto the
MXU, and — critically — no complex array is ever materialized *eagerly*
(outside a traced graph).  Eager complex64 buffer creation is unimplemented
on tunneled TPU backends and poisons the process client; complex values here
only ever exist as traced tensors between ``rfft`` and ``irfft``.

Layout is NHWC: spatial FFT axes are (1, 2) for 2D inputs ``(B, H, W, C)``.

**Truncated-DFT matmul path.**  FNO keeps only a small ``(2*m1, m2)`` corner
of the spectrum, so computing a full ``rfft2`` (slow on TPU: XLA lowers FFT
to scalar-heavy code, not MXU work) then slicing — and scattering the mixed
modes back into a zero ``(B, H, W//2+1, C)`` spectrum for ``irfft2`` — wastes
both FLOPs and HBM traffic.  Whenever ``2*m1 <= H`` and ``m2 <= W//2`` (every
registry FNO/U-FNet/UNO config), the 1D/2D convs instead contract the input
directly with truncated real DFT matrices (:func:`_trunc_rfft2`) and invert
from the corner modes alone (:func:`_trunc_irfft2`) — pure ``einsum`` work on
the systolic array, numerically equal to the FFT path (golden-tested, incl.
the C2R convention that Im of the ``l=0`` column is dropped).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


_HIGH = jax.lax.Precision.HIGHEST


def _dft_mats(n: int, modes: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables ``exp(-2*pi*i*n*k/N)`` for the given mode indices.

    Returns ``(cos, sin)`` of shape ``(N, len(modes))``; real-valued constants
    only (no eager complex — see module docstring).
    """
    ang = 2.0 * jnp.pi * (jnp.arange(n)[:, None] * modes[None, :]) / n
    return jnp.cos(ang), jnp.sin(ang)


def _use_dft_matmul(h: int, w: int, m1: int, m2: int) -> bool:
    """The truncated-DFT matmul path is valid when the two half-spectrum row
    blocks don't overlap and no Nyquist column is kept."""
    return 2 * m1 <= h and m2 <= w // 2


def _trunc_rfft2(x: jnp.ndarray, m1: int, m2: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Corner modes of ``rfft2(x, axes=(1, 2))`` via MXU matmuls.

    TPU-native replacement for *compute the full FFT then slice*: only the
    ``(2*m1, m2)`` corner modes FNO keeps are ever computed, as four real
    matmuls with truncated DFT matrices (systolic-array work instead of XLA's
    slow TPU FFT), and the big ``(B, H, W//2+1, C)`` spectrum is never
    materialized.  Returns ``(re, im)`` of shape ``(B, 2*m1, m2, C)`` — rows
    are the first ``m1`` then the last ``m1`` frequencies of the H axis.
    """
    _, h, w, _ = x.shape
    cw, sw = _dft_mats(w, jnp.arange(m2))
    tr = jnp.einsum("bhwc,wl->bhlc", x, cw, precision=_HIGH)
    ti = -jnp.einsum("bhwc,wl->bhlc", x, sw, precision=_HIGH)
    rows = jnp.concatenate([jnp.arange(m1), jnp.arange(h - m1, h)])
    ch, sh = _dft_mats(h, rows)
    re = (jnp.einsum("bhlc,hk->bklc", tr, ch, precision=_HIGH)
          + jnp.einsum("bhlc,hk->bklc", ti, sh, precision=_HIGH))
    im = (jnp.einsum("bhlc,hk->bklc", ti, ch, precision=_HIGH)
          - jnp.einsum("bhlc,hk->bklc", tr, sh, precision=_HIGH))
    return re, im


def _trunc_irfft2(re: jnp.ndarray, im: jnp.ndarray, h: int, w: int
                  ) -> jnp.ndarray:
    """``irfft2`` of a spectrum that is zero outside the ``(2*m1, m2)`` corner
    blocks, via MXU matmuls (inverse of :func:`_trunc_rfft2`).

    Matches ``jnp.fft.irfft2`` on the zero-padded spectrum bit-for-bit-ish,
    including the C2R convention that the imaginary part of the ``l = 0``
    column is ignored (the ``sin`` table's zero row drops it).  Requires
    ``m2 <= w//2`` so no kept column is the Nyquist bin (golden-tested).
    """
    _, k2, m2, _ = re.shape
    m1 = k2 // 2
    rows = jnp.concatenate([jnp.arange(m1), jnp.arange(h - m1, h)])
    ch, sh = _dft_mats(h, rows)  # (H, 2*m1); inverse uses the transpose/+i
    tr = (jnp.einsum("bklc,hk->bhlc", re, ch, precision=_HIGH)
          - jnp.einsum("bklc,hk->bhlc", im, sh, precision=_HIGH)) / h
    ti = (jnp.einsum("bklc,hk->bhlc", im, ch, precision=_HIGH)
          + jnp.einsum("bklc,hk->bhlc", re, sh, precision=_HIGH)) / h
    cw, sw = _dft_mats(w, jnp.arange(m2))  # (W, m2)
    scale = jnp.concatenate([jnp.ones((1,)), jnp.full((m2 - 1,), 2.0)])
    return (jnp.einsum("bhlc,l,wl->bhwc", tr, scale, cw, precision=_HIGH)
            - jnp.einsum("bhlc,l,wl->bhwc", ti, scale, sw,
                         precision=_HIGH)) / w


def _trunc_rfft3(x: jnp.ndarray, m1: int, m2: int, m3: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Corner modes of ``rfftn(x, axes=(1, 2, 3))`` via MXU matmuls
    (3D analog of :func:`_trunc_rfft2`).  ``x`` is ``(B, D, H, W, C)``;
    returns ``(re, im)`` of shape ``(B, 2*m1, 2*m2, m3, C)`` — each
    frequency axis stacks its first and last ``m`` modes.
    """
    _, d, h, w, _ = x.shape
    cw, sw = _dft_mats(w, jnp.arange(m3))
    tr = jnp.einsum("bdhwc,wl->bdhlc", x, cw, precision=_HIGH)
    ti = -jnp.einsum("bdhwc,wl->bdhlc", x, sw, precision=_HIGH)
    for axis, (n, m) in ((2, (h, m2)), (1, (d, m1))):
        rows = jnp.concatenate([jnp.arange(m), jnp.arange(n - m, n)])
        cn, sn = _dft_mats(n, rows)
        eq = ("bdhlc,hk->bdklc" if axis == 2 else "bdhlc,dk->bkhlc")
        nr = (jnp.einsum(eq, tr, cn, precision=_HIGH)
              + jnp.einsum(eq, ti, sn, precision=_HIGH))
        ni = (jnp.einsum(eq, ti, cn, precision=_HIGH)
              - jnp.einsum(eq, tr, sn, precision=_HIGH))
        tr, ti = nr, ni
    return tr, ti


def _trunc_irfft3(re: jnp.ndarray, im: jnp.ndarray, d: int, h: int, w: int
                  ) -> jnp.ndarray:
    """``irfftn`` of a spectrum that is zero outside the stacked corner
    blocks (3D analog of :func:`_trunc_irfft2`; requires ``m3 <= w//2``)."""
    _, k1, k2, m3, _ = re.shape
    m1, m2 = k1 // 2, k2 // 2
    tr, ti = re, im
    for axis, (n, m) in ((1, (d, m1)), (2, (h, m2))):
        rows = jnp.concatenate([jnp.arange(m), jnp.arange(n - m, n)])
        cn, sn = _dft_mats(n, rows)
        eq = ("bkhlc,dk->bdhlc" if axis == 1 else "bdklc,hk->bdhlc")
        nr = (jnp.einsum(eq, tr, cn, precision=_HIGH)
              - jnp.einsum(eq, ti, sn, precision=_HIGH)) / n
        ni = (jnp.einsum(eq, ti, cn, precision=_HIGH)
              + jnp.einsum(eq, tr, sn, precision=_HIGH)) / n
        tr, ti = nr, ni
    cw, sw = _dft_mats(w, jnp.arange(m3))
    scale = jnp.concatenate([jnp.ones((1,)), jnp.full((m3 - 1,), 2.0)])
    return (jnp.einsum("bdhlc,l,wl->bdhwc", tr, scale, cw, precision=_HIGH)
            - jnp.einsum("bdhlc,l,wl->bdhwc", ti, scale, sw,
                         precision=_HIGH)) / w


def _mode_mix(eq: str, x_ft: jnp.ndarray, w: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Complex contraction via four real einsums.

    ``x_ft`` is a traced complex spectrum slice; ``w`` is a real-pair weight
    ``(..., 2)``.  Returns the (real, imag) parts of ``einsum(eq, x_ft, w)``.
    """
    return _mode_mix_ri(eq, jnp.real(x_ft), jnp.imag(x_ft), w)


def _mode_mix_ri(eq: str, xr: jnp.ndarray, xi: jnp.ndarray, w: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """:func:`_mode_mix` on an already-split (real, imag) spectrum.

    Fused single-einsum form: the (re, im) planes stack on the input-channel
    axis and the complex weight becomes the real 2x2 block matrix
    ``[[wr, wi], [-wi, wr]]``, so ``[re | im] = [xr | xi] @ blocks``.  The
    mode mix is a batch (over the kept modes) of tiny ``(batch, C_in, C_out)``
    matmuls — at the recipe batch size 8 only 8/128 MXU rows are live, so
    feeding ONE contraction of double width/height instead of FOUR narrow
    ones quarters the kernel count and doubles both MXU tile dims (measured
    attribution in docs/tpu_notes.md).  Numerically
    identical to the four-einsum form up to fp32 summation order: each output
    is the same sum of two products, now reduced inside one contraction.
    """
    wr, wi = w[..., 0], w[..., 1]
    wblk = jnp.concatenate([jnp.concatenate([wr, wi], axis=1),
                            jnp.concatenate([-wi, wr], axis=1)], axis=0)
    out = jnp.einsum(eq, jnp.concatenate([xr, xi], axis=-1), wblk)
    o = out.shape[-1] // 2
    return out[..., :o], out[..., o:]


class SpectralConv1d(nn.Module):
    """1D Fourier layer (``fourier.py:28-69``).  Input (B, L, C)."""

    out_channels: int
    modes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        scale = 1.0 / (in_channels * self.out_channels)
        w = self.param(
            "weights",
            lambda k, s: scale * jax.random.uniform(k, s, jnp.float32),
            (in_channels, self.out_channels, self.modes, 2))
        orig_dtype = x.dtype
        n, m = x.shape[1], self.modes
        if m <= n // 2:
            xf = x.astype(jnp.float32)
            cw, sw = _dft_mats(n, jnp.arange(m))
            xr = jnp.einsum("bwc,wl->blc", xf, cw, precision=_HIGH)
            xi = -jnp.einsum("bwc,wl->blc", xf, sw, precision=_HIGH)
            re, im = _mode_mix_ri("bxi,iox->bxo", xr, xi, w)
            scale = jnp.concatenate([jnp.ones((1,)), jnp.full((m - 1,), 2.0)])
            y = (jnp.einsum("blc,l,wl->bwc", re, scale, cw, precision=_HIGH)
                 - jnp.einsum("blc,l,wl->bwc", im, scale, sw,
                              precision=_HIGH)) / n
            return y.astype(orig_dtype)
        x_ft = jnp.fft.rfft(x.astype(jnp.float32), axis=1)
        re, im = _mode_mix("bxi,iox->bxo", x_ft[:, :self.modes, :], w)
        full = (x.shape[0], x.shape[1] // 2 + 1, self.out_channels)
        re_f = jnp.zeros(full, jnp.float32).at[:, :self.modes, :].set(re)
        im_f = jnp.zeros(full, jnp.float32).at[:, :self.modes, :].set(im)
        y = jnp.fft.irfft(jax.lax.complex(re_f, im_f), n=x.shape[1], axis=1)
        return y.astype(orig_dtype)


class SpectralConv2d(nn.Module):
    """2D Fourier layer (``fourier.py:72-122``).  Input (B, H, W, C).

    Keeps ``modes1`` frequencies on the (pos and neg) H axis and ``modes2`` on
    the half-spectrum W axis, with separate weights for the positive- and
    negative-H corners, exactly as the reference.
    """

    out_channels: int
    modes1: int
    modes2: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        scale = 1.0 / (in_channels * self.out_channels)
        shape = (in_channels, self.out_channels, self.modes1, self.modes2, 2)
        w1 = self.param(
            "weights1", lambda k, s: scale * jax.random.uniform(k, s, jnp.float32),
            shape)
        w2 = self.param(
            "weights2", lambda k, s: scale * jax.random.uniform(k, s, jnp.float32),
            shape)
        orig_dtype = x.dtype
        b, h, w, _ = x.shape
        m1, m2 = self.modes1, self.modes2
        if _use_dft_matmul(h, w, m1, m2):
            xr, xi = _trunc_rfft2(x.astype(jnp.float32), m1, m2)
            # both H-corners in ONE fused mode mix: the corner weights just
            # concatenate along the (batched) mode-x axis
            re, im = _mode_mix_ri("bxyi,ioxy->bxyo", xr, xi,
                                  jnp.concatenate([w1, w2], axis=2))
            y = _trunc_irfft2(re, im, h, w)
            return y.astype(orig_dtype)
        x_ft = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))
        tr, ti = _mode_mix("bxyi,ioxy->bxyo", x_ft[:, :m1, :m2, :], w1)
        br, bi = _mode_mix("bxyi,ioxy->bxyo", x_ft[:, -m1:, :m2, :], w2)
        full = (b, h, w // 2 + 1, self.out_channels)
        re_f = (jnp.zeros(full, jnp.float32)
                .at[:, :m1, :m2, :].set(tr).at[:, -m1:, :m2, :].set(br))
        im_f = (jnp.zeros(full, jnp.float32)
                .at[:, :m1, :m2, :].set(ti).at[:, -m1:, :m2, :].set(bi))
        y = jnp.fft.irfft2(jax.lax.complex(re_f, im_f), s=(h, w), axes=(1, 2))
        return y.astype(orig_dtype)


class SpectralConv3d(nn.Module):
    """3D Fourier layer (``fourier.py:125-190``).  Input (B, D, H, W, C)."""

    out_channels: int
    modes1: int
    modes2: int
    modes3: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        scale = 1.0 / (in_channels * self.out_channels)
        shape = (in_channels, self.out_channels,
                 self.modes1, self.modes2, self.modes3, 2)
        ws = [self.param(
            f"weights{i+1}",
            lambda k, s: scale * jax.random.uniform(k, s, jnp.float32), shape)
            for i in range(4)]
        orig_dtype = x.dtype
        b, d, h, w, _ = x.shape
        m1, m2, m3 = self.modes1, self.modes2, self.modes3
        if 2 * m1 <= d and 2 * m2 <= h and m3 <= w // 2:
            xr, xi = _trunc_rfft3(x.astype(jnp.float32), m1, m2, m3)
            # all four (x-half, y-half) corners in ONE fused mode mix: the
            # per-corner weights tile the (2*m1, 2*m2) mode grid — reference
            # corner order is (x0,y0)=w1, (x1,y0)=w2, (x0,y1)=w3, (x1,y1)=w4
            w_grid = jnp.concatenate(
                [jnp.concatenate([ws[0], ws[2]], axis=3),
                 jnp.concatenate([ws[1], ws[3]], axis=3)], axis=2)
            rr, ii = _mode_mix_ri("bxyzi,ioxyz->bxyzo", xr, xi, w_grid)
            y = _trunc_irfft3(rr, ii, d, h, w)
            return y.astype(orig_dtype)
        x_ft = jnp.fft.rfftn(x.astype(jnp.float32), axes=(1, 2, 3))
        full = (b, d, h, w // 2 + 1, self.out_channels)
        re_f = jnp.zeros(full, jnp.float32)
        im_f = jnp.zeros(full, jnp.float32)
        corners = [
            (slice(None, m1), slice(None, m2)),
            (slice(-m1, None), slice(None, m2)),
            (slice(None, m1), slice(-m2, None)),
            (slice(-m1, None), slice(-m2, None)),
        ]
        for wgt, (s1, s2) in zip(ws, corners):
            re, im = _mode_mix("bxyzi,ioxyz->bxyzo",
                               x_ft[:, s1, s2, :m3, :], wgt)
            re_f = re_f.at[:, s1, s2, :m3, :].set(re)
            im_f = im_f.at[:, s1, s2, :m3, :].set(im)
        y = jnp.fft.irfftn(jax.lax.complex(re_f, im_f), s=(d, h, w),
                           axes=(1, 2, 3))
        return y.astype(orig_dtype)


class CondSpectralConv2d(nn.Module):
    """Conditioned 2D Fourier layer (``conditioned/fourier_cond.py:13-80``):
    a ``FreqLinear`` embedding produces a per-mode complex scaling applied to
    the truncated spectrum before mode mixing."""

    out_channels: int
    modes1: int
    modes2: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        cond_channels = emb.shape[-1]
        m1, m2 = self.modes1, self.modes2
        scale = 1.0 / (in_channels * self.out_channels)
        wshape = (in_channels, self.out_channels, m1, m2, 2)
        w1 = self.param("weights1",
                        lambda k, s: scale * jax.random.uniform(k, s), wshape)
        w2 = self.param("weights2",
                        lambda k, s: scale * jax.random.uniform(k, s), wshape)
        # FreqLinear: emb -> (B, m1, m2, 2 complex) per corner
        fscale = 1.0 / (cond_channels + 4 * m1 * m2)
        fw = self.param("freq_weights",
                        lambda k, s: fscale * jax.random.normal(k, s),
                        (cond_channels, 4 * m1 * m2))
        fb = self.param("freq_bias", nn.initializers.zeros, (4 * m1 * m2,))
        h = (emb.astype(jnp.float32) @ fw + fb).reshape(
            emb.shape[0], m1, m2, 2, 2)
        # traced complex (from the traced embedding) — never eager
        emb_c = jax.lax.complex(h[..., 0], h[..., 1])  # (B, m1, m2, 2)

        orig_dtype = x.dtype
        b, hh, ww, _ = x.shape
        if _use_dft_matmul(hh, ww, m1, m2):
            xr, xi = _trunc_rfft2(x.astype(jnp.float32), m1, m2)
            er, ei = h[..., 0], h[..., 1]  # (B, m1, m2, corner)
            # per-corner embedding scaling of the spectrum, then both corners
            # in ONE fused mode mix (weights concatenated on the mode-x axis)
            cr = jnp.concatenate([er[..., 0], er[..., 1]], axis=1)[..., None]
            ci = jnp.concatenate([ei[..., 0], ei[..., 1]], axis=1)[..., None]
            sr = xr * cr - xi * ci
            si = xr * ci + xi * cr
            re, im = _mode_mix_ri("bxyi,ioxy->bxyo", sr, si,
                                  jnp.concatenate([w1, w2], axis=2))
            y = _trunc_irfft2(re, im, hh, ww)
            return y.astype(orig_dtype)
        x_ft = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))
        top = x_ft[:, :m1, :m2, :] * emb_c[..., 0][:, :, :, None]
        bot = x_ft[:, -m1:, :m2, :] * emb_c[..., 1][:, :, :, None]
        tr, ti = _mode_mix("bxyi,ioxy->bxyo", top, w1)
        br, bi = _mode_mix("bxyi,ioxy->bxyo", bot, w2)
        full = (b, hh, ww // 2 + 1, self.out_channels)
        re_f = (jnp.zeros(full, jnp.float32)
                .at[:, :m1, :m2, :].set(tr).at[:, -m1:, :m2, :].set(br))
        im_f = (jnp.zeros(full, jnp.float32)
                .at[:, :m1, :m2, :].set(ti).at[:, -m1:, :m2, :].set(bi))
        y = jnp.fft.irfft2(jax.lax.complex(re_f, im_f), s=(hh, ww),
                           axes=(1, 2))
        return y.astype(orig_dtype)


class SpectralConv2dUno(nn.Module):
    """UNO spectral conv with output-grid resizing and 'forward' FFT norm
    (``twod_uno.py:39-114``).  Input (B, H, W, C) -> (B, dim1, dim2, C_out)."""

    out_channels: int
    dim1: int
    dim2: int
    modes1: Optional[int] = None
    modes2: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, dim1: Optional[int] = None,
                 dim2: Optional[int] = None) -> jnp.ndarray:
        d1 = dim1 if dim1 is not None else self.dim1
        d2 = dim2 if dim2 is not None else self.dim2
        m1 = self.modes1 if self.modes1 is not None else self.dim1 // 2 - 1
        m2 = self.modes2 if self.modes2 is not None else self.dim2 // 2
        in_channels = x.shape[-1]
        scale = (1.0 / (2.0 * in_channels)) ** 0.5
        shape = (in_channels, self.out_channels, m1, m2, 2)
        w1 = self.param("weights1",
                        lambda k, s: scale * jax.random.normal(k, s, jnp.float32),
                        shape)
        w2 = self.param("weights2",
                        lambda k, s: scale * jax.random.normal(k, s, jnp.float32),
                        shape)
        orig_dtype = x.dtype
        b, h, w, _ = x.shape
        # 'forward'-normalized FFT pair, expressed as real-side rescalings of
        # the default-normalized transforms: norm="forward" itself multiplies
        # the complex spectrum by a *complex scalar constant*, which (eagerly,
        # e.g. under flax init) requires a complex host->device constant
        # upload — unimplemented on tunneled TPU backends (see module
        # docstring).  rfft_fwd(x) = rfft(x)/(h*w); irfft_fwd(z) = irfft(z)*N.
        if _use_dft_matmul(h, w, m1, m2) and _use_dft_matmul(d1, d2, m1, m2):
            xr, xi = _trunc_rfft2(x.astype(jnp.float32) / (h * w), m1, m2)
            re, im = _mode_mix_ri("bxyi,ioxy->bxyo", xr, xi,
                                  jnp.concatenate([w1, w2], axis=2))
            y = _trunc_irfft2(re, im, d1, d2) * (d1 * d2)
            return y.astype(orig_dtype)
        x_ft = jnp.fft.rfft2(x.astype(jnp.float32) / (h * w), axes=(1, 2))
        tr, ti = _mode_mix("bxyi,ioxy->bxyo", x_ft[:, :m1, :m2, :], w1)
        br, bi = _mode_mix("bxyi,ioxy->bxyo", x_ft[:, -m1:, :m2, :], w2)
        full = (b, d1, d2 // 2 + 1, self.out_channels)
        re_f = (jnp.zeros(full, jnp.float32)
                .at[:, :m1, :m2, :].set(tr).at[:, -m1:, :m2, :].set(br))
        im_f = (jnp.zeros(full, jnp.float32)
                .at[:, :m1, :m2, :].set(ti).at[:, -m1:, :m2, :].set(bi))
        y = jnp.fft.irfft2(jax.lax.complex(re_f, im_f), s=(d1, d2),
                           axes=(1, 2)) * (d1 * d2)
        return y.astype(orig_dtype)
