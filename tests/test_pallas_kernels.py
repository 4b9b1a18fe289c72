"""Pallas kernels vs reference implementations (interpret mode on CPU)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from unet_design_tpu.ops import wavelet
from unet_design_tpu.ops.pallas import haar as haar_pl

RNG = jax.random.PRNGKey(0)


def test_haar_pyramid_fused_matches_wavelet():
    x = jax.random.normal(RNG, (2, 16, 16, 3))
    ref = wavelet.dwt_pyramid(x, 3)
    out = haar_pl.haar_pyramid_fused(x, 3, interpret=True)
    assert len(out) == 3
    for a, b_ in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


def test_multires_targets_traj_fused_pyramid():
    """The integrated path (tasks/pde.py train.use_pallas_haar): the fused
    pyramid must be a drop-in for dwt_pyramid in the multi-res targets."""
    y = jax.random.normal(RNG, (2, 1, 32, 32, 3))
    ref = wavelet.multires_targets_traj(y, n_levels=4, n_downsample=0)
    out = wavelet.multires_targets_traj(
        y, n_levels=4, n_downsample=0,
        pyramid_fn=functools.partial(haar_pl.haar_pyramid_fused,
                                     interpret=True))
    assert len(out) == len(ref) == 4
    for a, b_ in zip(out, ref):
        assert a.shape == b_.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


def test_multires_targets_traj_fused_with_downsample():
    y = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 32, 32, 2))
    ref = wavelet.multires_targets_traj(y, n_levels=4, n_downsample=1)
    out = wavelet.multires_targets_traj(
        y, n_levels=4, n_downsample=1,
        pyramid_fn=functools.partial(haar_pl.haar_pyramid_fused,
                                     interpret=True))
    for a, b_ in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
