"""Tests for the JAX Navier-Stokes data generator."""
import numpy as np
import jax
import pytest

from unet_design_tpu.datagen import navier_stokes as ns
from unet_design_tpu.datagen.pde_configs import NavierStokes2D


def small_pde():
    return NavierStokes2D(nx=16, ny=16, nt=6, skip_nt=2, sample_rate=1,
                          nu=0.05)


def test_simulate_trajectory_shapes_and_stability():
    pde = small_pde()
    u, vx, vy = ns.simulate_trajectory(jax.random.PRNGKey(0), pde)
    assert u.shape == (6, 16, 16)
    assert np.isfinite(np.asarray(u)).all()
    assert np.isfinite(np.asarray(vx)).all()
    # smoke stays nonnegative-ish under advection of a nonneg field
    assert float(np.asarray(u).min()) > -1.0


def test_divergence_free_projection():
    pde = small_pde()
    _, vx, vy = ns.simulate_trajectory(jax.random.PRNGKey(1), pde)
    vx0, vy0 = np.asarray(vx)[-1], np.asarray(vy)[-1]
    # spectral divergence should be ~0
    kx = np.fft.fftfreq(16)[:, None] * 2 * np.pi
    ky = np.fft.fftfreq(16)[None, :] * 2 * np.pi
    div = kx * np.fft.fft2(vx0) + ky * np.fft.fft2(vy0)
    assert np.abs(div).max() < 1e-3 * max(np.abs(vx0).max(), 1.0)


def test_generate_and_reload_h5(tmp_path):
    h5py = pytest.importorskip("h5py")
    pde = small_pde()
    path = ns.generate_trajectories_smoke(pde, "train", num_samples=3,
                                          batch_size=2,
                                          dirname=str(tmp_path), seed=1)
    from unet_design_tpu.data.pde import NavierStokesOpener, PDEDataConfig
    opener = NavierStokesOpener([path], "train")
    trajs = list(opener)
    assert len(trajs) == 3
    u, v, cond = trajs[0]
    assert u.shape == (6, 16, 16, 1) and v.shape == (6, 16, 16, 2)
    stats = ns.compute_normalization([path], "train")
    assert set(stats) == {"u_mean", "u_std", "vx_mean", "vx_std",
                          "vy_mean", "vy_std"}
