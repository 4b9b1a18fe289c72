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


def test_matmul_spectral_step_matches_fft_path():
    """The fused matmul-DFT diffuse+project must equal the separate
    FFT-based _diffuse + _project to float tolerance."""
    rng = np.random.default_rng(0)
    vx = jax.numpy.asarray(rng.standard_normal((16, 16)).astype(np.float32))
    vy = jax.numpy.asarray(rng.standard_normal((16, 16)).astype(np.float32))
    nu, dt = 0.05, 0.3

    @jax.jit
    def fused(vx, vy):
        basis = ns._spectral_basis(16, 16)
        return ns._diffuse_project_mm(vx, vy, nu, dt, basis)

    @jax.jit
    def reference(vx, vy):
        return ns._project(ns._diffuse(vx, nu, dt), ns._diffuse(vy, nu, dt))

    fx, fy = fused(vx, vy)
    rx, ry = reference(vx, vy)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(rx),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fy), np.asarray(ry),
                               atol=2e-5, rtol=1e-4)


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


class TestMaxwell:
    def _pde(self):
        from unet_design_tpu.datagen.pde_configs import Maxwell3D
        return Maxwell3D(nx=8, ny=8, nz=8, nt=3, skip_nt=4, sample_rate=2)

    def test_trajectory_shapes_finite_nonzero(self):
        import jax.numpy as jnp
        from unet_design_tpu.datagen import maxwell
        pde = self._pde()
        srcs = maxwell.sample_sources(np.random.RandomState(0), pde)
        d, h = maxwell.simulate_trajectory(
            tuple(jnp.asarray(s) for s in srcs), pde)
        assert d.shape == (3, 8, 8, 8, 3) and h.shape == (3, 8, 8, 8, 3)
        assert np.isfinite(np.asarray(d)).all()
        assert np.abs(np.asarray(d)).max() > 0
        assert np.abs(np.asarray(h)).max() > 0

    def test_div_h_invariant(self):
        """The Yee curl structure keeps div(H) = 0 exactly (periodic)."""
        import jax.numpy as jnp
        from unet_design_tpu.datagen import maxwell
        pde = self._pde()
        masks, polar, periods, phases = (
            jnp.asarray(s) for s in maxwell.sample_sources(
                np.random.RandomState(1), pde))
        n = pde.n_large
        E = jnp.zeros((n, n, n, 3))
        H = jnp.zeros((n, n, n, 3))
        c = maxwell._courant()
        for t in range(15):
            vals = jnp.sin(2 * jnp.pi * t / periods + phases)
            src = jnp.einsum("s,sxyz,sc->xyzc", vals, masks, polar)
            E = E + c / pde.permittivity * maxwell._curl_H(H) + src
            H = H - c / pde.permeability * maxwell._curl_E(E)
        div = sum(jnp.roll(H[..., a], -1, axis=a) - H[..., a]
                  for a in range(3))
        scale = max(1.0, float(jnp.abs(H).max()))
        assert float(jnp.abs(div).max()) < 1e-5 * scale

    def test_generate_h5_schema(self, tmp_path):
        pytest.importorskip("h5py")
        import h5py
        from unet_design_tpu.datagen import maxwell
        pde = self._pde()
        path = maxwell.generate_trajectories_maxwell(
            pde, "valid", num_samples=2, batch_size=2,
            dirname=str(tmp_path), seed=3)
        with h5py.File(path, "r") as f:
            assert f["valid"]["d_field"].shape == (2, 3, 8, 8, 8, 3)
            assert f["valid"]["h_field"].shape == (2, 3, 8, 8, 8, 3)
            assert np.isfinite(f["valid"]["d_field"][:]).all()


class TestShallowWater:
    def _pde(self):
        from unet_design_tpu.datagen.pde_configs import ShallowWaterWeather
        return ShallowWaterWeather(nt=4, nx=24, ny=48)

    def test_trajectory_stable_and_turbulent(self):
        from unet_design_tpu.datagen import shallow_water as sw
        vor, u, v = sw.simulate_trajectory(jax.random.PRNGKey(0),
                                           self._pde())
        vor = np.asarray(vor)
        assert vor.shape == (4, 24, 48)
        assert np.isfinite(vor).all()
        # the flow neither dies nor blows up over the trajectory
        assert 0.2 * vor[0].std() < vor[-1].std() < 5 * vor[0].std()

    def test_generate_npz_opener_roundtrip(self, tmp_path):
        from unet_design_tpu.datagen import shallow_water as sw
        from unet_design_tpu.data.pde import ShallowWaterOpener
        paths = sw.generate_trajectories_shallowwater(
            self._pde(), "train", num_samples=2, batch_size=2,
            dirname=str(tmp_path), seed=0)
        assert len(paths) == 2
        listed = ShallowWaterOpener.list_files(str(tmp_path), "train")
        assert [str(p) for p in paths] == listed
        trajs = list(ShallowWaterOpener(listed, "train"))
        u, v, cond = trajs[0]
        assert u.shape == (4, 24, 48, 1) and v.shape == (4, 24, 48, 2)
        stats = np.load(tmp_path / "normstats.npz")
        assert stats["vor_std"] > 0

    def test_opener_2day_subsampling(self, tmp_path):
        """The 2-day task reads ``[4::8]`` of the stored frames
        (``shallowwater2d.py:103-109`` via ``ShallowWaterDatasetOpener2Day``
        ``:124-132``); 88 stored frames must become the reference's
        trajlen=11, and ``sample_rate=1`` must leave frames untouched."""
        from unet_design_tpu.data.pde import ShallowWaterOpener
        u = np.arange(88, dtype=np.float32)[:, None, None, None]
        u = np.broadcast_to(u, (88, 6, 12, 1)).copy()
        v = np.broadcast_to(u, (88, 6, 12, 2)).copy()
        np.savez(tmp_path / "train_seed0.npz", u=u, v=v)
        listed = ShallowWaterOpener.list_files(str(tmp_path), "train")
        (us, vs, _), = list(ShallowWaterOpener(listed, "train",
                                               skip_nt=4, sample_rate=8))
        assert us.shape == (11, 6, 12, 1) and vs.shape == (11, 6, 12, 2)
        np.testing.assert_array_equal(us[:, 0, 0, 0],
                                      np.arange(4, 88, 8, dtype=np.float32))
        # sample_rate=1: no slicing at all (reference applies the skip_nt
        # offset only inside the sample_rate > 1 branch)
        (uf, _, _), = list(ShallowWaterOpener(listed, "train",
                                              skip_nt=4, sample_rate=1))
        assert uf.shape == (88, 6, 12, 1)

    def test_splits_disjoint_under_same_seed(self, tmp_path):
        """Same base seed across modes must give different trajectories.

        Guards the mode-fold in the generator RNG: without it, valid/test
        regenerate the leading train trajectories (split leakage)."""
        from unet_design_tpu.datagen import shallow_water as sw
        out = {}
        for mode in ("train", "valid", "test"):
            sw.generate_trajectories_shallowwater(
                self._pde(), mode, num_samples=1, batch_size=1,
                dirname=str(tmp_path / mode), seed=7)
            out[mode] = np.load(tmp_path / mode / f"{mode}_seed0.npz")["u"]
        assert not np.allclose(out["train"], out["valid"])
        assert not np.allclose(out["train"], out["test"])
        assert not np.allclose(out["valid"], out["test"])

    def test_valid_mode_does_not_clobber_train_normstats(self, tmp_path):
        from unet_design_tpu.datagen import shallow_water as sw
        from unet_design_tpu.data.pde import ShallowWaterOpener
        sw.generate_trajectories_shallowwater(
            self._pde(), "train", num_samples=1, batch_size=1,
            dirname=str(tmp_path), seed=0)
        stats_before = dict(np.load(tmp_path / "normstats.npz"))
        sw.generate_trajectories_shallowwater(
            self._pde(), "valid", num_samples=1, batch_size=1,
            dirname=str(tmp_path), seed=99)
        stats_after = dict(np.load(tmp_path / "normstats.npz"))
        assert stats_before["vor_std"] == stats_after["vor_std"]
        # opener standardizes the vorticity channel with the train stats
        (u, _, _), = list(ShallowWaterOpener(
            ShallowWaterOpener.list_files(str(tmp_path), "train"), "train"))
        assert abs(float(u.std()) - 1.0) < 0.2
