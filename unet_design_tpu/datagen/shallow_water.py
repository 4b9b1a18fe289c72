"""JAX-native rotating shallow-water data generation.

Replaces the reference's Julia SpeedyWeather spherical solver
(``pdearena/pdedatagen/shallowwater/datagen.jl:1-17``; T62, 20 model days,
random vorticity initial conditions) with an on-device spectral solver.
Documented deviation: the sphere is replaced by a doubly-periodic f-plane —
the spherical-harmonic transform has no efficient XLA mapping, while a
periodic FFT pseudo-spectral method runs entirely on the MXU/VPU; the
generated fields have the same shape, variables (vorticity + wind vector),
turbulent geostrophic character, and file schema consumed by
``unet_design_tpu.data.pde.ShallowWaterOpener``.

Formulation: vorticity/divergence/height pseudo-spectral shallow water,
vector-invariant tendencies, RK4 time stepping, 2/3 dealiasing, ∇⁴
hyperviscosity, geostrophically balanced random initial vorticity.  One
trajectory is a single ``lax.scan`` (frames) over ``fori_loop`` substeps;
batches of trajectories are ``vmap``-ed.

Output: per-trajectory ``.npz`` with ``u`` = raw vorticity
``(nt, ny, nx, 1)`` and ``v`` = winds ``(nt, ny, nx, 2)`` (the
ShallowWaterOpener npz schema).  For ``mode='train'`` the train-set
``normstats.npz`` is also written (``scripts/compute_normalization.py:14-96``
analog); the opener applies it at load for every mode, mirroring the
reference's zarr+normstats path (``datapipes/shallowwater2d.py:96-118``).
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from unet_design_tpu.datagen.pde_configs import ShallowWaterWeather

# Nondimensional physical parameters: gravity-wave speed c = sqrt(g*H) = 1,
# Coriolis f chosen for Rossby deformation radius ~ 1/20 of the domain, i.e.
# a weather-like scale separation between gravity waves and balanced flow.
_G = 1.0
_HMEAN = 1.0
_F0 = 2.0 * jnp.pi  # L_d = sqrt(gH)/f ~ Lx/25 with Lx=4: weather-like scales
_ROSSBY = 0.3
_NU4 = 5e-9
_T_END = 8.0  # model time units spanned by the saved frames


def _wavenumbers(ny: int, nx: int, ly: float, lx: float):
    ky = jnp.fft.fftfreq(ny, d=ly / ny) * 2 * jnp.pi
    kx = jnp.fft.rfftfreq(nx, d=lx / nx) * 2 * jnp.pi
    return ky[:, None], kx[None, :]


def _dealias_mask(ny: int, nx: int):
    fy = jnp.abs(jnp.fft.fftfreq(ny) * ny)
    fx = jnp.fft.rfftfreq(nx) * nx
    return ((fy[:, None] <= ny // 3) & (fx[None, :] <= nx // 3))


@partial(jax.jit, static_argnames=("pde",))
def simulate_trajectory(rng: jax.Array, pde: ShallowWaterWeather):
    """One shallow-water trajectory.

    Returns ``(vor, u, v)`` each of shape ``(pde.nt, pde.nx, pde.ny)``
    (nx=96 is the latitude-like axis, ny=192 longitude-like, matching the
    SpeedyWeather T62 grid layout in ``ShallowWaterWeather``).
    """
    ny, nx = pde.nx, pde.ny  # (96, 192) grid rows/cols
    ly, lx = 2.0, 4.0        # 1:2 aspect like the lat-lon grid
    ky, kx = _wavenumbers(ny, nx, ly, lx)
    k2 = ky ** 2 + kx ** 2
    inv_k2 = jnp.where(k2 == 0, 0.0, 1.0 / jnp.where(k2 == 0, 1.0, k2))
    mask = _dealias_mask(ny, nx)

    def to_grid(fh):
        return jnp.fft.irfft2(fh, s=(ny, nx))

    def to_spec(f):
        return jnp.fft.rfft2(f)

    def velocities(zh, dh):
        psih = -zh * inv_k2
        chih = -dh * inv_k2
        uh = -1j * ky * psih + 1j * kx * chih
        vh = 1j * kx * psih + 1j * ky * chih
        return to_grid(uh), to_grid(vh)

    def tendencies(state):
        zh, dh, hh = state
        u, v = velocities(zh, dh)
        z = to_grid(zh)
        h = to_grid(hh)
        qa, qb = u * (z + _F0), v * (z + _F0)
        e = 0.5 * (u * u + v * v)
        qah, qbh = to_spec(qa), to_spec(qb)
        dz = -(1j * kx * qah + 1j * ky * qbh)
        dd = (1j * kx * qbh - 1j * ky * qah) + k2 * (to_spec(e) + _G * hh)
        flux_u, flux_v = to_spec(h * u), to_spec(h * v)
        dhh = -(1j * kx * flux_u + 1j * ky * flux_v)
        hyper = _NU4 * k2 * k2
        return ((dz - hyper * zh) * mask, (dd - hyper * dh) * mask,
                (dhh - hyper * (hh - to_spec(jnp.full_like(h, _HMEAN))))
                * mask)

    def rk4(state, dt):
        k1 = tendencies(state)
        k2_ = tendencies(tuple(s + 0.5 * dt * k for s, k in zip(state, k1)))
        k3 = tendencies(tuple(s + 0.5 * dt * k for s, k in zip(state, k2_)))
        k4 = tendencies(tuple(s + dt * k for s, k in zip(state, k3)))
        return tuple(s + dt / 6 * (a + 2 * b + 2 * c + d)
                     for s, a, b, c, d in zip(state, k1, k2_, k3, k4))

    # Random band-limited vorticity, geostrophically balanced height.
    r1, r2 = jax.random.split(rng)
    spec = (jax.random.normal(r1, k2.shape)
            + 1j * jax.random.normal(r2, k2.shape))
    kmag = jnp.sqrt(k2)
    k0 = 2 * jnp.pi / lx * 6.0  # energy peak at zonal wavenumber ~6
    amp = kmag ** 2 * jnp.exp(-((kmag / k0) ** 2))
    zh = spec * amp * mask
    z0 = to_grid(zh)
    zh = to_spec(_ROSSBY * _F0 * z0 / (jnp.std(z0) + 1e-12))
    hh = -(_F0 / _G) * zh * inv_k2 + to_spec(
        jnp.full((ny, nx), _HMEAN))
    dh = jnp.zeros_like(zh)

    # CFL: gravity waves at c=1 plus rotation, against the FINER of the two
    # grid spacings (a user-overridden aspect ratio must not go unstable).
    dt = 0.25 * min(lx / nx, ly / ny) / (1.0 + 0.5)
    substeps = max(math.ceil(_T_END / pde.nt / dt), 1)
    dt = _T_END / pde.nt / substeps

    def frame(state, _):
        state = jax.lax.fori_loop(0, substeps, lambda i, s: rk4(s, dt),
                                  state)
        zh, dh_, hh_ = state
        u, v = velocities(zh, dh_)
        return state, (to_grid(zh), u, v)

    _, (vor, u, v) = jax.lax.scan(frame, (zh, dh, hh), None,
                                  length=pde.nt)
    return vor, u, v


def generate_trajectories_shallowwater(pde: ShallowWaterWeather, mode: str,
                                       num_samples: int, batch_size: int = 4,
                                       dirname: str = "data",
                                       seed: int = 42):
    """Generate + save trajectories as ``{mode}_seed{idx}.npz`` files in the
    ``ShallowWaterOpener`` npz schema, plus ``normstats.npz``.

    The RNG stream folds in ``mode`` so train/valid/test generated with the
    same base ``seed`` are disjoint (the reference gets this for free from
    per-split Julia runs; filename-only mode handling would silently leak
    train trajectories into valid/test).
    """
    os.makedirs(dirname, exist_ok=True)
    sim_batch = jax.jit(jax.vmap(lambda r: simulate_trajectory(r, pde)))
    base = jax.random.fold_in(jax.random.PRNGKey(seed),
                              {"train": 0, "valid": 1, "test": 2}[mode])
    paths = []
    vor_sum, vor_sq, count = 0.0, 0.0, 0
    for start in range(0, num_samples, batch_size):
        b = min(batch_size, num_samples - start)
        rngs = jax.vmap(jax.random.fold_in, (None, 0))(
            base, jnp.arange(start, start + b))
        vor, u, v = (np.asarray(x) for x in sim_batch(rngs))
        vor_sum += vor.sum()
        vor_sq += (vor.astype(np.float64) ** 2).sum()
        count += vor.size
        for i in range(b):
            path = os.path.join(dirname, f"{mode}_seed{start + i}.npz")
            np.savez(path,
                     u=vor[i][..., None].astype(np.float32),
                     v=np.stack([u[i], v[i]], axis=-1).astype(np.float32))
            paths.append(path)
    if mode == "train":  # valid/test must use the train stats, not their own
        mean = vor_sum / count
        std = float(np.sqrt(vor_sq / count - mean ** 2))
        np.savez(os.path.join(dirname, "normstats.npz"),
                 vor_mean=np.float32(mean), vor_std=np.float32(std))
    return paths
