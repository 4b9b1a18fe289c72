"""JAX-native Maxwell 3D FDTD data generation.

Replaces the reference's ``fdtd``-package CPU simulation
(``pdearena/pdedatagen/maxwell.py:18-171``) with an on-device Yee-grid
leapfrog solver: periodic boundaries on all axes, randomized plane sources
(18 per trajectory, 6 per plane orientation, mirroring the placement
distributions at ``maxwell.py:81-136``), uniform permittivity/permeability.
The whole trajectory is nested ``lax.scan``/``fori_loop`` and batches of
trajectories are ``vmap``-ed, so generation runs at TPU speed.

Update equations follow the fdtd library's dimensionless form
(``fdtd/grid.py``): ``E += c/eps * curl_H`` then ``H -= c/mu * curl_E`` with
courant number ``0.99 / sqrt(3)``.  Documented deviation: sources are *soft*
(additive) rather than the fdtd library's hard-set plane sources — soft
sources are the standard FDTD choice and keep the update branch-free.

Output matches the reference HDF5 schema (``maxwell.py:43-62``): group per
mode with datasets ``d_field`` / ``h_field`` of shape
``(num_samples, nt, n, n, n, 3)`` holding the interior crop of E and H.
"""

from __future__ import annotations

import math
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from unet_design_tpu.datagen.pde_configs import Maxwell3D

_N_SOURCES = 18  # 6 per plane orientation (maxwell.py:81,100,119)


def _curl_E(E: jnp.ndarray) -> jnp.ndarray:
    """Dimensionless curl on the Yee grid, periodic (forward differences)."""

    def d(f, axis):
        return jnp.roll(f, -1, axis=axis) - f

    cx = d(E[..., 2], 1) - d(E[..., 1], 2)
    cy = d(E[..., 0], 2) - d(E[..., 2], 0)
    cz = d(E[..., 1], 0) - d(E[..., 0], 1)
    return jnp.stack([cx, cy, cz], axis=-1)


def _curl_H(H: jnp.ndarray) -> jnp.ndarray:
    """Dimensionless curl on the dual grid, periodic (backward differences)."""

    def d(f, axis):
        return f - jnp.roll(f, 1, axis=axis)

    cx = d(H[..., 2], 1) - d(H[..., 1], 2)
    cy = d(H[..., 0], 2) - d(H[..., 2], 0)
    cz = d(H[..., 1], 0) - d(H[..., 0], 1)
    return jnp.stack([cx, cy, cz], axis=-1)


def sample_sources(rng: np.random.RandomState, pde: Maxwell3D):
    """Randomized plane sources, one trajectory.

    Mirrors the reference's placement/parameter distributions
    (``maxwell.py:81-136``): per orientation six rectangular patches with
    side lengths U{2..5}, positions confined to the low-index corner region,
    random amplitude, phase, polarization (one of the two in-plane axes),
    and period ``wavelength/c * U[1e-3, 1e3]`` seconds.

    Returns (masks, polarization one-hots, periods-in-steps, phases), with
    ``masks`` of shape ``(18, n_large, n_large, n_large)``.
    """
    n = pde.nx  # interior size (32)
    n_large = pde.n_large
    outer = (n_large - n) // 2
    time_step = _courant() * pde.grid_spacing / pde.sol

    masks = np.zeros((_N_SOURCES, n_large, n_large, n_large), np.float32)
    polar = np.zeros((_N_SOURCES, 3), np.float32)
    periods = np.zeros((_N_SOURCES,), np.float32)
    phases = np.zeros((_N_SOURCES,), np.float32)
    idx = 0
    # The reference hardcodes its corner-region bound to 16 == outer for the
    # production n=32/n_large=64 geometry; use ``outer`` so small test grids
    # place sources consistently.
    bound = outer
    for orient in range(3):  # xy, xz, yz planes (maxwell.py:81,100,119)
        for _ in range(6):
            la = min(rng.randint(2, 6), bound - 1)
            lb = min(rng.randint(2, 6), bound - 1)
            if orient == 0:
                sa = rng.randint(0, bound - la)
                sb = rng.randint(0, bound - lb)
                pt = rng.randint(0, bound)
                sl = (slice(sa, sa + la), slice(sb, sb + lb), pt)
                axes = (0, 1)
            elif orient == 1:
                sa = rng.randint(0, bound - la)
                pt = rng.randint(0, bound)
                sb = rng.randint(0, bound - lb)
                sl = (slice(sa, sa + la), pt, slice(sb, sb + lb))
                axes = (0, 2)
            else:
                pt = rng.randint(0, bound)
                sa = rng.randint(0, bound - la)
                sb = rng.randint(0, bound - lb)
                sl = (pt, slice(sa, sa + la), slice(sb, sb + lb))
                axes = (1, 2)
            ampl = rng.rand() * pde.amplitude
            masks[idx][sl] = ampl
            polar[idx, axes[rng.randint(0, 2)]] = 1.0
            period_sec = pde.wavelength / pde.sol * rng.uniform(1e-3, 1e3)
            periods[idx] = period_sec / time_step
            phases[idx] = rng.uniform(0.0, 2 * math.pi)
            idx += 1
    return masks, polar, periods, phases


def _courant() -> float:
    return 0.99 / math.sqrt(3.0)


@partial(jax.jit, static_argnames=("pde",))
def simulate_trajectory(sources, pde: Maxwell3D):
    """One Maxwell trajectory from precomputed source parameters.

    Returns (d_field, h_field), each ``(trajlen_frames, n, n, n, 3)`` where
    frames = ``pde.nt`` sampled every ``pde.sample_rate`` steps after a
    ``pde.skip_nt``-step spin-up (``maxwell.py:139-143`` protocol).
    """
    masks, polar, periods, phases = sources
    assert pde.nx == pde.ny == pde.nz, (
        "the Yee solver and source sampler assume a cubic grid "
        f"(reference geometry, pde.py:110-112); got {pde.grid_size[1:]}")
    n = pde.nx
    n_large = pde.n_large
    outer = (n_large - n) // 2
    c = _courant()
    inv_eps = 1.0 / pde.permittivity
    inv_mu = 1.0 / pde.permeability
    shape = (n_large, n_large, n_large, 3)

    def fdtd_step(t, EH):
        E, H = EH
        # Soft additive plane sources on E.
        vals = jnp.sin(2 * jnp.pi * t / periods + phases)  # (S,)
        src = jnp.einsum("s,sxyz,sc->xyzc", vals, masks, polar)
        E = E + c * inv_eps * _curl_H(H) + src
        H = H - c * inv_mu * _curl_E(E)
        return E, H

    E0 = jnp.zeros(shape, jnp.float32)
    H0 = jnp.zeros(shape, jnp.float32)
    E, H = jax.lax.fori_loop(
        0, pde.skip_nt, lambda i, EH: fdtd_step(jnp.float32(i), EH), (E0, H0))

    def frame(EH, k):
        E, H = jax.lax.fori_loop(
            0, pde.sample_rate,
            lambda i, EH: fdtd_step(
                jnp.float32(pde.skip_nt) + k * pde.sample_rate + i, EH), EH)
        crop = (slice(outer, outer + n),) * 3
        return (E, H), (E[crop], H[crop])

    (_, _), (d_field, h_field) = jax.lax.scan(
        frame, (E, H), jnp.arange(pde.nt, dtype=jnp.float32))
    return d_field, h_field


def generate_trajectories_maxwell(pde: Maxwell3D, mode: str,
                                  num_samples: int, batch_size: int = 4,
                                  dirname: str = "data",
                                  seed: int = 42) -> str:
    """Generate + save trajectories in the reference HDF5 layout
    (``maxwell.py:43-62,147-165``)."""
    import h5py

    os.makedirs(dirname, exist_ok=True)
    save_name = os.path.join(dirname, "_".join([str(pde), mode, str(seed)]))
    if mode == "train":
        save_name += "_" + str(num_samples)
    path = save_name + ".h5"

    nt, n = pde.nt, pde.nx
    sim_batch = jax.jit(jax.vmap(lambda s: simulate_trajectory(s, pde)))
    # Fold the split into the stream: same seed across modes must not
    # reproduce train trajectories in valid/test (split leakage).
    master = np.random.RandomState(
        (seed * 3 + {"train": 0, "valid": 1, "test": 2}[mode])
        % np.iinfo(np.uint32).max)
    traj_seeds = master.randint(np.iinfo(np.int32).max, size=num_samples)
    with h5py.File(path, "a") as h5f:
        ds = h5f.create_group(mode)
        d_field = ds.create_dataset("d_field", (num_samples, nt, n, n, n, 3),
                                    dtype=float)
        h_field = ds.create_dataset("h_field", (num_samples, nt, n, n, n, 3),
                                    dtype=float)
        for start in range(0, num_samples, batch_size):
            b = min(batch_size, num_samples - start)
            srcs = [sample_sources(
                np.random.RandomState(idx + traj_seeds[idx]), pde)
                for idx in range(start, start + b)]
            stacked = tuple(jnp.stack([s[i] for s in srcs])
                            for i in range(4))
            d, h = sim_batch(stacked)
            d_field[start:start + b] = np.asarray(d)
            h_field[start:start + b] = np.asarray(h)
    return path
