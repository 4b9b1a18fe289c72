"""JAX-native Navier-Stokes 2D smoke data generation.

Replaces the reference's phiflow CPU simulation
(``pdearena/pdedatagen/navier_stokes.py:31+``) with an on-device solver:
incompressible 2D Navier-Stokes with a buoyant passive scalar ("smoke"),
semi-Lagrangian advection + spectral diffusion + spectral pressure projection
on a periodic domain (the reference uses a closed box; boundary handling is
the documented deviation).  The whole trajectory is one ``lax.scan`` and
batches of trajectories are ``vmap``-ed — data generation runs at TPU speed.

Output matches the reference HDF5 schema (``navier_stokes.py:66-80``):
groups train/valid/test with datasets u, vx, vy, t, dt, x, dx, y, dy, buo_y.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_design_tpu.datagen.pde_configs import NavierStokes2D


def _smooth_noise(rng: jax.Array, nx: int, ny: int, scale: float = 11.0,
                  smoothness: float = 6.0) -> jnp.ndarray:
    """Band-limited random field (phiflow ``Noise`` analog)."""
    spec = (jax.random.normal(rng, (nx, ny))
            + 1j * jax.random.normal(jax.random.fold_in(rng, 1), (nx, ny)))
    kx = jnp.fft.fftfreq(nx)[:, None]
    ky = jnp.fft.fftfreq(ny)[None, :]
    k2 = kx ** 2 + ky ** 2
    amp = jnp.exp(-0.5 * k2 * (smoothness * nx / 8.0) ** 2)
    field = jnp.real(jnp.fft.ifft2(spec * amp))
    return scale * field / (jnp.std(field) + 1e-8)


def _advect(field: jnp.ndarray, vx: jnp.ndarray, vy: jnp.ndarray,
            dt: float) -> jnp.ndarray:
    """Semi-Lagrangian advection with periodic wrap (linear interp)."""
    nx, ny = field.shape
    xs = jnp.arange(nx)[:, None] - dt * vx
    ys = jnp.arange(ny)[None, :] - dt * vy
    coords = jnp.stack([xs % nx, ys % ny])
    return jax.scipy.ndimage.map_coordinates(field, coords, order=1,
                                             mode="wrap")


def _project(vx: jnp.ndarray, vy: jnp.ndarray):
    """Spectral Helmholtz projection onto divergence-free fields.

    The Nyquist row/column is zeroed: the projection is not Hermitian-
    symmetric there (+pi and -pi alias), so keeping it would reintroduce
    divergence after taking the real part.
    """
    nx, ny = vx.shape
    kx = jnp.fft.fftfreq(nx)[:, None] * 2 * jnp.pi
    ky = jnp.fft.fftfreq(ny)[None, :] * 2 * jnp.pi
    k2 = kx ** 2 + ky ** 2
    k2 = jnp.where(k2 == 0, 1.0, k2)
    mask = ((jnp.arange(nx)[:, None] != nx // 2)
            & (jnp.arange(ny)[None, :] != ny // 2)).astype(vx.dtype)
    vxh, vyh = jnp.fft.fft2(vx), jnp.fft.fft2(vy)
    div = kx * vxh + ky * vyh
    vxh = (vxh - kx * div / k2) * mask
    vyh = (vyh - ky * div / k2) * mask
    return jnp.real(jnp.fft.ifft2(vxh)), jnp.real(jnp.fft.ifft2(vyh))


def _diffuse(f: jnp.ndarray, nu: float, dt: float) -> jnp.ndarray:
    nx, ny = f.shape
    kx = jnp.fft.fftfreq(nx)[:, None] * 2 * jnp.pi
    ky = jnp.fft.fftfreq(ny)[None, :] * 2 * jnp.pi
    decay = jnp.exp(-nu * (kx ** 2 + ky ** 2) * dt)
    return jnp.real(jnp.fft.ifft2(jnp.fft.fft2(f) * decay))


def _dft_matrix(n: int) -> jnp.ndarray:
    """Dense DFT matrix, built traced/on-device (complex eager constants are
    unsupported on the axon backend; see CLAUDE.md)."""
    k = jnp.arange(n, dtype=jnp.float32)
    ang = (-2.0 * jnp.pi / n) * (k[:, None] * k[None, :])
    return jax.lax.complex(jnp.cos(ang), jnp.sin(ang))


def _spectral_basis(nx: int, ny: int):
    """Precomputed DFT matrices + wavenumber grids for the fused
    diffuse+project step."""
    wx = _dft_matrix(nx)
    wy = _dft_matrix(ny)
    kx = jnp.fft.fftfreq(nx)[:, None] * 2 * jnp.pi
    ky = jnp.fft.fftfreq(ny)[None, :] * 2 * jnp.pi
    k2 = kx ** 2 + ky ** 2
    k2_safe = jnp.where(k2 == 0, 1.0, k2)
    mask = ((jnp.arange(nx)[:, None] != nx // 2)
            & (jnp.arange(ny)[None, :] != ny // 2)).astype(jnp.float32)
    return dict(wx=wx, wy_t=wy.T, iwx=jnp.conj(wx), iwy_t=jnp.conj(wy).T,
                kx=kx, ky=ky, k2=k2, k2_safe=k2_safe, mask=mask,
                inv_n=1.0 / (nx * ny))


def _diffuse_project_mm(vx, vy, nu, dt, basis):
    """Viscous decay + Helmholtz projection in ONE spectral round trip, with
    the DFTs as dense matmuls.  XLA's TPU FFT is slow (see ops/spectral.py);
    at datagen sizes (<=256^2) the MXU matmul path is far faster, and fusing
    diffusion into the projection halves the number of transforms per step."""
    b = basis
    vxh = b["wx"] @ vx @ b["wy_t"]
    vyh = b["wx"] @ vy @ b["wy_t"]
    decay = jnp.exp(-nu * b["k2"] * dt)
    vxh = vxh * decay
    vyh = vyh * decay
    div = b["kx"] * vxh + b["ky"] * vyh
    vxh = (vxh - b["kx"] * div / b["k2_safe"]) * b["mask"]
    vyh = (vyh - b["ky"] * div / b["k2_safe"]) * b["mask"]
    vx = jnp.real(b["iwx"] @ vxh @ b["iwy_t"]) * b["inv_n"]
    vy = jnp.real(b["iwx"] @ vyh @ b["iwy_t"]) * b["inv_n"]
    return vx, vy


@partial(jax.jit, static_argnames=("pde",))
def simulate_trajectory(rng: jax.Array, pde: NavierStokes2D,
                        buoyancy_y: Optional[jnp.ndarray] = None):
    """One smoke trajectory.  Returns (u, vx, vy) with shape (trajlen, nx, ny)."""
    nx, ny = pde.nx, pde.ny
    dt = pde.dt
    buo = buoyancy_y if buoyancy_y is not None else pde.buoyancy_y
    r1, r2, r3 = jax.random.split(rng, 3)
    smoke = jnp.abs(_smooth_noise(r1, nx, ny))
    smoke = smoke / (jnp.max(smoke) + 1e-8)
    vx = _smooth_noise(r2, nx, ny, scale=pde.force_strength)
    vy = _smooth_noise(r3, nx, ny, scale=pde.force_strength)
    vx, vy = _project(vx, vy)

    basis = _spectral_basis(nx, ny) if max(nx, ny) <= 512 else None

    def step(carry, _):
        smoke, vx, vy = carry
        smoke = _advect(smoke, vx, vy, dt)
        vx_a = _advect(vx, vx, vy, dt)
        vy_a = _advect(vy, vx, vy, dt)
        vy_a = vy_a + dt * buo * smoke          # buoyancy force on smoke
        if basis is not None:
            vx_p, vy_p = _diffuse_project_mm(vx_a, vy_a, pde.nu, dt, basis)
        else:
            vx_a = _diffuse(vx_a, pde.nu, dt)
            vy_a = _diffuse(vy_a, pde.nu, dt)
            vx_p, vy_p = _project(vx_a, vy_a)
        return (smoke, vx_p, vy_p), (smoke, vx_p, vy_p)

    n_steps = pde.skip_nt + pde.nt
    (_, _, _), (u, vx_t, vy_t) = jax.lax.scan(
        step, (smoke, vx, vy), None, length=n_steps)
    sl = slice(pde.skip_nt, None, pde.sample_rate)
    return u[sl], vx_t[sl], vy_t[sl]


def generate_trajectories_smoke(pde: NavierStokes2D, mode: str,
                                num_samples: int, batch_size: int = 8,
                                dirname: str = "data", seed: int = 42,
                                buoyancy_y: Optional[float] = None) -> str:
    """Generate + save trajectories in the reference HDF5 layout."""
    import h5py

    buo = buoyancy_y if buoyancy_y is not None else pde.buoyancy_y
    os.makedirs(dirname, exist_ok=True)
    save_name = os.path.join(
        dirname, "_".join([str(pde), mode, str(seed), f"{buo:.5f}"]))
    if mode == "train":
        save_name += "_" + str(num_samples)
    path = save_name + ".h5"
    # Write-then-rename: drivers treat "file exists" as "datagen done"
    # (scripts/run_table1_ns2d.sh), so a crash mid-write must never leave a
    # partial file under the final name.
    # Dot-prefixed temp name: driver gates like ``ls $D | grep ns2d_train_``
    # (scripts/run_table1_ns2d.sh) must never match a crash leftover, and
    # ``ls`` hides dotfiles.  Clean any stale leftover from a prior crash.
    tmp_path = os.path.join(os.path.dirname(path),
                            ".tmp_" + os.path.basename(path))
    if os.path.exists(tmp_path):
        os.remove(tmp_path)

    nt, nx, ny = pde.trajlen, pde.nx, pde.ny
    with h5py.File(tmp_path, "w") as h5f:
        ds = h5f.create_group(mode)
        # float32 fields: the solver runs f32 and training casts to f32, so
        # f64 storage would only double IO (grid/time coords stay f64).
        h5u = ds.create_dataset("u", (num_samples, nt, nx, ny),
                                dtype=np.float32)
        h5vx = ds.create_dataset("vx", (num_samples, nt, nx, ny),
                                 dtype=np.float32)
        h5vy = ds.create_dataset("vy", (num_samples, nt, nx, ny),
                                 dtype=np.float32)
        tco = ds.create_dataset("t", (num_samples, nt), dtype=float)
        dtd = ds.create_dataset("dt", (num_samples,), dtype=float)
        xco = ds.create_dataset("x", (num_samples, nx), dtype=float)
        dxd = ds.create_dataset("dx", (num_samples,), dtype=float)
        yco = ds.create_dataset("y", (num_samples, ny), dtype=float)
        dyd = ds.create_dataset("dy", (num_samples,), dtype=float)
        buod = ds.create_dataset("buo_y", (num_samples,), dtype=float)

        sim_batch = jax.jit(jax.vmap(lambda r: simulate_trajectory(r, pde)))
        # Fold the split into the stream: same --seed across modes must not
        # reproduce train trajectories in valid/test (split leakage).
        base = jax.random.fold_in(jax.random.PRNGKey(seed),
                                  {"train": 0, "valid": 1, "test": 2}[mode])
        for start in range(0, num_samples, batch_size):
            b = min(batch_size, num_samples - start)
            rngs = jax.vmap(jax.random.fold_in, (None, 0))(
                base, jnp.arange(start, start + b))
            u, vx, vy = sim_batch(rngs)
            print(f"[datagen ns2d {mode}] {start + b}/{num_samples}",
                  flush=True)
            h5u[start:start + b] = np.asarray(u)
            h5vx[start:start + b] = np.asarray(vx)
            h5vy[start:start + b] = np.asarray(vy)
            tco[start:start + b] = np.linspace(pde.tmin, pde.tmax, nt)
            dtd[start:start + b] = pde.dt
            xco[start:start + b] = np.linspace(0, pde.Lx, nx)
            dxd[start:start + b] = pde.Lx / nx
            yco[start:start + b] = np.linspace(0, pde.Ly, ny)
            dyd[start:start + b] = pde.Ly / ny
            buod[start:start + b] = buo
    os.replace(tmp_path, path)
    return path


def compute_normalization(paths, mode: str = "train", out: str = None):
    """Dataset normalization statistics (``scripts/compute_normalization.py``)."""
    import h5py

    stats = {}
    for key in ("u", "vx", "vy"):
        total, total_sq, count = 0.0, 0.0, 0
        for p in paths:
            with h5py.File(p, "r") as f:
                d = np.asarray(f[mode][key])
                total += d.sum()
                total_sq += (d ** 2).sum()
                count += d.size
        mean = total / count
        std = np.sqrt(total_sq / count - mean ** 2)
        stats[f"{key}_mean"] = mean
        stats[f"{key}_std"] = std
    if out:
        np.savez(out, **stats)
    return stats
