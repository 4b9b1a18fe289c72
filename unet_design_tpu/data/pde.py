"""PDE trajectory datapipes: window slicing, HDF5/zarr openers, samplers.

TPU-native re-design of ``pdearena/pdearena/data`` — torchdata datapipes
become plain numpy generator pipelines feeding the device-prefetch loader:

- :class:`PDEDataConfig` (``data/utils.py:9-14``).
- :func:`create_data2d` — the pure window-slicing function
  (``data/utils.py:17-71``), NHWC frames.
- :class:`NavierStokesOpener` — HDF5 trajectory reader
  (``datapipes/navierstokes2d.py:13-72``).
- :class:`ShallowWaterOpener` — zarr/xarray reader with normalization stats
  (``datapipes/shallowwater2d.py:17-165``); requires zarr+xarray, otherwise a
  clear ImportError.  A ``.npz``-directory fallback covers pre-converted data.
- :func:`randomized_train_windows` / :func:`eval_timestep_windows` — the
  RandomizedPDETrainData / PDEEvalTimeStepData samplers
  (``datapipes/common.py:251-392``), including the train-mode
  ``cycle(trajlen)`` semantics.
- :func:`synthetic_trajectories` — structured random trajectories for tests
  and smoke runs.

Frames are NHWC: u (T, H, W, n_scalar), v (T, H, W, 2 * n_vector).
"""

from __future__ import annotations

import dataclasses
import glob
import logging
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from unet_design_tpu.data.loader import shard_for_process

_log = logging.getLogger(__name__)


@dataclasses.dataclass
class PDEDataConfig:
    n_scalar_components: int
    n_vector_components: int
    trajlen: int
    n_spatial_dims: int = 2


def create_data2d(n_input_scalar: int, n_input_vector: int,
                  n_output_scalar: int, n_output_vector: int,
                  scalar_fields: Optional[np.ndarray],
                  vector_fields: Optional[np.ndarray],
                  start: int, time_history: int, time_future: int,
                  time_gap: int) -> Tuple[np.ndarray, np.ndarray]:
    """Window-slice one trajectory into (input, target) (``data/utils.py:17-71``).

    scalar_fields: (T, H, W, n_scalar); vector_fields: (T, H, W, 2*n_vector).
    Returns (1, time_history, H, W, C_in), (1, time_future, H, W, C_out).
    """
    assert n_input_scalar > 0 or n_input_vector > 0
    assert time_history > 0
    end = start + time_history
    tstart = end + time_gap
    tend = tstart + time_future
    parts_in, parts_out = [], []
    if n_input_scalar > 0:
        parts_in.append(scalar_fields[start:end, ..., :n_input_scalar])
    if n_input_vector > 0:
        parts_in.append(vector_fields[start:end, ..., :n_input_vector * 2])
    if n_output_scalar > 0:
        parts_out.append(scalar_fields[tstart:tend, ..., :n_output_scalar])
    if n_output_vector > 0:
        parts_out.append(vector_fields[tstart:tend, ..., :n_output_vector * 2])
    data = np.concatenate(parts_in, axis=-1)[None]
    targets = np.concatenate(parts_out, axis=-1)[None]
    if targets.shape[-1] == 0:
        raise ValueError("No targets")
    return data, targets


def max_start_time(trajlen: int, time_history: int, time_future: int,
                   time_gap: int) -> int:
    return trajlen - time_history - time_future - time_gap


class NavierStokesOpener:
    """Yields (u, v, cond) trajectories from PDEArena NS-2D HDF5 files."""

    def __init__(self, paths: Sequence[str], mode: str,
                 limit_trajectories: Optional[int] = None):
        self.paths = list(paths)
        self.mode = mode
        self.limit = limit_trajectories

    @staticmethod
    def list_files(data_path: str, mode: str) -> List[str]:
        files = sorted(glob.glob(os.path.join(data_path, "*.h5")))
        return [f for f in files if mode in os.path.basename(f)]

    def n_trajectories(self) -> int:
        """Trajectory count from file metadata only (no array reads)."""
        import h5py
        total = 0
        for path in self.paths:
            with h5py.File(path, "r") as f:
                num = f[self.mode]["u"].shape[0]
                if self.limit not in (None, -1):
                    num = min(num, self.limit)
                total += num
        return total

    def __iter__(self):
        import h5py
        for path in self.paths:
            with h5py.File(path, "r") as f:
                data = f[self.mode]
                num = data["u"].shape[0]
                if self.limit is not None and self.limit != -1:
                    num = min(num, self.limit)
                for idx in range(num):
                    u = np.asarray(data["u"][idx], np.float32)[..., None]
                    vx = np.asarray(data["vx"][idx], np.float32)
                    vy = np.asarray(data["vy"][idx], np.float32)
                    v = np.stack([vx, vy], axis=-1)
                    cond = (np.float32(data["buo_y"][idx])
                            if "buo_y" in data else None)
                    yield u, v, cond


class ShallowWaterOpener:
    """Shallow-water-2D zarr reader (``datapipes/shallowwater2d.py:17-165``).

    Reads vorticity (scalar) and wind vector fields, normalized by the
    dataset's precomputed normstats.  Falls back to pre-converted ``.npz``
    files (keys: ``u``, ``v``) when zarr/xarray are unavailable.
    """

    def __init__(self, paths: Sequence[str], mode: str,
                 limit_trajectories: Optional[int] = None,
                 skip_nt: int = 0, sample_rate: int = 1):
        self.paths = list(paths)
        self.mode = mode
        self.limit = limit_trajectories
        # temporal subsampling (``shallowwater2d.py:103-109``): the raw
        # trajectories are stored at the solver's save cadence; the 2-day
        # task reads ``[skip_nt::sample_rate]`` = ``[4::8]``
        # (``ShallowWaterDatasetOpener2Day``, ``shallowwater2d.py:124-132``)
        # and the 1-day task ``[4::4]`` (``:146-154``).  Like the reference,
        # the slice (including ``skip_nt``) only applies when
        # ``sample_rate > 1``.
        self.skip_nt = skip_nt
        self.sample_rate = sample_rate

    def _subsample(self, arr: np.ndarray) -> np.ndarray:
        if self.sample_rate > 1:
            return arr[self.skip_nt::self.sample_rate]
        return arr

    @staticmethod
    def list_files(data_path: str, mode: str) -> List[str]:
        out = []
        for name in sorted(os.listdir(data_path)):
            full = os.path.join(data_path, name)
            if name.startswith(mode) and (name.endswith(".zarr")
                                          or name.endswith(".npz")):
                out.append(full)
        return out

    def n_trajectories(self) -> int:
        """Trajectory count (one per file; zarr and npz alike)."""
        n = len(self.paths)
        if self.limit not in (None, -1):
            n = min(n, self.limit)
        return n

    def __iter__(self):
        count = 0
        for path in self.paths:
            if self.limit not in (None, -1) and count >= self.limit:
                return
            if path.endswith(".npz"):
                d = np.load(path)
                u = np.asarray(d["u"], np.float32)
                normpath = os.path.join(os.path.dirname(path),
                                        "normstats.npz")
                if os.path.exists(normpath):
                    normstat = np.load(normpath)
                    u = ((u - normstat["vor_mean"])
                         / normstat["vor_std"])  # zarr-path parity
                yield (self._subsample(u),
                       self._subsample(np.asarray(d["v"], np.float32)), None)
                count += 1
                continue
            try:
                import xarray as xr  # noqa
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "ShallowWaterOpener needs xarray+zarr for .zarr data; "
                    "convert to .npz with scripts/convert_shallowwater.py "
                    "or install xarray/zarr") from e
            ds = xr.open_zarr(path)
            normstat = None
            normpath = os.path.join(os.path.dirname(path), "..",
                                    "normstats.npz")
            if os.path.exists(normpath):
                normstat = np.load(normpath)
            vor = np.asarray(ds["vor"].values, np.float32)
            u_wind = np.asarray(ds["u"].values, np.float32)
            v_wind = np.asarray(ds["v"].values, np.float32)
            if normstat is not None:
                vor = (vor - normstat["vor_mean"]) / normstat["vor_std"]
            u = vor.reshape(vor.shape[0], *vor.shape[-2:])[..., None]
            v = np.stack([u_wind.reshape(u.shape[:3]),
                          v_wind.reshape(u.shape[:3])], axis=-1)
            yield self._subsample(u), self._subsample(v), None
            count += 1


def randomized_train_windows(opener, pde: PDEDataConfig, time_history: int,
                             time_future: int, time_gap: int,
                             seed: int = 0,
                             cycles: Optional[int] = None
                             ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """RandomizedPDETrainData (``datapipes/common.py:251-319``): one random
    window per trajectory visit; the train pipe cycles ``trajlen`` times per
    epoch so in expectation all windows are seen."""
    rng = np.random.default_rng(seed)
    cycles = pde.trajlen if cycles is None else cycles
    mst = max_start_time(pde.trajlen, time_history, time_future, time_gap)
    for _ in range(cycles):
        for (u, v, cond) in opener:
            start = int(rng.integers(0, mst + 1))
            yield create_data2d(pde.n_scalar_components,
                                pde.n_vector_components,
                                pde.n_scalar_components,
                                pde.n_vector_components,
                                u, v, start, time_history, time_future,
                                time_gap)


def eval_timestep_windows(opener, pde: PDEDataConfig, time_history: int,
                          time_future: int, time_gap: int
                          ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """PDEEvalTimeStepData (``datapipes/common.py:322-392``): deterministic
    non-overlapping windows over every trajectory."""
    mst = max_start_time(pde.trajlen, time_history, time_future, time_gap)
    starts = list(range(0, mst + 1, time_gap + time_future))
    for start in starts:
        for (u, v, cond) in opener:
            yield create_data2d(pde.n_scalar_components,
                                pde.n_vector_components,
                                pde.n_scalar_components,
                                pde.n_vector_components,
                                u, v, start, time_history, time_future,
                                time_gap)


def create_time_conditioned_data(n_input_scalar: int, n_input_vector: int,
                                 scalar_fields, vector_fields,
                                 start_time: int, end_time: int
                                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Single-frame (input, target) pair at (start, end)
    (``data/utils.py:76-107``)."""
    parts_in, parts_out = [], []
    if n_input_scalar > 0:
        parts_in.append(scalar_fields[start_time:start_time + 1])
        parts_out.append(scalar_fields[end_time:end_time + 1])
    if n_input_vector > 0:
        parts_in.append(vector_fields[start_time:start_time + 1])
        parts_out.append(vector_fields[end_time:end_time + 1])
    return (np.concatenate(parts_in, axis=-1)[None],
            np.concatenate(parts_out, axis=-1)[None])


def random_time_conditioned_windows(opener, pde: PDEDataConfig,
                                    seed: int = 0, reweigh: bool = True,
                                    cycles: Optional[int] = None):
    """RandomTimeStepConditionedPDETrainData (``common.py:148-208``):
    per trajectory, pick (start, end) with end ~ U[1, trajlen) and start
    reweighted toward long horizons; yields (x, y, delta_t, cond)."""
    rng = np.random.default_rng(seed)
    cycles = pde.trajlen if cycles is None else cycles
    for _ in range(cycles):
        for (u, v, cond) in opener:
            end = int(rng.integers(1, pde.trajlen))
            if reweigh:
                w = 1.0 / np.arange(1, end + 1)
                start = int(rng.choice(np.arange(0, end), p=w / w.sum()))
            else:
                start = int(rng.integers(0, end))
            delta_t = end - start
            x, y = create_time_conditioned_data(
                pde.n_scalar_components, pde.n_vector_components, u, v,
                start, end)
            yield x, y, np.float32(delta_t), cond


def timestep_conditioned_eval_windows(opener, pde: PDEDataConfig,
                                      delta_t: int):
    """TimestepConditionedPDEEvalData (``common.py:211-248``): all
    delta_t-strided single-step pairs."""
    if 2 * delta_t >= pde.trajlen:
        raise ValueError("delta_t should be less than half the trajlen")
    for begin in range(pde.trajlen - delta_t):
        for (u, v, cond) in opener:
            newu = u[begin::delta_t]
            newv = v[begin::delta_t] if v is not None else None
            for start in range(newu.shape[0] - 1):
                x, y = create_time_conditioned_data(
                    pde.n_scalar_components, pde.n_vector_components,
                    newu, newv, start, start + 1)
                yield x, y, np.float32(delta_t), cond


def rollout_eval_trajectories(opener) -> Iterator[Tuple[np.ndarray, ...]]:
    """Full trajectories for rollout validation (second eval dataloader)."""
    for (u, v, cond) in opener:
        yield u, v, cond


class CachedOpener:
    """RAM-resident wrapper around any trajectory opener.

    The reference's torchdata pipes re-open and re-read the HDF5 files every
    epoch (``datapipes/common.py:69-96``) — fine with many dataloader
    workers, but this host has ONE core and the TPU consumes batches faster
    than h5py can re-decode them.  Reading each file once (bulk sequential
    read) and serving numpy views afterwards makes the input pipeline free.
    """

    def __init__(self, opener):
        self._trajs = list(opener)

    def __iter__(self):
        return iter(self._trajs)

    def __len__(self):
        return len(self._trajs)

    def n_trajectories(self) -> int:
        return len(self._trajs)

    def stacked_fields(self) -> np.ndarray:
        """(N, T, H, W, C_scalar + 2*C_vector) — scalar fields then vector
        fields, the ``create_data2d`` input order — for device-resident
        window gathering."""
        parts = []
        for (u, v, _) in self._trajs:
            f = np.concatenate([u, v], axis=-1) if v is not None else u
            parts.append(f)
        return np.stack(parts)


def opener_cache_key(opener) -> Optional[str]:
    """Fingerprint an opener's source files + read parameters for the
    on-disk stack cache; None when the opener exposes no file list.

    Includes any ``normstats.npz`` the opener would consult at read time
    (ShallowWaterOpener normalizes by it): regenerating the train split
    rewrites normstats without touching valid/test file mtimes, and a stale
    cache would silently serve fields normalized with the old stats."""
    paths = getattr(opener, "paths", None)
    if not paths:
        return None
    import hashlib
    h = hashlib.sha1()
    for p in paths:
        st = os.stat(p)
        h.update(f"{os.path.basename(p)}:{st.st_size}:"
                 f"{st.st_mtime_ns};".encode())
    norm_dirs = []
    for p in paths:  # .npz: sibling normstats; .zarr: parent-dir normstats
        d = os.path.dirname(os.path.abspath(p))
        for nd in (d, os.path.dirname(d)):
            if nd not in norm_dirs:
                norm_dirs.append(nd)
    for nd in norm_dirs:
        np_path = os.path.join(nd, "normstats.npz")
        if os.path.exists(np_path):
            st = os.stat(np_path)
            h.update(f"norm:{np_path}:{st.st_size}:"
                     f"{st.st_mtime_ns};".encode())
        else:
            h.update(f"norm:{np_path}:missing;".encode())
    h.update(f"|limit={getattr(opener, 'limit', None)}"
             f"|skip={getattr(opener, 'skip_nt', 0)}"
             f"|rate={getattr(opener, 'sample_rate', 1)}"
             f"|mode={getattr(opener, 'mode', '')}".encode())
    return h.hexdigest()


class StackedDiskCache:
    """Opener-compatible view over one pre-stacked fields array.

    Serves the same ``(u, v, cond=None)`` tuples as :class:`CachedOpener`
    and the same ``stacked_fields()`` the HBM-staging path consumes, but is
    constructed from a single uncompressed array instead of hundreds of
    small files (this host's disk reads ~20 MB/s, so re-reading a 700-file
    split costs ~12 min per process; one bulk array cuts that ~8x on the
    temporally-subsampled shallow-water splits)."""

    def __init__(self, fields: np.ndarray, n_scalar: int):
        self._fields = fields
        self._ns = n_scalar

    def __iter__(self):
        for f in self._fields:
            v = f[..., self._ns:]
            yield f[..., :self._ns], (v if v.shape[-1] else None), None

    def __len__(self):
        return len(self._fields)

    def n_trajectories(self) -> int:
        return len(self._fields)

    def stacked_fields(self) -> np.ndarray:
        return self._fields


def cached_opener(opener, n_scalar: Optional[int] = None,
                  cache_dir: Optional[str] = None):
    """RAM-cache an opener; optionally back it by an on-disk stacked cache.

    Without ``cache_dir`` (or for openers the stack can't represent:
    conditioned trajectories, ragged shapes, no source-file list) this is
    exactly :class:`CachedOpener`.  With it, the stacked array is written
    once to ``cache_dir`` keyed on the source files' names/sizes/mtimes and
    the opener's read parameters, and later runs load the single array.
    """
    if cache_dir is None or n_scalar is None:
        return CachedOpener(opener)
    key = opener_cache_key(opener)
    if key is None:
        return CachedOpener(opener)
    key = f"{key}|ns={n_scalar}"
    import hashlib
    name_digest = hashlib.sha1(key.encode()).hexdigest()[:16]
    path = os.path.join(
        cache_dir,
        f"stack_{getattr(opener, 'mode', 'x')}_{name_digest}.npz")
    if os.path.exists(path):
        try:
            d = np.load(path)
            if str(d["key"]) == key:
                _log.info("stacked cache hit: %s", path)
                return StackedDiskCache(np.asarray(d["fields"]),
                                        int(d["n_scalar"]))
        except Exception:  # corrupt/foreign cache file: rebuild below
            pass
    cached = CachedOpener(opener)
    trajs = cached._trajs
    if (not trajs or any(c is not None for (_, _, c) in trajs)
            or any(v is None for (_, v, _) in trajs)
            or len({(u.shape, v.shape) for (u, v, _) in trajs}) != 1
            or trajs[0][0].shape[-1] != n_scalar):
        return cached
    fields = cached.stacked_fields()
    os.makedirs(cache_dir, exist_ok=True)
    tmp = f"{path}.{os.getpid()}.tmp"  # unique: concurrent writers must not
    with open(tmp, "wb") as f:         # truncate each other's partial file
        np.savez(f, fields=fields, key=np.array(key),
                 n_scalar=np.array(n_scalar))
    os.replace(tmp, path)
    _log.info("stacked cache saved: %s %s (%.2f GB)", path, fields.shape,
              fields.nbytes / 1e9)
    return StackedDiskCache(fields, n_scalar)


def batched_windows(window_iter, batch_size: int
                    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    xs, ys = [], []
    for x, y in window_iter:
        xs.append(x)
        ys.append(y)
        if len(xs) == batch_size:
            yield np.concatenate(xs), np.concatenate(ys)
            xs, ys = [], []


def synthetic_trajectories(n_traj: int, pde: PDEDataConfig, res: int = 32,
                           seed: int = 0):
    """Smooth random trajectories (superposed decaying Fourier modes)."""
    rng = np.random.default_rng(seed)
    k = np.fft.fftfreq(res)[:, None] ** 2 + np.fft.fftfreq(res)[None, :] ** 2
    trajs = []
    for _ in range(n_traj):
        def field(t_decay):
            spec = (rng.standard_normal((res, res))
                    + 1j * rng.standard_normal((res, res)))
            spec *= np.exp(-400 * k)
            frames = [np.real(np.fft.ifft2(spec * np.exp(-t_decay * t * k)))
                      for t in range(pde.trajlen)]
            out = np.stack(frames).astype(np.float32)
            return out / (np.abs(out).max() + 1e-8)

        u = np.stack([field(5.0) for _ in
                      range(pde.n_scalar_components)], axis=-1)
        v = (np.stack([field(5.0) for _ in
                       range(2 * pde.n_vector_components)], axis=-1)
             if pde.n_vector_components else None)
        trajs.append((u, v, None))
    return trajs
