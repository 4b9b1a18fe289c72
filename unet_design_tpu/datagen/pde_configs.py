"""PDE data-generation configurations.

Port of ``pdearena/pdedatagen/pde.py:7-129`` (``NavierStokes2D``,
``ShallowWaterWeather``, ``Maxwell3D``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class NavierStokes2D:
    tmin: float = 0.0
    tmax: float = 20.0
    Lx: float = 32.0
    Ly: float = 32.0
    nt: int = 100
    nx: int = 128
    ny: int = 128
    skip_nt: int = 0
    sample_rate: int = 1
    nu: float = 0.03
    buoyancy_x: float = 0.0
    buoyancy_y: float = 0.5
    force_strength: float = 0.2
    force_frequency: int = 4
    n_scalar_components: int = 1
    n_vector_components: int = 1

    @property
    def grid_size(self) -> Tuple[int, int, int]:
        return (self.trajlen, self.nx, self.ny)

    @property
    def trajlen(self) -> int:
        return int(self.nt / self.sample_rate)

    @property
    def dt(self) -> float:
        return (self.tmax - self.tmin) / self.nt

    def __str__(self):
        return "ns2d"


@dataclasses.dataclass
class ShallowWaterWeather:
    """Shallow-water 'weather' config; generation itself requires the Julia
    SpeedyWeather solver (``pdedatagen/shallowwater/datagen.jl``) and is out
    of scope here — use the .npz conversion path in
    ``unet_design_tpu.data.pde.ShallowWaterOpener``."""

    nt: int = 88
    nx: int = 96
    ny: int = 192
    sample_rate: int = 1

    def __str__(self):
        return "shallowwater"


@dataclasses.dataclass
class Maxwell3D:
    """Maxwell 3D FDTD config (generation needs the ``fdtd`` package,
    ``pdedatagen/maxwell.py:18``)."""

    nt: int = 8
    nx: int = 32
    ny: int = 32
    nz: int = 32

    def __str__(self):
        return "maxwell3d"
