"""Data-generation driver (``pdearena/scripts/generate_data.py`` analog).

Examples:
  python scripts/generate_data.py navierstokes2d --mode train --samples 32 \
      --dirname data/ns2d
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("pde", choices=["navierstokes2d", "shallowwater",
                                   "maxwell3d"])
    p.add_argument("--mode", default="train",
                   choices=["train", "valid", "test"])
    p.add_argument("--samples", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--dirname", default="data")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--nx", type=int, default=None,
                   help="grid rows (default: per-PDE config default)")
    p.add_argument("--ny", type=int, default=None)
    p.add_argument("--nt", type=int, default=None)
    p.add_argument("--sample-rate", type=int, default=None,
                   help="save every k-th simulation step (trajlen = nt/k)")
    p.add_argument("--skip-nt", type=int, default=None,
                   help="burn-in simulation steps before the first saved frame")
    p.add_argument("--buoyancy-y", type=float, default=0.5)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a JAX platform (the env var alone does not "
                        "deregister a pinned TPU plugin)")
    args = p.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    def sized(cfg_cls, **extra):
        import dataclasses
        over = {k: v for k, v in
                (("nx", args.nx), ("ny", args.ny), ("nt", args.nt),
                 ("sample_rate", args.sample_rate), ("skip_nt", args.skip_nt))
                if v is not None}
        return dataclasses.replace(cfg_cls(**extra), **over)

    if args.pde == "navierstokes2d":
        from unet_design_tpu.datagen import navier_stokes
        from unet_design_tpu.datagen.pde_configs import NavierStokes2D
        pde = sized(NavierStokes2D, buoyancy_y=args.buoyancy_y)
        path = navier_stokes.generate_trajectories_smoke(
            pde, args.mode, args.samples, args.batch_size, args.dirname,
            args.seed)
    elif args.pde == "shallowwater":
        from unet_design_tpu.datagen import shallow_water
        from unet_design_tpu.datagen.pde_configs import ShallowWaterWeather
        path = shallow_water.generate_trajectories_shallowwater(
            sized(ShallowWaterWeather), args.mode, args.samples,
            args.batch_size, args.dirname, args.seed)
    else:
        import dataclasses
        from unet_design_tpu.datagen import maxwell
        from unet_design_tpu.datagen.pde_configs import Maxwell3D
        over = {}
        if args.nx is not None:  # cubic grid: --nx sets all three axes
            over.update(nx=args.nx, ny=args.nx, nz=args.nx)
        if args.nt is not None:
            over["nt"] = args.nt
        path = maxwell.generate_trajectories_maxwell(
            dataclasses.replace(Maxwell3D(), **over), args.mode,
            args.samples, args.batch_size, args.dirname, args.seed)
    print("wrote", path)


if __name__ == "__main__":
    main()
