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
    p.add_argument("pde", choices=["navierstokes2d"])
    p.add_argument("--mode", default="train",
                   choices=["train", "valid", "test"])
    p.add_argument("--samples", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--dirname", default="data")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--nx", type=int, default=128)
    p.add_argument("--ny", type=int, default=128)
    p.add_argument("--nt", type=int, default=56)
    p.add_argument("--buoyancy-y", type=float, default=0.5)
    args = p.parse_args(argv)

    from unet_design_tpu.datagen import navier_stokes
    from unet_design_tpu.datagen.pde_configs import NavierStokes2D

    pde = NavierStokes2D(nx=args.nx, ny=args.ny, nt=args.nt,
                         buoyancy_y=args.buoyancy_y)
    path = navier_stokes.generate_trajectories_smoke(
        pde, args.mode, args.samples, args.batch_size, args.dirname,
        args.seed)
    print("wrote", path)


if __name__ == "__main__":
    main()
