"""Normalization statistics over generated HDF5 datasets
(``pdearena/scripts/compute_normalization.py`` analog)."""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("data_dir")
    p.add_argument("--mode", default="train")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    from unet_design_tpu.datagen.navier_stokes import compute_normalization
    paths = sorted(glob.glob(os.path.join(args.data_dir, "*.h5")))
    paths = [p_ for p_ in paths if args.mode in os.path.basename(p_)]
    out = args.out or os.path.join(args.data_dir, "normstats.npz")
    stats = compute_normalization(paths, args.mode, out)
    print(stats)


if __name__ == "__main__":
    main()
