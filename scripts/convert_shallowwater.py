"""Convert shallow-water zarr datasets to the .npz format our opener reads
without xarray/zarr (``pdearena/scripts/convertnc2zarr.py`` counterpart).

Requires xarray+zarr at conversion time only.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("zarr_path")
    p.add_argument("out_npz")
    args = p.parse_args(argv)
    import xarray as xr
    ds = xr.open_zarr(args.zarr_path)
    vor = np.asarray(ds["vor"].values, np.float32)
    u = np.asarray(ds["u"].values, np.float32)
    v = np.asarray(ds["v"].values, np.float32)
    t = vor.shape[0]
    scalar = vor.reshape(t, *vor.shape[-2:])[..., None]
    vec = np.stack([u.reshape(scalar.shape[:3]),
                    v.reshape(scalar.shape[:3])], axis=-1)
    np.savez(args.out_npz, u=scalar, v=vec)
    print("wrote", args.out_npz, scalar.shape, vec.shape)


if __name__ == "__main__":
    main()
