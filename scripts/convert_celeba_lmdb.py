"""Convert the reference's CelebA64 LMDB into .npy shards.

The LMDB layout is the NVAE one the reference consumes
(``/root/reference/diff_mnist/data.py:472-505``: keys b'0', b'1', ... with
encoded RGB images).  The output shards are what
``unet_design_tpu.data.image.load_celeba64`` reads without the optional
``lmdb`` dependency.

  python scripts/convert_celeba_lmdb.py datasets/celeba64_lmdb \
      --split train --out datasets/celeba64_npy --shard-size 16384
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("root", help="directory containing <split>.lmdb")
    p.add_argument("--split", default="train",
                   choices=["train", "validation", "test"])
    p.add_argument("--out", required=True)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--shard-size", type=int, default=16384)
    p.add_argument("--raw", action="store_true",
                   help="records are raw uint8 instead of encoded images")
    args = p.parse_args(argv)

    from unet_design_tpu.data.image import load_celeba64_lmdb

    # load in [-1,1]; store as [0,1] floats like the shards expect
    x = load_celeba64_lmdb(args.root, args.split, size=args.size,
                           is_encoded=not args.raw)
    x = x * 0.5 + 0.5
    os.makedirs(args.out, exist_ok=True)
    for shard, s in enumerate(range(0, len(x), args.shard_size)):
        path = os.path.join(args.out,
                            f"celeba64_{args.split}_{shard:04d}.npy")
        np.save(path, x[s:s + args.shard_size])
        print("wrote", path)


if __name__ == "__main__":
    main()
