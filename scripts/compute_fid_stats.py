"""Precompute FID reference statistics (the ``stats/cifar10.train.npz``
cache of ``diff_cifar/score/fid.py``).

Usage:
  python scripts/compute_fid_stats.py --data-root datasets/cifar10 \
      --weights pt_inception-2015-12-05-6726825d.pth --out stats/cifar10.train.npz
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--weights", default=None,
                   help="pytorch-fid pt_inception .pth file")
    p.add_argument("--out", default="stats/cifar10.train.npz")
    p.add_argument("--batch-size", type=int, default=50)
    args = p.parse_args(argv)

    from unet_design_tpu.data.image import load_cifar10
    from unet_design_tpu.evalx.fid import FIDEvaluator
    from unet_design_tpu.evalx.inception import load_fid_params

    images, _ = load_cifar10(args.data_root, train=True)
    images01 = (images + 1.0) / 2.0  # [-1,1] -> [0,1]
    variables = load_fid_params(args.weights) if args.weights else None
    ev = FIDEvaluator(variables, batch_size=args.batch_size)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    ev.save_reference_stats(images01, args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
