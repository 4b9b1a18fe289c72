"""WMH leave-one-out protocol at full challenge slice counts.

Runs the LOO pipeline end-to-end on synthetic patients with the challenge
layout — 48 slices/patient for the Utrecht/Singapore-style sites, 83 for
GE3T — at 200x200, with per-patient voxel spacing threaded into the H95
metric, and writes the per-patient challenge metrics artifact.

  python scripts/wmh_loo_run.py --patients-48 2 --patients-83 1 --epochs 3
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--patients-48", type=int, default=2)
    p.add_argument("--patients-83", type=int, default=1)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--size", type=int, default=200)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--model", default="seg_unet",
                   choices=["seg_unet", "legacy", "legacy3"],
                   help="legacy/legacy3 = the challenge-winning Keras "
                        "net's kernel-5/kernel-3 ensemble arms")
    p.add_argument("--out", default="runs/wmh_loo/loo_results.json")
    args = p.parse_args(argv)

    import numpy as np

    from unet_design_tpu.data import wmh as wmh_data
    from unet_design_tpu.tasks import wmh_leave_one_out as loo

    # synthetic patients at full slice counts (challenge layout 48/83)
    ranges, spacings, imgs, masks = [], [], [], []
    offset = 0
    n_patients = args.patients_48 + args.patients_83
    for pt in range(n_patients):
        n_slices = 48 if pt < args.patients_48 else 83
        site = "utrecht" if pt < args.patients_48 else "ge3t"
        im, mk = wmh_data.synthetic_wmh(n_slices, size=args.size,
                                        seed=100 + pt)
        imgs.append(im)
        masks.append(mk)
        ranges.append((offset, offset + n_slices))
        spacings.append(wmh_data.CHALLENGE_SPACINGS[site])
        offset += n_slices
    images = np.concatenate(imgs)
    masks = np.concatenate(masks)
    images = wmh_data.normalize_by_train_stats(images)
    print(f"{n_patients} synthetic patients, {images.shape[0]} slices "
          f"at {args.size}x{args.size}", flush=True)

    cfg = loo.LOOConfig(model=args.model, hidden_channels=args.hidden,
                        epochs=args.epochs)
    results = loo.leave_one_out(cfg, images, masks, slice_ranges=ranges,
                                spacings=spacings)

    artifact = {
        "protocol": {"patients_48": args.patients_48,
                     "patients_83": args.patients_83,
                     "model": args.model,
                     "size": args.size, "epochs": args.epochs,
                     "spacing_mm": {i: list(s)
                                    for i, s in enumerate(spacings)}},
        "per_patient": {str(k): {m: (None if v != v else round(float(v), 4))
                                 for m, v in r.items()}
                        for k, r in results.items()},
    }
    finite = lambda key: [r[key] for r in results.values()
                          if r[key] == r[key]]
    artifact["mean"] = {key: round(float(np.mean(finite(key))), 4)
                        for key in ("dsc", "h95", "avd", "lesion_recall",
                                    "lesion_f1") if finite(key)}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["mean"], indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
