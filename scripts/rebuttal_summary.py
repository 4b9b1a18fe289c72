"""Collect the rebuttal-table FNO-vs-U-Net comparison (NS-2D leg).

The reference's rebuttal table (``/root/reference/README.md:219-227``) trains
FNO-128-8m on the Table-1 Navier-Stokes data (30 epochs, AdamW 2e-4, wd 1e-5,
warmup 5 / cosine 30) and compares against the three Table-1 U-Net encoder
arms (50-epoch recipe).  This script merges the already-collected U-Net arms
(``docs/table1_ns2d.json``) with the FNO run's ``test_metrics.json`` into one
markdown + JSON artifact.

  python scripts/rebuttal_summary.py --fno-run runs/table1q_fno \
      [--unet-json docs/table1_ns2d.json] [--out docs/table1_rebuttal.md]
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--fno-run", default="runs/table1q_fno")
    p.add_argument("--unet-json", default="docs/table1_ns2d.json")
    p.add_argument("--out", default="docs/table1_rebuttal.md")
    p.add_argument("--json-out", default="docs/table1_rebuttal.json")
    p.add_argument("--detail",
                   default="the SAME self-generated 1/4-scale NS-2D dataset "
                           "as the Table-1 U-Net arms (`docs/table1_ns2d.md`",
                   help="dataset/protocol description embedded in the table "
                        "note (change when pointing --unet-json/--fno-run at "
                        "a different scale's artifacts)")
    p.add_argument("--fno-prev-json", default=None,
                   help="a previously-written table1_rebuttal.json whose "
                        "FNO entry (single-seed metrics or an aggregated "
                        "entry with a 'seeds' list) is merged with the new "
                        "--fno-run as additional training seeds; the FNO "
                        "row then reports mean +/- sample std across seeds")
    args = p.parse_args(argv)

    fno_path = os.path.join(args.fno_run, "test_metrics.json")
    if not os.path.exists(fno_path):
        raise SystemExit(
            f"missing {fno_path}: the FNO leg has not produced test metrics "
            "yet (run scripts/run_rebuttal_fno_ns2d.sh, or point --fno-run "
            "at the finished run dir)")
    with open(args.unet_json) as f:
        merged = json.load(f)
    with open(fno_path) as f:
        fno_seeds = [json.load(f)]
    if args.fno_prev_json and os.path.exists(args.fno_prev_json):
        with open(args.fno_prev_json) as f:
            prev = json.load(f)
        prev_fno = next((v for k, v in prev.items()
                         if k.startswith("FNO-128-8m")), None)
        if prev_fno is not None:
            fno_seeds = list(prev_fno.get("seeds", [prev_fno])) + fno_seeds
    if len(fno_seeds) == 1:
        merged["FNO-128-8m (30 epochs)"] = fno_seeds[0]
    else:
        keys = ("test/loss/mse", "test/loss/scaledl2",
                "test/unrolled_loss_mean")
        n = len(fno_seeds)
        agg = {"seeds": fno_seeds, "n_seeds": n}
        for k in keys:
            vals = [s[k] for s in fno_seeds]
            mean = sum(vals) / n
            agg[k] = mean
            agg[k + "_seed_std"] = (
                sum((v - mean) ** 2 for v in vals) / (n - 1)) ** 0.5
        # the rollout row's printed +/- becomes the ACROSS-SEED std (the
        # single-seed rows print the bootstrap std across test trajs)
        agg["test/unrolled_loss_std"] = agg[
            "test/unrolled_loss_mean_seed_std"]
        merged[f"FNO-128-8m (30 epochs, n={n} seeds, "
               "+/- = seed std)"] = agg

    lines = [
        "# Rebuttal table reproduction — FNO vs U-Net (Navier-Stokes 2D)",
        "",
        "FNO-128-8m trained with the reference rebuttal recipe "
        "(30 epochs, AdamW 2e-4, wd 1e-5, warmup 5 / cosine 30, bs 8, "
        "time_history 4, seed 1; `/root/reference/README.md:219-221`) on "
        f"{args.detail}; U-Net rows reproduced below for "
        "comparison).  Metrics on the held-out test split from the "
        "best-validation checkpoint.",
        "",
        "| Model | one-step MSE | one-step ScaledL2 | rollout ScaledL2 "
        "(mean +/- std) |",
        "|---|---|---|---|",
    ]
    for label, m in merged.items():
        if "test/loss/mse_seed_std" in m:   # seed-aggregated FNO row
            lines.append(
                f"| {label} | {m['test/loss/mse']:.3e} +/- "
                f"{m['test/loss/mse_seed_std']:.1e} "
                f"| {m['test/loss/scaledl2']:.4f} +/- "
                f"{m['test/loss/scaledl2_seed_std']:.4f} "
                f"| {m['test/unrolled_loss_mean']:.4f} +/- "
                f"{m['test/unrolled_loss_std']:.4f} |")
        else:
            lines.append(
                f"| {label} | {m['test/loss/mse']:.3e} "
                f"| {m['test/loss/scaledl2']:.4f} "
                f"| {m['test/unrolled_loss_mean']:.4f} +/- "
                f"{m['test/unrolled_loss_std']:.4f} |")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(args.json_out, "w") as f:
        json.dump(merged, f, indent=1)
    print("\n".join(lines))
    print(f"wrote {args.out} and {args.json_out}")


if __name__ == "__main__":
    main()
