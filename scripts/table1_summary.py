"""Collect the three NS-2D encoder-ablation arms into the Table-1 artifact.

Paper Table 1 (``/root/reference/README.md:149-157``): Unetbase-64_G with
(a) classical encoder, (b) DWT (Multi-ResNet) encoder, (c) DWT encoder with
the saved parameters re-spent as extra decoder ResNet layers.  Reads each
arm's ``test_metrics.json`` written by ``scripts/eval_pde.py`` and emits a
markdown table plus a merged JSON artifact.

  python scripts/table1_summary.py [--out docs/table1_ns2d.md] \
      [--arms "classical=runs/table1_classical" "dwt=runs/table1_dwt" ...]
"""
from __future__ import annotations

import argparse
import json
import os

ARMS = [
    ("classical encoder", "runs/table1_classical"),
    ("DWT encoder (Multi-ResNet)", "runs/table1_dwt"),
    ("DWT encoder + 3 extra decoder layers", "runs/table1_dwt_dec"),
]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/table1_ns2d.md")
    p.add_argument("--json-out", default="docs/table1_ns2d.json")
    p.add_argument("--title", default="NS-2D encoder ablation")
    p.add_argument("--arms", nargs="*", default=None,
                   help="label=rundir pairs (default: the NS-2D arms)")
    args = p.parse_args(argv)

    if args.arms:
        bad = [a for a in args.arms if "=" not in a]
        if bad:
            p.error(f"--arms entries must be label=rundir, got {bad}")
        arms = [tuple(a.split("=", 1)) for a in args.arms]
    else:
        arms = ARMS
    rows, merged = [], {}
    for label, run in arms:
        path = os.path.join(run, "test_metrics.json")
        if not os.path.exists(path):
            print(f"missing {path}; skipping {label!r}")
            continue
        with open(path) as f:
            m = json.load(f)
        merged[label] = m
        rows.append((label, m))

    lines = [
        f"# Paper Table 1 reproduction — {args.title}",
        "",
        "Unetbase-64_G encoder arms under one shared recipe and dataset "
        "(see the corresponding `configs/` yaml for the documented scaled "
        "protocol, held constant across arms).  Metrics on the held-out "
        "test split from the best-validation checkpoint.",
        "",
        "| Arm | one-step MSE | one-step ScaledL2 | rollout ScaledL2 "
        "(mean +/- std) |",
        "|---|---|---|---|",
    ]
    for label, m in rows:
        lines.append(
            f"| {label} | {m['test/loss/mse']:.3e} "
            f"| {m['test/loss/scaledl2']:.4f} "
            f"| {m['test/unrolled_loss_mean']:.4f} +/- "
            f"{m['test/unrolled_loss_std']:.4f} |")
    lines.append("")
    md = "\n".join(lines)
    with open(args.out, "w") as f:
        f.write(md)
    with open(args.json_out, "w") as f:
        json.dump(merged, f, indent=1)
    print(md)
    print("wrote", args.out, "and", args.json_out)


if __name__ == "__main__":
    main()
