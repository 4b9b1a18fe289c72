"""Summarize an executed conditioned-PDE run into a docs/ note.

Reads the ``metrics.jsonl`` written by ``tasks/cond_pde.py`` (MetricsLogger)
and emits a markdown artifact documenting the end-to-end run — train loss
trajectory, one-step validation loss at the fixed eval horizon, and the
conditioned-rollout loss — matching the executed-run documentation style of
the other three tasks (reference: ``scripts/cond_train.py:24-28``).
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="runs/cond_pde_ns2d")
    p.add_argument("--out", default="docs/cond_pde_ns2d.md")
    p.add_argument("--json-out", default="docs/cond_pde_ns2d.json")
    p.add_argument("--title", default="Conditioned NS-2D (time + buoyancy "
                                      "scalar), executed run")
    p.add_argument("--detail", default="")
    args = p.parse_args(argv)

    path = os.path.join(args.run, "metrics.jsonl")
    if not os.path.exists(path):
        raise SystemExit(f"no metrics at {path} — did the run finish?")
    train_hist, val_hist = [], []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "train/loss_mean" in rec:
                train_hist.append(rec)
            if "valid/onestep_loss" in rec:
                val_hist.append(rec)
    if not train_hist:
        raise SystemExit("no train epochs logged")

    first, last = train_hist[0], train_hist[-1]
    lines = [f"# {args.title}", ""]
    if args.detail:
        lines += [args.detail, ""]
    lines += [
        f"Run: `{args.run}` ({len(train_hist)} logged epochs).",
        "",
        "| Metric | first epoch | final |",
        "|---|---|---|",
        f"| train loss (epoch mean) | {first['train/loss_mean']:.4e} "
        f"| {last['train/loss_mean']:.4e} |",
    ]
    if val_hist:
        v0, v1 = val_hist[0], val_hist[-1]
        lines.append(f"| valid one-step loss | {v0['valid/onestep_loss']:.4e}"
                     f" | {v1['valid/onestep_loss']:.4e} |")
        if "valid/unrolled_loss_mean" in v1:
            u0 = v0.get("valid/unrolled_loss_mean", float("nan"))
            lines.append(f"| valid conditioned-rollout loss | {u0:.4e} | "
                         f"{v1['valid/unrolled_loss_mean']:.4e} |")
    lines.append("")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    with open(args.json_out, "w") as f:
        json.dump({"train": train_hist, "valid": val_hist}, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
