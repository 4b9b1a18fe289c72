"""Generate the model-zoo doc from the registry + benchmark JSONs
(``pdearena/docs/generate_modelzoo.py`` analog)."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from unet_design_tpu.models import registry

    fwd = bwd = train = {}
    for path, target in (("docs/models_fwd_time.json", "fwd"),
                         ("docs/models_fwd_bwd_time.json", "bwd"),
                         ("docs/models_train_step.json", "train")):
        if os.path.exists(path):
            with open(path) as f:
                if target == "fwd":
                    fwd = json.load(f)
                elif target == "bwd":
                    bwd = json.load(f)
                else:
                    train = json.load(f)

    # Published reference numbers (Tesla V100-16GB, bs=8, 4x3x128x128, fp32;
    # pdearena/docs/modelzoo.md:10-48 / models_fwd_time.json) for the models
    # the reference benchmarked — provenance: SURVEY.md §6.
    v100_fwd = {
        "DilResNet-128": 0.118, "FNO-128-8m": 0.056, "U-FNet2-16m": 0.083,
        "UNO-64": 0.065, "UNO-128": 0.158, "Unet2015-64": 0.013,
        "Unetbase-64": 0.021, "Unetmod-64": 0.079,
    }
    v100_bwd = {  # fwd+bwd, same source (modelzoo.md:10-48)
        "DilResNet-128": 0.342, "FNO-128-8m": 0.161, "U-FNet2-16m": 0.200,
        "Unet2015-64": 0.037, "Unetbase-64": 0.046, "Unetmod-64": 0.186,
    }

    lines = ["# Model Zoo", "",
             "Timings: one TPU v5e chip, bs=8, 4x3x128x128, fp32 "
             "(`benchmark/fwdbench.py` / `bwdbench.py`).  V100 columns are "
             "the reference's published numbers (BASELINE.md).", "",
             "| Model | Params | fwd (s) | fwd+bwd (s) "
             "| V100 fwd (s) | fwd speedup | V100 fwd+bwd (s) | bwd speedup |",
             "|---|---|---|---|---|---|---|---|"]
    for name in sorted(registry.MODEL_REGISTRY):
        f = fwd.get(name, {})
        b = bwd.get(name, {})
        params = f.get("params") or b.get("params") or ""
        pm = f"{params/1e6:.1f}M" if params else "-"
        ref_f = v100_fwd.get(name)
        ref_b = v100_bwd.get(name)
        speed_f = (f"{ref_f / f['time_s']:.1f}x"
                   if ref_f and isinstance(f.get("time_s"), float) else "-")
        speed_b = (f"{ref_b / b['time_s']:.1f}x"
                   if ref_b and isinstance(b.get("time_s"), float) else "-")
        lines.append(f"| {name} | {pm} | {f.get('time_s', '-')} | "
                     f"{b.get('time_s', '-')} | {ref_f or '-'} | {speed_f} | "
                     f"{ref_b or '-'} | {speed_b} |")
    # Training-step throughput (beyond-reference: one optimizer step at the
    # NS-2D recipe operating point; benchmark/trainbench.py writes
    # docs/models_train_step.json — regeneration must keep this section
    # (VERDICT r3 weak #3: a hand-written table was once lost on regen).
    if train:
        lines += ["", "## Training-step throughput", "",
                  "One AdamW step (fwd + bwd + update), bs=8 unless noted, "
                  "4x3x128x128, bf16 compute (`benchmark/trainbench.py`). "
                  "MFU is vs the 197 TFLOP/s bf16 peak of one v5e chip.", "",
                  "| Model / dtype | step (s) | steps/s | TFLOP/s | MFU |",
                  "|---|---|---|---|---|"]
        for key in sorted(train):
            e = train[key]
            if "error" in e:
                lines.append(f"| {key} | error | - | - | - |")
                continue
            lines.append(
                f"| {key} | {e.get('time_s', '-')} | "
                f"{e.get('steps_per_s', '-')} | "
                f"{e.get('tflops_per_s', '-')} | "
                f"{e.get('mfu_vs_bf16_peak', '-')} |")
    lines += ["", "## Conditioned models", ""]
    for name in sorted(registry.COND_MODEL_REGISTRY):
        lines.append(f"- {name}")
    os.makedirs("docs", exist_ok=True)
    with open("docs/modelzoo.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote docs/modelzoo.md")


if __name__ == "__main__":
    main()
