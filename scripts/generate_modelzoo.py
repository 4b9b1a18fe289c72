"""Generate the model-zoo doc from the registry + benchmark JSONs
(``pdearena/docs/generate_modelzoo.py`` analog)."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from unet_design_tpu.models import registry

    fwd = bwd = {}
    for path, target in (("docs/models_fwd_time.json", "fwd"),
                         ("docs/models_fwd_bwd_time.json", "bwd")):
        if os.path.exists(path):
            with open(path) as f:
                if target == "fwd":
                    fwd = json.load(f)
                else:
                    bwd = json.load(f)

    # Published reference numbers (Tesla V100-16GB, bs=8, 4x3x128x128, fp32;
    # pdearena/docs/modelzoo.md:10-48 / models_fwd_time.json) for the models
    # the reference benchmarked — provenance: SURVEY.md §6.
    v100_fwd = {
        "DilResNet-128": 0.118, "FNO-128-8m": 0.056, "U-FNet2-16m": 0.083,
        "UNO-64": 0.065, "UNO-128": 0.158, "Unet2015-64": 0.013,
        "Unetbase-64": 0.021, "Unetmod-64": 0.079,
    }

    lines = ["# Model Zoo", "",
             "Timings: one TPU v5e chip, bs=8, 4x3x128x128, fp32 "
             "(`benchmark/fwdbench.py` / `bwdbench.py`).", "",
             "| Model | Params | fwd time (s) | fwd+bwd time (s) "
             "| V100 fwd (s) | speedup |",
             "|---|---|---|---|---|---|"]
    for name in sorted(registry.MODEL_REGISTRY):
        f = fwd.get(name, {})
        b = bwd.get(name, {})
        params = f.get("params") or b.get("params") or ""
        pm = f"{params/1e6:.1f}M" if params else "-"
        ref = v100_fwd.get(name)
        speed = (f"{ref / f['time_s']:.1f}x"
                 if ref and isinstance(f.get("time_s"), float) else "-")
        lines.append(f"| {name} | {pm} | {f.get('time_s', '-')} | "
                     f"{b.get('time_s', '-')} | {ref or '-'} | {speed} |")
    lines += ["", "## Conditioned models", ""]
    for name in sorted(registry.COND_MODEL_REGISTRY):
        lines.append(f"- {name}")
    os.makedirs("docs", exist_ok=True)
    with open("docs/modelzoo.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote docs/modelzoo.md")


if __name__ == "__main__":
    main()
