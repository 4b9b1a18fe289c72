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

    lines = ["# Model Zoo", "",
             "| Model | Params | fwd time (s) | fwd+bwd time (s) |",
             "|---|---|---|---|"]
    for name in sorted(registry.MODEL_REGISTRY):
        f = fwd.get(name, {})
        b = bwd.get(name, {})
        params = f.get("params") or b.get("params") or ""
        pm = f"{params/1e6:.1f}M" if params else "-"
        lines.append(f"| {name} | {pm} | {f.get('time_s', '-')} | "
                     f"{b.get('time_s', '-')} |")
    lines += ["", "## Conditioned models", ""]
    for name in sorted(registry.COND_MODEL_REGISTRY):
        lines.append(f"- {name}")
    os.makedirs("docs", exist_ok=True)
    with open("docs/modelzoo.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote docs/modelzoo.md")


if __name__ == "__main__":
    main()
