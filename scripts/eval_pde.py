"""Evaluate a trained PDE checkpoint on the held-out test split.

The reference runs ``trainer.test(ckpt_path="best")`` after fit
(``pdearena/scripts/train.py:82``); this is the standalone analog — loads
the best-validation checkpoint (or the latest full-state one), stages the
test split in device HBM, and reports the one-step and unrolled-rollout
losses with bootstrap statistics.

  python scripts/eval_pde.py --config configs/pde_ns2d_table1.yaml \
      [dotted.overrides=...] [--ckpt best|latest] [--split test]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", default="best", choices=["best", "latest"])
    p.add_argument("--split", default="test")
    p.add_argument("--out", default=None,
                   help="JSON output path (default <logdir>/<split>_metrics.json)")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import jax
    import numpy as np

    from unet_design_tpu.data import pde as pde_data
    from unet_design_tpu.tasks import pde as pde_task
    from unet_design_tpu.train.checkpoint import CheckpointManager
    from unet_design_tpu.utils import config as config_lib

    cfg = config_lib.from_yaml(pde_task.Config, args.config)
    cfg = config_lib.apply_overrides(cfg, args.overrides)

    model = pde_task.build_model(cfg)
    pde = pde_task.pde_config(cfg.data)
    x_init = jnp.zeros((1, cfg.data.time_history, cfg.data.resolution,
                        cfg.data.resolution,
                        pde.n_scalar_components
                        + 2 * pde.n_vector_components))
    variables = model.init(jax.random.PRNGKey(0), x_init)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}

    sub = "ckpt" if args.ckpt == "best" else "ckpt_latest"
    mgr = CheckpointManager(os.path.join(cfg.train.logdir, sub))
    step = mgr.latest_step()
    raw = mgr.restore_raw(step)
    to_tree = lambda t, like: jax.tree_util.tree_map(
        lambda _, v: jnp.asarray(v), like, t)
    params = to_tree(raw["params"], params)
    if model_state and "model_state" in raw:
        model_state = to_tree(raw["model_state"], model_state)
    print(f"loaded {args.ckpt} checkpoint step {step} "
          f"from {cfg.train.logdir}/{sub}", flush=True)

    opener = pde_data.cached_opener(
        pde_task.open_trajectories(cfg.data, args.split),
        pde.n_scalar_components, pde_task.stack_cache_dir(cfg.data))
    fields = jnp.asarray(opener.stacked_fields())
    print(f"{args.split} set staged: {fields.shape}", flush=True)

    n_levels = getattr(model, "n_levels", None)
    g_model = pde_task.is_g_model(cfg.model.name)
    n_levels_used = n_levels if g_model else None
    result = pde_task.validate_device(cfg, model, params, model_state, pde,
                                      n_levels_used, 0, fields)
    result = {k.replace("valid/", f"{args.split}/"): float(v)
              for k, v in result.items()}
    result["checkpoint_step"] = int(step)
    print(json.dumps(result, indent=1), flush=True)
    out = args.out or os.path.join(cfg.train.logdir,
                                   f"{args.split}_metrics.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
