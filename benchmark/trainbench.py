"""Training-step throughput benchmark at the PDE recipe operating point.

What the NS-2D reproduction actually pays for: one optimizer step
(fwd + bwd + AdamW update) at bs=8, time_history=4, time_future=1,
3 fields, 128x128 — the reference README recipe configuration
(``/root/reference/README.md:149-157``) — in fp32 and bf16.

Reports seconds/step, steps/s, achieved TFLOP/s and MFU (vs the 197
TFLOP/s bf16 peak of one TPU v5e chip).  Timing is tunnel-safe: N steps
run inside one jitted ``lax.scan`` whose carry is the train state, and the
clock stops on a scalar fetch (see utils/benchtime.py).

Usage: python benchmark/trainbench.py [--models Unetbase-64_G,FNO-128-8m]
       [--out docs/models_train_step.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12   # TPU v5e per-chip bf16 peak


def bench_train_step(name: str, use_bf16: bool, n_iters: int = 20,
                     res: int = 128, batch_size: int = 8):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from unet_design_tpu.models import registry, common
    from unet_design_tpu.process import losses as losses_lib
    from unet_design_tpu.train import trainer, freezing

    model = registry.build_model(
        name, n_scalar_components=1, n_vector_components=1, time_history=4,
        time_future=1, activation="gelu",
        dtype=jnp.bfloat16 if use_bf16 else jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch_size, 4, res, res, 3), jnp.float32)
    y = jax.random.normal(jax.random.fold_in(rng, 1),
                          (batch_size, 1, res, res, 3), jnp.float32)
    variables = model.init(rng, x)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    g_model = name.endswith("_G")

    tx = trainer.make_optimizer(2e-4, optimizer="adamw", weight_decay=1e-5,
                                labels=freezing.all_train_labels(params))

    def loss_fn(p, step_rng, batch):
        bx, by = batch
        if g_model:
            pred = model.apply({"params": p}, bx, n_levels_used=None)
        elif model_state:
            pred, _ = model.apply({"params": p, **model_state}, bx,
                                  train=True,
                                  mutable=list(model_state.keys()))
        else:
            pred = model.apply({"params": p}, bx)
        return losses_lib.custom_mse_loss(pred, by), ()

    raw_step = trainer.make_train_step(loss_fn, tx, jit=False)
    state = trainer.TrainState.create(params, rng, tx.init(params),
                                      ema=False)

    @jax.jit
    def run_n(state, batch):
        def body(st, _):
            st, loss, _aux = raw_step(st, batch)
            return st, loss
        _, losses = jax.lax.scan(body, state, None, length=n_iters)
        return losses[-1]

    # FLOPs of ONE step from the compiled single-step HLO
    single = jax.jit(raw_step)
    flops = None
    try:
        cost = single.lower(state, (x, y)).compile().cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = float(c.get("flops", 0.0)) or None
    except Exception:
        pass

    # warmup (compile) then timed run; scalar fetch anchors the clock.
    # Round-trip comes from benchtime's min-of-N probe (a single-shot probe
    # is dominated by tunnel jitter and can exceed the whole measurement).
    from unet_design_tpu.utils import benchtime
    float(run_n(state, (x, y)))
    rt = benchtime.roundtrip_seconds()
    t0 = time.time()
    float(run_n(state, (x, y)))
    total = time.time() - t0
    t_step = max(total - rt, 1e-9) / n_iters

    out = {"time_s": round(t_step, 6),
           "steps_per_s": round(1.0 / t_step, 2),
           "params": common.param_count(params),
           "dtype": "bf16" if use_bf16 else "fp32"}
    if batch_size != 8:
        out["batch_size"] = batch_size
    if flops:
        out["tflops_per_s"] = round(flops / t_step / 1e12, 1)
        out["mfu_vs_bf16_peak"] = round(flops / t_step / PEAK_BF16, 3)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--models", default="Unetbase-64_G,FNO-128-8m",
                   help="comma list, or 'all' for the full registry")
    p.add_argument("--out", default="docs/models_train_step.json")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtypes", default="fp32,bf16",
                   help="which precisions to measure (fp32,bf16)")
    p.add_argument("--batch-size", type=int, default=8,
                   help="batch size; non-default sizes get a '@bs<N>' key "
                        "suffix so the bs=8 protocol entries are preserved")
    p.add_argument("--skip-existing", action="store_true",
                   help="skip model/dtype keys that already have a "
                        "non-error entry in --out (resumable sweep)")
    args = p.parse_args(argv)

    if args.models == "all":
        from unet_design_tpu.models import registry
        names = sorted(registry.MODEL_REGISTRY)
    else:
        names = args.models.split(",")
    prior = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)

    results = {}
    for name in names:
        for use_bf16 in [d == "bf16" for d in args.dtypes.split(",")]:
            key = f"{name}/{'bf16' if use_bf16 else 'fp32'}"
            if args.batch_size != 8:
                key += f"@bs{args.batch_size}"
            if args.skip_existing and "error" not in prior.get(
                    key, {"error": 1}):
                print(key, "cached", flush=True)
                continue
            try:
                results[key] = bench_train_step(name, use_bf16, args.iters,
                                                batch_size=args.batch_size)
                print(key, json.dumps(results[key]), flush=True)
            except Exception as e:  # keep the sweep alive
                results[key] = {"error": repr(e)[:300]}
                print(key, "ERROR", repr(e)[:200], flush=True)
            # incremental write: an interrupted sweep keeps its progress
            existing = {}
            if os.path.exists(args.out):
                with open(args.out) as f:
                    existing = json.load(f)
            existing.update(results)
            with open(args.out, "w") as f:
                json.dump(existing, f, indent=1, sort_keys=True)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
