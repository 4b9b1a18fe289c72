"""Forward-pass benchmark over the model registry.

Re-design of ``pdearena/benchmark/fwdbench.py:27-77``: times every registry
model at the reference configuration (bs=8, time_history=4, 3 fields,
128x128, fp32), writing the same JSON schema as
``pdearena/docs/models_fwd_time.json`` (model -> {time_s, params}).

Usage: python benchmark/fwdbench.py [--models A,B,...] [--out path.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_model(name: str, n_repeats: int = 10, res: int = 128):
    import jax
    import jax.numpy as jnp
    from unet_design_tpu.models import registry, common
    from unet_design_tpu.utils import benchtime

    model = registry.build_model(name, n_scalar_components=1,
                                 n_vector_components=1, time_history=4,
                                 time_future=1, activation="gelu")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 4, res, res, 3), jnp.float32)
    variables = model.init(rng, x)

    # Pass variables as an argument, NOT a closure: closed-over params are
    # embedded as HLO constants, which bloats the compile payload (remote
    # tunneled compilers reject >100s-of-MB bodies) and forces per-weight
    # recompilation.
    def fwd(x, v):
        return model.apply(v, x)

    t = benchtime.measure(fwd, (x, variables), n_iters=n_repeats)
    return {"time_s": round(t, 6),
            "params": common.param_count(variables.get("params", variables))}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--models", default=None)
    p.add_argument("--out", default="docs/models_fwd_time.json")
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--isolate", action="store_true",
                   help="run each model in its own subprocess so one backend "
                        "failure cannot poison the rest of the sweep")
    p.add_argument("--one", default=None, help=argparse.SUPPRESS)
    args = p.parse_args(argv)

    if args.one:  # subprocess worker mode: one model, one JSON line
        print("RESULT " + json.dumps(bench_model(args.one, args.repeats)),
              flush=True)
        return

    from benchmark.common import sweep
    from unet_design_tpu.models import registry
    names = (args.models.split(",") if args.models
             else sorted(registry.MODEL_REGISTRY))
    sweep(names, bench_model, args.out, args.isolate, __file__, args.repeats)


if __name__ == "__main__":
    main()
