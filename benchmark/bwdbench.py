"""Forward+backward benchmark over the model registry
(``pdearena/benchmark/bwdbench.py`` analog; writes models_fwd_bwd_time.json)."""

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
    y = jax.random.normal(rng, (8, 1, res, res, 3), jnp.float32)
    variables = model.init(rng, x)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(x, p):
        # params passed as an argument (closure constants bloat the compile
        # payload); grad w.r.t. p exercises the full backward pass.
        def inner(p, x):
            pred = model.apply({"params": p, **rest}, x)
            return jnp.mean((pred - y) ** 2)
        l, grads = jax.value_and_grad(inner)(p, x)
        return grads

    t = benchtime.measure(loss, (x, params), n_iters=n_repeats)
    return {"time_s": round(t, 6), "params": common.param_count(params)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--models", default=None)
    p.add_argument("--out", default="docs/models_fwd_bwd_time.json")
    p.add_argument("--repeats", type=int, default=10)
    p.add_argument("--isolate", action="store_true",
                   help="one subprocess per model (a backend failure cannot "
                        "poison the rest of the sweep)")
    p.add_argument("--one", default=None, help=argparse.SUPPRESS)
    p.add_argument("--skip-existing", action="store_true",
                   help="merge into the existing output and skip models "
                        "that already have a non-error entry (resumable)")
    args = p.parse_args(argv)

    if args.one:
        print("RESULT " + json.dumps(bench_model(args.one, args.repeats)),
              flush=True)
        return

    from benchmark.common import sweep
    from unet_design_tpu.models import registry
    names = (args.models.split(",") if args.models
             else sorted(registry.MODEL_REGISTRY))
    sweep(names, bench_model, args.out, args.isolate, __file__, args.repeats,
          skip_existing=args.skip_existing)


if __name__ == "__main__":
    main()
