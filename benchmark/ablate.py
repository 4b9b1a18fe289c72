"""Performance ablation probe for the headline Unetbase-64 benchmark.

Times the bench.py model (bs=8, 4x3x128x128) under controlled variants to
attribute wall-clock between convolution FLOPs, GroupNorm bandwidth, dtype,
and per-op overhead, and prints XLA's own cost analysis (FLOPs / bytes) so
the roofline gap is visible.

Usage: python benchmark/ablate.py [--variants base,nonorm,bf16,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(dtype_name: str, norm: bool):
    import jax.numpy as jnp
    from unet_design_tpu.models.unetbase import Unetbase

    dtype = dict(fp32=jnp.float32, bf16=jnp.bfloat16)[dtype_name]
    return Unetbase(n_output_fields=1, time_future=1, hidden_channels=64,
                    activation="gelu", dtype=dtype, norm=norm)


def run_variant(key: str, n_iters: int):
    import jax
    import jax.numpy as jnp
    from unet_design_tpu.utils import benchtime

    dtype_name = "bf16" if "bf16" in key else "fp32"
    norm = "nonorm" not in key
    model = build(dtype_name, norm)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 4, 128, 128, 3), jnp.float32)
    if "bf16" in key:
        x = x.astype(jnp.bfloat16)
    variables = model.init(rng, x)

    def fwd(x, v):  # params as argument: keeps the compile payload small
        return model.apply(v, x)

    t = benchtime.measure(fwd, (x, variables), n_iters=n_iters)
    lowered = jax.jit(fwd).lower(x, variables)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan"))
    bytes_ = cost.get("bytes accessed", float("nan"))
    return {"time_s": round(t, 6),
            "gflops": round(flops / 1e9, 2),
            "gbytes": round(bytes_ / 1e9, 3),
            "achieved_tflops": round(flops / t / 1e12, 2),
            "achieved_gbps": round(bytes_ / t / 1e9, 1)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="base,nonorm,bf16,bf16_nonorm")
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)
    out = {}
    for key in args.variants.split(","):
        out[key] = run_variant(key, args.iters)
        print(key, json.dumps(out[key]), flush=True)


if __name__ == "__main__":
    main()
