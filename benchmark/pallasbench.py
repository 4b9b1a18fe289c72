"""On-chip Pallas-vs-XLA benchmark for the fused Haar pyramid kernel.

The integrate-or-delete record (docs/tpu_notes.md): the fused
GroupNorm(+act) kernel measured SLOWER than XLA at every eligible product
shape (0.55x/0.72x; XLA's fused GN+silu is at the HBM roofline) and was
deleted; the fused Haar LL pyramid loses at 32px diffusion shapes (grid of
B*C tiny planes serializes) but wins 3.1x at the 128px PDE multi-res
target shape, where it is integrated behind ``train.use_pallas_haar``.

Pallas-in-scan wedges the tunneled axon backend (CLAUDE.md), so the pallas
paths time with ``measure_unrolled`` and the XLA paths with the same
harness for a like-for-like comparison.

Usage: python benchmark/pallasbench.py [--out docs/pallas_bench.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_haar(shapes, n_levels=4, n_iters=10):
    import jax
    import jax.numpy as jnp
    from unet_design_tpu.ops import wavelet
    from unet_design_tpu.ops.pallas.haar import haar_pyramid_fused
    from unet_design_tpu.utils import benchtime

    results = {}
    for (b, h, w, c) in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c),
                              jnp.float32)

        def xla_pyr(x):
            return tuple(wavelet.dwt_pyramid(x, n_levels))

        def pallas_pyr(x):
            return tuple(haar_pyramid_fused(x, n_levels))

        key = f"haar_b{b}_{h}x{w}x{c}_L{n_levels}"
        try:
            t_x = benchtime.measure_unrolled(xla_pyr, (x,), n_iters)
            t_p = benchtime.measure_unrolled(pallas_pyr, (x,), n_iters)
            results[key] = {"xla_us": round(t_x * 1e6, 1),
                            "pallas_us": round(t_p * 1e6, 1),
                            "speedup": round(t_x / max(t_p, 1e-12), 3)}
        except Exception as e:  # keep the sweep alive
            results[key] = {"error": repr(e)[:200]}
        print(key, results[key], flush=True)
    return results


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/pallas_bench.json")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    results = {}
    results.update(bench_haar(
        [(128, 32, 32, 3), (256, 32, 32, 3), (8, 128, 128, 3)],
        n_levels=4, n_iters=args.iters))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
