"""Roofline attribution of the FNO train step (VERDICT r2 #7).

``docs/modelzoo.md`` (round 2) showed FNO-128-8m training at ~4.7% MFU while
Unetbase_G reaches 36%.  This probe decomposes the recipe-point train step
(bs=8, 4x3x128x128, bf16 module dtype) into its physically distinct parts and
times each one tunnel-safely, so the MFU number is *attributed* rather than
guessed:

- ``train`` / ``fwd``     — the full optimizer step and forward pass.
- ``spectral_fwd/train``  — the 8 SpectralConv2d layers alone (the FNO trunk
  has 4 FourierBasicBlocks x 2 spectral convs, run at 137x137 after the
  reference's +9 padding, ``twod_resnet.py:219``).
- ``dft_roundtrip``       — only the truncated-DFT transform matmuls
  (``_trunc_rfft2`` + ``_trunc_irfft2``), which run in fp32 at
  precision=HIGHEST for FFT-parity: on TPU that is 6-pass bf16, i.e. a
  ~6x FLOP multiplier the cost analysis does NOT see.
- ``mode_mix``            — only the per-mode channel-mixing einsum (the
  fused single-einsum form, ops/spectral.py::_mode_mix_ri): a batch of
  (bs, 2C, 2C) matmuls over the kept modes — at bs=8 only 8/128 MXU rows
  are live, so its ceiling is ~6% of peak *by shape*.
- ``pointwise``           — the non-spectral residual path (1x1 convs).

Prints one JSON line per variant and writes ``docs/fno_ablation.json``.

Usage: python benchmark/ablate_fno.py [--out docs/fno_ablation.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12   # TPU v5e per-chip bf16 peak


def _cost(fn, args):
    import jax
    try:
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        c = cost[0] if isinstance(cost, (list, tuple)) else cost
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _report(key, t, flops, bytes_):
    rec = {"variant": key, "time_ms": round(t * 1e3, 3)}
    if flops:
        rec["gflops"] = round(flops / 1e9, 2)
        rec["achieved_tflops"] = round(flops / t / 1e12, 2)
        rec["mfu_vs_bf16_peak"] = round(flops / t / PEAK_BF16, 4)
    if bytes_:
        rec["gbytes"] = round(bytes_ / 1e9, 3)
        rec["achieved_gbps"] = round(bytes_ / t / 1e9, 1)
    print(json.dumps(rec), flush=True)
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="docs/fno_ablation.json")
    p.add_argument("--model", default="FNO-128-8m")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from unet_design_tpu.models import registry
    from unet_design_tpu.ops import spectral
    from unet_design_tpu.utils import benchtime

    results = {}

    # ---- full train step & fwd (identical protocol to trainbench) --------
    from benchmark.trainbench import bench_train_step
    tr = bench_train_step(args.model, use_bf16=True)
    results["train"] = _report("train", tr["time_s"],
                               tr.get("tflops_per_s", 0) * tr["time_s"] * 1e12,
                               0.0)
    results["train"].update(
        {k: tr[k] for k in ("steps_per_s", "mfu_vs_bf16_peak") if k in tr})

    model = registry.build_model(
        args.model, n_scalar_components=1, n_vector_components=1,
        time_history=4, time_future=1, activation="gelu",
        dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 4, 128, 128, 3), jnp.float32)
    variables = model.init(rng, x)

    def fwd(x, v):
        return model.apply(v, x)

    t = benchtime.measure(fwd, (x, variables))
    results["fwd"] = _report("fwd", t, *_cost(fwd, (x, variables)))

    # ---- component stacks at the trunk operating point -------------------
    # FNO-128-8m: 4 FourierBasicBlocks x (2 spectral + 2 pointwise convs),
    # run at 137x137x128 (reference pads +9 before the trunk).
    n_spectral = 8
    planes, m = 128, int(args.model.split("-")[-1].rstrip("m"))
    h = jax.random.normal(rng, (8, 137, 137, planes), jnp.bfloat16)

    sconv = spectral.SpectralConv2d(planes, m, m)
    sparams = [sconv.init(jax.random.fold_in(rng, i), h)["params"]
               for i in range(n_spectral)]

    def spectral_stack(h, ps):
        for p in ps:
            h = sconv.apply({"params": p}, h)
        return h

    t = benchtime.measure(spectral_stack, (h, sparams))
    results["spectral_fwd"] = _report(
        "spectral_fwd", t, *_cost(spectral_stack, (h, sparams)))

    def spectral_train(ps, h):
        return jnp.mean(spectral_stack(h, ps).astype(jnp.float32) ** 2)

    gfn = jax.value_and_grad(spectral_train)

    def spectral_fwdbwd(h, ps):
        loss, g = gfn(ps, h)
        return loss + sum(jnp.sum(v.astype(jnp.float32))
                          for v in jax.tree_util.tree_leaves(g)) * 0.0

    t = benchtime.measure(spectral_fwdbwd, (h, sparams))
    results["spectral_fwdbwd"] = _report(
        "spectral_fwdbwd", t, *_cost(spectral_fwdbwd, (h, sparams)))

    # ---- DFT transforms alone (fp32 @ HIGHEST) ----------------------------
    def dft_roundtrip(h):
        out = h
        for _ in range(n_spectral):
            re, im = spectral._trunc_rfft2(out.astype(jnp.float32), m, m)
            out = spectral._trunc_irfft2(re, im, 137, 137).astype(jnp.bfloat16)
        return out

    t = benchtime.measure(dft_roundtrip, (h,))
    results["dft_roundtrip"] = _report(
        "dft_roundtrip", t, *_cost(dft_roundtrip, (h,)))

    # ---- mode mixing alone (fused single einsum) --------------------------
    xr = jax.random.normal(rng, (8, 2 * m, m, planes), jnp.float32)
    xi = jax.random.normal(jax.random.fold_in(rng, 1), xr.shape, jnp.float32)
    wmix = [jax.random.normal(jax.random.fold_in(rng, 2 + i),
                              (planes, planes, 2 * m, m, 2), jnp.float32)
            for i in range(n_spectral)]

    def mode_mix(xr, xi, ws):
        for w in ws:
            xr, xi = spectral._mode_mix_ri("bxyi,ioxy->bxyo", xr, xi, w)
        return xr + xi

    t = benchtime.measure(mode_mix, (xr, xi, wmix))
    results["mode_mix"] = _report("mode_mix", t,
                                  *_cost(mode_mix, (xr, xi, wmix)))

    # ---- pointwise residual path alone ------------------------------------
    import flax.linen as nn

    class Pointwise(nn.Module):
        @nn.compact
        def __call__(self, h):
            for i in range(n_spectral):
                h = nn.gelu(nn.Conv(planes, (1, 1), dtype=jnp.bfloat16,
                                    name=f"c{i}")(h))
            return h

    pw = Pointwise()
    pparams = pw.init(rng, h)

    def pointwise(h, v):
        return pw.apply(v, h)

    t = benchtime.measure(pointwise, (h, pparams))
    results["pointwise"] = _report("pointwise", t,
                                   *_cost(pointwise, (h, pparams)))

    full = results["train"]["time_ms"]
    for k in ("spectral_fwdbwd", "dft_roundtrip", "mode_mix", "pointwise"):
        results[k]["share_of_train_pct"] = round(
            100.0 * results[k]["time_ms"] / full, 1)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
