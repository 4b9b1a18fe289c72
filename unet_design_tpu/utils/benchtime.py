"""Benchmark timing that is robust to async / tunneled dispatch.

``block_until_ready`` does not reliably synchronize on remote-tunneled TPU
backends, so wall-clock timing must be anchored on a *data transfer* of a
value that depends on the computation.  We additionally amortize dispatch and
round-trip latency by repeating the computation inside a single jitted
``lax.scan`` whose carry forces a dependency chain between iterations, then
fetch one scalar.

``measure(fn, args, n_iters)`` returns seconds per iteration:
  total = rt + n * t_iter  =>  t_iter = (total - rt) / n
where rt is measured with a trivial transfer.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


def _scalar_of(tree: Any) -> jnp.ndarray:
    """float32 scalar depending on every leaf (corner elements only, to
    keep the dependency cheap).  Must ALWAYS return float32 — a python-int
    0 fallback (e.g. scalar-returning fns) changes the scan carry dtype."""
    total = jnp.float32(0.0)
    for l in jax.tree_util.tree_leaves(tree):
        if hasattr(l, "ndim"):
            part = l[..., :1, :1] if l.ndim >= 2 else l
            total = total + jnp.sum(part).astype(jnp.float32)
    return total


def make_repeated(fn: Callable, n_iters: int) -> Callable:
    """Build jit(fn repeated n_iters times with a forced dependency chain)."""

    @jax.jit
    def repeated(*args):
        def body(carry, _):
            # fold a negligible function of the previous output into the
            # first argument to serialize iterations without changing math
            eps, prev = carry
            args2 = (args[0] + eps * prev,) + args[1:]
            out = fn(*args2)
            return (eps, _scalar_of(out)), None

        (eps, last), _ = jax.lax.scan(
            body, (jnp.float32(1e-30), jnp.float32(0.0)), None,
            length=n_iters)
        return last

    return repeated


def roundtrip_seconds(n_probe: int = 5) -> float:
    """Min-of-``n_probe`` trivial-transfer round-trips (the tunnel adds
    hundreds of ms of jitter; min is the stable floor)."""
    x = jnp.zeros((1, 1), jnp.float32)
    f = jax.jit(lambda a: jnp.sum(a))
    float(f(x))  # warm
    best = float("inf")
    for _ in range(n_probe):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def _timed_total(repeated: Callable, args: Sequence[Any],
                 n_repeat: int = 3) -> float:
    best = float("inf")
    for _ in range(n_repeat):
        t0 = time.perf_counter()
        float(repeated(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def measure(fn: Callable, args: Sequence[Any], n_iters: int = 20,
            n_warmup: int = 2, max_iters: int = 20480) -> float:
    """Seconds per single ``fn(*args)`` execution on the default backend.

    Adaptive: if ``n_iters`` executions don't clear the round-trip noise
    floor (sub-ms kernels on a ~100 ms tunnel), the iteration count doubles
    (recompiling the scan) until the measured excess is at least half the
    round-trip or 50 ms."""
    rt = roundtrip_seconds()
    while True:
        repeated = make_repeated(fn, n_iters)
        for _ in range(n_warmup):
            float(repeated(*args))
        total = _timed_total(repeated, args)
        if (total - rt >= max(0.5 * rt, 0.05)) or n_iters >= max_iters:
            return max(total - rt, 1e-9) / n_iters
        n_iters = min(n_iters * 2, max_iters)


def measure_unrolled(fn: Callable, args: Sequence[Any], n_iters: int = 10,
                     n_warmup: int = 2, max_iters: int = 512) -> float:
    """Like :func:`measure` but with a python-unrolled dependency chain
    instead of ``lax.scan`` — required for Pallas kernels on tunneled TPU
    backends where pallas-inside-scan wedges the device.  Adaptive like
    :func:`measure` (capped lower: the chain is unrolled into the graph)."""

    def build(n):
        @jax.jit
        def repeated(*a):
            eps = jnp.float32(1e-30)
            prev = jnp.float32(0.0)
            for _ in range(n):
                out = fn(a[0] + eps * prev, *a[1:])
                prev = _scalar_of(out)
            return prev
        return repeated

    rt = roundtrip_seconds()
    while True:
        repeated = build(n_iters)
        for _ in range(n_warmup):
            float(repeated(*args))
        total = _timed_total(repeated, args)
        if (total - rt >= max(0.5 * rt, 0.05)) or n_iters >= max_iters:
            return max(total - rt, 1e-9) / n_iters
        n_iters = min(n_iters * 2, max_iters)
