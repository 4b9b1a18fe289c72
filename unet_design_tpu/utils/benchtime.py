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
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(l[..., :1, :1]).astype(jnp.float32) for l in leaves
               if hasattr(l, "ndim") and l.ndim >= 2)


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


def roundtrip_seconds() -> float:
    x = jnp.zeros((1, 1), jnp.float32)
    f = jax.jit(lambda a: jnp.sum(a))
    float(f(x))  # warm
    t0 = time.perf_counter()
    float(f(x))
    return time.perf_counter() - t0


def measure(fn: Callable, args: Sequence[Any], n_iters: int = 20,
            n_warmup: int = 2) -> float:
    """Seconds per single ``fn(*args)`` execution on the default backend."""
    repeated = make_repeated(fn, n_iters)
    for _ in range(n_warmup):
        float(repeated(*args))
    rt = roundtrip_seconds()
    t0 = time.perf_counter()
    float(repeated(*args))
    total = time.perf_counter() - t0
    return max(total - rt, 0.0) / n_iters


def measure_unrolled(fn: Callable, args: Sequence[Any], n_iters: int = 10,
                     n_warmup: int = 2) -> float:
    """Like :func:`measure` but with a python-unrolled dependency chain
    instead of ``lax.scan`` — required for Pallas kernels on tunneled TPU
    backends where pallas-inside-scan wedges the device."""

    @jax.jit
    def repeated(*a):
        eps = jnp.float32(1e-30)
        prev = jnp.float32(0.0)
        for _ in range(n_iters):
            out = fn(a[0] + eps * prev, *a[1:])
            prev = _scalar_of(out)
        return prev

    for _ in range(n_warmup):
        float(repeated(*args))
    rt = roundtrip_seconds()
    t0 = time.perf_counter()
    float(repeated(*args))
    total = time.perf_counter() - t0
    return max(total - rt, 0.0) / n_iters
