"""Profiling / tracing / determinism utilities (SURVEY.md §5 aux subsystems).

The reference's tracing is a wall-clock ``Timer`` + CUDA-sync benchmark
scripts; here the TPU-native equivalents:

- :func:`trace` — ``jax.profiler`` trace context writing a TensorBoard-
  loadable trace directory (the `jax.profiler` replacement for
  ``torch.cuda.synchronize`` timing loops).
- :func:`annotate` — named trace spans (``jax.profiler.TraceAnnotation``).
- :func:`cost_analysis` — XLA FLOPs/bytes estimates for a jitted function,
  replacing the reference's thop FLOPs counter hook
  (``unet/layers.py:393-411``).
- :func:`seed_everything` — the determinism ritual
  (``diff_cifar/main.py:41-43`` etc.): numpy seeding + a root JAX key (JAX is
  deterministic by construction given the key).
- :func:`enable_nan_checks` — the closest analog to Lightning's
  ``detect_anomaly`` flag (``configs/navierstokes2d.yaml:84``).
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def cost_analysis(fn, *args, **kwargs) -> Dict[str, Any]:
    """FLOPs / bytes-accessed estimates from the compiled executable."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return dict(ca or {})


def seed_everything(seed: int) -> jax.Array:
    np.random.seed(seed)
    try:
        import torch
        torch.manual_seed(seed)
    except ImportError:
        pass
    return jax.random.PRNGKey(seed)


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
