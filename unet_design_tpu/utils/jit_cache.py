"""Identity-keyed build cache for jitted closures.

A fresh ``@jax.jit`` per call discards XLA's compile cache — through the
tunneled TPU backend each re-compile of a scanned train/eval program costs
~90 s, which once dominated epoch time 15:1 (see CLAUDE.md).  Modules that
build jitted closures around a live model object therefore memoize them in
a module-level dict keyed on the model's identity plus every static that
shapes the traced program.

This helper centralizes that pattern (it used to be hand-rolled in
tasks/pde.py, tasks/cond_pde.py, and tasks/diff_cifar.py).  Entries hold
strong references to the anchor objects so their ``id()`` can never be
recycled while an entry is alive; a hit is additionally verified with
``is`` against every anchor.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Sequence, Tuple


def cached_build(cache: Dict[Any, Tuple[tuple, Any]],
                 anchors: Sequence[Any],
                 statics: Sequence[Any],
                 builder: Callable[[], Any]) -> Any:
    """Return ``builder()`` memoized in ``cache``.

    ``anchors`` are live objects (model, schedule, ...) whose *identity*
    keys the entry; ``statics`` are hashable values that shape the traced
    program (level counts, window sizes, flags).  The caller owns the cache
    dict, so each module keeps its own lifetime/eviction policy.
    """
    key = tuple(id(a) for a in anchors) + tuple(statics)
    hit = cache.get(key)
    if hit is not None and all(h is a for h, a in zip(hit[0], anchors)):
        return hit[1]
    value = builder()
    cache[key] = (tuple(anchors), value)
    return value
