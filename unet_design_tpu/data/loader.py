"""Host-side data loading utilities: batching, shuffling, device prefetch.

The reference uses torch DataLoader + an ``infiniteloop`` generator
(``diff_cifar/main.py:85-88``).  TPU-native equivalent: numpy batching on the
host with an asynchronous double-buffered prefetch onto the device so the
input pipeline overlaps with the compute step.
"""

from __future__ import annotations

import collections
import itertools
import threading
import queue as queue_lib
from typing import Any, Callable, Iterable, Iterator, Optional, Sequence

import jax
import numpy as np


def epoch_batches(arrays: Sequence[np.ndarray], batch_size: int,
                  rng: Optional[np.random.Generator] = None,
                  shuffle: bool = True, drop_last: bool = True
                  ) -> Iterator[tuple]:
    """One epoch of (optionally shuffled) aligned batches from host arrays."""
    n = arrays[0].shape[0]
    idx = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    end = n - (n % batch_size) if drop_last else n
    for s in range(0, end, batch_size):
        sel = idx[s:s + batch_size]
        yield tuple(a[sel] for a in arrays)


def infinite_batches(arrays: Sequence[np.ndarray], batch_size: int,
                     seed: int = 0, shuffle: bool = True,
                     start_step: int = 0) -> Iterator[tuple]:
    """``infiniteloop`` equivalent: endless reshuffled epochs.

    ``start_step`` fast-forwards the stream to where it would be after that
    many batches had already been drawn — replaying only the cheap index
    permutations, not the data — so a resumed run consumes exactly the same
    batch sequence as an uninterrupted one (full-fidelity resume).
    """
    rng = np.random.default_rng(seed)
    n = arrays[0].shape[0]
    per_epoch = max(1, n // batch_size)  # epoch_batches drops the tail
    for _ in range(start_step // per_epoch):
        rng.shuffle(np.arange(n))  # consume exactly one epoch's randomness
    skip = start_step % per_epoch
    while True:
        for i, batch in enumerate(epoch_batches(arrays, batch_size, rng,
                                                shuffle)):
            if i >= skip:
                yield batch
        skip = 0


def shard_for_process(items: Sequence[Any],
                      process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> list:
    """Multi-host data sharding — keys off ``jax.process_index`` exactly where
    the reference keys off ``dist.get_rank()``
    (``datapipes/shallowwater2d.py:68-87``)."""
    pi = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    return list(itertools.islice(items, pi, None, pc))


def prefetch_to_device(iterator: Iterable, size: int = 2,
                       sharding=None) -> Iterator:
    """Asynchronously stage host batches onto the device.

    A background thread runs ``jax.device_put`` (non-blocking) ``size`` items
    ahead, double-buffering H2D transfers behind compute.
    """
    q: queue_lib.Queue = queue_lib.Queue(maxsize=size)
    _END = object()

    def put(item):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), item)
        return jax.tree_util.tree_map(jax.device_put, item)

    def producer():
        try:
            for item in iterator:
                q.put(put(item))
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        yield item
