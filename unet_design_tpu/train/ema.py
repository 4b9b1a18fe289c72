"""Exponential moving average of parameters, freeze-aware.

Mirrors ``diff_cifar/main.py:57-77``: ``ema = ema * decay + p * (1-decay)``
applied **only to trainable parameters** — frozen parameters keep their EMA
value (the reference skips params whose ``.grad is None``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def ema_update(ema_params: Any, new_params: Any, decay: float,
               trainable_mask: Optional[Any] = None) -> Any:
    def upd(e, p, m=True):
        out = e * decay + p * (1.0 - decay)
        return jnp.where(m, out, e) if not isinstance(m, bool) else (
            out if m else e)

    if trainable_mask is None:
        return jax.tree_util.tree_map(lambda e, p: upd(e, p), ema_params,
                                      new_params)
    return jax.tree_util.tree_map(upd, ema_params, new_params,
                                  trainable_mask)
