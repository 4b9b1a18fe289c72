"""Autoregressive PDE rollout as a single ``lax.scan`` program.

Port of ``pdearena/pdearena/rollout.py:12-97``: feed a ``time_history`` window,
predict ``time_future`` frames, append, slide, repeat ``num_steps`` times.  On
TPU the whole rollout is one compiled scan with the surrogate as its body.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

ModelFn = Callable[[jnp.ndarray], jnp.ndarray]


def rollout2d(model_fn: ModelFn, initial_u: jnp.ndarray,
              initial_v: Optional[jnp.ndarray], time_history: int,
              num_steps: int) -> jnp.ndarray:
    """Rollout (``rollout.py:12-54``).

    Args:
      model_fn: maps (B, time_history, H, W, C) -> (B, time_future, H, W, C);
        close over ``n_levels_used`` for G-models.
      initial_u: (B, >=time_history, H, W, C_scalar) scalar fields.
      initial_v: optional (B, >=time_history, H, W, 2*n_vector) vector fields.
    Returns:
      (B, num_steps * time_future, H, W, C) predicted trajectory.
    """
    if initial_v is not None:
        data = jnp.concatenate([initial_u[:, :time_history],
                                initial_v[:, :time_history]], axis=-1)
    else:
        data = initial_u[:, :time_history]

    def body(window, _):
        pred = model_fn(window)
        new_window = jnp.concatenate([window, pred], axis=1)[:, -time_history:]
        return new_window, pred

    _, preds = jax.lax.scan(body, data, None, length=num_steps)
    # preds: (num_steps, B, time_future, H, W, C) -> concat on time axis
    preds = jnp.moveaxis(preds, 0, 1)
    b, s, tf = preds.shape[0], preds.shape[1], preds.shape[2]
    return preds.reshape(b, s * tf, *preds.shape[3:])


def cond_rollout2d(model_fn: Callable, initial_u: jnp.ndarray,
                   initial_v: Optional[jnp.ndarray],
                   delta_t: Optional[jnp.ndarray],
                   cond: Optional[jnp.ndarray], time_history: int,
                   num_steps: int) -> jnp.ndarray:
    """Conditioned rollout (``rollout.py:57-97``): the model additionally
    receives (delta_t, cond) each step."""
    if initial_v is not None:
        data = jnp.concatenate([initial_u[:, :time_history],
                                initial_v[:, :time_history]], axis=-1)
    else:
        data = initial_u[:, :time_history]

    def body(window, _):
        pred = model_fn(window, delta_t, cond)
        new_window = jnp.concatenate([window, pred], axis=1)[:, -time_history:]
        return new_window, pred

    _, preds = jax.lax.scan(body, data, None, length=num_steps)
    preds = jnp.moveaxis(preds, 0, 1)
    b, s, tf = preds.shape[0], preds.shape[1], preds.shape[2]
    return preds.reshape(b, s * tf, *preds.shape[3:])
