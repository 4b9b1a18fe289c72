"""Shared conventions for the PDE model zoo.

All PDE-surrogate models take trajectories ``(B, T_history, H, W, C_in)``
(NHWC per frame; the reference is ``(B, T, C, H, W)``) and return
``(B, T_future, H, W, C_out)`` where ``C_in/out = n_scalar + 2 * n_vector``.
Time and field channels are collapsed t-major into the channel axis at model
entry, mirroring ``x.reshape(B, -1, H, W)`` in e.g.
``pdearena/modules/twod_unet.py:521-524``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import jax


def collapse_time(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, H, W, T*C), t-major channel order."""
    assert x.ndim == 5, f"expected 5D trajectory, got {x.shape}"
    b, t, h, w, c = x.shape
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, t * c)


def expand_time(y: jnp.ndarray, n_fields: int) -> jnp.ndarray:
    """(B, H, W, T*C) -> (B, T, H, W, C) with C = n_fields."""
    b, h, w, tc = y.shape
    t = tc // n_fields
    y = y.reshape(b, h, w, t, n_fields)
    return jnp.transpose(y, (0, 3, 1, 2, 4))


def field_channels(n_scalar: int, n_vector: int) -> int:
    return n_scalar + 2 * n_vector


def param_count(params) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params))
