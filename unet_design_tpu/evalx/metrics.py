"""Shared evaluation utilities: bootstrap aggregation, rollout losses.

Ports of ``pdearena/pdearena/utils.py:48-62`` (bootstrap mean/std) and the
per-timestep rollout MSE aggregation of ``pdemodel.py:317-375,429-449``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bootstrap(x: np.ndarray, n_members: int = 64, n_bootstrap: int = 1,
              seed: int = 0) -> Tuple[float, float]:
    """Mean and std over bootstrap resamples (``utils.py:48-62``)."""
    rng = np.random.default_rng(seed)
    x = np.asarray(x).ravel()
    means = [x[rng.integers(0, len(x), n_members)].mean()
             for _ in range(max(n_bootstrap, 1))]
    sampled = np.concatenate(
        [x[rng.integers(0, len(x), n_members)] for _ in range(n_bootstrap)]) \
        if n_bootstrap else x
    return float(np.mean(sampled)), float(np.std(sampled))


def rollout_mse_per_step(pred_traj: jnp.ndarray, target_traj: jnp.ndarray
                         ) -> jnp.ndarray:
    """MSE per rollout timestep, averaged over batch/space/fields.

    Inputs (B, T, H, W, C); the reference's NCHW mean dims (0,2,3,4)
    correspond to ours (0, 2, 3, 4) with time kept (``pdemodel.py:372``)."""
    return jnp.mean((pred_traj - target_traj) ** 2, axis=(0, 2, 3, 4))


def rollout_mse_per_sample_step(pred_traj: jnp.ndarray,
                                target_traj: jnp.ndarray) -> jnp.ndarray:
    """Like :func:`rollout_mse_per_step` but keeps the batch axis -> (B, T),
    so whole batches of trajectories roll out in one device call while the
    per-trajectory bootstrap statistics stay identical."""
    return jnp.mean((pred_traj - target_traj) ** 2, axis=(2, 3, 4))


def unrolled_summaries(loss_vec: jnp.ndarray) -> dict:
    """unrolled_loss (sum over steps), cumulative per-step, channel-avg
    (``pdemodel.py:417-427``)."""
    return {
        "unrolled_loss": jnp.sum(loss_vec),
        "loss_timesteps": jnp.cumsum(loss_vec),
    }
