"""Task losses — PDE criteria, Dice, multi-resolution summation.

Ports: ``CustomMSELoss`` / ``ScaledLpLoss``
(``pdearena/pdearena/modules/loss.py:7-70``), the Dice coefficient loss
(``wmh/train_pt.py:102-112``) and the multi-res loss summation
(``pdearena/models/pdemodel.py:222-229``).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Union

import jax.numpy as jnp


def scaledlp_loss(pred: jnp.ndarray, target: jnp.ndarray, p: int = 2,
                  reduction: str = "mean") -> jnp.ndarray:
    """Relative Lp error per sample (``loss.py:7-19``)."""
    b = pred.shape[0]
    diff = jnp.linalg.norm((pred - target).reshape(b, -1), ord=p, axis=1)
    tgt = jnp.linalg.norm(target.reshape(b, -1), ord=p, axis=1)
    val = diff / tgt
    if reduction == "mean":
        return jnp.mean(val)
    if reduction == "sum":
        return jnp.sum(val)
    if reduction == "none":
        return val
    raise NotImplementedError(reduction)


def custom_mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
                    reduction: str = "mean") -> jnp.ndarray:
    """MSE averaged over space, summed over time+fields (``loss.py:22-36``).

    Layout note: inputs are (B, T, H, W, C) — space axes (2, 3), time/field
    axes (1, 4); the reference's NCHW equivalent sums dims (1, 2) and averages
    (3, 4).
    """
    loss = (pred - target) ** 2
    reduced = jnp.mean(loss, axis=(2, 3))   # avg space
    reduced = jnp.sum(reduced, axis=(1, 2))  # sum time + fields
    if reduction == "mean":
        return jnp.mean(reduced)
    if reduction == "sum":
        return jnp.sum(reduced)
    if reduction == "none":
        return reduced
    raise NotImplementedError(reduction)


def dice_coef(pred: jnp.ndarray, target: jnp.ndarray,
              smooth: float = 1.0) -> jnp.ndarray:
    """Soft Dice coefficient (``wmh/train_pt.py:102-108``)."""
    p = pred.reshape(-1)
    t = target.reshape(-1)
    intersection = jnp.sum(p * t)
    return (2.0 * intersection + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def dice_coef_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   smooth: float = 1.0) -> jnp.ndarray:
    """``1 - dice`` (``wmh/train_pt.py:110-112``)."""
    return 1.0 - dice_coef(pred, target, smooth)


CRITERIA: dict = {
    "mse": custom_mse_loss,
    "scaledl2": scaledlp_loss,
    "dice": dice_coef_loss,
}


def multires_sum(criterion: Callable, preds: Union[jnp.ndarray, List],
                 targets: Union[jnp.ndarray, List]) -> jnp.ndarray:
    """Sum a criterion over per-level (pred, target) pairs
    (``pdemodel.py:222-229``); pass-through for single tensors."""
    if isinstance(preds, (list, tuple)):
        total = 0.0
        for a, b in zip(preds, targets):
            total = total + criterion(a, b)
        return total
    return criterion(preds, targets)
