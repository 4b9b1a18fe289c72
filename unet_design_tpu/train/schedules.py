"""Learning-rate schedules.

- :func:`warmup_lr` — the diff_cifar LambdaLR warmup
  (``diff_cifar/main.py:90-91``): ``lr * min(step, warmup) / warmup``.
- :func:`linear_warmup_cosine_annealing` — pdearena's
  ``LinearWarmupCosineAnnealingLR`` (``pdearena/lr_scheduler.py:11-93``)
  in closed form: linear warmup from ``warmup_start_lr`` to ``base_lr`` over
  ``warmup_epochs`` (reaching ``base_lr`` at epoch ``warmup_epochs - 1``,
  the reference's ``(warmup_epochs - 1)`` divisor), then cosine annealing to
  ``eta_min`` over the remainder.

The reference steps its scheduler once per EPOCH; optax schedules are
evaluated once per OPTIMIZER STEP, so callers must pass ``steps_per_epoch``
to keep the same curriculum.
"""

from __future__ import annotations

import numpy as np
import optax


def warmup_lr(base_lr: float, warmup: int) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp
        return base_lr * jnp.minimum(step, warmup) / warmup
    return schedule


def linear_warmup_cosine_annealing(base_lr: float, warmup_epochs: int,
                                   max_epochs: int,
                                   warmup_start_lr: float = 0.0,
                                   eta_min: float = 0.0,
                                   steps_per_epoch: int = 1
                                   ) -> optax.Schedule:
    """Epoch-denominated warmup+cosine; ``steps_per_epoch`` converts the
    optimizer-step count optax supplies into the reference's epoch clock."""
    def schedule(step):
        import jax.numpy as jnp
        e = step / steps_per_epoch
        # reference closed form (lr_scheduler.py:84): divisor warmup-1
        warm = warmup_start_lr + (base_lr - warmup_start_lr) * jnp.minimum(
            e, warmup_epochs) / jnp.maximum(warmup_epochs - 1, 1)
        warm = jnp.minimum(warm, base_lr)
        t = jnp.clip((e - warmup_epochs) / jnp.maximum(
            max_epochs - warmup_epochs, 1), 0.0, 1.0)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(e < warmup_epochs, warm, cos)
    return schedule
