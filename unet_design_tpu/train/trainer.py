"""Training core: functional train state, staged optimizers, jitted steps.

Replaces the reference's three hand-rolled loops (``diff_cifar/main.py:276+``,
``pdearena`` Lightning, ``wmh/train_pt.py:513+``) with one functional core:

- :class:`TrainState` — params / EMA / optimizer state / PRNG, a pytree.
- :func:`make_optimizer` — per-stage optax chain (the reference re-creates
  Adam + warmup at every stage, ``diff_cifar/main.py:374-377``), with
  staged freezing expressed as ``optax.multi_transform`` over label trees.
- :func:`make_train_step` — one jitted step: grad, clip, update, EMA; with
  donated state for in-place buffer reuse on TPU.

Stage loops live in ``unet_design_tpu.tasks`` — stage boundaries change the
trainable set and loss structure, so each (stage, n_levels_used) pair gets its
own compiled step, exactly n_stages compilations.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from unet_design_tpu.train import freezing as freezing_lib
from unet_design_tpu.train.ema import ema_update


# Chain/bench drain protocol (bench.py::_drain_chains): a stop file asks any
# TPU-holding trainer to checkpoint and exit at its next step/epoch boundary,
# so the round-end bench capture never contends with a long stage or arm.
# Task modules re-export this tuple so tests can monkeypatch per-module.
STOP_FILES = ("/tmp/r3_stop", "/tmp/r4_stop", "/tmp/r4b_stop",
              "/tmp/r4c_stop", "/tmp/r5_stop")


def stop_file_present(paths) -> Optional[str]:
    for s in paths:
        if os.path.exists(s):
            return s
    return None


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    rng: jax.Array
    model_state: Any = None  # e.g. batch_stats for BatchNorm models

    @classmethod
    def create(cls, params, rng, opt_state, ema: bool = True,
               model_state=None) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   ema_params=jax.tree_util.tree_map(jnp.copy, params)
                   if ema else None,
                   opt_state=opt_state, rng=rng, model_state=model_state)


def make_optimizer(learning_rate, grad_clip: Optional[float] = None,
                   labels: Optional[Any] = None, optimizer: str = "adam",
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Optax chain: [clip] -> adam/adamw[(schedule)], with optional staged
    freezing via a 'train'/'frozen' label tree."""
    parts = []
    if grad_clip is not None:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if optimizer == "adam":
        parts.append(optax.adam(learning_rate))
    elif optimizer == "adamw":
        parts.append(optax.adamw(learning_rate, weight_decay=weight_decay))
    else:
        raise NotImplementedError(optimizer)
    tx = optax.chain(*parts)
    if labels is not None:
        tx = optax.multi_transform(
            {freezing_lib.TRAIN: tx,
             freezing_lib.FROZEN: optax.set_to_zero()}, labels)
    return tx


LossFn = Callable[..., Tuple[jnp.ndarray, Any]]


def make_train_step(loss_fn: LossFn, tx: optax.GradientTransformation,
                    ema_decay: Optional[float] = None,
                    trainable_mask: Optional[Any] = None,
                    has_model_state: bool = False,
                    with_grad_norm: bool = False,
                    jit: bool = True) -> Callable:
    """Build a (jitted, state-donating) train step.

    ``loss_fn(params, rng, batch)`` -> ``(loss, aux)``, or with
    ``has_model_state``: ``loss_fn(params, model_state, rng, batch)`` ->
    ``(loss, (aux, new_model_state))``.

    ``with_grad_norm=True`` appends the pre-clip global gradient norm to the
    return tuple — the analog of the reference's ``wandb.watch(model)``
    gradient tracking (``diff_mnist/main.py:188``).
    """

    def step(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)
        if has_model_state:
            (loss, (aux, new_mstate)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.model_state, sub,
                                       batch)
        else:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, sub, batch)
            new_mstate = state.model_state
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if ema_decay is not None and state.ema_params is not None:
            ema_params = ema_update(state.ema_params, params, ema_decay,
                                    trainable_mask)
        else:
            ema_params = state.ema_params
        new_state = state.replace(step=state.step + 1, params=params,
                                  ema_params=ema_params,
                                  opt_state=opt_state, rng=rng,
                                  model_state=new_mstate)
        if with_grad_norm:
            return new_state, loss, aux, optax.global_norm(grads)
        return new_state, loss, aux

    if jit:
        return jax.jit(step, donate_argnums=(0,))
    return step


@dataclasses.dataclass
class StageSpec:
    """One stage of the staged (sequential) training algorithm."""

    index: int
    n_stages: int
    num_iterations: int
    n_levels_used: int
    n_downsample: int

    @classmethod
    def from_schedule(cls, schedule, n_levels: int):
        """``NUM_ITERATIONS_LIST`` / ``num_epochs_list`` semantics: the list
        length is the number of stages; stage j trains at resolution
        ``highest / 2^(n_levels-1-j)`` with j+1 levels — the downsample count
        comes from the MODEL's level count, not the stage count
        (``diff_cifar/main.py:290-293``: ``resolutions`` has ``n_levels``
        entries and ``cur_res = resolutions[-(j+1)]``), so a schedule shorter
        than ``n_levels`` never reaches full resolution, exactly like the
        reference."""
        n_stages = len(schedule)
        out = []
        for j, iters in enumerate(schedule):
            if n_stages == 1:
                out.append(cls(0, 1, iters, n_levels, 0))
            else:
                assert n_stages <= n_levels, (
                    f"{n_stages} stages but the model only has {n_levels} "
                    "levels (the reference indexes resolutions[-(j+1)])")
                out.append(cls(j, n_stages, iters, j + 1, n_levels - 1 - j))
        return out
