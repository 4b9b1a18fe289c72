"""Conditioned PDE task: time/parameter-conditioned surrogates.

Re-design of ``pdearena/models/cond_pdemodel.py`` + ``scripts/cond_train.py``:
the model receives ``(x, delta_t, z)`` where delta_t is the prediction horizon
and z an optional scalar PDE parameter (e.g. buoyancy); training samples
(start, end) pairs with long-horizon reweighting; evaluation fixes delta_t and
also runs the conditioned rollout (``rollout.cond_rollout2d``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_design_tpu.data import pde as pde_data
from unet_design_tpu.evalx import metrics as eval_metrics
from unet_design_tpu.models import registry
from unet_design_tpu.process import losses as losses_lib
from unet_design_tpu.process import rollout as rollout_lib
from unet_design_tpu.train import trainer, freezing
from unet_design_tpu.train.checkpoint import CheckpointManager
from unet_design_tpu.utils import jit_cache
from unet_design_tpu.utils.config import parse_cli
from unet_design_tpu.utils.logging import MetricsLogger, get_logger
from unet_design_tpu.tasks.pde import DataConfig, open_trajectories, pde_config

log = get_logger(__name__)


@dataclasses.dataclass
class ModelConfig:
    name: str = "Unetmod-64"
    hidden_channels: int = 64
    activation: str = "gelu"
    param_conditioning: Optional[str] = None   # None | 'scalar'
    use_bf16: bool = False


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 10
    lr: float = 2e-4
    criterion: str = "mse"
    seed: int = 0
    eval_delta_t: int = 4
    max_num_steps: int = 4
    val_every_epochs: int = 1
    logdir: str = "runs/cond_pde"


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


def build_model(cfg: Config):
    return registry.build_cond_model(
        cfg.model.name, cfg.data.n_scalar_components,
        cfg.data.n_vector_components, time_history=1, time_future=1,
        activation=cfg.model.activation,
        param_conditioning=cfg.model.param_conditioning,
        hidden_channels=cfg.model.hidden_channels,
        dtype=jnp.bfloat16 if cfg.model.use_bf16 else jnp.float32)


def _batch_cond(window_iter, batch_size, use_z):
    xs, ys, dts, zs = [], [], [], []
    for x, y, dt, cond in window_iter:
        xs.append(x)
        ys.append(y)
        dts.append(dt)
        zs.append(cond if cond is not None else 0.0)
        if len(xs) == batch_size:
            yield (np.concatenate(xs), np.concatenate(ys),
                   np.asarray(dts, np.float32),
                   np.asarray(zs, np.float32) if use_z else None)
            xs, ys, dts, zs = [], [], [], []


def train(cfg: Config):
    rng = jax.random.PRNGKey(cfg.train.seed)
    pde = pde_config(cfg.data)
    model = build_model(cfg)
    use_z = cfg.model.param_conditioning == "scalar"
    criterion = losses_lib.CRITERIA[cfg.train.criterion]

    x_init = jnp.zeros((1, 1, cfg.data.resolution, cfg.data.resolution,
                        pde.n_scalar_components + 2 * pde.n_vector_components))
    t_init = jnp.ones((1,))
    z_init = jnp.ones((1,)) if use_z else None
    init_rng, rng = jax.random.split(rng)
    params = model.init(init_rng, x_init, t_init, z_init)["params"]

    labels = freezing.all_train_labels(params)
    tx = trainer.make_optimizer(cfg.train.lr, labels=labels)
    rng, s_rng = jax.random.split(rng)
    state = trainer.TrainState.create(params, s_rng, tx.init(params),
                                      ema=False)

    def loss_fn(p, step_rng, batch):
        x, y, dt, z = batch
        pred = model.apply({"params": p}, x, dt, z)
        return criterion(pred, y), ()

    step_fn = trainer.make_train_step(loss_fn, tx, jit=True)
    metrics_logger = MetricsLogger(cfg.train.logdir)
    ckpt = CheckpointManager(os.path.join(cfg.train.logdir, "ckpt"))
    step = 0
    for epoch in range(cfg.train.epochs):
        opener = open_trajectories(cfg.data, "train")
        windows = pde_data.random_time_conditioned_windows(
            opener, pde, seed=cfg.train.seed + epoch, cycles=1)
        epoch_losses = []
        for bx, by, bdt, bz in _batch_cond(windows, cfg.data.batch_size,
                                           use_z):
            batch = (jnp.asarray(bx), jnp.asarray(by), jnp.asarray(bdt),
                     jnp.asarray(bz) if bz is not None else None)
            state, loss, _ = step_fn(state, batch)
            epoch_losses.append(float(loss))
            step += 1
        if epoch_losses:
            mean, std = eval_metrics.bootstrap(np.asarray(epoch_losses))
            metrics_logger.log({"train/loss_mean": mean,
                                "train/loss_std": std, "epoch": epoch}, step)
        if (epoch + 1) % cfg.train.val_every_epochs == 0:
            val = validate(cfg, model, state.params, pde, use_z)
            metrics_logger.log(val, step)
    ckpt.save(step, {"params": state.params})
    metrics_logger.close()
    return state


#: jitted eval/rollout cache — same per-epoch recompile hazard as
#: tasks/pde.py's _VALIDATOR_CACHE (a fresh @jax.jit per validate() call
#: discards the compile cache; each re-compile costs ~90 s through the
#: tunneled TPU backend).  Entries hold a strong model reference so the
#: id() key stays valid.
_VALIDATOR_CACHE: dict = {}


def _cond_validators(model, criterion_name, max_num_steps):
    def build():
        criterion = losses_lib.CRITERIA[criterion_name]

        @jax.jit
        def eval_fn(p, batch):
            x, y, dt, z = batch
            pred = model.apply({"params": p}, x, dt, z)
            return criterion(pred, y)

        def rollout_fn(p, u, v, dt, z):
            def model_fn(window, dt_, z_):
                return model.apply({"params": p}, window, dt_, z_)
            return rollout_lib.cond_rollout2d(model_fn, u, v, dt, z, 1,
                                              max_num_steps)

        return eval_fn, jax.jit(rollout_fn)

    return jit_cache.cached_build(_VALIDATOR_CACHE, (model,),
                                  (criterion_name, max_num_steps), build)


def validate(cfg: Config, model, params, pde, use_z):
    eval_fn, _rollout_jit = _cond_validators(model, cfg.train.criterion,
                                             cfg.train.max_num_steps)
    opener = open_trajectories(cfg.data, "valid")
    windows = pde_data.timestep_conditioned_eval_windows(
        opener, pde, cfg.train.eval_delta_t)
    losses, count = 0.0, 0
    for bx, by, bdt, bz in _batch_cond(windows, cfg.data.batch_size, use_z):
        losses += float(eval_fn(params,
                                (jnp.asarray(bx), jnp.asarray(by),
                                 jnp.asarray(bdt),
                                 jnp.asarray(bz) if bz is not None else None)))
        count += 1
    result = {"valid/onestep_loss": losses / max(count, 1)}

    # conditioned rollout with unit delta_t (cond_rollout2d)
    rollout_jit = lambda u, v, dt, z: _rollout_jit(params, u, v, dt, z)
    unrolled = []
    opener = open_trajectories(cfg.data, "valid")
    for (u, v, cond) in pde_data.rollout_eval_trajectories(opener):
        u = jnp.asarray(u)[None]
        v = jnp.asarray(v)[None] if v is not None else None
        dt = jnp.ones((1,))
        z = (jnp.asarray([cond if cond is not None else 0.0])
             if use_z else None)
        pred = rollout_jit(u[:, :1], v[:, :1] if v is not None else None,
                           dt, z)
        t1 = 1 + cfg.train.max_num_steps
        target = (jnp.concatenate([u[:, 1:t1], v[:, 1:t1]], axis=-1)
                  if v is not None else u[:, 1:t1])
        unrolled.append(float(jnp.sum(
            eval_metrics.rollout_mse_per_step(pred, target))))
    if unrolled:
        mean, std = eval_metrics.bootstrap(np.asarray(unrolled))
        result["valid/unrolled_loss_mean"] = mean
    return result


def main(argv=None):
    import sys
    cfg = parse_cli(Config, argv if argv is not None else sys.argv[1:])
    train(cfg)


if __name__ == "__main__":
    main()
