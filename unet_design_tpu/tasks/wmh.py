"""wmh task: White-Matter-Hyperintensity MRI segmentation.

TPU-native re-design of ``wmh/train_pt.py:366-668``: per-modality z-norm with
train stats (``:397-404``), patient-site validation split (``:406-421``),
augmentation policies (``:424-454``), Dice loss (``:102-112``), staged
training with on-device DWT downsampling of image+mask and mask
re-binarization (``:546-562``), freezing (``:73-99``), threshold-sweep
validation with early stopping on best val loss (``:613-631``), final test
evaluation (``:662-666``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_design_tpu.data import loader as loader_lib
from unet_design_tpu.data import wmh as wmh_data
from unet_design_tpu.evalx import wmh_metrics
from unet_design_tpu.models.unetbase import WMHSegUnet
from unet_design_tpu.ops import wavelet
from unet_design_tpu.parallel import mesh as mesh_lib
from unet_design_tpu.process import losses as losses_lib
from unet_design_tpu.train import freezing, trainer
from unet_design_tpu.train.checkpoint import CheckpointManager
from unet_design_tpu.utils.config import parse_cli
from unet_design_tpu.utils.logging import MetricsLogger, get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class ModelConfig:
    hidden_channels: int = 16
    activation: str = "gelu"
    dwt_encoder: bool = False
    up_fct: str = "interpolate_nearest"
    n_extra_resnet_layers: int = 0
    multi_res_loss: bool = False
    no_skip_connection: bool = False
    no_down_up: bool = False
    remat: bool = False      # jax.checkpoint per conv block (math-identical)
    use_bf16: bool = False


@dataclasses.dataclass
class DataConfig:
    root: str = "data_preprocessed"   # reference .npy outputs
    synthetic: bool = True
    synthetic_size: int = 64
    resolution: int = 200
    batch_size: int = 32
    augmentation: str = "none"        # none | manual1 | manual2 | manual3
    val_fraction: float = 0.1


@dataclasses.dataclass
class TrainConfig:
    num_epochs_list: List[int] = dataclasses.field(
        default_factory=lambda: [25])
    lr: float = 1e-4
    freeze_lower_res: bool = False
    seed: int = 0
    val_every_epochs: int = 1
    early_stop_patience: int = 0      # 0 disables
    # improvement must beat best - min_improvement to reset patience
    # (``wmh/train_pt.py:619-627``; reference default 0.001)
    early_stop_min_improvement: float = 0.0
    resume: bool = False        # continue from the last epoch checkpoint
    stop_after_epochs: int = 0  # graceful preemption after N epochs
    logdir: str = "runs/wmh"


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    # mesh parallelism: parallel.data=N shards the GLOBAL batch over N
    # devices (uniform parallel block shared by all four task drivers)
    parallel: mesh_lib.ParallelConfig = dataclasses.field(
        default_factory=mesh_lib.ParallelConfig)


def load_data(cfg: DataConfig):
    if cfg.synthetic:
        imgs, masks = wmh_data.synthetic_wmh(cfg.synthetic_size,
                                             size=cfg.resolution)
        n = imgs.shape[0]
        val_idx = list(range(0, n, 10))
        train_idx = sorted(set(range(n)) - set(val_idx))
        test_imgs, test_masks = wmh_data.synthetic_wmh(
            cfg.synthetic_size // 2, size=cfg.resolution, seed=99)
    else:
        imgs, masks = wmh_data.load_preprocessed(cfg.root, "_train")
        test_imgs, test_masks = wmh_data.load_preprocessed(cfg.root, "_test")
        train_idx, val_idx = wmh_data.patient_split_indices(
            imgs.shape[0], cfg.val_fraction)
    imgs, test_imgs = wmh_data.normalize_by_train_stats(imgs, test_imgs)
    return ((imgs[train_idx], masks[train_idx]),
            (imgs[val_idx], masks[val_idx]), (test_imgs, test_masks))


def train(cfg: Config):
    mesh = mesh_lib.task_mesh(cfg.parallel)
    if mesh is not None:
        mesh_lib.check_batch_divisible(mesh, cfg.data.batch_size,
                                       "data.batch_size")
        # staged (sequ) runs train the first stage most-downsampled;
        # WMHSegUnet carries the spatial_guard, so the floor is lifted
        mesh_lib.check_spatial_resolution(
            mesh,
            cfg.data.resolution >> (len(cfg.train.num_epochs_list) - 1),
            "smallest stage resolution", guarded=True)
        log.info("Mesh parallelism: %s", dict(mesh.shape))
    rng = jax.random.PRNGKey(cfg.train.seed)
    (tr_x, tr_y), (va_x, va_y), (te_x, te_y) = load_data(cfg.data)

    model = WMHSegUnet(
        hidden_channels=cfg.model.hidden_channels,
        activation=cfg.model.activation, dwt_encoder=cfg.model.dwt_encoder,
        up_fct=cfg.model.up_fct,
        n_extra_resnet_layers=cfg.model.n_extra_resnet_layers,
        multi_res_loss=cfg.model.multi_res_loss,
        sequ_mode=len(cfg.train.num_epochs_list) > 1,
        no_skip_connection=cfg.model.no_skip_connection,
        no_down_up=cfg.model.no_down_up, remat=cfg.model.remat,
        spatial_guard=(mesh_lib.make_spatial_guard(mesh)
                       if mesh is not None else None),
        dtype=jnp.bfloat16 if cfg.model.use_bf16 else jnp.float32)
    n_levels = model.n_levels
    sequ = len(cfg.train.num_epochs_list) > 1

    init_rng, rng = jax.random.split(rng)
    params = model.init(init_rng,
                        jnp.zeros((1, cfg.data.resolution,
                                   cfg.data.resolution, 2)))["params"]

    metrics_logger = MetricsLogger(cfg.train.logdir)
    ckpt = CheckpointManager(os.path.join(cfg.train.logdir, "ckpt"))
    ckpt_latest = CheckpointManager(
        os.path.join(cfg.train.logdir, "ckpt_latest"), keep=2)
    best_val = np.inf
    best_params = jax.tree_util.tree_map(jnp.copy, params)
    patience = 0
    prev_stage = -1
    step = 0

    n_epochs_total = sum(cfg.train.num_epochs_list)
    from unet_design_tpu.tasks.pde import find_cur_stage

    # Full-fidelity resume: params, best-so-far params, optimizer moments,
    # early-stop bookkeeping and PRNG all continue; shuffle/augment
    # randomness is epoch-keyed so the batch stream is identical.
    start_epoch = 0
    resume_state_raw = None
    if cfg.train.resume and ckpt_latest.latest_step() is not None:
        last_epoch = ckpt_latest.latest_step()
        extra = ckpt_latest.load_extra(last_epoch) or {}
        start_epoch = last_epoch + 1
        step = int(extra.get("step", 0))
        best_val = float(extra.get("best_val", np.inf))
        patience = int(extra.get("patience", 0))
        resume_state_raw = ckpt_latest.restore_raw(last_epoch)
        to_tree = lambda t, like: jax.tree_util.tree_map(
            lambda _, v: jnp.asarray(v), like, t)
        params = to_tree(resume_state_raw["params"], params)
        best_params = to_tree(resume_state_raw["best_params"], best_params)
        log.info("Resuming at epoch %d (step %d)", start_epoch, step)

    for epoch in range(start_epoch, n_epochs_total):
        stage = find_cur_stage(cfg.train.num_epochs_list, epoch) if sequ \
            else len(cfg.train.num_epochs_list) - 1
        n = (stage + 1) if sequ else n_levels
        n_downsample = (len(cfg.train.num_epochs_list) - (stage + 1)
                        if sequ else 0)
        if stage != prev_stage:
            if cfg.train.freeze_lower_res and sequ and stage != 0:
                labels = freezing.unetbase_g_labels(params, n_levels, n)
            else:
                labels = freezing.all_train_labels(params)
            tx = trainer.make_optimizer(cfg.train.lr, labels=labels)
            s_rng = jax.random.fold_in(rng, 10_000 + stage)
            state = trainer.TrainState.create(params, s_rng,
                                              tx.init(params), ema=False)
            if (resume_state_raw is not None
                    and find_cur_stage(cfg.train.num_epochs_list,
                                       max(start_epoch - 1, 0)) == stage):
                # mid-stage resume: optimizer moments and the per-step PRNG
                # chain continue (at a stage boundary the uninterrupted run
                # re-inits them fresh)
                restored = ckpt_latest.restore(start_epoch - 1, {
                    "params": state.params, "opt_state": state.opt_state,
                    "rng": state.rng, "step": state.step,
                    "best_params": best_params})
                state = state.replace(
                    params=restored["params"],
                    opt_state=restored["opt_state"], rng=restored["rng"],
                    step=restored["step"])
            resume_state_raw = None
            # mesh placement (replication for data-parallel; TP when model>1)
            state = mesh_lib.place_state(
                state, mesh, min_channels=cfg.parallel.tp_min_channels)

            def loss_fn(p, step_rng, batch, n=n, nd=n_downsample):
                x, y = batch
                if sequ and nd > 0:
                    x = wavelet.haar_downsample(x, nd)
                    y = wavelet.haar_downsample(y, nd)
                    y = (y > 0.5).astype(x.dtype)  # re-binarize (:560-562)
                pred = model.apply({"params": p}, x, n_levels_used=n)
                if cfg.model.multi_res_loss:
                    ys = [y]
                    for _ in range(n - 1):
                        ys.append((wavelet.haar_downsample(ys[-1], 1) > 0.5
                                   ).astype(x.dtype))
                    ys = ys[::-1]  # decoder order, coarse first
                    loss = losses_lib.multires_sum(
                        losses_lib.dice_coef_loss, pred, ys)
                else:
                    loss = losses_lib.dice_coef_loss(pred, y)
                return loss, ()

            step_fn = trainer.make_train_step(loss_fn, tx, jit=True)

            @jax.jit
            def predict_fn(p, x, n=n):
                out = model.apply({"params": p}, x, n_levels_used=n)
                return out[-1] if cfg.model.multi_res_loss else out

            prev_stage = stage
            log.info("Stage %d (epoch %d): n_levels_used=%d n_downsample=%d",
                     stage, epoch, n, n_downsample)

        shuffle_rng = np.random.default_rng(cfg.train.seed * 1000 + epoch)
        # epoch-keyed augmentation randomness: identical under resume
        aug_rng = np.random.default_rng((cfg.train.seed, 7, epoch))
        for bx, by in loader_lib.epoch_batches([tr_x, tr_y],
                                               cfg.data.batch_size,
                                               shuffle_rng, drop_last=False):
            if cfg.data.augmentation != "none":
                bx, by = wmh_data.augment_batch(bx, by,
                                                cfg.data.augmentation,
                                                aug_rng)
            batch = (jnp.asarray(bx), jnp.asarray(by))
            if mesh is not None:
                # NHWC: batch over 'data', H over 'spatial'; non-divisible
                # tail batches replicate (drop_last=False loader)
                batch = mesh_lib.spatial_shard_batch(batch, mesh)
            state, loss, _ = step_fn(state, batch)
            step += 1
        params = state.params
        metrics_logger.log({"train/loss": float(loss), "epoch": epoch}, step)

        if (epoch + 1) % cfg.train.val_every_epochs == 0:
            val_loss, sweep, probs, tgts = evaluate(
                cfg, predict_fn, params, va_x, va_y, n_downsample)
            best_th = max(sweep, key=lambda k: sweep[k]["dsc"])
            metrics_logger.log(
                {"valid/loss": val_loss,
                 "valid/best_dsc": sweep[best_th]["dsc"],
                 "valid/best_threshold": best_th}, step)
            # TP/FP/FN overlay of the most-lesioned validation slice
            # (``wmh/train_pt.py:284-341`` logs segmentation overlays)
            from unet_design_tpu.utils import visualization
            i = int(np.argmax(tgts.reshape(tgts.shape[0], -1).sum(1)))
            vx = va_x[i]
            if n_downsample:
                vx = np.asarray(wavelet.haar_downsample(
                    jnp.asarray(vx[None]), n_downsample))[0]
            fig = visualization.plot_segmentation(
                vx[..., 0], tgts[i, ..., 0], probs[i, ..., 0],
                threshold=best_th)
            metrics_logger.log_figure("valid/overlay", fig, step)
            if val_loss < best_val - cfg.train.early_stop_min_improvement:
                best_val = val_loss
                # deep-copy: the live params buffers are donated into
                # subsequent jitted steps
                best_params = jax.tree_util.tree_map(jnp.copy, params)
                patience = 0
                ckpt.save(step, {"params": params},
                          extra={"epoch": epoch, "val_loss": val_loss})
            else:
                patience += 1
                if (cfg.train.early_stop_patience
                        and patience >= cfg.train.early_stop_patience):
                    log.info("Early stopping at epoch %d", epoch)
                    break

        # ---- epoch-granular full-state checkpoint (resume point)
        ckpt_latest.save(epoch, {
            "params": state.params, "opt_state": state.opt_state,
            "rng": state.rng, "step": state.step,
            "best_params": best_params},
            extra={"step": step, "best_val": float(best_val),
                   "patience": int(patience)})
        if (cfg.train.stop_after_epochs
                and epoch + 1 >= start_epoch + cfg.train.stop_after_epochs):
            log.info("Stopping after %d epochs (graceful preemption)",
                     epoch + 1)
            break

    # final test with best params (``train_pt.py:662-666``)
    test_loss, sweep, _, _ = evaluate(cfg, predict_fn, best_params,
                                      te_x, te_y, n_downsample=0)
    best_th = max(sweep, key=lambda k: sweep[k]["dsc"])
    metrics_logger.log({"test/loss": test_loss,
                        "test/best_dsc": sweep[best_th]["dsc"]}, step)
    metrics_logger.close()
    return best_params, sweep


def evaluate(cfg: Config, predict_fn, params, images, masks,
             n_downsample: int, batch_size: Optional[int] = None):
    bs = batch_size or cfg.data.batch_size
    preds, targets, losses = [], [], []
    for s in range(0, images.shape[0], bs):
        x = jnp.asarray(images[s:s + bs])
        y = jnp.asarray(masks[s:s + bs])
        if n_downsample:
            x = wavelet.haar_downsample(x, n_downsample)
            y = (wavelet.haar_downsample(y, n_downsample) > 0.5
                 ).astype(x.dtype)
        p = predict_fn(params, x)
        losses.append(float(losses_lib.dice_coef_loss(p, y)))
        preds.append(np.asarray(p))
        targets.append(np.asarray(y))
    probs = np.concatenate(preds)
    tgts = np.concatenate(targets)
    sweep, _ = wmh_metrics.threshold_sweep(probs, tgts)
    return float(np.mean(losses)), sweep, probs, tgts


def main(argv=None):
    import sys
    cfg = parse_cli(Config, argv if argv is not None else sys.argv[1:])
    train(cfg)


if __name__ == "__main__":
    main()
