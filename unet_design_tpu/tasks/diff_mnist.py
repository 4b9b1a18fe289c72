"""diff_mnist task: staged multi-resolution DDPM on MNIST / MNIST-Triangular /
CelebA64.

TPU-native re-design of ``diff_mnist/main.py:33-706``: the stage loop runs on
the host; each (stage, n_levels_used) pair gets one jitted train step
(freezing via optax labels) and one jitted `lax.scan` sampler.  Target
downsampling (``main.py:323-336``) is the on-device Haar pyramid; staged
partitioned time intervals, multi-res loss, per-resolution sampling,
super-resolution sampling (``main.py:625-672``) and checkpointing are all
preserved.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_design_tpu.data import image as image_data
from unet_design_tpu.data import loader as loader_lib
from unet_design_tpu.data import triangular as tri_data
from unet_design_tpu.models.openai_unet import (ScoreNetwork, UNetModel,
                                                WaveletUNetOpenAI)
from unet_design_tpu.ops import wavelet
from unet_design_tpu.parallel import mesh as mesh_lib
from unet_design_tpu.process import diffusion
from unet_design_tpu.train import freezing, trainer
from unet_design_tpu.train.checkpoint import CheckpointManager
from unet_design_tpu.utils import config as config_lib
from unet_design_tpu.utils.config import parse_cli
from unet_design_tpu.utils.logging import MetricsLogger, get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class ModelConfig:
    name: str = "unet_wavelet"      # unet_wavelet | unet | mlp
    num_channels: int = 32
    num_res_blocks: int = 2
    channel_mult: Optional[List[int]] = None  # default from resolution
    dropout: float = 0.0
    dwt_encoder: bool = False
    multi_res_loss: bool = False
    avg_pool_down: bool = False
    use_bf16: bool = False


@dataclasses.dataclass
class DiffusionConfig:
    beta_min: float = 0.1
    beta_max: float = 20.0
    N: int = 30
    eps: float = 1e-3
    T: float = 1.0
    weighted_multi_res_loss: bool = False
    staged_partitioned_time_intervals: bool = False
    last_loss_schedule_weight: float = 1.0


@dataclasses.dataclass
class DataConfig:
    dataset: str = "synthetic"      # mnist | mnist_triangular | celeba | synthetic
    root: str = "./datasets"
    resolution: int = 32
    batch_size: int = 128
    to_square_preprocess: bool = False
    synthetic_size: int = 512
    # stage the dataset in device HBM and scan the steps between host
    # events in one device call (see tasks/diff_cifar.py)
    device_cache: bool = True


@dataclasses.dataclass
class TrainConfig:
    num_iterations_list: List[int] = dataclasses.field(
        default_factory=lambda: [1000])
    lr: float = 1e-3
    grad_clip: Optional[float] = None
    freeze_lower_res: bool = False
    seed: int = 0
    samples_every_iters: int = 0     # 0 disables periodic sampling
    n_samples: int = 25
    u_net_norm_every_iters: int = 0  # 0 disables norm-vs-t figures
    metrics_every_iters: int = 100
    save_every_iters: int = 0
    resume: bool = False        # restore latest checkpoint from own logdir
    # Run-id restore (the reference's wandb TRAIN_ID / TEST_ID,
    # diff_mnist/main.py:50-95): a run directory (or a name under runs/)
    # whose saved config.yaml REPLACES the CLI config and whose checkpoint
    # is restored.  train_id continues training; test_id samples only.
    train_id: str = ""
    test_id: str = ""
    restore_iter: int = 0       # 0 -> the run's latest checkpoint
    stop_after_steps: int = 0   # graceful preemption after N global steps
    do_superres: bool = False
    superres_factor: int = 2         # target_res / final trained res
    logdir: str = "runs/diff_mnist"


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = dataclasses.field(
        default_factory=DiffusionConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    # mesh parallelism: parallel.data=N shards the GLOBAL batch over N
    # devices (the reference fork is single-GPU; this is the uniform
    # parallel block shared by all four task drivers)
    parallel: mesh_lib.ParallelConfig = dataclasses.field(
        default_factory=mesh_lib.ParallelConfig)


def default_channel_mult(image_size: int) -> Tuple[int, ...]:
    """``get_unet_wavelet`` size->mult table (``mnist_diff/unet.py:22-42``)."""
    table = {256: (1, 1, 2, 2, 4, 4), 64: (2, 2, 2, 2), 32: (2, 2, 2, 2),
             28: (1, 2, 2), 16: (1, 2, 2, 2), 8: (1, 2, 2), 4: (1, 1, 1),
             2: (1, 2), 1: (1,)}
    if image_size not in table:
        raise ValueError(f"unsupported image size: {image_size}")
    return table[image_size]


def build_model(cfg: Config, in_channels: int):
    mc = cfg.model
    dtype = jnp.bfloat16 if mc.use_bf16 else jnp.float32
    mult = tuple(mc.channel_mult or
                 default_channel_mult(cfg.data.resolution))
    if mc.name == "unet_wavelet":
        return WaveletUNetOpenAI(
            in_channels=in_channels, model_channels=mc.num_channels,
            out_channels=in_channels, num_res_blocks=mc.num_res_blocks,
            dropout=mc.dropout, channel_mult=mult,
            conv_resample=not mc.avg_pool_down, dwt_encoder=mc.dwt_encoder,
            multi_res_loss=mc.multi_res_loss, use_scale_shift_norm=True,
            dtype=dtype)
    if mc.name == "unet":
        return UNetModel(in_channels=in_channels,
                         model_channels=mc.num_channels,
                         out_channels=in_channels,
                         num_res_blocks=mc.num_res_blocks,
                         channel_mult=mult, dtype=dtype)
    if mc.name == "mlp":
        return ScoreNetwork(x_dim=cfg.data.resolution ** 2 * in_channels)
    raise ValueError(mc.name)


def load_dataset(cfg: DataConfig) -> np.ndarray:
    if cfg.dataset == "mnist":
        x, _ = image_data.load_mnist(cfg.root, train=True)
    elif cfg.dataset == "mnist_triangular":
        raw, _ = image_data.load_mnist(cfg.root, train=True, pad_to_32=False)
        imgs = ((raw[..., 0] + 1.0) / 2.0 * 255).astype(np.uint8)
        x = tri_data.make_triangular_dataset(
            imgs, to_square_preprocess=cfg.to_square_preprocess)
        x = x * 2.0 - 1.0
    elif cfg.dataset == "celeba":
        x = image_data.load_celeba64(cfg.root)
    elif cfg.dataset == "synthetic":
        x, _ = image_data.synthetic_mnist(cfg.synthetic_size,
                                          size=cfg.resolution)
    else:
        raise ValueError(cfg.dataset)
    assert x.shape[1] == cfg.resolution, (x.shape, cfg.resolution)
    return x


def check_config(cfg: Config) -> None:
    """Consistency checks (``check_hyperparams``,
    ``diff_mnist/hyperparams.py:99-113``)."""
    n_stages = len(cfg.train.num_iterations_list)
    mult = tuple(cfg.model.channel_mult
                 or default_channel_mult(cfg.data.resolution))
    assert n_stages <= len(mult), (n_stages, mult)
    if n_stages > 1 and cfg.model.name == "unet_wavelet":
        assert len(set(mult)) == 1, (
            "staged training requires uniform channel_mult (G-Net configs)")
    if cfg.train.freeze_lower_res:
        assert n_stages > 1, "freezing requires the sequential algorithm"
    if cfg.diffusion.staged_partitioned_time_intervals:
        assert n_stages > 1
    # beta_max together with the cumprod requires beta_max < N
    assert cfg.diffusion.beta_max < cfg.diffusion.N, (
        "beta_max must be < N or alphas go negative")


resolve_run_dir = config_lib.resolve_run_dir
restore_run_config = config_lib.restore_run_config


def train(cfg: Config):
    cfg = restore_run_config(cfg)
    check_config(cfg)
    mesh = mesh_lib.task_mesh(cfg.parallel)
    if mesh is not None:
        mesh_lib.check_batch_divisible(mesh, cfg.data.batch_size,
                                       "data.batch_size")
        # staged (sequ) runs train the first stage most-downsampled
        mesh_lib.check_spatial_resolution(
            mesh,
            cfg.data.resolution >> (len(cfg.train.num_iterations_list) - 1),
            "smallest stage resolution")
        log.info("Mesh parallelism: %s", dict(mesh.shape))
    rng = jax.random.PRNGKey(cfg.train.seed)
    data = load_dataset(cfg.data)
    in_channels = data.shape[-1]
    model = build_model(cfg, in_channels)
    is_wavelet = cfg.model.name == "unet_wavelet"
    n_levels = model.n_levels if is_wavelet else 1

    vp = diffusion.VPDiffusion.create(
        beta_min=cfg.diffusion.beta_min, beta_max=cfg.diffusion.beta_max,
        N=cfg.diffusion.N, eps=cfg.diffusion.eps, T=cfg.diffusion.T,
        multi_res_loss=cfg.model.multi_res_loss,
        weighted_multi_res_loss=cfg.diffusion.weighted_multi_res_loss)

    x_init = jnp.zeros((2, cfg.data.resolution, cfg.data.resolution,
                        in_channels))
    t_init = jnp.zeros((2,))
    init_rng, rng = jax.random.split(rng)
    if is_wavelet:
        variables = model.init(init_rng, x_init, t_init)
    else:
        variables = model.init(init_rng, x_init, t_init)
    params = variables["params"]

    metrics = MetricsLogger(cfg.train.logdir)
    ckpt = CheckpointManager(os.path.join(cfg.train.logdir, "ckpt"))
    # "saving H config..." (main.py:104-107) — makes this run restorable
    # by id via train_id/test_id later.
    config_lib.save_yaml(cfg, os.path.join(cfg.train.logdir, "config.yaml"))
    stages = trainer.StageSpec.from_schedule(cfg.train.num_iterations_list,
                                             n_levels)
    sequ = len(stages) > 1
    state = None
    train_iter = 0

    # Full-fidelity resume (the reference's wandb TRAIN_ID restore,
    # diff_mnist/main.py:50-95): params, optimizer moments, per-step PRNG and
    # the data cursor all continue exactly.  With train_id the checkpoint
    # comes from ANOTHER run's store; new checkpoints land in this logdir.
    src_ckpt = ckpt
    resume_step = 0
    if cfg.train.train_id:
        src_ckpt = CheckpointManager(os.path.join(
            resolve_run_dir(cfg.train.train_id), "ckpt"))
        resume_step = cfg.train.restore_iter or src_ckpt.latest_step() or 0
        if not resume_step:
            raise FileNotFoundError(
                f"train_id {cfg.train.train_id!r}: no checkpoint to restore")
        # a preempted continuation rerun must pick up its OWN newer
        # checkpoints, not recompute from the source run's
        own_latest = ckpt.latest_step()
        if own_latest is not None and own_latest > resume_step:
            src_ckpt, resume_step = ckpt, own_latest
    elif cfg.train.resume and ckpt.latest_step() is not None:
        resume_step = ckpt.latest_step()
    if resume_step:
        raw = src_ckpt.restore_raw(resume_step)
        params = jax.tree_util.tree_map(lambda _, v: jnp.asarray(v),
                                        params, raw["params"])
        log.info("Resumed from checkpoint step %d", resume_step)

    data_dev = None
    if cfg.data.device_cache:
        data_dev = mesh_lib.place_dataset(data, mesh, h_axis=1) \
            if mesh is not None else jnp.asarray(data)
    source = [np.arange(len(data))] if data_dev is not None else [data]
    batches = loader_lib.infinite_batches(source, cfg.data.batch_size,
                                          seed=cfg.train.seed,
                                          start_step=resume_step)

    def save_full(step, state):
        ckpt.save(step, {"params": state.params,
                         "opt_state": state.opt_state,
                         "rng": state.rng, "step": state.step})

    for stage in stages:
        n = stage.n_levels_used if is_wavelet else 1
        if cfg.train.freeze_lower_res and is_wavelet and sequ:
            labels = freezing.openai_wavelet_labels(params, n_levels, n)
        else:
            labels = freezing.all_train_labels(params)
        tx = trainer.make_optimizer(cfg.train.lr,
                                    grad_clip=cfg.train.grad_clip,
                                    labels=labels)
        opt_state = tx.init(params)
        state_rng = jax.random.fold_in(rng, 10_000 + stage.index)
        state = trainer.TrainState.create(params, state_rng, opt_state,
                                          ema=False)
        if train_iter < resume_step < train_iter + stage.num_iterations:
            # mid-stage resume: optimizer moments and the per-step PRNG
            # chain continue from the checkpoint
            state = state.replace(**src_ckpt.restore(resume_step, {
                "params": state.params, "opt_state": state.opt_state,
                "rng": state.rng, "step": state.step}))
        # mesh placement: params/opt-moments TP-sharded over 'model'
        # (plain replication when model=1), scalars/rng replicated
        state = mesh_lib.place_state(
            state, mesh, min_channels=cfg.parallel.tp_min_channels)

        stage_kw = dict(stage=stage.index, n_stages=stage.n_stages) \
            if cfg.diffusion.staged_partitioned_time_intervals and sequ \
            else {}

        def loss_fn(p, step_rng, batch, n=n, stage=stage, stage_kw=stage_kw):
            t_rng, x_rng = jax.random.split(step_rng)
            t = vp.sample_t(t_rng, batch.shape[0], **stage_kw)
            x_t, noise = vp.sample_x(x_rng, batch, t)
            # the model receives the raw timestep index (main.py:372)
            t_cont = t.astype(jnp.float32)

            if is_wavelet:
                out = model.apply({"params": p}, x_t, t_cont,
                                  n_levels_used=n)
            else:
                out = model.apply({"params": p}, x_t, t_cont)
            if cfg.model.multi_res_loss:
                targets = wavelet.multires_targets(
                    noise, n_levels, stage.n_downsample if sequ else 0)
                targets = targets[-len(out):]
                loss, loss_list = vp.loss(
                    out, targets, cfg.diffusion.last_loss_schedule_weight)
            else:
                loss, loss_list = vp.loss(out, noise)
            return loss, loss_list

        step_fn = trainer.make_train_step(loss_fn, tx, with_grad_norm=True,
                                          jit=True)
        raw_step = trainer.make_train_step(loss_fn, tx, with_grad_norm=True,
                                           jit=False)

        from functools import partial

        @partial(jax.jit, donate_argnums=(0,))
        def chunk_fn(state, data_d, idxs, nd=stage.n_downsample):
            """All steps between host events as one scanned device call over
            the HBM-resident dataset (see tasks/diff_cifar.py)."""
            def body(st, i):
                x0 = data_d[i]
                if sequ and nd > 0:
                    x0 = wavelet.haar_downsample(x0, nd)
                st, loss, loss_list, gn = raw_step(st, x0)
                return st, (loss, tuple(loss_list), gn)
            state, (losses, loss_lists, gns) = jax.lax.scan(body, state,
                                                            idxs)
            return state, losses, loss_lists, gns

        if train_iter + stage.num_iterations <= resume_step:
            train_iter += stage.num_iterations   # stage fully completed
            continue
        log.info("Stage %d/%d: n_levels_used=%d, n_downsample=%d, iters=%d",
                 stage.index + 1, stage.n_stages, n, stage.n_downsample,
                 stage.num_iterations)
        stage_end = train_iter + stage.num_iterations
        if train_iter < resume_step:
            train_iter = resume_step   # index stream already fast-forwarded
        cadences = (cfg.train.metrics_every_iters,
                    cfg.train.samples_every_iters,
                    cfg.train.u_net_norm_every_iters)
        batch = None
        while train_iter < stage_end:
            if data_dev is not None:
                k_end = stage_end - 1
                for c in cadences:
                    if c:
                        k = (train_iter if train_iter % c == 0
                             else (train_iter // c + 1) * c)
                        k_end = min(k_end, k)
                if cfg.train.save_every_iters:
                    k_end = min(k_end, -(-(train_iter + 1)
                                         // cfg.train.save_every_iters)
                                * cfg.train.save_every_iters - 1)
                if cfg.train.stop_after_steps:
                    k_end = min(k_end, cfg.train.stop_after_steps - 1)
                k_end = min(k_end, train_iter + 1999)
                chunk = k_end - train_iter + 1
                idxs = np.stack([next(batches)[0] for _ in range(chunk)])
                state, losses, loss_lists, gns = chunk_fn(
                    state, data_dev, mesh_lib.shard_index_stream(
                        jnp.asarray(idxs, jnp.int32), mesh))
                train_iter = k_end
                loss, grad_norm = losses[-1], gns[-1]
                loss_list = [l[-1] for l in loss_lists]
                if (cfg.train.u_net_norm_every_iters
                        and cfg.model.name == "unet_wavelet"
                        and train_iter % cfg.train.u_net_norm_every_iters
                        == 0):
                    # reconstruct the last batch for the norm-vs-t figure
                    batch = jnp.asarray(data[idxs[-1]])
                    if sequ and stage.n_downsample > 0:
                        batch = wavelet.haar_downsample(
                            batch, stage.n_downsample)
            else:
                (batch_np,) = next(batches)
                batch = jnp.asarray(batch_np)
                if sequ and stage.n_downsample > 0:
                    batch = wavelet.haar_downsample(batch,
                                                    stage.n_downsample)
                if mesh is not None:
                    batch = mesh_lib.spatial_shard_batch(batch, mesh)
                state, loss, loss_list, grad_norm = step_fn(state, batch)
            if train_iter % cfg.train.metrics_every_iters == 0:
                # train/grad_norm: the wandb.watch(model) analog (main.py:188)
                m = {"train/loss": float(loss),
                     "train/grad_norm": float(grad_norm)}
                res = cfg.data.resolution // 2 ** stage.n_downsample
                for k, l in enumerate(loss_list):
                    m[f"train/res_{res // 2 ** (len(loss_list)-1-k)}_loss"] \
                        = float(l)
                metrics.log(m, train_iter)
            if (cfg.train.samples_every_iters
                    and train_iter % cfg.train.samples_every_iters == 0):
                # sample at every active resolution and log the grids
                # (``diff_mnist/main.py:480-554`` keeps one x_T per
                # resolution and plots each via plot_uncond_samples)
                from unet_design_tpu.utils import visualization
                stage_res = cfg.data.resolution // 2 ** stage.n_downsample
                for k in (range(1, n + 1) if is_wavelet else (1,)):
                    r = stage_res // 2 ** (n - k)
                    s_rng = jax.random.fold_in(
                        jax.random.fold_in(rng, 20_000 + train_iter), k)
                    imgs = sample(cfg, model, state.params, vp, s_rng, k,
                                  r, in_channels)
                    side = max(1, int(math.sqrt(len(imgs))))
                    fig = visualization.plot_sample_grid(
                        imgs[:side * side], side, side,
                        f"res {r}, iter {train_iter}")
                    metrics.log_figure(f"samples/res_{r}", fig, train_iter)
            if (cfg.train.u_net_norm_every_iters
                    and cfg.model.name == "unet_wavelet"
                    and train_iter % cfg.train.u_net_norm_every_iters == 0):
                fig = unet_norm_figure(cfg, model, state.params, batch, vp, n)
                metrics.log_figure("u_net_norms", fig, train_iter)
            train_iter += 1
            # save AFTER the increment: checkpoint key k == "k steps done",
            # matching the resume fast-forward and the data cursor
            saved_now = (cfg.train.save_every_iters
                         and train_iter % cfg.train.save_every_iters == 0)
            if saved_now:
                save_full(train_iter, state)
            if (cfg.train.stop_after_steps
                    and train_iter >= cfg.train.stop_after_steps):
                if not saved_now:
                    save_full(train_iter, state)
                metrics.close()
                return state
        params = state.params

    if cfg.train.do_superres and is_wavelet and sequ:
        # super-resolution sampling at the end of training
        # (``diff_mnist/main.py:625-672``): reuse the trained levels and
        # decode ``extra`` additional octaves above the trained resolution.
        final = stages[-1]
        n_used = final.n_levels_used
        extra = int(math.log2(max(cfg.train.superres_factor, 1)))
        if extra > 0 and n_used + extra <= n_levels:
            from unet_design_tpu.utils import visualization
            source_res = cfg.data.resolution // 2 ** final.n_downsample
            target_res = source_res * cfg.train.superres_factor
            rng, sr_rng = jax.random.split(rng)
            imgs = superres_sample(cfg, model, params, vp, sr_rng,
                                   source_res, target_res, n_used,
                                   in_channels)
            side = max(1, int(math.sqrt(len(imgs))))
            fig = visualization.plot_sample_grid(
                imgs[:side * side], side, side,
                f"superres {source_res}->{target_res}")
            metrics.log_figure("superres", fig, train_iter)
        else:
            log.warning("do_superres skipped: factor %d needs %d levels, "
                        "model has %d", cfg.train.superres_factor,
                        n_used + extra, n_levels)

    if ckpt.latest_step() != train_iter:
        save_full(train_iter, state)
    metrics.close()
    return state


def sample(cfg: Config, model, params, vp: diffusion.VPDiffusion,
           rng: jax.Array, n_levels_used: int, resolution: int,
           in_channels: int, n_samples: Optional[int] = None):
    """Reverse-diffusion sampling at one resolution (``main.py:480-554``)."""
    n_samples = n_samples or cfg.train.n_samples
    noise_rng, scan_rng = jax.random.split(rng)
    x_T = jax.random.normal(noise_rng, (n_samples, resolution, resolution,
                                        in_channels))

    def model_fn(x, t, n):
        if cfg.model.name == "unet_wavelet":
            return model.apply({"params": params}, x, t, n_levels_used=n)
        return model.apply({"params": params}, x, t)

    x, x_mean = vp.reverse_sample(model_fn, scan_rng, x_T,
                                  n_levels_used=n_levels_used)
    return np.asarray(x_mean)


def unet_norm_figure(cfg: Config, model, params, batch: jnp.ndarray,
                     vp: diffusion.VPDiffusion, n_levels_used: int,
                     n_t: int = 8):
    """Per-block activation norms as a function of diffusion time
    (``diff_mnist/main.py:557-621`` / ``plotting.py:194``)."""
    from unet_design_tpu.utils import visualization
    norms_by_t = {}
    ts = np.linspace(0, vp.N - 1, n_t)
    for tv in ts:
        t = jnp.full((batch.shape[0],), float(tv))
        x_t, _ = vp.sample_x(jax.random.PRNGKey(0), batch,
                             jnp.full((batch.shape[0],), int(tv),
                                      jnp.int32))
        _, norms = model.apply({"params": params}, x_t, t,
                               n_levels_used=n_levels_used,
                               return_norms=True)
        norms_by_t[float(tv)] = jax.tree_util.tree_map(float, norms)
    return visualization.plot_unet_norms(norms_by_t, ts)


def superres_sample(cfg: Config, model, params, vp: diffusion.VPDiffusion,
                    rng: jax.Array, source_res: int, target_res: int,
                    n_levels_used: int, in_channels: int,
                    n_noise: int = 10):
    """Super-resolution sampling (``main.py:625-672``): sample noise at the
    source resolution, nearest-upsample it to the target resolution, and run
    the reverse process with ``n_levels_used + log2(target/source)`` decoder
    levels."""
    extra = int(math.log2(target_res // source_res))
    noise_rng, scan_rng = jax.random.split(rng)
    x_T = jax.random.normal(noise_rng, (n_noise, source_res, source_res,
                                        in_channels))
    x_T_up = x_T
    for _ in range(extra):
        x_T_up = jnp.repeat(jnp.repeat(x_T_up, 2, axis=1), 2, axis=2)

    def model_fn(x, t, n):
        return model.apply({"params": params}, x, t, n_levels_used=n)

    _, x_mean = vp.reverse_sample(model_fn, scan_rng, x_T_up,
                                  n_levels_used=n_levels_used + extra)
    return np.asarray(x_mean)


def test_eval(cfg: Config):
    """TEST_ID mode (``diff_mnist/main.py:81-95``): restore a finished run by
    id and produce its sampling artifacts without training — one sample grid
    per trained resolution, plus super-resolution if the run configured it.
    Returns ``{resolution: samples}``."""
    cli = cfg
    cfg = restore_run_config(cfg)
    if cfg is not cli:
        # eval-protocol knobs stay CLI-owned in test mode
        cfg.train.n_samples = cli.train.n_samples
    if cli.train.logdir == type(cli.train)().logdir:
        # no explicit logdir: write eval artifacts next to the restored run
        # instead of appending into whatever lives at the default logdir
        cfg.train.logdir = os.path.join(
            resolve_run_dir(cfg.train.test_id), "eval")
    check_config(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)
    data = load_dataset(cfg.data)
    in_channels = data.shape[-1]
    model = build_model(cfg, in_channels)
    is_wavelet = cfg.model.name == "unet_wavelet"
    n_levels = model.n_levels if is_wavelet else 1

    vp = diffusion.VPDiffusion.create(
        beta_min=cfg.diffusion.beta_min, beta_max=cfg.diffusion.beta_max,
        N=cfg.diffusion.N, eps=cfg.diffusion.eps, T=cfg.diffusion.T,
        multi_res_loss=cfg.model.multi_res_loss,
        weighted_multi_res_loss=cfg.diffusion.weighted_multi_res_loss)

    x_init = jnp.zeros((2, cfg.data.resolution, cfg.data.resolution,
                        in_channels))
    t_init = jnp.zeros((2,))
    variables = model.init(rng, x_init, t_init)
    src = CheckpointManager(os.path.join(
        resolve_run_dir(cfg.train.test_id), "ckpt"))
    step = cfg.train.restore_iter or src.latest_step()
    raw = src.restore_raw(step)
    params = jax.tree_util.tree_map(lambda _, v: jnp.asarray(v),
                                    variables["params"], raw["params"])
    log.info("test_eval: restored run %s at step %s", cfg.train.test_id,
             step)

    metrics = MetricsLogger(cfg.train.logdir)
    from unet_design_tpu.utils import visualization
    stages = trainer.StageSpec.from_schedule(cfg.train.num_iterations_list,
                                             n_levels)
    final = stages[-1]
    n = final.n_levels_used if is_wavelet else 1
    stage_res = cfg.data.resolution // 2 ** final.n_downsample
    out = {}
    for k in (range(1, n + 1) if is_wavelet else (1,)):
        r = stage_res // 2 ** (n - k)
        s_rng = jax.random.fold_in(jax.random.fold_in(rng, 30_000), k)
        imgs = sample(cfg, model, params, vp, s_rng, k, r, in_channels)
        out[r] = imgs
        side = max(1, int(math.sqrt(len(imgs))))
        fig = visualization.plot_sample_grid(
            imgs[:side * side], side, side, f"test_eval res {r}")
        metrics.log_figure(f"samples/res_{r}", fig, step or 0)
    if cfg.train.do_superres and is_wavelet and len(stages) > 1:
        extra = int(math.log2(max(cfg.train.superres_factor, 1)))
        if extra > 0 and n + extra <= n_levels:
            target_res = stage_res * cfg.train.superres_factor
            imgs = superres_sample(cfg, model, params, vp,
                                   jax.random.fold_in(rng, 31_000),
                                   stage_res, target_res, n, in_channels)
            out[target_res] = imgs
            side = max(1, int(math.sqrt(len(imgs))))
            fig = visualization.plot_sample_grid(
                imgs[:side * side], side, side,
                f"test_eval superres {stage_res}->{target_res}")
            metrics.log_figure("superres", fig, step or 0)
    metrics.close()
    return out


def main(argv=None):
    import sys
    cfg = parse_cli(Config, argv if argv is not None else sys.argv[1:])
    if cfg.train.test_id:
        test_eval(cfg)
    else:
        train(cfg)


if __name__ == "__main__":
    main()
