"""diff_cifar task: staged DDPM on CIFAR-10 with EMA and FID/IS evaluation.

TPU-native re-design of ``diff_cifar/main.py:113-704``: per-stage Adam +
warmup (``:374-377``), EMA decay 0.9999 masked by the freeze labels
(``:57-77,429``), grad-clip (``:425``), staged freezing (``:311-371``),
on-device Haar downsampling of the batch (``:403-419``), multi-resolution
sampling at every active resolution via one `lax.scan` ancestral sampler per
resolution (``:455-516``), periodic FID/IS (``:543-557``), checkpointing.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unet_design_tpu.data import image as image_data
from unet_design_tpu.data import loader as loader_lib
from unet_design_tpu.models.multires_unet import MultiResUNet
from unet_design_tpu.ops import wavelet
from unet_design_tpu.parallel import mesh as mesh_lib
from unet_design_tpu.process import diffusion
from unet_design_tpu.train import freezing, schedules, trainer
from unet_design_tpu.train.checkpoint import CheckpointManager
from unet_design_tpu.utils import jit_cache
from unet_design_tpu.utils import config as config_lib
from unet_design_tpu.utils.config import parse_cli
from unet_design_tpu.utils.logging import MetricsLogger, get_logger

log = get_logger(__name__)


@dataclasses.dataclass
class ModelConfig:
    ch: int = 128
    ch_mult: List[int] = dataclasses.field(default_factory=lambda: [1, 2, 2, 2])
    attn: List[int] = dataclasses.field(default_factory=lambda: [1])
    num_res_blocks: int = 2
    dropout: float = 0.1
    dwt_encoder: bool = False
    multi_res_loss: bool = False
    downsample_type: str = "conv"
    use_bf16: bool = False


@dataclasses.dataclass
class DiffusionConfig:
    beta_1: float = 1e-4
    beta_T: float = 0.02
    T: int = 1000
    mean_type: str = "epsilon"
    var_type: str = "fixedlarge"
    # beyond reference: 'ddpm' (full ancestral scan, reference parity),
    # 'ddim' (sub-sequence), or 'dpm_solver' (2nd-order, fewest steps)
    sampler: str = "ddpm"
    sample_steps: int = 50       # for ddim / dpm_solver


@dataclasses.dataclass
class DataConfig:
    dataset: str = "synthetic"   # cifar10 | synthetic
    root: str = "./datasets/cifar10"
    batch_size: int = 128
    synthetic_size: int = 512
    # stage the dataset in device HBM (CIFAR-10 is 600 MB) and run the
    # steps between logging/sampling/eval/save events as ONE scanned device
    # call; the host ships per-chunk int32 batch indices + flip masks.
    # Per-step dispatch through the tunneled backend costs ~300 ms.
    device_cache: bool = True


@dataclasses.dataclass
class TrainConfig:
    num_iterations_list: List[int] = dataclasses.field(
        default_factory=lambda: [800000])
    lr: float = 2e-4
    warmup: int = 5000
    grad_clip: float = 1.0
    ema_decay: float = 0.9999
    freeze_lower_res: bool = False
    seed: int = 0
    sample_step: int = 0
    sample_size: int = 25            # images per in-training sample grid
    save_step: int = 0
    eval_step: int = 0
    num_eval_images: int = 50000
    fid_weights: Optional[str] = None
    fid_stats_cache: Optional[str] = None
    metrics_every_iters: int = 100
    resume: bool = False   # restore latest checkpoint from own logdir
    # Run-id restore (the reference's wandb TRAIN_ID / TEST_ID,
    # diff_cifar/main.py:115-161): a run directory (or name under runs/)
    # whose saved config.yaml REPLACES the CLI config and whose checkpoint
    # is restored.  train_id continues training; test_id evaluates only.
    train_id: str = ""
    test_id: str = ""
    restore_iter: int = 0       # 0 -> the run's latest checkpoint
    stop_after_steps: int = 0   # graceful preemption after N global steps
    logdir: str = "runs/diff_cifar"


# Chain/bench drain protocol (bench.py::_drain_chains): a stop file asks any
# TPU-holding job to checkpoint and exit at its next step boundary, so the
# round-end bench capture never contends with a multi-thousand-step stage.
# Module-level re-export: tests monkeypatch THIS name per task module.
STOP_FILES = trainer.STOP_FILES


def _stop_file() -> Optional[str]:
    return trainer.stop_file_present(STOP_FILES)


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = dataclasses.field(
        default_factory=DiffusionConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    # mesh parallelism (parallel.data=N shards the GLOBAL batch over N
    # devices — the reference's nn.DataParallel wrap, diff_cifar/main.py:235-238)
    parallel: mesh_lib.ParallelConfig = dataclasses.field(
        default_factory=mesh_lib.ParallelConfig)


def build_model(cfg: Config) -> MultiResUNet:
    mc = cfg.model
    return MultiResUNet(
        ch=mc.ch, ch_mult=tuple(mc.ch_mult), attn=tuple(mc.attn),
        num_res_blocks=mc.num_res_blocks, dropout=mc.dropout,
        dwt_encoder=mc.dwt_encoder, multi_res_loss=mc.multi_res_loss,
        downsample_type=mc.downsample_type,
        dtype=jnp.bfloat16 if mc.use_bf16 else jnp.float32)


#: jitted sampler cache — a fresh @jax.jit per make_sampler call discards
#: the compile cache (one scan re-compile costs ~90 s through the tunneled
#: TPU backend; repeated evaluate() calls, e.g. the FID milestone curve,
#: would otherwise pay it every time).  Entries keep the model alive so the
#: id() key stays valid.
_SAMPLER_CACHE: dict = {}


def make_sampler(cfg: Config, model: MultiResUNet, sch: diffusion.DDPMSchedule,
                 n_levels_used: int):
    """One jitted full-scan ancestral sampler for a given level count
    (cached across calls per model + sampler configuration)."""

    kind = cfg.diffusion.sampler

    def build():
        @jax.jit
        def sampler(params, rng, x_T):
            def model_fn(x, t, n):
                return model.apply({"params": params}, x, t, n_levels_used=n)
            if kind == "ddim":
                return diffusion.ddim_sample(
                    model_fn, sch, rng, x_T, n_levels_used,
                    n_steps=cfg.diffusion.sample_steps,
                    multi_res_loss=cfg.model.multi_res_loss)
            if kind == "dpm_solver":
                return diffusion.dpm_solver_sample(
                    model_fn, sch, x_T, n_levels_used,
                    n_steps=cfg.diffusion.sample_steps,
                    multi_res_loss=cfg.model.multi_res_loss)
            assert kind == "ddpm", kind
            return diffusion.ddpm_sample(
                model_fn, sch, rng, x_T, n_levels_used,
                mean_type=cfg.diffusion.mean_type,
                var_type=cfg.diffusion.var_type,
                multi_res_loss=cfg.model.multi_res_loss)
        return sampler

    return jit_cache.cached_build(
        _SAMPLER_CACHE, (model, sch),
        (n_levels_used, kind, cfg.diffusion.sample_steps,
         cfg.diffusion.mean_type, cfg.diffusion.var_type,
         cfg.model.multi_res_loss), build)


def check_config(cfg: Config) -> None:
    """Consistency checks (the reference's ``check_hyperparams``,
    ``diff_mnist/hyperparams.py:99-113``, adapted to this task)."""
    n_stages = len(cfg.train.num_iterations_list)
    n_levels = len(cfg.model.ch_mult)
    assert n_stages >= 1
    assert n_stages <= n_levels, (
        f"{n_stages} stages but only {n_levels} levels")
    # note: unlike the OpenAI-style wavelet U-Net, MultiResUNet's per-level
    # channel-tiling heads make truncation consistent for non-uniform ch_mult
    if cfg.train.freeze_lower_res:
        assert n_stages > 1, "freezing requires the sequential algorithm"
    assert cfg.diffusion.mean_type in ("xprev", "xstart", "epsilon")
    assert cfg.diffusion.var_type in ("fixedlarge", "fixedsmall")
    assert cfg.diffusion.sampler in ("ddpm", "ddim", "dpm_solver"), \
        cfg.diffusion.sampler
    assert cfg.diffusion.sample_steps >= 2


def train(cfg: Config):
    cfg = config_lib.restore_run_config(cfg)
    check_config(cfg)
    mesh = mesh_lib.task_mesh(cfg.parallel)
    if mesh is not None:
        mesh_lib.check_batch_divisible(mesh, cfg.data.batch_size,
                                       "data.batch_size")
        log.info("Mesh parallelism: %s", dict(mesh.shape))
    rng = jax.random.PRNGKey(cfg.train.seed)
    if cfg.data.dataset == "cifar10":
        data, _ = image_data.load_cifar10(cfg.data.root, train=True)
    else:
        data, _ = image_data.synthetic_cifar10(cfg.data.synthetic_size)
    highest_res = data.shape[1]
    in_ch = data.shape[-1]
    # staged (sequ) runs train the first stage most-downsampled
    mesh_lib.check_spatial_resolution(
        mesh, highest_res >> (len(cfg.train.num_iterations_list) - 1),
        "smallest stage resolution")

    model = build_model(cfg)
    n_levels = model.n_levels
    sch = diffusion.DDPMSchedule.create(cfg.diffusion.beta_1,
                                        cfg.diffusion.beta_T,
                                        cfg.diffusion.T)

    init_rng, rng = jax.random.split(rng)
    x_init = jnp.zeros((2, highest_res, highest_res, 3))
    t_init = jnp.zeros((2,), jnp.int32)
    params = model.init(init_rng, x_init, t_init)["params"]
    ema_params = jax.tree_util.tree_map(jnp.copy, params)

    metrics = MetricsLogger(cfg.train.logdir)
    ckpt = CheckpointManager(os.path.join(cfg.train.logdir, "ckpt"))
    # "saving H config..." (main.py:163-166) — makes this run restorable
    # by id via train_id/test_id later.
    config_lib.save_yaml(cfg, os.path.join(cfg.train.logdir, "config.yaml"))
    stages = trainer.StageSpec.from_schedule(cfg.train.num_iterations_list,
                                             n_levels)
    sequ = len(stages) > 1
    state = None

    # Resume (the reference's wandb TRAIN_ID restore, main.py:115-161, which
    # loads model + EMA + optimizer + scheduler): full fidelity — the data
    # stream, flip randomness, per-step PRNG, optimizer moments and warmup
    # position all continue exactly where the interrupted run stopped.
    src_ckpt = ckpt
    resume_step = 0
    if cfg.train.train_id:
        src_ckpt = CheckpointManager(os.path.join(
            config_lib.resolve_run_dir(cfg.train.train_id), "ckpt"))
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
        to_tree = lambda t, like: jax.tree_util.tree_map(
            lambda _, v: jnp.asarray(v), like, t)
        params = to_tree(raw["params"], params)
        ema_params = to_tree(raw["ema_params"], ema_params)
        log.info("Resumed from checkpoint step %d", resume_step)

    # device_cache: stage the dataset in HBM once; the batch stream then
    # carries only indices (identical permutation RNG either way)
    data_dev = None
    if cfg.data.device_cache:
        # on a mesh the image H dim shards over 'spatial' (grid partitioning)
        # and the rest replicates; steps gather arbitrary rows from it
        data_dev = mesh_lib.place_dataset(data, mesh, h_axis=1) \
            if mesh is not None else jnp.asarray(data)
    source = [np.arange(len(data))] if data_dev is not None else [data]
    batches = loader_lib.infinite_batches(source, cfg.data.batch_size,
                                          seed=cfg.train.seed,
                                          start_step=resume_step)
    step_count = 0

    def save_full(step_count, state):
        ckpt.save(step_count, {
            "params": state.params, "ema_params": state.ema_params,
            "opt_state": state.opt_state, "rng": state.rng,
            "step": state.step})

    for stage in stages:
        n = stage.n_levels_used
        cur_res = highest_res // 2 ** stage.n_downsample
        if cfg.train.freeze_lower_res and sequ:
            assert sequ
            labels = freezing.multires_unet_labels(params, n_levels, n)
        else:
            labels = freezing.all_train_labels(params)
        mask = freezing.trainable_mask(labels)
        # fresh Adam + warmup every stage (main.py:374-377)
        tx = trainer.make_optimizer(
            schedules.warmup_lr(cfg.train.lr, cfg.train.warmup),
            grad_clip=cfg.train.grad_clip, labels=labels)
        # stage PRNG derived statelessly so a resumed run re-derives the
        # identical key without replaying the split history
        s_rng = jax.random.fold_in(rng, 10_000 + stage.index)
        state = trainer.TrainState.create(params, s_rng, tx.init(params))
        state = state.replace(ema_params=ema_params)
        if step_count < resume_step < step_count + stage.num_iterations:
            # mid-stage resume: optimizer moments, warmup position and the
            # per-step PRNG chain continue from the checkpoint
            state = state.replace(**src_ckpt.restore(resume_step, {
                "params": state.params, "ema_params": state.ema_params,
                "opt_state": state.opt_state, "rng": state.rng,
                "step": state.step}))
        # mesh placement: params/EMA/opt-moments TP-sharded over 'model'
        # (plain replication when model=1), scalars/rng replicated
        state = mesh_lib.place_state(
            state, mesh, min_channels=cfg.parallel.tp_min_channels)

        def loss_fn(p, step_rng, batch, n=n, stage=stage):
            def model_fn(x, t, nl):
                return model.apply({"params": p}, x, t, n_levels_used=nl,
                                   train=True,
                                   rngs={"dropout": step_rng})
            return diffusion.ddpm_loss(
                model_fn, sch, step_rng, batch, n_levels_used=n,
                n_levels=n_levels, n_downsample=stage.n_downsample,
                multi_res_loss=cfg.model.multi_res_loss,
                sequ_train_algo=sequ)

        step_fn = trainer.make_train_step(loss_fn, tx,
                                          ema_decay=cfg.train.ema_decay,
                                          trainable_mask=mask,
                                          with_grad_norm=True, jit=True)
        raw_step = trainer.make_train_step(loss_fn, tx,
                                           ema_decay=cfg.train.ema_decay,
                                           trainable_mask=mask,
                                           with_grad_norm=True, jit=False)

        from functools import partial

        @partial(jax.jit, donate_argnums=(0,))
        def chunk_fn(state, data_d, idxs, flips, nd=stage.n_downsample):
            """All steps between two host events as one scanned device call
            over the HBM-resident dataset (per-step dispatch through the
            tunneled backend costs ~300 ms in round trips alone)."""
            def body(st, inp):
                i, fl = inp
                x0 = data_d[i]
                x0 = jnp.where(fl[:, None, None, None], x0[:, :, ::-1, :],
                               x0)
                if sequ and nd:
                    x0 = wavelet.haar_downsample(x0, nd)
                st, loss, loss_list, gn = raw_step(st, x0)
                return st, (loss, tuple(loss_list), gn)
            state, (losses, loss_lists, gns) = jax.lax.scan(
                body, state, (idxs, flips))
            return state, losses, loss_lists, gns

        samplers = {}
        if step_count + stage.num_iterations <= resume_step:
            step_count += stage.num_iterations   # stage fully completed
            continue
        log.info("Stage %d/%d: res=%d n_levels_used=%d iters=%d",
                 stage.index + 1, stage.n_stages, cur_res, n,
                 stage.num_iterations)

        def fire_metrics(loss, loss_list, grad_norm):
            # train/grad_norm: the wandb.watch(model) analog
            m = {"train/loss": float(loss),
                 "train/grad_norm": float(grad_norm)}
            for k, l in enumerate(loss_list):
                m[f"train/res_{cur_res // 2**(len(loss_list)-1-k)}_loss"] \
                    = float(l)
            metrics.log(m, step_count)

        def fire_sampling(state):
            # EMA samples at every active resolution, logged as grids
            # (``diff_cifar/main.py:455-516`` keeps one x_T per resolution
            # and wandb-logs each sample grid)
            from unet_design_tpu.utils import visualization
            n_smp = cfg.train.sample_size
            for r in [cur_res // 2 ** i for i in range(n)]:
                nl = n - int(math.log2(cur_res // r))
                if nl not in samplers:
                    samplers[nl] = make_sampler(cfg, model, sch, nl)
                n_rng, smp_rng = jax.random.split(jax.random.fold_in(
                    jax.random.fold_in(rng, step_count), r))
                x_T = jax.random.normal(n_rng, (n_smp, r, r, in_ch))
                imgs = np.asarray(
                    samplers[nl](state.ema_params, smp_rng, x_T))
                side = max(1, int(math.sqrt(len(imgs))))
                fig = visualization.plot_sample_grid(
                    imgs[:side * side], side, side,
                    f"res {r}, iter {step_count}")
                metrics.log_figure(f"samples/res_{r}", fig, step_count)

        def fire_eval(state):
            e_rng = jax.random.fold_in(rng, 20_000 + step_count)
            scores = evaluate(cfg, model, state.ema_params, sch, e_rng,
                              n_levels_used=n, resolution=cur_res,
                              mesh=mesh)
            metrics.log({f"eval/{k}": v for k, v in scores.items()
                         if np.isscalar(v)}, step_count)

        stage_end = step_count + stage.num_iterations
        if step_count < resume_step:
            step_count = resume_step   # index stream already fast-forwarded
        cadences = (cfg.train.metrics_every_iters, cfg.train.sample_step,
                    cfg.train.eval_step)
        while step_count < stage_end:
            if data_dev is not None:
                # next host event >= step_count: pre-increment events fire
                # at k % c == 0, the save event fires at (k+1) % save == 0
                k_end = stage_end - 1
                for c in cadences:
                    if c:
                        k = (step_count if step_count % c == 0
                             else (step_count // c + 1) * c)
                        k_end = min(k_end, k)
                if cfg.train.save_step:
                    k_end = min(k_end, -(-(step_count + 1)
                                         // cfg.train.save_step)
                                * cfg.train.save_step - 1)
                if cfg.train.stop_after_steps:
                    k_end = min(k_end, cfg.train.stop_after_steps - 1)
                k_end = min(k_end, step_count + 1999)   # bound host buffers
                chunk = k_end - step_count + 1
                idxs = np.stack([next(batches)[0] for _ in range(chunk)])
                flips = np.stack([
                    np.random.default_rng(
                        (cfg.train.seed, step_count + j))
                    .random(idxs.shape[1]) < 0.5 for j in range(chunk)])
                # per-step batch axis sharded over 'data' (axis 1 of the
                # (chunk, bs) streams): each device gathers its shard only
                state, losses, loss_lists, gns = chunk_fn(
                    state, data_dev,
                    mesh_lib.shard_index_stream(
                        jnp.asarray(idxs, jnp.int32), mesh),
                    mesh_lib.shard_index_stream(jnp.asarray(flips), mesh))
                step_count = k_end
                loss, grad_norm = losses[-1], gns[-1]
                loss_list = [l[-1] for l in loss_lists]
            else:
                (x0,) = next(batches)
                # stateless per-step flip randomness: identical under resume
                x0 = image_data.random_horizontal_flip(
                    x0, np.random.default_rng((cfg.train.seed, step_count)))
                x0 = jnp.asarray(x0)
                if sequ and stage.n_downsample:
                    x0 = wavelet.haar_downsample(x0, stage.n_downsample)
                if mesh is not None:
                    # NHWC: batch over 'data', H over 'spatial'
                    x0 = mesh_lib.spatial_shard_batch(x0, mesh)
                state, loss, loss_list, grad_norm = step_fn(state, x0)
            if step_count % cfg.train.metrics_every_iters == 0:
                fire_metrics(loss, loss_list, grad_norm)
            if (cfg.train.sample_step
                    and step_count % cfg.train.sample_step == 0):
                fire_sampling(state)
            if (cfg.train.eval_step and step_count > 0
                    and step_count % cfg.train.eval_step == 0):
                fire_eval(state)
            step_count += 1
            # save AFTER the increment: checkpoint key k == "k steps done",
            # matching both the resume fast-forward and the data cursor
            saved_now = (cfg.train.save_step
                         and step_count % cfg.train.save_step == 0)
            if saved_now:
                save_full(step_count, state)
            stopped = _stop_file()
            if stopped or (cfg.train.stop_after_steps
                           and step_count >= cfg.train.stop_after_steps):
                # graceful preemption (time-limited jobs / bench drain):
                # checkpoint and leave; a resume=True rerun continues
                # bit-exactly
                if not saved_now:
                    save_full(step_count, state)
                if stopped:
                    print(f"stop file {stopped} — checkpointed at step "
                          f"{step_count} and exiting", flush=True)
                metrics.close()
                return state
        params = state.params
        ema_params = state.ema_params

    if ckpt.latest_step() != step_count:
        save_full(step_count, state)
    metrics.close()
    return state


def evaluate(cfg: Config, model, params, sch, rng, n_levels_used: int,
             resolution: int, num_images: Optional[int] = None,
             batch_size: int = 256, mesh=None):
    """Generate samples and compute IS (+FID with stats) (``main.py:94-110``).

    With ``mesh`` the sampling batch is sharded over the mesh's 'data' axis
    (replaces the reference's DataParallel sampler wrap,
    ``main.py:650-651``); params should already be replicated.
    """
    from unet_design_tpu.evalx.fid import FIDEvaluator
    from unet_design_tpu.evalx.inception import load_fid_params

    num_images = num_images or cfg.train.num_eval_images
    sampler = make_sampler(cfg, model, sch, n_levels_used)
    if mesh is not None:
        params = mesh_lib.place_state(
            params, mesh, min_channels=cfg.parallel.tp_min_channels)
        batch_size = max((batch_size // mesh.shape["data"])
                         * mesh.shape["data"], mesh.shape["data"])
    images = []
    for s in range(0, num_images, batch_size):
        b = min(batch_size, num_images - s)
        rng, n_rng, s_rng = jax.random.split(rng, 3)
        x_T = jax.random.normal(n_rng, (b, resolution, resolution, 3))
        if mesh is not None:
            # pad the tail batch up to a mesh multiple so it samples sharded
            # too (padded rows are trimmed after sampling)
            pad = (-b) % mesh.shape["data"]
            if pad:
                x_T = jnp.concatenate([x_T, x_T[:pad]], axis=0)
            x_T = mesh_lib.shard_batch(x_T, mesh)
        x0 = sampler(params, s_rng, x_T)[:b]
        images.append(np.asarray((x0 + 1.0) / 2.0))
    images = np.concatenate(images)

    fid_vars = (load_fid_params(cfg.train.fid_weights)
                if cfg.train.fid_weights else None)
    # batch 100 halves the tunnel round-trips vs the reference's 50; the
    # scores are batch-size-independent (Inception BatchNorm runs on fixed
    # inference statistics)
    evaluator = FIDEvaluator(fid_vars, cfg.train.fid_stats_cache,
                             batch_size=100)
    result = evaluator.compute(images)
    out = {"IS": result["inception_score"][0],
           "IS_std": result["inception_score"][1]}
    if "fid" in result:
        out["FID"] = result["fid"]
    if "kid" in result:
        out["KID"], out["KID_std"] = result["kid"]
    if "warning" in result:
        # make the random-weights caveat impossible to miss: the numbers look
        # plausible but are NOT comparable to published FID/IS
        log.warning("FID/IS computed with RANDOM Inception weights: %s",
                    result["warning"])
        out["untrusted_random_inception_weights"] = 1.0
    return out


def test_eval(cfg: Config):
    """TEST_ID mode (``diff_cifar/main.py:148-161`` + the eval path
    ``main.py:644-693``): restore a finished run by id and compute the
    sampling evaluation (IS, and FID when stats/weights are configured) on
    its EMA parameters, without training.  Returns the scores dict."""
    cli = cfg
    cfg = config_lib.restore_run_config(cfg)
    if cfg is not cli:
        # eval-protocol knobs stay CLI-owned in test mode (like TEST_ITER,
        # ``main.py:148-149``): how to sample/score is an eval-time choice
        cfg.train.num_eval_images = cli.train.num_eval_images
        cfg.train.fid_weights = cli.train.fid_weights
        cfg.train.fid_stats_cache = cli.train.fid_stats_cache
        cfg.diffusion.sampler = cli.diffusion.sampler
        cfg.diffusion.sample_steps = cli.diffusion.sample_steps
    if cli.train.logdir == type(cli.train)().logdir:
        # no explicit logdir: write eval artifacts next to the restored run
        # instead of appending into whatever lives at the default logdir
        cfg.train.logdir = os.path.join(
            config_lib.resolve_run_dir(cfg.train.test_id), "eval")
    check_config(cfg)
    rng = jax.random.PRNGKey(cfg.train.seed)
    if cfg.data.dataset == "cifar10":
        data, _ = image_data.load_cifar10(cfg.data.root, train=True)
    else:
        data, _ = image_data.synthetic_cifar10(cfg.data.synthetic_size)
    highest_res = data.shape[1]

    model = build_model(cfg)
    n_levels = model.n_levels
    sch = diffusion.DDPMSchedule.create(cfg.diffusion.beta_1,
                                        cfg.diffusion.beta_T,
                                        cfg.diffusion.T)
    x_init = jnp.zeros((2, highest_res, highest_res, 3))
    t_init = jnp.zeros((2,), jnp.int32)
    params = model.init(rng, x_init, t_init)["params"]

    src = CheckpointManager(os.path.join(
        config_lib.resolve_run_dir(cfg.train.test_id), "ckpt"))
    step = cfg.train.restore_iter or src.latest_step()
    raw = src.restore_raw(step)
    ema_params = jax.tree_util.tree_map(lambda _, v: jnp.asarray(v),
                                        params, raw["ema_params"])
    log.info("test_eval: restored run %s at step %s", cfg.train.test_id,
             step)

    stages = trainer.StageSpec.from_schedule(cfg.train.num_iterations_list,
                                             n_levels)
    final = stages[-1]
    resolution = highest_res // 2 ** final.n_downsample
    metrics = MetricsLogger(cfg.train.logdir)
    scores = evaluate(cfg, model, ema_params, sch,
                      jax.random.fold_in(rng, 40_000),
                      final.n_levels_used, resolution)
    metrics.log({f"eval/{k}": v for k, v in scores.items()
                 if isinstance(v, (int, float))}, step or 0)
    metrics.close()
    with open(os.path.join(cfg.train.logdir, "eval_scores.json"),
              "w") as f:
        json.dump({k: float(v) for k, v in scores.items()}, f, indent=1)
    return scores


def main(argv=None):
    import sys
    cfg = parse_cli(Config, argv if argv is not None else sys.argv[1:])
    if cfg.train.test_id:
        test_eval(cfg)
    else:
        train(cfg)


if __name__ == "__main__":
    main()
