"""pdearena task: PDE surrogate training (Navier-Stokes 2D / Shallow water 2D).

TPU-native re-design of ``pdearena/models/pdemodel.py`` + ``scripts/train.py``:
epoch-staged sequential training (``find_cur_stage``, ``:182-192``), freezing
(``:194-220``), DWT downsampling of x and multi-res y (``dwt_downsample``,
``:141-180``), one-step train/validation and `lax.scan` rollout validation
(``:317-375``), bootstrap epoch aggregation, Adam (``:509-511``) with optional
LinearWarmupCosine (the README recipe uses AdamW 2e-4 / wd 1e-5 / 5-50 epoch
warmup-cosine).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_design_tpu.data import loader as loader_lib
from unet_design_tpu.data import pde as pde_data
from unet_design_tpu.evalx import metrics as eval_metrics
from unet_design_tpu.models import registry
from unet_design_tpu.parallel import mesh as mesh_lib
from unet_design_tpu.process import losses as losses_lib
from unet_design_tpu.process import rollout as rollout_lib
from unet_design_tpu.ops import wavelet
from unet_design_tpu.train import freezing, schedules, trainer
from unet_design_tpu.train.checkpoint import CheckpointManager
from unet_design_tpu.utils import jit_cache
from unet_design_tpu.utils.config import parse_cli
from unet_design_tpu.utils.logging import MetricsLogger, get_logger

log = get_logger(__name__)

# bench/chain drain protocol; module-level so tests monkeypatch per task
# (see trainer.STOP_FILES and bench.py::_drain_chains)
STOP_FILES = trainer.STOP_FILES


@dataclasses.dataclass
class ModelConfig:
    name: str = "Unetbase-64_G"
    hidden_channels: int = 64
    activation: str = "gelu"
    dwt_encoder: bool = False
    up_fct: str = "interpolate_nearest"
    n_extra_resnet_layers: int = 0
    multi_res_loss: bool = False
    no_skip_connection: bool = False
    no_down_up: bool = False
    # jax.checkpoint per conv block (Unetbase-64_G only): drops intra-block
    # activations in backward; math-identical, ~30% recompute.  Needed for
    # the biggest arm (dwt + 3 extra decoder layers) next to a >7 GB
    # HBM-staged dataset.
    remat: bool = False
    use_bf16: bool = False


@dataclasses.dataclass
class DataConfig:
    task: str = "synthetic"          # navierstokes2d | shallowwater2d | synthetic
    data_path: str = "./datasets/ns2d"
    n_scalar_components: int = 1
    n_vector_components: int = 1
    trajlen: int = 14
    resolution: int = 128
    time_history: int = 4
    time_future: int = 1
    time_gap: int = 0
    max_num_steps: int = 5
    batch_size: int = 8
    # shallow-water temporal subsampling of the stored frames
    # (``datapipes/shallowwater2d.py:103-109``): the 2-day task reads
    # ``[4::8]``, the 1-day task ``[4::4]``; 1 = no subsampling.
    skip_nt: int = 0
    sample_rate: int = 1
    limit_trajectories: Optional[int] = None
    # write each split's stacked array once to <data_path>/.stack_cache and
    # bulk-load it afterwards (this host's disk serves many-small-file
    # splits at ~20 MB/s; see data/pde.py cached_opener)
    stacked_cache: bool = False
    n_synthetic: int = 8
    # windows drawn per trajectory per epoch; None = trajlen, the reference
    # datapipe's ``cycle(trajlen)`` semantics (datapipes/common.py:69-96).
    # Set 1 for quick smoke runs (14x shorter epochs at trajlen=14).
    train_cycles: Optional[int] = None
    # read each trajectory file once and serve numpy views (this host has a
    # single core; the reference's re-read-every-epoch pipes would starve
    # the TPU)
    cache_in_memory: bool = True
    # stage the WHOLE train set in device HBM and gather windows inside the
    # jitted step — the host then ships only (traj_idx, start) integers per
    # batch.  Auto-disabled above device_cache_max_bytes.
    device_cache: bool = True
    device_cache_max_bytes: int = 8_000_000_000


@dataclasses.dataclass
class TrainConfig:
    num_epochs_list: List[int] = dataclasses.field(
        default_factory=lambda: [50])
    lr: float = 2e-4
    optimizer: str = "adam"          # adam | adamw
    weight_decay: float = 0.0
    criterion: str = "mse"           # mse | scaledl2
    warmup_epochs: int = 0           # >0 enables LinearWarmupCosine
    eta_min: float = 0.0             # cosine floor (README recipe: 1e-7)
    warmup_start_lr: float = 0.0     # reference default 1e-8
    # cosine horizon in epochs; None = total training epochs.  The reference
    # sw2d recipe anneals over 30 epochs while training 20
    # (``configs/shallowwater2d_2day.yaml`` lr_scheduler max_epochs=30 vs
    # trainer max_epochs=20), so the LR never reaches eta_min there.
    scheduler_max_epochs: Optional[int] = None
    freeze_lower_res: bool = False
    seed: int = 0
    val_every_epochs: int = 1
    resume: bool = False        # continue from the last epoch checkpoint
    stop_after_epochs: int = 0  # graceful preemption after N epochs
    # cadence of the full-state 'latest' checkpoint (a ~3x-params write;
    # every epoch is safest, sparser is faster for long runs)
    save_latest_every: int = 1
    # Pallas fused Haar pyramid for the multi-res-loss targets (3.1x vs the
    # XLA avg-pool chain at the 128px PDE shape on v5e).  Off by default:
    # the training step runs inside lax.scan, and pallas-in-scan hangs
    # tunneled (axon) backends — enable on directly-attached TPUs only.
    use_pallas_haar: bool = False
    # Upper bound on the steps covered by ONE scanned device call (0 = the
    # whole epoch).  The tunneled axon backend kills executions that run too
    # long ("TPU worker process crashed"): the dwt+3-extra-decoder-layers
    # arm's ~4550-step epoch at 1/2-scale NS-2D reproducibly died while the
    # cheaper arms' shorter calls passed.  Chunking is math-identical — the
    # same step stream, split across several scans.
    max_scan_steps: int = 0
    # Permute the trajectory order per epoch in the HBM-staged stream (the
    # reference shuffles trajectory files each epoch: datapipes/common.py
    # shuffle->shard->open).  Off by default so runs keep bit-comparability
    # with the published table-1 arms, which trained with fixed order +
    # random window starts; flip on for new experiments.
    shuffle_trajectory_order: bool = False
    logdir: str = "runs/pde"


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    # mesh parallelism (parallel.data=N shards the GLOBAL batch over N
    # devices; the reference's Lightning `trainer.devices`/`strategy` analog,
    # configs/navierstokes2d.yaml:55,70-71)
    parallel: mesh_lib.ParallelConfig = dataclasses.field(
        default_factory=mesh_lib.ParallelConfig)


def pde_config(cfg: DataConfig) -> pde_data.PDEDataConfig:
    return pde_data.PDEDataConfig(cfg.n_scalar_components,
                                  cfg.n_vector_components, cfg.trajlen, 2)


def supports_spatial_guard(name: str) -> bool:
    """True when the registry model has a ``spatial_guard`` field, i.e. it
    applies the per-level sharding-constraint hook that lifts the grid
    partitioning resolution floor (parallel/mesh.make_spatial_guard)."""
    spec = registry.MODEL_REGISTRY.get(name)
    return spec is not None and "spatial_guard" in getattr(
        spec["cls"], "__dataclass_fields__", {})


def build_model(cfg: Config, mesh=None):
    mc = cfg.model
    overrides = dict(hidden_channels=mc.hidden_channels,
                     dtype=jnp.bfloat16 if mc.use_bf16 else jnp.float32)
    if mc.name == "Unetbase-64_G":
        overrides.update(dwt_encoder=mc.dwt_encoder, up_fct=mc.up_fct,
                         n_extra_resnet_layers=mc.n_extra_resnet_layers,
                         multi_res_loss=mc.multi_res_loss,
                         sequ_mode=True,
                         no_skip_connection=mc.no_skip_connection,
                         no_down_up=mc.no_down_up, remat=mc.remat)
    if (mesh is not None and mesh.shape.get("spatial", 1) > 1
            and supports_spatial_guard(mc.name)):
        overrides["spatial_guard"] = mesh_lib.make_spatial_guard(mesh)
    return registry.build_model(
        mc.name, cfg.data.n_scalar_components, cfg.data.n_vector_components,
        cfg.data.time_history, cfg.data.time_future, mc.activation,
        **overrides)


def open_trajectories(cfg: DataConfig, mode: str):
    if cfg.task == "navierstokes2d":
        files = pde_data.NavierStokesOpener.list_files(cfg.data_path, mode)
        files = loader_lib.shard_for_process(files)
        return pde_data.NavierStokesOpener(files, mode,
                                           cfg.limit_trajectories)
    if cfg.task == "shallowwater2d":
        files = pde_data.ShallowWaterOpener.list_files(cfg.data_path, mode)
        files = loader_lib.shard_for_process(files)
        return pde_data.ShallowWaterOpener(files, mode,
                                           cfg.limit_trajectories,
                                           skip_nt=cfg.skip_nt,
                                           sample_rate=cfg.sample_rate)
    if cfg.task == "synthetic":
        return pde_data.synthetic_trajectories(cfg.n_synthetic,
                                               pde_config(cfg),
                                               res=cfg.resolution)
    raise ValueError(cfg.task)


def stack_cache_dir(cfg: DataConfig) -> Optional[str]:
    """Directory for the on-disk stacked split cache (None = disabled)."""
    if not cfg.stacked_cache:
        return None
    return os.path.join(cfg.data_path, ".stack_cache")


def find_cur_stage(num_epochs_list: List[int], epoch: int) -> int:
    """``PDEModel.find_cur_stage`` (``pdemodel.py:182-192``)."""
    cum = np.cumsum(num_epochs_list).tolist()
    cum = [0] + cum[:-1]
    stage = len(num_epochs_list) - 1
    for c in reversed(cum):
        if epoch >= c:
            break
        stage -= 1
    return int(stage)


def is_g_model(name: str) -> bool:
    return name.endswith("_G")


def _gather_windows(fields: jnp.ndarray, idx: jnp.ndarray,
                    starts: jnp.ndarray, th: int, tf: int, tg: int):
    """Device-side ``create_data2d`` (``data/utils.py:17-71`` semantics):
    x = frames [s, s+th), y = frames [s+th+tg, s+th+tg+tf), gathered from
    the HBM-resident dataset so the input pipeline costs the host nothing."""
    def one(i, s):
        w = jax.lax.dynamic_slice_in_dim(fields[i], s, th + tg + tf, axis=0)
        return w[:th], w[th + tg:]
    return jax.vmap(one)(idx, starts)


def train(cfg: Config):
    mesh = mesh_lib.task_mesh(cfg.parallel)
    if mesh is not None:
        mesh_lib.check_batch_divisible(mesh, cfg.data.batch_size,
                                       "data.batch_size")
        # staged (sequ) runs train the first stage most-downsampled
        mesh_lib.check_spatial_resolution(
            mesh,
            cfg.data.resolution >> (len(cfg.train.num_epochs_list) - 1),
            "smallest stage resolution",
            guarded=supports_spatial_guard(cfg.model.name))
        log.info("Mesh parallelism: %s", dict(mesh.shape))
    rng = jax.random.PRNGKey(cfg.train.seed)
    pde = pde_config(cfg.data)
    model = build_model(cfg, mesh)
    g_model = is_g_model(cfg.model.name)
    n_levels = getattr(model, "n_levels", None)
    sequ = len(cfg.train.num_epochs_list) > 1
    n_epochs_total = sum(cfg.train.num_epochs_list)
    criterion = losses_lib.CRITERIA[cfg.train.criterion]

    th, tf, tg = (cfg.data.time_history, cfg.data.time_future,
                  cfg.data.time_gap)
    x_init = jnp.zeros((1, th, cfg.data.resolution, cfg.data.resolution,
                        pde.n_scalar_components + 2 * pde.n_vector_components))
    init_rng, rng = jax.random.split(rng)
    variables = model.init(init_rng, x_init)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}

    metrics_logger = MetricsLogger(cfg.train.logdir)
    ckpt = CheckpointManager(os.path.join(cfg.train.logdir, "ckpt"))
    # epoch-granular full-state checkpoints for resume, separate from the
    # best-val policy above (Lightning keeps 'last' next to 'best' the same
    # way, configs/navierstokes2d.yaml:37-46)
    ckpt_latest = CheckpointManager(
        os.path.join(cfg.train.logdir, "ckpt_latest"), keep=2)
    best_val = np.inf
    prev_stage = -1
    step_fn = None
    eval_fn = None
    step = 0
    cycles = (cfg.data.train_cycles if cfg.data.train_cycles is not None
              else pde.trajlen)

    train_opener = open_trajectories(cfg.data, "train")
    valid_opener = open_trajectories(cfg.data, "valid")
    if cfg.data.cache_in_memory:
        cdir = stack_cache_dir(cfg.data)
        ns = pde.n_scalar_components
        train_opener = pde_data.cached_opener(train_opener, ns, cdir)
        valid_opener = pde_data.cached_opener(valid_opener, ns, cdir)
    fields_dev = valid_fields_dev = None
    if cfg.data.device_cache and hasattr(train_opener, "stacked_fields"):
        stacked = train_opener.stacked_fields()
        if stacked.nbytes <= cfg.data.device_cache_max_bytes:
            # one bulk H2D upload; on a mesh the H dim shards over 'spatial'
            # (grid partitioning) and the rest replicates — (B,T,H,W,C)
            fields_dev = mesh_lib.place_dataset(stacked, mesh, h_axis=2) \
                if mesh is not None else jnp.asarray(stacked)
            log.info("Train set staged in device HBM: %s (%.2f GB)",
                     stacked.shape, stacked.nbytes / 1e9)
            vstacked = valid_opener.stacked_fields()
            if (stacked.nbytes + vstacked.nbytes
                    <= cfg.data.device_cache_max_bytes):
                valid_fields_dev = mesh_lib.place_dataset(
                    vstacked, mesh, h_axis=2) if mesh is not None \
                    else jnp.asarray(vstacked)
                log.info("Valid set staged in device HBM: %s (%.2f GB)",
                         vstacked.shape, vstacked.nbytes / 1e9)
            del vstacked
        else:
            log.warning("device_cache disabled: %.2f GB > max %.2f GB",
                        stacked.nbytes / 1e9,
                        cfg.data.device_cache_max_bytes / 1e9)
        del stacked

    def count_trajectories() -> int:
        try:
            return train_opener.n_trajectories()
        except AttributeError:
            pass
        try:
            return len(train_opener)
        except TypeError:
            raise ValueError(
                "cannot determine steps/epoch for the LR schedule: train "
                "opener has neither n_trajectories() nor __len__ "
                f"({type(train_opener).__name__}); the warmup-cosine "
                "schedule would be silently distorted")

    lr = cfg.train.lr
    if cfg.train.warmup_epochs > 0:
        # optax evaluates the schedule per optimizer step; the reference
        # steps LinearWarmupCosineAnnealingLR once per epoch, so convert.
        n_windows = count_trajectories() * cycles
        steps_per_epoch = max(1, -(-n_windows // cfg.data.batch_size))
        lr = schedules.linear_warmup_cosine_annealing(
            cfg.train.lr, cfg.train.warmup_epochs,
            cfg.train.scheduler_max_epochs or n_epochs_total,
            warmup_start_lr=cfg.train.warmup_start_lr,
            eta_min=cfg.train.eta_min, steps_per_epoch=steps_per_epoch)

    # Full-fidelity resume: params, BatchNorm stats, optimizer moments,
    # schedule position (opt count), per-step PRNG and best-val marker all
    # continue; the data stream is already epoch-seeded so the resumed run
    # consumes identical batches.
    start_epoch = 0
    resume_state_raw = None
    if cfg.train.resume and ckpt_latest.latest_step() is not None:
        last_epoch = ckpt_latest.latest_step()
        extra = ckpt_latest.load_extra(last_epoch) or {}
        start_epoch = last_epoch + 1
        step = int(extra.get("step", 0))
        best_val = float(extra.get("best_val", np.inf))
        resume_state_raw = ckpt_latest.restore_raw(last_epoch)
        to_tree = lambda t, like: jax.tree_util.tree_map(
            lambda _, v: jnp.asarray(v), like, t)
        params = to_tree(resume_state_raw["params"], params)
        if model_state:
            model_state = to_tree(resume_state_raw["model_state"],
                                  model_state)
        log.info("Resuming at epoch %d (step %d)", start_epoch, step)

    for epoch in range(start_epoch, n_epochs_total):
        stage = find_cur_stage(cfg.train.num_epochs_list, epoch) if sequ \
            else len(cfg.train.num_epochs_list) - 1
        n_downsample = (len(cfg.train.num_epochs_list) - (stage + 1)
                        if sequ else 0)
        n_levels_used = ((stage + 1) if sequ else n_levels) if g_model \
            else None

        if stage != prev_stage:
            if (cfg.train.freeze_lower_res and sequ and g_model
                    and stage != 0):
                labels = freezing.unetbase_g_labels(params, n_levels,
                                                    n_levels_used)
            else:
                labels = freezing.all_train_labels(params)
            tx = trainer.make_optimizer(lr, labels=labels,
                                        optimizer=cfg.train.optimizer,
                                        weight_decay=cfg.train.weight_decay)
            # stage PRNG derived statelessly so a resumed run re-derives the
            # identical key without replaying the split history
            s_rng = jax.random.fold_in(rng, 10_000 + stage)
            state = trainer.TrainState.create(
                params, s_rng, tx.init(params), ema=False,
                model_state=model_state or None)
            if (resume_state_raw is not None
                    and find_cur_stage(cfg.train.num_epochs_list,
                                       max(start_epoch - 1, 0)) == stage):
                # mid-stage resume: optimizer moments, schedule position and
                # the per-step PRNG chain continue from the checkpoint (at a
                # stage boundary the uninterrupted run re-inits them fresh)
                target = {"params": state.params,
                          "opt_state": state.opt_state,
                          "rng": state.rng, "step": state.step}
                if model_state:
                    target["model_state"] = model_state
                restored = ckpt_latest.restore(start_epoch - 1, target)
                state = state.replace(
                    params=restored["params"],
                    opt_state=restored["opt_state"], rng=restored["rng"],
                    step=restored["step"],
                    model_state=restored.get("model_state",
                                             state.model_state))
            resume_state_raw = None
            # mesh placement: params/opt-moments TP-sharded over 'model'
            # (replication when model=1), scalars/rng replicated
            state = mesh_lib.place_state(
                state, mesh, min_channels=cfg.parallel.tp_min_channels)

            has_mstate = bool(model_state)

            def loss_fn(p, mstate, step_rng, batch, n=n_levels_used,
                        nd=n_downsample):
                if fields_dev is not None:
                    # HBM-resident dataset: batch is (fields, idx, starts);
                    # fields enters as an argument, not a closure constant
                    # (constants bloat the remote-compile payload)
                    fields, idx, starts = batch
                    x, y = _gather_windows(fields, idx, starts, th, tf, tg)
                else:
                    x, y = batch
                new_mstate = mstate
                if sequ and nd > 0:
                    x = wavelet.haar_downsample_traj(x, nd)
                if g_model:
                    pred = model.apply({"params": p}, x, n_levels_used=n)
                elif has_mstate:
                    # BatchNorm models (Unet2015): update batch_stats
                    pred, updates = model.apply(
                        {"params": p, **mstate}, x, train=True,
                        mutable=list(mstate.keys()))
                    new_mstate = updates
                else:
                    pred = model.apply({"params": p}, x)
                if cfg.model.multi_res_loss and g_model:
                    _pyr = None
                    if cfg.train.use_pallas_haar:
                        # only safe on a directly-attached TPU: the step
                        # runs inside lax.scan and pallas-in-scan wedges
                        # tunneled (axon) backends; CPU can't lower it
                        if jax.default_backend() == "tpu":
                            from unet_design_tpu.ops.pallas.haar import \
                                haar_pyramid_fused as _pyr
                        else:
                            log.warning(
                                "use_pallas_haar ignored on backend %r "
                                "(needs a directly-attached TPU)",
                                jax.default_backend())
                    ys = wavelet.multires_targets_traj(y, n_levels, nd,
                                                       pyramid_fn=_pyr)
                    ys = ys[-len(pred):]
                    loss = losses_lib.multires_sum(criterion, pred, ys)
                    pred_f, y_f = pred[-1], ys[-1]
                else:
                    if sequ and nd > 0:
                        y = wavelet.haar_downsample_traj(y, nd)
                    loss = criterion(pred, y)
                    pred_f, y_f = pred, y
                scalar_loss = criterion(
                    pred_f[..., :pde.n_scalar_components],
                    y_f[..., :pde.n_scalar_components])
                return loss, ({"scalar_loss": scalar_loss}, new_mstate)

            step_fn = trainer.make_train_step(loss_fn, tx,
                                              has_model_state=True, jit=True)
            raw_step = trainer.make_train_step(loss_fn, tx,
                                               has_model_state=True,
                                               jit=False)

            # Whole-epoch lax.scan over the HBM-resident dataset: ONE device
            # call per epoch.  Per-step dispatch through the tunneled axon
            # backend costs ~300 ms/step in round trips; scanning the train
            # step removes the host from the hot loop entirely.
            @partial(jax.jit, donate_argnums=(0,), static_argnums=())
            def epoch_fn(state, fields, idxs, starts):
                def body(st, inp):
                    i, s = inp
                    st, loss, _aux = raw_step(st, (fields, i, s))
                    return st, loss
                return jax.lax.scan(body, state, (idxs, starts))

            @jax.jit
            def eval_fn(p, batch, n=n_levels_used, nd=n_downsample):
                x, y = batch
                if sequ and nd > 0:
                    x = wavelet.haar_downsample_traj(x, nd)
                    y = wavelet.haar_downsample_traj(y, nd)
                if g_model:
                    pred = model.apply({"params": p}, x, n_levels_used=n)
                    if cfg.model.multi_res_loss:
                        pred = pred[-1]
                else:
                    pred = model.apply({"params": p, **model_state}, x)
                return {"mse": losses_lib.custom_mse_loss(pred, y),
                        "scaledl2": losses_lib.scaledlp_loss(pred, y)}

            prev_stage = stage
            log.info("Stage %d (epoch %d): n_levels_used=%s n_downsample=%d",
                     stage, epoch, n_levels_used, n_downsample)

        # ---- train epoch
        epoch_losses = []
        if fields_dev is not None:
            # device-side window gathering; the whole epoch is one scanned
            # device call (idxs/starts are two small int32 uploads)
            ep_rng = np.random.default_rng(cfg.train.seed + epoch)
            mst = pde_data.max_start_time(pde.trajlen, th, tf, tg)
            idx_stream = np.tile(np.arange(fields_dev.shape[0]), cycles)
            if cfg.train.shuffle_trajectory_order:
                idx_stream = ep_rng.permutation(idx_stream)
            starts = ep_rng.integers(0, mst + 1, size=idx_stream.size)
            bs = cfg.data.batch_size
            n_steps = idx_stream.size // bs
            # on a mesh the per-step batch axis shards over 'data': each
            # device gathers only its shard's windows and XLA all-reduces
            # the loss/grads over ICI
            idxs = mesh_lib.shard_index_stream(jnp.asarray(
                idx_stream[:n_steps * bs].reshape(n_steps, bs), jnp.int32),
                mesh)
            sts = mesh_lib.shard_index_stream(jnp.asarray(
                starts[:n_steps * bs].reshape(n_steps, bs), jnp.int32),
                mesh)
            t0 = time.monotonic()
            mss = cfg.train.max_scan_steps
            if mss and n_steps > mss:
                # several shorter device calls over the same step stream
                # (equal-size chunks so one compiled program serves all but
                # the tail); see TrainConfig.max_scan_steps
                losses = []
                for lo in range(0, n_steps, mss):
                    state, chunk = epoch_fn(state, fields_dev,
                                            idxs[lo:lo + mss],
                                            sts[lo:lo + mss])
                    losses.append(chunk)
                epoch_losses = np.concatenate(
                    [np.asarray(c) for c in losses])
            else:
                state, losses = epoch_fn(state, fields_dev, idxs, sts)
                epoch_losses = np.asarray(losses)  # one fetch/epoch (syncs)
            dt = time.monotonic() - t0
            metrics_logger.log({"train/epoch_seconds": dt,
                                "train/steps_per_sec": n_steps / dt},
                               step + n_steps)
            step += n_steps
        else:
            windows = pde_data.randomized_train_windows(
                train_opener, pde, th, tf, tg, seed=cfg.train.seed + epoch,
                cycles=cycles)
            for bx, by in pde_data.batched_windows(windows,
                                                   cfg.data.batch_size):
                batch = (jnp.asarray(bx), jnp.asarray(by))
                if mesh is not None:
                    # (B,T,H,W,C): batch over 'data', H over 'spatial'
                    batch = mesh_lib.spatial_shard_batch(batch, mesh)
                state, loss, aux = step_fn(state, batch)
                epoch_losses.append(loss)
                step += 1
        if len(epoch_losses):
            if not isinstance(epoch_losses, np.ndarray):
                epoch_losses = np.asarray(jnp.stack(epoch_losses))
            mean, std = eval_metrics.bootstrap(epoch_losses.astype(
                np.float64))
            metrics_logger.log({"train/loss_mean": mean,
                                "train/loss_std": std,
                                "epoch": epoch}, step)
        params = state.params
        if state.model_state is not None:
            model_state = state.model_state  # updated BatchNorm stats

        # ---- validation (one-step + rollout)
        if (epoch + 1) % cfg.train.val_every_epochs == 0:
            if valid_fields_dev is not None:
                val = validate_device(cfg, model, params, model_state, pde,
                                      n_levels_used,
                                      n_downsample if sequ else 0,
                                      valid_fields_dev, mesh=mesh)
            else:
                val = validate(cfg, model, params, model_state, pde,
                               n_levels_used, n_downsample if sequ else 0,
                               eval_fn, valid_opener)
            metrics_logger.log(val, step)
            if val.get("valid/unrolled_loss_mean", np.inf) < best_val:
                best_val = val["valid/unrolled_loss_mean"]
                ckpt.save(step, {"params": params},
                          extra={"epoch": epoch, "best_val": best_val})

        # ---- epoch-granular full-state checkpoint (resume point)
        stopped = trainer.stop_file_present(STOP_FILES)
        stopping = stopped or (cfg.train.stop_after_epochs and epoch + 1 >=
                               start_epoch + cfg.train.stop_after_epochs)
        if ((epoch + 1) % max(cfg.train.save_latest_every, 1) == 0
                or stopping or epoch + 1 == n_epochs_total):
            full = {"params": state.params, "opt_state": state.opt_state,
                    "rng": state.rng, "step": state.step}
            if model_state:
                full["model_state"] = model_state
            ckpt_latest.save(epoch, full,
                             extra={"step": step,
                                    "best_val": float(best_val)})
        if stopping:
            log.info("Stopping after %d epochs (%s)", epoch + 1,
                     f"stop file {stopped}" if stopped
                     else "graceful preemption")
            break

    metrics_logger.close()
    return state


#: jitted validator cache — keyed on the model instance plus every static
#: that shapes the traced program.  Without this the two ``@jax.jit`` scans
#: would be rebuilt (and their compile cache discarded) every epoch: through
#: the tunneled backend each re-compile costs ~90 s, which dominated the
#: epoch time of the protocol reproductions (~190 s valid vs ~13 s train).
#: The cached entry holds a strong reference to the model so its ``id`` can
#: never be reused while the entry is alive.
_VALIDATOR_CACHE: dict = {}


def _device_validators(model, n_levels_used, nd, th, tf, tg, g_model,
                       has_mstate, multi_res_loss, n_sc, max_num_steps,
                       starts_r):
    statics = (n_levels_used, nd, th, tf, tg, g_model, has_mstate,
               multi_res_loss, n_sc, max_num_steps, starts_r)
    return jit_cache.cached_build(
        _VALIDATOR_CACHE, (model,), statics,
        lambda: _build_device_validators(model, n_levels_used, nd, th, tf,
                                         tg, g_model, has_mstate,
                                         multi_res_loss, n_sc, max_num_steps,
                                         starts_r))


def _build_device_validators(model, n_levels_used, nd, th, tf, tg, g_model,
                             has_mstate, multi_res_loss, n_sc, max_num_steps,
                             starts_r):
    def apply_model(p, ms, x):
        if g_model:
            pred = model.apply({"params": p}, x, n_levels_used=n_levels_used)
            return pred[-1] if multi_res_loss else pred
        if has_mstate:
            return model.apply({"params": p, **ms}, x)
        return model.apply({"params": p}, x)

    @jax.jit
    def one_step_scan(p, ms, fields, idxs, sts):
        def body(carry, inp):
            i, s = inp
            x, y = _gather_windows(fields, i, s, th, tf, tg)
            if nd > 0:
                x = wavelet.haar_downsample_traj(x, nd)
                y = wavelet.haar_downsample_traj(y, nd)
            pred = apply_model(p, ms, x)
            return carry, {"mse": losses_lib.custom_mse_loss(pred, y),
                           "scaledl2": losses_lib.scaledlp_loss(pred, y)}
        _, outs = jax.lax.scan(body, 0, (idxs, sts))
        return {k: jnp.mean(v) for k, v in outs.items()}

    @jax.jit
    def rollout_scan(p, ms, fields, idxs):
        def model_fn(window):
            return apply_model(p, ms, window)

        def body(carry, i):
            f = fields[i]
            if nd > 0:
                f = wavelet.haar_downsample_traj(f, nd)
            u = f[..., :n_sc]
            v = f[..., n_sc:] if f.shape[-1] > n_sc else None
            ls = []
            for start in starts_r:
                init_u = u[:, start:start + th]
                init_v = v[:, start:start + th] if v is not None else None
                pred = rollout_lib.rollout2d(model_fn, init_u, init_v, th,
                                             max_num_steps)
                t0 = start + th + tg
                t1 = t0 + tf * max_num_steps
                ls.append(eval_metrics.rollout_mse_per_sample_step(
                    pred, f[:, t0:t1]))
            per_sample = jnp.sum(jnp.mean(jnp.stack(ls), axis=0), axis=-1)
            return carry, per_sample
        _, out = jax.lax.scan(body, 0, idxs)
        return out.reshape(-1)

    return one_step_scan, rollout_scan


def validate_device(cfg: Config, model, params, model_state, pde,
                    n_levels_used, n_downsample, fields_dev, mesh=None):
    """Device-resident validation: identical statistics to :func:`validate`
    but the eval set lives in HBM and both the one-step sweep and the
    rollout sweep run as scanned device calls (per-batch dispatch through
    the tunneled backend costs ~300 ms in round trips alone).  The jitted
    scans are cached across epochs via :data:`_VALIDATOR_CACHE` — one
    compile per stage, not per epoch."""
    th, tf, tg = (cfg.data.time_history, cfg.data.time_future,
                  cfg.data.time_gap)
    g_model = is_g_model(cfg.model.name)
    has_mstate = bool(model_state)
    n_sc = pde.n_scalar_components
    n_traj = fields_dev.shape[0]
    bs = cfg.data.batch_size

    max_start = pde.trajlen - th - tf * cfg.data.max_num_steps - tg
    starts_r = tuple(range(0, max_start + 1, tf + tg))
    one_step_scan, rollout_scan = _device_validators(
        model, n_levels_used, n_downsample, th, tf, tg, g_model, has_mstate,
        cfg.model.multi_res_loss, n_sc, cfg.data.max_num_steps, starts_r)

    # ---- one-step sweep: same window stream as eval_timestep_windows +
    # batched_windows (start-major, trajectory-minor, global tail dropped)
    mst = pde_data.max_start_time(pde.trajlen, th, tf, tg)
    starts_1 = list(range(0, mst + 1, tf + tg))
    idx_stream = np.tile(np.arange(n_traj), len(starts_1))
    start_stream = np.repeat(np.asarray(starts_1), n_traj)
    n_b = idx_stream.size // bs

    result = {}
    if n_b:
        outs = one_step_scan(
            params, model_state, fields_dev,
            mesh_lib.shard_index_stream(jnp.asarray(
                idx_stream[:n_b * bs].reshape(n_b, bs), jnp.int32), mesh),
            mesh_lib.shard_index_stream(jnp.asarray(
                start_stream[:n_b * bs].reshape(n_b, bs), jnp.int32), mesh))
        result = {f"valid/loss/{k}": float(v) for k, v in outs.items()}

    # ---- rollout sweep: per-trajectory unrolled loss, whole batches per
    # scan step, all rollout starts unrolled inside the jit
    unrolled = []
    if starts_r:
        n_full = n_traj // bs
        if n_full:
            idxs = mesh_lib.shard_index_stream(
                jnp.asarray(np.arange(n_full * bs).reshape(n_full, bs),
                            jnp.int32), mesh)
            unrolled.extend(np.asarray(
                rollout_scan(params, model_state, fields_dev, idxs)))
        if n_traj % bs:
            tail = jnp.asarray(np.arange(n_full * bs, n_traj)[None, :],
                               jnp.int32)
            unrolled.extend(np.asarray(
                rollout_scan(params, model_state, fields_dev, tail)))
    if unrolled:
        mean, std = eval_metrics.bootstrap(np.asarray(unrolled))
        result["valid/unrolled_loss_mean"] = mean
        result["valid/unrolled_loss_std"] = std
    return result


def _host_rollout_fn(model, n_levels_used, g_model, multi_res_loss, th,
                     max_num_steps):
    """Cached jitted rollout for the host-streaming :func:`validate` path
    (same per-epoch recompile hazard as :func:`_device_validators`).
    Params enter the jit as arguments: closure constants bloat the compile
    payload past remote-compile limits for >100M-param models."""
    def build():
        def rollout_fn(p, ms, u, v):
            def model_fn(window):
                if g_model:
                    pred = model.apply({"params": p}, window,
                                       n_levels_used=n_levels_used)
                    return pred[-1] if multi_res_loss else pred
                return model.apply({"params": p, **ms}, window)
            return rollout_lib.rollout2d(model_fn, u, v, th, max_num_steps)
        return jax.jit(rollout_fn)

    return jit_cache.cached_build(
        _VALIDATOR_CACHE, (model,),
        ("host_rollout", n_levels_used, g_model, multi_res_loss, th,
         max_num_steps), build)


def validate(cfg: Config, model, params, model_state, pde, n_levels_used,
             n_downsample, eval_fn, opener=None):
    th, tf, tg = (cfg.data.time_history, cfg.data.time_future,
                  cfg.data.time_gap)
    if opener is None:
        opener = open_trajectories(cfg.data, "valid")
    # one-step
    one_step = {}
    count = 0
    for bx, by in pde_data.batched_windows(
            pde_data.eval_timestep_windows(opener, pde, th, tf, tg),
            cfg.data.batch_size):
        out = eval_fn(params, (jnp.asarray(bx), jnp.asarray(by)))
        for k, v in out.items():
            one_step[k] = one_step.get(k, 0.0) + float(v)
        count += 1
    result = {f"valid/loss/{k}": v / max(count, 1)
              for k, v in one_step.items()}

    # rollout
    g_model = is_g_model(cfg.model.name)
    _rollout_jit = _host_rollout_fn(model, n_levels_used, g_model,
                                    cfg.model.multi_res_loss, th,
                                    cfg.data.max_num_steps)
    rollout_jit = lambda u, v: _rollout_jit(params, model_state, u, v)

    unrolled = []
    max_start = (pde.trajlen - th - tf * cfg.data.max_num_steps - tg)

    def rollout_batch(u_list, v_list):
        """All rollout starts for a whole batch of trajectories; returns one
        per-trajectory unrolled loss each (sum over steps of the mean over
        starts — identical statistics to per-trajectory evaluation)."""
        u = jnp.asarray(np.stack(u_list))
        v = jnp.asarray(np.stack(v_list)) if v_list[0] is not None else None
        if n_downsample:
            u = wavelet.haar_downsample_traj(u, n_downsample)
            v = (wavelet.haar_downsample_traj(v, n_downsample)
                 if v is not None else None)
        losses_t = []
        for start in range(0, max_start + 1, tf + tg):
            init_u = u[:, start:start + th]
            init_v = v[:, start:start + th] if v is not None else None
            pred = rollout_jit(init_u, init_v)
            t0 = start + th + tg
            t1 = t0 + tf * cfg.data.max_num_steps
            target = (jnp.concatenate([u[:, t0:t1], v[:, t0:t1]], axis=-1)
                      if v is not None else u[:, t0:t1])
            losses_t.append(
                eval_metrics.rollout_mse_per_sample_step(pred, target))
        if not losses_t:
            return []
        per_sample = jnp.sum(jnp.mean(jnp.stack(losses_t), axis=0), axis=-1)
        return [float(x) for x in np.asarray(per_sample)]

    u_buf, v_buf = [], []
    for (u, v, cond) in pde_data.rollout_eval_trajectories(opener):
        u_buf.append(u)
        v_buf.append(v)
        if len(u_buf) == cfg.data.batch_size:
            unrolled.extend(rollout_batch(u_buf, v_buf))
            u_buf, v_buf = [], []
    if u_buf:
        unrolled.extend(rollout_batch(u_buf, v_buf))
    if unrolled:
        mean, std = eval_metrics.bootstrap(np.asarray(unrolled))
        result["valid/unrolled_loss_mean"] = mean
        result["valid/unrolled_loss_std"] = std
    return result


def main(argv=None):
    import sys
    cfg = parse_cli(Config, argv if argv is not None else sys.argv[1:])
    train(cfg)


if __name__ == "__main__":
    main()
