"""Device mesh and sharding — the TPU-native replacement for the reference's
parallelism (SURVEY.md §2e).

The reference has exactly two mechanisms, both data-parallel:
``torch.nn.DataParallel`` (``diff_cifar/main.py:235-238``) and Lightning DDP
with rank-sharded datapipes (``datapipes/shallowwater2d.py:68-87``).  Here both
become a ``jax.sharding.Mesh`` with a ``data`` axis: the batch is sharded, the
params are replicated, and XLA inserts the gradient all-reduce over ICI.  An
optional ``model`` axis additionally shards the widest conv/dense kernels over
their output-channel dimension (tensor parallelism) — beyond the reference's
capability, but natural on a mesh.

Multi-host: call :func:`initialize_distributed` first (maps to
``jax.distributed.initialize``); data loading keys off ``jax.process_index()``
exactly where the reference keys off ``dist.get_rank()``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass
class ParallelConfig:
    """The ``parallel.*`` config block shared by every task driver — the
    analog of the reference's Lightning ``trainer.devices`` / ``strategy`` /
    ``num_nodes`` flags (``configs/navierstokes2d.yaml:55,70-71``,
    ``scripts/train.py:29-46``).  All-1 axes (the default) keep the exact
    single-device code path; any axis > 1 builds a mesh and the task's
    batches/state are placed on it."""

    data: int = 1        # batch-axis sharding (DP; the reference's only mode)
    model: int = 1       # output-channel tensor parallelism (beyond ref)
    spatial: int = 1     # grid partitioning of the field H dim (beyond ref)
    # smallest output-channel dim sharded over 'model' (kernels narrower
    # than this replicate — sharding tiny convs costs more in collectives
    # than it saves); lower it for narrow test/dryrun models so tensor
    # parallelism actually exercises the conv kernels
    tp_min_channels: int = 128
    # multi-process (one process per host): jax.distributed.initialize args
    coordinator_address: str = ""
    num_processes: int = 1
    process_id: int = 0


def task_mesh(cfg: ParallelConfig) -> Optional[Mesh]:
    """Build the task's mesh from its ``parallel`` config block.

    Returns ``None`` when every axis is 1 so drivers keep their unsharded
    fast path.  With ``num_processes`` > 1 the distributed runtime is
    initialized first (each host then contributes its local devices)."""
    n = cfg.data * cfg.model * cfg.spatial
    if n <= 1:
        return None
    if cfg.num_processes > 1:
        initialize_distributed(cfg.coordinator_address or None,
                               cfg.num_processes, cfg.process_id)
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(
            f"parallel config asks for {n} devices "
            f"(data={cfg.data} x model={cfg.model} x spatial={cfg.spatial}) "
            f"but only {len(devices)} are visible")
    return make_mesh(data=cfg.data, model=cfg.model, spatial=cfg.spatial,
                     devices=devices[:n])


def place_state(state: Any, mesh: Optional[Mesh],
                min_channels: int = 128) -> Any:
    """Place a TrainState (or any pytree) on the mesh: large kernels (and
    their optimizer moments, which share shapes) sharded over 'model',
    everything else replicated.  With model=1 this is plain replication; with
    mesh=None it is the identity."""
    if mesh is None:
        return state
    return tensor_parallel_params(state, mesh, min_channels=min_channels)


def shard_index_stream(arr: jnp.ndarray, mesh: Optional[Mesh]) -> jnp.ndarray:
    """Place a (n_steps, batch) int stream for a scanned epoch/chunk call:
    the scan axis stays whole, the batch axis is sharded over 'data' so each
    scanned step gathers only its shard's windows."""
    if mesh is None:
        return arr
    return jax.device_put(
        arr, NamedSharding(mesh, P(None, "data", *([None] *
                                                   (arr.ndim - 2)))))


def place_dataset(x: jnp.ndarray, mesh: Optional[Mesh],
                  h_axis: Optional[int] = None) -> jnp.ndarray:
    """Place an HBM-staged dataset: replicated over 'data'/'model' (steps
    gather arbitrary rows from it), with the spatial H dim sharded over
    'spatial' when that axis exists — gathers over the leading axis keep the
    H sharding, so activations are born grid-partitioned."""
    if mesh is None:
        return x
    spec = [None] * x.ndim
    n_sp = mesh.shape.get("spatial", 1)
    if n_sp > 1 and h_axis is not None:
        ha = x.ndim + h_axis if h_axis < 0 else h_axis
        assert x.shape[ha] % n_sp == 0, (
            f"dataset spatial dim {x.shape[ha]} must divide the 'spatial' "
            f"mesh axis ({n_sp})")
        spec[ha] = "spatial"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def check_batch_divisible(mesh: Optional[Mesh], batch_size: int,
                          what: str = "batch_size") -> None:
    if mesh is not None and batch_size % mesh.shape["data"] != 0:
        raise ValueError(
            f"{what}={batch_size} must be divisible by the 'data' mesh axis "
            f"({mesh.shape['data']}) so every device gets equal batch shards")


# Minimum image/field rows per 'spatial' shard.  Grid partitioning must keep
# the DEEPEST U-Net feature map at >= 2 rows per shard: with a 16x-downsample
# encoder, 32 input rows/shard <=> 2 bottleneck rows/shard.  Below that the
# XLA SPMD partitioner hits a measured mis-partitioning edge case on a
# 2-D (data x spatial) mesh: it replicates the degenerate level across the
# 'data' axis but still psums its parameter grads over 'data', yielding
# gradients scaled by exactly the data-axis size (forward values stay
# correct; verified 2x at data=2 and 4x at data=4 on the 8-device CPU mesh,
# while per-shard >= 2 bottleneck rows matches replicated grads to ~3e-6).
MIN_ROWS_PER_SPATIAL_SHARD = 32


def make_spatial_guard(mesh: Mesh, batch_axis: int = 0, h_axis: int = 1,
                       min_rows_per_shard: int = 4):
    """Per-level sharding-constraint hook that lifts the
    :data:`MIN_ROWS_PER_SPATIAL_SHARD` floor for models that apply it.

    The measured GSPMD mis-reduction (docs/tpu_notes.md, minimal repro in
    ``tests/test_parallel.py::test_gspmd_degenerate_spatial_grad_misreduction``)
    happens when a U-Net level whose feature map has < ``min_rows_per_shard``
    rows per 'spatial' shard carries spatial ops (conv / pooled skip reuse):
    the partitioner replicates the level across 'data' but still psums its
    parameter grads over 'data', scaling them by exactly the data-axis size.

    The fix is to make the degenerate level's sharding explicit: replicate
    it over 'spatial' (keeping the 'data' batch sharding) *before* its ops
    run, and re-assert 'spatial' sharding once the extent is safe again on
    the way up.  Replicating tiny bottleneck maps is also the right perf
    call: their halo exchanges cost more than their FLOPs.

    ``min_rows_per_shard=4`` is measured, not theoretical: replicating only
    the < 2 rows/shard levels still mis-reduces (the sharded->replicated
    transition itself must sit at a level with >= 4 rows/shard; verified
    exact-grad-match at 4 on Unetbase/Unetbase_G topologies, still-broken
    at 2 — see test_parallel.py).  A level at 2 rows/shard is only safe
    when nothing below it degenerates (the old 64px-input case behind
    MIN_ROWS_PER_SPATIAL_SHARD).

    Returns ``guard(h) -> h`` for NHWC feature maps, or ``None`` when the
    mesh has no 'spatial' axis (so callers can pass it straight to the
    model's ``spatial_guard`` field).
    """
    n_sp = mesh.shape.get("spatial", 1)
    if n_sp <= 1:
        return None
    has_data = "data" in mesh.shape

    def guard(h):
        spec = [None] * h.ndim
        # batch-1 paths (sample plots, single-item validators) cannot carry
        # the 'data' sharding — leave any non-divisible axis unsharded
        if has_data and h.shape[batch_axis] % mesh.shape["data"] == 0:
            spec[batch_axis] = "data"
        rows = h.shape[h_axis]
        if rows % n_sp == 0 and rows // n_sp >= min_rows_per_shard:
            spec[h_axis] = "spatial"
        return jax.lax.with_sharding_constraint(
            h, NamedSharding(mesh, P(*spec)))

    return guard


def check_spatial_resolution(mesh: Optional[Mesh], resolution: int,
                             what: str = "resolution",
                             guarded: bool = False) -> None:
    """Refuse spatial shardings that drop below the safe per-shard extent
    (see :data:`MIN_ROWS_PER_SPATIAL_SHARD`).  ``resolution`` should be the
    smallest field height the run will train at (staged/sequ drivers pass
    their most-downsampled stage resolution).  With ``guarded=True`` (the
    model applies a :func:`make_spatial_guard` hook at every level
    transition) the floor is lifted: degenerate levels are explicitly
    replicated instead of mis-partitioned, so any input that divides the
    'spatial' axis is safe."""
    if mesh is None:
        return
    n_sp = mesh.shape.get("spatial", 1)
    if guarded:
        return
    if n_sp > 1 and resolution // n_sp < MIN_ROWS_PER_SPATIAL_SHARD:
        raise ValueError(
            f"parallel.spatial={n_sp} leaves {resolution // n_sp} rows per "
            f"shard at {what}={resolution}; grid partitioning needs >= "
            f"{MIN_ROWS_PER_SPATIAL_SHARD} rows/shard so a 16x-downsample "
            f"U-Net keeps >= 2 bottleneck rows per shard (below that the "
            f"XLA partitioner mis-reduces parameter grads on a "
            f"data x spatial mesh — see parallel/mesh.py). Lower "
            f"parallel.spatial or raise the resolution.")


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-process init (no-op for single-process runs)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def make_mesh(data: Optional[int] = None, model: int = 1, spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model[, spatial]) mesh.

    ``data`` defaults to all devices / (model * spatial).  ``spatial`` > 1
    adds a third axis for grid partitioning (:func:`spatial_shard_batch`);
    with the default ``spatial=1`` the mesh stays two-axis so existing
    (data, model) callers are unaffected.
    """
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // (model * spatial)
    assert data * model * spatial == len(devices), (data, model, spatial,
                                                    len(devices))
    if spatial == 1:
        return Mesh(np.asarray(devices).reshape(data, model),
                    ("data", "model"))
    return Mesh(np.asarray(devices).reshape(data, model, spatial),
                ("data", "model", "spatial"))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of host arrays with the batch axis over 'data'.

    A tail batch whose leading dim doesn't divide the 'data' axis is
    replicated instead (correct, just not parallel) so drivers with
    ``drop_last=False`` loaders keep working."""
    def put(x):
        if x.shape[0] % mesh.shape["data"] == 0:
            spec = P("data", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def spatial_shard_batch(batch: Any, mesh: Mesh, h_axis: int = -3) -> Any:
    """Shard batch over 'data' AND the spatial height dim over 'spatial'.

    Grid partitioning for PDE-scale inputs — the structured-grid analog of
    sequence parallelism: each device holds a horizontal slab of the field
    and XLA GSPMD inserts the conv halo exchanges (and the norm/pool
    all-reduces) over ICI automatically.  ``h_axis=-3`` matches both NHWC
    images and (B, T, H, W, C) trajectories.  Requires a mesh built with
    ``make_mesh(spatial=...)``; the H extent must divide by the axis size
    (slabs must be equal for XLA's halo-exchange partitioning).
    """
    n_sp = mesh.shape.get("spatial", 1)

    def put(x):
        ha = x.ndim + h_axis if h_axis < 0 else h_axis
        spec = [None] * x.ndim
        if x.shape[0] % mesh.shape["data"] == 0:
            spec[0] = "data"   # non-divisible tail batches replicate
        if n_sp > 1 and 0 < ha < x.ndim:
            assert x.shape[ha] % n_sp == 0, (
                f"spatial dim {x.shape[ha]} must divide the 'spatial' mesh "
                f"axis ({n_sp})")
            spec[ha] = "spatial"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def _kernel_spec(path_leaf_shape: Tuple[int, ...], min_channels: int
                 ) -> P:
    """Tensor-parallel spec: shard the trailing (output-channel) dim of
    large kernels; replicate everything else."""
    if len(path_leaf_shape) >= 2 and path_leaf_shape[-1] >= min_channels:
        return P(*([None] * (len(path_leaf_shape) - 1)), "model")
    return P()


def tensor_parallel_params(params: Any, mesh: Mesh,
                           min_channels: int = 128) -> Any:
    """Shard conv/dense kernels' output channels over the 'model' axis.

    XLA GSPMD propagates the sharding through the network and inserts the
    needed collectives; activations stay replicated on 'model' unless
    constrained otherwise.  With model=1 this is plain replication.
    """
    def put(x):
        if mesh.shape.get("model", 1) > 1 and hasattr(x, "shape"):
            spec = _kernel_spec(x.shape, min_channels)
            # channel dim must divide evenly or we replicate
            if spec != P() and x.shape[-1] % mesh.shape["model"] != 0:
                spec = P()
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, params)


def data_parallel_step(step_fn, mesh: Mesh):
    """Wrap a jitted (state, batch, ...) step for data-parallel execution:
    the batch is placed with its leading axis sharded over 'data' before the
    call; params/state stay replicated (place them once with
    :func:`replicate`).  XLA inserts the gradient all-reduce because the loss
    reduces over the sharded batch axis."""

    def wrapped(state, batch, *args):
        batch = shard_batch(batch, mesh)
        return step_fn(state, batch, *args)

    return wrapped
