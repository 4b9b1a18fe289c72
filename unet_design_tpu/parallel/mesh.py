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

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
    """Device-put a pytree of host arrays with the batch axis over 'data'."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
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
        spec[0] = "data"
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
