"""Task -> datapipe registry (``pdearena/data/registry.py:35-89`` analog).

Maps a PDE task name to its opener class, default PDEDataConfig, and window
samplers; the datamodule role (dual one-step + rollout eval loaders,
``pdearena/data/datamodule.py:43-182``) is covered by
``make_dataloaders``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterator, Optional

from unet_design_tpu.data import loader as loader_lib
from unet_design_tpu.data import pde as pde_data


DATAPIPE_REGISTRY: Dict[str, Dict[str, Any]] = {
    "NavierStokes2D": dict(
        opener=pde_data.NavierStokesOpener,
        pde=pde_data.PDEDataConfig(n_scalar_components=1,
                                   n_vector_components=1, trajlen=14,
                                   n_spatial_dims=2),
    ),
    "ShallowWater2D": dict(
        opener=pde_data.ShallowWaterOpener,
        pde=pde_data.PDEDataConfig(n_scalar_components=1,
                                   n_vector_components=1, trajlen=88,
                                   n_spatial_dims=2),
    ),
}


@dataclasses.dataclass
class DataLoaders:
    """Train + dual-eval loaders (one-step and rollout), mirroring the
    Lightning datamodule's val/test dataloader pair."""

    train: Callable[[], Iterator]
    valid_onestep: Callable[[], Iterator]
    valid_rollout: Callable[[], Iterator]
    test_onestep: Callable[[], Iterator]
    test_rollout: Callable[[], Iterator]
    pde: pde_data.PDEDataConfig


def make_dataloaders(task: str, data_path: str, batch_size: int,
                     time_history: int, time_future: int, time_gap: int,
                     limit_trajectories: Optional[int] = None,
                     seed: int = 0) -> DataLoaders:
    spec = DATAPIPE_REGISTRY[task]
    opener_cls = spec["opener"]
    pde = spec["pde"]

    def opener(mode):
        files = opener_cls.list_files(data_path, mode)
        files = loader_lib.shard_for_process(files)
        return opener_cls(files, mode, limit_trajectories)

    def train():
        return pde_data.batched_windows(
            pde_data.randomized_train_windows(
                opener("train"), pde, time_history, time_future, time_gap,
                seed=seed), batch_size)

    def onestep(mode):
        def fn():
            return pde_data.batched_windows(
                pde_data.eval_timestep_windows(
                    opener(mode), pde, time_history, time_future, time_gap),
                batch_size)
        return fn

    def rollout(mode):
        def fn():
            return pde_data.rollout_eval_trajectories(opener(mode))
        return fn

    return DataLoaders(train=train, valid_onestep=onestep("valid"),
                       valid_rollout=rollout("valid"),
                       test_onestep=onestep("test"),
                       test_rollout=rollout("test"), pde=pde)
