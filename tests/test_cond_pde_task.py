"""Smoke test of the conditioned PDE task + time-conditioned datapipes."""
import numpy as np
import pytest

from unet_design_tpu.data import pde as pde_data
from unet_design_tpu.tasks import cond_pde


def test_time_conditioned_windows():
    cfg = pde_data.PDEDataConfig(1, 1, trajlen=10)
    trajs = pde_data.synthetic_trajectories(2, cfg, res=8, seed=0)
    out = list(pde_data.random_time_conditioned_windows(trajs, cfg, cycles=2))
    assert len(out) == 4
    x, y, dt, cond = out[0]
    assert x.shape == (1, 1, 8, 8, 3) and y.shape == (1, 1, 8, 8, 3)
    assert 1 <= dt < 10

    ev = list(pde_data.timestep_conditioned_eval_windows(trajs, cfg, 3))
    assert all(e[2] == 3 for e in ev)
    assert len(ev) > 0
    with pytest.raises(ValueError):
        list(pde_data.timestep_conditioned_eval_windows(trajs, cfg, 5))


@pytest.mark.slow
def test_cond_pde_end_to_end(tmp_path):
    cfg = cond_pde.Config()
    cfg.data.task = "synthetic"
    cfg.data.resolution = 32
    cfg.data.trajlen = 10
    cfg.data.n_synthetic = 2
    cfg.data.batch_size = 2
    cfg.model.hidden_channels = 8
    cfg.model.param_conditioning = "scalar"
    cfg.train.epochs = 1
    cfg.train.eval_delta_t = 3
    cfg.train.max_num_steps = 2
    cfg.train.logdir = str(tmp_path / "cond")
    state = cond_pde.train(cfg)
    assert state is not None
