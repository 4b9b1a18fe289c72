"""Tests for 2D toy datasets and the datapipe registry."""
import numpy as np
import pytest

from unet_design_tpu.data import toy2d
from unet_design_tpu.data.registry import DATAPIPE_REGISTRY, make_dataloaders


@pytest.mark.parametrize("name", ["mixture", "scurve", "swiss", "moon",
                                  "circle", "checker", "pinwheel",
                                  "8gaussians"])
def test_toy2d_shapes(name):
    x = toy2d.two_dim(200, name, seed=0)
    assert x.shape[1] == 2 and x.shape[0] >= 195
    assert np.isfinite(x).all()


def test_toy2d_mixture_modes():
    x = toy2d.two_dim(1000, "mixture")
    assert (x[:, 0] < -3).sum() > 300 and (x[:, 0] > 3).sum() > 300


def test_datapipe_registry_entries():
    assert "NavierStokes2D" in DATAPIPE_REGISTRY
    assert "ShallowWater2D" in DATAPIPE_REGISTRY


def test_make_dataloaders_with_generated_h5(tmp_path):
    h5py = pytest.importorskip("h5py")
    import numpy as np
    # write a tiny fake NS h5 in the expected schema
    rng = np.random.default_rng(0)
    for mode in ("train", "valid"):
        with h5py.File(tmp_path / f"ns2d_{mode}_42.h5", "w") as f:
            g = f.create_group(mode)
            g.create_dataset("u", data=rng.standard_normal((2, 14, 16, 16)))
            g.create_dataset("vx", data=rng.standard_normal((2, 14, 16, 16)))
            g.create_dataset("vy", data=rng.standard_normal((2, 14, 16, 16)))

    loaders = make_dataloaders("NavierStokes2D", str(tmp_path), batch_size=2,
                               time_history=4, time_future=1, time_gap=0)
    batch = next(iter(loaders.train()))
    x, y = batch
    assert x.shape == (2, 4, 16, 16, 3)
    assert y.shape == (2, 1, 16, 16, 3)
    # rollout loader yields full trajectories
    u, v, cond = next(iter(loaders.valid_rollout()))
    assert u.shape == (14, 16, 16, 1) and v.shape == (14, 16, 16, 2)
