"""Sharded FID-generation path over the virtual CPU mesh."""
import numpy as np

from unet_design_tpu.parallel import mesh as mesh_lib
from unet_design_tpu.tasks import diff_cifar
from unet_design_tpu.process.diffusion import DDPMSchedule

import jax


def test_evaluate_sharded_sampling(tmp_path):
    cfg = diff_cifar.Config()
    cfg.model.ch = 32
    cfg.model.ch_mult = [1, 1]
    cfg.model.attn = []
    cfg.model.num_res_blocks = 1
    cfg.model.dropout = 0.0
    cfg.diffusion.T = 3
    cfg.train.fid_weights = None
    cfg.train.fid_stats_cache = None
    model = diff_cifar.build_model(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jax.numpy.zeros((1, 8, 8, 3)),
                        jax.numpy.zeros((1,), jax.numpy.int32))["params"]
    sch = DDPMSchedule.create(T=3)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    out = diff_cifar.evaluate(cfg, model, params, sch, rng,
                              n_levels_used=2, resolution=8,
                              num_images=16, batch_size=8, mesh=mesh)
    assert "IS" in out
