"""Determinism across runs (seeded) and checkpoint resume."""
import numpy as np
import pytest

from unet_design_tpu.tasks import diff_cifar


def tiny_cfg(tmp_path, name):
    cfg = diff_cifar.Config()
    cfg.data.synthetic_size = 16
    cfg.data.batch_size = 4
    cfg.model.ch = 32
    cfg.model.ch_mult = [1, 1]
    cfg.model.attn = []
    cfg.model.num_res_blocks = 1
    cfg.model.dropout = 0.0
    cfg.diffusion.T = 4
    cfg.train.num_iterations_list = [3, 3]
    cfg.train.warmup = 2
    cfg.train.save_step = 0
    cfg.train.logdir = str(tmp_path / name)
    return cfg


def _leaves(params):
    import jax
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]


def test_two_runs_identical(tmp_path):
    s1 = diff_cifar.train(tiny_cfg(tmp_path, "a"))
    s2 = diff_cifar.train(tiny_cfg(tmp_path, "b"))
    for a, b in zip(_leaves(s1.params), _leaves(s2.params)):
        np.testing.assert_array_equal(a, b)


def test_resume_skips_completed_steps(tmp_path):
    cfg = tiny_cfg(tmp_path, "c")
    cfg.train.save_step = 4
    s1 = diff_cifar.train(cfg)
    # resume: all 6 steps < latest ckpt? ckpt at step 4 -> resume does 2 more
    cfg2 = tiny_cfg(tmp_path, "c")
    cfg2.train.save_step = 4
    cfg2.train.resume = True
    s2 = diff_cifar.train(cfg2)
    assert s2 is not None
