"""Determinism across runs (seeded) and FULL-FIDELITY checkpoint resume.

The resume contract (reference: ``diff_cifar/main.py:120-161,532-539``
restores model + EMA + optimizer + scheduler): an interrupted-and-resumed run
must produce *bit-identical* parameters to an uninterrupted run — optimizer
moments, warmup position, per-step PRNG, data order and flip randomness all
continue exactly.
"""
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


def _leaves(tree):
    import jax
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def _assert_trees_equal(a, b):
    la, lb = _leaves(a), _leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(x, y)


def test_two_runs_identical(tmp_path):
    s1 = diff_cifar.train(tiny_cfg(tmp_path, "a"))
    s2 = diff_cifar.train(tiny_cfg(tmp_path, "b"))
    _assert_trees_equal(s1.params, s2.params)


@pytest.mark.parametrize("stop_at", [2, 4])
def test_resume_equals_uninterrupted(tmp_path, stop_at):
    """Interrupt at step 2 (mid-stage-1) or 4 (mid-stage-2, after the
    optimizer re-init at the stage boundary), resume, and require the final
    params, EMA and optimizer state to equal the uninterrupted run's,
    parameter for parameter."""
    full = diff_cifar.train(tiny_cfg(tmp_path, "full"))

    cfg = tiny_cfg(tmp_path, "interrupted")
    cfg.train.stop_after_steps = stop_at
    diff_cifar.train(cfg)

    cfg2 = tiny_cfg(tmp_path, "interrupted")
    cfg2.train.resume = True
    resumed = diff_cifar.train(cfg2)

    _assert_trees_equal(full.params, resumed.params)
    _assert_trees_equal(full.ema_params, resumed.ema_params)
    _assert_trees_equal(full.opt_state, resumed.opt_state)
    np.testing.assert_array_equal(np.asarray(full.rng),
                                  np.asarray(resumed.rng))


def test_resume_from_stage_boundary(tmp_path):
    """Checkpoint exactly at the stage-1/stage-2 boundary (step 3): the
    resumed run must re-init the stage-2 optimizer fresh, like the
    uninterrupted run does (main.py:374-377)."""
    full = diff_cifar.train(tiny_cfg(tmp_path, "fullb"))

    cfg = tiny_cfg(tmp_path, "boundary")
    cfg.train.stop_after_steps = 3
    diff_cifar.train(cfg)

    cfg2 = tiny_cfg(tmp_path, "boundary")
    cfg2.train.resume = True
    resumed = diff_cifar.train(cfg2)
    _assert_trees_equal(full.params, resumed.params)
    _assert_trees_equal(full.ema_params, resumed.ema_params)


def _tiny_pde_cfg(tmp_path, name):
    from unet_design_tpu.tasks import pde
    cfg = pde.Config()
    cfg.data.task = "synthetic"
    cfg.data.resolution = 16
    cfg.data.trajlen = 6
    cfg.data.n_synthetic = 2
    cfg.data.batch_size = 2
    cfg.data.max_num_steps = 2
    cfg.data.train_cycles = 1
    cfg.model.hidden_channels = 8
    cfg.model.dwt_encoder = True
    cfg.train.num_epochs_list = [2, 2]
    cfg.train.freeze_lower_res = True
    cfg.train.warmup_epochs = 1
    cfg.train.optimizer = "adamw"
    cfg.train.weight_decay = 1e-5
    cfg.train.logdir = str(tmp_path / name)
    return cfg


@pytest.mark.parametrize("stop_at", [1, 2, 3])
def test_pde_resume_equals_uninterrupted(tmp_path, stop_at):
    """PDE task: interrupt mid-stage (1, 3) or at the stage boundary (2);
    the resumed run must reach bit-identical final params (optimizer
    moments, warmup-cosine position and PRNG all restored)."""
    from unet_design_tpu.tasks import pde
    full = pde.train(_tiny_pde_cfg(tmp_path, "pde_full"))

    cfg = _tiny_pde_cfg(tmp_path, "pde_int")
    cfg.train.stop_after_epochs = stop_at
    pde.train(cfg)

    cfg2 = _tiny_pde_cfg(tmp_path, "pde_int")
    cfg2.train.resume = True
    resumed = pde.train(cfg2)
    _assert_trees_equal(full.params, resumed.params)
    _assert_trees_equal(full.opt_state, resumed.opt_state)


def _tiny_wmh_cfg(tmp_path, name):
    from unet_design_tpu.tasks import wmh
    cfg = wmh.Config()
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 12
    cfg.data.resolution = 48
    cfg.data.batch_size = 4
    cfg.data.augmentation = "manual2"
    cfg.model.hidden_channels = 4
    cfg.model.dwt_encoder = True
    cfg.train.num_epochs_list = [2, 2]
    cfg.train.freeze_lower_res = True
    cfg.train.logdir = str(tmp_path / name)
    return cfg


@pytest.mark.parametrize("stop_at", [1, 2, 3])
def test_wmh_resume_equals_uninterrupted(tmp_path, stop_at):
    """WMH task: interrupt mid-stage (1, 3) or at the stage boundary (2);
    the resumed run's best params and threshold sweep must bit-match the
    uninterrupted run (augmentation/shuffle randomness is epoch-keyed)."""
    from unet_design_tpu.tasks import wmh
    full_params, full_sweep = wmh.train(_tiny_wmh_cfg(tmp_path, "wmh_full"))

    cfg = _tiny_wmh_cfg(tmp_path, "wmh_int")
    cfg.train.stop_after_epochs = stop_at
    wmh.train(cfg)

    cfg2 = _tiny_wmh_cfg(tmp_path, "wmh_int")
    cfg2.train.resume = True
    res_params, res_sweep = wmh.train(cfg2)
    _assert_trees_equal(full_params, res_params)
    for th in full_sweep:
        assert full_sweep[th]["dsc"] == res_sweep[th]["dsc"]


def _tiny_mnist_cfg(tmp_path, name):
    from unet_design_tpu.tasks import diff_mnist
    cfg = diff_mnist.Config()
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_size = 16
    cfg.data.resolution = 16
    cfg.data.batch_size = 4
    cfg.model.num_channels = 32
    cfg.model.num_res_blocks = 1
    cfg.model.channel_mult = [1, 1]
    cfg.diffusion.N = 8
    cfg.diffusion.beta_max = 5.0
    cfg.train.num_iterations_list = [3, 3]
    cfg.train.freeze_lower_res = True
    cfg.train.logdir = str(tmp_path / name)
    return cfg


@pytest.mark.parametrize("stop_at", [2, 4])
def test_mnist_resume_equals_uninterrupted(tmp_path, stop_at):
    """diff_mnist task: mid-stage interruption in either stage resumes to
    bit-identical final params."""
    from unet_design_tpu.tasks import diff_mnist
    full = diff_mnist.train(_tiny_mnist_cfg(tmp_path, "mn_full"))

    cfg = _tiny_mnist_cfg(tmp_path, "mn_int")
    cfg.train.stop_after_steps = stop_at
    diff_mnist.train(cfg)

    cfg2 = _tiny_mnist_cfg(tmp_path, "mn_int")
    cfg2.train.resume = True
    resumed = diff_mnist.train(cfg2)
    _assert_trees_equal(full.params, resumed.params)
    _assert_trees_equal(full.opt_state, resumed.opt_state)


def test_periodic_save_resume(tmp_path):
    """The periodic save_step checkpoints carry the full state too: kill the
    run with no explicit stop (simulated by a fresh process picking up the
    save_step=4 checkpoint) and continue to the same end state."""
    full = diff_cifar.train(tiny_cfg(tmp_path, "fullp"))

    cfg = tiny_cfg(tmp_path, "periodic")
    cfg.train.save_step = 4
    cfg.train.stop_after_steps = 4
    diff_cifar.train(cfg)

    cfg2 = tiny_cfg(tmp_path, "periodic")
    cfg2.train.resume = True
    resumed = diff_cifar.train(cfg2)
    _assert_trees_equal(full.params, resumed.params)


def test_mnist_train_id_restore_ignores_cli(tmp_path):
    """TRAIN_ID analog (``diff_mnist/main.py:50-95``): a new run restoring
    another run by id continues from its checkpoint under the STORED config
    ("any passed command line arguments are ignored") and reaches the same
    final params as the uninterrupted run."""
    from unet_design_tpu.tasks import diff_mnist
    full = diff_mnist.train(_tiny_mnist_cfg(tmp_path, "mn_full2"))

    cfg = _tiny_mnist_cfg(tmp_path, "mn_src")
    cfg.train.stop_after_steps = 2
    diff_mnist.train(cfg)

    cfg2 = _tiny_mnist_cfg(tmp_path, "mn_cont")
    cfg2.model.num_channels = 64          # must be ignored on restore
    cfg2.train.num_iterations_list = [1]  # must be ignored on restore
    cfg2.train.train_id = str(tmp_path / "mn_src")
    resumed = diff_mnist.train(cfg2)
    _assert_trees_equal(full.params, resumed.params)
    _assert_trees_equal(full.opt_state, resumed.opt_state)
    # the continuation checkpoints land in the NEW run's store
    assert (tmp_path / "mn_cont" / "ckpt").exists()


def test_mnist_test_id_samples_without_training(tmp_path):
    """TEST_ID analog: restore a finished run by id and produce one sample
    grid per trained resolution, no training."""
    from unet_design_tpu.tasks import diff_mnist
    diff_mnist.train(_tiny_mnist_cfg(tmp_path, "mn_done"))

    cfg = diff_mnist.Config()
    cfg.train.test_id = str(tmp_path / "mn_done")
    cfg.train.n_samples = 4
    cfg.train.logdir = str(tmp_path / "mn_eval")
    out = diff_mnist.test_eval(cfg)
    # two-stage schedule on 16px with channel_mult [1,1]: final stage uses
    # both levels -> grids at 8 and 16
    assert sorted(out.keys()) == [8, 16]
    for r, imgs in out.items():
        assert imgs.shape[1] == r and np.isfinite(imgs).all()


def test_cifar_train_id_restore_ignores_cli(tmp_path):
    """diff_cifar TRAIN_ID analog (``diff_cifar/main.py:115-161``):
    cross-run restore-by-id continues under the stored config and
    bit-matches the uninterrupted run."""
    full = diff_cifar.train(tiny_cfg(tmp_path, "cf_full2"))

    cfg = tiny_cfg(tmp_path, "cf_src")
    cfg.train.stop_after_steps = 2
    diff_cifar.train(cfg)

    cfg2 = tiny_cfg(tmp_path, "cf_cont")
    cfg2.model.ch = 64                    # must be ignored on restore
    cfg2.train.train_id = str(tmp_path / "cf_src")
    resumed = diff_cifar.train(cfg2)
    _assert_trees_equal(full.params, resumed.params)
    _assert_trees_equal(full.ema_params, resumed.ema_params)
    _assert_trees_equal(full.opt_state, resumed.opt_state)


def test_cifar_test_id_evaluates_without_training(tmp_path):
    """diff_cifar TEST_ID analog: restore by id and compute the sampling
    eval (IS over a few images) on the EMA params, no training."""
    diff_cifar.train(tiny_cfg(tmp_path, "cf_done"))

    cfg = diff_cifar.Config()
    cfg.train.test_id = str(tmp_path / "cf_done")
    cfg.train.num_eval_images = 8
    cfg.diffusion.sampler = "ddim"
    cfg.diffusion.sample_steps = 2
    cfg.train.logdir = str(tmp_path / "cf_eval")
    scores = diff_cifar.test_eval(cfg)
    assert "IS" in scores and np.isfinite(scores["IS"])
    assert (tmp_path / "cf_eval" / "eval_scores.json").exists()


def test_train_id_empty_source_fails_loudly(tmp_path):
    """train_id pointing at a run with no checkpoint must raise, not
    silently train from scratch under the stored config."""
    from unet_design_tpu.utils import config as config_lib
    src = tmp_path / "empty_src"
    src.mkdir()
    config_lib.save_yaml(tiny_cfg(tmp_path, "empty_src"), str(src / "config.yaml"))
    cfg = tiny_cfg(tmp_path, "cont")
    cfg.train.train_id = str(src)
    with pytest.raises(FileNotFoundError):
        diff_cifar.train(cfg)
