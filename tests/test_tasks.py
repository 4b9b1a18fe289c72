"""End-to-end smoke tests: each task trains a tiny config on synthetic data,
mirroring the reference's LightningModule integration tests on random tensors
(pdearena/tests/test_pdemodel.py)."""
import os

import numpy as np
import jax
import pytest

from unet_design_tpu.tasks import diff_cifar, diff_mnist, pde, wmh
from unet_design_tpu.utils import config as config_lib


def test_config_system_roundtrip(tmp_path):
    cfg = diff_mnist.Config()
    cfg2 = config_lib.apply_overrides(cfg, ["train.lr=0.01",
                                            "model.dwt_encoder=true",
                                            "data.resolution=16"])
    assert cfg2.train.lr == 0.01 and cfg2.model.dwt_encoder is True
    assert cfg.train.lr == 1e-3  # original untouched
    yaml_path = tmp_path / "c.yaml"
    yaml_path.write_text("train:\n  lr: 0.5\nmodel:\n  num_channels: 8\n")
    cfg3 = config_lib.from_yaml(diff_mnist.Config, str(yaml_path))
    assert cfg3.train.lr == 0.5 and cfg3.model.num_channels == 8
    with pytest.raises(KeyError):
        config_lib.apply_overrides(cfg, ["train.nonexistent=1"])


def test_diff_mnist_staged_end_to_end(tmp_path):
    cfg = diff_mnist.Config()
    cfg.data.resolution = 8
    cfg.data.batch_size = 8
    cfg.data.synthetic_size = 32
    cfg.model.num_channels = 32
    cfg.model.channel_mult = [1, 1, 1]  # uniform: required for truncation
    cfg.model.num_res_blocks = 1
    cfg.model.dwt_encoder = True
    cfg.model.multi_res_loss = True
    cfg.diffusion.N = 4
    cfg.diffusion.beta_max = 2.0  # must be < N (reference constraint)
    cfg.diffusion.staged_partitioned_time_intervals = True
    cfg.train.num_iterations_list = [2, 2]  # 2 stages over 3 levels
    cfg.train.freeze_lower_res = True
    cfg.train.samples_every_iters = 3   # fires at iters 0 and 3
    cfg.train.n_samples = 4
    cfg.train.do_superres = True        # end-of-train 4 -> 8 superres
    cfg.train.logdir = str(tmp_path / "mnist")
    state = diff_mnist.train(cfg)
    assert int(state.step) == 2
    figures = os.listdir(tmp_path / "mnist" / "figures")
    assert any(f.startswith("samples_res_") for f in figures), figures
    assert any(f.startswith("superres") for f in figures), figures

    # sampling at the final stage + superres from 2 -> 8
    model = diff_mnist.build_model(cfg, 1)
    from unet_design_tpu.process.diffusion import VPDiffusion
    vp = VPDiffusion.create(N=4, beta_max=2.0, multi_res_loss=True)
    rng = jax.random.PRNGKey(0)
    imgs = diff_mnist.sample(cfg, model, state.params, vp, rng,
                             n_levels_used=3, resolution=8, in_channels=1,
                             n_samples=4)
    assert imgs.shape == (4, 8, 8, 1)
    up = diff_mnist.superres_sample(cfg, model, state.params, vp, rng,
                                    source_res=2, target_res=8,
                                    n_levels_used=1, in_channels=1,
                                    n_noise=2)
    assert up.shape == (2, 8, 8, 1)


def test_diff_cifar_staged_end_to_end(tmp_path):
    cfg = diff_cifar.Config()
    cfg.data.synthetic_size = 32
    cfg.data.batch_size = 8
    cfg.model.ch = 32
    cfg.model.ch_mult = [1, 2]
    cfg.model.attn = [1]
    cfg.model.num_res_blocks = 1
    cfg.model.dropout = 0.0
    cfg.model.dwt_encoder = True
    cfg.model.multi_res_loss = True
    cfg.diffusion.T = 4
    cfg.train.num_iterations_list = [2, 2]
    cfg.train.freeze_lower_res = True
    cfg.train.warmup = 2
    cfg.train.sample_step = 3      # fires at iters 0 and 3
    cfg.train.sample_size = 4
    cfg.train.logdir = str(tmp_path / "cifar")
    state = diff_cifar.train(cfg)
    assert int(state.step) == 2
    figures = os.listdir(tmp_path / "cifar" / "figures")
    assert any(f.startswith("samples_res_") for f in figures), figures
    # EMA exists and sampler runs
    model = diff_cifar.build_model(cfg)
    from unet_design_tpu.process.diffusion import DDPMSchedule
    sch = DDPMSchedule.create(T=4)
    sampler = diff_cifar.make_sampler(cfg, model, sch, 2)
    rng = jax.random.PRNGKey(0)
    x_T = jax.random.normal(rng, (2, 32, 32, 3))
    out = sampler(state.ema_params, rng, x_T)
    assert out.shape == (2, 32, 32, 3)
    assert float(np.abs(np.asarray(out)).max()) <= 1.0


def test_diff_cifar_stop_file_graceful_exit(tmp_path, monkeypatch):
    """A bench-drain stop file halts training at the next step boundary
    with a checkpoint; clearing it and rerunning with resume completes the
    schedule bit-exactly from the kept step (bench.py::_drain_chains)."""
    stop = tmp_path / "stop"
    monkeypatch.setattr(diff_cifar, "STOP_FILES", (str(stop),))
    cfg = diff_cifar.Config()
    cfg.data.synthetic_size = 16
    cfg.data.batch_size = 4
    cfg.model.ch = 32
    cfg.model.ch_mult = [1]
    cfg.model.attn = []
    cfg.model.num_res_blocks = 1
    cfg.model.dropout = 0.0
    cfg.diffusion.T = 4
    cfg.train.num_iterations_list = [5]
    cfg.train.warmup = 2
    cfg.train.logdir = str(tmp_path / "cifar")
    stop.write_text("drain request\n")
    state = diff_cifar.train(cfg)
    assert int(state.step) < 5          # exited early...
    from unet_design_tpu.train.checkpoint import CheckpointManager
    ckpt = CheckpointManager(os.path.join(cfg.train.logdir, "ckpt"))
    assert ckpt.latest_step() == int(state.step)   # ...with a checkpoint
    stop.unlink()
    cfg.train.resume = True
    state = diff_cifar.train(cfg)
    assert int(state.step) == 5


@pytest.mark.slow
def test_pde_staged_end_to_end(tmp_path):
    cfg = pde.Config()
    cfg.data.task = "synthetic"
    cfg.data.resolution = 32
    cfg.data.trajlen = 10
    cfg.data.n_synthetic = 3
    cfg.data.batch_size = 2
    cfg.data.max_num_steps = 2
    cfg.model.hidden_channels = 8
    cfg.model.dwt_encoder = True
    cfg.model.multi_res_loss = True
    cfg.train.num_epochs_list = [1, 1]
    cfg.train.freeze_lower_res = True
    cfg.train.logdir = str(tmp_path / "pde")
    state = pde.train(cfg)
    assert state is not None


def test_pde_device_validator_cache_reused():
    """validate_device must reuse its jitted scans across calls: through the
    tunneled TPU backend a scan re-compile costs ~90 s, and before the
    _VALIDATOR_CACHE both scans were rebuilt every epoch (validation then
    dominated protocol-scale epoch time ~15:1 over training)."""
    import jax.numpy as jnp

    cfg = pde.Config()
    cfg.data.task = "synthetic"
    cfg.data.resolution = 16
    cfg.data.trajlen = 8
    cfg.data.batch_size = 2
    cfg.data.max_num_steps = 2
    cfg.model.hidden_channels = 8
    cfg.model.dwt_encoder = True
    cfg.model.multi_res_loss = True
    model = pde.build_model(cfg)
    meta = pde.pde_config(cfg.data)
    x_init = jnp.zeros((1, cfg.data.time_history, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x_init)["params"]
    fields = jax.random.normal(jax.random.PRNGKey(1),
                               (5, cfg.data.trajlen, 16, 16, 3))

    pde._VALIDATOR_CACHE.clear()
    r1 = pde.validate_device(cfg, model, params, {}, meta,
                             model.n_levels, 0, fields)
    assert len(pde._VALIDATOR_CACHE) == 1
    fns = next(iter(pde._VALIDATOR_CACHE.values()))[1]
    r2 = pde.validate_device(cfg, model, params, {}, meta,
                             model.n_levels, 0, fields)
    # same cache entry, same jitted callables (so jit's compile cache holds)
    assert len(pde._VALIDATOR_CACHE) == 1
    assert next(iter(pde._VALIDATOR_CACHE.values()))[1] is fns
    assert set(r1) >= {"valid/loss/mse", "valid/loss/scaledl2",
                       "valid/unrolled_loss_mean"}
    for k in r1:
        assert r1[k] == pytest.approx(r2[k], rel=1e-6), k
    # a different stage (n_levels_used) is a distinct compiled program
    pde.validate_device(cfg, model, params, {}, meta,
                        model.n_levels - 1, 1, fields)
    assert len(pde._VALIDATOR_CACHE) == 2


@pytest.mark.slow
def test_pde_plain_model(tmp_path):
    cfg = pde.Config()
    cfg.data.task = "synthetic"
    cfg.data.resolution = 32
    cfg.data.trajlen = 8
    cfg.data.n_synthetic = 2
    cfg.data.batch_size = 2
    cfg.data.max_num_steps = 1
    cfg.model.name = "Unetbase-64"
    cfg.model.hidden_channels = 8
    cfg.train.num_epochs_list = [1]
    cfg.train.warmup_epochs = 1
    cfg.train.optimizer = "adamw"
    cfg.train.weight_decay = 1e-5
    cfg.train.logdir = str(tmp_path / "pde2")
    state = pde.train(cfg)
    assert state is not None


def test_pde_stop_file_graceful_exit(tmp_path, monkeypatch):
    """A bench-drain stop file halts PDE training at the next epoch
    boundary with a full-state checkpoint; clearing it and rerunning with
    resume completes the schedule (bench.py::_drain_chains)."""
    stop = tmp_path / "stop"
    monkeypatch.setattr(pde, "STOP_FILES", (str(stop),))
    cfg = pde.Config()
    cfg.data.task = "synthetic"
    cfg.data.resolution = 32
    cfg.data.trajlen = 8
    cfg.data.n_synthetic = 2
    cfg.data.batch_size = 2
    cfg.data.max_num_steps = 1
    cfg.model.name = "Unetbase-64"
    cfg.model.hidden_channels = 8
    cfg.train.num_epochs_list = [3]
    cfg.train.warmup_epochs = 1
    cfg.train.logdir = str(tmp_path / "pde")
    stop.write_text("drain request\n")
    pde.train(cfg)
    from unet_design_tpu.train.checkpoint import CheckpointManager
    latest = CheckpointManager(os.path.join(cfg.train.logdir, "ckpt_latest"))
    assert latest.latest_step() == 0      # stopped after epoch 0, ckpt kept
    stop.unlink()
    cfg.train.resume = True
    pde.train(cfg)
    latest = CheckpointManager(os.path.join(cfg.train.logdir, "ckpt_latest"))
    assert latest.latest_step() == 2      # completed all 3 epochs


def test_wmh_end_to_end(tmp_path):
    cfg = wmh.Config()
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 12
    cfg.data.resolution = 48
    cfg.data.batch_size = 4
    cfg.data.augmentation = "manual2"
    cfg.model.hidden_channels = 4
    cfg.model.dwt_encoder = True
    cfg.train.num_epochs_list = [1, 1]
    cfg.train.freeze_lower_res = True
    cfg.train.logdir = str(tmp_path / "wmh")
    best_params, sweep = wmh.train(cfg)
    assert len(sweep) == 9
    figures = os.listdir(tmp_path / "wmh" / "figures")
    assert any(f.startswith("valid_overlay") for f in figures), figures


def test_pde_shallowwater_nonsquare_end_to_end(tmp_path):
    """Shallow-water task path: .npz opener + Unetbase-64_G on a non-square
    grid (the real dataset is 96x192; reference shallowwater2d_2day.yaml)."""
    rng = np.random.default_rng(0)
    datadir = tmp_path / "sw"
    datadir.mkdir()
    for mode in ("train", "valid"):
        for i in range(2):
            np.savez(datadir / f"{mode}_{i}.npz",
                     u=rng.standard_normal((5, 16, 32, 1)).astype(np.float32),
                     v=rng.standard_normal((5, 16, 32, 2)).astype(np.float32))
    cfg = pde.Config()
    cfg.data.task = "shallowwater2d"
    cfg.data.data_path = str(datadir)
    cfg.data.trajlen = 5
    cfg.data.resolution = 16
    cfg.data.time_history = 2
    cfg.data.max_num_steps = 1
    cfg.data.batch_size = 2
    cfg.model.name = "Unetbase-64_G"
    cfg.model.hidden_channels = 4
    cfg.model.dwt_encoder = True
    cfg.train.num_epochs_list = [1]
    cfg.train.logdir = str(tmp_path / "sw_run")
    state = pde.train(cfg)
    assert state is not None


def test_pde_max_scan_steps_chunking_is_identical(tmp_path):
    """Splitting the whole-epoch scan into shorter device calls
    (train.max_scan_steps) must leave the trained parameters bit-identical:
    same step stream, same per-epoch RNG, just more calls."""
    import jax
    import numpy as np

    def run(logdir, max_scan_steps):
        cfg = pde.Config()
        cfg.data.task = "synthetic"
        cfg.data.resolution = 32
        cfg.data.trajlen = 10
        cfg.data.n_synthetic = 4
        cfg.data.batch_size = 2
        cfg.data.max_num_steps = 2
        cfg.model.hidden_channels = 8
        cfg.train.num_epochs_list = [2]
        cfg.train.max_scan_steps = max_scan_steps
        cfg.train.logdir = str(tmp_path / logdir)
        return pde.train(cfg)

    whole = run("whole", 0)
    # trajlen 10, th 4, tf 1 -> cycles=10, 4 trajs -> 40 windows -> 20 steps;
    # chunk=7 exercises equal chunks plus a ragged tail (20 = 7+7+6)
    chunked = run("chunked", 7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        whole.params, chunked.params)


def test_pde_shuffle_trajectory_order(tmp_path):
    """The per-epoch permutation must change the batch stream but keep the
    run end-to-end trainable and deterministic per seed."""
    import numpy as np

    def run(logdir, shuffle):
        cfg = pde.Config()
        cfg.data.task = "synthetic"
        cfg.data.resolution = 32
        cfg.data.trajlen = 10
        cfg.data.n_synthetic = 4
        cfg.data.batch_size = 2
        cfg.data.max_num_steps = 2
        cfg.model.hidden_channels = 8
        cfg.train.num_epochs_list = [1]
        cfg.train.shuffle_trajectory_order = shuffle
        cfg.train.logdir = str(tmp_path / logdir)
        return pde.train(cfg)

    a = run("shuf_a", True)
    b = run("shuf_b", True)    # same seed -> same permutation stream
    c = run("noshuf", False)
    ja = jax.tree_util.tree_leaves(a.params)
    jb = jax.tree_util.tree_leaves(b.params)
    jc = jax.tree_util.tree_leaves(c.params)
    for x, y in zip(ja, jb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(ja, jc))
