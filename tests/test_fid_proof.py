"""Orchestration tests for scripts/fid_proof.py (the FID-curve vehicle).

The heavy pieces (model, trainer, sampler, Inception) are stubbed; what is
under test is the milestone bookkeeping: a crash-recovery resume must never
record a later checkpoint's FID under an earlier milestone (diff_cifar.train
cannot rewind a checkpoint), a fresh run must not inherit a previous run's
curve from a reused logdir, and each milestone's point must be persisted
before the next one trains.

The stub encodes the scored step in the FID value (FID = 1000 - step), so
any mislabeling shows up as a wrong number.
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "scripts"))

import fid_proof  # noqa: E402


class _World:
    """Shared state emulating the trainer + checkpoint directory."""

    def __init__(self, ckpt=None, kept=()):
        self.ckpt = ckpt              # latest checkpoint step (None = fresh)
        self.kept = set(kept)         # steps with a restorable checkpoint
        self.evaluate_calls = []      # steps scored, in order
        self.fail_at_step = None      # make evaluate raise for this step


class _FakeModel:
    n_levels = 4

    def init(self, rng, x, t):
        import jax.numpy as jnp
        return {"params": {"step": jnp.zeros(())}}


def _install(monkeypatch, world, tmp_path):
    from unet_design_tpu.tasks import diff_cifar
    from unet_design_tpu import evalx
    from unet_design_tpu.data import image as image_data
    from unet_design_tpu.train import checkpoint as ckpt_mod

    monkeypatch.setattr(diff_cifar, "build_model", lambda cfg: _FakeModel())

    def fake_train(cfg):
        import jax.numpy as jnp
        m = cfg.train.num_iterations_list[-1]
        if not (cfg.train.resume and world.ckpt is not None
                and world.ckpt >= m):
            world.ckpt = m            # trained (or resumed) up to m
            world.kept.add(m)
        from types import SimpleNamespace
        return SimpleNamespace(ema_params={"step": jnp.asarray(
            float(world.ckpt))}, step=world.ckpt)

    def fake_evaluate(cfg, model, params, sch, rng, n_levels_used,
                      resolution, num_images, batch_size):
        step = float(np.asarray(params["step"]))
        if world.fail_at_step is not None and step == world.fail_at_step:
            raise RuntimeError(f"simulated crash scoring step {step}")
        world.evaluate_calls.append(step)
        return {"FID": 1000.0 - step, "IS": 1.0}

    monkeypatch.setattr(diff_cifar, "train", fake_train)
    monkeypatch.setattr(diff_cifar, "evaluate", fake_evaluate)

    class FakeCkptMgr:
        def __init__(self, directory, keep=5):
            pass

        def latest_step(self):
            return world.ckpt

        def restore_raw(self, step=None):
            import jax.numpy as jnp
            step = step if step is not None else world.ckpt
            if step not in world.kept:
                raise FileNotFoundError(f"no step {step}")
            return {"ema_params": {"step": jnp.asarray(float(step))}}

    monkeypatch.setattr(ckpt_mod, "CheckpointManager", FakeCkptMgr)

    class FakeFID:
        def __init__(self, stats_cache=None, batch_size=50):
            pass

        def save_reference_stats(self, images, path):
            np.savez(path, mu=np.zeros(2), sigma=np.eye(2))

    import unet_design_tpu.evalx.fid as fid_mod
    monkeypatch.setattr(fid_mod, "FIDEvaluator", FakeFID)
    monkeypatch.setattr(image_data, "synthetic_cifar10",
                        lambda n: (np.zeros((4, 32, 32, 3), np.float32),
                                   None))
    return str(tmp_path / "run")


def _read(logdir):
    with open(os.path.join(logdir, "fid_proof.json")) as f:
        return json.load(f)


def test_fresh_milestone_run(monkeypatch, tmp_path):
    world = _World()
    logdir = _install(monkeypatch, world, tmp_path)
    # a stale artifact from an unrelated run in the same logdir must NOT be
    # merged into a fresh (non-resume) run's curve
    os.makedirs(logdir)
    with open(os.path.join(logdir, "fid_proof.json"), "w") as f:
        json.dump({"fid_untrained": 123.0, "fid_trained": 1.0,
                   "train_steps": 999, "fid_curve": {"999": 1.0}}, f)
    fid_proof.main(["--milestones", "10,20", "--logdir", logdir])
    out = _read(logdir)
    assert out["fid_curve"] == {"10": 990.0, "20": 980.0}
    assert "999" not in out["fid_curve"]
    assert out["fid_untrained"] == 1000.0       # freshly scored, not 123.0
    assert out["fid_trained"] == 980.0
    assert out["fid_decreased"] is True


def test_resume_never_mislabels_passed_milestones(monkeypatch, tmp_path):
    # crash recovery: checkpoint already at 15 (past milestone 10)
    world = _World(ckpt=15, kept={15})
    logdir = _install(monkeypatch, world, tmp_path)
    os.makedirs(logdir)
    with open(os.path.join(logdir, "fid_proof.json"), "w") as f:
        json.dump({"fid_untrained": 1000.0, "is_untrained": 1.0,
                   "fid_trained": 990.0, "train_steps": 10,
                   "fid_curve": {"10": 990.0}}, f)
    fid_proof.main(["--milestones", "10,20", "--logdir", logdir,
                    "--resume"])
    out = _read(logdir)
    # milestone 10 kept its true value (the bug recorded FID@15 here)
    assert out["fid_curve"] == {"10": 990.0, "20": 980.0}
    assert out["fid_untrained"] == 1000.0        # reused, not re-scored
    assert 0.0 not in world.evaluate_calls       # no untrained re-sampling
    assert world.evaluate_calls == [20.0]        # only the new milestone


def test_resume_scores_passed_milestone_from_kept_checkpoint(monkeypatch,
                                                             tmp_path):
    # checkpoint at 15; milestone 12 has a kept checkpoint, milestone 8 not
    world = _World(ckpt=15, kept={12, 15})
    logdir = _install(monkeypatch, world, tmp_path)
    os.makedirs(logdir)
    with open(os.path.join(logdir, "fid_proof.json"), "w") as f:
        json.dump({"fid_untrained": 1000.0, "is_untrained": 1.0,
                   "fid_trained": None, "train_steps": None,
                   "fid_curve": {}}, f)
    fid_proof.main(["--milestones", "8,12,20", "--logdir", logdir,
                    "--resume"])
    out = _read(logdir)
    # 8: unrecoverable -> absent (never a wrong value); 12: exact restore
    assert out["fid_curve"] == {"12": 988.0, "20": 980.0}
    assert world.evaluate_calls == [12.0, 20.0]


def test_milestone_points_persist_before_crash(monkeypatch, tmp_path):
    world = _World()
    world.fail_at_step = 20.0
    logdir = _install(monkeypatch, world, tmp_path)
    with pytest.raises(RuntimeError, match="simulated crash"):
        fid_proof.main(["--milestones", "10,20", "--logdir", logdir])
    out = _read(logdir)                          # partial artifact exists
    assert out["fid_curve"] == {"10": 990.0}
    assert out["train_steps"] == 10


def test_rescore_scores_kept_checkpoints_only(monkeypatch, tmp_path):
    world = _World(ckpt=20, kept={10, 20})
    logdir = _install(monkeypatch, world, tmp_path)
    os.makedirs(logdir)
    with open(os.path.join(logdir, "fid_proof.json"), "w") as f:
        json.dump({"fid_untrained": 1000.0, "is_untrained": 1.0,
                   "fid_trained": 980.0, "train_steps": 20,
                   "fid_curve": {"10": 990.0, "20": 980.0}}, f)
    fid_proof.main(["--rescore", "--milestones", "5,10,20",
                    "--images", "4096", "--logdir", logdir])
    with open(os.path.join(logdir, "fid_proof_rescore_4096.json")) as f:
        out = json.load(f)
    # 5 has no kept checkpoint -> absent; the others scored exactly
    assert out["fid_curve"] == {"10": 990.0, "20": 980.0}
    assert out["n_images"] == 4096
    assert world.evaluate_calls == [10.0, 20.0]   # no training, no untrained
    # the main artifact is untouched
    main = _read(logdir)
    assert main["train_steps"] == 20 and main["fid_curve"]["20"] == 980.0
