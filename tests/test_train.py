"""Tests for the training core: freezing labels, EMA masking, staged specs,
schedules, and an end-to-end staged DDPM smoke train on a tiny model."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from unet_design_tpu.models.multires_unet import MultiResUNet
from unet_design_tpu.models.unetbase import WMHSegUnet
from unet_design_tpu.process import diffusion
from unet_design_tpu.train import freezing, schedules, trainer
from unet_design_tpu.train.ema import ema_update

RNG = jax.random.PRNGKey(0)


def test_warmup_schedule():
    s = schedules.warmup_lr(2e-4, 100)
    np.testing.assert_allclose(float(s(0)), 0.0)
    np.testing.assert_allclose(float(s(50)), 1e-4)
    np.testing.assert_allclose(float(s(100)), 2e-4)
    np.testing.assert_allclose(float(s(500)), 2e-4)


def test_linear_warmup_cosine():
    s = schedules.linear_warmup_cosine_annealing(1.0, 5, 50,
                                                 warmup_start_lr=0.0,
                                                 eta_min=0.1)
    np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(s(5)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(s(50)), 0.1, atol=1e-6)
    assert float(s(27)) < 1.0


def test_stage_spec_from_schedule():
    specs = trainer.StageSpec.from_schedule([100, 100, 300], n_levels=3)
    assert [(s.n_levels_used, s.n_downsample) for s in specs] == [
        (1, 2), (2, 1), (3, 0)]
    # single stage = full training
    specs = trainer.StageSpec.from_schedule([500], n_levels=4)
    assert specs[0].n_levels_used == 4 and specs[0].n_downsample == 0


def _tiny_model_and_params():
    model = MultiResUNet(ch=32, ch_mult=(1, 2), attn=(), num_res_blocks=1,
                         dropout=0.0, multi_res_loss=True)
    x = jnp.ones((2, 8, 8, 3))
    t = jnp.zeros((2,), jnp.int32)
    variables = model.init(RNG, x, t)
    return model, variables["params"]


def test_multires_freeze_labels():
    model, params = _tiny_model_and_params()
    labels = freezing.multires_unet_labels(params, n_levels=2,
                                           n_levels_used=2)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    froz = {jax.tree_util.keystr(p) for p, v in flat if v == "frozen"}
    # level 1 (coarsest) must be frozen, except its upsample; middle frozen
    assert any("middle_0" in f for f in froz)
    assert any("tail_1" in f for f in froz)
    assert any("time_emb_1" in f for f in froz)
    assert not any("up_1_upsample" in f for f in froz)
    assert not any("tail_0" in f for f in froz)
    # stage 0: nothing frozen
    labels0 = freezing.multires_unet_labels(params, 2, 1)
    assert all(v == "train" for v in jax.tree_util.tree_leaves(labels0))


def test_unetbase_g_freeze_labels():
    model = WMHSegUnet(hidden_channels=8, multi_res_loss=True, sequ_mode=True)
    x = jnp.ones((1, 32, 32, 2))
    params = model.init(RNG, x)["params"]
    labels = freezing.unetbase_g_labels(params, n_levels=4, n_levels_used=3)
    flat = jax.tree_util.tree_leaves_with_path(labels)
    froz = {jax.tree_util.keystr(p) for p, v in flat if v == "frozen"}
    # down_2, down_3 frozen; down_1 trainable
    assert any("down_2" in f for f in froz) and any("down_3" in f for f in froz)
    assert not any("'down_1'" in f for f in froz)
    # up_0, up_1 frozen; up_2, up_3 trainable
    assert any("'up_0'" in f for f in froz)
    assert not any("'up_2'" in f for f in froz)
    # heads: image_proj_2, image_proj_3 frozen; image_proj_1 (entry) trainable
    assert any("image_proj_2" in f for f in froz)
    assert not any("image_proj_1" in f for f in froz)
    # tails: final_0, final_1 frozen; final_2 trainable
    assert any("final_0" in f for f in froz)
    assert not any("final_2" in f for f in froz)


def test_ema_masked_update():
    ema = {"a": jnp.zeros(2), "b": jnp.zeros(2)}
    new = {"a": jnp.ones(2), "b": jnp.ones(2)}
    mask = {"a": True, "b": False}
    out = ema_update(ema, new, decay=0.5, trainable_mask=mask)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.5)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.0)


def test_frozen_params_do_not_move_and_loss_decreases():
    model, params = _tiny_model_and_params()
    sch = diffusion.DDPMSchedule.create(T=10)
    labels = freezing.multires_unet_labels(params, 2, 2)
    tx = trainer.make_optimizer(1e-3, grad_clip=1.0, labels=labels)
    state = trainer.TrainState.create(params, RNG, tx.init(params))
    mask = freezing.trainable_mask(labels)

    def loss_fn(p, rng, batch):
        def model_fn(x, t, n):
            return model.apply({"params": p}, x, t, n_levels_used=n)
        return diffusion.ddpm_loss(model_fn, sch, rng, batch,
                                   n_levels_used=2, n_levels=2,
                                   multi_res_loss=True)

    step = trainer.make_train_step(loss_fn, tx, ema_decay=0.5,
                                   trainable_mask=mask, jit=True)
    batch = jax.random.normal(RNG, (4, 8, 8, 3))
    p0 = jax.tree_util.tree_map(jnp.copy, state.params)
    losses = []
    for _ in range(5):
        state, loss, _ = step(state, batch)
        losses.append(float(loss))
    # frozen leaves identical, trainable leaves moved
    def check(path, a, b, lab):
        if lab == "frozen":
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    flat0 = jax.tree_util.tree_leaves_with_path(p0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(state.params))
    flatl = dict(jax.tree_util.tree_leaves_with_path(labels))
    moved = frozen_same = 0
    for path, a in flat0:
        b, lab = flat1[path], flatl[path]
        if lab == "frozen":
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            frozen_same += 1
        elif not np.allclose(np.asarray(a), np.asarray(b)):
            moved += 1
    assert frozen_same > 0 and moved > 0
    assert int(state.step) == 5
    # EMA of frozen leaves unchanged too
    flat_e = dict(jax.tree_util.tree_leaves_with_path(state.ema_params))
    for path, a in flat0:
        if flatl[path] == "frozen":
            np.testing.assert_array_equal(np.asarray(a),
                                          np.asarray(flat_e[path]))


def test_stage_spec_short_schedule_uses_model_levels():
    """Fewer stages than levels: the reference derives the stage resolution
    from the MODEL's level count (diff_cifar/main.py:290-293), so a 2-stage
    schedule on a 4-level model never reaches full resolution."""
    specs = trainer.StageSpec.from_schedule([100, 100], n_levels=4)
    assert [(s.n_levels_used, s.n_downsample) for s in specs] == [
        (1, 3), (2, 2)]


def test_linear_warmup_reaches_base_lr_at_last_warmup_epoch():
    # reference closed form divisor is (warmup_epochs - 1)
    s = schedules.linear_warmup_cosine_annealing(1.0, 5, 50)
    np.testing.assert_allclose(float(s(4)), 1.0, atol=1e-6)
    # per-step evaluation with steps_per_epoch: same curriculum
    s2 = schedules.linear_warmup_cosine_annealing(1.0, 5, 50,
                                                  steps_per_epoch=10)
    np.testing.assert_allclose(float(s2(40)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(s2(20)), float(s(2)), atol=1e-6)
    assert float(s2(499)) > 0.0  # never collapses mid-training
