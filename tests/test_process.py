"""Tests for the process layer: diffusion schedules/losses/samplers, PDE
losses, rollout."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_design_tpu.process import diffusion, losses, rollout

RNG = jax.random.PRNGKey(0)


def test_ddpm_schedule_matches_torch_reference_math():
    """Recompute the diff_cifar buffers in float64 numpy and compare."""
    sch = diffusion.DDPMSchedule.create(1e-4, 0.02, 100)
    betas = np.linspace(1e-4, 0.02, 100)
    ab = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(sch.sqrt_alphas_bar),
                               np.sqrt(ab), rtol=1e-6)
    abp = np.concatenate([[1.0], ab[:-1]])
    pv = betas * (1 - abp) / (1 - ab)
    np.testing.assert_allclose(np.asarray(sch.posterior_var), pv, rtol=1e-5)
    # fixedlarge log var head equals posterior_var[1] (diffusion.py:174)
    np.testing.assert_allclose(np.asarray(sch.fixedlarge_log_var)[0],
                               np.log(pv[1]), rtol=1e-5)


def _dummy_model(multi_res=False, n_levels=3):
    def fn(x, t, n_levels_used):
        if not multi_res:
            return x * 0.1
        outs = []
        cur = x
        pyramid = []
        for _ in range(n_levels_used):
            pyramid.append(cur)
            cur = cur[:, ::2, ::2, :]
        return [p * 0.1 for p in pyramid[::-1]]
    return fn


def test_ddpm_loss_single_and_multires():
    sch = diffusion.DDPMSchedule.create(T=10)
    x0 = jax.random.normal(RNG, (4, 16, 16, 3))
    loss, ll = diffusion.ddpm_loss(_dummy_model(), sch, RNG, x0,
                                   n_levels_used=3, n_levels=3)
    assert loss.shape == () and not ll
    loss, ll = diffusion.ddpm_loss(_dummy_model(multi_res=True), sch, RNG, x0,
                                   n_levels_used=3, n_levels=3,
                                   multi_res_loss=True)
    assert loss.shape == () and len(ll) == 3
    # staged: x0 downsampled once, 2 levels used
    x0s = x0[:, ::2, ::2, :]
    loss, ll = diffusion.ddpm_loss(_dummy_model(multi_res=True), sch, RNG,
                                   x0s, n_levels_used=2, n_levels=3,
                                   n_downsample=1, multi_res_loss=True,
                                   sequ_train_algo=True)
    assert len(ll) == 2


@pytest.mark.parametrize("mean_type", ["epsilon", "xstart", "xprev"])
@pytest.mark.parametrize("var_type", ["fixedlarge", "fixedsmall"])
def test_ddpm_sampler_runs_and_clips(mean_type, var_type):
    sch = diffusion.DDPMSchedule.create(T=5)
    x_T = jax.random.normal(RNG, (2, 8, 8, 3))
    out = diffusion.ddpm_sample(_dummy_model(), sch, RNG, x_T, 3,
                                mean_type=mean_type, var_type=var_type)
    assert out.shape == x_T.shape
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-6


def test_vp_diffusion_roundtrip():
    vp = diffusion.VPDiffusion.create(N=30)
    t = vp.sample_t(RNG, 8)
    assert t.shape == (8,) and int(t.max()) < 30
    # staged sampling restricted to the top interval
    t = vp.sample_t(RNG, 1000, stage=0, n_stages=3)
    assert int(t.min()) >= 20
    x0 = jax.random.normal(RNG, (4, 8, 8, 1))
    x_t, noise = vp.sample_x(RNG, x0, vp.sample_t(RNG, 4))
    assert x_t.shape == x0.shape
    loss, _ = vp.loss(x_t, noise)
    assert loss.shape == ()
    x, x_mean = vp.reverse_sample(_dummy_model(), RNG, x0, n_levels_used=1)
    assert x.shape == x0.shape


def test_vp_weighted_multires_loss_uses_true_power():
    vp = diffusion.VPDiffusion.create(N=10, beta_max=2.0, multi_res_loss=True,
                                      weighted_multi_res_loss=True)
    outs = [jnp.ones((2, 4, 4, 1)), jnp.ones((2, 8, 8, 1))]
    tgts = [jnp.zeros((2, 4, 4, 1)), jnp.zeros((2, 8, 8, 1))]
    loss, ll = vp.loss(outs, tgts)
    # weights prop to 1/16 and 1/64, normalized: 0.8, 0.2 -> loss = 1.0
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-6)
    assert len(ll) == 2


def test_pde_losses():
    pred = jax.random.normal(RNG, (2, 3, 8, 8, 2))
    tgt = jnp.zeros_like(pred)
    mse = losses.custom_mse_loss(pred, tgt)
    # equals mean over B of sum_{t,c} mean_{h,w}
    manual = np.mean(np.sum(np.mean(np.asarray(pred) ** 2, axis=(2, 3)),
                            axis=(1, 2)))
    np.testing.assert_allclose(float(mse), manual, rtol=1e-5)
    sl = losses.scaledlp_loss(pred, pred + 1e-6)
    assert float(sl) >= 0
    d = losses.dice_coef_loss(jnp.ones((4, 4)), jnp.ones((4, 4)))
    np.testing.assert_allclose(float(d), 0.0, atol=1e-6)


def test_multires_sum():
    f = losses.custom_mse_loss
    a = [jnp.ones((1, 1, 4, 4, 1)), jnp.ones((1, 1, 8, 8, 1))]
    b = [jnp.zeros_like(x) for x in a]
    total = losses.multires_sum(f, a, b)
    np.testing.assert_allclose(float(total), 2.0, rtol=1e-6)


def test_rollout_matches_python_loop():
    def model_fn(window):
        # predict the mean of the window as the single next frame
        return jnp.mean(window, axis=1, keepdims=True) * 0.9

    u = jax.random.normal(RNG, (2, 4, 8, 8, 1))
    traj = rollout.rollout2d(model_fn, u, None, time_history=2, num_steps=3)
    assert traj.shape == (2, 3, 8, 8, 1)
    # python reference loop
    data = u[:, :2]
    preds = []
    for _ in range(3):
        p = model_fn(data)
        preds.append(p)
        data = jnp.concatenate([data, p], axis=1)[:, -2:]
    ref = jnp.concatenate(preds, axis=1)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(ref), rtol=1e-6)


def test_cond_rollout():
    def model_fn(window, dt, cond):
        return window[:, -1:] * 0.5 + dt[:, None, None, None, None]

    u = jax.random.normal(RNG, (2, 3, 4, 4, 1))
    dt = jnp.ones((2,))
    traj = rollout.cond_rollout2d(model_fn, u, None, dt, None,
                                  time_history=2, num_steps=2)
    assert traj.shape == (2, 2, 4, 4, 1)


def test_ddim_sampler_runs():
    from unet_design_tpu.process import diffusion as diff
    sch = diff.DDPMSchedule.create(T=20)
    x_T = jax.random.normal(RNG, (2, 8, 8, 3))
    out = diff.ddim_sample(_dummy_model(), sch, RNG, x_T, 3, n_steps=5)
    assert out.shape == x_T.shape
    assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-6
    # eta > 0 stochastic variant
    out2 = diff.ddim_sample(_dummy_model(), sch, RNG, x_T, 3, n_steps=5,
                            eta=0.5)
    assert out2.shape == x_T.shape


def test_dpm_solver_converges_faster_than_ddim():
    """DPM-Solver++(2M) is a 2nd-order solver of the same probability-flow
    ODE that DDIM (eta=0) solves at 1st order: at equal step count its error
    vs a fine DDIM reference must be much smaller."""
    sched = diffusion.DDPMSchedule.create(T=1000)
    alphas_bar = sched.sqrt_alphas_bar ** 2
    s2 = 0.25  # data variance: the exact eps model for x0 ~ N(0, s2 I)

    def eps_model(x, t, n_levels_used=None):
        ab = alphas_bar[t][:, None, None, None]
        return jnp.sqrt(1.0 - ab) * x / (s2 * ab + (1.0 - ab))

    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
    # PF-ODE solution for the linear score is exact: marginal-std rescaling
    ab_T = alphas_bar[-1]
    exact = jnp.sqrt(s2) / jnp.sqrt(s2 * ab_T + (1.0 - ab_T)) * x_T
    kw = dict(n_levels_used=1, clip=False)
    ddim16 = diffusion.ddim_sample(eps_model, sched, jax.random.PRNGKey(1),
                                   x_T, n_steps=16, eta=0.0, **kw)
    dpm16 = diffusion.dpm_solver_sample(eps_model, sched, x_T, n_steps=16,
                                        **kw)
    dpm64 = diffusion.dpm_solver_sample(eps_model, sched, x_T, n_steps=64,
                                        **kw)
    err_ddim16 = float(jnp.abs(ddim16 - exact).max())
    err_dpm16 = float(jnp.abs(dpm16 - exact).max())
    err_dpm64 = float(jnp.abs(dpm64 - exact).max())
    assert err_dpm16 < 0.25 * err_ddim16, (err_dpm16, err_ddim16)
    assert err_dpm64 < 0.25 * err_dpm16, (err_dpm64, err_dpm16)  # 2nd order
