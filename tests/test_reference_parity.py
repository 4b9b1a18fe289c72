"""Execution parity against the REFERENCE implementation itself.

These tests import reference modules from ``/root/reference`` (torch CPU) and
run them side-by-side with our JAX implementations on identical inputs —
stronger evidence than re-derived golden values.  Only reference files whose
import chain is torch-only are used (``pytorch_wavelets`` is stubbed where it
is imported but unused by the tested code path).  Skipped entirely when the
reference checkout or torch is unavailable.
"""

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = pathlib.Path("/root/reference")
torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="no reference checkout")

from unet_design_tpu.data import pde as pde_data
from unet_design_tpu.process import diffusion, losses


class _FakeDWT:
    """pytorch_wavelets stand-in: constructible (DTWBlock instantiates it
    unconditionally) but never callable in the code paths under test."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, *args, **kwargs):
        raise NotImplementedError("DWT path should not execute in this test")


def _stub_wavelets():
    sys.modules["pytorch_wavelets"] = types.SimpleNamespace(
        DWTForward=_FakeDWT, DWTInverse=_FakeDWT)


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_cifar_diffusion():
    # diff_cifar/diffusion.py imports pytorch_wavelets at module level but the
    # sampler/trainer construction paths under test never touch it.
    _stub_wavelets()
    return _load("ref_cifar_diffusion", REF / "diff_cifar" / "diffusion.py")


@pytest.fixture(scope="module")
def ref_vp():
    sys.path.insert(0, str(REF / "diff_mnist"))
    try:
        import torch_ddpm.ddpm.diffusion as mod  # noqa: F401
    finally:
        sys.path.pop(0)
    return mod


class _TorchDummy(torch.nn.Module):
    """Deterministic stand-in model, mirrored exactly by :func:`_jax_dummy`."""

    def forward(self, x, t, n_levels_used=None):
        tt = t.reshape(-1).float()
        return torch.tanh(x) * (0.5 + 0.01 * tt.view(-1, 1, 1, 1))


def _jax_dummy(x, t, n_levels_used=None):
    tt = jnp.reshape(t, (-1,)).astype(jnp.float32)
    return jnp.tanh(x) * (0.5 + 0.01 * tt[:, None, None, None])


@pytest.mark.parametrize("mean_type", ["xprev", "xstart", "epsilon"])
@pytest.mark.parametrize("var_type", ["fixedlarge", "fixedsmall"])
def test_ddpm_sampler_matches_reference_execution(
        ref_cifar_diffusion, monkeypatch, mean_type, var_type):
    """Full T-step ancestral sampler, zero noise: our lax.scan sampler must
    reproduce the reference GaussianDiffusionSampler.forward trajectory for
    every mean/var parameterization (diff_cifar/diffusion.py:169-222)."""
    T = 8
    x_T = np.random.default_rng(0).standard_normal((2, 3, 8, 8)) \
        .astype(np.float32)

    # construct as 'epsilon' then set the attribute: the reference ctor
    # assert has a missing comma (['xprev' 'xstart', 'epsilon'],
    # diffusion.py:97) so 'xprev'/'xstart' cannot be passed directly.
    sampler = ref_cifar_diffusion.GaussianDiffusionSampler(
        _TorchDummy(), beta_1=1e-4, beta_T=0.2, T=T,
        mean_type="epsilon", var_type=var_type)
    sampler.mean_type = mean_type
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))
    with torch.no_grad():
        ref_out = sampler(torch.from_numpy(x_T), n_levels_used=4).numpy()

    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype))
    sched = diffusion.DDPMSchedule.create(beta_1=1e-4, beta_T=0.2, T=T)
    ours = diffusion.ddpm_sample(_jax_dummy, sched, jax.random.PRNGKey(0),
                                 jnp.asarray(x_T), n_levels_used=4,
                                 mean_type=mean_type, var_type=var_type)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4,
                               atol=1e-5)


def test_ddpm_schedule_buffers_match_reference(ref_cifar_diffusion):
    T = 1000
    sampler = ref_cifar_diffusion.GaussianDiffusionSampler(
        _TorchDummy(), beta_1=1e-4, beta_T=0.02, T=T, mean_type="epsilon")
    sched = diffusion.DDPMSchedule.create(beta_1=1e-4, beta_T=0.02, T=T)
    for ref_name, ours in [
            ("betas", sched.betas),
            ("sqrt_recip_alphas_bar", sched.sqrt_recip_alphas_bar),
            ("sqrt_recipm1_alphas_bar", sched.sqrt_recipm1_alphas_bar),
            ("posterior_mean_coef1", sched.posterior_mean_coef1),
            ("posterior_mean_coef2", sched.posterior_mean_coef2),
            ("posterior_log_var_clipped", sched.posterior_log_var_clipped)]:
        ref_buf = getattr(sampler, ref_name).numpy()
        # torch.linspace computes the beta grid in float32 before the
        # .double() cast; ours is float64 end-to-end — hence the loose rtol.
        np.testing.assert_allclose(np.asarray(ours), ref_buf, rtol=5e-4,
                                   atol=1e-6, err_msg=ref_name)


def test_vp_reverse_sampler_matches_reference_execution(ref_vp, monkeypatch):
    """VP reverse SDE sampler (torch_ddpm/ddpm/diffusion.py:7-38,136-174),
    zero noise, N=6 steps."""
    N = 6
    x_T = np.random.default_rng(1).standard_normal((2, 3, 8, 8)) \
        .astype(np.float32)
    ref = ref_vp.Diffusion(beta_min=0.1, beta_max=2.0, N=N, eps=1e-3, T=1.0)

    def ref_score_fn(x, t, n_levels_used=-1):
        return _TorchDummy()(x, t), None

    monkeypatch.setattr(
        torch, "randn", lambda shape: torch.zeros(shape))
    with torch.no_grad():
        ref_x, ref_mean = ref.reverse_sample(torch.from_numpy(x_T),
                                             ref_score_fn)

    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype))
    vp = diffusion.VPDiffusion.create(beta_min=0.1, beta_max=2.0, N=N,
                                      eps=1e-3, T=1.0)
    x, x_mean = vp.reverse_sample(_jax_dummy, jax.random.PRNGKey(0),
                                  jnp.asarray(x_T))
    np.testing.assert_allclose(np.asarray(x), ref_x.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_mean), ref_mean.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_vp_loss_matches_reference_execution(ref_vp):
    rng = np.random.default_rng(2)
    ref = ref_vp.Diffusion(beta_min=0.1, beta_max=2.0, N=10,
                           multi_res_loss=True)
    vp = diffusion.VPDiffusion.create(beta_min=0.1, beta_max=2.0, N=10,
                                      multi_res_loss=True)
    outs = [rng.standard_normal((2, 1, r, r)).astype(np.float32)
            for r in (8, 16)]
    noises = [rng.standard_normal((2, 1, r, r)).astype(np.float32)
              for r in (8, 16)]
    ref_loss, ref_list = ref.loss([torch.from_numpy(o) for o in outs],
                                  [torch.from_numpy(z) for z in noises],
                                  last_loss_schedule_weight=0.7)
    loss, llist = vp.loss([jnp.asarray(o) for o in outs],
                          [jnp.asarray(z) for z in noises],
                          last_loss_schedule_weight=0.7)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(llist, ref_list):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)


def test_vp_forward_noising_matches_reference_buffers(ref_vp):
    ref = ref_vp.Diffusion(beta_min=0.1, beta_max=2.0, N=16)
    vp = diffusion.VPDiffusion.create(beta_min=0.1, beta_max=2.0, N=16)
    # float32 torch.linspace grid vs our float64 — loose rtol (see above)
    np.testing.assert_allclose(np.asarray(vp.sqrt_alphas_cumprod),
                               ref.sqrt_alphas_cumprod.numpy(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(vp.sqrt_1m_alphas_cumprod),
                               ref.sqrt_1m_alphas_cumprod.numpy(), rtol=1e-4)


def test_create_data2d_matches_reference_execution():
    ref_utils = _load("ref_pde_data_utils",
                      REF / "pdearena" / "pdearena" / "data" / "utils.py")
    rng = np.random.default_rng(3)
    # reference layout (T, C, H, W) scalar / vector split
    u = rng.standard_normal((10, 1, 6, 6)).astype(np.float32)
    v = rng.standard_normal((10, 2, 6, 6)).astype(np.float32)
    for time_history, time_future, time_gap, start in [
            (4, 1, 0, 0), (2, 2, 1, 3), (1, 1, 0, 5)]:
        ref_x, ref_y = ref_utils.create_data2D(
            1, 1, 1, 1, torch.from_numpy(u), torch.from_numpy(v), None,
            start, time_history, time_future, time_gap)
        ours_x, ours_y = pde_data.create_data2d(
            1, 1, 1, 1,
            np.transpose(u, (0, 2, 3, 1)), np.transpose(v, (0, 2, 3, 1)),
            start, time_history, time_future, time_gap)
        # ours is (1, T, H, W, C); reference is (1, T, C, H, W)
        np.testing.assert_allclose(np.transpose(ours_x, (0, 1, 4, 2, 3)),
                                   ref_x.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.transpose(ours_y, (0, 1, 4, 2, 3)),
                                   ref_y.numpy(), rtol=1e-6)


def _t2f_conv(w):
    """torch Conv2d weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O)."""
    return jnp.asarray(np.transpose(w.numpy(), (2, 3, 1, 0)))


def _t2f_tconv(w):
    """torch ConvTranspose2d weight (I, O, kh, kw) -> flax ConvTranspose
    kernel (kh, kw, I, O); torch cross-correlates the *output* grid so the
    kernel is spatially flipped relative to flax (probed numerically)."""
    return jnp.asarray(
        np.transpose(w.numpy()[:, :, ::-1, ::-1].copy(), (2, 3, 0, 1)))


def _convblock_from_torch(sd, prefix):
    return {
        "Conv_0": {"kernel": _t2f_conv(sd[f"{prefix}.conv1.weight"]),
                   "bias": jnp.asarray(sd[f"{prefix}.conv1.bias"].numpy())},
        "Conv_1": {"kernel": _t2f_conv(sd[f"{prefix}.conv2.weight"]),
                   "bias": jnp.asarray(sd[f"{prefix}.conv2.bias"].numpy())},
        "GroupNorm_0": {"GroupNorm_0": {
            "scale": jnp.asarray(sd[f"{prefix}.norm1.weight"].numpy()),
            "bias": jnp.asarray(sd[f"{prefix}.norm1.bias"].numpy())}},
        "GroupNorm_1": {"GroupNorm_0": {
            "scale": jnp.asarray(sd[f"{prefix}.norm2.weight"].numpy()),
            "bias": jnp.asarray(sd[f"{prefix}.norm2.bias"].numpy())}},
    }


def test_unetbase_full_forward_matches_reference_execution():
    """FULL Unetbase forward parity: the reference model's trained-shape
    parameters are transplanted into our flax Unetbase and both are run on
    the same input (twod_unetbase.py:60-141) — this is the model behind the
    headline fwd benchmark."""
    _stub_wavelets()
    sys.path.insert(0, str(REF / "pdearena"))
    try:
        import pdearena.modules.twod_unetbase as ref_mod
    finally:
        sys.path.pop(0)

    from unet_design_tpu.models import unetbase

    torch.manual_seed(0)
    ref = ref_mod.Unetbase(1, 1, 1, 1, time_history=2, time_future=1,
                           hidden_channels=8, activation="gelu")
    ref.eval()
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    ours = unetbase.Unetbase(n_output_fields=3, time_future=1,
                             hidden_channels=8, activation="gelu")
    x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    params = ours.init(jax.random.PRNGKey(0), x_nhwc)["params"]

    sd = ref.state_dict()
    new = {"image_proj": _convblock_from_torch(sd, "image_proj"),
           "final": {"kernel": _t2f_conv(sd["final.weight"]),
                     "bias": jnp.asarray(sd["final.bias"].numpy())}}
    for i in range(4):
        new[f"down_{i}"] = _convblock_from_torch(sd, f"down.{i}.conv")
        new[f"up_{i}"] = _convblock_from_torch(sd, f"up.{i}.conv")
        new[f"up_{i}_tconv"] = {"ConvTranspose_0": {
            "kernel": _t2f_tconv(sd[f"up.{i}.up.weight"]),
            "bias": jnp.asarray(sd[f"up.{i}.up.bias"].numpy())}}
    # exact same tree structure as the random init
    jax.tree_util.tree_map(lambda a, b: None, params, new)

    y = ours.apply({"params": new}, x_nhwc)
    y_nchw = np.transpose(np.asarray(y), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(y_nchw, ref_out, rtol=1e-4, atol=1e-4)


def _t2f_lin(w):
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return jnp.asarray(w.numpy().T)


def _gn_from_torch(sd, prefix):
    return {"GroupNorm_0": {"scale": jnp.asarray(sd[f"{prefix}.weight"].numpy()),
                            "bias": jnp.asarray(sd[f"{prefix}.bias"].numpy())}}


def _conv_from_torch(sd, prefix):
    return {"kernel": _t2f_conv(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"].numpy())}


def _ddpm_resblock_from_torch(sd, prefix):
    out = {
        "GroupNorm_0": _gn_from_torch(sd, f"{prefix}.block1.0"),
        "Conv_0": _conv_from_torch(sd, f"{prefix}.block1.2"),
        "temb_proj": {"kernel": _t2f_lin(sd[f"{prefix}.temb_proj.1.weight"]),
                      "bias": jnp.asarray(
                          sd[f"{prefix}.temb_proj.1.bias"].numpy())},
        "GroupNorm_1": _gn_from_torch(sd, f"{prefix}.block2.0"),
        "Conv_1": _conv_from_torch(sd, f"{prefix}.block2.3"),
    }
    if f"{prefix}.shortcut.weight" in sd:
        out["shortcut"] = _conv_from_torch(sd, f"{prefix}.shortcut")
    if f"{prefix}.attn.proj_q.weight" in sd:
        out["DDPMAttnBlock_0"] = {
            "GroupNorm_0": _gn_from_torch(sd, f"{prefix}.attn.group_norm"),
            "Conv_0": _conv_from_torch(sd, f"{prefix}.attn.proj_q"),
            "Conv_1": _conv_from_torch(sd, f"{prefix}.attn.proj_k"),
            "Conv_2": _conv_from_torch(sd, f"{prefix}.attn.proj_v"),
            "Conv_3": _conv_from_torch(sd, f"{prefix}.attn.proj"),
        }
    return out


def test_multires_unet_full_forward_matches_reference_execution(
        ref_cifar_model=None):
    """FULL UNetWaveletEnc forward parity (diff_cifar/model.py:326-496): the
    reference flagship DDPM U-Net's parameters are transplanted into our
    MultiResUNet and both run on identical (x, t) — per-level time
    embeddings, ResBlocks with temb injection, single-head attention,
    down/up-sampling, and tail heads all verified at once."""
    _stub_wavelets()
    ref_model_mod = _load("ref_cifar_model", REF / "diff_cifar" / "model.py")
    from unet_design_tpu.models.multires_unet import MultiResUNet

    torch.manual_seed(1)
    T, ch, ch_mult, n_res = 10, 32, [1, 2], 1
    ref = ref_model_mod.UNetWaveletEnc(T=T, ch=ch, ch_mult=ch_mult, attn=[1],
                                       num_res_blocks=n_res, dropout=0.0)
    # re-randomize at O(1): the reference's gain-1e-5 tail/attn/block2 inits
    # make raw outputs ~1e-5, which would let atol swallow real mismatches
    # (this is exactly how the strided-conv 'SAME' misalignment initially
    # slipped past this test)
    gen = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            # keep the fixed sinusoidal tables (Embedding.from_pretrained is
            # still a parameter) — our side computes them analytically
            if "timembedding.0" not in name:
                p.normal_(0.0, 0.1, generator=gen)
    ref.eval()
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.array([3, 7], np.int64)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    ours = MultiResUNet(ch=ch, ch_mult=tuple(ch_mult), attn=(1,),
                        num_res_blocks=n_res, dropout=0.0)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    tj = jnp.asarray(t, jnp.int32)
    params = ours.init(jax.random.PRNGKey(0), x_nhwc, tj)["params"]

    sd = ref.state_dict()
    new = {}
    for lvl in range(len(ch_mult)):
        new[f"time_emb_{lvl}"] = {
            "Dense_0": {
                "kernel": _t2f_lin(
                    sd[f"time_embedding_list.{lvl}.timembedding.1.weight"]),
                "bias": jnp.asarray(
                    sd[f"time_embedding_list.{lvl}.timembedding.1.bias"]
                    .numpy())},
            "Dense_1": {
                "kernel": _t2f_lin(
                    sd[f"time_embedding_list.{lvl}.timembedding.3.weight"]),
                "bias": jnp.asarray(
                    sd[f"time_embedding_list.{lvl}.timembedding.3.bias"]
                    .numpy())},
        }
        for i in range(n_res):
            new[f"down_{lvl}_{i}"] = _ddpm_resblock_from_torch(
                sd, f"downblocks.{lvl}.{i}")
        if lvl != len(ch_mult) - 1:
            new[f"down_{lvl}_downsample"] = {"Conv_0": _conv_from_torch(
                sd, f"downblocks.{lvl}.{n_res}.main")}
        for j in range(n_res + 1):
            new[f"up_{lvl}_{j}"] = _ddpm_resblock_from_torch(
                sd, f"upblocks.{lvl}.{j}")
        if lvl != 0:
            new[f"up_{lvl}_upsample"] = {"Conv_0": _conv_from_torch(
                sd, f"upblocks.{lvl}.{n_res + 1}.main")}
        new[f"tail_{lvl}"] = {
            "GroupNorm_0": _gn_from_torch(sd, f"tail_list.{lvl}.0"),
            "Conv_0": _conv_from_torch(sd, f"tail_list.{lvl}.2"),
        }
    new["middle_0"] = _ddpm_resblock_from_torch(sd, "middleblocks.0")
    new["middle_1"] = _ddpm_resblock_from_torch(sd, "middleblocks.1")
    jax.tree_util.tree_map(lambda a, b: None, params, new)  # same structure

    y = ours.apply({"params": new}, x_nhwc, tj)
    y_nchw = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y_nchw, ref_out, rtol=1e-4, atol=1e-4)


def test_lr_schedule_matches_reference_execution():
    """LinearWarmupCosineAnnealingLR stepped per-epoch (the chainable form
    Lightning uses, lr_scheduler.py:41-77) vs our optax schedule."""
    ref_sched_mod = _load("ref_lr_scheduler",
                          REF / "pdearena" / "pdearena" / "lr_scheduler.py")
    from unet_design_tpu.train import schedules

    base_lr, warmup, max_epochs, eta_min = 2e-4, 5, 50, 1e-7
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    ref = ref_sched_mod.LinearWarmupCosineAnnealingLR(
        opt, warmup_epochs=warmup, max_epochs=max_epochs, eta_min=eta_min)
    ours = schedules.linear_warmup_cosine_annealing(
        base_lr, warmup, max_epochs, eta_min=eta_min, steps_per_epoch=1)
    for epoch in range(max_epochs):
        ref_lr = ref.get_last_lr()[0]
        np.testing.assert_allclose(float(ours(epoch)), ref_lr, rtol=1e-5,
                                   atol=1e-10, err_msg=f"epoch {epoch}")
        opt.step()
        ref.step()


def test_rollout2d_matches_reference_execution():
    """Autoregressive rollout window semantics (rollout.py:12-54) with a
    deterministic dummy model, incl. time_history > time_future overlap."""
    sys.path.insert(0, str(REF / "pdearena"))
    try:
        import pdearena.rollout as ref_rollout
        from pdearena.data.utils import PDEDataConfig
    finally:
        sys.path.pop(0)
    from unet_design_tpu.process import rollout as our_rollout

    tf = 1

    class _TorchStep(torch.nn.Module):
        def forward(self, x, n_levels_used=None):
            return torch.tanh(x[:, -tf:]) * 0.9 + 0.05

    def jax_step(x):
        return jnp.tanh(x[:, -tf:]) * 0.9 + 0.05

    rng = np.random.default_rng(7)
    u = rng.standard_normal((2, 6, 1, 5, 5)).astype(np.float32)  # (B,T,C,H,W)
    v = rng.standard_normal((2, 6, 2, 5, 5)).astype(np.float32)
    pde_cfg = PDEDataConfig(1, 1, 6, 2)
    for time_history in (1, 3):
        with torch.no_grad():
            ref_traj = ref_rollout.rollout2d(
                _TorchStep(), torch.from_numpy(u), torch.from_numpy(v), None,
                pde_cfg, time_history, num_steps=4,
                n_levels_used=None).numpy()
        ours = our_rollout.rollout2d(
            jax_step, jnp.asarray(np.transpose(u, (0, 1, 3, 4, 2))),
            jnp.asarray(np.transpose(v, (0, 1, 3, 4, 2))),
            time_history=time_history, num_steps=4)
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 1, 4, 2, 3)), ref_traj,
            rtol=1e-5, atol=1e-6)


def test_openai_timestep_embedding_matches_reference_execution():
    """timestep_embedding (torch_ddpm unet/layers.py:101) vs ours."""
    sys.path.insert(0, str(REF / "diff_mnist"))
    try:
        import torch_ddpm.ddpm.models.unet.layers as ref_layers
    finally:
        sys.path.pop(0)
    from unet_design_tpu.ops import embeddings

    t = np.array([0.0, 1.0, 17.5, 999.0], np.float32)
    for dim in (16, 32, 31):
        ref_emb = ref_layers.timestep_embedding(
            torch.from_numpy(t), dim).numpy()
        ours = embeddings.openai_timestep_embedding(jnp.asarray(t), dim)
        np.testing.assert_allclose(np.asarray(ours), ref_emb, rtol=1e-5,
                                   atol=1e-5, err_msg=f"dim {dim}")


def test_wmh_unetbase_g_full_forward_matches_reference_execution():
    """FULL wmh Unetbase_G forward parity (wmh/model.py:165-296) on a
    non-dyadic 104x104 grid — the odd 13->6 boundary at level 3 exercises the
    reference's replicate-pad special case, which our generic _match_spatial
    must reproduce exactly.  AvgPool down, interpolate_nearest up, sigmoid
    tail, parameters transplanted."""
    _stub_wavelets()
    ref_mod = _load("ref_wmh_model", REF / "wmh" / "model.py")
    from unet_design_tpu.models.unetbase import WMHSegUnet

    torch.manual_seed(2)
    ref = ref_mod.Unetbase_G(hidden_channels=4, activation="gelu")
    ref.eval()
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 2, 104, 104)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    ours = WMHSegUnet(hidden_channels=4, activation="gelu")
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    params = ours.init(jax.random.PRNGKey(0), x_nhwc)["params"]

    sd = ref.state_dict()
    core = {"image_proj_0": _convblock_from_torch(sd, "image_proj_list.0"),
            "final_3": _conv_from_torch(sd, "final_list.3.0")}
    for i in range(4):
        core[f"down_{i}"] = _convblock_from_torch(sd, f"down.{i}.conv")
        core[f"up_{i}"] = _convblock_from_torch(sd, f"up.{i}.conv")
        core[f"up_{i}_chconv"] = _conv_from_torch(
            sd, f"up.{i}.up_conv_channel_dim")
    new = {"core": core}
    jax.tree_util.tree_map(lambda a, b: None, params, new)  # same structure

    y = ours.apply({"params": new}, x_nhwc)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)),
                               ref_out, rtol=1e-4, atol=1e-5)


def _modern_resblock_from_torch(sd, prefix):
    out = {
        "GroupNorm_0": _gn_from_torch(sd, f"{prefix}.norm1"),
        "Conv_0": _conv_from_torch(sd, f"{prefix}.conv1"),
        "GroupNorm_1": _gn_from_torch(sd, f"{prefix}.norm2"),
        "Conv_1": _conv_from_torch(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.shortcut.weight" in sd:
        out["shortcut"] = _conv_from_torch(sd, f"{prefix}.shortcut")
    return out


def _c2ri(w):
    """Reference SpectralConv2d weights are already real-pair
    (in, out, m1, m2, 2) — same layout as ours (fourier.py:93-97)."""
    return jnp.asarray(w.numpy())


def _fourier_resblock_from_torch(sd, prefix):
    out = {
        "GroupNorm_0": _gn_from_torch(sd, f"{prefix}.norm1"),
        "GroupNorm_1": _gn_from_torch(sd, f"{prefix}.norm2"),
        "conv1": _conv_from_torch(sd, f"{prefix}.conv1"),
        "conv2": _conv_from_torch(sd, f"{prefix}.conv2"),
        "fourier1": {"weights1": _c2ri(sd[f"{prefix}.fourier1.weights1"]),
                     "weights2": _c2ri(sd[f"{prefix}.fourier1.weights2"])},
        "fourier2": {"weights1": _c2ri(sd[f"{prefix}.fourier2.weights1"]),
                     "weights2": _c2ri(sd[f"{prefix}.fourier2.weights2"])},
    }
    if f"{prefix}.shortcut.weight" in sd:
        out["shortcut"] = _conv_from_torch(sd, f"{prefix}.shortcut")
    return out


def _attn_from_torch(sd, prefix):
    """AttentionBlock: projection/output Linears (twod_unet.py:147-150);
    the constructed GroupNorm is never used in forward (:158-181)."""
    return {"Dense_0": {
                "kernel": jnp.asarray(sd[f"{prefix}.projection.weight"]
                                      .numpy().T),
                "bias": jnp.asarray(sd[f"{prefix}.projection.bias"].numpy())},
            "Dense_1": {
                "kernel": jnp.asarray(sd[f"{prefix}.output.weight"]
                                      .numpy().T),
                "bias": jnp.asarray(sd[f"{prefix}.output.bias"].numpy())}}


def _modern_unet_params_from_torch(ref, ch_mults, n_blocks, fourier_down=0,
                                   fourier_up=0,
                                   is_attn=None, mid_attn=False):
    """Map the reference modern-Unet flat ModuleLists onto our named tree."""
    is_attn = is_attn or (False,) * len(ch_mults)
    sd = ref.state_dict()
    new = {"image_proj": _conv_from_torch(sd, "image_proj"),
           "final": _conv_from_torch(sd, "final"),
           "GroupNorm_0": _gn_from_torch(sd, "norm"),
           "middle_res1": _modern_resblock_from_torch(sd, "middle.res1"),
           "middle_res2": _modern_resblock_from_torch(sd, "middle.res2")}
    if mid_attn:
        new["middle_attn"] = _attn_from_torch(sd, "middle.attn")
    n_res = len(ch_mults)
    idx = our = 0
    for lvl in range(n_res):
        for _ in range(n_blocks):
            if lvl < fourier_down:
                new[f"down_{our}"] = _fourier_resblock_from_torch(
                    sd, f"down.{idx}.res")
            else:
                new[f"down_{our}"] = _modern_resblock_from_torch(
                    sd, f"down.{idx}.res")
            if is_attn[lvl]:
                new[f"down_{our}_attn"] = _attn_from_torch(
                    sd, f"down.{idx}.attn")
            idx += 1
            our += 1
        if lvl < n_res - 1:
            new[f"downsample_{lvl}"] = _conv_from_torch(sd,
                                                        f"down.{idx}.conv")
            idx += 1
    idx = our = 0
    for lvl in reversed(range(n_res)):
        for j in range(n_blocks + 1):
            # AltFourierUnet: the n_blocks same-width up blocks are Fourier
            # for lvl < fourier_up levels; the channel-reducing final block
            # of each level stays a plain UpBlock (twod_unet.py:676)
            if j < n_blocks and lvl < fourier_up:
                new[f"up_{our}"] = _fourier_resblock_from_torch(
                    sd, f"up.{idx}.res")
            else:
                new[f"up_{our}"] = _modern_resblock_from_torch(
                    sd, f"up.{idx}.res")
            if is_attn[lvl]:
                new[f"up_{our}_attn"] = _attn_from_torch(
                    sd, f"up.{idx}.attn")
            idx += 1
            our += 1
        if lvl > 0:
            new[f"upsample_{lvl}"] = {"ConvTranspose_0": {
                "kernel": _t2f_tconv(sd[f"up.{idx}.conv.weight"]),
                "bias": jnp.asarray(sd[f"up.{idx}.conv.bias"].numpy())}}
            idx += 1
    return new


@pytest.mark.parametrize("n_fourier_layers,fourier_up",
                         [(0, False), (1, False), (1, True)])
def test_modern_unet_full_forward_matches_reference_execution(
        n_fourier_layers, fourier_up):
    """FULL modern Unet / FourierUnet forward parity (twod_unet.py:389-551,
    724-901): wide ResBlocks, strided-conv down, ConvTranspose(4,2,1) up,
    pre-norm final — and with n_fourier_layers=1, FourierResidualBlocks whose
    SpectralConv2d runs on our truncated-DFT matmul path against the
    reference's complex-einsum FFT implementation."""
    _stub_wavelets()
    sys.path.insert(0, str(REF / "pdearena"))
    try:
        import pdearena.modules.twod_unet as ref_mod
    finally:
        sys.path.pop(0)
    from unet_design_tpu.models.modern_unet import ModernUnet

    torch.manual_seed(3)
    ch_mults, n_blocks = (1, 2), 1
    kw = dict(time_history=2, time_future=1, hidden_channels=8,
              activation="gelu", norm=True, ch_mults=ch_mults,
              is_attn=(False, False), n_blocks=n_blocks)
    if fourier_up:
        ref = ref_mod.AltFourierUnet(1, 1, 1, 1, modes1=4, modes2=4,
                                     n_fourier_layers=1, mode_scaling=False,
                                     **kw)
    elif n_fourier_layers:
        ref = ref_mod.FourierUnet(1, 1, 1, 1, modes1=4, modes2=4,
                                  n_fourier_layers=1, mode_scaling=False,
                                  **kw)
    else:
        ref = ref_mod.Unet(1, 1, 1, 1, **kw)
    ref.eval()
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    ours = ModernUnet(n_output_fields=3, time_future=1, hidden_channels=8,
                      ch_mults=ch_mults, n_blocks=n_blocks, norm=True,
                      activation="gelu", n_fourier_layers=n_fourier_layers,
                      fourier_up=fourier_up,
                      modes1=4, modes2=4, mode_scaling=False)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    params = ours.init(jax.random.PRNGKey(0), x_nhwc)["params"]
    new = _modern_unet_params_from_torch(
        ref, ch_mults, n_blocks, fourier_down=n_fourier_layers,
        fourier_up=n_fourier_layers if fourier_up else 0)
    jax.tree_util.tree_map(lambda a, b: None, params, new)  # same structure

    y = ours.apply({"params": new}, x_nhwc)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 1, 4, 2, 3)),
                               ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("softmax_axis", ["queries", "keys"])
def test_modern_unet_attention_matches_reference_execution(softmax_axis):
    """Attention-model parity (the Unetmodattn/U-FNet2attn family): with
    ``attn_softmax_axis='queries'`` our AttentionBlock reproduces the
    reference's ``attn.softmax(dim=1)`` over queries (twod_unet.py:170)
    exactly, full-model transplant; with the default ``'keys'`` (standard
    attention) the outputs measurably differ — evidence that the deviation
    is real and the flag closes it."""
    _stub_wavelets()
    sys.path.insert(0, str(REF / "pdearena"))
    try:
        import pdearena.modules.twod_unet as ref_mod
    finally:
        sys.path.pop(0)
    from unet_design_tpu.models.modern_unet import ModernUnet

    torch.manual_seed(5)
    ch_mults, n_blocks, is_attn = (1, 2), 1, (True, False)
    ref = ref_mod.Unet(1, 1, 1, 1, time_history=2, time_future=1,
                       hidden_channels=8, activation="gelu",
                       norm=True, ch_mults=ch_mults, is_attn=is_attn,
                       mid_attn=True, n_blocks=n_blocks)
    ref.eval()
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    ours = ModernUnet(n_output_fields=3, time_future=1, hidden_channels=8,
                      ch_mults=ch_mults, n_blocks=n_blocks, norm=True,
                      activation="gelu", is_attn=is_attn, mid_attn=True,
                      attn_softmax_axis=softmax_axis)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    params = ours.init(jax.random.PRNGKey(0), x_nhwc)["params"]
    new = _modern_unet_params_from_torch(ref, ch_mults, n_blocks,
                                         is_attn=is_attn, mid_attn=True)
    jax.tree_util.tree_map(lambda a, b: None, params, new)  # same structure

    y = np.transpose(np.asarray(ours.apply({"params": new}, x_nhwc)),
                     (0, 1, 4, 2, 3))
    if softmax_axis == "queries":
        np.testing.assert_allclose(y, ref_out, rtol=1e-4, atol=1e-4)
    else:
        assert np.abs(y - ref_out).max() > 1e-3, (
            "keys-mode unexpectedly matches the reference: the softmax-axis "
            "deviation has disappeared")


@pytest.mark.parametrize("block", ["basic", "dilated", "fourier"])
def test_pde_resnet_full_forward_matches_reference_execution(block):
    """FULL ResNet trunk forward parity (twod_resnet.py:169-309) for all
    three block types — Basic, Dilated (1-2-4-8-4-2-1), and FourierBasic
    (spectral + 1x1, exercising the truncated-DFT path) — incl. the pad-9
    asymmetric trunk padding."""
    _stub_wavelets()
    sys.path.insert(0, str(REF / "pdearena"))
    try:
        import pdearena.modules.twod_resnet as ref_mod
    finally:
        sys.path.pop(0)
    from unet_design_tpu.models.resnet import PDEResNet

    torch.manual_seed(4)
    class _Fourier4(ref_mod.FourierBasicBlock):
        def __init__(self, in_planes, planes, stride=1, **kw):
            super().__init__(in_planes, planes, stride, modes1=4, modes2=4,
                             **kw)

    cls = {"basic": ref_mod.BasicBlock, "dilated": ref_mod.DilatedBasicBlock,
           "fourier": _Fourier4}[block]
    norm = block != "fourier"
    ref = ref_mod.ResNet(1, 1, 1, 1, block=cls, num_blocks=[1, 1],
                         time_history=2, time_future=1, hidden_channels=8,
                         activation="gelu", norm=norm)
    ref.eval()
    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, 2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    ours = PDEResNet(n_output_fields=3, time_future=1, hidden_channels=8,
                     block=block, num_blocks=[1, 1], activation="gelu",
                     norm=norm, modes1=4, modes2=4)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    params = ours.init(jax.random.PRNGKey(0), x_nhwc)["params"]

    sd = ref.state_dict()
    new = {f"conv_{w}": _conv_from_torch(sd, f"conv_{w}")
           for w in ("in1", "in2", "out1", "out2")}
    for i in range(2):
        pre = f"layers.{i}.0"
        if block == "basic":
            new[f"block_{i}"] = {
                "GroupNorm_0": _gn_from_torch(sd, f"{pre}.bn1"),
                "conv1": _conv_from_torch(sd, f"{pre}.conv1"),
                "GroupNorm_1": _gn_from_torch(sd, f"{pre}.bn2"),
                "conv2": _conv_from_torch(sd, f"{pre}.conv2"),
            }
        elif block == "dilated":
            new[f"block_{i}"] = {}
            for k in range(7):
                new[f"block_{i}"][f"conv_{k}"] = _conv_from_torch(
                    sd, f"{pre}.dilation_layers.{k}")
                new[f"block_{i}"][f"GroupNorm_{k}"] = _gn_from_torch(
                    sd, f"{pre}.norm_layers.{k}")
        else:
            new[f"block_{i}"] = {
                "fourier1": {
                    "weights1": _c2ri(sd[f"{pre}.fourier1.weights1"]),
                    "weights2": _c2ri(sd[f"{pre}.fourier1.weights2"])},
                "fourier2": {
                    "weights1": _c2ri(sd[f"{pre}.fourier2.weights1"]),
                    "weights2": _c2ri(sd[f"{pre}.fourier2.weights2"])},
                "conv1": _conv_from_torch(sd, f"{pre}.conv1"),
                "conv2": _conv_from_torch(sd, f"{pre}.conv2"),
            }
    jax.tree_util.tree_map(lambda a, b: None, params, new)  # same structure

    y = ours.apply({"params": new}, x_nhwc)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 1, 4, 2, 3)),
                               ref_out, rtol=1e-4, atol=1e-4)


def test_unet2015_full_forward_matches_reference_execution():
    """FULL Unet2015 forward parity (twod_unet2015.py:23-143): bias-free
    convs + BatchNorm blocks (running stats transplanted into batch_stats),
    MaxPool down, ConvTranspose(2,2) up."""
    _stub_wavelets()
    sys.path.insert(0, str(REF / "pdearena"))
    try:
        import pdearena.modules.twod_unet2015 as ref_mod
    finally:
        sys.path.pop(0)
    from unet_design_tpu.models.unet2015 import Unet2015

    torch.manual_seed(5)
    ref = ref_mod.Unet2015(1, 1, 1, 1, time_history=2, time_future=1,
                           hidden_channels=4, activation="gelu")
    # give the BN running stats non-trivial values
    gen = torch.Generator().manual_seed(12)
    with torch.no_grad():
        for name, b in ref.named_buffers():
            if "running_mean" in name:
                b.normal_(0.0, 0.5, generator=gen)
            elif "running_var" in name:
                b.uniform_(0.5, 2.0, generator=gen)
    ref.eval()
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x)).numpy()

    ours = Unet2015(n_output_fields=3, time_future=1, hidden_channels=4,
                    activation="gelu")
    x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    variables = ours.init(jax.random.PRNGKey(0), x_nhwc)

    sd = {**ref.state_dict()}
    names = {"encoder1": "enc1", "encoder2": "enc2", "encoder3": "enc3",
             "encoder4": "enc4", "bottleneck": "bottleneck",
             "decoder4": "dec4", "decoder3": "dec3", "decoder2": "dec2",
             "decoder1": "dec1"}
    params = {"conv": _conv_from_torch(sd, "conv")}
    stats = {}
    for mod, short in names.items():
        params[mod] = {}
        stats[mod] = {}
        for k in (1, 2):
            params[mod][f"conv{k}"] = {
                "kernel": _t2f_conv(sd[f"{mod}.{short}conv{k}.weight"])}
            params[mod][f"norm{k}"] = {
                "scale": jnp.asarray(sd[f"{mod}.{short}norm{k}.weight"]
                                     .numpy()),
                "bias": jnp.asarray(sd[f"{mod}.{short}norm{k}.bias"]
                                    .numpy())}
            stats[mod][f"norm{k}"] = {
                "mean": jnp.asarray(sd[f"{mod}.{short}norm{k}.running_mean"]
                                    .numpy()),
                "var": jnp.asarray(sd[f"{mod}.{short}norm{k}.running_var"]
                                   .numpy())}
    for k in (1, 2, 3, 4):
        params[f"upconv{k}"] = {"ConvTranspose_0": {
            "kernel": _t2f_tconv(sd[f"upconv{k}.weight"]),
            "bias": jnp.asarray(sd[f"upconv{k}.bias"].numpy())}}
    jax.tree_util.tree_map(lambda a, b: None, variables["params"], params)
    jax.tree_util.tree_map(lambda a, b: None, variables["batch_stats"],
                           stats)

    y = ours.apply({"params": params, "batch_stats": stats}, x_nhwc)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 1, 4, 2, 3)),
                               ref_out, rtol=1e-4, atol=1e-4)


def _openai_resblock_from_torch(sd, prefix):
    out = {
        "GroupNorm_0": _gn_from_torch(sd, f"{prefix}.in_layers.0"),
        "Conv_0": _conv_from_torch(sd, f"{prefix}.in_layers.2"),
        "emb_proj": {"kernel": _t2f_lin(sd[f"{prefix}.emb_layers.1.weight"]),
                     "bias": jnp.asarray(
                         sd[f"{prefix}.emb_layers.1.bias"].numpy())},
        "GroupNorm_1": _gn_from_torch(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv_from_torch(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        out["skip"] = _conv_from_torch(sd, f"{prefix}.skip_connection")
    return out


def _openai_attn_from_torch(sd, prefix):
    def lin1d(name):
        w = sd[f"{prefix}.{name}.weight"].numpy()  # conv1d (O, I, 1)
        return {"kernel": jnp.asarray(w[:, :, 0].T),
                "bias": jnp.asarray(sd[f"{prefix}.{name}.bias"].numpy())}
    return {"GroupNorm_0": _gn_from_torch(sd, f"{prefix}.norm"),
            "qkv": lin1d("qkv"), "proj_out": lin1d("proj_out")}


def test_openai_unetmodel_full_forward_matches_reference_execution():
    """FULL OpenAI-style UNetModel forward parity (torch_ddpm unet/unet.py):
    scale-shift-capable ResBlocks, QKV attention (1/sqrt(sqrt(d)) double
    scaling), nearest-upsample+conv, strided-conv downsample, GN32."""
    sys.path.insert(0, str(REF / "diff_mnist"))
    try:
        import torch_ddpm.ddpm.models.unet.unet as ref_mod
    finally:
        sys.path.pop(0)
    from unet_design_tpu.models.openai_unet import UNetModel

    torch.manual_seed(6)
    ref = ref_mod.UNetModel(
        in_channels=3, model_channels=32, out_channels=3, num_res_blocks=1,
        attention_resolutions=(2,), dropout=0.0, channel_mult=(1, 2),
        num_heads=4, use_scale_shift_norm=True)
    # re-randomize at O(1): zero_module() zeroes every out_conv/proj_out
    gen = torch.Generator().manual_seed(13)
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0.0, 0.1, generator=gen)
    ref.eval()
    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.array([3.0, 7.0], np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    ours = UNetModel(in_channels=3, model_channels=32, out_channels=3,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_heads=4, dropout=0.0)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    tj = jnp.asarray(t)
    params = ours.init(jax.random.PRNGKey(0), x_nhwc, tj)["params"]

    sd = ref.state_dict()
    new = {
        "Dense_0": {"kernel": _t2f_lin(sd["time_embed.0.weight"]),
                    "bias": jnp.asarray(sd["time_embed.0.bias"].numpy())},
        "Dense_1": {"kernel": _t2f_lin(sd["time_embed.2.weight"]),
                    "bias": jnp.asarray(sd["time_embed.2.bias"].numpy())},
        "in_conv": _conv_from_torch(sd, "input_blocks.0.0"),
        "enc_0": _openai_resblock_from_torch(sd, "input_blocks.1.0"),
        "down_0": {"Conv_0": _conv_from_torch(sd, "input_blocks.2.0.op")},
        "enc_1": _openai_resblock_from_torch(sd, "input_blocks.3.0"),
        "enc_1_attn": _openai_attn_from_torch(sd, "input_blocks.3.1"),
        "mid_0": _openai_resblock_from_torch(sd, "middle_block.0"),
        "mid_attn": _openai_attn_from_torch(sd, "middle_block.1"),
        "mid_1": _openai_resblock_from_torch(sd, "middle_block.2"),
        "dec_0": _openai_resblock_from_torch(sd, "output_blocks.0.0"),
        "dec_0_attn": _openai_attn_from_torch(sd, "output_blocks.0.1"),
        "dec_1": _openai_resblock_from_torch(sd, "output_blocks.1.0"),
        "dec_1_attn": _openai_attn_from_torch(sd, "output_blocks.1.1"),
        "up_1": {"Conv_0": _conv_from_torch(sd, "output_blocks.1.2.conv")},
        "dec_2": _openai_resblock_from_torch(sd, "output_blocks.2.0"),
        # output_blocks.3 exists in the fork's state dict but its forward
        # never executes it (unet.py:242-246 truncation) -- no counterpart
        "GroupNorm_0": _gn_from_torch(sd, "out.0"),
        "out_conv": _conv_from_torch(sd, "out_reduce_channels"),
    }
    jax.tree_util.tree_map(lambda a, b: None, params, new)  # same structure

    y = ours.apply({"params": new}, x_nhwc, tj)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)),
                               ref_out, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("multi_res_loss", [False, True])
def test_unet_wavelet_full_forward_matches_reference_execution(
        multi_res_loss):
    """FULL diff_mnist UNet_wavelet forward parity (mnist_diff/unet.py:75-556)
    with transplanted parameters: per-level time embeddings, channel-tiling
    head, per-level out_activation/out_reduce heads, the forced
    model_out_passed_on channel re-injection (unet.py:457,484-510), and
    multi-res output lists."""
    _stub_wavelets()
    if "wandb" not in sys.modules:
        sys.modules["wandb"] = types.ModuleType("wandb")
    sys.path.insert(0, str(REF / "diff_mnist"))
    try:
        import mnist_diff.unet as ref_mod
    finally:
        sys.path.pop(0)
    from unet_design_tpu.models.openai_unet import WaveletUNetOpenAI

    torch.manual_seed(7)
    ref = ref_mod.UNet_wavelet(
        in_channels=1, model_channels=16, out_channels=1, num_res_blocks=1,
        attention_resolutions=(2,), dropout=0.0, channel_mult=(2, 2),
        num_heads=4, use_scale_shift_norm=True, multi_res_loss=multi_res_loss)
    gen = torch.Generator().manual_seed(14)
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0.0, 0.1, generator=gen)
    ref.eval()
    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    t = np.array([0.3, 0.7], np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x), torch.from_numpy(t))

    ours = WaveletUNetOpenAI(
        in_channels=1, model_channels=16, out_channels=1, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(2, 2), num_heads=4,
        dropout=0.0, multi_res_loss=multi_res_loss)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    tj = jnp.asarray(t)
    params = ours.init(jax.random.PRNGKey(0), x_nhwc, tj)["params"]

    sd = ref.state_dict()
    new = {}
    for lvl in range(2):
        new[f"time_embed_{lvl}"] = {
            "Dense_0": {"kernel": _t2f_lin(sd[f"time_embed_list.{lvl}.0.weight"]),
                        "bias": jnp.asarray(
                            sd[f"time_embed_list.{lvl}.0.bias"].numpy())},
            "Dense_1": {"kernel": _t2f_lin(sd[f"time_embed_list.{lvl}.2.weight"]),
                        "bias": jnp.asarray(
                            sd[f"time_embed_list.{lvl}.2.bias"].numpy())}}
        new[f"out_act_{lvl}"] = {
            "GroupNorm_0": _gn_from_torch(sd, f"out_activation_list.{lvl}.0")}
        new[f"out_reduce_{lvl}"] = _conv_from_torch(
            sd, f"out_reduce_channels_list.{lvl}")
    new["enc_0_0"] = _openai_resblock_from_torch(sd, "input_blocks.1.0")
    new["enc_0_down"] = {"Conv_0": _conv_from_torch(sd, "input_blocks.2.0.op")}
    new["enc_1_0"] = _openai_resblock_from_torch(sd, "input_blocks.3.0")
    new["enc_1_0_attn"] = _openai_attn_from_torch(sd, "input_blocks.3.1")
    new["middle_0"] = _openai_resblock_from_torch(sd, "middle_block.0")
    new["middle_attn"] = _openai_attn_from_torch(sd, "middle_block.1")
    new["middle_1"] = _openai_resblock_from_torch(sd, "middle_block.2")
    for j in range(2):
        new[f"dec_1_{j}"] = _openai_resblock_from_torch(sd, f"out_f_list.1.{j}.0")
        new[f"dec_1_{j}_attn"] = _openai_attn_from_torch(sd, f"out_f_list.1.{j}.1")
        new[f"dec_0_{j}"] = _openai_resblock_from_torch(sd, f"out_f_list.0.{j}.0")
    new["dec_1_up"] = {"Conv_0": _conv_from_torch(
        sd, "out_upsample_list.1.0.0.conv")}
    jax.tree_util.tree_map(lambda a, b: None, params, new)  # same structure

    y = ours.apply({"params": new}, x_nhwc, tj)
    if multi_res_loss:
        assert isinstance(y, (list, tuple)) and len(y) == len(ref_out)
        for yo, ro in zip(y, ref_out):
            np.testing.assert_allclose(
                np.transpose(np.asarray(yo), (0, 3, 1, 2)), ro.numpy(),
                rtol=1e-4, atol=1e-4)
    else:
        np.testing.assert_allclose(
            np.transpose(np.asarray(y), (0, 3, 1, 2)), ref_out.numpy(),
            rtol=1e-4, atol=1e-4)


def test_cond_fourier_embedding_matches_reference_execution():
    """fourier_embedding (condition_utils.py:17-36): cos-then-sin order,
    half=dim//2 frequencies, odd-dim zero padding."""
    ref_mod = _load("ref_condition_utils",
                    REF / "pdearena" / "pdearena" / "modules" / "conditioned"
                    / "condition_utils.py")
    from unet_design_tpu.ops import embeddings

    t = np.array([0.0, 1.0, 2.5, 100.0], np.float32)
    for dim in (16, 31):
        ref = ref_mod.fourier_embedding(torch.from_numpy(t), dim).numpy()
        ours = embeddings.fourier_embedding(jnp.asarray(t), dim)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5,
                                   atol=1e-6, err_msg=f"dim {dim}")


def test_cond_spectral_conv2d_matches_reference_execution():
    """Conditioned SpectralConv2d (fourier_cond.py:13-80) with transplanted
    FreqLinear + mode weights — per-mode complex scaling of the truncated
    spectrum, on our truncated-DFT matmul path."""
    ref_mod = _load("ref_fourier_cond",
                    REF / "pdearena" / "pdearena" / "modules" / "conditioned"
                    / "fourier_cond.py")
    from unet_design_tpu.ops import spectral

    torch.manual_seed(8)
    m1 = m2 = 4
    ref = ref_mod.SpectralConv2d(5, 3, cond_channels=6, modes1=m1, modes2=m2)
    ref.eval()
    rng = np.random.default_rng(14)
    x = rng.standard_normal((2, 5, 16, 16)).astype(np.float32)
    emb = rng.standard_normal((2, 6)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(emb)).numpy()

    ours = spectral.CondSpectralConv2d(out_channels=3, modes1=m1, modes2=m2)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    ej = jnp.asarray(emb)
    params = ours.init(jax.random.PRNGKey(0), x_nhwc, ej)["params"]
    sd = ref.state_dict()
    new = {"weights1": _c2ri(sd["weights1"]),
           "weights2": _c2ri(sd["weights2"]),
           "freq_weights": jnp.asarray(sd["cond_emb.weights"].numpy()),
           "freq_bias": jnp.asarray(sd["cond_emb.bias"].numpy()[0])}
    jax.tree_util.tree_map(lambda a, b: None, params, new)  # same structure
    y = ours.apply({"params": new}, x_nhwc, ej)
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 3, 1, 2)),
                               ref_out, rtol=1e-4, atol=1e-5)


def _cond_resblock_from_torch(sd, prefix):
    out = {
        "GroupNorm_0": _gn_from_torch(sd, f"{prefix}.norm1"),
        "GroupNorm_1": _gn_from_torch(sd, f"{prefix}.norm2"),
        "conv1": _conv_from_torch(sd, f"{prefix}.conv1"),
        "conv2": _conv_from_torch(sd, f"{prefix}.conv2"),
        "cond_emb": {"kernel": _t2f_lin(sd[f"{prefix}.cond_emb.weight"]),
                     "bias": jnp.asarray(
                         sd[f"{prefix}.cond_emb.bias"].numpy())},
    }
    if f"{prefix}.shortcut.weight" in sd:
        out["shortcut"] = _conv_from_torch(sd, f"{prefix}.shortcut")
    return out


@pytest.mark.parametrize("use_scale_shift_norm", [False, True])
def test_cond_modern_unet_full_forward_matches_reference_execution(
        use_scale_shift_norm):
    """FULL conditioned modern Unet forward parity
    (conditioned/twod_unet.py:488-705): fourier time + scalar-param
    embeddings, additive or adaGN (scale-shift) conditioning in every wide
    ResBlock, transplanted parameters."""
    _stub_wavelets()
    sys.path.insert(0, str(REF / "pdearena"))
    try:
        import pdearena.modules.conditioned.twod_unet as ref_mod
    finally:
        sys.path.pop(0)
    from unet_design_tpu.models.conditioned.modern_unet import CondModernUnet

    torch.manual_seed(9)
    ch_mults, n_blocks = (1, 2), 1
    ref = ref_mod.Unet(1, 1, 1, 1, time_history=1, time_future=1,
                       hidden_channels=8, activation="gelu", norm=True,
                       ch_mults=ch_mults, is_attn=(False, False),
                       n_blocks=n_blocks, param_conditioning="scalar",
                       use_scale_shift_norm=use_scale_shift_norm)
    # re-randomize at O(1): zero_module() zeroes conv2/final
    gen = torch.Generator().manual_seed(15)
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0.0, 0.1, generator=gen)
    ref.eval()
    rng = np.random.default_rng(15)
    x = rng.standard_normal((2, 1, 3, 16, 16)).astype(np.float32)
    t = np.array([2.0, 5.0], np.float32)
    z = np.array([0.5, 1.5], np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t),
                      torch.from_numpy(z)).numpy()

    ours = CondModernUnet(n_output_fields=3, time_future=1,
                          hidden_channels=8, ch_mults=ch_mults,
                          n_blocks=n_blocks, norm=True, activation="gelu",
                          param_conditioning="scalar",
                          use_scale_shift_norm=use_scale_shift_norm)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    params = ours.init(jax.random.PRNGKey(0), x_nhwc, jnp.asarray(t),
                       jnp.asarray(z))["params"]

    sd = ref.state_dict()
    new = {"image_proj": _conv_from_torch(sd, "image_proj"),
           "final": _conv_from_torch(sd, "final"),
           "GroupNorm_0": _gn_from_torch(sd, "norm"),
           "middle_res1": _cond_resblock_from_torch(sd, "middle.res1"),
           "middle_res2": _cond_resblock_from_torch(sd, "middle.res2")}
    for which, ref_name in [("time_embed", "time_embed"),
                            ("pde_emb", "pde_emb")]:
        for j, ref_idx in [(1, 0), (2, 2)]:
            new[f"{which}_{j}"] = {
                "kernel": _t2f_lin(sd[f"{ref_name}.{ref_idx}.weight"]),
                "bias": jnp.asarray(
                    sd[f"{ref_name}.{ref_idx}.bias"].numpy())}
    n_res = len(ch_mults)
    idx = our = 0
    for lvl in range(n_res):
        for _ in range(n_blocks):
            new[f"down_{our}"] = _cond_resblock_from_torch(sd,
                                                           f"down.{idx}.res")
            idx += 1
            our += 1
        if lvl < n_res - 1:
            new[f"downsample_{lvl}"] = _conv_from_torch(sd,
                                                        f"down.{idx}.conv")
            idx += 1
    idx = our = 0
    for lvl in reversed(range(n_res)):
        for _ in range(n_blocks + 1):
            new[f"up_{our}"] = _cond_resblock_from_torch(sd, f"up.{idx}.res")
            idx += 1
            our += 1
        if lvl > 0:
            new[f"upsample_{lvl}"] = {"ConvTranspose_0": {
                "kernel": _t2f_tconv(sd[f"up.{idx}.conv.weight"]),
                "bias": jnp.asarray(sd[f"up.{idx}.conv.bias"].numpy())}}
            idx += 1
    jax.tree_util.tree_map(lambda a, b: None, params, new)  # same structure

    y = ours.apply({"params": new}, x_nhwc, jnp.asarray(t), jnp.asarray(z))
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 1, 4, 2, 3)),
                               ref_out, rtol=1e-4, atol=1e-4)


def test_wmh_metrics_match_reference_math():
    """WMH challenge metrics vs the reference formulas (evaluation.py:191-284)
    re-expressed with scipy in place of SimpleITK: scipy dice complement,
    fully-connected components for lesion recall/precision/F1, volume-sum
    AVD.  Random 3D masks, seeds chosen so both masks have lesions."""
    import scipy.ndimage
    import scipy.spatial.distance
    from unet_design_tpu.evalx import wmh_metrics

    rng = np.random.default_rng(16)
    test = rng.random((4, 20, 20)) > 0.8
    result = rng.random((4, 20, 20)) > 0.8

    ref_dsc = 1.0 - scipy.spatial.distance.dice(test.flatten(),
                                                result.flatten())
    np.testing.assert_allclose(wmh_metrics.dsc(test, result), ref_dsc,
                               rtol=1e-10)

    # ccFilter.SetFullyConnected(True) == 3x3x3 structuring element
    struct = np.ones((3, 3, 3), bool)
    cc_test, n_test = scipy.ndimage.label(test, structure=struct)
    cc_result, n_result = scipy.ndimage.label(result, structure=struct)
    l_result = cc_test * result
    n_detected = len(np.unique(l_result)) - 1
    ref_recall = n_detected / n_test
    ref_precision = n_detected / n_result
    ref_f1 = 2 * ref_precision * ref_recall / (ref_precision + ref_recall)
    recall, precision, f1 = wmh_metrics.lesion_detection(test, result)
    np.testing.assert_allclose([recall, precision, f1],
                               [ref_recall, ref_precision, ref_f1],
                               rtol=1e-10)

    ref_avd = abs(float(test.sum()) - float(result.sum())) \
        / float(test.sum()) * 100.0
    np.testing.assert_allclose(wmh_metrics.avd(test, result), ref_avd,
                               rtol=1e-10)


def test_unetbase_gradients_match_reference_execution():
    """FULL backward-pass parity: transplant reference Unetbase parameters,
    compute an identical MSE loss on identical inputs, and compare every
    parameter gradient between torch autograd and jax.grad."""
    _stub_wavelets()
    sys.path.insert(0, str(REF / "pdearena"))
    try:
        import pdearena.modules.twod_unetbase as ref_mod
    finally:
        sys.path.pop(0)
    from unet_design_tpu.models import unetbase

    torch.manual_seed(10)
    ref = ref_mod.Unetbase(1, 1, 1, 1, time_history=2, time_future=1,
                           hidden_channels=8, activation="gelu")
    ref.train()
    rng = np.random.default_rng(17)
    x = rng.standard_normal((2, 2, 3, 16, 16)).astype(np.float32)
    y = rng.standard_normal((2, 1, 3, 16, 16)).astype(np.float32)
    xt = torch.from_numpy(x)
    loss_t = ((ref(xt) - torch.from_numpy(y)) ** 2).mean()
    loss_t.backward()

    ours = unetbase.Unetbase(n_output_fields=3, time_future=1,
                             hidden_channels=8, activation="gelu")
    x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    y_nhwc = jnp.asarray(np.transpose(y, (0, 1, 3, 4, 2)))
    sd = ref.state_dict()
    params = {"image_proj": _convblock_from_torch(sd, "image_proj"),
              "final": {"kernel": _t2f_conv(sd["final.weight"]),
                        "bias": jnp.asarray(sd["final.bias"].numpy())}}
    for i in range(4):
        params[f"down_{i}"] = _convblock_from_torch(sd, f"down.{i}.conv")
        params[f"up_{i}"] = _convblock_from_torch(sd, f"up.{i}.conv")
        params[f"up_{i}_tconv"] = {"ConvTranspose_0": {
            "kernel": _t2f_tconv(sd[f"up.{i}.up.weight"]),
            "bias": jnp.asarray(sd[f"up.{i}.up.bias"].numpy())}}

    def loss_fn(p):
        pred = ours.apply({"params": p}, x_nhwc)
        return jnp.mean((pred - y_nhwc) ** 2)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-5)

    def check(ours_g, ref_name, conv=False, tconv=False):
        g = ref.get_parameter(ref_name).grad.numpy()
        if conv:
            g = np.transpose(g, (2, 3, 1, 0))
        if tconv:
            g = np.transpose(g[:, :, ::-1, ::-1], (2, 3, 0, 1))
        np.testing.assert_allclose(np.asarray(ours_g), g, rtol=1e-3,
                                   atol=1e-5, err_msg=ref_name)

    check(grads["final"]["kernel"], "final.weight", conv=True)
    check(grads["image_proj"]["Conv_0"]["kernel"], "image_proj.conv1.weight",
          conv=True)
    check(grads["image_proj"]["GroupNorm_0"]["GroupNorm_0"]["scale"],
          "image_proj.norm1.weight")
    for i in range(4):
        check(grads[f"down_{i}"]["Conv_0"]["kernel"],
              f"down.{i}.conv.conv1.weight", conv=True)
        check(grads[f"down_{i}"]["Conv_1"]["bias"],
              f"down.{i}.conv.conv2.bias")
        check(grads[f"up_{i}"]["Conv_0"]["kernel"],
              f"up.{i}.conv.conv1.weight", conv=True)
        check(grads[f"up_{i}_tconv"]["ConvTranspose_0"]["kernel"],
              f"up.{i}.up.weight", tconv=True)


def test_optimizer_chain_matches_torch_execution():
    """Our optax chain (clip-by-global-norm -> Adam with warmup schedule)
    vs torch Adam + clip_grad_norm_ + warmup LambdaLR, stepped identically
    for 6 steps on fixed synthetic gradients — the exact diff_cifar recipe
    (main.py:374-377,425-428: clip 1.0, warmup lambda min(step,w)/w, with
    scheduler.step() after optimizer.step())."""
    from unet_design_tpu.train import schedules, trainer as trainer_lib

    rng = np.random.default_rng(18)
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) * (2.0 + i)
             for i in range(6)]
    base_lr, warmup, clip = 2e-4, 3, 1.0

    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([pt], lr=base_lr)
    sched_t = torch.optim.lr_scheduler.LambdaLR(
        opt, lr_lambda=lambda step: min(step, warmup) / warmup)
    for g in grads:
        opt.zero_grad()
        pt.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([pt], max_norm=clip)
        opt.step()
        sched_t.step()

    tx = trainer_lib.make_optimizer(
        schedules.warmup_lr(base_lr, warmup), grad_clip=clip)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax_apply(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               pt.detach().numpy(), rtol=1e-5, atol=1e-7)


def optax_apply(params, updates):
    import optax
    return optax.apply_updates(params, updates)


def test_ema_matches_reference_execution():
    """EMA update parity (diff_cifar/main.py:57-77): frozen params (grad is
    None in torch; mask=False here) are skipped, others blend at decay."""
    from unet_design_tpu.train import ema as ema_lib

    rng = np.random.default_rng(19)
    src = torch.nn.ParameterDict({
        "a": torch.nn.Parameter(torch.from_numpy(
            rng.standard_normal((3, 3)).astype(np.float32))),
        "b": torch.nn.Parameter(torch.from_numpy(
            rng.standard_normal((4,)).astype(np.float32)))})
    tgt = torch.nn.ParameterDict({
        k: torch.nn.Parameter(v.detach().clone() + 1.0)
        for k, v in src.items()})
    src["a"].grad = torch.ones_like(src["a"])  # 'a' trainable, 'b' frozen
    decay = 0.9

    for (ps, pt) in zip(src.values(), tgt.values()):
        if ps.grad is not None:
            pt.data.copy_(pt.data * decay + ps.data * (1 - decay))

    ema0 = {"a": jnp.asarray(src["a"].detach().numpy()) + 1.0,
            "b": jnp.asarray(src["b"].detach().numpy()) + 1.0}
    new = {k: jnp.asarray(v.detach().numpy()) for k, v in src.items()}
    mask = {"a": True, "b": False}
    out = ema_lib.ema_update(ema0, new, decay, trainable_mask=mask)
    np.testing.assert_allclose(np.asarray(out["a"]),
                               tgt["a"].detach().numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]),
                               tgt["b"].detach().numpy(), rtol=1e-6)


def test_cond_pde_resnet_full_forward_matches_reference_execution():
    """FULL conditioned FNO-ResNet forward parity
    (conditioned/twod_resnet.py:15-210): conditioned spectral convs with
    FreqLinear per-mode scaling plus the per-block additive cond_emb, fourier
    time/param trunk embeddings, pad-9 trunk."""
    _stub_wavelets()
    sys.path.insert(0, str(REF / "pdearena"))
    try:
        import pdearena.modules.conditioned.twod_resnet as ref_mod
    finally:
        sys.path.pop(0)
    from unet_design_tpu.models.conditioned.resnet import CondPDEResNet

    torch.manual_seed(11)

    class _F4(ref_mod.FourierBasicBlock):
        def __init__(self, in_planes, planes, cond_channels, stride=1, **kw):
            super().__init__(in_planes, planes, cond_channels, stride,
                             modes1=4, modes2=4, **kw)

    ref = ref_mod.ResNet(1, 1, 1, 1, block=_F4, num_blocks=[1, 1],
                         time_history=1, time_future=1, hidden_channels=8,
                         activation="gelu", norm=False,
                         param_conditioning="scalar")
    ref.eval()
    rng = np.random.default_rng(20)
    x = rng.standard_normal((2, 1, 3, 16, 16)).astype(np.float32)
    t = np.array([1.0, 4.0], np.float32)
    z = np.array([0.3, 0.9], np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t),
                      torch.from_numpy(z)).numpy()

    ours = CondPDEResNet(n_output_fields=3, time_future=1,
                         hidden_channels=8, num_blocks=[1, 1], modes1=4,
                         modes2=4, param_conditioning="scalar")
    x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    params = ours.init(jax.random.PRNGKey(0), x_nhwc, jnp.asarray(t),
                       jnp.asarray(z))["params"]

    sd = ref.state_dict()
    new = {f"conv_{w}": _conv_from_torch(sd, f"conv_{w}")
           for w in ("in1", "in2", "out1", "out2")}
    for which in ("time_embed", "pde_emb"):
        for j, ref_idx in [(1, 0), (2, 2)]:
            new[f"{which}_{j}"] = {
                "kernel": _t2f_lin(sd[f"{which}.{ref_idx}.weight"]),
                "bias": jnp.asarray(sd[f"{which}.{ref_idx}.bias"].numpy())}
    for i in range(2):
        pre = f"layers.{i}.0"
        new[f"block_{i}"] = {
            "conv1": _conv_from_torch(sd, f"{pre}.conv1"),
            "conv2": _conv_from_torch(sd, f"{pre}.conv2"),
            "cond_emb": {"kernel": _t2f_lin(sd[f"{pre}.cond_emb.weight"]),
                         "bias": jnp.asarray(
                             sd[f"{pre}.cond_emb.bias"].numpy())},
        }
        for f in ("fourier1", "fourier2"):
            new[f"block_{i}"][f] = {
                "weights1": _c2ri(sd[f"{pre}.{f}.weights1"]),
                "weights2": _c2ri(sd[f"{pre}.{f}.weights2"]),
                "freq_weights": jnp.asarray(
                    sd[f"{pre}.{f}.cond_emb.weights"].numpy()),
                "freq_bias": jnp.asarray(
                    sd[f"{pre}.{f}.cond_emb.bias"].numpy()[0]),
            }
    jax.tree_util.tree_map(lambda a, b: None, params, new)  # same structure

    y = ours.apply({"params": new}, x_nhwc, jnp.asarray(t), jnp.asarray(z))
    np.testing.assert_allclose(np.transpose(np.asarray(y), (0, 1, 4, 2, 3)),
                               ref_out, rtol=1e-4, atol=1e-4)


def test_registry_param_counts_match_reference_execution():
    """Parameter-count parity: construct reference classes with the registry
    init_args (registry.py:11-351) at the benchmark protocol
    (time_history=4, 1 scalar + 1 vector component) and compare total
    parameter counts with our registry models."""
    _stub_wavelets()
    sys.path.insert(0, str(REF / "pdearena"))
    try:
        import pdearena.modules.twod_resnet as ref_resnet
        import pdearena.modules.twod_unet as ref_unet
        import pdearena.modules.twod_unet2015 as ref_2015
        import pdearena.modules.twod_unetbase as ref_base
    finally:
        sys.path.pop(0)
    import jax as _jax
    from unet_design_tpu.models import registry as our_registry

    common = dict(n_input_scalar_components=1, n_input_vector_components=1,
                  n_output_scalar_components=1, n_output_vector_components=1,
                  time_history=4, time_future=1)

    class _F8(ref_resnet.FourierBasicBlock):
        def __init__(self, in_planes, planes, stride=1, **kw):
            super().__init__(in_planes, planes, stride, modes1=8, modes2=8,
                             **kw)

    cases = {
        "Unetbase-64": ref_base.Unetbase(hidden_channels=64,
                                         activation="gelu", **common),
        "Unet2015-64": ref_2015.Unet2015(hidden_channels=64,
                                         activation="gelu", **common),
        "Unetmod-64": ref_unet.Unet(hidden_channels=64, activation="gelu",
                                    norm=True, **common),
        "U-FNet2-16m": ref_unet.FourierUnet(hidden_channels=64,
                                            activation="gelu", modes1=16,
                                            modes2=16, norm=True,
                                            n_fourier_layers=2, **common),
        "FNO-128-8m": ref_resnet.ResNet(block=_F8, num_blocks=[1, 1, 1, 1],
                                        hidden_channels=128,
                                        activation="gelu", norm=False,
                                        **common),
    }
    for name, ref in cases.items():
        ref_count = sum(p.numel() for p in ref.parameters())
        model = our_registry.build_model(name, n_scalar_components=1,
                                         n_vector_components=1,
                                         time_history=4, time_future=1,
                                         activation="gelu")
        x = jnp.zeros((1, 4, 64, 64, 3))
        params = model.init(_jax.random.PRNGKey(0), x)["params"]
        ours_count = sum(int(np.prod(v.shape))
                         for v in jax.tree_util.tree_leaves(params))
        assert ours_count == ref_count, (name, ours_count, ref_count)


@pytest.mark.parametrize("up_fct", ["interpolate_nearest", "conv"])
def test_pdearena_unetbase_g_full_forward_matches_reference_execution(up_fct):
    """FULL pdearena Unetbase_G forward parity (twod_unetbase.py:254-416)
    with multi-res outputs and n_extra_resnet_layers=1 — covers
    PartialResnetConvBlock heads, AvgPool Down_G, interpolate_nearest Up_G
    with channel conv, FullResnetConvBlock extra decoder layers, and
    per-level final heads.  This is the NS-2D headline model family."""
    _stub_wavelets()
    sys.path.insert(0, str(REF / "pdearena"))
    try:
        import pdearena.modules.twod_unetbase as ref_mod
    finally:
        sys.path.pop(0)
    from unet_design_tpu.models.unetbase import UnetbaseG

    torch.manual_seed(12)
    ref = ref_mod.Unetbase_G(1, 1, 1, 1, time_history=2, time_future=1,
                             hidden_channels=4, activation="gelu",
                             multi_res_loss=True, n_extra_resnet_layers=1,
                             up_fct=up_fct)
    ref.eval()
    rng = np.random.default_rng(21)
    x = rng.standard_normal((2, 2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))

    ours = UnetbaseG(n_output_fields=3, time_future=1, hidden_channels=4,
                     activation="gelu", multi_res_loss=True,
                     n_extra_resnet_layers=1, up_fct=up_fct)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    params = ours.init(jax.random.PRNGKey(0), x_nhwc)["params"]

    sd = ref.state_dict()
    core = {}
    for j in range(4):
        core[f"image_proj_{j}"] = _convblock_from_torch(
            sd, f"image_proj_list.{j}")
        core[f"down_{j}"] = _convblock_from_torch(sd, f"down.{j}.conv")
        core[f"up_{j}"] = _convblock_from_torch(sd, f"up.{j}.conv")
        if up_fct == "conv":
            core[f"up_{j}_tconv"] = {"ConvTranspose_0": {
                "kernel": _t2f_tconv(sd[f"up.{j}.up.weight"]),
                "bias": jnp.asarray(sd[f"up.{j}.up.bias"].numpy())}}
        else:
            core[f"up_{j}_chconv"] = _conv_from_torch(
                sd, f"up.{j}.up_conv_channel_dim")
        core[f"up_{j}_extra_0"] = {"ConvBlock_0": _convblock_from_torch(
            sd, f"up.{j}.resnet_list.0")}
        core[f"final_{j}"] = _conv_from_torch(sd, f"final_list.{j}")
    new = {"core": core}
    jax.tree_util.tree_map(lambda a, b: None, params, new)  # same structure

    y = ours.apply({"params": new}, x_nhwc)
    assert isinstance(y, (list, tuple)) and len(y) == len(ref_out)
    for yo, ro in zip(y, ref_out):
        np.testing.assert_allclose(
            np.transpose(np.asarray(yo), (0, 1, 4, 2, 3)), ro.numpy(),
            rtol=1e-4, atol=1e-4)


def test_score_network_matches_reference_execution():
    """MLP ScoreNetwork forward parity (mnist_diff/layers.py:14-67):
    fairseq-style timestep embedding (half-1 denominator, sin-then-cos),
    LeakyReLU x/t encoder MLPs, concat, decoder MLP — on both vector and
    image inputs (transplanted parameters)."""
    _stub_wavelets()
    if "wandb" not in sys.modules:
        sys.modules["wandb"] = types.ModuleType("wandb")
    sys.path.insert(0, str(REF / "diff_mnist"))
    try:
        import mnist_diff.layers as ref_layers
    finally:
        sys.path.pop(0)
    from unet_design_tpu.models.openai_unet import ScoreNetwork

    torch.manual_seed(13)
    ref = ref_layers.ScoreNetwork(x_dim=16)
    ref.eval()
    rng = np.random.default_rng(22)
    x = rng.standard_normal((3, 16)).astype(np.float32)
    t = np.array([[0.1], [0.5], [0.9]], np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()

    ours = ScoreNetwork(x_dim=16)
    params = ours.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(t))["params"]
    sd = ref.state_dict()

    def mlp_from_torch(prefix, n_layers):
        return {f"Dense_{i}": {
            "kernel": _t2f_lin(sd[f"{prefix}.layers.{i}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.layers.{i}.bias"].numpy())}
            for i in range(n_layers)}

    new = {"t_encoder": mlp_from_torch("t_encoder", 2),
           "x_encoder": mlp_from_torch("x_encoder", 2),
           "net": mlp_from_torch("net", 3)}
    jax.tree_util.tree_map(lambda a, b: None, params, new)  # same structure

    y = ours.apply({"params": new}, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(y), ref_out, rtol=1e-4, atol=1e-5)

    # image input path: reshape in/out (layers.py:46-66)
    xi = rng.standard_normal((3, 4, 4, 1)).astype(np.float32)
    with torch.no_grad():
        ref_img = ref(torch.from_numpy(
            np.transpose(xi, (0, 3, 1, 2))), torch.from_numpy(t)).numpy()
    yi = ours.apply({"params": new},
                    jnp.asarray(np.transpose(xi, (0, 3, 1, 2))),
                    jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(yi), ref_img, rtol=1e-4,
                               atol=1e-5)


def test_pde_losses_match_reference_execution():
    ref_loss = _load("ref_pde_loss",
                     REF / "pdearena" / "pdearena" / "modules" / "loss.py")
    rng = np.random.default_rng(4)
    pred = rng.standard_normal((2, 3, 8, 8, 2)).astype(np.float32)
    tgt = rng.standard_normal((2, 3, 8, 8, 2)).astype(np.float32)
    # reference layout (B, T, C, H, W)
    tp = torch.from_numpy(np.transpose(pred, (0, 1, 4, 2, 3)))
    tt = torch.from_numpy(np.transpose(tgt, (0, 1, 4, 2, 3)))
    ref_sl = ref_loss.ScaledLpLoss()(tp, tt)
    ours_sl = losses.scaledlp_loss(jnp.asarray(pred), jnp.asarray(tgt))
    np.testing.assert_allclose(float(ours_sl), float(ref_sl), rtol=1e-5)
    ref_mse = ref_loss.CustomMSELoss()(tp, tt)
    ours_mse = losses.custom_mse_loss(jnp.asarray(pred), jnp.asarray(tgt))
    np.testing.assert_allclose(float(ours_mse), float(ref_mse), rtol=1e-5)
