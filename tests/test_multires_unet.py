"""Shape/behavior tests for the Multi-ResNet DDPM U-Net (diff_cifar flagship)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_design_tpu.models.multires_unet import MultiResUNet

RNG = jax.random.PRNGKey(0)


def small_model(**kw):
    defaults = dict(ch=32, ch_mult=(1, 2, 2), attn=(1,), num_res_blocks=1,
                    dropout=0.0)
    defaults.update(kw)
    return MultiResUNet(**defaults)


@pytest.mark.parametrize("dwt_encoder", [False, True])
@pytest.mark.parametrize("multi_res_loss", [False, True])
def test_full_forward_shapes(dwt_encoder, multi_res_loss):
    m = small_model(dwt_encoder=dwt_encoder, multi_res_loss=multi_res_loss)
    x = jnp.ones((2, 32, 32, 3))
    t = jnp.zeros((2,), jnp.int32)
    params = m.init(RNG, x, t)
    out = m.apply(params, x, t)
    if multi_res_loss:
        assert isinstance(out, list) and len(out) == 3
        assert [o.shape[1] for o in out] == [8, 16, 32]  # coarse -> fine
        for o in out:
            assert o.shape[-1] == 3
    else:
        assert out.shape == (2, 32, 32, 3)


@pytest.mark.parametrize("n_levels_used", [1, 2, 3])
def test_staged_truncation(n_levels_used):
    m = small_model(dwt_encoder=True, multi_res_loss=True)
    res = 32 // 2 ** (3 - n_levels_used)
    x = jnp.ones((2, res, res, 3))
    t = jnp.zeros((2,), jnp.int32)
    params = m.init(RNG, x, t, n_levels_used=n_levels_used)
    out = m.apply(params, x, t, n_levels_used=n_levels_used)
    assert len(out) == n_levels_used
    assert out[-1].shape == (2, res, res, 3)
    # coarsest output is always at res/2^(n-1)
    assert out[0].shape[1] == res // 2 ** (n_levels_used - 1)


def test_params_are_shared_across_stages():
    """Truncated forward must reuse the full model's params (same tree)."""
    m = small_model(dwt_encoder=True, multi_res_loss=True)
    x3 = jnp.ones((1, 32, 32, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = m.init(RNG, x3, t)  # full init
    x2 = jnp.ones((1, 16, 16, 3))
    out = m.apply(params, x2, t, n_levels_used=2)
    assert len(out) == 2 and out[-1].shape == (1, 16, 16, 3)


def test_dwt_encoder_has_no_encoder_params():
    m_dwt = small_model(dwt_encoder=True)
    m_res = small_model(dwt_encoder=False)
    x = jnp.ones((1, 32, 32, 3))
    t = jnp.zeros((1,), jnp.int32)
    p_dwt = m_dwt.init(RNG, x, t)["params"]
    p_res = m_res.init(RNG, x, t)["params"]
    dwt_keys = {k for k in p_dwt if k.startswith("down_")}
    res_keys = {k for k in p_res if k.startswith("down_")}
    assert not dwt_keys          # parameter-free encoder
    assert res_keys              # learned encoder has params

    def count(p):
        return sum(np.prod(a.shape) for a in jax.tree_util.tree_leaves(p))
    assert count(p_dwt) < count(p_res)


def test_cifar_config_param_count():
    """The reference 35.7M-param UNet (diff_cifar README): ch=128, mult
    [1,2,2,2], attn level 1, 2 res blocks.  Our UNetWaveletEnc analog adds
    per-level time embeddings and tails, so expect slightly above 35.7M."""
    m = MultiResUNet()
    x = jnp.ones((1, 32, 32, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = m.init(RNG, x, t)["params"]
    n = sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params))
    assert 30e6 < n < 45e6, n
