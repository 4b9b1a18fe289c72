"""Tests for the diff_mnist model family (OpenAI-style wavelet U-Net, MLP)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_design_tpu.models.openai_unet import (MLP, ScoreNetwork, UNetModel,
                                                WaveletUNetOpenAI)

RNG = jax.random.PRNGKey(0)


@pytest.mark.parametrize("dwt_encoder", [False, True])
@pytest.mark.parametrize("multi_res_loss", [False, True])
def test_wavelet_unet_full(dwt_encoder, multi_res_loss):
    m = WaveletUNetOpenAI(in_channels=1, model_channels=32, out_channels=1,
                          num_res_blocks=1, channel_mult=(2, 2, 2),
                          dwt_encoder=dwt_encoder,
                          multi_res_loss=multi_res_loss)
    x = jnp.ones((2, 32, 32, 1))
    t = jnp.full((2,), 0.5)
    variables = m.init(RNG, x, t)
    out = m.apply(variables, x, t)
    if multi_res_loss:
        assert [o.shape[1] for o in out] == [8, 16, 32]
        assert all(o.shape[-1] == 1 for o in out)
    else:
        assert out.shape == (2, 32, 32, 1)


def test_wavelet_unet_staged_reuses_params():
    m = WaveletUNetOpenAI(in_channels=1, model_channels=32, out_channels=1,
                          num_res_blocks=1, channel_mult=(2, 2, 2),
                          dwt_encoder=True, multi_res_loss=True)
    x = jnp.ones((2, 32, 32, 1))
    t = jnp.full((2,), 0.5)
    variables = m.init(RNG, x, t)
    x8 = jnp.ones((2, 8, 8, 1))
    out = m.apply(variables, x8, t, n_levels_used=1)
    assert len(out) == 1 and out[0].shape == (2, 8, 8, 1)
    x16 = jnp.ones((2, 16, 16, 1))
    out = m.apply(variables, x16, t, n_levels_used=2)
    assert [o.shape[1] for o in out] == [8, 16]


def test_wavelet_unet_nonuniform_mult():
    """channel_mult (1, 2, 2) — the image_size=28 config family."""
    m = WaveletUNetOpenAI(in_channels=1, model_channels=32, out_channels=1,
                          num_res_blocks=1, channel_mult=(1, 2, 2))
    x = jnp.ones((1, 32, 32, 1))
    t = jnp.zeros((1,))
    variables = m.init(RNG, x, t)
    out = m.apply(variables, x, t)
    assert out.shape == (1, 32, 32, 1)


def test_wavelet_unet_norms_capture():
    m = WaveletUNetOpenAI(in_channels=1, model_channels=32, out_channels=1,
                          num_res_blocks=1, channel_mult=(2, 2))
    x = jnp.ones((2, 16, 16, 1))
    t = jnp.zeros((2,))
    variables = m.init(RNG, x, t)
    out, norms = m.apply(variables, x, t, return_norms=True)
    assert set(norms.keys()) == {"down", "middle", "up"}
    assert all(jnp.isfinite(v) for vs in norms["down"].values() for v in vs)


def test_baseline_unet_model():
    m = UNetModel(in_channels=1, model_channels=32, out_channels=1,
                  num_res_blocks=1, channel_mult=(1, 2))
    x = jnp.ones((2, 16, 16, 1))
    t = jnp.zeros((2,))
    variables = m.init(RNG, x, t)
    out = m.apply(variables, x, t)
    assert out.shape == (2, 16, 16, 1)
    # the fork's head is a default-init 1x1 out_reduce_channels
    # (unet.py:187-192), not the original zero-init 3x3 conv -> nonzero
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.abs(out).max()) > 0.0


def test_score_network_vector_and_image():
    m = ScoreNetwork(x_dim=2)
    x = jnp.ones((4, 2))
    t = jnp.full((4,), 0.3)
    variables = m.init(RNG, x, t)
    assert m.apply(variables, x, t).shape == (4, 2)

    m = ScoreNetwork(x_dim=28 * 28)
    xi = jnp.ones((4, 28, 28, 1))
    variables = m.init(RNG, xi, t)
    assert m.apply(variables, xi, t).shape == (4, 28, 28, 1)
