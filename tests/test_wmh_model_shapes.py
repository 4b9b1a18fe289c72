"""WMH segmentation model on the true non-dyadic 200x200 resolution."""
import jax
import jax.numpy as jnp
import pytest

from unet_design_tpu.models.unetbase import WMHSegUnet

RNG = jax.random.PRNGKey(0)


@pytest.mark.slow
@pytest.mark.parametrize("dwt_encoder", [False, True])
def test_wmh_200px_chain(dwt_encoder):
    """200 -> 100 -> 50 -> 25 -> 12 (avg, floor) or 13 (dwt, ceil); the
    decoder's generic pad/crop fix restores 200x200 (wmh/model.py:146-155)."""
    m = WMHSegUnet(hidden_channels=2, dwt_encoder=dwt_encoder)
    x = jnp.zeros((1, 200, 200, 2))
    variables = m.init(RNG, x)
    out = m.apply(variables, x)
    assert out.shape == (1, 200, 200, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid


@pytest.mark.parametrize("first5", [True, False])
def test_legacy_unet_nondyadic_crop_chain(first5):
    """The challenge-winning Keras net's crop-concat pyramid on a small
    non-dyadic size: 52 -> 26 -> 13 -> 6 -> 3; up-path crops skips to the
    upsampled size (13->12, 52->48) and the final zero-pad restores the
    input resolution (wmh/train_leave_one_out.py:80-109)."""
    from unet_design_tpu.models.wmh_legacy import WMHLegacyUnet
    m = WMHLegacyUnet(first5=first5)
    x = jnp.zeros((1, 52, 52, 2))
    out = m.apply(m.init(RNG, x), x)
    assert out.shape == (1, 52, 52, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid
    # kernel-scale ensemble axis: first two convs are 5x5 vs 3x3
    k = m.init(RNG, x)["params"]["Conv_0"]["kernel"].shape[0]
    assert k == (5 if first5 else 3)


@pytest.mark.slow
def test_legacy_unet_200px_challenge_resolution():
    from unet_design_tpu.models.wmh_legacy import WMHLegacyUnet
    m = WMHLegacyUnet()
    x = jnp.zeros((1, 200, 200, 2))
    out = m.apply(m.init(RNG, x), x)
    assert out.shape == (1, 200, 200, 1)


def test_legacy_crop_like_matches_keras_split():
    """Odd size diffs crop one EXTRA row/col from the end
    (get_crop_shape: (d//2, d//2+1))."""
    from unet_design_tpu.models import wmh_legacy
    t = jnp.arange(7.0)[None, :, None, None] * jnp.ones((1, 7, 5, 1))
    r = jnp.zeros((1, 4, 4, 1))
    c = wmh_legacy._crop_like(t, r)
    assert c.shape == (1, 4, 4, 1)
    # dh=3 -> crop (1, 2): rows 1..4 survive
    assert [float(v) for v in c[0, :, 0, 0]] == [1.0, 2.0, 3.0, 4.0]


def test_wmh_48px_multires_staged():
    m = WMHSegUnet(hidden_channels=2, dwt_encoder=True, multi_res_loss=True,
                   sequ_mode=True)
    x = jnp.zeros((1, 48, 48, 2))
    variables = m.init(RNG, x)
    outs = m.apply(variables, x)
    assert [o.shape[1] for o in outs] == [6, 12, 24, 48]
    x2 = jnp.zeros((1, 12, 12, 2))
    outs = m.apply(variables, x2, n_levels_used=2)
    assert [o.shape[1] for o in outs] == [6, 12]
