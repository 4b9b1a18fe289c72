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
