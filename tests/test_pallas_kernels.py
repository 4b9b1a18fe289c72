"""Pallas kernels vs reference implementations (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_design_tpu.ops import wavelet
from unet_design_tpu.ops.pallas import groupnorm as gn
from unet_design_tpu.ops.pallas import haar as haar_pl

RNG = jax.random.PRNGKey(0)


@pytest.mark.parametrize("activation", ["silu", "gelu", "none"])
def test_fused_groupnorm_matches_reference(activation):
    b, h, w, c, g = 2, 8, 8, 64, 32
    x = jax.random.normal(RNG, (b, h, w, c))
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1
    ref = gn.groupnorm_act_reference(x, scale, bias, g, activation=activation)
    out = gn.fused_groupnorm_act(x, scale, bias, g, activation=activation,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_groupnorm_matches_flax():
    from flax import linen as nn
    b, h, w, c, g = 2, 4, 4, 32, 8
    x = jax.random.normal(RNG, (b, h, w, c))
    mod = nn.GroupNorm(num_groups=g)
    variables = mod.init(RNG, x)
    ref = nn.silu(mod.apply(variables, x))
    out = gn.fused_groupnorm_act(
        x, variables["params"]["scale"], variables["params"]["bias"], g,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_haar_pyramid_fused_matches_wavelet():
    x = jax.random.normal(RNG, (2, 16, 16, 3))
    ref = wavelet.dwt_pyramid(x, 3)
    out = haar_pl.haar_pyramid_fused(x, 3, interpret=True)
    assert len(out) == 3
    for a, b_ in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
