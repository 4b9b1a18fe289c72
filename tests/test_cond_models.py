"""Conditioned registry shape tests — mirrors
``pdearena/tests/test_cond_model_registry.py`` (parametrized additionally over
param_conditioning in {None, 'scalar'})."""
import jax
import jax.numpy as jnp
import pytest

from unet_design_tpu.models import registry

RNG = jax.random.PRNGKey(3)


@pytest.mark.slow
@pytest.mark.parametrize("param_conditioning", [None, "scalar"])
@pytest.mark.parametrize("name", sorted(registry.COND_MODEL_REGISTRY))
def test_cond_registry_shapes(name, param_conditioning):
    x = jax.random.normal(RNG, (2, 4, 64, 64, 3))
    time = jnp.full((2,), 0.5)
    z = jnp.full((2,), 2.0) if param_conditioning == "scalar" else None
    model = registry.build_cond_model(
        name, n_scalar_components=1, n_vector_components=1, time_history=4,
        time_future=1, activation="gelu",
        param_conditioning=param_conditioning)
    variables = model.init(RNG, x, time, z)
    out = model.apply(variables, x, time, z)
    assert out.shape == (2, 1, 64, 64, 3), (name, out.shape)


def test_cond_unet_small():
    x = jax.random.normal(RNG, (1, 2, 32, 32, 3))
    time = jnp.full((1,), 0.3)
    model = registry.build_cond_model("Unetmod-64-adagn", 1, 1, 2, 1,
                                      param_conditioning="scalar",
                                      hidden_channels=8)
    z = jnp.full((1,), 1.5)
    variables = model.init(RNG, x, time, z)
    out = model.apply(variables, x, time, z)
    assert out.shape == (1, 1, 32, 32, 3)


def test_cond_fno_small():
    x = jax.random.normal(RNG, (1, 2, 32, 32, 3))
    time = jnp.full((1,), 0.3)
    model = registry.build_cond_model("FNO-128-16m", 1, 1, 2, 1,
                                      hidden_channels=8, modes1=4, modes2=4)
    variables = model.init(RNG, x, time, None)
    out = model.apply(variables, x, time, None)
    assert out.shape == (1, 1, 32, 32, 3)
