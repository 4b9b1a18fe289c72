"""Custom-model class-path fallback — mirrors
``pdearena/tests/test_custom_model.py:8-40``.

A model name that is not in the registry but is a dotted
``module.path.Class`` is imported and instantiated directly (the reference
builds a user-supplied ``class_path`` with a warning:
``pdearena/models/pdemodel.py:56-66``).  The reference test instantiates a
custom ``FourierUnet`` (hidden 64, modes 8, 1 block, 1 fourier layer,
mid_attn, use1x1) and checks the forward shape on (8, 4, 3, 64, 64); we use
a reduced batch and hidden width for CPU test speed.
"""
import jax
import jax.numpy as jnp
import pytest

from unet_design_tpu.models import registry

RNG = jax.random.PRNGKey(7)


def test_custom_model_class_path():
    x = jax.random.normal(RNG, (2, 4, 64, 64, 3))
    model = registry.build_model(
        "unet_design_tpu.models.modern_unet.ModernUnet",
        n_scalar_components=1, n_vector_components=1, time_history=4,
        time_future=1, activation="gelu", hidden_channels=16, norm=True,
        modes1=8, modes2=8, n_blocks=1, n_fourier_layers=1, mid_attn=True,
        use1x1=True)
    variables = model.init(RNG, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 1, 64, 64, 3)
    assert bool(jnp.isfinite(out).all())


def test_unknown_plain_name_raises():
    with pytest.raises(KeyError):
        registry.build_model("NotARealModel", 1, 1, 4, 1, "gelu")


def test_bad_class_path_raises():
    with pytest.raises(KeyError):
        registry.build_model("unet_design_tpu.models.modern_unet.Missing",
                             1, 1, 4, 1, "gelu")
