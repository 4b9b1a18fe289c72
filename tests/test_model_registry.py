"""Registry shape tests — mirrors ``pdearena/tests/test_model_registry.py``.

Every registered model is constructed and run on a random
``(B, time_history, H, W, C)`` trajectory, asserting the output shape
``(B, time_future, H, W, C)``.  We use 64x64 grids and a reduced batch for CPU
test speed (the reference uses (8, 4, 3, 64, 64)).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from unet_design_tpu.models import registry

RNG = jax.random.PRNGKey(7)

# UNO's hard-coded grid plan assumes 64x64 minimum inputs; give it 64.
INPUT_RES = {"UNO-64": 64, "UNO-128": 64}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(registry.MODEL_REGISTRY))
def test_registry_shapes(name):
    res = INPUT_RES.get(name, 64)
    x = jax.random.normal(RNG, (2, 4, res, res, 3))
    model = registry.build_model(name, n_scalar_components=1,
                                 n_vector_components=1, time_history=4,
                                 time_future=1, activation="gelu")
    variables = model.init(RNG, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 1, res, res, 3), (name, out.shape)
    assert bool(jnp.isfinite(out).all()), name


def test_unetbase_g_multires_and_staged():
    x = jax.random.normal(RNG, (2, 4, 64, 64, 3))
    model = registry.build_model("Unetbase-64_G", 1, 1, 4, 1,
                                 hidden_channels=8, multi_res_loss=True,
                                 sequ_mode=True, dwt_encoder=True)
    variables = model.init(RNG, x)
    out = model.apply(variables, x)
    assert isinstance(out, list) and len(out) == 4
    assert [o.shape[2] for o in out] == [8, 16, 32, 64]
    # staged truncation reuses the same params at 2 levels
    x2 = jax.random.normal(RNG, (2, 4, 16, 16, 3))
    out2 = model.apply(variables, x2, n_levels_used=2)
    assert [o.shape[2] for o in out2] == [8, 16]


def test_unetbase_g_extra_resnet_layers_and_ablations():
    x = jax.random.normal(RNG, (1, 2, 32, 32, 3))
    model = registry.build_model("Unetbase-64_G", 1, 1, 2, 1,
                                 hidden_channels=8, dwt_encoder=True,
                                 n_extra_resnet_layers=2,
                                 no_skip_connection=True)
    variables = model.init(RNG, x)
    out = model.apply(variables, x)
    assert out.shape == (1, 1, 32, 32, 3)


def test_unet2015_batchnorm_mutable():
    x = jax.random.normal(RNG, (2, 2, 32, 32, 3))
    model = registry.build_model("Unet2015-64", 1, 1, 2, 1,
                                 hidden_channels=8)
    variables = model.init(RNG, x)
    assert "batch_stats" in variables
    out, updates = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    assert out.shape == (2, 1, 32, 32, 3)


def test_unetbase_g_remat_is_math_identical():
    """remat=True must change only the backward-pass schedule: outputs AND
    gradients are bit-comparable to remat=False (same param tree)."""
    import jax.numpy as jnp

    x = jax.random.normal(RNG, (1, 2, 32, 32, 3))
    kw = dict(hidden_channels=8, dwt_encoder=True, n_extra_resnet_layers=2,
              multi_res_loss=True, sequ_mode=True)
    base = registry.build_model("Unetbase-64_G", 1, 1, 2, 1, **kw)
    rem = registry.build_model("Unetbase-64_G", 1, 1, 2, 1, remat=True, **kw)
    variables = base.init(RNG, x)
    assert jax.tree_util.tree_structure(
        rem.init(RNG, x)) == jax.tree_util.tree_structure(variables)

    def loss(m):
        def f(v):
            outs = m.apply(v, x)
            return sum(jnp.mean(o ** 2) for o in outs)
        return f

    l0, g0 = jax.value_and_grad(loss(base))(variables)
    l1, g1 = jax.value_and_grad(loss(rem))(variables)
    assert jnp.allclose(l0, l1, rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g0, g1)
