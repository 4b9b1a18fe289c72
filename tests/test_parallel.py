"""Mesh/sharding tests on the 8-device virtual CPU mesh, including the
driver's ``dryrun_multichip`` contract."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from unet_design_tpu.parallel import mesh as mesh_lib


def test_make_mesh_shapes():
    m = mesh_lib.make_mesh()
    assert m.shape["data"] * m.shape["model"] == 8
    m = mesh_lib.make_mesh(data=4, model=2)
    assert m.shape == {"data": 4, "model": 2}


def test_shard_batch_and_replicate():
    m = mesh_lib.make_mesh(data=8, model=1)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    xs = mesh_lib.shard_batch({"x": x}, m)["x"]
    assert xs.sharding.spec == P("data", None)
    p = mesh_lib.replicate({"w": np.ones((4,))}, m)["w"]
    assert p.sharding.spec == P()


def test_data_parallel_matches_single_device():
    """A sharded loss/grad computation must equal the unsharded one."""
    m = mesh_lib.make_mesh(data=8, model=1)
    w = jnp.ones((3, 3))
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 3))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_single = jax.grad(loss)(w, x)
    xw = mesh_lib.shard_batch({"x": np.asarray(x)}, m)["x"]
    wr = mesh_lib.replicate(w, m)
    g_sharded = jax.jit(jax.grad(loss))(wr, xw)
    np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded),
                               rtol=1e-6)


def test_tensor_parallel_params_sharding():
    m = mesh_lib.make_mesh(data=4, model=2)
    params = {"conv": {"kernel": jnp.ones((3, 3, 16, 128)),
                       "bias": jnp.ones((128,))},
              "small": {"kernel": jnp.ones((3, 3, 4, 8))}}
    out = mesh_lib.tensor_parallel_params(params, m, min_channels=64)
    assert out["conv"]["kernel"].sharding.spec == P(None, None, None, "model")
    assert out["small"]["kernel"].sharding.spec == P()
    # bias is 1-D -> replicated
    assert out["conv"]["bias"].sharding.spec == P()


def test_spatial_mesh_shapes():
    m = mesh_lib.make_mesh(model=1, spatial=4)
    assert m.shape["data"] == 2 and m.shape["spatial"] == 4
    # default spatial=1 keeps the two-axis mesh (backward compat)
    assert "spatial" not in mesh_lib.make_mesh(data=4, model=2).shape


def test_spatial_partitioning_matches_single_device():
    """Grid-partitioned forward and grads must equal the unsharded ones:
    XLA GSPMD inserts the conv halo exchanges and norm all-reduces when the
    H dim is sharded over the 'spatial' axis."""
    from unet_design_tpu.models import registry

    m = mesh_lib.make_mesh(data=2, model=1, spatial=4)
    model = registry.build_model("Unetbase-64", 1, 1, 2, 1, "gelu",
                                 hidden_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    y_ref = model.apply({"params": params}, x)

    xs = mesh_lib.spatial_shard_batch(x, m)
    assert xs.sharding.spec == P("data", None, "spatial", None, None)
    pr = mesh_lib.replicate(params, m)
    fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx))
    y_sh = fwd(pr, xs)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_sh),
                               rtol=2e-5, atol=2e-5)

    def loss(p, xx):
        return jnp.mean(model.apply({"params": p}, xx) ** 2)

    g_ref = jax.grad(loss)(params, x)
    g_sh = jax.jit(jax.grad(loss))(pr, xs)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
        g_ref, g_sh)


@pytest.mark.parametrize("n", [8])
def test_dryrun_multichip(n):
    import __graft_entry__
    __graft_entry__.dryrun_multichip(n)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 32, 32, 3)
