"""Tests for the data layer: loaders, window slicing (golden), triangular IFS,
WMH preprocessing."""
import numpy as np
import pytest

from unet_design_tpu.data import image, loader, pde, triangular, wmh


def test_epoch_batches_cover_all():
    x = np.arange(10)[:, None].astype(np.float32)
    y = np.arange(10)
    seen = []
    for bx, by in loader.epoch_batches([x, y], 3, np.random.default_rng(0)):
        assert bx.shape == (3, 1)
        np.testing.assert_array_equal(bx[:, 0].astype(int), by)
        seen.extend(by.tolist())
    assert len(seen) == 9 and len(set(seen)) == 9


def test_infinite_batches_and_shard():
    it = loader.infinite_batches([np.arange(8)], 4)
    b1 = next(it)[0]
    b2 = next(it)[0]
    assert b1.shape == (4,)
    shard = loader.shard_for_process(list(range(10)), 1, 4)
    assert shard == [1, 5, 9]


def test_prefetch_to_device():
    src = ({"x": np.full((2, 2), i, np.float32)} for i in range(5))
    out = list(loader.prefetch_to_device(src, size=2))
    assert len(out) == 5
    np.testing.assert_allclose(np.asarray(out[3]["x"]), 3.0)


# ---- create_data2d golden test (mirrors pdearena tests/test_data_utils.py)

@pytest.mark.parametrize("time_history", [1, 2, 4])
@pytest.mark.parametrize("time_future", [1, 2])
@pytest.mark.parametrize("time_gap", [0, 1])
@pytest.mark.parametrize("start", [0, 3])
def test_create_data2d_golden(time_history, time_future, time_gap, start):
    T, H, W = 16, 4, 4
    u = np.random.default_rng(0).standard_normal((T, H, W, 1)).astype(np.float32)
    v = np.random.default_rng(1).standard_normal((T, H, W, 2)).astype(np.float32)
    data, targets = pde.create_data2d(1, 1, 1, 1, u, v, start, time_history,
                                      time_future, time_gap)
    assert data.shape == (1, time_history, H, W, 3)
    assert targets.shape == (1, time_future, H, W, 3)
    end = start + time_history
    ts = end + time_gap
    np.testing.assert_array_equal(data[0, ..., :1], u[start:end])
    np.testing.assert_array_equal(data[0, ..., 1:], v[start:end])
    np.testing.assert_array_equal(targets[0, ..., :1], u[ts:ts + time_future])


def test_randomized_and_eval_windows():
    cfg = pde.PDEDataConfig(1, 1, trajlen=12, n_spatial_dims=2)
    trajs = pde.synthetic_trajectories(3, cfg, res=16, seed=0)
    train = list(pde.randomized_train_windows(trajs, cfg, 4, 1, 0, cycles=2))
    assert len(train) == 6
    ev = list(pde.eval_timestep_windows(trajs, cfg, 4, 1, 0))
    # max_start = 12-4-1 = 7 -> starts 0..7 step 1 = 8 starts x 3 trajs
    assert len(ev) == 24
    batched = list(pde.batched_windows(iter(ev), 4))
    assert batched[0][0].shape == (4, 4, 16, 16, 3)


def test_triangular_ifs_matches_reference_addresses():
    """Golden: vectorized address/eval-point grids equal the reference's
    string-recursion algorithm (diff_mnist/data.py:131-194) for J=3."""
    import copy

    def string_kron(m1, m2):
        n1, c1 = len(m1), len(m1[0])
        n2, c2 = len(m2), len(m2[0])
        out = [["" for _ in range(c1 * c2)] for _ in range(n1 * n2)]
        for i in range(n1):
            for j in range(c1):
                for k in range(n2):
                    for l in range(c2):
                        out[n2 * i + k][c2 * j + l] = m1[i][j] + m2[k][l]
        return out

    J = 3
    matrix = [["0", "1"], ["2", "3"]]
    addresses = matrix
    for _ in range(J - 1):
        addresses = string_kron(addresses, matrix)

    f_sq = [lambda x: [x[0] / 2, x[1] / 2],
            lambda x: [x[0] / 2, x[1] / 2 + 0.5],
            lambda x: [x[0] / 2 + 0.5, x[1] / 2],
            lambda x: [x[0] / 2 + 0.5, x[1] / 2 + 0.5]]
    n = 2 ** J
    ref = np.zeros((n, n, 2))
    for i in range(n):
        for j in range(n):
            x = [0.5, 0.5]
            for k in reversed(addresses[i][j]):
                x = f_sq[int(k)](x)
            ref[i, j] = x
    ours = triangular.eval_points(triangular._apply_square, J, (0.5, 0.5))
    np.testing.assert_allclose(ours, ref, rtol=1e-12)

    f_tri = [lambda x: [x[0] / 2, x[1] / 2],
             lambda x: [x[0] / 2, x[1] / 2 + 0.5],
             lambda x: [x[0] / 2 + 0.5, x[1] / 2],
             lambda x: [-x[0] / 2 + 0.5, -x[1] / 2 + 0.5]]
    for i in range(n):
        for j in range(n):
            x = [1 / 3, 1 / 3]
            for k in reversed(addresses[i][j]):
                x = f_tri[int(k)](x)
            ref[i, j] = x
    ours = triangular.eval_points(triangular._apply_tri, J, (1 / 3, 1 / 3))
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_triangular_dataset_build():
    imgs = np.random.default_rng(0).integers(0, 255, (4, 28, 28)
                                             ).astype(np.uint8)
    data = triangular.make_triangular_dataset(imgs, to_square_preprocess=False)
    assert data.shape == (4, 64, 64, 1)
    # gray diagonal region present
    np.testing.assert_allclose(data[:, 0, 10, 0], 0.5)


def test_triangular_square_roundtrip():
    pre = triangular.TriangularPreprocessor(J=4)
    img = np.random.default_rng(0).random((16, 16)).astype(np.float32)
    sq = pre.to_square(img)
    assert sq.shape == (16, 16)
    assert np.isfinite(sq).all()


def test_synthetic_image_loaders():
    x, y = image.synthetic_mnist(8)
    assert x.shape == (8, 32, 32, 1) and x.min() >= -1 and x.max() <= 1
    x, y = image.synthetic_cifar10(8)
    assert x.shape == (8, 32, 32, 3)
    flipped = image.random_horizontal_flip(x, np.random.default_rng(0))
    assert flipped.shape == x.shape


def test_wmh_preprocessing_shapes_and_norm():
    rng = np.random.default_rng(0)
    flair = rng.uniform(0, 200, (5, 240, 240)).astype(np.float32)
    t1 = rng.uniform(0, 100, (5, 240, 240)).astype(np.float32)
    out = wmh.utrecht_preprocess(flair, t1)
    assert out.shape == (5, 200, 200, 2)
    # GE3T: smaller columns than 200, rows > 246
    flair = rng.uniform(0, 200, (5, 256, 132)).astype(np.float32)
    t1 = rng.uniform(0, 100, (5, 256, 132)).astype(np.float32)
    out = wmh.ge3t_preprocess(flair, t1)
    assert out.shape == (5, 200, 200, 2)


def test_wmh_split_and_normalize():
    n = 48 * 40 + 83 * 20
    train_idx, val_idx = wmh.patient_split_indices(n)
    assert not set(train_idx) & set(val_idx)
    assert len(train_idx) + len(val_idx) == n
    # 2 val patients per site
    assert len(val_idx) == 2 * 48 + 2 * 48 + 2 * 83

    tr = np.random.default_rng(0).standard_normal((10, 4, 4, 2)).astype(
        np.float32) * 3 + 1
    te = tr * 2
    trn, ten = wmh.normalize_by_train_stats(tr, te)
    np.testing.assert_allclose(trn[..., 0].mean(), 0, atol=1e-5)
    np.testing.assert_allclose(trn[..., 1].std(), 1, atol=1e-4)


def test_wmh_augmentation_policies():
    imgs, masks = wmh.synthetic_wmh(4, size=32)
    rng = np.random.default_rng(0)
    for policy in ("none", "manual1", "manual2", "manual3"):
        ai, am = wmh.augment_batch(imgs, masks, policy, rng)
        assert ai.shape == imgs.shape and am.shape == masks.shape
        # masks stay binary under nearest-neighbour warping
        assert set(np.unique(am)) <= {0.0, 1.0}


def test_stacked_disk_cache_roundtrip(tmp_path, monkeypatch):
    """cached_opener writes one stacked array per split and reloads it:
    identical tuples/stack, stable across processes, invalidated when a
    source file changes."""
    import numpy as np
    from unet_design_tpu.data import pde as pde_data

    rng = np.random.default_rng(0)
    for i in range(3):
        np.savez(tmp_path / f"train_seed{i}.npz",
                 u=rng.normal(size=(16, 8, 8, 1)).astype(np.float32),
                 v=rng.normal(size=(16, 8, 8, 2)).astype(np.float32))
    files = pde_data.ShallowWaterOpener.list_files(str(tmp_path), "train")
    mk = lambda: pde_data.ShallowWaterOpener(files, "train",
                                             skip_nt=1, sample_rate=3)
    cdir = str(tmp_path / ".stack_cache")

    first = pde_data.cached_opener(mk(), n_scalar=1, cache_dir=cdir)
    assert isinstance(first, pde_data.StackedDiskCache)  # built + saved
    import os
    cache_files = os.listdir(cdir)
    assert len(cache_files) == 1

    # second call must come from disk: forbid the rebuild path entirely
    def _no_rebuild(_):
        raise AssertionError("cache miss: CachedOpener rebuilt")
    monkeypatch.setattr(pde_data, "CachedOpener", _no_rebuild)
    second = pde_data.cached_opener(mk(), n_scalar=1, cache_dir=cdir)
    monkeypatch.undo()
    assert isinstance(second, pde_data.StackedDiskCache)  # disk hit
    np.testing.assert_array_equal(first.stacked_fields(),
                                  second.stacked_fields())
    assert second.stacked_fields().shape[1] == 5  # (16-1-1)//3+1 subsampled
    for (u1, v1, c1), (u2, v2, c2) in zip(first, second):
        np.testing.assert_array_equal(u1, u2)
        np.testing.assert_array_equal(v1, v2)
        assert c1 is None and c2 is None
    assert second.n_trajectories() == 3

    # different read parameters -> different cache entry, not a stale hit
    other = pde_data.cached_opener(
        pde_data.ShallowWaterOpener(files, "train", skip_nt=0,
                                    sample_rate=1),
        n_scalar=1, cache_dir=cdir)
    assert other.stacked_fields().shape[1] == 16
    assert len(os.listdir(cdir)) == 2

    # touching a source file invalidates (rebuild, no wrong reuse)
    p0 = tmp_path / "train_seed0.npz"
    d = np.load(p0)
    np.savez(p0, u=d["u"] * 2.0, v=d["v"])
    rebuilt = pde_data.cached_opener(mk(), n_scalar=1, cache_dir=cdir)
    np.testing.assert_allclose(rebuilt.stacked_fields()[0, :, :, :, 0],
                               second.stacked_fields()[0, :, :, :, 0] * 2.0,
                               rtol=1e-6)

    # openers the stack can't represent fall back cleanly (no file list)
    fallback = pde_data.cached_opener(iter([]), n_scalar=1, cache_dir=cdir)
    assert isinstance(fallback, pde_data.CachedOpener)


def test_stacked_disk_cache_normstats_invalidation(tmp_path):
    """The cache key must fingerprint normstats.npz: the ShallowWaterOpener
    normalizes at read time, and regenerating the train split rewrites
    normstats without touching the valid/test files' mtimes — a key on the
    data files alone would keep serving fields normalized with the old
    (or missing) stats."""
    import numpy as np
    from unet_design_tpu.data import pde as pde_data

    rng = np.random.default_rng(1)
    for i in range(2):
        np.savez(tmp_path / f"valid_seed{i}.npz",
                 u=rng.normal(size=(6, 8, 8, 1)).astype(np.float32),
                 v=rng.normal(size=(6, 8, 8, 2)).astype(np.float32))
    files = pde_data.ShallowWaterOpener.list_files(str(tmp_path), "valid")
    mk = lambda: pde_data.ShallowWaterOpener(files, "valid")
    cdir = str(tmp_path / ".stack_cache")

    raw = pde_data.cached_opener(mk(), n_scalar=1, cache_dir=cdir)

    # normstats appears after the cache was built (e.g. train datagen ran
    # later): the cache must rebuild, not hit
    np.savez(tmp_path / "normstats.npz",
             vor_mean=np.float32(0.5), vor_std=np.float32(2.0))
    normed = pde_data.cached_opener(mk(), n_scalar=1, cache_dir=cdir)
    np.testing.assert_allclose(
        normed.stacked_fields()[..., :1],
        (raw.stacked_fields()[..., :1] - 0.5) / 2.0, rtol=1e-6)

    # normstats rewritten with different values: rebuild again
    np.savez(tmp_path / "normstats.npz",
             vor_mean=np.float32(0.0), vor_std=np.float32(4.0))
    renormed = pde_data.cached_opener(mk(), n_scalar=1, cache_dir=cdir)
    np.testing.assert_allclose(
        renormed.stacked_fields()[..., :1],
        raw.stacked_fields()[..., :1] / 4.0, rtol=1e-6)


def test_jit_cache_cached_build():
    """cached_build: identity-keyed hits, static-keyed misses, and no stale
    hit after an anchor is replaced by a new object."""
    from unet_design_tpu.utils.jit_cache import cached_build

    cache = {}
    builds = []

    class Anchor:
        pass

    a, b = Anchor(), Anchor()
    mk = lambda tag: (lambda: builds.append(tag) or tag)
    v1 = cached_build(cache, (a,), (1, "x"), mk("a1"))
    v2 = cached_build(cache, (a,), (1, "x"), mk("dup"))
    assert v1 == v2 == "a1" and builds == ["a1"]        # hit, no rebuild
    v3 = cached_build(cache, (a,), (2, "x"), mk("a2"))
    assert v3 == "a2"                                    # statics miss
    v4 = cached_build(cache, (b,), (1, "x"), mk("b1"))
    assert v4 == "b1"                                    # anchor miss
    # multi-anchor: every anchor must match by identity
    v5 = cached_build(cache, (a, b), (3,), mk("ab"))
    assert cached_build(cache, (a, b), (3,), mk("dup2")) == "ab"
    assert v5 == "ab" and builds == ["a1", "a2", "b1", "ab"]
