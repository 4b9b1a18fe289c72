"""CelebA64 LMDB reader (``diff_mnist/data.py:319-505`` parity).

The real ``lmdb`` package is not installed here, so a dict-backed stub with
the same ``open/begin/get/stat`` API serves a tiny synthetic database of
PNG-encoded 178x218 images — exercising the full decode -> NVAE crop ->
bilinear resize -> normalize path and the converter script.
"""

import io
import os
import sys
import types

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image


class _FakeTxn:
    def __init__(self, store):
        self._store = store

    def get(self, key):
        return self._store.get(key)

    def stat(self):
        return {"entries": len(self._store)}

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeEnv:
    def __init__(self, store):
        self._store = store

    def begin(self, write=False, buffers=True):
        return _FakeTxn(self._store)

    def close(self):
        pass


def _install_fake_lmdb(stores):
    """stores: {lmdb_path: {key_bytes: value_bytes}}"""
    mod = types.ModuleType("lmdb")

    def open(path, **kwargs):
        return _FakeEnv(stores[path])

    mod.open = open
    sys.modules["lmdb"] = mod
    return mod


def _make_store(n, seed=0):
    rng = np.random.default_rng(seed)
    store, raws = {}, []
    for i in range(n):
        raw = rng.integers(0, 256, (218, 178, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(raw).save(buf, format="PNG")
        store[str(i).encode()] = buf.getvalue()
        raws.append(raw)
    return store, raws


@pytest.fixture
def fake_lmdb_root(tmp_path):
    root = tmp_path / "celeba64_lmdb"
    root.mkdir()
    path = str(root / "train.lmdb")
    open(path, "w").close()   # existence check only; the stub serves data
    store, raws = _make_store(5)
    _install_fake_lmdb({path: store})
    yield str(root), raws
    sys.modules.pop("lmdb", None)


def test_lmdb_reader_crop_resize_normalize(fake_lmdb_root):
    from unet_design_tpu.data import image as image_data
    root, raws = fake_lmdb_root
    x = image_data.load_celeba64_lmdb(root, "train")
    assert x.shape == (5, 64, 64, 3) and x.dtype == np.float32
    assert -1.0 <= x.min() and x.max() <= 1.0

    # element-wise check vs a manual PIL crop+resize of the raw image
    ref = Image.fromarray(raws[0]).crop((15, 40, 163, 188)) \
        .resize((64, 64), Image.BILINEAR)
    ref = (np.asarray(ref, np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(x[0], ref, atol=1e-6)


def test_load_celeba64_dispatches_to_lmdb(fake_lmdb_root):
    from unet_design_tpu.data import image as image_data
    root, _ = fake_lmdb_root
    x = image_data.load_celeba64(root, "train")
    assert x.shape == (5, 64, 64, 3)


def test_converter_roundtrip(fake_lmdb_root, tmp_path):
    from unet_design_tpu.data import image as image_data
    root, _ = fake_lmdb_root
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    try:
        import convert_celeba_lmdb
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "npy")
    convert_celeba_lmdb.main([root, "--split", "train", "--out", out,
                              "--shard-size", "2"])
    assert len(os.listdir(out)) == 3   # 5 images, shards of 2
    from_lmdb = image_data.load_celeba64_lmdb(root, "train")
    from_npy = image_data.load_celeba64(out)
    np.testing.assert_allclose(from_npy, from_lmdb, atol=1e-6)
