"""Image datasets: MNIST (padded to 32), MNIST-Triangular, CIFAR-10, CelebA64.

Disk-format loaders (no network access is assumed):

- MNIST: raw idx files (``train-images-idx3-ubyte[.gz]``) or a pre-saved
  ``.npz``; normalized to mean 0.5/std 0.5 (i.e. [-1, 1]) and padded 28->32
  (``diff_mnist/data.py:221-300``).
- CIFAR-10: the python-pickle batch files (``data_batch_1..5``, ``test_batch``)
  or ``.npz``; random horizontal flip + [-1, 1] normalization
  (``diff_cifar/main.py:187-197``).
- CelebA64: the reference reads an LMDB (``data.py:319-505``); we read a
  directory of ``.npy``/``.npz`` shards (converted offline) since lmdb is not
  assumed available.

Every loader has a ``synthetic_*`` fallback generating structured random
images so the full training stack is exercisable without datasets (the
reference tests do the same with random tensors).
"""

from __future__ import annotations

import glob
import gzip
import os
import pickle
import struct
from typing import Optional, Tuple

import numpy as np


def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        shape = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(shape)


def load_mnist(root: str, train: bool = True,
               pad_to_32: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (images (N,H,W,1) float32 in [-1,1], labels (N,) int64)."""
    prefix = "train" if train else "t10k"
    imgs = labels = None
    npz = os.path.join(root, f"mnist_{prefix}.npz")
    if os.path.exists(npz):
        d = np.load(npz)
        imgs, labels = d["images"], d["labels"]
    else:
        for ext in ("", ".gz"):
            ip = os.path.join(root, f"{prefix}-images-idx3-ubyte{ext}")
            lp = os.path.join(root, f"{prefix}-labels-idx1-ubyte{ext}")
            if os.path.exists(ip) and os.path.exists(lp):
                imgs, labels = _read_idx(ip), _read_idx(lp)
                break
    if imgs is None:
        raise FileNotFoundError(f"No MNIST files under {root}")
    x = imgs.astype(np.float32) / 255.0
    x = (x - 0.5) / 0.5
    x = x[..., None]
    if pad_to_32:
        x = np.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)),
                   constant_values=-1.0)
    return x, labels.astype(np.int64)


def load_emnist(root: str, split: str = "letters", train: bool = True,
                pad_to_32: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """EMNIST loader (``torch_ddpm/ddpm/data/emnist.py`` counterpart); reads
    ``emnist-<split>-{train,test}-images-idx3-ubyte[.gz]`` idx files."""
    prefix = f"emnist-{split}-{'train' if train else 'test'}"
    for ext in ("", ".gz"):
        ip = os.path.join(root, f"{prefix}-images-idx3-ubyte{ext}")
        lp = os.path.join(root, f"{prefix}-labels-idx1-ubyte{ext}")
        if os.path.exists(ip) and os.path.exists(lp):
            imgs, labels = _read_idx(ip), _read_idx(lp)
            # EMNIST idx images are transposed relative to MNIST
            x = imgs.astype(np.float32).transpose(0, 2, 1) / 255.0
            x = ((x - 0.5) / 0.5)[..., None]
            if pad_to_32:
                x = np.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)),
                           constant_values=-1.0)
            return x, labels.astype(np.int64)
    raise FileNotFoundError(f"No EMNIST files under {root}")


def synthetic_mnist(n: int = 256, size: int = 32,
                    seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Digit-free stand-in: random smooth blobs in [-1, 1]."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, size // 4, size // 4, 1)).astype(np.float32)
    x = base.repeat(4, axis=1).repeat(4, axis=2)
    x = np.tanh(x)
    return x, rng.integers(0, 10, n).astype(np.int64)


def load_cifar10(root: str, train: bool = True
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (images (N,32,32,3) float32 in [-1,1], labels)."""
    npz = os.path.join(root, f"cifar10_{'train' if train else 'test'}.npz")
    if os.path.exists(npz):
        d = np.load(npz)
        data, labels = d["images"], d["labels"]
        x = data.astype(np.float32)
        if x.max() > 1.5:
            x = x / 255.0
    else:
        files = ([os.path.join(root, f"data_batch_{i}") for i in range(1, 6)]
                 if train else [os.path.join(root, "test_batch")])
        batches, labels_list = [], []
        for fp in files:
            if not os.path.exists(fp):
                raise FileNotFoundError(f"No CIFAR-10 batch {fp}")
            with open(fp, "rb") as f:
                d = pickle.load(f, encoding="bytes")
            batches.append(d[b"data"])
            labels_list.extend(d[b"labels"])
        raw = np.concatenate(batches).reshape(-1, 3, 32, 32)
        x = raw.transpose(0, 2, 3, 1).astype(np.float32) / 255.0
        labels = np.asarray(labels_list)
    x = (x - 0.5) / 0.5
    return x, labels.astype(np.int64)


def synthetic_cifar10(n: int = 256, seed: int = 0
                      ) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, 8, 8, 3)).astype(np.float32)
    x = np.tanh(base.repeat(4, axis=1).repeat(4, axis=2))
    return x, rng.integers(0, 10, n).astype(np.int64)


def load_celeba64(root: str, split: str = "train") -> np.ndarray:
    """CelebA64: reads the reference's LMDB layout directly when present
    (``diff_mnist/data.py:319-505``), else pre-converted .npy/.npz shards."""
    if os.path.exists(os.path.join(root, f"{split}.lmdb")):
        return load_celeba64_lmdb(root, split)
    shards = sorted(glob.glob(os.path.join(root, "*.np[yz]")))
    if not shards:
        raise FileNotFoundError(
            f"No CelebA {split}.lmdb or .npy/.npz shards under {root}")
    parts = []
    for s in shards:
        a = np.load(s)
        parts.append(a["images"] if hasattr(a, "files") else a)
    x = np.concatenate(parts).astype(np.float32)
    if x.max() > 1.5:
        x = x / 255.0
    return (x - 0.5) / 0.5


def _celeba_decode(payload: bytes, is_encoded: bool, size: int) -> np.ndarray:
    """One LMDB record -> (size,size,3) float32 in [0,1]: RGB decode, the
    NVAE crop box (15,40)-(163,188), bilinear resize, ToTensor scaling
    (``diff_mnist/data.py:429-455,484-499``)."""
    import io

    from PIL import Image

    if is_encoded:
        img = Image.open(io.BytesIO(payload)).convert("RGB")
    else:
        arr = np.frombuffer(payload, dtype=np.uint8)
        side = int(np.sqrt(len(arr) / 3))
        img = Image.fromarray(arr.reshape(side, side, 3), mode="RGB")
    img = img.crop((15, 40, 178 - 15, 218 - 30))
    img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def load_celeba64_lmdb(root: str, split: str = "train", size: int = 64,
                       is_encoded: bool = True,
                       limit: Optional[int] = None) -> np.ndarray:
    """Read the reference's CelebA64 LMDB (keys b'0', b'1', ... holding
    encoded images; ``diff_mnist/data.py:472-505``) into a normalized
    (N,size,size,3) array in [-1,1] (``get_celeba_datasets`` keeps [0,1]
    floats; the train driver's [-1,1] normalization is folded in here like
    the npy-shard path does).  Requires the optional ``lmdb`` package."""
    try:
        import lmdb
    except ImportError as e:  # pragma: no cover - exercised via stub
        raise ImportError(
            "the 'lmdb' package is required to read CelebA64 .lmdb files; "
            "either install it or convert once with "
            "scripts/convert_celeba_lmdb.py and point data.root at the "
            ".npy shards") from e
    path = os.path.join(root, f"{split}.lmdb")
    env = lmdb.open(path, readonly=True, max_readers=1, lock=False,
                    readahead=False, meminit=False)
    images = []
    with env.begin(write=False, buffers=True) as txn:
        n = txn.stat()["entries"]
        if limit is not None:
            n = min(n, limit)
        for i in range(n):
            payload = txn.get(str(i).encode())
            if payload is None:
                break
            images.append(_celeba_decode(bytes(payload), is_encoded, size))
    env.close()
    x = np.stack(images)
    return (x - 0.5) / 0.5


def random_horizontal_flip(x: np.ndarray,
                           rng: np.random.Generator) -> np.ndarray:
    """Per-sample horizontal flip with p=0.5 (torchvision semantics)."""
    flip = rng.random(x.shape[0]) < 0.5
    out = x.copy()
    out[flip] = out[flip, :, ::-1]
    return out
