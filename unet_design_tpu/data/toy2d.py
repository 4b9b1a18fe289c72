"""2D toy datasets for the MLP score network.

Port of ``torch_ddpm/ddpm/data/two_dim.py``: mixture, scurve, swiss, moon,
circle, checker, pinwheel, 8gaussians — numpy + sklearn, returned as
(N, 2) float32 samples scaled as in the reference.
"""

from __future__ import annotations

import numpy as np


def two_dim(npar: int, data: str, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if data == "mixture":
        x = rng.standard_normal((npar, 2))
        p = npar // 2
        x[:p, 0] -= 7.0
        x[p:, 0] += 7.0
        return x.astype(np.float32)
    if data in ("scurve", "swiss", "moon", "circle"):
        from sklearn import datasets
        if data == "scurve":
            X, _ = datasets.make_s_curve(npar, noise=0.0, random_state=seed)
            x = X[:, [0, 2]]
            x = (x - x.mean()) / x.std() * 7
        elif data == "swiss":
            X, _ = datasets.make_swiss_roll(npar, noise=0.0, random_state=seed)
            x = X[:, [0, 2]]
            x = (x - x.mean()) / x.std() * 7
        elif data == "moon":
            X, _ = datasets.make_moons(npar, noise=0.0, random_state=seed)
            x = (X - X.mean()) / X.std() * 7.0
        else:
            X, _ = datasets.make_circles(npar, noise=0.0, random_state=seed,
                                         factor=0.5)
            x = X * 10
        return np.asarray(x, np.float32)
    if data == "checker":
        x1 = rng.random(npar) * 4 - 2
        x2_ = rng.random(npar) - rng.integers(0, 2, npar) * 2
        x2 = x2_ + (np.floor(x1) % 2)
        return (np.stack([x1, x2], axis=1) * 7.5).astype(np.float32)
    if data == "pinwheel":
        radial_std, tangential_std = 0.3, 0.1
        num_classes, rate = 5, 0.25
        num_per_class = npar // num_classes
        rads = np.linspace(0, 2 * np.pi, num_classes, endpoint=False)
        features = rng.standard_normal((num_classes * num_per_class, 2)) \
            * np.array([radial_std, tangential_std])
        features[:, 0] += 1.0
        labels = np.repeat(np.arange(num_classes), num_per_class)
        angles = rads[labels] + rate * np.exp(features[:, 0])
        rotations = np.stack([np.cos(angles), -np.sin(angles),
                              np.sin(angles), np.cos(angles)])
        rotations = rotations.T.reshape(-1, 2, 2)
        x = 7.5 * rng.permutation(
            np.einsum("ti,tij->tj", features, rotations))
        return x.astype(np.float32)
    if data == "8gaussians":
        scale = 4.0
        centers = [(1, 0), (-1, 0), (0, 1), (0, -1),
                   (1 / np.sqrt(2), 1 / np.sqrt(2)),
                   (1 / np.sqrt(2), -1 / np.sqrt(2)),
                   (-1 / np.sqrt(2), 1 / np.sqrt(2)),
                   (-1 / np.sqrt(2), -1 / np.sqrt(2))]
        centers = scale * np.asarray(centers)
        idx = rng.integers(0, 8, npar)
        x = rng.standard_normal((npar, 2)) * 0.5 + centers[idx]
        return (x / 1.414).astype(np.float32)
    raise ValueError(f"unknown 2D toy dataset {data!r}")
