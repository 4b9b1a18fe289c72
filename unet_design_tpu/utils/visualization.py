"""Plotting utilities.

Ports of the reference's figure generators: sample grids
(``diff_mnist/plotting.py:23``), scalar-field rollout comparison panels
(``pdearena/visualization.py:10-111``), segmentation overlays with TP/FP/FN
coloring (``wmh/plotting.py:83``), and U-Net norm-vs-t curves
(``diff_mnist/plotting.py:194``).  All matplotlib, headless (Agg).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_sample_grid(images: np.ndarray, n_rows: int, n_cols: int,
                     title: Optional[str] = None):
    """Grid of (N, H, W, C) images in [-1, 1] or [0, 1]."""
    fig, axes = plt.subplots(n_rows, n_cols,
                             figsize=(n_cols * 1.2, n_rows * 1.2))
    axes = np.atleast_1d(axes).ravel()
    imgs = np.asarray(images)
    if imgs.min() < -0.01:
        imgs = (imgs + 1.0) / 2.0
    for i, ax in enumerate(axes):
        if i < len(imgs):
            im = imgs[i]
            ax.imshow(im.squeeze(-1) if im.shape[-1] == 1 else im,
                      cmap="gray" if im.shape[-1] == 1 else None,
                      vmin=0, vmax=1)
        ax.set_xticks([])
        ax.set_yticks([])
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    return fig


def plot_scalar_field(ax, field: np.ndarray, title: str = ""):
    im = ax.imshow(field, cmap="twilight")
    ax.set_title(title)
    ax.set_xticks([])
    ax.set_yticks([])
    return im


def plot_scalar_sequence_comparison(init_field: np.ndarray,
                                    ground_truth: np.ndarray,
                                    prediction: np.ndarray):
    """Rollout comparison panel (``pdearena/visualization.py:52-111``):
    rows = [input window | ground truth | prediction | abs error]."""
    t_in, t_out = init_field.shape[0], ground_truth.shape[0]
    ncols = max(t_in, t_out)
    fig, axes = plt.subplots(4, ncols, figsize=(ncols * 1.6, 4 * 1.6))
    for t in range(ncols):
        for r in range(4):
            axes[r, t].set_xticks([])
            axes[r, t].set_yticks([])
        if t < t_in:
            plot_scalar_field(axes[0, t], init_field[t], f"in t={t}")
        if t < t_out:
            plot_scalar_field(axes[1, t], ground_truth[t], f"gt t={t}")
            plot_scalar_field(axes[2, t], prediction[t], f"pred t={t}")
            axes[3, t].imshow(np.abs(ground_truth[t] - prediction[t]),
                              cmap="magma")
    fig.tight_layout()
    return fig


def plot_segmentation(image: np.ndarray, mask: np.ndarray,
                      pred: np.ndarray, threshold: float = 0.5):
    """Overlay with TP green / FP red / FN blue (``wmh/plotting.py:83``)."""
    p = pred >= threshold
    m = mask >= 0.5
    base = np.asarray(image, np.float32)
    base = (base - base.min()) / (np.ptp(base) + 1e-8)
    rgb = np.stack([base] * 3, axis=-1)
    rgb[np.logical_and(p, m)] = [0, 1, 0]      # TP
    rgb[np.logical_and(p, ~m)] = [1, 0, 0]     # FP
    rgb[np.logical_and(~p, m)] = [0, 0, 1]     # FN
    fig, ax = plt.subplots(figsize=(4, 4))
    ax.imshow(rgb)
    ax.set_xticks([])
    ax.set_yticks([])
    fig.tight_layout()
    return fig


def plot_unet_norms(norms: Dict[str, Dict[int, List[float]]],
                    t_values: Sequence[float]):
    """Per-block activation norm vs diffusion time
    (``diff_mnist/plotting.py:194`` family).  ``norms[t_idx]`` as returned by
    ``WaveletUNetOpenAI(..., return_norms=True)`` collected per timestep."""
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
    for ax, section in zip(axes, ("down", "middle", "up")):
        for key in sorted({k for n in norms.values()
                           for k in n.get(section, {})}):
            ys = [float(np.mean(n[section][key])) for n in norms.values()
                  if key in n.get(section, {})]
            ax.plot(list(t_values)[:len(ys)], ys, label=f"level {key}")
        ax.set_title(section)
        ax.set_xlabel("t")
        ax.legend(fontsize=6)
    fig.tight_layout()
    return fig
