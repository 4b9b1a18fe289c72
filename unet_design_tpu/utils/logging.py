"""Metrics logging and timing.

Replaces the reference's wandb-everywhere logging (SURVEY.md §5): a
rank-zero-guarded :class:`MetricsLogger` writes JSONL scalars (and figure
files) locally and forwards to wandb when available/configured — the scalar
channel names match the reference (``train/loss``, ``train/res_<r>_loss``,
``valid/unrolled_loss_mean``...).  :class:`Timer` mirrors
``pdearena/utils.py:17-23``.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


def get_logger(name: str = "unet_design_tpu") -> logging.Logger:
    """Rank-zero-guarded python logger (``pdearena/utils.py:27-45``)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s: %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO
                        if jax.process_index() == 0 else logging.WARNING)
    return logger


class Timer:
    """Context-manager timer (``pdearena/utils.py:17-23``)."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.end = time.perf_counter()
        self.dt = self.end - self.start
        return False


class MetricsLogger:
    def __init__(self, logdir: Optional[str] = None, use_wandb: bool = False,
                 wandb_kwargs: Optional[Dict[str, Any]] = None):
        self.is_main = jax.process_index() == 0
        self.logdir = logdir
        self._file = None
        self._wandb = None
        if self.is_main and logdir:
            os.makedirs(logdir, exist_ok=True)
            self._file = open(os.path.join(logdir, "metrics.jsonl"), "a")
        if self.is_main and use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                get_logger().warning("wandb requested but not installed; "
                                     "logging to JSONL only")

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        if not self.is_main:
            return
        record = {"step": int(step), "t": round(time.time(), 3)}
        for k, v in metrics.items():
            record[k] = float(v) if np.isscalar(v) or hasattr(v, "item") \
                else v
        if self._file:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def log_figure(self, name: str, fig, step: int,
                   close: bool = True) -> None:
        if not self.is_main:
            return
        if self.logdir:
            path = os.path.join(self.logdir, "figures")
            os.makedirs(path, exist_ok=True)
            fig.savefig(os.path.join(path, f"{name.replace('/', '_')}"
                                           f"_{step}.png"))
        if self._wandb:
            self._wandb.log({name: self._wandb.Image(fig)}, step=step)
        if close:
            import matplotlib.pyplot as plt
            plt.close(fig)

    def close(self):
        if self._file:
            self._file.close()
