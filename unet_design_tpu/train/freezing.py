"""Staged-training freezing as optax parameter labels.

The reference mutates ``param.requires_grad`` in place
(``diff_cifar/main.py:311-371``, ``pdearena/models/pdemodel.py:194-220``,
``wmh/train_pt.py:73-99``).  The functional equivalent: label every parameter
path 'train' or 'frozen' for the current stage and pass the label tree to
``optax.multi_transform`` (frozen leaves get ``optax.set_to_zero()``).  The
same label tree masks the EMA update, mirroring the reference's grad-is-None
EMA skip (``diff_cifar/main.py:57-77``).

Label rules are keyed on the *top-level module names* our models emit:

- MultiResUNet: ``time_emb_{l}``, ``down_{l}_{i}``, ``down_{l}_downsample``,
  ``middle_{k}``, ``up_{l}_{j}``, ``up_{l}_upsample``, ``tail_{l}``.
- UnetbaseG core: ``image_proj_{l}``, ``down_{l}``, ``up_{j}[_...]``,
  ``final_{j}``.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict

import jax

TRAIN = "train"
FROZEN = "frozen"


def label_tree(params: Dict[str, Any],
               top_level_label: Callable[[str], str]) -> Dict[str, Any]:
    """Label every leaf by its top-level module name."""
    return {
        name: jax.tree_util.tree_map(lambda _: top_level_label(name), sub)
        for name, sub in params.items()
    }


def multires_unet_labels(params: Dict[str, Any], n_levels: int,
                         n_levels_used: int) -> Dict[str, Any]:
    """diff_cifar freeze rules (``main.py:311-371``) for stage with
    ``n_levels_used`` active levels.

    Frozen: everything belonging to the coarsest ``n_levels_used - 1`` levels
    (levels ``l >= n_levels - n_levels_used + 1``) — decoder ResBlocks, tails,
    encoder blocks, time embeddings — plus the middle blocks once
    ``n_levels_used >= 2``.  Exception: the UpSample of level
    ``n_levels - n_levels_used + 1`` stays trainable (it feeds the *new*
    finest level and was never used before; ``main.py:326``).
    """
    n = n_levels_used
    if n <= 1:
        return label_tree(params, lambda _: TRAIN)
    first_frozen_level = n_levels - n + 1

    def lab(name: str) -> str:
        m = re.match(r"(time_emb|down|up|tail)_(\d+)", name)
        if m:
            level = int(m.group(2))
            if level < first_frozen_level:
                return TRAIN
            if name == f"up_{first_frozen_level}_upsample":
                return TRAIN  # the 'final' UpSample exception
            return FROZEN
        if name.startswith("middle"):
            return FROZEN
        return TRAIN

    return label_tree(params, lab)


def unetbase_g_labels(params: Dict[str, Any], n_levels: int,
                      n_levels_used: int) -> Dict[str, Any]:
    """pdearena/wmh freeze rules (``pdemodel.py:194-220`` /
    ``train_pt.py:73-99``) for the UnetbaseG *core* param tree.

    Frozen: ``down_i`` for the coarsest ``n_levels_used - 1`` levels
    (i >= n_levels - n_levels_used + 1), ``up_j`` for j < n_levels_used - 1,
    heads ``image_proj_k`` for k > n_levels - n_levels_used, and tails
    ``final_l`` for l < n_levels_used - 1.
    """
    if set(params.keys()) == {"core"}:  # UnetbaseG / WMHSegUnet wrapper
        return {"core": unetbase_g_labels(params["core"], n_levels,
                                          n_levels_used)}
    n = n_levels_used
    if n <= 1:
        return label_tree(params, lambda _: TRAIN)

    def lab(name: str) -> str:
        m = re.match(r"down_(\d+)", name)
        if m:
            return FROZEN if int(m.group(1)) >= n_levels - n + 1 else TRAIN
        m = re.match(r"up_(\d+)", name)
        if m:
            return FROZEN if int(m.group(1)) < n - 1 else TRAIN
        m = re.match(r"image_proj_(\d+)", name)
        if m:
            return FROZEN if int(m.group(1)) > n_levels - n else TRAIN
        m = re.match(r"final_(\d+)", name)
        if m:
            return FROZEN if int(m.group(1)) < n - 1 else TRAIN
        return TRAIN

    return label_tree(params, lab)


def openai_wavelet_labels(params: Dict[str, Any], n_levels: int,
                          n_levels_used: int) -> Dict[str, Any]:
    """diff_mnist freeze rules (``diff_mnist/main.py:248-308``) for the
    WaveletUNetOpenAI param tree.

    Frozen at stage with n levels used (levels >= first_frozen =
    n_levels-n+1): decoder blocks ``dec_{l}_*``, encoder blocks ``enc_{l}_*``,
    time embeddings ``time_embed_{l}``; upsamples ``dec_{l}_up`` only for
    l > first_frozen (the coarsest-level upsample feeding the new finest level
    stays trainable, main.py:266); step-indexed output heads ``out_act_{p}`` /
    ``out_reduce_{p}`` for p < n-1; middle for n >= 2.
    """
    n = n_levels_used
    if n <= 1:
        return label_tree(params, lambda _: TRAIN)
    first_frozen = n_levels - n + 1

    def lab(name: str) -> str:
        m = re.match(r"dec_(\d+)_up$", name)
        if m:
            return FROZEN if int(m.group(1)) > first_frozen else TRAIN
        m = re.match(r"(enc|dec|time_embed)_(\d+)", name)
        if m:
            return FROZEN if int(m.group(2)) >= first_frozen else TRAIN
        m = re.match(r"(out_act|out_reduce)_(\d+)", name)
        if m:
            return FROZEN if int(m.group(2)) < n - 1 else TRAIN
        if name.startswith("middle"):
            return FROZEN
        return TRAIN

    return label_tree(params, lab)


def all_train_labels(params: Dict[str, Any]) -> Dict[str, Any]:
    return label_tree(params, lambda _: TRAIN)


def trainable_mask(labels) -> Any:
    """Label tree -> boolean mask tree (True where trainable)."""
    return jax.tree_util.tree_map(lambda l: l == TRAIN, labels)
