"""FID InceptionV3 in flax (NHWC) + torch-checkpoint weight conversion.

Re-design of ``diff_cifar/score/inception.py:16-324``: the pytorch-fid
InceptionV3 — torchvision's inception_v3 (num_classes=1008, no aux) with the
FID-specific block patches:

- InceptionA/C and Mixed_7b (E_1): 3x3 avg-pool with
  ``count_include_pad=False``;
- Mixed_7c (E_2): max-pool instead of avg-pool;
- fc without bias; block outputs 0-4 = [maxpool1, maxpool2, pre-aux, final
  avgpool (2048), softmax probs (1008)].

Weights cannot be downloaded in this environment; use
:func:`convert_torch_state_dict` on the ``pt_inception-2015-12-05`` .pth file
(torch-cpu is available for unpickling) and pass the resulting param tree.
Until weights are supplied, randomly-initialized features still exercise the
full pipeline (shape/flow tests), but FID numbers are only meaningful with the
reference weights.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _avg_pool_nocount(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 pad-1 average pool with count_include_pad=False."""
    ones = jnp.ones_like(x[..., :1])
    s = nn.pool(x, 0.0, jax.lax.add, (3, 3), (1, 1), ((1, 1), (1, 1)))
    c = nn.pool(ones, 0.0, jax.lax.add, (3, 3), (1, 1), ((1, 1), (1, 1)))
    return s / c


def _max_pool(x, window=3, stride=2, pad="VALID"):
    padding = pad if isinstance(pad, str) else ((pad, pad), (pad, pad))
    return nn.max_pool(x, (window, window), (stride, stride), padding)


class BasicConv(nn.Module):
    """conv(bias-free) + BN(eps=1e-3, inference) + relu."""

    features: int
    kernel: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "VALID"

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.features, tuple(self.kernel),
                    strides=tuple(self.strides), padding=pad,
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nocount(x)
        bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nocount(x)
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # 'avg' (Mixed_7b/E_1) | 'max' (Mixed_7c/E_2)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=(0, 1),
                        name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=(1, 0),
                        name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool_nocount(x)
        else:
            bp = nn.max_pool(x, (3, 3), (1, 1), ((1, 1), (1, 1)))
        bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Outputs a dict of requested blocks: 0..3 features, 4 = softmax probs."""

    output_blocks: Sequence[int] = (3,)
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        last = max(self.output_blocks)
        outs: Dict[int, jnp.ndarray] = {}
        if self.resize_input:
            x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]),
                                 method="bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0

        x = BasicConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        outs[0] = x
        if last >= 1:
            x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
            x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
            x = _max_pool(x)
            outs[1] = x
        if last >= 2:
            x = InceptionA(32, name="Mixed_5b")(x)
            x = InceptionA(64, name="Mixed_5c")(x)
            x = InceptionA(64, name="Mixed_5d")(x)
            x = InceptionB(name="Mixed_6a")(x)
            x = InceptionC(128, name="Mixed_6b")(x)
            x = InceptionC(160, name="Mixed_6c")(x)
            x = InceptionC(160, name="Mixed_6d")(x)
            x = InceptionC(192, name="Mixed_6e")(x)
            outs[2] = x
        if last >= 3:
            x = InceptionD(name="Mixed_7a")(x)
            x = InceptionE("avg", name="Mixed_7b")(x)
            x = InceptionE("max", name="Mixed_7c")(x)
            x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
            outs[3] = x
        if last >= 4:
            logits = nn.Dense(1008, use_bias=False, name="fc")(x)
            outs[4] = jax.nn.softmax(logits, axis=-1)
        return [outs[i] for i in sorted(self.output_blocks)]


def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"]
                             ) -> Dict[str, Any]:
    """Convert the pytorch-fid ``pt_inception-2015-12-05`` state_dict into
    flax {'params', 'batch_stats'} collections (NHWC kernels)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def assign(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, val in state_dict.items():
        v = np.asarray(val)
        parts = key.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                assign(params, ("fc", "kernel"), v.T)
            continue  # fc bias dropped in the FID model
        if parts[0] == "AuxLogits":
            continue
        module_path = parts[:-2]  # e.g. ['Mixed_5b', 'branch1x1']
        leaf_owner, leaf = parts[-2], parts[-1]
        base = tuple(module_path)
        if leaf_owner == "conv" and leaf == "weight":
            # OIHW -> HWIO
            assign(params, base + ("conv", "kernel"),
                   v.transpose(2, 3, 1, 0))
        elif leaf_owner == "bn":
            if leaf == "weight":
                assign(params, base + ("bn", "scale"), v)
            elif leaf == "bias":
                assign(params, base + ("bn", "bias"), v)
            elif leaf == "running_mean":
                assign(stats, base + ("bn", "mean"), v)
            elif leaf == "running_var":
                assign(stats, base + ("bn", "var"), v)
    return {"params": params, "batch_stats": stats}


def load_fid_params(pth_path: str) -> Dict[str, Any]:
    """Load + convert the torch FID weights file (requires torch for unpickling)."""
    import torch
    sd = torch.load(pth_path, map_location="cpu")
    return convert_torch_state_dict({k: v.numpy() for k, v in sd.items()})
