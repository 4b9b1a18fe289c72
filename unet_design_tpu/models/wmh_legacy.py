"""Legacy WMH-challenge U-Net (the 2017 challenge-winning ensemble member).

Behavioral re-design of the reference's Keras network
(``wmh/train_leave_one_out.py:56-113`` ``get_unet``), the model its legacy
leave-one-out stack trains and ensembles (``wmh/submission_sysu_.py``); the
reference's modern ``train_pt.py`` path does not use it.  Channel plan
64/96/128/256/512; the "two-scale kernel" ensemble axis is the first two
convs' kernel size: 5 (``first5=True``) vs 3 — the challenge submission
averages both variants.  Quirks kept on purpose:

- conv4's SECOND conv uses kernel 4 (``train_leave_one_out.py:75``) with
  TF 'SAME' asymmetric padding (low 1 / high 2) — flax 'SAME' matches TF
  here (the torch mismatch documented in CLAUDE.md is stride-2 only);
- non-dyadic shapes (200 -> 100 -> 50 -> 25 -> 12) are handled by VALID
  max-pool floors down and crop-to-match skips up
  (``get_crop_shape:39-54``, odd diffs split floor/ceil with the extra
  row cropped from the END), then a final zero-pad back to the input
  size (``train_leave_one_out.py:108-109``);
- sigmoid 1-channel head (``:110``).

TPU note: plain convs + pools, NHWC, optional bf16 compute — XLA fuses
the relu chains; nothing here needs a custom kernel.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from unet_design_tpu.ops.blocks import nearest_upsample


def _crop_like(target: jnp.ndarray, refer: jnp.ndarray) -> jnp.ndarray:
    """Keras ``Cropping2D(get_crop_shape(target, refer))``: trim `target`
    (the skip) to `refer`'s spatial size, odd diffs cropping one extra
    row/col from the end (``train_leave_one_out.py:39-54``)."""
    dh = target.shape[1] - refer.shape[1]
    dw = target.shape[2] - refer.shape[2]
    assert dh >= 0 and dw >= 0, (target.shape, refer.shape)
    h0, w0 = dh // 2, dw // 2
    return target[:, h0:h0 + refer.shape[1], w0:w0 + refer.shape[2], :]


class WMHLegacyUnet(nn.Module):
    """4-level crop-concat U-Net, channels (64, 96, 128, 256, 512)."""

    first5: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = lambda nd, k: nn.Conv(nd, (k, k), padding="SAME",
                                     dtype=self.dtype)
        cbr = lambda h, nd, k: nn.relu(conv(nd, k)(h))
        pool = lambda h: nn.max_pool(h, (2, 2), (2, 2), padding="VALID")

        k1 = 5 if self.first5 else 3
        c1 = cbr(cbr(x.astype(self.dtype), 64, k1), 64, k1)
        c2 = cbr(cbr(pool(c1), 96, 3), 96, 3)
        c3 = cbr(cbr(pool(c2), 128, 3), 128, 3)
        c4 = cbr(cbr(pool(c3), 256, 3), 256, 4)   # kernel-4 quirk kept
        c5 = cbr(cbr(pool(c4), 512, 3), 512, 3)

        h = jnp.concatenate([nearest_upsample(c5),
                             _crop_like(c4, nearest_upsample(c5))], axis=-1)
        h = cbr(cbr(h, 256, 3), 256, 3)
        h = jnp.concatenate([nearest_upsample(h),
                             _crop_like(c3, nearest_upsample(h))], axis=-1)
        h = cbr(cbr(h, 128, 3), 128, 3)
        h = jnp.concatenate([nearest_upsample(h),
                             _crop_like(c2, nearest_upsample(h))], axis=-1)
        h = cbr(cbr(h, 96, 3), 96, 3)
        h = jnp.concatenate([nearest_upsample(h),
                             _crop_like(c1, nearest_upsample(h))], axis=-1)
        h = cbr(cbr(h, 64, 3), 64, 3)

        # zero-pad back to the input size (odd diffs pad one extra at the
        # end, mirroring get_crop_shape's split)
        dh = x.shape[1] - h.shape[1]
        dw = x.shape[2] - h.shape[2]
        h = jnp.pad(h, ((0, 0), (dh // 2, dh - dh // 2),
                        (dw // 2, dw - dw // 2), (0, 0)))
        out = nn.Conv(1, (1, 1), dtype=self.dtype)(h)
        return nn.sigmoid(out.astype(jnp.float32))
