"""WMH leave-one-out protocol.

Re-design of the reference's legacy challenge pipeline
(``wmh/train_leave_one_out.py`` / ``test_leave_one_out.py`` — Keras in the
reference, not used by ``train_pt.py``): train one segmentation U-Net per
held-out patient on all remaining patients' slices, then evaluate the held-out
patient with the challenge metrics (DSC, H95, lesion recall/F1, AVD).  An
optional model ensemble averages predictions (``submission_sysu_`` style).

Patient slice extents follow the challenge layout: 48 slices/patient for
Utrecht+Singapore (patients 0-39), 83 for GE3T (40-59).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from unet_design_tpu.data import loader as loader_lib
from unet_design_tpu.evalx import wmh_metrics
from unet_design_tpu.models.unetbase import WMHSegUnet
from unet_design_tpu.process import losses as losses_lib
from unet_design_tpu.train import freezing, trainer
from unet_design_tpu.utils.logging import get_logger

log = get_logger(__name__)


def patient_slice_ranges(n_site01: int = 40, n_site2: int = 20,
                         slices01: int = 48, slices2: int = 83
                         ) -> List[Tuple[int, int]]:
    ranges = []
    offset = 0
    for p in range(n_site01 + n_site2):
        n = slices01 if p < n_site01 else slices2
        ranges.append((offset, offset + n))
        offset += n
    return ranges


@dataclasses.dataclass
class LOOConfig:
    model: str = "seg_unet"   # seg_unet | legacy (first-kernel 5) | legacy3
    hidden_channels: int = 16
    activation: str = "gelu"
    dwt_encoder: bool = False
    epochs: int = 5
    lr: float = 1e-4
    batch_size: int = 32
    threshold: float = 0.5
    seed: int = 0


def build_loo_model(cfg: LOOConfig):
    """``seg_unet`` = the modern Multi-ResNet-capable net (train_pt path);
    ``legacy``/``legacy3`` = the challenge-winning Keras net's two
    kernel-scale ensemble arms (``wmh/train_leave_one_out.py:56-113``)."""
    if cfg.model == "seg_unet":
        return WMHSegUnet(hidden_channels=cfg.hidden_channels,
                          activation=cfg.activation,
                          dwt_encoder=cfg.dwt_encoder)
    if cfg.model in ("legacy", "legacy3"):
        from unet_design_tpu.models.wmh_legacy import WMHLegacyUnet
        return WMHLegacyUnet(first5=cfg.model == "legacy")
    raise ValueError(f"unknown LOO model {cfg.model!r}")


def train_one(cfg: LOOConfig, images: np.ndarray, masks: np.ndarray,
              rng: jax.Array):
    model = build_loo_model(cfg)
    init_rng, rng = jax.random.split(rng)
    params = model.init(init_rng,
                        jnp.zeros((1, *images.shape[1:])))["params"]
    labels = freezing.all_train_labels(params)
    tx = trainer.make_optimizer(cfg.lr, labels=labels)
    state = trainer.TrainState.create(params, rng, tx.init(params),
                                      ema=False)

    def loss_fn(p, step_rng, batch):
        x, y = batch
        pred = model.apply({"params": p}, x)
        return losses_lib.dice_coef_loss(pred, y), ()

    step_fn = trainer.make_train_step(loss_fn, tx, jit=True)
    shuffle = np.random.default_rng(cfg.seed)
    for _ in range(cfg.epochs):
        for bx, by in loader_lib.epoch_batches([images, masks],
                                               cfg.batch_size, shuffle,
                                               drop_last=False):
            state, loss, _ = step_fn(state, (jnp.asarray(bx),
                                             jnp.asarray(by)))
    predict = jax.jit(lambda p, x: model.apply({"params": p}, x))
    return state.params, predict


def evaluate_patient(predict, params_list: Sequence, images: np.ndarray,
                     masks: np.ndarray, threshold: float = 0.5,
                     spacing: Optional[Sequence[float]] = None
                     ) -> Dict[str, float]:
    """Challenge metrics on one patient; params_list > 1 = ensemble mean.

    ``spacing`` = per-patient voxel spacing (slice,row,col) mm so H95 is in
    world millimetres like the reference (``wmh/evaluation.py:121-137``)."""
    preds = np.mean([np.asarray(predict(p, jnp.asarray(images)))
                     for p in params_list], axis=0)
    binary = (preds[..., 0] >= threshold)
    mask = masks[..., 0] >= 0.5
    recall, precision, f1 = wmh_metrics.lesion_detection(mask, binary)
    return {
        "dsc": wmh_metrics.dsc(mask, binary),
        "h95": wmh_metrics.hausdorff95(mask, binary, spacing=spacing),
        "avd": wmh_metrics.avd(mask, binary),
        "lesion_recall": recall,
        "lesion_f1": f1,
    }


def default_patient_spacings(n_site01: int = 40, n_site2: int = 20
                             ) -> List[Tuple[float, ...]]:
    """Challenge-nominal spacing per patient: Utrecht (0-19), Singapore
    (20-39), GE3T (40-59) in the standard 60-patient layout."""
    from unet_design_tpu.data.wmh import CHALLENGE_SPACINGS
    half = n_site01 // 2
    return ([CHALLENGE_SPACINGS["utrecht"]] * half
            + [CHALLENGE_SPACINGS["singapore"]] * (n_site01 - half)
            + [CHALLENGE_SPACINGS["ge3t"]] * n_site2)


def leave_one_out(cfg: LOOConfig, images: np.ndarray, masks: np.ndarray,
                  slice_ranges: Optional[List[Tuple[int, int]]] = None,
                  patients: Optional[Sequence[int]] = None,
                  spacings: Optional[Sequence[Sequence[float]]] = None
                  ) -> Dict[int, Dict[str, float]]:
    """Run the LOO protocol; returns per-patient challenge metrics.

    ``spacings[p]`` is patient p's voxel spacing (from
    ``read_nifti_with_spacing`` for real data); H95 falls back to voxel
    units when omitted."""
    ranges = slice_ranges or patient_slice_ranges()
    patients = patients if patients is not None else range(len(ranges))
    rng = jax.random.PRNGKey(cfg.seed)
    results = {}
    for p in patients:
        s, e = ranges[p]
        keep = np.r_[0:s, e:images.shape[0]]
        rng, t_rng = jax.random.split(rng)
        params, predict = train_one(cfg, images[keep], masks[keep], t_rng)
        results[p] = evaluate_patient(
            predict, [params], images[s:e], masks[s:e], cfg.threshold,
            spacing=spacings[p] if spacings is not None else None)
        log.info("patient %d: %s", p, results[p])
    return results
