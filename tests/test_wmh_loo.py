"""Smoke test for the WMH leave-one-out protocol."""
import numpy as np
import pytest

from unet_design_tpu.data import wmh as wmh_data
from unet_design_tpu.tasks import wmh_leave_one_out as loo


def test_patient_slice_ranges():
    r = loo.patient_slice_ranges()
    assert len(r) == 60
    assert r[0] == (0, 48) and r[39] == (39 * 48, 40 * 48)
    assert r[40][1] - r[40][0] == 83
    assert r[-1][1] == 48 * 40 + 83 * 20


@pytest.mark.slow
def test_leave_one_out_two_patients():
    imgs, masks = wmh_data.synthetic_wmh(12, size=32)
    ranges = [(0, 4), (4, 8), (8, 12)]
    cfg = loo.LOOConfig(hidden_channels=4, epochs=1, batch_size=4)
    results = loo.leave_one_out(cfg, imgs, masks, ranges, patients=[0, 1])
    assert set(results) == {0, 1}
    for m in results.values():
        assert 0.0 <= m["dsc"] <= 1.0
