"""Pallas TPU kernels.

Validated against reference implementations in interpret mode
(``tests/test_pallas_kernels.py``) and on hardware for direct calls.

Operational note (tunneled axon TPU backends): a ``pallas_call`` inside a
``lax.scan`` body has been observed to wedge the device — keep kernels out of
scan bodies (the DDPM sampler scan uses the plain-XLA GroupNorm path) and
benchmark them with unrolled repeats, never
``utils.benchtime.make_repeated``.  Kernel usage in the model path is gated on
``UNET_TPU_PALLAS=1``.
"""

import os


def pallas_enabled() -> bool:
    return os.environ.get("UNET_TPU_PALLAS", "0") == "1"
