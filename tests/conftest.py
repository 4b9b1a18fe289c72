"""Test configuration: force CPU with 8 virtual devices for mesh tests.

The environment pins JAX_PLATFORMS=axon (the tunneled TPU).  For tests we run
on CPU with 8 virtual devices so sharding/mesh tests work without real chips.
``jax.config.update('jax_platforms', ...)`` is the override that actually takes
effect here (mutating os.environ['JAX_PLATFORMS'] does not deregister axon).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _no_ambient_stop_files(monkeypatch):
    """Trainers honor /tmp stop files (bench/chain drain protocol); a file
    left by a concurrently-draining TPU chain must not abort test training
    loops.  Tests of the stop behavior re-monkeypatch their own path."""
    from unet_design_tpu.tasks import diff_cifar, pde
    from unet_design_tpu.train import trainer
    for mod in (trainer, diff_cifar, pde):
        monkeypatch.setattr(mod, "STOP_FILES", (), raising=False)
