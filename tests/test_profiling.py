"""Tests for profiling/cost-analysis utilities."""
import jax.numpy as jnp

from unet_design_tpu.utils import profiling


def test_cost_analysis_flops():
    def f(x):
        return x @ x
    ca = profiling.cost_analysis(f, jnp.ones((64, 64)))
    # 64^3 * 2 = 524288 flops expected
    assert ca.get("flops", 0) >= 2 * 64 ** 3 * 0.9


def test_seed_everything():
    key = profiling.seed_everything(0)
    assert key.shape == (2,) or key.dtype.name.startswith("key")


def test_annotate_span():
    with profiling.annotate("test-span"):
        _ = jnp.ones(4).sum()
