"""Tests for utils (benchtime, logging) and checkpointing."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from unet_design_tpu.train.checkpoint import CheckpointManager
from unet_design_tpu.utils import benchtime
from unet_design_tpu.utils.logging import MetricsLogger, Timer, get_logger


def test_benchtime_measure_cpu():
    def f(x):
        return x @ x
    x = jnp.ones((64, 64))
    t = benchtime.measure(f, (x,), n_iters=5, n_warmup=1)
    assert t >= 0.0


def test_benchtime_measure_scalar_output():
    """Scalar-returning fns (loss+grad probes) must not break the scan
    carry dtype (_scalar_of once fell back to python-int 0 for 0-dim
    outputs — the ablate_fno leg-1 failure)."""
    def f(x):
        return jnp.sum(x ** 2)     # 0-dim output
    x = jnp.ones((8, 8))
    t = benchtime.measure(f, (x,), n_iters=5, n_warmup=1)
    assert t >= 0.0


def test_timer_and_logger(tmp_path):
    with Timer() as t:
        sum(range(1000))
    assert t.dt >= 0
    log = get_logger("test")
    ml = MetricsLogger(str(tmp_path))
    ml.log({"train/loss": 1.5, "x": np.float32(2.0)}, step=3)
    ml.close()
    with open(tmp_path / "metrics.jsonl") as f:
        rec = json.loads(f.readline())
    assert rec["step"] == 3 and rec["train/loss"] == 1.5


def test_checkpoint_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state = {"params": {"w": jnp.arange(4.0), "b": jnp.ones((2, 2))},
             "step": jnp.asarray(7)}
    mgr.save(7, state, extra={"note": "hello"})
    assert mgr.latest_step() == 7
    target = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = mgr.restore(7, target)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(4.0))
    assert mgr.load_extra(7) == {"note": "hello"}


def test_checkpoint_keep_policy(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    for s in (1, 2, 3):
        mgr.save(s, {"a": jnp.ones(2) * s})
    assert mgr.latest_step() == 3
    r = mgr.restore(None, {"a": jnp.zeros(2)})
    np.testing.assert_array_equal(np.asarray(r["a"]), 3.0)
