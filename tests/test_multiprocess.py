"""Multi-process data parallelism, actually exercised with process_count > 1.

The reference's DDP path shards data by ``dist.get_rank()``
(``pdearena/pdearena/data/twod/datapipes/shallowwater2d.py:68-87``) and lets
the backend all-reduce gradients.  Here two real OS processes initialize
``jax.distributed`` over localhost (CPU), shard the batch with
``loader.shard_for_process``, run jitted train steps over a 2-device global
mesh, and must agree bit-for-bit with each other AND with a single-process
run on the full batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(os.path.dirname(os.path.dirname(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    env.pop("XLA_FLAGS", None)   # 1 local CPU device per rank
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    outs = [str(tmp_path / f"rank{r}.json") for r in (0, 1)]
    procs = [subprocess.Popen([sys.executable, worker, str(port), str(r),
                               outs[r]], env=env,
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
             for r in (0, 1)]
    for p in procs:
        out, _ = p.communicate(timeout=240)
        assert p.returncode == 0, out.decode()[-2000:]

    results = [json.load(open(o)) for o in outs]
    assert results[0]["n_local"] == results[1]["n_local"] == 4

    # both ranks observed the same (global) losses and final params
    np.testing.assert_array_equal(results[0]["losses"], results[1]["losses"])
    np.testing.assert_array_equal(results[0]["w"], results[1]["w"])

    # single-process reference on the full batch (mean is permutation-
    # invariant, so the strided rank sharding reorders nothing that matters)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((8, 4)).astype(np.float32)
    Y = rng.standard_normal((8, 1)).astype(np.float32)
    w = rng.standard_normal((4, 1)).astype(np.float32)
    losses = []
    for _ in range(3):
        pred = X @ w
        losses.append(float(np.mean((pred - Y) ** 2)))
        grad = 2.0 * X.T @ (pred - Y) / len(X)
        w = w - 0.1 * grad
    np.testing.assert_allclose(results[0]["losses"], losses, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(results[0]["w"]).ravel(),
                               w.ravel(), rtol=1e-5)
