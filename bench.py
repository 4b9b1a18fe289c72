"""Benchmark entry point — prints ONE JSON line for the driver.

Metric: Unetbase-64 forward latency at the reference benchmark configuration
(batch 8, 4 history frames, 3 fields, 128x128 grid, fp32 inputs/params),
directly comparable to the published ``pdearena/docs/modelzoo.md:44`` number:
**0.021 s on a Tesla V100-16GB** (``benchmark/fwdbench.py:27-77`` protocol:
warmup then timed repeats with device synchronization).

Timing uses an in-graph ``lax.scan`` repeat with a forced dependency chain and
a scalar fetch (see ``unet_design_tpu/utils/benchtime.py``) because
``block_until_ready`` does not synchronize through tunneled TPU backends.

``vs_baseline`` is the speedup over the published reference number
(baseline_seconds / our_seconds; > 1 means faster than the reference).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


_TPU_JOB_PATTERNS = (
    "[r]un_round.*_tpu.sh",       # chain scripts
    "[f]id_proof.py",             # directly-launched FID/staged legs
    "[u]net_design_tpu.tasks.",   # directly-launched trainers
    "[e]val_pde.py",              # directly-launched evals
    "[g]enerate_data.py",         # datagen legs
)


def _chain_pids() -> list:
    """PIDs of any still-running TPU-holding job (chain script or a
    directly-launched leg — round 5 launched fid_proof.py without a chain
    wrapper and the old run_round-only pattern missed it).  Bracketed
    patterns: pgrep -f would otherwise self-match the invoking shell."""
    pids = []
    for pat in _TPU_JOB_PATTERNS:
        try:
            out = subprocess.run(["pgrep", "-f", pat],
                                 capture_output=True, text=True).stdout
            pids.extend(int(p) for p in out.split())
        except Exception:
            pass
    return pids


_STOP_FILES = ("/tmp/r3_stop", "/tmp/r4_stop", "/tmp/r4b_stop",
               "/tmp/r4c_stop", "/tmp/r5_stop")


def _drain_chains(deadline_s: float = 2700.0) -> None:
    """VERDICT r3 weak #1: the round-3 bench capture timed out because a
    builder chain still held the single TPU.  Defend the capture: ask any
    chain to stop at its next leg boundary (they all honor the stop files)
    and wait — legs are individually bounded, so draining beats contending.

    The files are marked with bench.py's own content so ``_cleanup_stops``
    can remove exactly them after the measurement (ADVICE r4: leaked stop
    files made every later chain exit at its first ``halt`` and wedged
    resume loops); files that already existed are left alone.
    """
    if not _chain_pids():
        return
    for stop in _STOP_FILES:
        if os.path.exists(stop):
            continue  # not ours; leave it for whoever made it
        try:
            with open(stop, "w") as f:
                f.write("bench.py drain request\n")
        except OSError:
            pass
    t0 = time.time()
    while _chain_pids() and time.time() - t0 < deadline_s:
        print(f"# waiting for TPU chain to drain "
              f"({int(time.time() - t0)}s)", flush=True)
        time.sleep(30)


def _cleanup_stops() -> None:
    """Remove stop files that bench.py itself wrote (identified by their
    marker content — robust across the UNAVAILABLE re-exec path, where the
    ``created`` list of the first process is gone).  Files written by a user
    or a chain script carry different content and are left alone."""
    for stop in _STOP_FILES:
        try:
            with open(stop) as f:
                if f.read().startswith("bench.py drain request"):
                    os.remove(stop)
        except OSError:
            pass


def _measure() -> float:
    import jax
    import jax.numpy as jnp

    from unet_design_tpu.models import registry
    from unet_design_tpu.utils import benchtime

    model = registry.build_model("Unetbase-64", n_scalar_components=1,
                                 n_vector_components=1, time_history=4,
                                 time_future=1, activation="gelu")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (8, 4, 128, 128, 3), jnp.float32)
    variables = model.init(rng, x)

    def fwd(x, v):  # params as argument: keeps the compile payload small
        return model.apply(v, x)

    return benchtime.measure(fwd, (x, variables), n_iters=20)


def main() -> None:
    # The chip may be mid-recovery from a crashed/killed job when the driver
    # runs this (worker restart takes ~10-20 min).  An UNAVAILABLE error
    # poisons the process-wide backend client (see CLAUDE.md), so retrying
    # must re-exec a FRESH process, not loop in this one.
    attempt = int(os.environ.get("BENCH_ATTEMPT", "0"))
    _drain_chains()
    try:
        elapsed = _measure()
    except Exception as e:  # jaxlib runtime errors don't share one type
        if attempt >= 3 or "UNAVAILABLE" not in str(e):
            _cleanup_stops()
            raise
        print(f"# transient backend error (attempt {attempt + 1}), "
              f"re-exec in 5 min: {str(e)[:120]}", flush=True)
        time.sleep(300)
        os.environ["BENCH_ATTEMPT"] = str(attempt + 1)
        # NOT cleaned up here: the re-exec'ed process recognizes its own
        # marker files and removes them when it finishes.
        os.execv(sys.executable, [sys.executable] + sys.argv)
    _cleanup_stops()

    baseline_s = 0.021  # V100-16GB, pdearena/docs/modelzoo.md:44
    print(json.dumps({
        "metric": "unetbase64_fwd_seconds_bs8_128px_fp32",
        "value": round(elapsed, 6),
        "unit": "s",
        "vs_baseline": round(baseline_s / elapsed, 3),
    }))


if __name__ == "__main__":
    main()
