"""Shared helpers for the benchmark sweep CLIs."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Generous per-model budget: tunneled first-contact compiles run minutes.
ISOLATE_TIMEOUT_S = 3600
# Killing a child mid-TPU-op wedges the chip for ~10-20 minutes (CLAUDE.md);
# after a timeout we must let the tunnel recover before the next model or
# every subsequent subprocess errors spuriously.
WEDGE_COOLDOWN_S = 900


def run_isolated(script_path: str, name: str, repeats: int) -> dict:
    """Benchmark one model in its own subprocess (worker mode ``--one``).

    A backend failure inside the child cannot poison the parent sweep.  On
    timeout the child is killed (unavoidable) and the tunnel is given a
    cool-down before the caller proceeds.
    """
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(script_path),
             "--one", name, "--repeats", str(repeats)],
            capture_output=True, text=True, timeout=ISOLATE_TIMEOUT_S)
    except subprocess.TimeoutExpired:
        time.sleep(WEDGE_COOLDOWN_S)
        raise RuntimeError(
            f"{name}: timed out after {ISOLATE_TIMEOUT_S}s; killed the "
            f"worker (device may have been wedged; cooled down "
            f"{WEDGE_COOLDOWN_S}s before continuing)")
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("RESULT ")]
    if not line:
        raise RuntimeError((proc.stderr or proc.stdout).strip()[-200:])
    return json.loads(line[-1][len("RESULT "):])


def sweep(names, bench_one, out_path: str, isolate: bool, script_path: str,
          repeats: int, skip_existing: bool = False) -> dict:
    """Run the sweep, printing progress and writing JSON incrementally.

    ``skip_existing`` merges into an existing output file and skips models
    that already have a non-error entry — the sweep becomes resumable across
    interrupted runs (tunnel outages, round boundaries).
    """
    results = {}
    if skip_existing and os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for name in names:
        if skip_existing and "error" not in results.get(name, {"error": 1}):
            print(name, "cached", flush=True)
            continue
        try:
            if isolate:
                results[name] = run_isolated(script_path, name, repeats)
            else:
                results[name] = bench_one(name, repeats)
            print(name, results[name], flush=True)
        except Exception as e:  # keep sweeping
            results[name] = {"error": str(e)[:200]}
            print(name, "ERROR", str(e)[:120], file=sys.stderr, flush=True)
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    return results
