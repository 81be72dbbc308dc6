"""Multi-host disaggregation end-to-end (2 real processes, CPU devices).

Drives benchmarks/dryrun_multihost.py: a jax.distributed pair with the
prefill pool on process 0 and the engine + decode pool on process 1, KV
pages moved device-to-device over the cross-host socket transfer, and
greedy tokens compared against the single-host Splitwise engine.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
SCRIPT = os.path.join(REPO, "benchmarks", "dryrun_multihost.py")


@pytest.mark.timeout(600)
def test_multihost_dryrun(tmp_path):
    out = str(tmp_path / "result.json")
    env = dict(os.environ)
    # The children pick their own platform/flags; scrub pytest's.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--out", out, "--timeout", "480"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=560)
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
    with open(out) as f:
        result = json.load(f)
    assert result["ok"], result
    assert all(result["matches_single_host_engine"]), result
    assert result["num_migrations"] >= 1
    assert result["num_pages_moved"] > 0
    assert result["bytes_moved"] > 0
