"""Multi-host disaggregation end-to-end (2 real processes, CPU devices).

Drives benchmarks/dryrun_multihost.py: jax.distributed pairs with the
prefill pool on process 0 and the engine + decode pool on process 1, KV
pages moved device-to-device over the cross-host socket transfer as
layer-group segments streamed DURING the prefill forward, and greedy
tokens compared against HF and the single-host Splitwise engine.

Legs exercised here: streamed (layer-streamed migration + overlap
timeline), bulk (the A/B baseline), stress (staggered arrivals, tight KV
budget, n=2 fan-out, multiple migrations), spec (draft pages over the
wire), lora (adapters on both hosts).  The `scaling` leg (1-pool vs
2-pool tokens/s) is exercised by the full harness run, not per-commit CI.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
SCRIPT = os.path.join(REPO, "benchmarks", "dryrun_multihost.py")
LEGS = "streamed,bulk,stress,spec,lora"


@pytest.mark.timeout(900)
def test_multihost_dryrun(tmp_path):
    out = str(tmp_path / "result.json")
    env = dict(os.environ)
    # The children pick their own platform/flags; scrub pytest's.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--out", out, "--timeout", "750",
         "--legs", LEGS],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=840)
    assert proc.returncode == 0, proc.stdout[-5000:] + proc.stderr[-2000:]
    with open(out) as f:
        result = json.load(f)
    assert result["ok"], result
    legs = result["legs"]

    streamed = legs["streamed"]
    assert all(streamed["matches_hf_greedy"]), streamed
    assert all(streamed["matches_single_host_engine"]), streamed
    assert streamed["num_streamed"] >= 1
    assert streamed["num_pages_moved"] > 0
    assert streamed["bytes_moved"] > 0
    # Overlap evidence: every segment's DCN transfer was enqueued BEFORE
    # the prefill forward finished.
    tl = streamed["stream_timeline"]
    assert tl and len(tl["push_rel_s"]) >= 2
    assert all(t <= tl["prefill_exec_s"] + 0.05 for t in tl["push_rel_s"])

    bulk = legs["bulk"]
    assert all(bulk["matches_hf_greedy"]) and bulk["num_streamed"] == 0

    stress = legs["stress"]
    assert stress["finished"] == 10
    assert stress["num_migrations"] > 3, stress
    assert stress["lengths_ok"] and stress["n_fanout_ok"]
    assert stress["preemption_crossed_boundary"], stress

    spec = legs["spec"]
    assert all(spec["matches_hf_greedy"]), spec
    assert spec["spec_steps"] > 0
    assert spec["spec_acceptance_rate"] > 0.5, spec

    lora = legs["lora"]
    assert all(lora["matches_hf_greedy"]), lora
    assert lora["num_streamed"] >= 1
