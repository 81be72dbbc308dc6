"""Device-trace-based kernel timing.

Host wall-clock timing of jitted calls is UNRELIABLE on tunneled device
transports: `block_until_ready` on a small (scalar) output has been
observed to return long before the device finishes the dispatch, so a
chained-scan microbench can "measure" 5 TB/s.  The ground truth is the
device lane of a `jax.profiler` trace — these helpers run a callable
under a trace and aggregate per-kernel device durations.
"""
import collections
import glob
import gzip
import json
import tempfile
from typing import Callable, Dict, Tuple

import jax


def device_kernel_times(fn: Callable[[], None],
                        trace_dir: str = None
                        ) -> Dict[str, Tuple[float, int]]:
    """Run `fn` under a profiler trace; return
    {kernel_name: (total_ms_on_device, launch_count)}."""
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="jtrace_")
    with jax.profiler.trace(trace_dir):
        fn()
    path = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    events = json.load(gzip.open(path))["traceEvents"]
    procs = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {p for p, name in procs.items() if "TPU" in name}
    total = collections.Counter()
    count = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in device_pids:
            total[e["name"]] += e["dur"]
            count[e["name"]] += 1
    return {
        name: (total[name] / 1000.0, count[name])
        for name in total
    }


def aggregate(times: Dict[str, Tuple[float, int]],
              prefix: str) -> Tuple[float, int]:
    """Sum (ms, launches) over kernels whose name starts with prefix."""
    ms = sum(t for name, (t, _) in times.items()
             if name.startswith(prefix))
    n = sum(c for name, (_, c) in times.items() if name.startswith(prefix))
    return ms, n
