"""Turn committed serving .exp dumps into the README comparison table.

    python benchmarks/summarize_serving.py benchmarks/results/serving-<ts>-100-*.exp

Reads each dump (schema: benchmark_utils.RequestRecord list), recomputes
TTFT/TPOT/latency percentiles, and prints a markdown table next to the
reference fork's committed GPU numbers (BASELINE.md)."""
import json
import re
import sys

import numpy as np

# Reference fork's committed llama3-100-<rate>.exp percentiles
# (recomputed from /root/reference/benchmarks/results; see BASELINE.md).
_REF = {
    0.25: (0.918, 15.2), 0.5: (0.946, 15.5), 1.0: (0.993, 15.9),
    1.5: (1.180, 16.8), 2.0: (1.284, 18.5), 2.5: (1.455, 20.2),
    3.0: (1.750, 22.1),
}


def load(path):
    recs = json.load(open(path))
    if isinstance(recs, dict):
        recs = recs.get("requests", recs)
    lat = [r["latency"] for r in recs]
    ttft = [r["ftl"] for r in recs if r.get("ftl") is not None]
    tpot = [r["tpot"] for r in recs if r.get("tpot") is not None]
    p = np.percentile
    return {
        "n": len(recs),
        "p50_latency": p(lat, 50), "p99_latency": p(lat, 99),
        "p50_ttft": p(ttft, 50), "p99_ttft": p(ttft, 99),
        "p50_tpot": p(tpot, 50), "p99_tpot": p(tpot, 99),
    }


def main():
    rows = []
    for path in sorted(sys.argv[1:]):
        m = re.search(r"-(\d+(?:\.\d+)?)\.exp$", path)
        rate = float(m.group(1)) if m else float("nan")
        rows.append((rate, load(path)))
    rows.sort()
    print("| rate | p50 latency | p50 TTFT | p50 TPOT | p99 TPOT | "
          "reference GPU fork (p50 lat / p50 TPOT) |")
    print("|---|---|---|---|---|---|")
    for rate, s in rows:
        ref = _REF.get(rate)
        ref_s = f"{ref[0]:.3f} s / {ref[1]:.1f} ms" if ref else "—"
        print(f"| {rate:g} req/s | {s['p50_latency']:.2f} s | "
              f"{s['p50_ttft']:.2f} s | {s['p50_tpot']*1000:.1f} ms | "
              f"{s['p99_tpot']*1000:.1f} ms | {ref_s} |")


if __name__ == "__main__":
    main()
