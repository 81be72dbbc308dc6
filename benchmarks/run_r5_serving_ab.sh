#!/bin/bash
# Round-5 serving A/B driver: two pipelined configs at 2 req/s, printing
# a compact summary per run.  Usage: bash benchmarks/run_r5_serving_ab.sh
set -uo pipefail
cd "$(dirname "$0")/.."

run_one() {
    local tag="$1"; shift
    echo "=== config $tag: $* ==="
    EXTRA_FLAGS="$*" timeout 2500 bash benchmarks/run_serving_bench.sh \
        /tmp/syn7b 2.0 2>&1 | tail -18 | grep -E \
        '"p50_tpot|"p99_tpot|"p50_ttft|"p99_ttft|"p50_latency|"p99_latency|stalls' \
        || echo "config $tag FAILED"
    # Surface the chained-window ratio from the server log.
    local log
    log=$(ls -t /tmp/serving_server_*.log 2>/dev/null | head -1)
    [ -n "$log" ] && grep -o "Chained windows: [0-9]*/[0-9]*" "$log" | tail -1
}

run_one A "--pipeline-decode"
run_one B "--pipeline-decode --num-decode-steps 4 --chunked-prefill-tokens 256"
echo "=== A/B done ==="
