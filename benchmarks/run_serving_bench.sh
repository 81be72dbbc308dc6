#!/bin/bash
# One-command serving benchmark: launch the OpenAI server with the
# serving-tuned flags (full warmup + multi-step decode — see
# docs/performance.md #9 and the compile-hygiene notes), replay the
# reference's ShareGPT length mix at several request rates, and drop
# .exp dumps + a summary in benchmarks/results/.
#
#   bash benchmarks/run_serving_bench.sh [checkpoint_dir] [rates...]
#
# Defaults: /tmp/syn7b (create with make_synthetic_checkpoint.py) at
# 0.25, 1.0 and 2.0 req/s.  The server warms every reachable program
# shape before the first request (~5-10 min from a warm compile cache);
# any "compile stall" warning in the server log during the run means a
# shape escaped warmup and should be reported.
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT="${1:-/tmp/syn7b}"
shift || true
RATES=("${@:-0.25 1.0 2.0}")
PORT=8000
PREFIX="benchmarks/results/serving-$(date +%Y%m%d-%H%M)"
LOG="/tmp/serving_server_$$.log"

if [ ! -f "$CKPT/config.json" ]; then
    echo "checkpoint $CKPT missing — create it first:"
    echo "  python benchmarks/make_synthetic_checkpoint.py --size 7b --out $CKPT"
    exit 1
fi

# --mixed-batch + chunked prefill: every engine step carries the decode
# window AND at most --max-num-prompt-seqs prompt chunks, so decode
# never stalls behind a whole prompt batch (p99 TPOT) while the chunk
# bounds the per-step prefill cost.  EXTRA_FLAGS overrides for A/B runs.
python -m vllm_splitwise_tpu.entrypoints.openai.api_server \
    --model "$CKPT" --quantization gptq --kv-cache-dtype int8 \
    --num-decode-steps 8 --max-model-len 4096 --max-num-seqs 32 \
    --max-num-prompt-seqs 2 --warmup-mode full \
    --mixed-batch --chunked-prefill-tokens 512 \
    --block-size 16 --served-model-name default \
    ${EXTRA_FLAGS:-} \
    --port "$PORT" > "$LOG" 2>&1 &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT

echo "server pid $SERVER_PID (log: $LOG); waiting for warmup..."
for i in $(seq 1 150); do
    if ! kill -0 "$SERVER_PID" 2>/dev/null; then
        echo "server died during startup:"; tail -20 "$LOG"; exit 1
    fi
    code=$(curl -s -o /dev/null -w "%{http_code}" \
        "http://localhost:$PORT/health" 2>/dev/null || true)
    [ "$code" = "200" ] && break
    sleep 10
done
echo "server up; running rates: ${RATES[*]}"

# shellcheck disable=SC2086
python benchmarks/benchmark_serving_distserve.py \
    --api-url "http://localhost:$PORT/v1/completions" --model default \
    --num-prompts 100 --request-rates ${RATES[*]} \
    --replay-workload benchmarks/workloads/sharegpt_lens_100.json \
    --exp-prefix "$PREFIX"

STALLS=$(grep -c "compile stall" "$LOG" || true)
echo "done; results at $PREFIX-*.exp; mid-traffic compile stalls: $STALLS"
[ "$STALLS" = "0" ] || { echo "WARNING: shapes escaped warmup:";
                         grep "compile stall" "$LOG"; }
