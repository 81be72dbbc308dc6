# Container image for vllm_splitwise_tpu (reference role: /Dockerfile).
#
# TPU serving containers differ from the reference's CUDA image in two
# structural ways: (1) there is no device-code build stage — the Pallas
# kernels compile at runtime via XLA, and the only native component
# (csrc/block_engine.cpp) builds in seconds with the system toolchain;
# (2) the TPU runtime (libtpu) ships with the JAX TPU wheel, so the base
# is a plain Python image, not nvidia/cuda.
#
#   docker build -t vllm-splitwise-tpu .
#   docker run --privileged --net=host vllm-splitwise-tpu \
#       --model <hf-model-or-path> --quantization gptq \
#       --kv-cache-dtype int8 --num-decode-steps 8 \
#       --mixed-batch --chunked-prefill-tokens 512 \
#       --max-num-prompt-seqs 2 --warmup-mode full
#
# (--privileged/--net=host are the standard TPU-VM device access knobs.)

FROM python:3.11-slim AS base

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make git && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

# JAX with the TPU runtime; everything else the engine needs.
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir \
        numpy transformers safetensors fastapi uvicorn pydantic \
        prometheus-client sentencepiece

COPY pyproject.toml ./
COPY vllm_splitwise_tpu ./vllm_splitwise_tpu
COPY csrc ./csrc
COPY examples ./examples

RUN pip install --no-build-isolation --no-deps -e .

# Pre-build the native block engine so first launch doesn't pay it.
RUN python -c "from vllm_splitwise_tpu.core.native_block_manager import \
native_engine_available; print(native_engine_available())"

# Persistent XLA compile cache across container restarts (mount a volume
# here to skip the multi-minute first warmup).
ENV JAX_COMPILATION_CACHE_DIR=/workspace/.jax_cache
VOLUME /workspace/.jax_cache

EXPOSE 8000
ENTRYPOINT ["python", "-m", \
            "vllm_splitwise_tpu.entrypoints.openai.api_server", \
            "--host", "0.0.0.0", "--port", "8000"]
