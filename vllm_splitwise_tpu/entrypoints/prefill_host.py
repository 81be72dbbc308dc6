"""Prefill-host process entry point (multi-host disaggregated serving).

On a 2-host Splitwise deployment, start this on the prefill host and the
API server (with the same --distributed-* flags) on the decode host:

  # host A (prefill, process 0)
  python -m vllm_splitwise_tpu.entrypoints.prefill_host \\
      --model M --sep-prompt-token \\
      --distributed-coordinator hostA:9800 \\
      --distributed-num-processes 2 --distributed-process-id 0 \\
      --cross-host-transfer-address hostA:9801

  # host B (decode + engine, process 1)
  python -m vllm_splitwise_tpu.entrypoints.api_server \\
      --model M --sep-prompt-token \\
      --distributed-coordinator hostA:9800 \\
      --distributed-num-processes 2 --distributed-process-id 1 \\
      --cross-host-transfer-address hostB:9801

Role parity: the reference launches its prompt-pool workers as Ray
actors from one driver (vllm/executor/ray_gpu_executor.py:87-232); here
each host runs its own process joined through jax.distributed.
"""
from __future__ import annotations

import argparse

from vllm_splitwise_tpu.engine.arg_utils import EngineArgs
from vllm_splitwise_tpu.executor.multihost_splitwise import run_prefill_host


def main() -> None:
    parser = argparse.ArgumentParser(
        description="vllm_splitwise_tpu prefill host")
    parser = EngineArgs.add_cli_args(parser)
    args = parser.parse_args()
    engine_args = EngineArgs.from_cli_args(args)
    if not engine_args.sep_prompt_token:
        raise SystemExit("prefill_host requires --sep-prompt-token")
    if not engine_args.distributed_coordinator:
        raise SystemExit("prefill_host requires --distributed-coordinator")
    run_prefill_host(engine_args)


if __name__ == "__main__":
    main()
