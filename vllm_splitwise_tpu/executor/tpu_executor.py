"""Single-mesh TPU executor.

Role-parity with the reference's GPUExecutor + RayGPUExecutor
(vllm/executor/gpu_executor.py:23, ray_gpu_executor.py:40): because JAX is
single-controller, ONE process drives the whole mesh — GSPMD replaces the
Ray-actor fan-out, so "multi-GPU orchestration" collapses into building a
mesh and jitting over it.  The phase-disaggregated (Splitwise) variant
lives in executor/splitwise_executor.py.
"""
from __future__ import annotations

from typing import Dict, List, Optional

from vllm_splitwise_tpu.config import (CacheConfig, DeviceConfig,
                                       LoRAConfig, ModelConfig,
                                       ParallelConfig, SchedulerConfig)
from vllm_splitwise_tpu.executor.executor_base import ExecutorBase
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.parallel.mesh import build_parallel_state
from vllm_splitwise_tpu.sequence import SamplerOutput, SequenceGroupMetadata
from vllm_splitwise_tpu.utils import WorkerType
from vllm_splitwise_tpu.worker.worker import Worker

logger = init_logger(__name__)


class TPUExecutor(ExecutorBase):

    def __init__(
        self,
        model_config: ModelConfig,
        cache_config: CacheConfig,
        parallel_config: ParallelConfig,
        scheduler_config: SchedulerConfig,
        device_config: DeviceConfig,
        lora_config: Optional[LoRAConfig] = None,
        speculative_config=None,
    ) -> None:
        self.model_config = model_config
        self.cache_config = cache_config
        self.parallel_config = parallel_config
        self.scheduler_config = scheduler_config
        self.device_config = device_config
        self.lora_config = lora_config

        self.parallel_state = build_parallel_state(
            tensor_parallel_size=parallel_config.tensor_parallel_size,
            sep_prompt_token=False,
        )
        mesh = self.parallel_state.mesh if \
            parallel_config.tensor_parallel_size > 1 else None

        self.worker = Worker(model_config, parallel_config,
                             scheduler_config, cache_config, mesh=mesh,
                             worker_type=WorkerType.MIXED,
                             speculative_config=speculative_config,
                             lora_config=lora_config)
        self.worker.load_model()
        self._init_cache()
        if scheduler_config.mixed_batch:
            # The engine gates its dual-dispatch step (decode window +
            # prompt batch scheduled together) on this attribute's
            # presence — set it only when --mixed-batch asked for it.
            self.execute_dual = self._execute_dual_mixed
            if getattr(scheduler_config, "pipeline_decode", False):
                self.execute_dual_deferred = self._execute_dual_deferred

    def _init_cache(self) -> None:
        cfg = self.cache_config
        if cfg.num_device_blocks is None:
            num_device, num_host = self.worker.profile_num_available_blocks(
                cfg.hbm_utilization, cfg.swap_space_bytes)
            cfg.num_device_blocks = num_device
            cfg.num_host_blocks = num_host
        if cfg.num_host_blocks is None:
            block_bytes = 1
            from vllm_splitwise_tpu.worker.cache_engine import CacheEngine
            block_bytes = CacheEngine.get_cache_block_size(
                cfg, self.model_config, self.parallel_config)
            cfg.num_host_blocks = int(cfg.swap_space_bytes // block_bytes)
        _check_enough_blocks(cfg, self.model_config)
        logger.info("# device KV pages: %d, # host KV pages: %d",
                    cfg.num_device_blocks, cfg.num_host_blocks)
        self.worker.init_cache_engine(cfg)
        self.worker.warm_up_model()

    def execute_model(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
        blocks_to_nw: Optional[Dict[int, List[int]]] = None,
        num_decode_steps: int = 1,
    ) -> SamplerOutput:
        return self.worker.execute_model(
            seq_group_metadata_list,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            num_decode_steps=num_decode_steps,
        )

    def _execute_dual_mixed(
        self,
        prompt_meta: List[SequenceGroupMetadata],
        prompt_blocks_to_nw: Dict[int, List[int]],
        decode_meta: List[SequenceGroupMetadata],
        decode_blocks_to_swap_in: Dict[int, int],
        decode_blocks_to_swap_out: Dict[int, int],
        decode_blocks_to_copy: Dict[int, List[int]],
        decode_blocks_to_nw=None,
        num_decode_steps: int = 1,
    ):
        """Mixed prefill+decode step on ONE mesh (--mixed-batch): the
        decode window and the prompt(-chunk) batch dispatch back-to-back
        as two async device programs, so decode advances every engine
        step and the decode fetch overlaps the prefill compute.  Same
        engine-facing signature as the disaggregated executor's
        execute_dual (splitwise_executor.py), minus migrations — both
        halves share one KV cache."""
        return self.worker.execute_mixed(
            prompt_meta, decode_meta,
            blocks_to_swap_in=decode_blocks_to_swap_in,
            blocks_to_swap_out=decode_blocks_to_swap_out,
            blocks_to_copy=decode_blocks_to_copy,
            num_decode_steps=num_decode_steps)

    def _execute_dual_deferred(
        self,
        prompt_meta: List[SequenceGroupMetadata],
        decode_meta: List[SequenceGroupMetadata],
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
        num_decode_steps: int = 1,
    ):
        """Dispatch a mixed step and return (prompt_thunk, decode_thunk)
        without fetching (--pipeline-decode; see worker
        execute_mixed_deferred)."""
        return self.worker.execute_mixed_deferred(
            prompt_meta, decode_meta,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            num_decode_steps=num_decode_steps)

    def window_chainable(self, decode_meta) -> bool:
        return self.worker.model_runner.window_chainable(decode_meta)

    def add_lora(self, lora_request) -> bool:
        return self.worker.add_lora(lora_request)

    def remove_lora(self, lora_id: int) -> bool:
        return self.worker.remove_lora(lora_id)

    def list_loras(self):
        return self.worker.list_loras()

    def check_health(self) -> None:
        # Single-process: if this code runs, the executor is alive.
        return


def _check_enough_blocks(cache_config: CacheConfig,
                         model_config: ModelConfig) -> None:
    if cache_config.num_device_blocks <= 0:
        raise ValueError(
            "No KV-cache memory left after loading the model; try a "
            "higher hbm_utilization or a smaller max_model_len.")
    max_seq_len = cache_config.block_size * cache_config.num_device_blocks
    if model_config.max_model_len > max_seq_len:
        raise ValueError(
            f"The model's max seq len ({model_config.max_model_len}) is "
            "larger than the maximum number of tokens that can be stored "
            f"in the KV cache ({max_seq_len}). Increase hbm_utilization "
            "or decrease max_model_len.")
