"""Phase-disaggregated (Splitwise) executor: prefill pool + decode pool.

Role-parity with the reference's stage-aware RayGPUExecutor
(vllm/executor/ray_gpu_executor.py:291-306,396-452: prompt steps route to
the prompt worker pool, token steps to the token pool, with per-pool
driver ranks and MSCCL++ KV pushes).  TPU-native redesign: the two pools
are two JAX meshes in one single-controller process; routing is a Python
if; KV migration is the KVMigrationManager's gather -> device_put ->
scatter pipeline, ordered by dataflow instead of device semaphores.

Unlike the reference (which documents its pools as stepped serially,
ray_gpu_executor.py:292-293), ``execute_dual`` dispatches a prefill
batch and a decode batch from the SAME engine step on their two meshes
concurrently (two dispatch threads; the meshes are disjoint device
sets, so the steps genuinely overlap on hardware).
"""
from __future__ import annotations

import concurrent.futures

from typing import Dict, List, Optional, Tuple

from vllm_splitwise_tpu.config import (CacheConfig, DeviceConfig,
                                       LoRAConfig, ModelConfig,
                                       ParallelConfig, SchedulerConfig)
from vllm_splitwise_tpu.executor.executor_base import ExecutorBase
from vllm_splitwise_tpu.executor.tpu_executor import _check_enough_blocks
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.parallel.mesh import build_parallel_state
from vllm_splitwise_tpu.sequence import SamplerOutput, SequenceGroupMetadata
from vllm_splitwise_tpu.utils import WorkerType
from vllm_splitwise_tpu.worker.kv_migration import KVMigrationManager
from vllm_splitwise_tpu.worker.worker import Worker

logger = init_logger(__name__)


class SplitwiseExecutor(ExecutorBase):

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
        assert parallel_config.sep_prompt_token
        self.model_config = model_config
        self.cache_config = cache_config
        self.parallel_config = parallel_config
        self.scheduler_config = scheduler_config
        self.device_config = device_config
        self.lora_config = lora_config

        self.parallel_state = build_parallel_state(
            tensor_parallel_size=parallel_config.tensor_parallel_size,
            sep_prompt_token=True,
        )
        tp = parallel_config.tensor_parallel_size
        prefill_mesh = self.parallel_state.prefill_mesh
        decode_mesh = self.parallel_state.decode_mesh
        logger.info("Splitwise pools: prefill=%s decode=%s (tp=%d each)",
                    list(prefill_mesh.devices.flat),
                    list(decode_mesh.devices.flat), tp)

        # Speculative decoding composes with disaggregation: the prefill
        # pool also runs the draft prefill and the migration manager
        # ships draft KV pages alongside the target's; spec windows then
        # run on the decode pool, where TPOT is the bottleneck.
        self.prefill_worker = Worker(model_config, parallel_config,
                                     scheduler_config, cache_config,
                                     mesh=prefill_mesh,
                                     worker_type=WorkerType.PREFILL,
                                     lora_config=lora_config,
                                     speculative_config=speculative_config)
        self.decode_worker = Worker(model_config, parallel_config,
                                    scheduler_config, cache_config,
                                    mesh=decode_mesh,
                                    worker_type=WorkerType.DECODE,
                                    lora_config=lora_config,
                                    speculative_config=speculative_config)

        self.prefill_worker.load_model()
        self.decode_worker.load_model()
        self._init_cache()
        self.kv_migration = KVMigrationManager(self.prefill_worker,
                                               self.decode_worker)
        # Long-lived dispatch pool for execute_dual: the two pool steps
        # are dispatched from separate threads every engine step, so the
        # pool must not be constructed on the hot path.
        self._dual_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="splitwise-dual")

    def _init_cache(self) -> None:
        cfg = self.cache_config
        if cfg.num_device_blocks is None:
            # Both pools are identical chips; min() across pools for parity
            # with the reference's min-across-workers (:256-276).
            a, host = self.prefill_worker.profile_num_available_blocks(
                cfg.hbm_utilization, cfg.swap_space_bytes)
            b, _ = self.decode_worker.profile_num_available_blocks(
                cfg.hbm_utilization, cfg.swap_space_bytes)
            cfg.num_device_blocks = min(a, b)
            cfg.num_host_blocks = host
        if cfg.num_host_blocks is None:
            from vllm_splitwise_tpu.worker.cache_engine import CacheEngine
            block_bytes = CacheEngine.get_cache_block_size(
                cfg, self.model_config, self.parallel_config)
            cfg.num_host_blocks = int(cfg.swap_space_bytes // block_bytes)
        _check_enough_blocks(cfg, self.model_config)
        logger.info("# device KV pages per pool: %d, # host KV pages: %d",
                    cfg.num_device_blocks, cfg.num_host_blocks)
        self.prefill_worker.init_cache_engine(cfg)
        self.decode_worker.init_cache_engine(cfg)
        # Each pool pre-compiles ITS phase's bucket programs (prefill
        # shapes on the prefill mesh, decode windows on the decode mesh)
        # — without this, first-seen shapes compile mid-traffic exactly
        # as on the single-pool executor (the r3 serving collapse).
        self.prefill_worker.warm_up_model()
        self.decode_worker.warm_up_model()

    def execute_model(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
        blocks_to_nw: Optional[Dict[int, List[int]]] = None,
        num_decode_steps: int = 1,
    ) -> SamplerOutput:
        blocks_to_nw = blocks_to_nw or {}
        is_prompt = bool(seq_group_metadata_list
                         and seq_group_metadata_list[0].is_prompt)
        if is_prompt:
            # Layer-streamed migration: the runner pushes each layer
            # group's fresh KV pages through the stream DURING the
            # prefill forward; commit() lands the staged (already
            # transferred) pages in the decode cache afterwards.
            stream = self.kv_migration.begin(blocks_to_nw)
            output = self.prefill_worker.execute_model(
                seq_group_metadata_list,
                blocks_to_swap_in=blocks_to_swap_in,
                blocks_to_swap_out=blocks_to_swap_out,
                blocks_to_copy=blocks_to_copy,
                kv_stream=stream)
            self.kv_migration.commit(stream)
            return output

        self.kv_migration.ensure_migrated(blocks_to_nw.keys())
        # Swap/copy plans concern decode-phase sequences (append_slot CoW,
        # preemption): they apply to the decode pool's cache.
        return self.decode_worker.execute_model(
            seq_group_metadata_list,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            num_decode_steps=num_decode_steps)

    def execute_dual(
        self,
        prompt_meta: List[SequenceGroupMetadata],
        prompt_blocks_to_nw: Dict[int, List[int]],
        decode_meta: List[SequenceGroupMetadata],
        decode_blocks_to_swap_in: Dict[int, int],
        decode_blocks_to_swap_out: Dict[int, int],
        decode_blocks_to_copy: Dict[int, List[int]],
        decode_blocks_to_nw: Optional[Dict[int, List[int]]] = None,
        num_decode_steps: int = 1,
    ) -> Tuple[Optional[SamplerOutput], Optional[SamplerOutput]]:
        """Run a prefill batch and a decode batch CONCURRENTLY, one per
        pool; returns (prompt_output, decode_output) (None for an empty
        half).

        The two meshes are disjoint devices, so the jitted steps overlap
        on hardware; each runs in its own dispatch thread because the
        worker API is blocking (it fetches sampled tokens).  The fresh
        pages' TRANSFERS stream out during the prefill forward (layer-
        group pushes; gathers and device_puts touch only the prefill
        cache and fresh staging buffers, so they are safe against the
        concurrent decode step) — but the commit scatter is deferred
        until the decode step joins: it produces a new decode-pool cache
        value, and scattering into the pre-step cache would drop the
        decode step's in-flight KV writes."""
        self.kv_migration.ensure_migrated(
            (decode_blocks_to_nw or {}).keys())

        stream = self.kv_migration.begin(prompt_blocks_to_nw) \
            if prompt_meta else None
        prompt_out: List[Optional[SamplerOutput]] = [None]
        decode_out: List[Optional[SamplerOutput]] = [None]

        def run_prefill():
            prompt_out[0] = self.prefill_worker.execute_model(
                prompt_meta, blocks_to_swap_in={}, blocks_to_swap_out={},
                blocks_to_copy={}, kv_stream=stream)

        def run_decode():
            decode_out[0] = self.decode_worker.execute_model(
                decode_meta,
                blocks_to_swap_in=decode_blocks_to_swap_in,
                blocks_to_swap_out=decode_blocks_to_swap_out,
                blocks_to_copy=decode_blocks_to_copy,
                num_decode_steps=num_decode_steps)

        jobs = []
        if prompt_meta:
            jobs.append(run_prefill)
        if decode_meta or decode_blocks_to_swap_in or \
                decode_blocks_to_swap_out or decode_blocks_to_copy:
            jobs.append(run_decode)
        if len(jobs) == 2:
            futs = [self._dual_pool.submit(j) for j in jobs]
            for f in futs:
                f.result()
        else:
            for j in jobs:
                j()

        # Both pool steps have joined: land the streamed pages in the
        # decode cache (async device-side; the next decode step's data
        # dependency does the waiting).
        self.kv_migration.commit(stream)
        return prompt_out[0], decode_out[0]

    # ---- LoRA management: adapters serve on BOTH pools (the prefill
    # pool applies them during context ingestion, the decode pool during
    # generation; the reference broadcasts add_lora to all workers,
    # executor_base.py/worker.py) ----

    def add_lora(self, lora_request) -> bool:
        ok_p = self.prefill_worker.add_lora(lora_request)
        ok_d = self.decode_worker.add_lora(lora_request)
        return ok_p and ok_d

    def remove_lora(self, lora_id: int) -> bool:
        ok_p = self.prefill_worker.remove_lora(lora_id)
        ok_d = self.decode_worker.remove_lora(lora_id)
        return ok_p and ok_d

    def list_loras(self):
        return self.decode_worker.list_loras()

    def check_health(self) -> None:
        """Probe both pools with a trivial device round-trip.

        Role of the reference's actor-liveness poll
        (ray_gpu_executor.py:474-489): a wedged chip or a dead device
        transport surfaces here as an exception instead of a silent
        hang inside the next step.
        """
        import jax
        import jax.numpy as jnp
        for worker in (self.prefill_worker, self.decode_worker):
            for device in worker.mesh.devices.flat:
                probe = jax.device_put(jnp.zeros((), jnp.float32), device)
                jax.block_until_ready(probe)

    # ---- KV-comm self test (reference worker.py:350-386 pattern) ----

    def set_prefill_cache_pattern(self, value: float) -> None:
        """Fill every prefill-pool cache page with `value` (test hook)."""
        import jax
        import jax.numpy as jnp
        cache = self.prefill_worker.kv_caches
        self.prefill_worker.kv_caches = jax.tree.map(
            lambda a: jnp.full_like(a, value), cache)
        self.prefill_worker.cache_engine.device_cache = \
            self.prefill_worker.kv_caches

    def send_recv_kvcache_all(self) -> None:
        """Push every page prefill -> decode (test hook)."""
        num_pages = self.cache_config.num_device_blocks
        self.kv_migration.migrate({0: list(range(num_pages))})

    def check_decode_cache_pattern(self, value: float) -> bool:
        import jax
        import numpy as np
        cache = self.decode_worker.kv_caches
        return all(
            bool((np.asarray(leaf) == value).all())
            for leaf in jax.tree.leaves(cache))
