"""Multi-host disaggregated (Splitwise) execution.

Role parity with the reference's multi-node serving stack — Ray actors
spanning machines (vllm/executor/ray_gpu_executor.py:87-232) with
MSCCL++ pushing KV over InfiniBand (vllm/worker/comm_utils.py) — built
the JAX way:

* One `jax.distributed` cluster gives all processes the global device
  view; processes ``[0, num_prefill_hosts)`` are prefill hosts, the rest
  decode hosts.  The ENGINE (scheduler, serving) runs on the first
  decode host — one master control plane, no replicated schedulers.
* Prefill hosts run :class:`PrefillHostServer`: a loop that receives
  prompt jobs over a :class:`ControlChannel`, runs the prefill step on
  the LOCAL mesh, returns sampled tokens over the channel, and ships the
  freshly written KV pages device-to-device via
  :class:`CrossHostKVMover` (DCN socket transfer — never staged through
  host memory as pickled bytes).
* The decode host's :class:`MultihostSplitwiseExecutor` routes prompt
  steps to the remote prefill host and decode steps to its local worker,
  scattering migrated pages into the local cache before the first decode
  read — the same dataflow ordering the single-host SplitwiseExecutor
  relies on.

Current scope: one prefill host + one decode host, tp*dp within each
host's local devices; LoRA and speculative decoding are single-host
features for now.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from vllm_splitwise_tpu.config import (CacheConfig, DeviceConfig,
                                       LoRAConfig, ModelConfig,
                                       ParallelConfig, SchedulerConfig)
from vllm_splitwise_tpu.executor.executor_base import ExecutorBase
from vllm_splitwise_tpu.executor.tpu_executor import _check_enough_blocks
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.parallel.distributed import (ControlChannel,
                                                     devices_of_processes)
from vllm_splitwise_tpu.parallel.mesh import (build_parallel_state,
                                              kv_cache_spec)
from vllm_splitwise_tpu.sequence import SamplerOutput, SequenceGroupMetadata
from vllm_splitwise_tpu.utils import WorkerType
from vllm_splitwise_tpu.worker.cross_host_migration import CrossHostKVMover
from vllm_splitwise_tpu.worker.kv_migration import (gather_pages_tree,
                                                    migration_leaf_spec,
                                                    scatter_index_for,
                                                    scatter_pages_tree)
from vllm_splitwise_tpu.worker.worker import Worker

logger = init_logger(__name__)

_CHANNEL = "prefill-pool"


def _prefill_process_ids(parallel_config: ParallelConfig) -> List[int]:
    return list(range(parallel_config.num_prefill_hosts))


def _decode_process_ids(parallel_config: ParallelConfig) -> List[int]:
    return list(range(parallel_config.num_prefill_hosts,
                      jax.process_count()))


def _build_mover(parallel_config: ParallelConfig, local_mesh) -> \
        CrossHostKVMover:
    return CrossHostKVMover(
        src_devices=devices_of_processes(
            _prefill_process_ids(parallel_config)),
        dst_devices=devices_of_processes(
            _decode_process_ids(parallel_config)),
        tensor_parallel_size=parallel_config.tensor_parallel_size,
        local_mesh=local_mesh,
    )


class MultihostSplitwiseExecutor(ExecutorBase):
    """Runs on the decode host; owns the decode pool + the remote link."""

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
        if speculative_config is not None or lora_config is not None:
            raise NotImplementedError(
                "speculative decoding / LoRA are single-host features "
                "for now")
        self.model_config = model_config
        self.cache_config = cache_config
        self.parallel_config = parallel_config
        self.scheduler_config = scheduler_config
        self.device_config = device_config
        self.lora_config = lora_config

        state = build_parallel_state(
            tensor_parallel_size=parallel_config.tensor_parallel_size,
            sep_prompt_token=False,
            devices=jax.local_devices(),
        )
        self.decode_worker = Worker(model_config, parallel_config,
                                    scheduler_config, cache_config,
                                    mesh=state.mesh,
                                    worker_type=WorkerType.DECODE)
        self.decode_worker.load_model()

        # The prefill host has been waiting for us since it loaded.
        self.channel = ControlChannel.connect(_CHANNEL)
        hello = self.channel.recv(timeout=600)
        assert hello["op"] == "hello", hello
        self._init_cache(hello)
        self.mover = _build_mover(parallel_config,
                                  self.decode_worker.mesh)
        # Migration bookkeeping (same role as KVMigrationManager's).
        self.num_migrations = 0
        self.num_pages_moved = 0
        self.last_migration_seconds = 0.0

    # KVMigrationManager duck-type for engine metrics.
    @property
    def kv_migration(self):
        return self

    def _init_cache(self, hello: Dict) -> None:
        cfg = self.cache_config
        if cfg.num_device_blocks is None:
            mine, my_host = self.decode_worker.profile_num_available_blocks(
                cfg.hbm_utilization, cfg.swap_space_bytes)
            theirs = hello.get("num_device_blocks") or mine
            cfg.num_device_blocks = min(mine, theirs)
            cfg.num_host_blocks = my_host
        if cfg.num_host_blocks is None:
            from vllm_splitwise_tpu.worker.cache_engine import CacheEngine
            block_bytes = CacheEngine.get_cache_block_size(
                cfg, self.model_config, self.parallel_config)
            cfg.num_host_blocks = int(cfg.swap_space_bytes // block_bytes)
        _check_enough_blocks(cfg, self.model_config)
        logger.info(
            "multihost pools: %d device KV pages each, %d host pages",
            cfg.num_device_blocks, cfg.num_host_blocks)
        self.channel.send({
            "op": "init_cache",
            "num_device_blocks": cfg.num_device_blocks,
            "num_host_blocks": cfg.num_host_blocks,
        })
        self.decode_worker.init_cache_engine(cfg)
        ready = self.channel.recv(timeout=600)
        assert ready["op"] == "ready", ready

    # ---- step routing --------------------------------------------------

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
            return self._remote_prefill(seq_group_metadata_list,
                                        blocks_to_swap_in,
                                        blocks_to_swap_out, blocks_to_copy,
                                        blocks_to_nw)
        return self.decode_worker.execute_model(
            seq_group_metadata_list,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            num_decode_steps=num_decode_steps)

    def execute_dual(
        self,
        prompt_meta: List[SequenceGroupMetadata],
        prompt_blocks_to_nw: Optional[Dict[int, List[int]]],
        decode_meta: List[SequenceGroupMetadata],
        decode_blocks_to_swap_in: Dict[int, int],
        decode_blocks_to_swap_out: Dict[int, int],
        decode_blocks_to_copy: Dict[int, List[int]],
        decode_blocks_to_nw: Optional[Dict[int, List[int]]] = None,
        num_decode_steps: int = 1,
    ):
        """Overlap the remote prefill with the local decode step: the
        prefill request goes over the wire FIRST, the decode pool steps
        while the prefill host computes, and only then is the prefill
        reply (and its KV page transfer) collected.  No threads needed —
        the RPC itself is the async boundary."""
        prompt_out = None
        decode_out = None
        pages = self._send_prefill(prompt_meta,
                                   prompt_blocks_to_nw or {}) \
            if prompt_meta else None
        if decode_meta or decode_blocks_to_swap_in or \
                decode_blocks_to_swap_out or decode_blocks_to_copy:
            decode_out = self.decode_worker.execute_model(
                decode_meta,
                blocks_to_swap_in=decode_blocks_to_swap_in,
                blocks_to_swap_out=decode_blocks_to_swap_out,
                blocks_to_copy=decode_blocks_to_copy,
                num_decode_steps=num_decode_steps)
        if pages is not None:
            prompt_out = self._complete_prefill(pages)
        return prompt_out, decode_out

    def _send_prefill(self, seqs, blocks_to_nw, swap_in=None,
                      swap_out=None, copy=None) -> List[int]:
        pages: List[int] = []
        seen = set()
        for block_ids in blocks_to_nw.values():
            for p in block_ids:
                if p not in seen:
                    seen.add(p)
                    pages.append(p)
        self.channel.send({
            "op": "prefill",
            "seqs": seqs,
            "swap_in": swap_in or {},
            "swap_out": swap_out or {},
            "copy": copy or {},
            "pages": pages,
        })
        return pages

    def _complete_prefill(self, pages: List[int]) -> SamplerOutput:
        reply = self.channel.recv(timeout=600)
        if reply.get("op") == "error":
            raise RuntimeError(
                f"prefill host failed: {reply.get('message')}")
        assert reply["op"] == "outputs", reply
        if pages:
            started = time.perf_counter()
            self._receive_pages(pages)
            self.num_migrations += 1
            self.num_pages_moved += len(pages)
            self.last_migration_seconds = time.perf_counter() - started
        return reply["outputs"]

    def _remote_prefill(self, seqs, swap_in, swap_out, copy,
                        blocks_to_nw) -> SamplerOutput:
        pages = self._send_prefill(seqs, blocks_to_nw, swap_in, swap_out,
                                   copy)
        return self._complete_prefill(pages)

    def _receive_pages(self, pages: List[int]) -> None:
        """Receiver side of the DCN page transfer, then cache scatter."""
        idx = jnp.asarray(pages, dtype=jnp.int32)
        cache = self.decode_worker.kv_caches
        stacked = isinstance(cache, tuple)
        scatter_idx = scatter_index_for(cache, idx)
        template = jax.eval_shape(
            lambda c: gather_pages_tree(c, idx)[0], cache)
        spec_for = migration_leaf_spec(kv_cache_spec())
        received = self.mover.transfer(
            template, lambda leaf: spec_for(leaf, stacked))
        self.decode_worker.kv_caches = scatter_pages_tree(
            cache, scatter_idx, received)
        if self.decode_worker.cache_engine is not None:
            self.decode_worker.cache_engine.device_cache = \
                self.decode_worker.kv_caches

    def ensure_migrated(self, slots) -> None:
        # Ordering holds by construction: _remote_prefill returns only
        # after the transfer for those pages is enqueued, and the decode
        # step's cache read data-depends on the scatter.
        return

    def free_slots(self, slots) -> None:
        return

    # ---- health --------------------------------------------------------

    def check_health(self) -> None:
        """Probe both pools: local device liveness + remote round-trip."""
        jax.block_until_ready(
            jax.device_put(jnp.zeros(()),
                           self.decode_worker.mesh.devices.flat[0]
                           if self.decode_worker.mesh is not None else
                           jax.local_devices()[0]))
        self.channel.send({"op": "ping"})
        reply = self.channel.recv(timeout=30)
        if reply.get("op") != "pong":
            raise RuntimeError(f"prefill host unhealthy: {reply}")

    def shutdown(self) -> None:
        try:
            self.channel.send({"op": "shutdown"})
        except OSError:
            pass


class PrefillHostServer:
    """The prefill host's serving loop (no scheduler of its own)."""

    def __init__(
        self,
        model_config: ModelConfig,
        cache_config: CacheConfig,
        parallel_config: ParallelConfig,
        scheduler_config: SchedulerConfig,
        device_config: DeviceConfig,
        lora_config=None,
        speculative_config=None,
    ) -> None:
        assert parallel_config.sep_prompt_token
        self.cache_config = cache_config
        self.parallel_config = parallel_config
        state = build_parallel_state(
            tensor_parallel_size=parallel_config.tensor_parallel_size,
            sep_prompt_token=False,
            devices=jax.local_devices(),
        )
        self.worker = Worker(model_config, parallel_config,
                             scheduler_config, cache_config,
                             mesh=state.mesh,
                             worker_type=WorkerType.PREFILL)
        self.worker.load_model()

        profiled: Optional[int] = None
        if cache_config.num_device_blocks is None:
            profiled, _ = self.worker.profile_num_available_blocks(
                cache_config.hbm_utilization,
                cache_config.swap_space_bytes)

        self.channel = ControlChannel.serve(_CHANNEL)
        self.channel.send({"op": "hello", "num_device_blocks": profiled})
        init = self.channel.recv(timeout=600)
        assert init["op"] == "init_cache", init
        cache_config.num_device_blocks = init["num_device_blocks"]
        cache_config.num_host_blocks = init["num_host_blocks"]
        self.worker.init_cache_engine(cache_config)
        self.mover = _build_mover(parallel_config, self.worker.mesh)
        self.channel.send({"op": "ready"})
        logger.info("prefill host ready (%d device pages)",
                    cache_config.num_device_blocks)

    def serve_forever(self) -> None:
        while True:
            msg = self.channel.recv()
            op = msg.get("op")
            if op == "shutdown":
                logger.info("prefill host: shutdown requested")
                return
            if op == "ping":
                self.channel.send({"op": "pong"})
                continue
            if op != "prefill":
                self.channel.send({"op": "error",
                                   "message": f"unknown op {op!r}"})
                continue
            try:
                outputs = self.worker.execute_model(
                    msg["seqs"],
                    blocks_to_swap_in=msg["swap_in"],
                    blocks_to_swap_out=msg["swap_out"],
                    blocks_to_copy=msg["copy"])
            except Exception as exc:  # noqa: BLE001 - reported to master
                logger.exception("prefill job failed")
                self.channel.send({"op": "error", "message": repr(exc)})
                continue
            self.channel.send({"op": "outputs", "outputs": outputs})
            if msg["pages"]:
                self._send_pages(msg["pages"])

    def _send_pages(self, pages: List[int]) -> None:
        idx = jnp.asarray(pages, dtype=jnp.int32)
        cache = self.worker.kv_caches
        stacked = isinstance(cache, tuple)
        gathered, _ = gather_pages_tree(cache, idx)
        spec_for = migration_leaf_spec(kv_cache_spec())
        self.mover.transfer(gathered, lambda leaf: spec_for(leaf, stacked))


def run_prefill_host(engine_args) -> None:
    """Entry point for a prefill-host process: build, serve, exit on
    shutdown."""
    configs = engine_args.create_engine_configs()
    server = PrefillHostServer(*configs)
    server.serve_forever()
