"""The device worker: model runtime + KV cache on one mesh.

Role-parity with the reference's ``vllm/worker/worker.py`` (init_model,
load_model, profile_num_available_blocks, init_cache_engine,
execute_model), re-designed single-controller: there is ONE worker object
per engine (per phase pool under disaggregation), driving a whole
``jax.sharding.Mesh`` — GSPMD plays the role of the reference's per-GPU
worker fleet, so no Ray actors, no broadcast_tensor_dict, no NCCL init.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from vllm_splitwise_tpu.config import (CacheConfig, ModelConfig,
                                       ParallelConfig, SchedulerConfig)
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.sequence import SamplerOutput, SequenceGroupMetadata
from vllm_splitwise_tpu.utils import WorkerType
from vllm_splitwise_tpu.worker.cache_engine import CacheEngine
from vllm_splitwise_tpu.worker.model_runner import ModelRunner

logger = init_logger(__name__)

# Fallback page count when the backend exposes no memory stats (CPU tests).
_DEFAULT_CPU_PAGES = 512


class Worker:

    def __init__(
        self,
        model_config: ModelConfig,
        parallel_config: ParallelConfig,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        mesh=None,
        worker_type: WorkerType = WorkerType.MIXED,
        lora_config=None,
        speculative_config=None,
    ) -> None:
        self.model_config = model_config
        self.parallel_config = parallel_config
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.mesh = mesh
        self.worker_type = worker_type
        self.lora_config = lora_config
        self.speculative_config = speculative_config

        self.model_runner = ModelRunner(model_config, parallel_config,
                                        scheduler_config, cache_config,
                                        mesh=mesh, lora_config=lora_config,
                                        speculative_config=speculative_config)
        # Splitwise prefill pool: run prefills as layer-group segments so
        # the freshly written KV pages stream to the decode pool while
        # the remaining layers compute (worker/kv_migration.py).
        self.model_runner.segment_prefill = (
            worker_type == WorkerType.PREFILL
            and parallel_config.kv_stream_segments > 1)
        self.cache_engine: Optional[CacheEngine] = None
        self.draft_cache_engine: Optional[CacheEngine] = None
        self.kv_caches = None

    @property
    def device(self) -> jax.Device:
        if self.mesh is not None:
            return self.mesh.devices.flat[0]
        return jax.devices()[0]

    # ---- init ----

    def load_model(self) -> None:
        self.model_runner.load_model()

    def profile_num_available_blocks(
        self,
        hbm_utilization: float,
        host_swap_bytes: int,
    ) -> Tuple[int, int]:
        """Measure post-weights memory headroom and translate it into KV
        page counts (reference worker.py:180-227).

        Runs a max-shape dummy prefill against a tiny probe cache so the
        peak includes live activation memory, then sizes the real cache
        from (limit * utilization - peak).
        """
        block_bytes = CacheEngine.get_cache_block_size(
            self.cache_config, self.model_config, self.parallel_config)
        if self.speculative_config is not None:
            # The draft cache shares page indices with the target cache
            # (same page count), so each logical page costs both models'
            # bytes.
            block_bytes += CacheEngine.get_cache_block_size(
                self.cache_config,
                self.speculative_config.draft_model_config,
                self.parallel_config)
        num_host = int(host_swap_bytes // block_bytes)

        stats = self.device.memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit is None:
            if self.device.platform in ("tpu", "axon"):
                # Some transports (axon tunnel) expose no memory stats:
                # size the cache analytically from the chip's known HBM
                # and the measured parameter bytes.
                return self._estimate_blocks_from_specs(
                    hbm_utilization, block_bytes, num_host)
            logger.info(
                "Backend exposes no memory stats; defaulting to %d KV pages",
                _DEFAULT_CPU_PAGES)
            return _DEFAULT_CPU_PAGES, num_host

        # Probe run: just enough pages to hold one max-size prefill.
        from vllm_splitwise_tpu.utils import cdiv
        probe_pages = cdiv(
            min(self.scheduler_config.max_num_batched_tokens,
                self.model_config.max_model_len),
            self.cache_config.block_size) + 1
        probe_config = _clone_cache_config(self.cache_config, probe_pages)
        probe_engine = CacheEngine(probe_config, self.model_config,
                                   self.parallel_config, mesh=self.mesh,
                                   stacked=self._stacked_kv)
        probe_caches = probe_engine.device_cache
        probe_caches = self.model_runner.profile_run(probe_caches)
        del probe_caches, probe_engine

        stats = self.device.memory_stats()
        peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
        # Subtract the probe cache itself — it is freed before the real
        # allocation.
        probe_bytes = probe_pages * block_bytes
        usable = int(limit * hbm_utilization) - (peak - probe_bytes)
        num_device = max(int(usable // block_bytes), 0)
        logger.info(
            "Memory profile: limit=%.2f GiB peak=%.2f GiB -> %d device KV "
            "pages (%d host)", limit / 2**30, peak / 2**30, num_device,
            num_host)
        return num_device, num_host

    @property
    def _stacked_kv(self) -> bool:
        model = self.model_runner.model
        fn = getattr(model, "supports_stacked_kv", None)
        return bool(fn and fn())

    # Public per-chip HBM capacities (GiB); conservative where unsure.
    _HBM_BY_KIND = {
        "TPU v4": 32,
        "TPU v5 lite": 16,
        "TPU v5e": 16,
        "TPU v5": 95,
        "TPU v5p": 95,
        "TPU v6 lite": 32,
        "TPU v6e": 32,
    }

    def _estimate_blocks_from_specs(self, hbm_utilization: float,
                                    block_bytes: int,
                                    num_host: int) -> Tuple[int, int]:
        kind = self.device.device_kind
        # Longest matching prefix wins ("TPU v5 lite" must not fall
        # through to the "TPU v5" (v5p, 95 GiB) entry).
        total = None
        best_len = -1
        for name, gib in self._HBM_BY_KIND.items():
            if kind.startswith(name) and len(name) > best_len:
                total = gib * (1 << 30)
                best_len = len(name)
        if total is None:
            total = 16 * (1 << 30)
            logger.warning("Unknown TPU kind %r; assuming 16 GiB HBM", kind)
        params = self.model_runner.params
        param_bytes = sum(
            x.nbytes for x in jax.tree_util.tree_leaves(params))
        # Activation + compiler workspace reserve: 8% of HBM.
        reserve = int(0.08 * total)
        usable = int(total * hbm_utilization) - param_bytes - reserve
        num_device = max(int(usable // block_bytes), 0)
        logger.info(
            "Spec-based memory estimate (%s): HBM=%.1f GiB params=%.2f GiB "
            "-> %d device KV pages", kind, total / 2**30,
            param_bytes / 2**30, num_device)
        return num_device, num_host

    def init_cache_engine(self, cache_config: CacheConfig) -> None:
        self.cache_config = cache_config
        self.cache_engine = CacheEngine(cache_config, self.model_config,
                                        self.parallel_config,
                                        mesh=self.mesh,
                                        stacked=self._stacked_kv)
        self.kv_caches = self.cache_engine.device_cache
        if self.speculative_config is not None:
            # Same page count / block size as the target cache: the
            # scheduler's block tables address both caches.
            self.draft_cache_engine = CacheEngine(
                cache_config, self.speculative_config.draft_model_config,
                self.parallel_config, mesh=self.mesh,
                stacked=self.model_runner.draft_stacked_kv)
            self.model_runner.draft_caches = \
                self.draft_cache_engine.device_cache

    def warm_up_model(self) -> None:
        """Pre-compile the common decode/prefill buckets (analog of the
        reference's CUDA-graph capture warmup, worker.py:237-242).
        ``--enforce-eager`` skips it and compiles lazily on first use,
        matching the reference flag's semantics."""
        if self.model_config.enforce_eager:
            return
        if self.device.platform not in ("tpu", "axon"):
            # CPU (interpret-mode Pallas) compiles are cheap but the
            # dummy runs themselves are slow; lazy is strictly better.
            # VST_FORCE_WARMUP=1 overrides — the multichip dryrun uses
            # it so its virtual-CPU-mesh engine run exercises the same
            # eager bucket pre-compilation as TPU serving (and its
            # traffic dispatches are warm: no compile-stall warnings).
            import os
            if os.environ.get("VST_FORCE_WARMUP", "0") != "1":
                return
        self._run_warmup()

    def _run_warmup(self) -> None:
        # Phase pools only serve their own dispatch shapes: the prefill
        # pool never runs decode batches and vice versa (splitwise
        # executor routing), so each warms only its half.
        self.kv_caches = self.model_runner.warm_up(
            self.kv_caches,
            decode=self.worker_type != WorkerType.PREFILL,
            prefill=self.worker_type != WorkerType.DECODE)
        # The step fns DONATE the cache: the pre-warmup arrays are dead
        # buffers now.  cache_swap re-reads cache_engine.device_cache at
        # the top of every step, so it must be repointed too or the
        # first real step touches deleted arrays (TPU-only failure —
        # CPU ignores donation).
        if self.cache_engine is not None:
            self.cache_engine.device_cache = self.kv_caches
        if self.draft_cache_engine is not None:
            self.draft_cache_engine.device_cache = \
                self.model_runner.draft_caches

    # ---- LoRA management (reference worker.py add_lora/remove_lora) ----

    def add_lora(self, lora_request) -> bool:
        assert self.model_runner.lora_manager is not None, \
            "LoRA is not enabled."
        return self.model_runner.lora_manager.add_lora(lora_request)

    def remove_lora(self, lora_id: int) -> bool:
        assert self.model_runner.lora_manager is not None
        return self.model_runner.lora_manager.remove_lora(lora_id)

    def list_loras(self):
        assert self.model_runner.lora_manager is not None
        return self.model_runner.lora_manager.list_loras()

    # ---- per-step execution ----

    def cache_swap(
        self,
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
    ) -> None:
        assert self.cache_engine is not None
        if blocks_to_swap_out:
            self.cache_engine.swap_out(blocks_to_swap_out)
        if blocks_to_swap_in:
            self.cache_engine.swap_in(blocks_to_swap_in)
        if blocks_to_copy:
            self.cache_engine.copy(blocks_to_copy)
        self.kv_caches = self.cache_engine.device_cache
        if self.draft_cache_engine is not None:
            # Mirror every plan on the draft cache so draft KV follows
            # its sequence across swaps and CoW forks.
            if blocks_to_swap_out:
                self.draft_cache_engine.swap_out(blocks_to_swap_out)
            if blocks_to_swap_in:
                self.draft_cache_engine.swap_in(blocks_to_swap_in)
            if blocks_to_copy:
                self.draft_cache_engine.copy(blocks_to_copy)
            self.model_runner.draft_caches = \
                self.draft_cache_engine.device_cache

    def execute_model(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        blocks_to_swap_in: Optional[Dict[int, int]] = None,
        blocks_to_swap_out: Optional[Dict[int, int]] = None,
        blocks_to_copy: Optional[Dict[int, List[int]]] = None,
        num_decode_steps: int = 1,
        kv_stream=None,
    ) -> SamplerOutput:
        """Run one step.  ``kv_stream`` (Splitwise prefill pool only) is
        a worker/kv_migration.MigrationStream: the runner pushes each
        layer group's freshly written KV pages through it mid-forward."""
        self.cache_swap(blocks_to_swap_in or {}, blocks_to_swap_out or {},
                        blocks_to_copy or {})

        if not seq_group_metadata_list:
            return []

        output, self.kv_caches = self.model_runner.execute_model(
            seq_group_metadata_list, self.kv_caches,
            num_decode_steps=num_decode_steps, kv_stream=kv_stream)
        self._repoint_caches()
        return output

    def execute_mixed(
        self,
        prompt_meta: List[SequenceGroupMetadata],
        decode_meta: List[SequenceGroupMetadata],
        blocks_to_swap_in: Optional[Dict[int, int]] = None,
        blocks_to_swap_out: Optional[Dict[int, int]] = None,
        blocks_to_copy: Optional[Dict[int, List[int]]] = None,
        num_decode_steps: int = 1,
    ) -> Tuple[Optional[SamplerOutput], Optional[SamplerOutput]]:
        """Mixed step (--mixed-batch): decode window + prompt batch in
        one engine step on one mesh.  Returns (prompt_output,
        decode_output)."""
        self.cache_swap(blocks_to_swap_in or {}, blocks_to_swap_out or {},
                        blocks_to_copy or {})
        prompt_out, decode_out, self.kv_caches = \
            self.model_runner.execute_mixed(prompt_meta, decode_meta,
                                            self.kv_caches,
                                            num_decode_steps)
        self._repoint_caches()
        return prompt_out, decode_out

    def execute_mixed_deferred(
        self,
        prompt_meta: List[SequenceGroupMetadata],
        decode_meta: List[SequenceGroupMetadata],
        blocks_to_swap_in: Optional[Dict[int, int]] = None,
        blocks_to_swap_out: Optional[Dict[int, int]] = None,
        blocks_to_copy: Optional[Dict[int, List[int]]] = None,
        num_decode_steps: int = 1,
    ):
        """Pipelined mixed step: dispatch both halves and return
        (prompt_thunk, decode_thunk) WITHOUT fetching — the engine
        finishes them on its NEXT step, overlapping this step's device
        time with the previous step's transport + host processing."""
        self.cache_swap(blocks_to_swap_in or {}, blocks_to_swap_out or {},
                        blocks_to_copy or {})
        decode_thunk = prompt_thunk = None
        if decode_meta:
            decode_thunk, self.kv_caches = self.model_runner.execute_model(
                decode_meta, self.kv_caches, num_decode_steps, defer=True)
        if prompt_meta:
            prompt_thunk, self.kv_caches = self.model_runner.execute_model(
                prompt_meta, self.kv_caches, defer=True)
            all_mid_chunk = all(
                getattr(md, "prefill_end", None) is not None
                and md.prefill_end < next(
                    iter(md.seq_data.values())).num_tokens
                for md in prompt_meta)
            if all_mid_chunk:
                # Mid-chunk outputs are discarded by the engine: leave
                # the device array unread (no fetch).
                prompt_thunk = lambda n=len(prompt_meta): [None] * n
        self._repoint_caches()
        return prompt_thunk, decode_thunk

    def _repoint_caches(self) -> None:
        """The step fns DONATE cache buffers: after any dispatch the
        engines must address the new arrays, not the consumed ones."""
        if self.cache_engine is not None:
            self.cache_engine.device_cache = self.kv_caches
        if self.draft_cache_engine is not None:
            # The runner advances draft caches in place (donation).
            self.draft_cache_engine.device_cache = \
                self.model_runner.draft_caches


def _clone_cache_config(cache_config: CacheConfig,
                        num_pages: int) -> CacheConfig:
    probe = CacheConfig(
        block_size=cache_config.block_size,
        hbm_utilization=cache_config.hbm_utilization,
        swap_space=0,
        cache_dtype=cache_config.cache_dtype,
        sliding_window=cache_config.sliding_window,
        kv_layout=getattr(cache_config, "kv_layout", "split"),
    )
    probe.num_device_blocks = num_pages
    probe.num_host_blocks = 0
    return probe
