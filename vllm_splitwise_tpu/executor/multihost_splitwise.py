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
* **Layer-streamed over DCN** (the fork's signature latency hider,
  flash_attn.py:82-86): the prefill host's runner dispatches the forward
  as layer-group segments and a :class:`_DCNMigrationStream` ships each
  group's fresh pages through the mover mid-forward, so the DCN transfer
  rides under the remaining groups' compute.  The segment plan is fixed
  at handshake time (the "ready" message) so the decode host can post
  its matching receives right after sending the prefill RPC — before its
  own decode step — and the transfers flow while both pools compute.
* The decode host's :class:`MultihostSplitwiseExecutor` routes prompt
  steps to the remote prefill host and decode steps to its local worker,
  scattering migrated pages into the local cache before the first decode
  read — the same dataflow ordering the single-host SplitwiseExecutor
  relies on.
* LoRA: both pools carry the adapter manager; requests' adapters load
  lazily from ``lora_local_path`` on each host (shared filesystem, the
  reference's model-path assumption), and explicit add/remove fan out
  over the channel.  Speculative decoding: the prefill host runs the
  draft prefill too, and the draft model's pages ride one extra
  transfer after the target segments.

Current scope: one prefill host + one decode host, tp*dp within each
host's local devices.
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
                                                    gather_segment_pages,
                                                    migration_leaf_spec,
                                                    scatter_index_for,
                                                    scatter_pages_tree)
from vllm_splitwise_tpu.worker.worker import Worker

logger = init_logger(__name__)

_CHANNEL = "prefill-pool"


class _DCNMigrationStream:
    """Sender side of the layer-streamed DCN migration: the prefill
    host's runner calls :meth:`push` right after dispatching each layer
    group, gathering that group's migrating pages and shipping them
    through the mover while the remaining groups compute.
    :meth:`finish` covers any segments the runner didn't stream (e.g.
    the host-logits-processor fallback path) so the decode host's
    pre-posted receives always pair up 1:1 in order."""

    def __init__(self, mover: CrossHostKVMover, pages: List[int],
                 plan) -> None:
        self.mover = mover
        self._idx = jnp.asarray(pages, dtype=jnp.int32)
        self.plan = [tuple(seg) for seg in plan]
        self.pushed = 0
        self._scatter_idx = None
        self._spec_for = migration_leaf_spec(kv_cache_spec())
        # Overlap evidence: seconds from stream open to each push's
        # DCN-transfer enqueue (reported back in the outputs reply).
        self.opened_at = time.perf_counter()
        self.push_rel_s: List[float] = []

    def push(self, layer_start: int, num_layers: int, kv_caches) -> None:
        assert (layer_start, num_layers) == self.plan[self.pushed], (
            f"segment push ({layer_start}, {num_layers}) deviates from "
            f"the handshake plan {self.plan} at index {self.pushed}")
        if self._scatter_idx is None:
            self._scatter_idx = scatter_index_for(kv_caches, self._idx)
        seg = gather_segment_pages(kv_caches, self._scatter_idx,
                                   layer_start, num_layers)
        stacked = isinstance(kv_caches, tuple)
        self.mover.transfer(seg,
                            lambda leaf: self._spec_for(leaf, stacked))
        self.pushed += 1
        self.push_rel_s.append(time.perf_counter() - self.opened_at)

    def finish(self, kv_caches) -> None:
        for layer_start, num_layers in self.plan[self.pushed:]:
            self.push(layer_start, num_layers, kv_caches)


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
                                    worker_type=WorkerType.DECODE,
                                    lora_config=lora_config,
                                    speculative_config=speculative_config)
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
        self.num_streamed = 0
        self.num_pages_moved = 0
        self.last_migration_seconds = 0.0
        self.last_stream_timeline: Optional[Dict] = None
        # Per-phase wall-time accumulators for the dual step (the
        # scaling probe's breakdown of where 2-pool time goes):
        # send = serialize+ship the prefill job; decode = the local
        # decode window; collect = wait for the prefill reply AFTER the
        # decode step returns (pure exposed remote latency — the
        # overlapped part is hidden inside `decode`); scatter is inside
        # collect and also tracked via last_migration_seconds.
        import collections as _collections
        self.phase_seconds = _collections.Counter()
        # Latest cumulative compile-stall counters reported by the
        # remote prefill host (updated on every prefill reply).
        self.remote_dispatch_stats: Dict[str, float] = {}
        self.phase_counts = _collections.Counter()

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
        # Warm the local decode pool's bucket programs while the remote
        # prefill host warms its own (the recv below tolerates both).
        self.decode_worker.warm_up_model()
        ready = self.channel.recv(timeout=600)
        assert ready["op"] == "ready", ready
        # Fixed at handshake time so receives can be posted before the
        # prefill host starts sending (see module docstring).
        self.segment_plan = ready.get("segment_plan")
        self.remote_has_draft = bool(ready.get("has_draft"))

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
            pending = self._send_prefill(seq_group_metadata_list,
                                         blocks_to_nw, blocks_to_swap_in,
                                         blocks_to_swap_out, blocks_to_copy)
            return self._complete_prefill(pending)
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
        prefill request goes over the wire FIRST (and, when the segment
        plan is known, the per-layer-group DCN receives are posted right
        behind it), the decode pool steps while the prefill host computes
        and its transfers flow, and only then is the prefill reply
        collected and the staged pages scattered into the local cache.
        No threads needed — the RPC and the posted transfers are the
        async boundaries."""
        prompt_out = None
        decode_out = None
        pending = None
        if prompt_meta:
            t0 = time.perf_counter()
            pending = self._send_prefill(prompt_meta,
                                         prompt_blocks_to_nw or {})
            self.phase_seconds["send_prefill"] += time.perf_counter() - t0
            self.phase_counts["send_prefill"] += 1
        if decode_meta or decode_blocks_to_swap_in or \
                decode_blocks_to_swap_out or decode_blocks_to_copy:
            t0 = time.perf_counter()
            decode_out = self.decode_worker.execute_model(
                decode_meta,
                blocks_to_swap_in=decode_blocks_to_swap_in,
                blocks_to_swap_out=decode_blocks_to_swap_out,
                blocks_to_copy=decode_blocks_to_copy,
                num_decode_steps=num_decode_steps)
            self.phase_seconds["decode_execute"] += \
                time.perf_counter() - t0
            self.phase_counts["decode_execute"] += 1
        if pending is not None:
            # Time spent here is the EXPOSED remote-prefill latency —
            # whatever the concurrent decode window did not hide.
            t0 = time.perf_counter()
            prompt_out = self._complete_prefill(pending)
            self.phase_seconds["collect_prefill"] += \
                time.perf_counter() - t0
            self.phase_counts["collect_prefill"] += 1
            if pending.get("pages"):
                self.phase_seconds["scatter"] += \
                    self.last_migration_seconds
        return prompt_out, decode_out

    def _send_prefill(self, seqs, blocks_to_nw, swap_in=None,
                      swap_out=None, copy=None) -> Dict:
        """Ship the prefill job; post the matching DCN receives for the
        handshake's segment plan (and the draft cache, under spec decode)
        immediately, so the transfers can flow while the local decode
        step runs.  Returns the pending-completion record."""
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
        pending = {"pages": pages, "staged": None, "draft": None}
        if pages and self.segment_plan:
            pending["staged"] = self._post_segment_receives(pages)
            if self.remote_has_draft:
                pending["draft"] = self._post_draft_receive(pages)
        return pending

    def _complete_prefill(self, pending: Dict) -> SamplerOutput:
        reply = self.channel.recv(timeout=600)
        if reply.get("op") == "error":
            raise RuntimeError(
                f"prefill host failed: {reply.get('message')}")
        assert reply["op"] == "outputs", reply
        # Cumulative remote-runner stall counters (every reply carries
        # the latest totals); surfaced via engine _get_stats.
        self.remote_dispatch_stats = {
            "compile_stalls": reply.get("compile_stalls", 0),
            "compile_stall_s": reply.get("compile_stall_s", 0.0),
        }
        if reply.get("push_rel_s"):
            self.last_stream_timeline = {
                "prefill_exec_s": reply.get("prefill_exec_s"),
                "push_rel_s": reply["push_rel_s"],
            }
        pages = pending["pages"]
        if pages:
            started = time.perf_counter()
            if pending["staged"] is not None:
                self._scatter_staged(pending["staged"])
                self.num_streamed += 1
            else:
                self._receive_pages(pages)
            if self.remote_has_draft:
                draft = pending["draft"] or self._post_draft_receive(pages)
                self._scatter_draft(draft)
            self.num_migrations += 1
            self.num_pages_moved += len(pages)
            self.last_migration_seconds = time.perf_counter() - started
        return reply["outputs"]

    def _post_segment_receives(self, pages: List[int]):
        """Post one DCN receive per layer-group segment (matching the
        prefill host's push order); returns (scatter_idx, [segment
        pytrees]) of landing arrays."""
        cache = self.decode_worker.kv_caches
        idx = jnp.asarray(pages, dtype=jnp.int32)
        scatter_idx = scatter_index_for(cache, idx)
        stacked = isinstance(cache, tuple)
        spec_for = migration_leaf_spec(kv_cache_spec())
        templates = self._segment_templates(len(pages))
        segs = [self.mover.transfer(t,
                                    lambda leaf: spec_for(leaf, stacked))
                for t in templates]
        return scatter_idx, segs

    def _segment_templates(self, num_pages: int):
        """Per-segment receive templates (ShapeDtypeStructs), cached by
        migrating-page count — tracing them per prefill would put an
        eval_shape on the TTFT path."""
        if not hasattr(self, "_template_cache"):
            self._template_cache = {}
        hit = self._template_cache.get(num_pages)
        if hit is not None:
            return hit
        cache = self.decode_worker.kv_caches
        dummy_idx = jnp.zeros((num_pages, ), dtype=jnp.int32)
        scatter_idx = scatter_index_for(cache, dummy_idx)
        templates = [
            jax.eval_shape(
                lambda c, ls=ls, n=n: gather_segment_pages(
                    c, scatter_idx, ls, n), cache)
            for ls, n in self.segment_plan
        ]
        self._template_cache[num_pages] = templates
        return templates

    def _scatter_staged(self, staged) -> None:
        scatter_idx, segs = staged
        cache = self.decode_worker.kv_caches
        if isinstance(cache, tuple):
            received = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *segs)
        else:
            received = [kv for seg in segs for kv in seg]
        self.decode_worker.kv_caches = scatter_pages_tree(
            cache, scatter_idx, received)
        if self.decode_worker.cache_engine is not None:
            self.decode_worker.cache_engine.device_cache = \
                self.decode_worker.kv_caches

    def _post_draft_receive(self, pages: List[int]):
        """Post the draft (speculative) cache's page receive; one bulk
        transfer after the target segments (the draft model is small)."""
        draft = self.decode_worker.model_runner.draft_caches
        assert draft is not None, \
            "prefill host runs a draft model but this host has none"
        idx = jnp.asarray(pages, dtype=jnp.int32)
        scatter_idx = scatter_index_for(draft, idx)
        stacked = isinstance(draft, tuple)
        spec_for = migration_leaf_spec(kv_cache_spec())
        template = jax.eval_shape(
            lambda c: gather_pages_tree(c, idx)[0], draft)
        recv = self.mover.transfer(template,
                                   lambda leaf: spec_for(leaf, stacked))
        return scatter_idx, recv

    def _scatter_draft(self, posted) -> None:
        scatter_idx, recv = posted
        runner = self.decode_worker.model_runner
        runner.draft_caches = scatter_pages_tree(runner.draft_caches,
                                                 scatter_idx, recv)
        if self.decode_worker.draft_cache_engine is not None:
            self.decode_worker.draft_cache_engine.device_cache = \
                runner.draft_caches

    def _receive_pages(self, pages: List[int]) -> None:
        """Bulk receiver (no segment plan): one DCN page transfer, then
        the cache scatter."""
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

    # ---- LoRA management (both pools serve the adapters; the engine's
    # serialized stepping keeps the channel request/reply pairing safe) --

    def add_lora(self, lora_request) -> bool:
        ok = self.decode_worker.add_lora(lora_request)
        self.channel.send({"op": "add_lora", "request": lora_request})
        reply = self.channel.recv(timeout=120)
        if reply.get("op") == "error":
            raise RuntimeError(f"prefill host add_lora failed: "
                               f"{reply.get('message')}")
        return ok and bool(reply.get("ok"))

    def remove_lora(self, lora_id: int) -> bool:
        ok = self.decode_worker.remove_lora(lora_id)
        self.channel.send({"op": "remove_lora", "lora_id": lora_id})
        reply = self.channel.recv(timeout=120)
        if reply.get("op") == "error":
            raise RuntimeError(f"prefill host remove_lora failed: "
                               f"{reply.get('message')}")
        return ok and bool(reply.get("ok"))

    def list_loras(self):
        return self.decode_worker.list_loras()

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
        self.has_draft = speculative_config is not None
        state = build_parallel_state(
            tensor_parallel_size=parallel_config.tensor_parallel_size,
            sep_prompt_token=False,
            devices=jax.local_devices(),
        )
        self.worker = Worker(model_config, parallel_config,
                             scheduler_config, cache_config,
                             mesh=state.mesh,
                             worker_type=WorkerType.PREFILL,
                             lora_config=lora_config,
                             speculative_config=speculative_config)
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
        # Pre-compile this host's prefill bucket programs before
        # declaring ready: a first-seen prompt shape compiling
        # mid-traffic would stall the whole disaggregated deployment's
        # TTFT (and now surfaces in the master's stall metrics).
        self.worker.warm_up_model()
        self.mover = _build_mover(parallel_config, self.worker.mesh)
        # The segment plan is a function of the model + cache layout +
        # --kv-stream-segments only, so it can be fixed at handshake time
        # and the decode host can pre-post its matching receives.
        self.segment_plan = self.worker.model_runner._prefill_segment_plan(
            self.worker.kv_caches, None)
        self.channel.send({"op": "ready",
                           "segment_plan": self.segment_plan,
                           "has_draft": self.has_draft})
        logger.info("prefill host ready (%d device pages, %s)",
                    cache_config.num_device_blocks,
                    f"{len(self.segment_plan)} stream segments"
                    if self.segment_plan else "bulk migration")

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
            if op in ("add_lora", "remove_lora"):
                try:
                    if op == "add_lora":
                        ok = self.worker.add_lora(msg["request"])
                    else:
                        ok = self.worker.remove_lora(msg["lora_id"])
                    self.channel.send({"op": "lora", "ok": ok})
                except Exception as exc:  # noqa: BLE001
                    logger.exception("%s failed", op)
                    self.channel.send({"op": "error",
                                       "message": repr(exc)})
                continue
            if op != "prefill":
                self.channel.send({"op": "error",
                                   "message": f"unknown op {op!r}"})
                continue
            try:
                stream = None
                if msg["pages"] and self.segment_plan:
                    stream = _DCNMigrationStream(self.mover, msg["pages"],
                                                 self.segment_plan)
                t0 = time.perf_counter()
                outputs = self.worker.execute_model(
                    msg["seqs"],
                    blocks_to_swap_in=msg["swap_in"],
                    blocks_to_swap_out=msg["swap_out"],
                    blocks_to_copy=msg["copy"],
                    kv_stream=stream)
                exec_s = time.perf_counter() - t0
            except Exception as exc:  # noqa: BLE001 - reported to master
                logger.exception("prefill job failed")
                self.channel.send({"op": "error", "message": repr(exc)})
                # The decode host pre-posted one DCN receive per segment
                # (plus the draft) the moment it sent this job; if they
                # stay queued they would mis-pair with the NEXT prefill's
                # transfers should the caller survive the RuntimeError.
                # Finish the plan with whatever the cache holds — the
                # caller raises and never scatters these pages.
                if msg["pages"]:
                    try:
                        if stream is not None:
                            stream.finish(self.worker.kv_caches)
                        else:
                            self._send_pages(msg["pages"])
                        if self.has_draft:
                            self._send_draft(msg["pages"])
                    except Exception:  # noqa: BLE001
                        logger.exception("post-error segment drain failed")
                continue
            ds = self.worker.model_runner.dispatch_stats
            self.channel.send({
                "op": "outputs",
                "outputs": outputs,
                # Overlap evidence: pushes enqueued at these offsets into
                # a prefill forward that took prefill_exec_s in total.
                "prefill_exec_s": exec_s,
                "push_rel_s": stream.push_rel_s if stream else [],
                # Cumulative compile-stall counters of THIS host's model
                # runner: the master folds them into its Prometheus
                # stats — without this, a remote prefill shape compiling
                # mid-traffic would be invisible in
                # vllm:compile_stalls_total.
                "compile_stalls": ds.get("compile_stalls", 0),
                "compile_stall_s": ds.get("compile_stall_s", 0.0),
            })
            if msg["pages"]:
                if stream is not None:
                    # Ship any segments the runner didn't stream (host-
                    # processor fallback) so the decode host's pre-posted
                    # receives always pair up.
                    stream.finish(self.worker.kv_caches)
                else:
                    self._send_pages(msg["pages"])
                if self.has_draft:
                    self._send_draft(msg["pages"])

    def _send_pages(self, pages: List[int]) -> None:
        idx = jnp.asarray(pages, dtype=jnp.int32)
        cache = self.worker.kv_caches
        stacked = isinstance(cache, tuple)
        gathered, _ = gather_pages_tree(cache, idx)
        spec_for = migration_leaf_spec(kv_cache_spec())
        self.mover.transfer(gathered, lambda leaf: spec_for(leaf, stacked))

    def _send_draft(self, pages: List[int]) -> None:
        """The draft (speculative) model's prompt KV rides one bulk
        transfer after the target segments (same page indices)."""
        idx = jnp.asarray(pages, dtype=jnp.int32)
        draft = self.worker.model_runner.draft_caches
        gathered, _ = gather_pages_tree(draft, idx)
        stacked = isinstance(draft, tuple)
        spec_for = migration_leaf_spec(kv_cache_spec())
        self.mover.transfer(gathered, lambda leaf: spec_for(leaf, stacked))


def run_prefill_host(engine_args) -> None:
    """Entry point for a prefill-host process: build, serve, exit on
    shutdown."""
    configs = engine_args.create_engine_configs()
    server = PrefillHostServer(*configs)
    server.serve_forever()
