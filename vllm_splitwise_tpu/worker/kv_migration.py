"""Cross-pool KV-cache migration (the Splitwise transport).

TPU-native replacement for the reference's MSCCL++ proxy-channel machinery
(vllm/worker/comm_utils.py, csrc/kv_comm_kernels.cu): where the reference
pairs GPU rank r with rank r+P and drives per-sequence device semaphores
around one-sided puts, here the single controller gathers the migrating
pages from the prefill mesh, ships them with ``jax.device_put`` (async,
ICI/DCN routed by the runtime) and scatters them into the decode mesh's
cache.  Ordering needs no semaphores: the decode step's first read of the
cache arrays data-depends on the scatter, so XLA serializes them — the
per-slot bookkeeping kept here is for dedup and migration-latency metrics
(the role of the reference's SeqToSlotMapper semaphores).

Layer-streamed overlap (the fork's signature latency hider — every
attention layer put()s its fresh KV to the paired decode worker DURING
the prefill forward, flash_attn.py:82-86): the runner dispatches the
prefill as layer-group segments and calls :meth:`MigrationStream.push`
right after each segment is *dispatched*.  JAX dispatch is async, so the
gather + cross-mesh ``device_put`` each push enqueues rides the DMA
engines while the remaining segments' compute occupies the cores;
per-device program order guarantees the gather reads segment g's pages
before segment g+1's donated buffers reuse them.
:meth:`KVMigrationManager.commit` then scatters the staged (already
transferred) pages into the decode cache — a purely local write,
deferred until any concurrently running decode step has joined so its
in-flight cache value is not clobbered.

Transfers coalesce contiguous page ranges (vllm/utils.py:399-425 analog)
into a single gather/scatter index vector per migration batch.
"""
from __future__ import annotations

import time
from typing import Dict, Iterable, List, Optional, Set

import jax
import jax.numpy as jnp

from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.ops.kv_cache import gather_pages, scatter_pages
from vllm_splitwise_tpu.utils import coalesce_blocks

logger = init_logger(__name__)


def scatter_index_for(cache, idx):
    """Physical page indices for a logical page-id vector.  Under the
    fused interleaved layout logical page i lives at physical pages 2i
    (K) and 2i+1 (V) of one array; other layouts are identity."""
    if isinstance(cache, tuple) and len(cache) == 2 and cache[1] is None:
        from vllm_splitwise_tpu.ops.kv_cache import fused_page_indices
        return fused_page_indices(idx)
    return idx


def gather_pages_tree(src_cache, idx):
    """Pull the given pages out of a cache pytree.

    Returns ``(pages_tree, scatter_idx)`` — under the fused interleaved
    layout the physical indices differ from the logical ones, and the
    scatter side must use the SAME physical indices.
    """
    idx = scatter_index_for(src_cache, idx)
    if isinstance(src_cache, tuple):  # stacked [L, P, kvh, ps, hd]
        # Leaf-wise so int4 QuantPages (data + scale leaves of different
        # ranks) migrate alongside plain page arrays.
        return jax.tree.map(
            lambda a: jnp.take(a, idx, axis=1, mode="clip"),
            src_cache), idx
    return [(gather_pages(k, idx), gather_pages(v, idx))
            for k, v in src_cache], idx


def scatter_pages_tree(dst_cache, idx, pages):
    """Write gathered pages into a cache pytree at ``idx`` (the
    scatter_idx returned by :func:`gather_pages_tree`)."""
    if isinstance(dst_cache, tuple):
        return jax.tree.map(
            lambda dst, src: dst.at[:, idx].set(src.astype(dst.dtype),
                                                mode="drop"),
            dst_cache, pages)
    return [(scatter_pages(k_dst, idx, k_pages),
             scatter_pages(v_dst, idx, v_pages))
            for (k_dst, v_dst), (k_pages, v_pages) in zip(dst_cache, pages)]


def migration_leaf_spec(dst_spec):
    """Per-leaf PartitionSpec chooser for gathered page pytrees: stacked
    leaves carry a leading layer axis; scale leaves of quantized caches
    have lower rank — truncate the spec to each leaf's rank."""
    from jax.sharding import PartitionSpec as P
    base = (None, ) + tuple(dst_spec)

    def for_leaf(a, stacked: bool):
        dims = base if stacked else tuple(dst_spec)
        return P(*dims[:a.ndim])

    return for_leaf


def _dedup_pages(blocks_to_nw: Dict[int, List[int]]) -> List[int]:
    """One combined, de-duplicated, coalesced page-id list for a whole
    migration batch: one gather + one scatter per layer tensor."""
    all_pages: List[int] = []
    seen: Set[int] = set()
    for block_ids in blocks_to_nw.values():
        for start_id, n in coalesce_blocks(block_ids):
            for p in range(start_id, start_id + n):
                if p not in seen:
                    seen.add(p)
                    all_pages.append(p)
    return all_pages


def _num_cache_layers(cache) -> int:
    if isinstance(cache, tuple):
        return cache[0].shape[0]
    return len(cache)


def gather_segment_pages(kv_caches, scatter_idx, layer_start: int,
                         num_layers: int):
    """Pull one layer group's worth of the migrating pages out of a cache
    pytree.  ``scatter_idx`` must already be the physical page indices
    (:func:`scatter_index_for`); stacked leaves keep their leading layer
    axis (sliced to the segment)."""
    if isinstance(kv_caches, tuple):
        return jax.tree.map(
            lambda a: jnp.take(
                jax.lax.slice_in_dim(a, layer_start,
                                     layer_start + num_layers, axis=0),
                scatter_idx, axis=1, mode="clip"), kv_caches)
    return [(gather_pages(k, scatter_idx), gather_pages(v, scatter_idx))
            for k, v in kv_caches[layer_start:layer_start + num_layers]]


class MigrationStream:
    """One prefill step's layer-streamed migration (module docstring).

    Created by :meth:`KVMigrationManager.begin`; the model runner calls
    :meth:`push` right after dispatching each prefill layer-group
    segment; the executor calls :meth:`KVMigrationManager.commit` once
    the concurrently running decode step (if any) has joined."""

    def __init__(self, manager: "KVMigrationManager",
                 blocks_to_nw: Dict[int, List[int]]) -> None:
        self.manager = manager
        self.blocks_to_nw = blocks_to_nw
        self.pages = _dedup_pages(blocks_to_nw)
        self._idx = jnp.asarray(self.pages, dtype=jnp.int32)
        self._scatter_idx = None
        # [(layer_start, num_layers, shipped pages pytree)]
        self.segments: List[tuple] = []
        self.layers_pushed = 0
        # Dispatch timeline (overlap evidence): seconds from stream open
        # to each push's ENQUEUE — pushes landing well before the prefill
        # completes are transfers riding under the remaining compute.
        self.opened_at = time.perf_counter()
        self.push_rel_s: List[float] = []

    def push(self, layer_start: int, num_layers: int, kv_caches) -> None:
        """Gather layers ``[layer_start, layer_start + num_layers)`` of
        the migrating pages from the prefill cache and enqueue their
        transfer to the decode pool.  Async — returns once dispatched;
        the transfer rides the DMA engines under the remaining segments'
        compute (the reference's per-layer put(), flash_attn.py:82-86)."""
        if not self.pages:
            return
        if self._scatter_idx is None:
            self._scatter_idx = scatter_index_for(kv_caches, self._idx)
        seg = gather_segment_pages(kv_caches, self._scatter_idx,
                                   layer_start, num_layers)
        seg = self.manager._ship(seg, stacked=isinstance(kv_caches, tuple))
        self.segments.append((layer_start, num_layers, seg))
        self.layers_pushed += num_layers
        self.push_rel_s.append(time.perf_counter() - self.opened_at)


class KVMigrationManager:
    """Moves KV pages from the prefill worker's cache to the decode
    worker's cache; page ids are shared (one block manager spans both
    pools)."""

    def __init__(self, prefill_worker, decode_worker) -> None:
        self.prefill_worker = prefill_worker
        self.decode_worker = decode_worker
        self._migrated_slots: Set[int] = set()
        # Rolling migration stats (surfaced via engine metrics).
        self.num_migrations = 0
        self.num_streamed = 0
        self.num_pages_moved = 0
        self.last_migration_seconds = 0.0
        self.last_push_timeline: List[float] = []

    # ---- layer-streamed path ----

    def begin(self, blocks_to_nw: Dict[int, List[int]]
              ) -> Optional[MigrationStream]:
        """Open a layer-streamed migration for one prefill step; returns
        None when nothing migrates this step."""
        if not blocks_to_nw:
            return None
        return MigrationStream(self, blocks_to_nw)

    def commit(self, stream: Optional[MigrationStream]) -> None:
        """Land a stream's staged (already transferred) pages in the
        decode cache.  Falls back to one bulk migration when the runner
        didn't stream every layer (host-processor prefills, non-scannable
        models, ``--kv-stream-segments 1``).  Must run after any
        concurrently dispatched decode step has joined: the scatter
        produces a new decode cache value, and scattering into the
        pre-step cache would drop that step's in-flight KV writes."""
        if stream is None:
            return
        total_layers = _num_cache_layers(self.decode_worker.kv_caches)
        if not stream.segments or stream.layers_pushed != total_layers:
            self.migrate(stream.blocks_to_nw)
            return
        start = time.perf_counter()
        segs = sorted(stream.segments, key=lambda s: s[0])
        expected = 0
        for ls, n, _ in segs:
            assert ls == expected, (
                f"segment layer ranges overlap or leave holes: "
                f"{[(s[0], s[1]) for s in segs]}")
            expected += n
        if isinstance(self.decode_worker.kv_caches, tuple):
            pages = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                                 *[s[2] for s in segs])
        else:
            pages = [kv for _, _, seg in segs for kv in seg]
        idx = stream._scatter_idx
        self.decode_worker.kv_caches = scatter_pages_tree(
            self.decode_worker.kv_caches, idx, pages)
        if self.decode_worker.cache_engine is not None:
            self.decode_worker.cache_engine.device_cache = \
                self.decode_worker.kv_caches
        # Draft (speculative) caches are small: ship them in one piece.
        self._migrate_draft(stream._idx)
        self._migrated_slots.update(stream.blocks_to_nw.keys())
        self.num_migrations += 1
        self.num_streamed += 1
        self.num_pages_moved += len(stream.pages)
        self.last_migration_seconds = time.perf_counter() - start
        self.last_push_timeline = list(stream.push_rel_s)

    def _dst_sharding(self):
        mesh = self.decode_worker.mesh
        if mesh is None:
            return None
        from jax.sharding import NamedSharding

        from vllm_splitwise_tpu.parallel.mesh import kv_cache_spec
        return NamedSharding(mesh, kv_cache_spec())

    def migrate(self, blocks_to_nw: Dict[int, List[int]]) -> None:
        """Dispatch the migration of every slot's pages (called right
        after the prefill step that wrote them).  Async: returns once the
        copies are enqueued; the decode-side data dependency does the
        waiting."""
        if not blocks_to_nw:
            return
        start = time.perf_counter()
        all_pages = _dedup_pages(blocks_to_nw)
        self._migrated_slots.update(blocks_to_nw.keys())
        idx = jnp.asarray(all_pages, dtype=jnp.int32)

        self.decode_worker.kv_caches = self._migrate_cache(
            self.prefill_worker.kv_caches, self.decode_worker.kv_caches,
            idx)
        if self.decode_worker.cache_engine is not None:
            self.decode_worker.cache_engine.device_cache = \
                self.decode_worker.kv_caches

        self._migrate_draft(idx)

        self.num_migrations += 1
        self.num_pages_moved += len(all_pages)
        self.last_migration_seconds = time.perf_counter() - start

    def _migrate_draft(self, idx) -> None:
        """Speculative decoding on the decode pool: the draft model's
        prompt KV (written by the prefill pool's draft prefill) rides
        the same page indices and must follow — without it the decode
        pool's draft proposes against holes forever."""
        src_draft = self.prefill_worker.model_runner.draft_caches
        dst_draft = self.decode_worker.model_runner.draft_caches
        if src_draft is None or dst_draft is None:
            return
        new_draft = self._migrate_cache(src_draft, dst_draft, idx)
        self.decode_worker.model_runner.draft_caches = new_draft
        if self.decode_worker.draft_cache_engine is not None:
            self.decode_worker.draft_cache_engine.device_cache = new_draft

    def _ship(self, pages, stacked: bool):
        """Enqueue the gathered pages' transfer to the decode pool's
        placement (async device_put; a no-op when both pools share a
        single device, as in CPU tests)."""
        dst_sharding = self._dst_sharding()
        if dst_sharding is not None:
            from jax.sharding import NamedSharding
            spec_for = migration_leaf_spec(dst_sharding.spec)
            return jax.tree.map(
                lambda a: jax.device_put(
                    a, NamedSharding(self.decode_worker.mesh,
                                     spec_for(a, stacked))), pages)
        if self.decode_worker.mesh is None and \
                self.prefill_worker.device != self.decode_worker.device:
            return jax.tree.map(
                lambda a: jax.device_put(a, self.decode_worker.device),
                pages)
        return pages

    def _migrate_cache(self, src_cache, dst_cache, idx):
        """Gather `idx` pages from one cache, ship them to the decode
        pool's placement, scatter into the destination; returns the new
        destination pytree (stacked tuple or per-layer list)."""
        stacked = isinstance(src_cache, tuple)
        pages, idx = gather_pages_tree(src_cache, idx)
        pages = self._ship(pages, stacked)
        return scatter_pages_tree(dst_cache, idx, pages)

    def ensure_migrated(self, slots: Iterable[int]) -> None:
        """Decode-side check before attending over migrated pages.  With
        single-controller dataflow this is a consistency assertion, not a
        blocking wait — a miss means the scheduler produced a decode
        batch whose pages were never pushed from the prefill pool, and
        decoding would silently attend over garbage, so it is an ERROR,
        not a warning."""
        missing = [s for s in slots if s not in self._migrated_slots]
        if missing:
            raise RuntimeError(
                f"Decode step references unmigrated KV slots {missing} — "
                "the pages were never pushed from the prefill pool "
                "(scheduler/migration ordering bug).")

    def free_slots(self, slots: Iterable[int]) -> None:
        for s in slots:
            self._migrated_slots.discard(s)
