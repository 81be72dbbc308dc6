"""Iteration-level (continuous-batching) scheduler.

Role-parity with the reference's ``vllm/core/scheduler.py``: prompt-first
batching under token/seq/padding budgets, decode steps with preemption by
recompute or host-swap, copy-on-write planning, and — under phase
disaggregation (``track_prompt_blocks``, the Splitwise fork's delta at
vllm/core/scheduler.py:90-101,269-277,376-385) — a ``blocks_to_nw`` plan
mapping each migrating sequence's transfer slot to the KV block ids that
must move from the prefill pool to the decode pool.

Pure host-side Python; emits plans that the executor/worker turn into
device operations.
"""
from __future__ import annotations

import enum
import time
from collections import deque
from typing import Deque, Dict, Iterable, List, Optional, Tuple, Union

from vllm_splitwise_tpu.config import CacheConfig, LoRAConfig, SchedulerConfig
from vllm_splitwise_tpu.core.block_manager import AllocStatus
from vllm_splitwise_tpu.core.native_block_manager import make_block_space_manager
from vllm_splitwise_tpu.core.policy import PolicyFactory
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.sequence import (Sequence, SequenceData,
                                         SequenceGroup,
                                         SequenceGroupMetadata,
                                         SequenceStatus)
from vllm_splitwise_tpu.utils import SeqToSlotMapper

logger = init_logger(__name__)


class PreemptionMode(enum.Enum):
    """SWAP: move KV blocks to host memory and bring them back later.
    RECOMPUTE: drop the KV and re-prefill from scratch (cheaper for
    single-sequence groups, which dominate)."""
    SWAP = enum.auto()
    RECOMPUTE = enum.auto()


class SchedulerOutputs:

    def __init__(
        self,
        scheduled_seq_groups: List[SequenceGroup],
        prompt_run: bool,
        num_batched_tokens: int,
        blocks_to_swap_in: Dict[int, int],
        blocks_to_swap_out: Dict[int, int],
        blocks_to_copy: Dict[int, List[int]],
        blocks_to_nw: Dict[int, List[int]],
        ignored_seq_groups: List[SequenceGroup],
        num_decode_steps: int = 1,
        prefill_chunks: Optional[Dict[str, Tuple[int, int]]] = None,
    ) -> None:
        self.scheduled_seq_groups = scheduled_seq_groups
        self.prompt_run = prompt_run
        self.num_batched_tokens = num_batched_tokens
        self.blocks_to_swap_in = blocks_to_swap_in
        self.blocks_to_swap_out = blocks_to_swap_out
        self.blocks_to_copy = blocks_to_copy
        # slot_id -> KV block ids that must migrate prefill->decode pool
        # for the owning sequence (Splitwise).
        self.blocks_to_nw = blocks_to_nw
        self.ignored_seq_groups = ignored_seq_groups
        # Decode steps fused into one device dispatch for this batch
        # (TPU multi-step decode; 1 = classic single-step semantics).
        self.num_decode_steps = num_decode_steps
        # request_id -> (start, end) prompt positions computed this step
        # (chunked prefill); end < prompt_len means no token is sampled.
        self.prefill_chunks = prefill_chunks or {}
        # Swap in and swap out should never happen in the same step.
        assert not (blocks_to_swap_in and blocks_to_swap_out)

    def is_empty(self) -> bool:
        return (not self.scheduled_seq_groups and not self.blocks_to_swap_in
                and not self.blocks_to_swap_out and not self.blocks_to_copy)


class Scheduler:

    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        lora_config: Optional[LoRAConfig] = None,
        track_prompt_blocks: bool = False,
        enable_caching: bool = False,
    ) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.lora_config = lora_config
        # True iff the engine runs phase-disaggregated (Splitwise): the
        # scheduler must plan KV migrations for freshly prefilled seqs.
        self.track_prompt_blocks = track_prompt_blocks

        self.prompt_limit = min(scheduler_config.max_model_len,
                                scheduler_config.max_num_batched_tokens)

        self.policy = PolicyFactory.get_policy("fcfs")
        # Native (C++) bookkeeping when csrc/block_engine.cpp builds;
        # Python fallback otherwise (VLLM_TPU_DISABLE_NATIVE=1 forces it).
        self.block_manager = make_block_space_manager(
            block_size=cache_config.block_size,
            num_gpu_blocks=cache_config.num_device_blocks or 0,
            num_cpu_blocks=cache_config.num_host_blocks or 0,
            sliding_window=cache_config.sliding_window,
            enable_caching=enable_caching,
        )

        self.waiting: Deque[SequenceGroup] = deque()
        self.running: Deque[SequenceGroup] = deque()
        self.swapped: Deque[SequenceGroup] = deque()
        # Chunked prefill: groups whose pages are allocated and whose
        # prompt is PARTIALLY computed.  They re-enter the prompt phase
        # until the final chunk runs, then move to `running`; the decode
        # phase never sees them (their pages are pinned meanwhile).
        self.prefilling: Deque[SequenceGroup] = deque()
        # Decode runs since the last prompt run (decode-priority
        # scheduling; see _schedule).
        self._decodes_since_prompt = 10**9
        # Cumulative swap-preemption count (observability; lets tests
        # assert the swap path actually ran).
        self.num_swapped_total = 0
        # Seq ids whose KV was produced by a prompt run this engine
        # tracked (Splitwise): only these need a first-decode-step
        # migration record.  Forked beam/n>1 children read the parent's
        # already-migrated pages and must NOT emit transfer slots.
        self._nw_prompt_seqs: set = set()

        self.seq_to_slot_mapper: Optional[SeqToSlotMapper] = (
            SeqToSlotMapper() if track_prompt_blocks else None)

    @property
    def lora_enabled(self) -> bool:
        return bool(self.lora_config)

    # ---- request intake / teardown ----

    def add_seq_group(self, seq_group: SequenceGroup) -> None:
        self.waiting.append(seq_group)

    def abort_seq_group(self, request_id: Union[str, Iterable[str]]) -> None:
        targets = ({request_id} if isinstance(request_id, str)
                   else set(request_id))
        for queue in (self.waiting, self.running, self.swapped,
                      self.prefilling):
            if not targets:
                break
            kept: List[SequenceGroup] = []
            for group in queue:
                if group.request_id not in targets:
                    kept.append(group)
                    continue
                targets.discard(group.request_id)
                for seq in group.get_seqs():
                    if not seq.is_finished():
                        seq.status = SequenceStatus.FINISHED_ABORTED
                        self.free_seq(seq)
            if len(kept) != len(queue):
                queue.clear()
                queue.extend(kept)

    def has_unfinished_seqs(self) -> bool:
        return bool(self.waiting or self.running or self.swapped
                    or self.prefilling)

    def get_num_unfinished_seq_groups(self) -> int:
        return (len(self.waiting) + len(self.running) +
                len(self.swapped) + len(self.prefilling))

    # ---- the scheduling algorithm ----

    def _track_nw_blocks(self, seq_group: SequenceGroup,
                         blocks_to_nw: Dict[int, List[int]],
                         prompt_run: bool = False) -> None:
        """Record KV blocks to migrate for sequences that just (or are
        about to) cross the prefill->decode boundary: every prompt run
        (the reference only tracks output_len <= 1 there,
        vllm/core/scheduler.py:269-277 — tracking all scheduled prompt
        seqs additionally covers preempt-by-recompute of sequences with
        prior output) and the first decode step (output_len == 1,
        reference :376-385)."""
        if not self.track_prompt_blocks:
            return
        assert self.seq_to_slot_mapper is not None
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            if prompt_run:
                self._nw_prompt_seqs.add(seq.seq_id)
            elif (seq.output_len > 1
                  or seq.seq_id not in self._nw_prompt_seqs):
                continue
            slot_id = self.seq_to_slot_mapper.get_slot_id(seq.seq_id)
            block_ids = self.block_manager.get_block_table(seq)
            blocks_to_nw[slot_id] = list(dict.fromkeys(block_ids))

    def _schedule(self) -> SchedulerOutputs:
        # Prompts-first policy, unless sequences are swapped out — those
        # must resume first.  With decode_priority_steps set, a prompt
        # run additionally requires that many decode runs since the last
        # one (while decodes are pending), bounding the prefill duty
        # cycle so steady prompt arrivals cannot starve decode TPOT.
        ratio = getattr(self.scheduler_config, "decode_priority_steps", 0)
        prompts_allowed = not self.swapped and (
            ratio == 0 or not self.running
            or self._decodes_since_prompt >= ratio)
        if prompts_allowed:
            prompt_outputs = self._schedule_prompt_phase()
            if prompt_outputs is not None:
                self._decodes_since_prompt = 0
                return prompt_outputs
        outputs = self._schedule_decode_phase()
        self._decodes_since_prompt += 1
        return outputs

    def _schedule_prompt_phase(self) -> Optional[SchedulerOutputs]:
        """Batch waiting prompts; None if nothing was scheduled/ignored."""
        blocks_to_nw: Dict[int, List[int]] = {}
        ignored_seq_groups: List[SequenceGroup] = []
        scheduled: List[SequenceGroup] = []
        seq_lens: List[int] = []
        prefill_chunks: Dict[str, Tuple[int, int]] = {}
        chunk_budget = getattr(self.scheduler_config,
                               "chunked_prefill_tokens", 0)
        num_curr_seqs = sum(
            sg.max_parallel_seqs for sg in self.running)
        curr_loras = set(
            sg.lora_int_id for sg in self.running
            if getattr(sg, "lora_request", None)) if \
            self.lora_enabled else None

        # Chunk continuations first: their pages are already allocated,
        # and letting fresh prompts starve them would strand pinned KV.
        still_prefilling: List[SequenceGroup] = []
        while self.prefilling:
            seq_group = self.prefilling[0]
            seq = seq_group.get_seqs(status=SequenceStatus.RUNNING)[0]
            done = getattr(seq_group, "prefill_progress", 0)
            this = min(chunk_budget or seq.num_tokens,
                       seq.num_tokens - done)
            new_seq_lens = seq_lens + [this]
            if (len(new_seq_lens) * max(new_seq_lens)
                    > self.scheduler_config.max_num_batched_tokens):
                break
            limit = getattr(self.scheduler_config,
                            "max_num_prompt_seqs", 0)
            if limit and len(scheduled) >= limit:
                break
            self.prefilling.popleft()
            seq_lens = new_seq_lens
            prefill_chunks[seq_group.request_id] = (done, done + this)
            seq_group.prefill_progress = done + this
            scheduled.append(seq_group)
            if done + this < seq.num_tokens:
                seq_group.prefill_in_progress = True
                still_prefilling.append(seq_group)
            else:
                seq_group.prefill_in_progress = False
                self.running.append(seq_group)

        leftover_waiting: Deque[SequenceGroup] = deque()
        while self.waiting:
            seq_group = self.waiting[0]
            waiting_seqs = seq_group.get_seqs(
                status=SequenceStatus.WAITING)
            assert len(waiting_seqs) == 1, (
                "Waiting sequence group should have only one prompt "
                "sequence.")
            if getattr(waiting_seqs[0], "in_flight", False):
                # Preempted while its decode window is still in flight
                # (pipelined engine step): its token data holds
                # placeholder tokens until the engine reconciles the
                # window — re-admitting it now would prefill garbage.
                # Defer one pass.
                leftover_waiting.appendleft(seq_group)
                self.waiting.popleft()
                continue
            num_prompt_tokens = waiting_seqs[0].num_tokens
            if num_prompt_tokens > self.prompt_limit:
                logger.warning(
                    "Input prompt (%d tokens) is too long and exceeds "
                    "limit of %d", num_prompt_tokens, self.prompt_limit)
                for seq in waiting_seqs:
                    seq.status = SequenceStatus.FINISHED_IGNORED
                ignored_seq_groups.append(seq_group)
                self.waiting.popleft()
                continue

            can_allocate = self.block_manager.can_allocate(seq_group)
            if can_allocate == AllocStatus.LATER:
                break
            if can_allocate == AllocStatus.NEVER:
                logger.warning(
                    "Input prompt (%d tokens) is too long and exceeds "
                    "the capacity of the KV cache", num_prompt_tokens)
                for seq in waiting_seqs:
                    seq.status = SequenceStatus.FINISHED_IGNORED
                ignored_seq_groups.append(seq_group)
                self.waiting.popleft()
                continue

            # Token budget: batches pad to the longest prompt, so the
            # cost of the batch is num_seqs * max_len.  Chunked prefill
            # costs only the first chunk this step.
            eff_len = min(chunk_budget, num_prompt_tokens) \
                if chunk_budget else num_prompt_tokens
            new_seq_lens = seq_lens + [eff_len]
            num_batched_tokens = len(new_seq_lens) * max(new_seq_lens)
            if (num_batched_tokens
                    > self.scheduler_config.max_num_batched_tokens):
                break

            num_new_seqs = seq_group.max_parallel_seqs
            if (num_curr_seqs + num_new_seqs
                    > self.scheduler_config.max_num_seqs):
                break

            # Prompt-batch cap (TPU compile hygiene: each prompt batch
            # bucket is a separate compiled program).
            limit = getattr(self.scheduler_config,
                            "max_num_prompt_seqs", 0)
            if limit and len(scheduled) >= limit:
                break

            if curr_loras is not None:
                lora_id = seq_group.lora_int_id
                if (lora_id > 0 and lora_id not in curr_loras
                        and len(curr_loras) >=
                        self.lora_config.max_loras):
                    # No adapter slot free: defer just this group
                    # (reference scheduler.py:233-241) — breaking
                    # would head-of-line block base-model requests
                    # behind it.
                    leftover_waiting.appendleft(seq_group)
                    self.waiting.popleft()
                    continue
                if lora_id > 0:
                    curr_loras.add(lora_id)

            num_paddings = num_batched_tokens - sum(new_seq_lens)
            if num_paddings > self.scheduler_config.max_paddings:
                break

            seq_lens = new_seq_lens
            self.waiting.popleft()
            self._allocate(seq_group)
            num_curr_seqs += num_new_seqs
            scheduled.append(seq_group)
            seq_group.maybe_set_first_scheduled_time(time.time())
            if eff_len < num_prompt_tokens:
                # First chunk of a chunked prefill: pages for the whole
                # prompt are allocated, but the group keeps prefilling
                # in later prompt phases before it may decode.
                prefill_chunks[seq_group.request_id] = (0, eff_len)
                seq_group.prefill_progress = eff_len
                seq_group.prefill_in_progress = True
                still_prefilling.append(seq_group)
            else:
                seq_group.prefill_in_progress = False
                self.running.append(seq_group)

        self.waiting.extendleft(leftover_waiting)
        self.prefilling.extend(still_prefilling)

        if scheduled or ignored_seq_groups:
            for seq_group in scheduled:
                self._track_nw_blocks(seq_group, blocks_to_nw,
                                      prompt_run=True)
            return SchedulerOutputs(
                scheduled_seq_groups=scheduled,
                prompt_run=True,
                num_batched_tokens=(len(seq_lens) *
                                    max(seq_lens) if seq_lens else 0),
                blocks_to_swap_in={},
                blocks_to_swap_out={},
                blocks_to_copy={},
                blocks_to_nw=blocks_to_nw,
                ignored_seq_groups=ignored_seq_groups,
                prefill_chunks=prefill_chunks,
            )
        return None

    def _schedule_decode_phase(self) -> SchedulerOutputs:
        blocks_to_swap_in: Dict[int, int] = {}
        blocks_to_swap_out: Dict[int, int] = {}
        blocks_to_copy: Dict[int, List[int]] = {}
        blocks_to_nw: Dict[int, List[int]] = {}
        # Same clock as RequestMetrics.arrival_time (llm_engine
        # add_request stamps time.time()): mixing monotonic here made
        # priority values meaningless offsets.
        now = time.time()
        queue = self.policy.sort_by_priority(now, self.running)

        # Walk the queue in priority order; whenever a group cannot grow
        # by one KV slot, evict from the back (lowest priority) until it
        # can — or, with nothing left behind it, evict the group itself.
        survivors: Deque[SequenceGroup] = deque()
        preempted: List[SequenceGroup] = []
        while queue:
            group = queue.popleft()
            while True:
                if self.block_manager.can_append_slot(group):
                    self._append_slot(group, blocks_to_copy)
                    survivors.append(group)
                    break
                victim = queue.pop() if queue else group
                self._preempt(victim, blocks_to_swap_out)
                preempted.append(victim)
                if victim is group:
                    break
        self.running = survivors

        # Swap in previously preempted groups if there is room.
        if not preempted:
            self.swapped = self.policy.sort_by_priority(now, self.swapped)
            num_curr_seqs = sum(
                sg.max_parallel_seqs for sg in self.running)
            curr_loras = set(
                sg.lora_int_id for sg in self.running
                if getattr(sg, "lora_request", None)) if \
                self.lora_enabled else None
            leftover_swapped: Deque[SequenceGroup] = deque()
            while self.swapped:
                seq_group = self.swapped[0]
                if curr_loras is not None:
                    lora_id = seq_group.lora_int_id
                    if (lora_id > 0 and lora_id not in curr_loras
                            and len(curr_loras) >=
                            self.lora_config.max_loras):
                        # Swapping this group in would put more distinct
                        # adapters in the batch than device LoRA slots —
                        # the worker's LRU slot manager would silently
                        # evict one mid-batch (wrong weights).  Defer it
                        # (reference scheduler.py:336-345).
                        leftover_swapped.appendleft(seq_group)
                        self.swapped.popleft()
                        continue
                if not self.block_manager.can_swap_in(seq_group):
                    break
                num_new_seqs = seq_group.max_parallel_seqs
                if (num_curr_seqs + num_new_seqs
                        > self.scheduler_config.max_num_seqs):
                    break
                if curr_loras is not None and seq_group.lora_int_id > 0:
                    curr_loras.add(seq_group.lora_int_id)
                self.swapped.popleft()
                self._swap_in(seq_group, blocks_to_swap_in)
                self._append_slot(seq_group, blocks_to_copy)
                num_curr_seqs += num_new_seqs
                self.running.append(seq_group)
            self.swapped.extendleft(leftover_swapped)

        for seq_group in self.running:
            self._track_nw_blocks(seq_group, blocks_to_nw)

        num_decode_steps = self._plan_decode_window(blocks_to_copy)

        num_batched_tokens = sum(
            seq_group.num_seqs(status=SequenceStatus.RUNNING)
            for seq_group in self.running)

        return SchedulerOutputs(
            scheduled_seq_groups=list(self.running),
            prompt_run=False,
            num_batched_tokens=num_batched_tokens,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            blocks_to_nw=blocks_to_nw,
            ignored_seq_groups=[],
            num_decode_steps=num_decode_steps,
        )

    def _plan_decode_window(self, blocks_to_copy: Dict[int,
                                                       List[int]]) -> int:
        """Size the multi-step decode window for this batch and reserve
        its lookahead KV pages.

        TPU extension (no reference analog): fusing K decode steps into
        one device dispatch amortizes the per-dispatch host<->device
        sync.  The whole batch runs one window length, so any group that
        cannot run multi-step (forked/beam groups, host logits
        processors, penalties — their token histories go stale inside
        the window — LoRA, or prefix caching, whose block-promotion
        bookkeeping assumes the table never runs ahead of the logical
        blocks) degrades the batch to 1.  Stop conditions are checked
        host-side after the window; overshoot tokens are discarded.
        """
        window = self.scheduler_config.num_decode_steps
        if window <= 1 or not self.running:
            return 1
        if getattr(self.block_manager, "enable_caching", False):
            return 1
        if self.block_manager.block_sliding_window is not None:
            return 1
        max_len = self.scheduler_config.max_model_len
        max_remaining = 1
        for seq_group in self.running:
            sp = seq_group.sampling_params
            seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
            if (len(seqs) != 1 or sp.use_beam_search
                    or sp.logits_processors
                    or sp.presence_penalty != 0.0
                    or sp.frequency_penalty != 0.0
                    or sp.repetition_penalty != 1.0
                    or getattr(seq_group, "lora_request", None) is not None):
                return 1
            if self.scheduler_config.spec_decode and (
                    sp.logprobs or sp.prompt_logprobs):
                # Speculative steps return only top-1 logprobs.
                return 1
            seq = seqs[0]
            # KV writes within the window land at positions
            # get_len()-1 .. get_len()+window-2 — all must fit max_len.
            window = min(window, max_len - seq.num_tokens + 1)
            if sp.max_tokens is not None:
                max_remaining = max(
                    max_remaining, sp.max_tokens - seq.output_len)
            else:
                max_remaining = window
        window = min(window, max_remaining)
        if window <= 1:
            return 1
        # Quantize to a power of two: every distinct window length is a
        # separately compiled program on TPU ('D', batch, k), and the
        # max_tokens/max_len clamps above otherwise produce arbitrary k
        # values that compile mid-traffic (observed 5-10 s stalls per
        # first-seen k during serving).  warm_up pre-compiles exactly
        # this ladder {2, 4, ..., num_decode_steps}.
        if window < self.scheduler_config.num_decode_steps:
            window = 1 << (window.bit_length() - 1)
        # ONE batch-wide reservation check BEFORE touching the pool:
        # reserving group-by-group and failing on a late group would
        # strand the earlier groups' pages this step.
        total_seqs = sum(
            len(g.get_seqs(status=SequenceStatus.RUNNING))
            for g in self.running)
        if not self.block_manager.can_reserve_window(total_seqs, window):
            return 1
        for seq_group in self.running:
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
                for src, dst in self.block_manager.append_slots(seq,
                                                                window):
                    blocks_to_copy.setdefault(src, []).append(dst)
        return window

    def schedule(self) -> Tuple[List[SequenceGroupMetadata], SchedulerOutputs]:
        scheduler_outputs = self._schedule()
        return self._build_metadata(scheduler_outputs), scheduler_outputs

    def schedule_splitwise(
        self
    ) -> Tuple[Tuple[List[SequenceGroupMetadata], SchedulerOutputs],
               Tuple[List[SequenceGroupMetadata], SchedulerOutputs]]:
        """One engine step feeding BOTH pools of a disaggregated
        (Splitwise) executor: the decode batch for the decode mesh AND a
        prompt batch for the prefill mesh, scheduled together so the
        executor can dispatch them concurrently (the point of
        disaggregation — the reference steps its pools serially,
        ray_gpu_executor.py:292-293).

        Decode is scheduled FIRST: running sequences get page priority
        (their append/preempt decisions must not be starved by a prompt
        burst), and prompt groups scheduled in this same step have no KV
        yet so they must not join this step's decode batch.  Returns
        ((decode_meta, decode_outputs), (prompt_meta, prompt_outputs));
        either half may be empty."""
        decode_outputs = self._schedule_decode_phase()
        decode_meta = self._build_metadata(decode_outputs)

        prompt_outputs = None
        if not self.swapped:
            # Same gate as _schedule: swapped-out groups must resume
            # before new prompts may claim their pages.
            prompt_outputs = self._schedule_prompt_phase()
        if prompt_outputs is None:
            prompt_outputs = SchedulerOutputs(
                scheduled_seq_groups=[], prompt_run=True,
                num_batched_tokens=0, blocks_to_swap_in={},
                blocks_to_swap_out={}, blocks_to_copy={}, blocks_to_nw={},
                ignored_seq_groups=[])
        prompt_meta = self._build_metadata(prompt_outputs)
        return (decode_meta, decode_outputs), (prompt_meta, prompt_outputs)

    def _build_metadata(
        self, scheduler_outputs: SchedulerOutputs
    ) -> List[SequenceGroupMetadata]:
        now = time.time()

        seq_group_metadata_list: List[SequenceGroupMetadata] = []
        for seq_group in scheduler_outputs.scheduled_seq_groups:
            seq_data: Dict[int, SequenceData] = {}
            block_tables: Dict[int, List[int]] = {}
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
                seq_id = seq.seq_id
                seq_data[seq_id] = seq.data
                block_tables[seq_id] = self.block_manager.get_block_table(seq)
                self.block_manager.access_all_blocks_in_seq(seq, now)

            prefix_len = 0
            prefill_end = None
            chunk = scheduler_outputs.prefill_chunks.get(
                seq_group.request_id) if scheduler_outputs.prompt_run \
                else None
            if chunk is not None:
                # Chunked prefill: compute exactly [start, end).  The
                # chunk start plays the prefix role (earlier positions'
                # KV is already in the cache from prior chunks).
                prefix_len, prefill_end = chunk
            elif scheduler_outputs.prompt_run:
                computed = self.block_manager.get_common_computed_block_ids(
                    seq_group)
                prefix_len = len(computed) * self.cache_config.block_size
                # Never let the "prefix" swallow the whole prompt — at
                # least one token must be computed to produce logits.
                first_seq = seq_group.get_seqs(
                    status=SequenceStatus.RUNNING)[0]
                if prefix_len >= first_seq.num_tokens:
                    prefix_len = (first_seq.num_tokens - 1) // \
                        self.cache_config.block_size * self.cache_config.block_size

            seq_group_metadata_list.append(
                SequenceGroupMetadata(
                    request_id=seq_group.request_id,
                    is_prompt=scheduler_outputs.prompt_run,
                    seq_data=seq_data,
                    sampling_params=seq_group.sampling_params,
                    block_tables=block_tables,
                    prefix_len=prefix_len,
                    lora_request=getattr(seq_group, "lora_request", None),
                    prefill_end=prefill_end,
                ))
        # Blocks scheduled this step will have been written by the end of
        # the step: mark them computed for prefix caching.
        for seq_group in scheduler_outputs.scheduled_seq_groups:
            self.block_manager.mark_blocks_as_computed(seq_group)
        return seq_group_metadata_list

    # ---- sequence lifecycle hooks ----

    def fork_seq(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        self.block_manager.fork(parent_seq, child_seq)
        if self.seq_to_slot_mapper is not None:
            self.seq_to_slot_mapper.set_seq(child_seq.seq_id)

    def free_seq(self, seq: Sequence) -> None:
        self.block_manager.free(seq)
        self._nw_prompt_seqs.discard(seq.seq_id)
        if (self.seq_to_slot_mapper is not None
                and seq.seq_id in self.seq_to_slot_mapper.seq_to_slot):
            self.seq_to_slot_mapper.free_seq(seq.seq_id)

    def free_finished_seq_groups(self) -> None:
        self.running = deque(seq_group for seq_group in self.running
                             if not seq_group.is_finished())

    # ---- internals ----

    def _allocate(self, seq_group: SequenceGroup) -> None:
        self.block_manager.allocate(seq_group)
        for seq in seq_group.get_seqs(status=SequenceStatus.WAITING):
            seq.status = SequenceStatus.RUNNING
            if self.seq_to_slot_mapper is not None:
                self.seq_to_slot_mapper.set_seq(seq.seq_id)

    def _append_slot(
        self,
        seq_group: SequenceGroup,
        blocks_to_copy: Dict[int, List[int]],
    ) -> None:
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            cows = self.block_manager.append_slot(seq)
            if cows is not None:
                src_block, dst_block = cows
                blocks_to_copy.setdefault(src_block, []).append(dst_block)

    def _preempt(
        self,
        seq_group: SequenceGroup,
        blocks_to_swap_out: Dict[int, int],
        preemption_mode: Optional[PreemptionMode] = None,
    ) -> None:
        if preemption_mode is None:
            if seq_group.max_parallel_seqs == 1:
                preemption_mode = PreemptionMode.RECOMPUTE
            else:
                preemption_mode = PreemptionMode.SWAP
        if preemption_mode == PreemptionMode.RECOMPUTE:
            self._preempt_by_recompute(seq_group)
        elif preemption_mode == PreemptionMode.SWAP:
            self._preempt_by_swap(seq_group, blocks_to_swap_out)
        else:
            raise AssertionError("Invalid preemption mode.")

    def _preempt_by_recompute(self, seq_group: SequenceGroup) -> None:
        seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
        assert len(seqs) == 1
        for seq in seqs:
            seq.status = SequenceStatus.WAITING
            self.free_seq(seq)
        # A recomputed prompt re-prefills from scratch (its pages were
        # freed) — any chunk progress is void.
        seq_group.prefill_progress = 0
        seq_group.prefill_in_progress = False
        self.waiting.appendleft(seq_group)

    def _preempt_by_swap(
        self,
        seq_group: SequenceGroup,
        blocks_to_swap_out: Dict[int, int],
    ) -> None:
        if not self.block_manager.can_swap_out(seq_group):
            # There is no way this group can continue now or later.
            raise RuntimeError(
                "Aborted due to the lack of host swap space. Please "
                "increase the swap space to avoid this error.")
        mapping = self.block_manager.swap_out(seq_group)
        blocks_to_swap_out.update(mapping)
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            seq.status = SequenceStatus.SWAPPED
        self.swapped.append(seq_group)
        self.num_swapped_total += 1

    def _swap_in(
        self,
        seq_group: SequenceGroup,
        blocks_to_swap_in: Dict[int, int],
    ) -> None:
        mapping = self.block_manager.swap_in(seq_group)
        blocks_to_swap_in.update(mapping)
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            seq.status = SequenceStatus.RUNNING
