"""The synchronous engine: request lifecycle around the scheduler+executor.

Role-parity with the reference's ``vllm/engine/llm_engine.py`` (LLMEngine
:66, from_engine_args :150, add_request :198, step :571,
_process_model_outputs :536, beam-search bookkeeping :379-535, _check_stop
:755, stats :640): tokenize on intake, schedule a step, execute on the
mesh, detokenize incrementally, run stop checks and beam logic, free KV.
"""
from __future__ import annotations

import time
from typing import Iterable, List, Optional, Tuple, Union

from vllm_splitwise_tpu.config import (CacheConfig, DeviceConfig,
                                       LoRAConfig, ModelConfig,
                                       ParallelConfig, SchedulerConfig)
from vllm_splitwise_tpu.core.scheduler import Scheduler, SchedulerOutputs
from vllm_splitwise_tpu.engine.arg_utils import EngineArgs
from vllm_splitwise_tpu.engine.metrics import StatLogger, Stats
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.outputs import RequestOutput
from vllm_splitwise_tpu.sampling_params import SamplingParams
from vllm_splitwise_tpu.sequence import (Logprob, SamplerOutput, Sequence,
                                         SequenceGroup, SequenceGroupOutput,
                                         SequenceOutput, SequenceStatus)
from vllm_splitwise_tpu.transformers_utils.tokenizer import (
    TokenizerGroup, detokenize_incrementally)
from vllm_splitwise_tpu.utils import Counter

logger = init_logger(__name__)


class LLMEngine:

    def __init__(
        self,
        model_config: ModelConfig,
        cache_config: CacheConfig,
        parallel_config: ParallelConfig,
        scheduler_config: SchedulerConfig,
        device_config: DeviceConfig,
        lora_config: Optional[LoRAConfig],
        speculative_config=None,
        executor_class=None,
        log_stats: bool = True,
    ) -> None:
        logger.info(
            "Initializing a TPU LLM engine with config: model=%r, "
            "dtype=%s, tp=%d, sep_prompt_token=%s, max_model_len=%d, "
            "quantization=%s, seed=%d", model_config.model,
            model_config.dtype, parallel_config.tensor_parallel_size,
            parallel_config.sep_prompt_token, model_config.max_model_len,
            model_config.quantization, model_config.seed)
        self.model_config = model_config
        self.cache_config = cache_config
        self.parallel_config = parallel_config
        self.scheduler_config = scheduler_config
        self.device_config = device_config
        self.lora_config = lora_config
        self.speculative_config = speculative_config
        self.log_stats = log_stats

        from vllm_splitwise_tpu.utils import enable_compilation_cache
        enable_compilation_cache()

        self.seq_counter = Counter()
        self._last_spec_emitted = 0
        self._last_compile_stats = (0, 0.0)
        # In-flight mixed dispatch (--pipeline-decode); see
        # _step_mixed_pipelined.
        self._pipeline = None
        self._init_tokenizer()

        self.executor = executor_class(
            model_config=model_config,
            cache_config=cache_config,
            parallel_config=parallel_config,
            scheduler_config=scheduler_config,
            device_config=device_config,
            lora_config=lora_config,
            speculative_config=speculative_config,
        )

        self.scheduler = Scheduler(
            scheduler_config, cache_config, lora_config,
            track_prompt_blocks=parallel_config.sep_prompt_token,
            enable_caching=getattr(cache_config, "enable_prefix_caching",
                                   False))

        self.stat_logger = StatLogger(
            labels=dict(model_name=model_config.model)) if log_stats else None

    @classmethod
    def from_engine_args(cls, engine_args: EngineArgs,
                         log_stats: Optional[bool] = None) -> "LLMEngine":
        configs = engine_args.create_engine_configs()
        parallel_config = configs[2]
        if parallel_config.sep_prompt_token:
            import jax
            if jax.process_count() > 1:
                # Multi-host disaggregation: this (decode) process runs
                # the engine; prefill hosts run PrefillHostServer.
                from vllm_splitwise_tpu.executor.multihost_splitwise import \
                    MultihostSplitwiseExecutor
                executor_class = MultihostSplitwiseExecutor
            else:
                from vllm_splitwise_tpu.executor.splitwise_executor import \
                    SplitwiseExecutor
                executor_class = SplitwiseExecutor
        else:
            from vllm_splitwise_tpu.executor.tpu_executor import TPUExecutor
            executor_class = TPUExecutor
        return cls(*configs, executor_class=executor_class,
                   log_stats=(not engine_args.disable_log_stats
                              if log_stats is None else log_stats))

    def _init_tokenizer(self, **kwargs) -> None:
        init_kwargs = dict(
            enable_lora=bool(self.lora_config),
            max_num_seqs=self.scheduler_config.max_num_seqs,
            tokenizer_mode=self.model_config.tokenizer_mode,
            trust_remote_code=self.model_config.trust_remote_code,
            tokenizer_revision=self.model_config.tokenizer_revision)
        init_kwargs.update(kwargs)
        self.tokenizer = TokenizerGroup(self.model_config.tokenizer,
                                        **init_kwargs)

    # ---- request intake ----

    def encode_request(self, request_id: str, prompt: Optional[str],
                       prompt_token_ids: Optional[List[int]] = None,
                       lora_request=None) -> List[int]:
        if prompt_token_ids is None:
            assert prompt is not None
            prompt_token_ids = self.tokenizer.encode(
                prompt, request_id=request_id, lora_request=lora_request)
        return prompt_token_ids

    def add_request(
        self,
        request_id: str,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        prompt_token_ids: Optional[List[int]] = None,
        arrival_time: Optional[float] = None,
        lora_request=None,
    ) -> None:
        if arrival_time is None:
            arrival_time = time.time()
        max_logprobs = self.model_config.max_logprobs
        if (sampling_params.logprobs
                and sampling_params.logprobs > max_logprobs) or (
                    sampling_params.prompt_logprobs
                    and sampling_params.prompt_logprobs > max_logprobs):
            raise ValueError(f"Cannot request more than "
                             f"{max_logprobs} logprobs.")
        prompt_token_ids = self.encode_request(request_id, prompt,
                                               prompt_token_ids,
                                               lora_request)
        block_size = self.cache_config.block_size
        seq_id = next(self.seq_counter)
        eos_token_id = self.tokenizer.get_lora_tokenizer(
            lora_request).eos_token_id
        seq = Sequence(seq_id, prompt or "", prompt_token_ids, block_size,
                       eos_token_id)
        seq_group = SequenceGroup(request_id, [seq], sampling_params,
                                  arrival_time, lora_request=lora_request)
        self.scheduler.add_seq_group(seq_group)

    def abort_request(self, request_id: Union[str, Iterable[str]]) -> None:
        self.scheduler.abort_seq_group(request_id)

    def get_model_config(self) -> ModelConfig:
        return self.model_config

    def get_num_unfinished_requests(self) -> int:
        return self.scheduler.get_num_unfinished_seq_groups()

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_seqs()

    # ---- the step ----

    def step(self) -> List[RequestOutput]:
        if getattr(self.executor, "execute_dual_deferred", None) \
                is not None:
            return self._step_mixed_pipelined()
        if getattr(self.executor, "execute_dual", None) is not None:
            return self._step_splitwise()
        (seq_group_metadata_list,
         scheduler_outputs) = self.scheduler.schedule()

        if not scheduler_outputs.is_empty():
            output = self.executor.execute_model(
                seq_group_metadata_list,
                scheduler_outputs.blocks_to_swap_in,
                scheduler_outputs.blocks_to_swap_out,
                scheduler_outputs.blocks_to_copy,
                scheduler_outputs.blocks_to_nw,
                num_decode_steps=scheduler_outputs.num_decode_steps,
            )
            self._record_migration_times(scheduler_outputs)
        else:
            output = []

        if scheduler_outputs.num_decode_steps > 1:
            return self._process_multi_step_outputs(output,
                                                    scheduler_outputs)
        return self._process_model_outputs(output, scheduler_outputs)

    def _step_mixed_pipelined(self) -> List[RequestOutput]:
        """Pipelined mixed step (--pipeline-decode): keep ONE mixed
        dispatch (decode window + prompt chunk) in flight across engine
        steps.  Each call (a) schedules against placeholder-advanced
        state, (b) dispatches the new window CHAINED on the previous
        window's device-side token carry (model_runner._window_carry) —
        no host round trip between windows — then (c) fetches and
        processes the PREVIOUS dispatch.  Device compute therefore
        overlaps transport + detokenize + scheduling entirely; TPOT
        approaches pure device window time.

        When the step is not chainable (composition changed: a prompt
        finished prefill and joined decode, a sequence finished or was
        preempted, window ineligibility), the pipeline drains first and
        the step runs synchronously — correctness never depends on the
        optimistic schedule being right, because a drained window's
        overshoot tokens are discarded exactly like in-window overshoot.
        """
        ((decode_meta, decode_sched),
         (prompt_meta, prompt_sched)) = self.scheduler.schedule_splitwise()

        window = decode_sched.num_decode_steps > 1 and bool(decode_meta)
        chainable = (self._pipeline is not None and window
                     and self.executor.window_chainable(decode_meta))

        if self._pipeline is not None and not chainable:
            # Drain first.  Processing may have finished some scheduled
            # groups (their in-flight overshoot resolved a stop): drop
            # them from the dispatch — their pages free at this step's
            # end, after the dispatch order guarantees no reuse hazard.
            results = self._finish_pipeline()
            # Drop (a) groups that finished during reconciliation and
            # (b) groups whose sequence set changed under the schedule —
            # a beam/n>1 prompt processed in the deferred reconciliation
            # forks children AFTER this step's metadata snapshotted a
            # single parent seq; dispatching that stale row would decode
            # only the parent.  Dropped groups lose one step and
            # reschedule correctly next pass.
            keep = [(md, g) for md, g in zip(
                decode_meta, decode_sched.scheduled_seq_groups)
                if not g.is_finished() and set(md.seq_data) == {
                    s.seq_id
                    for s in g.get_seqs(status=SequenceStatus.RUNNING)}]
            decode_meta = [md for md, _ in keep]
            decode_sched.scheduled_seq_groups = [g for _, g in keep]
            window = decode_sched.num_decode_steps > 1 and \
                bool(decode_meta)
            if window:
                # Re-enter the pipeline immediately (deferred dispatch;
                # the runner uses host tokens — state is fully
                # reconciled): a join step costs no synchronous round
                # trip.
                return results + self._dispatch_pipelined(
                    decode_meta, decode_sched, prompt_meta, prompt_sched)
            if decode_meta or prompt_meta or \
                    prompt_sched.ignored_seq_groups or \
                    not decode_sched.is_empty():
                prompt_out, decode_out = self.executor.execute_dual(
                    prompt_meta, prompt_sched.blocks_to_nw,
                    decode_meta, decode_sched.blocks_to_swap_in,
                    decode_sched.blocks_to_swap_out,
                    decode_sched.blocks_to_copy,
                    decode_sched.blocks_to_nw,
                    num_decode_steps=decode_sched.num_decode_steps)
                results += self._finish_splitwise_step(
                    decode_sched, decode_out, prompt_sched, prompt_out)
            return results

        if not window and self._pipeline is None:
            # No window to pipeline (cold start, prompt-only, degraded
            # batch): plain synchronous mixed step.
            if decode_sched.is_empty() and prompt_sched.is_empty() \
                    and not prompt_sched.ignored_seq_groups:
                return self._process_model_outputs([], decode_sched)
            prompt_out, decode_out = self.executor.execute_dual(
                prompt_meta, prompt_sched.blocks_to_nw,
                decode_meta, decode_sched.blocks_to_swap_in,
                decode_sched.blocks_to_swap_out,
                decode_sched.blocks_to_copy, decode_sched.blocks_to_nw,
                num_decode_steps=decode_sched.num_decode_steps)
            return self._finish_splitwise_step(decode_sched, decode_out,
                                               prompt_sched, prompt_out)

        # Dispatch the new mixed step deferred (chained when a window is
        # in flight), THEN reconcile the previous one.
        results = self._dispatch_pipelined(decode_meta, decode_sched,
                                           prompt_meta, prompt_sched)
        return results

    def _dispatch_pipelined(self, decode_meta, decode_sched, prompt_meta,
                            prompt_sched) -> List[RequestOutput]:
        """Dispatch a mixed step deferred, reconcile any previous
        in-flight dispatch, and install the new one as the pipeline.
        Returns the PREVIOUS dispatch's outputs."""
        prompt_thunk, decode_thunk = self.executor.execute_dual_deferred(
            prompt_meta, decode_meta, decode_sched.blocks_to_swap_in,
            decode_sched.blocks_to_swap_out, decode_sched.blocks_to_copy,
            num_decode_steps=decode_sched.num_decode_steps)
        results = self._finish_pipeline() if self._pipeline is not None \
            else []
        # Placeholders for the just-dispatched window: the next schedule
        # must see these rows advanced by k.  Sequences that finished
        # during reconciliation get none — their window rows are dead
        # (outputs discarded at that window's processing).
        k = decode_sched.num_decode_steps
        ph = []
        for group in decode_sched.scheduled_seq_groups:
            if group.is_finished():
                continue
            for seq in group.get_seqs(status=SequenceStatus.RUNNING):
                for _ in range(k):
                    seq.append_token(0, {0: Logprob(0.0)})
                # Mark in flight: a preemption-by-recompute of this seq
                # must not let the prompt phase re-admit it while its
                # data still holds placeholder tokens (scheduler defers
                # such groups one pass).
                seq.in_flight = True
                ph.append((seq, k))
        self._pipeline = {
            "decode_thunk": decode_thunk,
            "decode_sched": decode_sched,
            "prompt_thunk": prompt_thunk,
            "prompt_sched": prompt_sched,
            "placeholders": ph,
            # Chunk state AT DISPATCH: by reconciliation time the next
            # schedule may have flipped prefill_in_progress (final chunk
            # scheduled), so the live flag cannot drive output handling.
            "prompt_mid": [
                bool(getattr(g, "prefill_in_progress", False))
                for g in prompt_sched.scheduled_seq_groups
            ],
        }
        return results

    def _finish_pipeline(self) -> List[RequestOutput]:
        """Fetch + process the in-flight mixed dispatch: pop the
        placeholder tokens (restoring pre-window state), then run the
        normal multi-step processing (which re-appends the real tokens,
        runs stop checks, streams outputs)."""
        pipe = self._pipeline
        self._pipeline = None
        for seq, k in pipe["placeholders"]:
            seq.pop_tokens(k)
            seq.in_flight = False
        results: List[RequestOutput] = []
        decode_sched = pipe["decode_sched"]
        decode_out = pipe["decode_thunk"]() \
            if pipe["decode_thunk"] is not None else []
        # Groups that finished in a PREVIOUS reconciliation (they were
        # scheduled into this window before their finish was known):
        # their rows are dead overshoot AND they must not be re-emitted
        # as finished RequestOutputs — a second finished emission would
        # make generate() return more outputs than requests.
        groups = decode_sched.scheduled_seq_groups
        alive = [i for i, g in enumerate(groups) if not g.is_finished()]
        if len(alive) != len(groups):
            decode_sched.scheduled_seq_groups = [groups[i] for i in alive]
            decode_out = [[row[i] for i in alive] for row in decode_out]
        if not decode_sched.is_empty():
            if decode_sched.num_decode_steps > 1:
                results += self._process_multi_step_outputs(
                    decode_out, decode_sched)
            else:
                results += self._process_model_outputs(
                    decode_out or [], decode_sched)
        prompt_sched = pipe["prompt_sched"]
        if not prompt_sched.is_empty() or prompt_sched.ignored_seq_groups:
            prompt_out = pipe["prompt_thunk"]() \
                if pipe["prompt_thunk"] is not None else []
            results += self._process_deferred_prompt(
                prompt_out or [], prompt_sched, pipe["prompt_mid"])
        return results

    def _process_deferred_prompt(self, prompt_out, prompt_sched,
                                 mid_flags) -> List[RequestOutput]:
        """_process_model_outputs for a prompt half whose outputs were
        deferred one engine step: mid-chunk handling keys on the
        DISPATCH-time snapshot (the live prefill_in_progress flag may
        already reflect the NEXT chunk's scheduling)."""
        groups = prompt_sched.scheduled_seq_groups
        for seq_group, outputs, was_mid in zip(groups, prompt_out,
                                               mid_flags):
            if was_mid:
                continue
            self._process_sequence_group_outputs(seq_group, outputs)
        self.scheduler.free_finished_seq_groups()

        request_outputs: List[RequestOutput] = []
        now = time.time()
        for seq_group, was_mid in zip(groups, mid_flags):
            if was_mid:
                continue
            seq_group.maybe_set_first_token_time(now)
            request_outputs.append(RequestOutput.from_seq_group(seq_group))
        for seq_group in prompt_sched.ignored_seq_groups:
            request_outputs.append(RequestOutput.from_seq_group(seq_group))
        for seq_group in groups + prompt_sched.ignored_seq_groups:
            if seq_group.is_finished():
                seq_group.set_finished_time(now)
        if self.log_stats and self.stat_logger is not None:
            self.stat_logger.log(self._get_stats(prompt_sched))
        return request_outputs

    def _step_splitwise(self) -> List[RequestOutput]:
        """One engine step driving BOTH pools of a disaggregated
        executor: the decode batch and a prompt batch are scheduled
        together and dispatched concurrently on the two meshes, so the
        decode pool no longer idles through every prefill burst (the
        serial-pools limitation the reference documents at
        ray_gpu_executor.py:292-293)."""
        ((decode_meta, decode_sched),
         (prompt_meta, prompt_sched)) = self.scheduler.schedule_splitwise()

        if decode_sched.is_empty() and prompt_sched.is_empty() \
                and not prompt_sched.ignored_seq_groups:
            return self._process_model_outputs([], decode_sched)

        prompt_output, decode_output = self.executor.execute_dual(
            prompt_meta, prompt_sched.blocks_to_nw,
            decode_meta, decode_sched.blocks_to_swap_in,
            decode_sched.blocks_to_swap_out, decode_sched.blocks_to_copy,
            decode_sched.blocks_to_nw,
            num_decode_steps=decode_sched.num_decode_steps)
        return self._finish_splitwise_step(decode_sched, decode_output,
                                           prompt_sched, prompt_output)

    def _finish_splitwise_step(self, decode_sched, decode_output,
                               prompt_sched,
                               prompt_output) -> List[RequestOutput]:
        self._record_migration_times(prompt_sched)
        results: List[RequestOutput] = []
        if not decode_sched.is_empty():
            if decode_sched.num_decode_steps > 1:
                results += self._process_multi_step_outputs(
                    decode_output, decode_sched)
            else:
                results += self._process_model_outputs(
                    decode_output or [], decode_sched)
        if not prompt_sched.is_empty() or prompt_sched.ignored_seq_groups:
            results += self._process_model_outputs(
                prompt_output or [], prompt_sched)
        return results

    def _record_migration_times(self, scheduler_outputs) -> None:
        """Splitwise request-lifetime instrumentation (the reference
        tracks Migration{Begin,End} in its benchmark harness,
        benchmarks/benchmark_utils.py:10-75; we stamp it on the request
        metrics directly)."""
        if not (self.parallel_config.sep_prompt_token
                and scheduler_outputs.prompt_run
                and scheduler_outputs.blocks_to_nw):
            return
        km = getattr(self.executor, "kv_migration", None)
        if km is None:
            return
        now = time.time()
        for sg in scheduler_outputs.scheduled_seq_groups:
            sg.metrics.migration_begin_time = \
                now - km.last_migration_seconds
            sg.metrics.migration_end_time = now

    def _process_model_outputs(
            self, output: SamplerOutput,
            scheduler_outputs: SchedulerOutputs) -> List[RequestOutput]:
        scheduled_seq_groups = scheduler_outputs.scheduled_seq_groups
        for seq_group, outputs in zip(scheduled_seq_groups, output):
            if getattr(seq_group, "prefill_in_progress", False):
                # Non-final chunk of a chunked prefill: the sampled
                # "token" came from a mid-prompt position — discard.
                continue
            self._process_sequence_group_outputs(seq_group, outputs)
        return self._finalize_step(scheduler_outputs)

    def _process_multi_step_outputs(
            self, step_outputs: List[SamplerOutput],
            scheduler_outputs: SchedulerOutputs) -> List[RequestOutput]:
        """Process a fused K-step decode window: the device ran K steps
        and returned one SamplerOutput per step.  Tokens are appended and
        stop-checked in order; once a sequence finishes, its remaining
        window tokens are overshoot and are discarded (the KV written for
        them lives in pages the sequence still owns, freed with it)."""
        scheduled_seq_groups = scheduler_outputs.scheduled_seq_groups
        for step_output in step_outputs:
            for seq_group, outputs in zip(scheduled_seq_groups,
                                          step_output):
                if seq_group.is_finished():
                    continue
                if any(s.status in (SequenceStatus.WAITING,
                                    SequenceStatus.SWAPPED)
                       for s in seq_group.get_seqs()):
                    # Preempted while this window was in flight
                    # (pipelined step): its KV pages are gone and the
                    # sequence will recompute — discard the window's
                    # tokens wholesale (stateless per-(seed, step)
                    # sampling regenerates them identically).
                    continue
                # Speculative decoding marks rejected window positions
                # with token -1: the sequence emitted fewer than k+1
                # tokens this step.
                if (outputs.samples
                        and outputs.samples[0].output_token < 0):
                    continue
                self._process_sequence_group_outputs(seq_group, outputs)
        return self._finalize_step(scheduler_outputs)

    def _finalize_step(
            self,
            scheduler_outputs: SchedulerOutputs) -> List[RequestOutput]:
        scheduled_seq_groups = scheduler_outputs.scheduled_seq_groups
        self.scheduler.free_finished_seq_groups()

        request_outputs: List[RequestOutput] = []
        now = time.time()
        for seq_group in scheduled_seq_groups:
            if getattr(seq_group, "prefill_in_progress", False):
                # Mid-prefill (chunked): no token was produced — don't
                # stamp TTFT or emit an output this step.
                continue
            seq_group.maybe_set_first_token_time(now)
            request_outputs.append(RequestOutput.from_seq_group(seq_group))
        for seq_group in scheduler_outputs.ignored_seq_groups:
            request_outputs.append(RequestOutput.from_seq_group(seq_group))
        for seq_group in scheduled_seq_groups + \
                scheduler_outputs.ignored_seq_groups:
            if seq_group.is_finished():
                seq_group.set_finished_time(now)

        if self.log_stats and self.stat_logger is not None:
            self.stat_logger.log(self._get_stats(scheduler_outputs))
        return request_outputs

    # ---- per-group output processing (incl. beam search) ----

    def _process_sequence_group_outputs(
            self, seq_group: SequenceGroup,
            outputs: SequenceGroupOutput) -> None:
        if outputs.prompt_logprobs is not None:
            seq_group.prompt_logprobs = outputs.prompt_logprobs

        # Beams that finished on PRIOR steps, snapshotted before this
        # step's stop checks flip any of today's candidates to finished.
        prior_finished = seq_group.finished_seqs()

        pairs = self._grow_candidates(seq_group, outputs.samples)
        for seq, _ in pairs:
            self._decode_sequence(seq, seq_group.sampling_params)
            self._check_stop(seq, seq_group.sampling_params)

        if seq_group.sampling_params.use_beam_search:
            self._select_beams(seq_group, pairs, prior_finished)
        else:
            self._commit_survivors(seq_group, pairs)

    def _grow_candidates(
            self, seq_group: SequenceGroup,
            samples: List[SequenceOutput]) -> List[Tuple[Sequence,
                                                         Sequence]]:
        """Append this step's samples: one sample continues each parent
        in place; extra samples (beam widening / n>1 prompt fan-out) fork
        children.  Returns (candidate, parent) pairs; a parent the
        sampler dropped entirely is freed here."""
        by_parent = {
            p.seq_id: (p, [])
            for p in seq_group.get_seqs(status=SequenceStatus.RUNNING)
        }
        for sample in samples:
            by_parent[sample.parent_seq_id][1].append(sample)

        pairs: List[Tuple[Sequence, Sequence]] = []
        for parent, taken in by_parent.values():
            if not taken:
                # Beam narrowed past this parent: retire it now.
                parent.status = SequenceStatus.FINISHED_ABORTED
                seq_group.remove(parent.seq_id)
                self.scheduler.free_seq(parent)
                continue
            # All but the final sample need their own sequence.
            for extra in taken[:-1]:
                child = parent.fork(next(self.seq_counter))
                child.append_token(extra.output_token, extra.logprobs)
                pairs.append((child, parent))
            parent.append_token(taken[-1].output_token, taken[-1].logprobs)
            pairs.append((parent, parent))
        return pairs

    def _commit_survivors(self, seq_group: SequenceGroup,
                          pairs: List[Tuple[Sequence, Sequence]]) -> None:
        """Make surviving candidates durable: register forked children
        with the group and the block manager, then release finished
        parents.  Two phases on purpose — a child's block-table fork must
        happen before its (possibly finished) parent's pages are freed.

        A child that finished on its very first token gets NO block-table
        fork: it will never be scheduled, so nothing would ever free the
        fork (unguarded, this leaks KV pages until the scheduler
        livelocks on a permanently-short pool)."""
        for seq, parent in pairs:
            if seq is not parent:
                seq_group.add(seq)
                if not seq.is_finished():
                    self.scheduler.fork_seq(parent, seq)
        for seq, parent in pairs:
            if seq is parent and seq.is_finished():
                self.scheduler.free_seq(seq)

    def _drop_candidate(self, seq_group: SequenceGroup, seq: Sequence,
                        parent: Sequence) -> None:
        """Discard a losing candidate.  Forked children were never
        registered anywhere, so only in-place parents need teardown."""
        if seq is parent:
            seq.status = SequenceStatus.FINISHED_ABORTED
            seq_group.remove(seq.seq_id)
            self.scheduler.free_seq(seq)

    def _select_beams(self, seq_group: SequenceGroup,
                      pairs: List[Tuple[Sequence, Sequence]],
                      prior_finished: List[Sequence]) -> None:
        """Beam-search survivor selection (role of the reference's
        llm_engine.py:379-535 block).

        The finished pool (prior finished beams + newly finished
        candidates) keeps its best ``beam_width``; running candidates
        continue only while the search can still improve on the worst
        kept finished beam."""
        params = seq_group.sampling_params
        width = params.best_of
        penalty = params.length_penalty

        def score(seq: Sequence, **kw) -> float:
            return seq.beam_score(length_penalty=penalty,
                                  eos_token_id=seq.eos_token_id, **kw)

        # parent=None marks beams finished on an earlier step.
        finished = [(seq, None) for seq in prior_finished]
        finished += [(seq, parent) for seq, parent in pairs
                     if seq.is_finished()]
        finished.sort(key=lambda sp: score(sp[0]), reverse=True)

        keep: List[Tuple[Sequence, Sequence]] = []
        losers: List[Tuple[Sequence, Sequence]] = []
        for rank, (seq, parent) in enumerate(finished):
            if parent is not None:  # new this step
                (keep if rank < width else losers).append((seq, parent))
            elif rank >= width:
                # An old beam fell out of the top-k: forget it.
                seq_group.remove(seq.seq_id)

        running = sorted(
            ((seq, parent) for seq, parent in pairs
             if not seq.is_finished()),
            key=lambda sp: sp[0].beam_score(length_penalty=penalty),
            reverse=True)

        if running and (len(finished) < width or self._beam_can_improve(
                params, running[0][0], finished[width - 1][0])):
            keep += running[:width]
            losers += running[width:]
        else:
            losers += running

        # Commit before dropping: a kept child's block-table fork must
        # land before its (possibly losing) parent frees any pages.
        self._commit_survivors(seq_group, keep)
        for seq, parent in losers:
            self._drop_candidate(seq_group, seq, parent)

    def _beam_can_improve(self, params: SamplingParams,
                          best_running: Sequence,
                          worst_kept: Sequence) -> bool:
        """Could ``best_running``, decoded further, ever outscore the
        worst finished beam we are keeping?  Mirrors HF GenerationMixin's
        early-stopping modes: True = stop at width, False = compare at
        current length, "never" = compare at the max attainable length."""
        assert params.use_beam_search
        if params.early_stopping is True:
            return False
        penalty = params.length_penalty
        floor = worst_kept.beam_score(length_penalty=penalty,
                                      eos_token_id=worst_kept.eos_token_id)
        if params.early_stopping == "never" and penalty > 0.0:
            # Longer sequences only help when penalty > 0: score at the
            # longest length this request could ever reach.
            horizon = max(best_running.prompt_len + (params.max_tokens or 0),
                          self.scheduler_config.max_model_len)
            ceiling = best_running.beam_score(
                length_penalty=penalty,
                eos_token_id=best_running.eos_token_id,
                seq_len=horizon)
        else:
            ceiling = best_running.beam_score(
                length_penalty=penalty,
                eos_token_id=best_running.eos_token_id)
        return ceiling > floor

    # ---- detokenization + stop checks ----

    def _decode_sequence(self, seq: Sequence,
                         prms: SamplingParams) -> None:
        (new_tokens, new_output_text, prefix_offset,
         read_offset) = detokenize_incrementally(
             self.tokenizer.get_lora_tokenizer(None),
             all_input_ids=seq.token_ids,
             prev_tokens=seq.tokens,
             prefix_offset=seq.prefix_offset,
             read_offset=seq.read_offset,
             skip_special_tokens=prms.skip_special_tokens,
             spaces_between_special_tokens=prms.
             spaces_between_special_tokens,
         )
        if seq.tokens is None:
            seq.tokens = new_tokens
        else:
            seq.tokens.extend(new_tokens)
        seq.prefix_offset = prefix_offset
        seq.read_offset = read_offset
        seq.output_text += new_output_text

    def _check_stop(self, seq: Sequence,
                    sampling_params: SamplingParams) -> None:
        for stop_str in sampling_params.stop:
            if seq.output_text.endswith(stop_str):
                self._finalize_sequence(seq, sampling_params, stop_str)
                seq.status = SequenceStatus.FINISHED_STOPPED
                return
        if seq.last_token in sampling_params.stop_token_ids:
            stop_str = self.tokenizer.get_lora_tokenizer(
                None).convert_ids_to_tokens(seq.last_token)
            self._finalize_sequence(seq, sampling_params, stop_str)
            seq.status = SequenceStatus.FINISHED_STOPPED
            return
        if ((not sampling_params.ignore_eos)
                and seq.eos_token_id is not None
                and seq.last_token == seq.eos_token_id):
            seq.status = SequenceStatus.FINISHED_STOPPED
            return
        if seq.num_tokens > self.scheduler_config.max_model_len:
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return
        if (sampling_params.max_tokens is not None
                and seq.output_len == sampling_params.max_tokens):
            seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
            return

    def _finalize_sequence(self, seq: Sequence,
                           sampling_params: SamplingParams,
                           stop_string: str) -> None:
        if (stop_string
                and not sampling_params.include_stop_str_in_output
                and seq.output_text.endswith(stop_string)):
            seq.output_text = seq.output_text[:-len(stop_string)]

    # ---- stats ----

    def _get_stats(self, scheduler_outputs: SchedulerOutputs) -> Stats:
        now = time.monotonic()
        num_total_blocks = self.cache_config.num_device_blocks or 1
        num_free = self.scheduler.block_manager.get_num_free_gpu_blocks()
        kv_cache_usage = 1.0 - num_free / num_total_blocks

        num_prompt_tokens = 0
        num_generation_tokens = 0
        time_to_first_tokens: List[float] = []
        time_per_output_tokens: List[float] = []
        time_e2e_requests: List[float] = []
        time_kv_migrations: List[float] = []
        spec_acceptance = spec_tps = None
        runner = getattr(getattr(self.executor, "worker", None),
                         "model_runner", None)
        spec_stats = getattr(runner, "spec_stats", None)
        if spec_stats is not None and spec_stats.num_steps:
            spec_acceptance = spec_stats.acceptance_rate
            spec_tps = spec_stats.mean_tokens_per_step

        if scheduler_outputs is not None:
            prompt_run = scheduler_outputs.prompt_run
            if prompt_run:
                num_prompt_tokens = scheduler_outputs.num_batched_tokens
            elif (self.speculative_config is not None
                  and spec_stats is not None
                  and scheduler_outputs.num_decode_steps > 1):
                # Speculative steps emit a VARIABLE 1..k+1 tokens per
                # sequence: count actual emissions.  (Window-ineligible
                # batches degrade to plain decode and take the branch
                # below — num_decode_steps is 1 for those.)
                num_generation_tokens = (spec_stats.num_emitted -
                                         self._last_spec_emitted)
                self._last_spec_emitted = spec_stats.num_emitted
            else:
                # A fused K-step window emits K tokens per sequence.
                num_generation_tokens = (
                    scheduler_outputs.num_batched_tokens *
                    scheduler_outputs.num_decode_steps)
            wall = time.time()
            for seq_group in scheduler_outputs.scheduled_seq_groups:
                if getattr(seq_group, "prefill_in_progress", False):
                    continue  # mid-chunk: no token emitted this step
                latency = seq_group.get_last_latency(wall)
                if prompt_run:
                    time_to_first_tokens.append(latency)
                else:
                    time_per_output_tokens.append(latency)
                if seq_group.is_finished():
                    time_e2e_requests.append(
                        wall - seq_group.metrics.arrival_time)
                mb = getattr(seq_group.metrics, "migration_begin_time", None)
                me = getattr(seq_group.metrics, "migration_end_time", None)
                if prompt_run and mb is not None and me is not None:
                    time_kv_migrations.append(me - mb)

        # Mid-traffic compile stalls (delta since last snapshot), summed
        # over every worker's model runner this executor drives.
        stalls, stall_s = 0, 0.0
        for attr in ("worker", "prefill_worker", "decode_worker"):
            w = getattr(self.executor, attr, None)
            ds = getattr(getattr(w, "model_runner", None),
                         "dispatch_stats", None)
            if ds is not None:
                stalls += ds.get("compile_stalls", 0)
                stall_s += ds.get("compile_stall_s", 0.0)
        # Remote prefill host (multihost splitwise): its runner's
        # cumulative counters ride back on every prefill reply.
        rds = getattr(self.executor, "remote_dispatch_stats", None)
        if rds:
            stalls += rds.get("compile_stalls", 0)
            stall_s += rds.get("compile_stall_s", 0.0)
        d_stalls = stalls - self._last_compile_stats[0]
        d_stall_s = stall_s - self._last_compile_stats[1]
        self._last_compile_stats = (stalls, stall_s)

        chained = unchained = 0
        w = getattr(self.executor, "worker", None)
        ds = getattr(getattr(w, "model_runner", None), "dispatch_stats",
                     None)
        if ds is not None:
            chained = ds.get("chained_windows", 0)
            unchained = ds.get("unchained_windows", 0)

        return Stats(
            now=now,
            num_running=len(self.scheduler.running),
            num_waiting=len(self.scheduler.waiting),
            num_swapped=len(self.scheduler.swapped),
            kv_cache_usage=kv_cache_usage,
            num_prompt_tokens=num_prompt_tokens,
            num_generation_tokens=num_generation_tokens,
            time_to_first_tokens=time_to_first_tokens,
            time_per_output_tokens=time_per_output_tokens,
            time_e2e_requests=time_e2e_requests,
            time_kv_migrations=time_kv_migrations,
            spec_acceptance_rate=spec_acceptance,
            spec_tokens_per_step=spec_tps,
            compile_stalls=d_stalls,
            compile_stall_seconds=d_stall_s,
            chained_windows=chained,
            unchained_windows=unchained,
        )

    def check_health(self) -> None:
        self.executor.check_health()
