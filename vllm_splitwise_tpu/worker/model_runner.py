"""Host-side batch assembly + jitted device steps.

Role-parity with the reference's ``vllm/worker/model_runner.py``
(_prepare_prompt:126, _prepare_decode:274, _prepare_sample:401,
CUDAGraphRunner:794), re-designed for XLA: instead of capturing CUDA
graphs per decode batch size, every step runs through ``jax.jit`` with
**bucket-padded static shapes** — same effect (no per-step dispatch
overhead after warmup), no capture machinery.  Prefill and decode compile
as separate programs; the bucket ladders below play the role of the
reference's ``_BATCH_SIZES_TO_CAPTURE``.

Everything that crosses the host->device boundary per step is int32
metadata (token ids, positions, slot mappings, block tables, sampling
tensors); sampled token ids — not logits — cross back.
"""
from __future__ import annotations

import collections
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_splitwise_tpu.config import (CacheConfig, ModelConfig,
                                       ParallelConfig, SchedulerConfig)
from vllm_splitwise_tpu.layers.sampler import (SamplerOutputArrays,
                                               SamplingTensors, sample)
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.models.input_metadata import (DecodeMetadata,
                                                      PrefillMetadata)
from vllm_splitwise_tpu.models.loader import get_model
from vllm_splitwise_tpu.sampling_params import SamplingParams, SamplingType
from vllm_splitwise_tpu.sequence import (Logprob, SamplerOutput,
                                         SequenceGroupMetadata,
                                         SequenceGroupOutput, SequenceOutput)
from vllm_splitwise_tpu.utils import cdiv

logger = init_logger(__name__)

_SEED_MIX = 0x9E3779B97F4A7C15
_U64 = (1 << 64) - 1


def _bucket(n: int, ladder: List[int]) -> int:
    for b in ladder:
        if n <= b:
            return b
    return ladder[-1]


def _extend_ladder(ladder: List[int], cover: int) -> List[int]:
    """Grow a bucket ladder by doubling until it covers ``cover``.
    _bucket CLAMPS to ladder[-1]; an undersized ladder would silently
    truncate batches/prompts and shape-mismatch downstream, so every
    ladder is extended to the configured maximum at init."""
    ladder = list(ladder)
    while ladder[-1] < cover:
        ladder.append(ladder[-1] * 2)
    return ladder


def _pack_sampler_output(out: SamplerOutputArrays) -> "jax.Array":
    """Flatten the four sampler arrays into one [..., 2+2L] f32 buffer on
    device.  Each host-visible jax array costs one transport round trip
    (~30 ms over the axon tunnel); packing makes every step exactly ONE
    fetch.  Token ids are exact in f32 (vocab < 2^24)."""
    return jnp.concatenate([
        out.sampled_tokens[..., None].astype(jnp.float32),
        out.sampled_logprobs[..., None].astype(jnp.float32),
        out.topk_logprobs.astype(jnp.float32),
        out.topk_token_ids.astype(jnp.float32),
    ], axis=-1)


def _unpack_sampler_output(packed: np.ndarray,
                           max_logprobs: int) -> SamplerOutputArrays:
    arr = np.asarray(packed)
    return SamplerOutputArrays(
        sampled_tokens=arr[..., 0].astype(np.int32),
        sampled_logprobs=arr[..., 1],
        topk_logprobs=arr[..., 2:2 + max_logprobs],
        topk_token_ids=arr[..., 2 + max_logprobs:2 +
                           2 * max_logprobs].astype(np.int32),
    )


def _mix_seed(seed: int, step: int, row: int) -> int:
    """Deterministic per-(seed, step, row) 32-bit stream (splitmix-style).

    Replaces the reference's per-request torch.Generator state
    (sampling_metadata.py): stateless, so it reproduces across runs and
    across preemption/recompute.
    """
    x = ((seed & _U64) + _SEED_MIX * (step * 1000003 + row + 1)) & _U64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _U64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _U64
    x = x ^ (x >> 31)
    return x & 0xFFFFFFFF


class SpecStats:
    """Speculative-decoding acceptance counters (reference
    SpecDecodeWorkerMetrics role, vllm/spec_decode/metrics.py)."""

    def __init__(self) -> None:
        self.num_steps = 0
        self.num_draft_tokens = 0
        self.num_accepted = 0
        self.num_emitted = 0

    @property
    def acceptance_rate(self) -> float:
        return self.num_accepted / max(self.num_draft_tokens, 1)

    @property
    def mean_tokens_per_step(self) -> float:
        return self.num_emitted / max(self.num_steps, 1)


class ModelRunner:
    """Owns the model + params and runs bucketed jitted steps."""

    # Decode batch buckets (analog of the reference's CUDA-graph batch
    # sizes, model_runner.py:53): each value compiles one XLA program.
    DECODE_BATCH_BUCKETS = [8, 16, 32, 64, 128, 256]
    PREFILL_BATCH_BUCKETS = [1, 2, 4, 8, 16]
    PREFILL_LEN_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096,
                           8192, 16384, 32768]
    SAMPLE_ROW_BUCKETS = [8, 16, 32, 64, 128, 256, 512]
    PENALTY_LEN_BUCKETS = [0, 64, 256, 1024, 4096]
    LOGPROB_BUCKETS = [8, 32, 128]

    def __init__(
        self,
        model_config: ModelConfig,
        parallel_config: ParallelConfig,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        mesh=None,
        is_driver_worker: bool = True,
        lora_config=None,
        speculative_config=None,
    ) -> None:
        self.model_config = model_config
        self.parallel_config = parallel_config
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.mesh = mesh
        self.is_driver_worker = is_driver_worker
        self.lora_config = lora_config
        self.lora_manager = None

        self.block_size = cache_config.block_size
        self.max_model_len = model_config.max_model_len
        self.max_pages_per_seq = cdiv(self.max_model_len, self.block_size)

        # Per-instance ladders sized to THIS config (class defaults cover
        # the common range; _bucket clamps at ladder[-1]).
        max_seqs = scheduler_config.max_num_seqs
        self.DECODE_BATCH_BUCKETS = _extend_ladder(
            type(self).DECODE_BATCH_BUCKETS, max_seqs)
        self.PREFILL_BATCH_BUCKETS = _extend_ladder(
            type(self).PREFILL_BATCH_BUCKETS, max_seqs)
        self.PREFILL_LEN_BUCKETS = _extend_ladder(
            type(self).PREFILL_LEN_BUCKETS, self.max_model_len)
        # Sample rows are bounded by the scheduler's seq budget.
        self.SAMPLE_ROW_BUCKETS = _extend_ladder(
            type(self).SAMPLE_ROW_BUCKETS, max_seqs)
        # Penalty token histories run to the full model length.
        self.PENALTY_LEN_BUCKETS = _extend_ladder(
            type(self).PENALTY_LEN_BUCKETS, self.max_model_len)
        self.LOGPROB_BUCKETS = _extend_ladder(
            type(self).LOGPROB_BUCKETS, model_config.max_logprobs + 1)
        self.PREFIX_PAGE_BUCKETS = _extend_ladder(
            [4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048],
            self.max_pages_per_seq)

        self.model = None
        self.params = None
        self._rng = np.random.RandomState(model_config.seed)
        # Dispatch/compile observability (see execute_model wrapper).
        self._seen_programs: Dict[tuple, float] = {}
        self.dispatch_stats = collections.Counter()
        self._in_warmup = False
        self._prefill_fn = None
        self._decode_fn = None
        # (last_tokens_device, row_key, batch_bucket) of the most recent
        # fused decode window — consumed by a chained follow-up window
        # (pipelined serving).  Any OTHER dispatch that advances decode
        # rows invalidates it.
        self._window_carry = None
        # Splitwise prefill pool: dispatch prefills as layer-group
        # segments so freshly written KV pages stream to the decode pool
        # mid-forward (set by the Worker on PREFILL-typed workers).
        self.segment_prefill = False

        # Speculative decoding (TPU extension): the runner owns the draft
        # model; its paged cache (same page count/block size as the
        # target's, so one block table addresses both) is owned by the
        # worker and threaded through this attribute.
        self.speculative_config = speculative_config
        self.draft_model = None
        self.draft_params = None
        self.draft_caches = None
        self.spec_stats = SpecStats()

    # ---- model loading ----

    def load_model(self) -> None:
        self.model, host_params = get_model(self.model_config)
        # Quantized KV caches (--kv-cache-dtype int8/fp8): attention
        # modules must write x/kv_scale and dequantize on read (the
        # reference wires cache dtype through CacheEngine into the CUDA
        # attention kernels; here the scale lives on the module).
        if self.cache_config.cache_dtype != "auto":
            for attn in getattr(self.model, "attn", []):
                attn.kv_scale = self.cache_config.kv_scale
        if self.mesh is not None:
            from vllm_splitwise_tpu.parallel.mesh import shard_pytree
            self.params = shard_pytree(host_params,
                                       self.model.param_specs(), self.mesh)
        else:
            # Unsharded: fuse q/k/v and gate/up into single kernel
            # launches (models/llama.py merge_projections).
            if hasattr(self.model, "merge_projections"):
                self.model.merge_projections(host_params)
            self.params = jax.device_put(host_params)
        if self.lora_config is not None:
            from vllm_splitwise_tpu.lora.worker_manager import \
                WorkerLoRAManager
            self.lora_manager = WorkerLoRAManager(self.model_config,
                                                  self.lora_config,
                                                  self.model)
        if self.speculative_config is not None:
            draft_cfg = self.speculative_config.draft_model_config
            self.draft_model, draft_host = get_model(draft_cfg)
            if self.cache_config.cache_dtype != "auto":
                for attn in getattr(self.draft_model, "attn", []):
                    attn.kv_scale = self.cache_config.kv_scale
            if self.mesh is not None:
                from vllm_splitwise_tpu.parallel.mesh import shard_pytree
                self.draft_params = shard_pytree(
                    draft_host, self.draft_model.param_specs(), self.mesh)
            else:
                self.draft_params = jax.device_put(draft_host)
        self._build_step_fns()
        if self.speculative_config is not None:
            self._build_spec_fns()

    def _build_step_fns(self) -> None:
        model = self.model
        vocab_size = self.model_config.get_vocab_size()
        if self.lora_config is not None:
            # Adapter-added token ids live past the base vocab (reference
            # models/llama.py:292-304 unpadded_vocab_size expansion).
            vocab_size += self.lora_config.lora_extra_vocab_size

        def finalize_logits(logits):
            """Normalize head output to the sampler's vocab width: pad
            with -inf when the head produced base-vocab-only logits but
            LoRA extra vocab widened the sample space (a batch with no
            adapters must never sample an added id)."""
            width = logits.shape[-1]
            if width < vocab_size:
                pad = jnp.full(logits.shape[:-1] + (vocab_size - width, ),
                               jnp.finfo(jnp.float32).min, logits.dtype)
                return jnp.concatenate([logits, pad], axis=-1)
            return logits[..., :vocab_size]

        def head_logits(params, hidden, lora):
            if lora is not None:
                return finalize_logits(
                    model.compute_logits(params, hidden, lora))
            return finalize_logits(model.compute_logits(params, hidden))

        def prompt_logprobs_of(params, hidden, input_ids, max_logprobs,
                               lora=None):
            """Per-position logprobs over the whole prompt (echo /
            prompt_logprobs): position i scores token i+1.  Packed
            [B, T, 1+2L] — one fetch."""
            if lora is not None and "lm_head_A" in lora:
                b, t, h = hidden.shape
                flat_lora = dict(lora)
                flat_lora["idx"] = jnp.repeat(lora["idx"][:b], t)
                all_logits = model.compute_logits(
                    params, hidden.reshape(b * t, h),
                    flat_lora).reshape(b, t, -1)
            else:
                all_logits = model.compute_logits(params, hidden)
            all_logits = finalize_logits(all_logits)
            all_lp = jax.nn.log_softmax(all_logits.astype(jnp.float32),
                                        axis=-1)
            next_ids = jnp.roll(input_ids, -1, axis=1)
            chosen_lp = jnp.take_along_axis(all_lp, next_ids[..., None],
                                            axis=-1)[..., 0]
            topk_lp, topk_ids = jax.lax.top_k(all_lp, max_logprobs)
            return jnp.concatenate([
                chosen_lp[..., None], topk_lp,
                topk_ids.astype(jnp.float32)
            ], axis=-1)

        def parse_prefill(ibuf, batch, t_pad, prefix_pages):
            """Decode the prefill half of the packed i32 metadata buffer
            (layout mirrored in execute_model); returns the parse offset
            so sampler fields can be read from the same buffer."""
            off = 0

            def take(n):
                nonlocal off
                part = ibuf[off:off + n]
                off += n
                return part

            input_ids = take(batch * t_pad).reshape(batch, t_pad)
            positions = take(batch * t_pad).reshape(batch, t_pad)
            slot_mapping = take(batch * t_pad).reshape(batch, t_pad)
            seq_lens = take(batch)
            start_positions = take(batch)
            bt = pl = None
            if prefix_pages:
                bt = take(batch * prefix_pages).reshape(batch, prefix_pages)
                pl = take(batch)
            metadata = PrefillMetadata(seq_lens=seq_lens,
                                       slot_mapping=slot_mapping,
                                       start_positions=start_positions,
                                       block_tables=bt, prefix_lens=pl)
            return input_ids, positions, metadata, off

        def step(params, kv_caches, ibuf, fbuf, lora=None, *,
                 needs_filtering, max_logprobs, is_prefill, batch, t_pad,
                 pages, prefix_pages, s_pad, lp, lo,
                 return_prompt_logprobs=False):
            """One prefill or decode step.  All metadata arrives in two
            packed buffers (``ibuf`` i32, ``fbuf`` f32; layout mirrored
            in execute_model) and all sampler output leaves as one packed
            array: each host-visible jax array is its own transport round
            trip (~15-30 ms over the axon tunnel), so a step costs
            exactly two uploads and one or two fetches."""
            off = 0

            def take(n):
                nonlocal off
                part = ibuf[off:off + n]
                off += n
                return part

            if is_prefill:
                input_ids, positions, metadata, off = parse_prefill(
                    ibuf, batch, t_pad, prefix_pages)
            else:
                input_ids = take(batch).reshape(batch, 1)
                positions = take(batch).reshape(batch, 1)
                slot_mapping = take(batch)
                context_lens = take(batch)
                tables = take(batch * pages).reshape(batch, pages)
                metadata = DecodeMetadata(block_tables=tables,
                                          context_lens=context_lens,
                                          slot_mapping=slot_mapping)
            sample_indices = take(s_pad)
            top_k = take(s_pad)
            seeds = jax.lax.bitcast_convert_type(take(s_pad), jnp.uint32)
            prompt_tokens = take(s_pad * lp).reshape(s_pad, lp)
            output_tokens = take(s_pad * lo).reshape(s_pad, lo)
            f = fbuf.reshape(7, s_pad)
            sampling_tensors = SamplingTensors(
                temperature=f[0], top_p=f[1], top_k=top_k, min_p=f[2],
                greedy_mask=f[3] > 0.5, presence_penalty=f[4],
                frequency_penalty=f[5], repetition_penalty=f[6],
                prompt_tokens=prompt_tokens, output_tokens=output_tokens)

            if lora is not None:
                hidden, new_caches = model(params, input_ids, positions,
                                           kv_caches, metadata, lora=lora)
            else:
                hidden, new_caches = model(params, input_ids, positions,
                                           kv_caches, metadata)
            prompt_lp = None
            if is_prefill:
                if return_prompt_logprobs:
                    prompt_lp = prompt_logprobs_of(params, hidden,
                                                   input_ids, max_logprobs,
                                                   lora)
                # Gather each sequence's last valid position.
                last = jnp.maximum(metadata.seq_lens - 1, 0)
                hidden = hidden[jnp.arange(batch), last]
            else:
                hidden = hidden[:, 0]
            logits = head_logits(params, hidden, lora)
            # Expand model rows to sample rows (prompt best_of>1 draws
            # several tokens from one row's distribution).
            logits = jnp.take(logits, sample_indices, axis=0, mode="clip")
            out = sample(logits, sampling_tensors, seeds,
                         max_logprobs=max_logprobs,
                         needs_filtering=needs_filtering)
            return _pack_sampler_output(out), prompt_lp, new_caches

        def logits_step(params, input_ids, positions, kv_caches, metadata,
                        sample_indices, lora=None, *, is_prefill,
                        return_prompt_logprobs=False, max_logprobs=1):
            """Raw-logits variant: used when host-side logits processors
            (guided decoding) must run between the model and the sampler.
            Carries the same LoRA pytree and prompt-logprob surface as the
            packed step fn — guided requests keep their adapters and
            prompt_logprobs."""
            if lora is not None:
                hidden, new_caches = model(params, input_ids, positions,
                                           kv_caches, metadata, lora=lora)
            else:
                hidden, new_caches = model(params, input_ids, positions,
                                           kv_caches, metadata)
            prompt_lp = None
            if is_prefill:
                batch = hidden.shape[0]
                if return_prompt_logprobs:
                    prompt_lp = prompt_logprobs_of(params, hidden,
                                                   input_ids, max_logprobs,
                                                   lora)
                last = jnp.maximum(metadata.seq_lens - 1, 0)
                hidden = hidden[jnp.arange(batch), last]
            else:
                hidden = hidden[:, 0]
            logits = head_logits(params, hidden, lora).astype(jnp.float32)
            return jnp.take(logits, sample_indices, axis=0,
                            mode="clip"), prompt_lp, new_caches

        def sample_step(logits, sampling_tensors, seeds, *,
                        needs_filtering, max_logprobs):
            return _pack_sampler_output(
                sample(logits, sampling_tensors, seeds,
                       max_logprobs=max_logprobs,
                       needs_filtering=needs_filtering))

        self._logits_fn = jax.jit(logits_step,
                                  static_argnames=("is_prefill",
                                                   "return_prompt_logprobs",
                                                   "max_logprobs"),
                                  donate_argnums=(3, ))
        self._sample_fn = jax.jit(sample_step,
                                  static_argnames=("needs_filtering",
                                                   "max_logprobs"))

        self._step_fn = jax.jit(
            step,
            static_argnames=("needs_filtering", "max_logprobs",
                             "is_prefill", "batch", "t_pad", "pages",
                             "prefix_pages", "s_pad", "lp", "lo",
                             "return_prompt_logprobs"),
            donate_argnums=(1, ),
        )

        # ---- segmented prefill (Splitwise layer-streamed KV push) ----
        # The prefill splits into embed -> N layer-group dispatches ->
        # tail so the runner can stream each group's freshly written KV
        # pages to the decode pool while the remaining groups compute
        # (the reference's per-layer put() inside the attention forward,
        # flash_attn.py:82-86, at layer-group granularity).

        def seg_embed(params, ibuf, lora=None, *, batch, t_pad):
            input_ids = ibuf[:batch * t_pad].reshape(batch, t_pad)
            return model.embed(params, input_ids, lora)

        def seg_layers(params, kv_caches, hidden, ibuf, lora=None, *,
                       layer_start, num_layers, batch, t_pad,
                       prefix_pages):
            _, positions, metadata, _ = parse_prefill(
                ibuf, batch, t_pad, prefix_pages)
            if lora is not None:
                return model.forward_layers(params, hidden, positions,
                                            kv_caches, metadata, lora,
                                            layer_start=layer_start,
                                            num_layers=num_layers)
            return model.forward_layers(params, hidden, positions,
                                        kv_caches, metadata,
                                        layer_start=layer_start,
                                        num_layers=num_layers)

        def seg_tail(params, hidden, ibuf, fbuf, lora=None, *,
                     needs_filtering, max_logprobs, batch, t_pad,
                     prefix_pages, s_pad, lp, lo, return_prompt_logprobs):
            input_ids, _, metadata, off = parse_prefill(
                ibuf, batch, t_pad, prefix_pages)

            def take(n):
                nonlocal off
                part = ibuf[off:off + n]
                off += n
                return part

            sample_indices = take(s_pad)
            top_k = take(s_pad)
            seeds = jax.lax.bitcast_convert_type(take(s_pad), jnp.uint32)
            prompt_tokens = take(s_pad * lp).reshape(s_pad, lp)
            output_tokens = take(s_pad * lo).reshape(s_pad, lo)
            f = fbuf.reshape(7, s_pad)
            sampling_tensors = SamplingTensors(
                temperature=f[0], top_p=f[1], top_k=top_k, min_p=f[2],
                greedy_mask=f[3] > 0.5, presence_penalty=f[4],
                frequency_penalty=f[5], repetition_penalty=f[6],
                prompt_tokens=prompt_tokens, output_tokens=output_tokens)

            hidden = model.finalize(params, hidden)
            prompt_lp = None
            if return_prompt_logprobs:
                prompt_lp = prompt_logprobs_of(params, hidden, input_ids,
                                               max_logprobs, lora)
            last = jnp.maximum(metadata.seq_lens - 1, 0)
            hidden = hidden[jnp.arange(batch), last]
            logits = head_logits(params, hidden, lora)
            logits = jnp.take(logits, sample_indices, axis=0, mode="clip")
            out = sample(logits, sampling_tensors, seeds,
                         max_logprobs=max_logprobs,
                         needs_filtering=needs_filtering)
            return _pack_sampler_output(out), prompt_lp

        self._seg_embed_fn = jax.jit(seg_embed,
                                     static_argnames=("batch", "t_pad"))
        self._seg_layers_fn = jax.jit(
            seg_layers,
            static_argnames=("layer_start", "num_layers", "batch",
                             "t_pad", "prefix_pages"),
            donate_argnums=(1, 2),
        )
        self._seg_tail_fn = jax.jit(
            seg_tail,
            static_argnames=("needs_filtering", "max_logprobs", "batch",
                             "t_pad", "prefix_pages", "s_pad", "lp", "lo",
                             "return_prompt_logprobs"),
        )

        block_size = self.block_size

        def multi_step(params, kv_caches, ibuf, fbuf, carry_tokens, *,
                       num_steps, batch, pages, s_pad, needs_filtering,
                       max_logprobs, use_carry=False):
            """Fused K-step decode window (TPU extension, no reference
            analog): ``lax.scan`` over K decode steps with device-side
            token feedback, so ONE dispatch + ONE [K, B] packed fetch
            replace K host round-trips.  All per-window metadata arrives
            in two packed buffers (``ibuf`` i32, ``fbuf`` f32) because
            each host->device array is its own transport round trip
            (~15-30 ms over the axon tunnel) — 15+ small uploads were
            3x the window's actual compute.  Per-step KV slots are
            derived on device from the (lookahead-extended) block
            tables."""
            # ---- unpack (static layout; see _execute_multi_decode) ----
            off = 0

            def take(n):
                nonlocal off
                part = jax.lax.dynamic_slice_in_dim(ibuf, off, n)
                off += n
                return part

            first_tokens = take(batch)
            if use_carry:
                # Chained window (pipelined serving): the previous
                # window's final sampled tokens never visited the host —
                # they arrive as a live device array, so this window
                # dispatches BEFORE the previous one's outputs are even
                # fetched (the engine appends placeholder tokens
                # meanwhile and reconciles at fetch).
                first_tokens = carry_tokens
            ctx0 = take(batch)
            valid = take(batch) >= 0  # step-0 slots; -1 marks pad rows
            block_tables = take(batch * pages).reshape(batch, pages)
            sample_indices = take(s_pad)
            top_k = take(s_pad)
            seeds = jax.lax.bitcast_convert_type(
                take(num_steps * s_pad).reshape(num_steps, s_pad),
                jnp.uint32)
            zeros_s = jnp.zeros((s_pad, ), dtype=jnp.float32)
            sampling_tensors = SamplingTensors(
                temperature=fbuf[0:s_pad],
                top_p=fbuf[s_pad:2 * s_pad],
                top_k=top_k,
                min_p=fbuf[2 * s_pad:3 * s_pad],
                greedy_mask=fbuf[3 * s_pad:4 * s_pad] > 0.5,
                # Penalties are excluded by multi-step eligibility
                # (scheduler._plan_decode_window): compile the no-op path.
                presence_penalty=zeros_s,
                frequency_penalty=zeros_s,
                repetition_penalty=jnp.ones((s_pad, ), dtype=jnp.float32),
                prompt_tokens=jnp.zeros((s_pad, 0), dtype=jnp.int32),
                output_tokens=jnp.zeros((s_pad, 0), dtype=jnp.int32),
            )
            row_ids = jnp.arange(batch, dtype=jnp.int32)

            def body(carry, xs):
                caches, tokens = carry
                seeds_k, k = xs
                ctx = ctx0 + k
                pos = ctx - 1
                page = jnp.take_along_axis(
                    block_tables, (pos // block_size)[:, None],
                    axis=1)[:, 0]
                slot = jnp.where(valid, page * block_size + pos % block_size,
                                 -1)
                md = DecodeMetadata(block_tables=block_tables,
                                    context_lens=ctx, slot_mapping=slot)
                hidden, caches = model(params, tokens[:, None],
                                       pos[:, None], caches, md)
                logits = model.compute_logits(params, hidden[:, 0])
                logits = logits[..., :vocab_size]
                logits = jnp.take(logits, sample_indices, axis=0,
                                  mode="clip")
                out = sample(logits, sampling_tensors, seeds_k,
                             max_logprobs=max_logprobs,
                             needs_filtering=needs_filtering)
                next_tokens = jnp.take(out.sampled_tokens, row_ids,
                                       axis=0, mode="clip")
                return (caches, next_tokens), _pack_sampler_output(out)

            (kv_caches, last_tokens), outs = jax.lax.scan(
                body, (kv_caches, first_tokens),
                (seeds, jnp.arange(num_steps, dtype=jnp.int32)))
            return outs, last_tokens, kv_caches

        self._multi_step_fn = jax.jit(
            multi_step,
            static_argnames=("num_steps", "batch", "pages", "s_pad",
                             "needs_filtering", "max_logprobs",
                             "use_carry"),
            donate_argnums=(1, ),
        )

    @property
    def draft_stacked_kv(self) -> bool:
        fn = getattr(self.draft_model, "supports_stacked_kv", None)
        return bool(fn and fn())

    def _build_spec_fns(self) -> None:
        """Fused speculative-decoding step (TPU extension; the reference
        ships vllm/spec_decode as unwired scaffolding, and its host-loop
        orchestration would cost k+1 transport round-trips per step
        here).  ONE device dispatch runs: draft model scans k greedy
        proposals -> target model verifies all k+1 window tokens in one
        multi-query paged-attention pass -> rejection sampling emits
        1..k+1 tokens per sequence (exact target distribution regardless
        of draft quality)."""
        model = self.model
        draft_model = self.draft_model
        vocab_size = self.model_config.get_vocab_size()
        block_size = self.block_size
        from vllm_splitwise_tpu.layers.rejection_sampler import \
            rejection_sample_onehot_draft
        from vllm_splitwise_tpu.layers.sampler import \
            _apply_top_k_top_p_min_p

        def draft_prefill(draft_params, draft_caches, ibuf, *, batch,
                          t_pad, prefix_pages):
            """Draft-side prompt ingestion: same packed ibuf the target
            prefill already uploaded (zero extra transport), logits
            discarded — only the draft KV writes matter."""
            off = 0

            def take(n):
                nonlocal off
                part = jax.lax.dynamic_slice_in_dim(ibuf, off, n)
                off += n
                return part

            input_ids = take(batch * t_pad).reshape(batch, t_pad)
            positions = take(batch * t_pad).reshape(batch, t_pad)
            slot_rows = take(batch * t_pad).reshape(batch, t_pad)
            seq_lens = take(batch)
            start_positions = take(batch)
            bt = pl_ = None
            if prefix_pages:
                bt = take(batch * prefix_pages).reshape(batch, prefix_pages)
                pl_ = take(batch)
            md = PrefillMetadata(seq_lens=seq_lens, slot_mapping=slot_rows,
                                 start_positions=start_positions,
                                 block_tables=bt, prefix_lens=pl_)
            _, draft_caches = draft_model(draft_params, input_ids,
                                          positions, draft_caches, md)
            return draft_caches

        self._draft_prefill_fn = jax.jit(
            draft_prefill,
            static_argnames=("batch", "t_pad", "prefix_pages"),
            donate_argnums=(1, ))

        def draft_decode(draft_params, draft_caches, ibuf, *, batch,
                         pages):
            """Draft-side catch-up for window-INELIGIBLE decode steps
            (beam/penalties/processors in the batch degrade the whole
            step to plain single-token decode): write the step's token
            into the draft KV cache so later speculative windows don't
            propose against holes.  Reuses the target step's uploaded
            buffer; logits discarded."""
            off = 0

            def take(n):
                nonlocal off
                part = jax.lax.dynamic_slice_in_dim(ibuf, off, n)
                off += n
                return part

            input_ids = take(batch).reshape(batch, 1)
            positions = take(batch).reshape(batch, 1)
            slot_mapping = take(batch)
            context_lens = take(batch)
            block_tables = take(batch * pages).reshape(batch, pages)
            md = DecodeMetadata(block_tables=block_tables,
                                context_lens=context_lens,
                                slot_mapping=slot_mapping)
            _, draft_caches = draft_model(draft_params, input_ids,
                                          positions, draft_caches, md)
            return draft_caches

        self._draft_decode_fn = jax.jit(
            draft_decode, static_argnames=("batch", "pages"),
            donate_argnums=(1, ))

        def spec_step(params, draft_params, kv_caches, draft_caches, ibuf,
                      fbuf, *, k, batch, pages, s_pad, needs_filtering):
            # ---- unpack (layout mirrored in _execute_spec_decode) ----
            off = 0

            def take(n):
                nonlocal off
                part = jax.lax.dynamic_slice_in_dim(ibuf, off, n)
                off += n
                return part

            first_tokens = take(batch)       # last committed token / row
            ctx0 = take(batch)               # committed length (incl. it)
            valid = take(batch) >= 0         # step-0 slots; -1 = pad row
            block_tables = take(batch * pages).reshape(batch, pages)
            sample_indices = take(s_pad)
            top_k = take(s_pad)
            seeds = jax.lax.bitcast_convert_type(take(s_pad), jnp.uint32)
            tensors = SamplingTensors(
                temperature=fbuf[0:s_pad],
                top_p=fbuf[s_pad:2 * s_pad],
                top_k=top_k,
                min_p=fbuf[2 * s_pad:3 * s_pad],
                greedy_mask=fbuf[3 * s_pad:4 * s_pad] > 0.5,
                presence_penalty=jnp.zeros((s_pad, ), jnp.float32),
                frequency_penalty=jnp.zeros((s_pad, ), jnp.float32),
                repetition_penalty=jnp.ones((s_pad, ), jnp.float32),
                prompt_tokens=jnp.zeros((s_pad, 0), jnp.int32),
                output_tokens=jnp.zeros((s_pad, 0), jnp.int32),
            )

            def slot_at(pos):
                page = jnp.take_along_axis(block_tables,
                                           (pos // block_size)[:, None],
                                           axis=1)[:, 0]
                return jnp.where(valid, page * block_size +
                                 pos % block_size, -1)

            # ---- draft: k greedy single-token steps (lax.scan) ----
            # One EXTRA iteration feeds the last proposal d_k back so its
            # draft-side KV is written too; without it, a fully-accepted
            # window leaves a permanent hole at d_k's position in the
            # draft cache that poisons every later proposal (correctness
            # is unaffected — rejection sampling guards it — but the
            # acceptance rate decays).  Its own proposal is discarded.
            def dbody(carry, j):
                dcaches, tok = carry
                pos = ctx0 - 1 + j
                md = DecodeMetadata(block_tables=block_tables,
                                    context_lens=ctx0 + j,
                                    slot_mapping=slot_at(pos))
                hidden, dcaches = draft_model(draft_params, tok[:, None],
                                              pos[:, None], dcaches, md)
                logits = draft_model.compute_logits(draft_params,
                                                    hidden[:, 0])
                nxt = jnp.argmax(logits[..., :vocab_size],
                                 axis=-1).astype(jnp.int32)
                return (dcaches, nxt), nxt

            (draft_caches, _), drafts = jax.lax.scan(
                dbody, (draft_caches, first_tokens),
                jnp.arange(k + 1, dtype=jnp.int32))
            draft_tokens = drafts[:k].T                   # [B, k]

            # ---- target: one multi-query verify over the k+1 window ----
            window = jnp.concatenate([first_tokens[:, None], draft_tokens],
                                     axis=1)              # [B, k+1]
            pos_w = ctx0[:, None] - 1 + jnp.arange(k + 1)[None, :]
            pages_w = jnp.take_along_axis(block_tables, pos_w // block_size,
                                          axis=1)
            slots_w = jnp.where(valid[:, None],
                                pages_w * block_size + pos_w % block_size,
                                -1)
            md = DecodeMetadata(block_tables=block_tables,
                                context_lens=ctx0 + k,
                                slot_mapping=slots_w.reshape(-1))
            hidden, kv_caches = model(params, window, pos_w, kv_caches, md)
            logits = model.compute_logits(
                params, hidden.reshape(batch * (k + 1), -1))
            logits = logits[..., :vocab_size].astype(jnp.float32)
            logits = logits.reshape(batch, k + 1, vocab_size)
            logits = jnp.take(logits, sample_indices, axis=0, mode="clip")

            # Target distribution per position.  Greedy rows accept by
            # token equality with the argmax (fully deterministic); no
            # [.., V] one-hot is ever materialized — the specialized
            # rejection sampler gathers target probs at the draft ids.
            gm_tok = jnp.argmax(logits, axis=-1)          # [s_pad, k+1]
            temp = jnp.maximum(tensors.temperature, 1e-5)[:, None, None]
            lf = logits / temp
            if needs_filtering:
                rep = lambda x: jnp.repeat(x, k + 1, axis=0)
                flat_tensors = SamplingTensors(
                    temperature=rep(tensors.temperature),
                    top_p=rep(tensors.top_p), top_k=rep(tensors.top_k),
                    min_p=rep(tensors.min_p),
                    greedy_mask=rep(tensors.greedy_mask),
                    presence_penalty=None, frequency_penalty=None,
                    repetition_penalty=None, prompt_tokens=None,
                    output_tokens=None)
                lf = _apply_top_k_top_p_min_p(
                    lf.reshape(s_pad * (k + 1), vocab_size),
                    flat_tensors).reshape(s_pad, k + 1, vocab_size)
            probs = jax.nn.softmax(lf, axis=-1)

            d_ids = jnp.take(draft_tokens, sample_indices, axis=0,
                             mode="clip")                 # [s_pad, k]
            # Per-row keys: a seeded request reproduces regardless of
            # which other requests share its batch.  Distinct stream for
            # the bonus draw.
            bonus_rand = jax.vmap(
                lambda s, row: jax.random.categorical(
                    jax.random.PRNGKey(s ^ jnp.uint32(0x5EC0FFEE)),
                    row))(seeds, lf[:, k])
            bonus = jnp.where(tensors.greedy_mask, gm_tok[:, k],
                              bonus_rand).astype(jnp.int32)
            out = rejection_sample_onehot_draft(seeds, d_ids, probs,
                                                tensors.greedy_mask,
                                                gm_tok, bonus)
            out_ids = out.output_token_ids                # [s_pad, k+1]

            # True model logprobs of the emitted tokens (the plain paths
            # report real values even for greedy rows — match them).
            logp = jax.nn.log_softmax(lf, axis=-1)
            lp = jnp.take_along_axis(logp,
                                     jnp.maximum(out_ids, 0)[..., None],
                                     axis=-1)[..., 0]
            lp = jnp.where(out_ids >= 0, lp, 0.0)

            packed = jnp.stack([
                out_ids.T.astype(jnp.float32), lp.T, lp.T,
                out_ids.T.astype(jnp.float32)
            ], axis=-1)                                   # [k+1, s_pad, 4]
            # Pad bucket rows carry garbage: count only real rows.
            rows_valid = jnp.take(valid, jnp.arange(batch), axis=0,
                                  mode="clip")
            num_acc = jnp.where(
                rows_valid,
                jnp.take(out.num_accepted, jnp.arange(batch), axis=0,
                         mode="clip"), 0)
            num_emit = jnp.where(
                rows_valid,
                jnp.take(out.num_emitted, jnp.arange(batch), axis=0,
                         mode="clip"), 0)
            # ONE fetched array: every host-visible output rides an extra
            # "step" row of `packed` — separate small fetches each cost a
            # full transport round trip (~15-30 ms tunneled), the exact
            # overhead the fused window exists to avoid (perf notes #9).
            stats = jnp.zeros((s_pad, 4), jnp.float32)
            stats = stats.at[:batch, 0].set(num_acc.astype(jnp.float32))
            stats = stats.at[:batch, 1].set(num_emit.astype(jnp.float32))
            packed = jnp.concatenate([packed, stats[None]], axis=0)
            return packed, kv_caches, draft_caches

        self._spec_fn = jax.jit(
            spec_step,
            static_argnames=("k", "batch", "pages", "s_pad",
                             "needs_filtering"),
            donate_argnums=(2, 3))

    @staticmethod
    def _pack_decode_window_bufs(input_ids, metadata, sample_indices,
                                 tensors, seeds):
        """Shared i32/f32 packed-buffer layout for the fused decode
        windows (multi-step and speculative).  The device-side unpack
        order in BOTH jitted window fns mirrors this — keep the layout
        defined once."""
        ibuf = np.concatenate([
            input_ids[:, 0], metadata.context_lens, metadata.slot_mapping,
            metadata.block_tables.ravel(), sample_indices, tensors.top_k,
            seeds.ravel().view(np.int32)
        ])
        fbuf = np.concatenate([
            tensors.temperature, tensors.top_p, tensors.min_p,
            tensors.greedy_mask.astype(np.float32)
        ])
        return ibuf, fbuf

    def _execute_spec_decode(self, seq_group_metadata_list, kv_caches,
                             k: int):
        """Run one fused speculative step; returns (k+1 virtual-step
        SamplerOutputs with -1 marking rejected positions, caches)."""
        input_ids, _, metadata, _ = self._prepare_decode(
            seq_group_metadata_list, as_numpy=True)
        (tensors, seeds, sample_indices, needs_filtering, _,
         plan) = self._prepare_sample(seq_group_metadata_list, False,
                                      as_numpy=True)
        batch = input_ids.shape[0]
        pages = metadata.block_tables.shape[1]
        s_pad = sample_indices.shape[0]
        ibuf, fbuf = self._pack_decode_window_bufs(
            input_ids, metadata, sample_indices, tensors, seeds)
        packed, kv_caches, self.draft_caches = \
            self._spec_fn(self.params, self.draft_params, kv_caches,
                          self.draft_caches, jnp.asarray(ibuf),
                          jnp.asarray(fbuf), k=k, batch=batch, pages=pages,
                          s_pad=s_pad, needs_filtering=needs_filtering)

        # ONE device fetch: [k+2, s_pad, 4] — the last "step" row carries
        # (num_accepted, num_emitted) per batch row (see spec_step).
        packed = np.asarray(packed)
        stats = packed[-1]
        packed = packed[:-1]
        num_acc = stats[:batch, 0].astype(np.int64)
        num_emit = stats[:batch, 1].astype(np.int64)
        num_real = len(seq_group_metadata_list)
        self.spec_stats.num_steps += num_real
        self.spec_stats.num_draft_tokens += num_real * k
        self.spec_stats.num_accepted += int(num_acc.sum())
        self.spec_stats.num_emitted += int(num_emit.sum())

        arrs = _unpack_sampler_output(packed, 1)          # [k+1, s_pad, .]
        step_outputs = [
            self._process_sampler_output(
                SamplerOutputArrays(arrs.sampled_tokens[j],
                                    arrs.sampled_logprobs[j],
                                    arrs.topk_logprobs[j],
                                    arrs.topk_token_ids[j]), plan)
            for j in range(k + 1)
        ]
        return step_outputs, kv_caches

    # ---- batch preparation ----

    def _prepare_prompt(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        as_numpy: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, PrefillMetadata, List[int]]:
        seq_lens: List[int] = []
        rows_tokens: List[List[int]] = []
        rows_slots: List[List[int]] = []
        start_positions: List[int] = []
        prefix_tables: List[List[int]] = []

        for md in seq_group_metadata_list:
            assert len(md.seq_data) == 1, \
                "Prompt groups have exactly one sequence."
            seq_id = next(iter(md.seq_data))
            data = md.seq_data[seq_id]
            token_ids = data.token_ids
            prefix_len = md.prefix_len
            # Chunked prefill computes only [prefix_len, prefill_end);
            # the chunk start rides the prefix path (earlier positions'
            # KV was written by prior chunks).
            end = getattr(md, "prefill_end", None) or len(token_ids)
            tokens = token_ids[prefix_len:end]
            block_table = md.block_tables[seq_id]

            slots = []
            for i in range(prefix_len, end):
                page = block_table[i // self.block_size]
                slots.append(page * self.block_size + i % self.block_size)

            seq_lens.append(len(tokens))
            rows_tokens.append(tokens)
            rows_slots.append(slots)
            start_positions.append(prefix_len)
            # FULL table (prefix + suffix pages) for EVERY row: in a
            # mixed batch the TPU prefix path sends prefix-less rows
            # through the same multi-query paged kernel (ctx = 0 +
            # suffix), so their tables must point at their own pages —
            # an empty row would silently attend page 0.  The dense
            # fallback gathers prefix pages and masks by prefix_lens, so
            # the extra (suffix) pages are harmless there.
            prefix_tables.append(list(block_table))

        batch = _bucket(len(seq_lens), self.PREFILL_BATCH_BUCKETS)
        t_pad = _bucket(max(seq_lens), self.PREFILL_LEN_BUCKETS)
        # Chunked-prefill shape hygiene: a batch touching chunk state
        # (a continuation or a capped first chunk) pads its length to
        # the chunk bucket and its prefix table to the maximum width, so
        # ALL chunked dispatches share one compiled program per batch
        # bucket — otherwise final-chunk lengths and per-prompt page
        # counts each mint a new (t_pad, prefix_pages) program shape
        # that compiles mid-traffic.
        chunk = getattr(self.scheduler_config, "chunked_prefill_tokens",
                        0)
        chunked_batch = bool(chunk) and any(
            getattr(md, "prefill_end", None) is not None
            for md in seq_group_metadata_list)
        if chunked_batch:
            t_pad = _bucket(min(chunk, self.max_model_len),
                            self.PREFILL_LEN_BUCKETS)

        input_ids = np.zeros((batch, t_pad), dtype=np.int32)
        positions = np.zeros((batch, t_pad), dtype=np.int32)
        slot_mapping = np.full((batch, t_pad), -1, dtype=np.int32)
        padded_lens = np.ones((batch, ), dtype=np.int32)
        padded_starts = np.zeros((batch, ), dtype=np.int32)
        for i, (toks, slots, start) in enumerate(
                zip(rows_tokens, rows_slots, start_positions)):
            n = len(toks)
            input_ids[i, :n] = toks
            positions[i, :n] = np.arange(start, start + n)
            slot_mapping[i, :n] = slots
            padded_lens[i] = n
            padded_starts[i] = start

        conv = (lambda x: x) if as_numpy else jnp.asarray
        bt_arr = None
        pl_arr = None
        if any(start_positions):
            max_prefix_pages = _bucket(
                max(len(t) for t in prefix_tables),
                self.PREFIX_PAGE_BUCKETS)
            bt = np.zeros((batch, max_prefix_pages), dtype=np.int32)
            plens = np.zeros((batch, ), dtype=np.int32)
            for i, (tbl, start) in enumerate(
                    zip(prefix_tables, start_positions)):
                bt[i, :len(tbl)] = tbl
                plens[i] = start
            bt_arr = conv(bt)
            pl_arr = conv(plens)

        metadata = PrefillMetadata(
            seq_lens=conv(padded_lens),
            slot_mapping=conv(slot_mapping),
            start_positions=conv(padded_starts),
            block_tables=bt_arr,
            prefix_lens=pl_arr,
        )
        return input_ids, positions, metadata, seq_lens

    def _prepare_decode(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        as_numpy: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, DecodeMetadata, int]:
        tokens: List[int] = []
        abs_positions: List[int] = []
        context_lens: List[int] = []
        slots: List[int] = []
        block_rows: List[List[int]] = []

        sliding_window = self.model_config.get_sliding_window()

        for md in seq_group_metadata_list:
            for seq_id in sorted(md.seq_data):
                data = md.seq_data[seq_id]
                tokens.append(data.last_token)
                seq_len = data.num_tokens
                block_table = md.block_tables[seq_id]
                pos = seq_len - 1
                abs_positions.append(pos)
                page = block_table[pos // self.block_size]
                slots.append(page * self.block_size +
                             pos % self.block_size)
                ctx = seq_len
                if sliding_window is not None:
                    ctx = min(ctx, sliding_window)
                    block_table = block_table[-cdiv(ctx, self.block_size):]
                context_lens.append(ctx)
                block_rows.append(block_table)

        num_rows = len(tokens)
        batch = _bucket(num_rows, self.DECODE_BATCH_BUCKETS)
        input_ids = np.zeros((batch, 1), dtype=np.int32)
        positions = np.zeros((batch, 1), dtype=np.int32)
        slot_arr = np.full((batch, ), -1, dtype=np.int32)
        ctx_arr = np.ones((batch, ), dtype=np.int32)
        tables = np.zeros((batch, self.max_pages_per_seq), dtype=np.int32)
        for i in range(num_rows):
            input_ids[i, 0] = tokens[i]
            # ABSOLUTE position (reference model_runner.py decode prep):
            # prefill rotated earlier K at absolute positions, so a
            # sliding-window model's new token must too — deriving it
            # from the window-clamped context froze RoPE at window-1 and
            # corrupted relative distances past the window.
            positions[i, 0] = abs_positions[i]
            slot_arr[i] = slots[i]
            ctx_arr[i] = context_lens[i]
            row = block_rows[i]
            tables[i, :len(row)] = row

        conv = (lambda x: x) if as_numpy else jnp.asarray
        metadata = DecodeMetadata(
            block_tables=conv(tables),
            context_lens=conv(ctx_arr),
            slot_mapping=conv(slot_arr),
        )
        return input_ids, positions, metadata, num_rows

    # ---- sampling preparation ----

    def _prepare_sample(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        is_prompt: bool,
        as_numpy: bool = False,
    ) -> Tuple[SamplingTensors, np.ndarray, np.ndarray, bool, int,
               List[Tuple[SequenceGroupMetadata, List[int], List[int]]]]:
        """Build per-sample-row tensors.

        Returns (tensors, seeds, sample_indices, needs_filtering,
        max_logprobs, plan) where plan maps each group to its
        (sample_row_ids, parent_seq_ids).
        """
        vocab_size = self.model_config.get_vocab_size()
        temps: List[float] = []
        top_ps: List[float] = []
        top_ks: List[int] = []
        min_ps: List[float] = []
        greedy: List[bool] = []
        pres: List[float] = []
        freq: List[float] = []
        rep: List[float] = []
        prompt_rows: List[List[int]] = []
        output_rows: List[List[int]] = []
        seeds: List[int] = []
        sample_indices: List[int] = []
        plan = []

        model_row = 0
        max_logprobs = 1
        for md in seq_group_metadata_list:
            sp = md.sampling_params
            if sp.logprobs is not None:
                max_logprobs = max(max_logprobs, sp.logprobs + 1)
            if sp.use_beam_search:
                max_logprobs = max(max_logprobs, 2 * sp.best_of)

            seq_ids = sorted(md.seq_data)
            if is_prompt:
                # One model row; best_of sample rows for random sampling,
                # 1 for greedy/beam (beam expands host-side from topk).
                n_rows = (sp.best_of if sp.sampling_type in
                          (SamplingType.RANDOM,
                           SamplingType.RANDOM_SEED) else 1)
                row_ids = []
                for j in range(n_rows):
                    row_ids.append(len(sample_indices))
                    sample_indices.append(model_row)
                    self._append_row(md, seq_ids[0], j, temps, top_ps,
                                     top_ks, min_ps, greedy, pres, freq,
                                     rep, prompt_rows, output_rows, seeds,
                                     vocab_size)
                plan.append((md, row_ids, [seq_ids[0]] * n_rows))
                model_row += 1
            else:
                row_ids = []
                for seq_id in seq_ids:
                    row_ids.append(len(sample_indices))
                    sample_indices.append(model_row)
                    self._append_row(md, seq_id, 0, temps, top_ps, top_ks,
                                     min_ps, greedy, pres, freq, rep,
                                     prompt_rows, output_rows, seeds,
                                     vocab_size)
                    model_row += 1
                plan.append((md, row_ids, seq_ids))

        num_rows = len(sample_indices)
        s_pad = _bucket(num_rows, self.SAMPLE_ROW_BUCKETS)

        def pad1(vals, fill, dtype):
            arr = np.full((s_pad, ), fill, dtype=dtype)
            arr[:num_rows] = vals
            return arr

        do_penalties = any(p != 0.0 for p in pres) or any(
            f != 0.0 for f in freq) or any(r != 1.0 for r in rep)
        if do_penalties:
            lp = _bucket(max((len(r) for r in prompt_rows), default=0),
                         self.PENALTY_LEN_BUCKETS)
            lo = _bucket(max((len(r) for r in output_rows), default=0),
                         self.PENALTY_LEN_BUCKETS)
        else:
            lp = lo = 0
        prompt_arr = np.full((s_pad, lp), -1, dtype=np.int32)
        output_arr = np.full((s_pad, lo), -1, dtype=np.int32)
        if do_penalties:
            for i in range(num_rows):
                pr = prompt_rows[i][-lp:] if lp else []
                orow = output_rows[i][-lo:] if lo else []
                prompt_arr[i, :len(pr)] = pr
                output_arr[i, :len(orow)] = orow

        conv = (lambda x: x) if as_numpy else jnp.asarray
        tensors = SamplingTensors(
            temperature=conv(pad1(temps, 1.0, np.float32)),
            top_p=conv(pad1(top_ps, 1.0, np.float32)),
            top_k=conv(pad1(top_ks, vocab_size, np.int32)),
            min_p=conv(pad1(min_ps, 0.0, np.float32)),
            greedy_mask=conv(pad1(greedy, True, bool)),
            presence_penalty=conv(pad1(pres, 0.0, np.float32)),
            frequency_penalty=conv(pad1(freq, 0.0, np.float32)),
            repetition_penalty=conv(pad1(rep, 1.0, np.float32)),
            prompt_tokens=conv(prompt_arr),
            output_tokens=conv(output_arr),
        )
        seeds_arr = pad1(seeds, 0, np.uint32)
        idx_arr = pad1(sample_indices, 0, np.int32)
        needs_filtering = any(
            (k < vocab_size and k > 0) for k in top_ks) or any(
                p < 1.0 for p in top_ps) or any(m > 0.0 for m in min_ps)
        max_logprobs = _bucket(max_logprobs, self.LOGPROB_BUCKETS)
        return (tensors, seeds_arr, idx_arr, needs_filtering, max_logprobs,
                plan)

    def _append_row(self, md, seq_id, sub_row, temps, top_ps, top_ks,
                    min_ps, greedy, pres, freq, rep, prompt_rows,
                    output_rows, seeds, vocab_size) -> None:
        sp = md.sampling_params
        data = md.seq_data[seq_id]
        is_greedy = sp.sampling_type == SamplingType.GREEDY
        # Zero temperature means deterministic sampling (argmax via the
        # greedy mask); use 1.0 for the softmax so reported logprobs and
        # beam-search cumulative scores stay undistorted (reference
        # sampling_metadata.py:101-105 — clamping to a tiny epsilon
        # instead collapses every beam onto the greedy path).
        temps.append(sp.temperature if sp.temperature >= 1e-5 else 1.0)
        top_ps.append(sp.top_p)
        top_ks.append(sp.top_k if sp.top_k > 0 else vocab_size)
        min_ps.append(sp.min_p)
        greedy.append(is_greedy)
        pres.append(sp.presence_penalty)
        freq.append(sp.frequency_penalty)
        rep.append(sp.repetition_penalty)
        prompt_rows.append(data.prompt_token_ids)
        output_rows.append(data.output_token_ids)
        step = data.output_len
        if sp.seed is not None:
            seeds.append(_mix_seed(sp.seed, step, sub_row))
        else:
            seeds.append(int(self._rng.randint(0, 2**31)) ^ sub_row)

    # ---- the step ----

    def execute_model(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        kv_caches,
        num_decode_steps: int = 1,
        kv_stream=None,
        defer: bool = False,
    ) -> Tuple[Optional[SamplerOutput], Any]:
        """Timed wrapper: tracks per-program-shape dispatch times so
        compile stalls are visible in serving logs (a first-seen bucket
        combo on a remote-compile transport can block the engine loop
        for minutes — the exact failure mode behind the r3 serving
        collapse).  Stats land in ``self.dispatch_stats``.

        ``defer=True`` returns ``(thunk, kv_caches)`` instead of
        ``(output, kv_caches)``: the device program is dispatched
        (async) but the host-visible fetch + output processing happen
        when the thunk runs — the mixed-batch step dispatches decode AND
        prefill before fetching either, so the decode fetch's transport
        latency rides under the prefill compute."""
        if not seq_group_metadata_list:
            return ((lambda: []) if defer else []), kv_caches
        sig = self._program_signature(seq_group_metadata_list,
                                      num_decode_steps)
        first = sig not in self._seen_programs
        t0 = time.perf_counter()
        result = self._execute_model_impl(seq_group_metadata_list,
                                          kv_caches, num_decode_steps,
                                          kv_stream, defer=defer)
        dt = time.perf_counter() - t0
        st = self.dispatch_stats
        st["dispatches"] += 1
        st["dispatch_s"] += dt
        st["prefill_s" if sig[0] == "P" else "decode_s"] += dt
        if first:
            self._seen_programs[sig] = dt
            if dt > 1.0 and not self._in_warmup:
                st["compile_stalls"] += 1
                st["compile_stall_s"] += dt
                logger.warning(
                    "first dispatch of program shape %s took %.1fs "
                    "(compile stall; pre-compile it with "
                    "--warmup-mode full)", sig, dt)
        return result

    def _program_signature(self, seq_group_metadata_list,
                           num_decode_steps: int):
        """Coarse static-shape key of this dispatch: enough to identify
        which compiled program the batch lands on (greedy serving —
        penalty/logprob dims add further axes not tracked here).  The
        prompt key mirrors _prepare_prompt's dispatch shape exactly —
        (t_pad incl. the chunked override, prefix-page bucket) — so
        compile-stall accounting attributes chunked-prefill programs to
        the shapes that actually run."""
        if seq_group_metadata_list[0].is_prompt:
            seq_lens = []
            starts = []
            table_lens = []
            for md in seq_group_metadata_list:
                sid = next(iter(md.seq_data))
                prefix_len = md.prefix_len
                end = (getattr(md, "prefill_end", None)
                       or md.seq_data[sid].num_tokens)
                seq_lens.append(end - prefix_len)
                starts.append(prefix_len)
                table_lens.append(len(md.block_tables[sid]))
            batch = _bucket(len(seq_lens), self.PREFILL_BATCH_BUCKETS)
            t_pad = _bucket(max(seq_lens), self.PREFILL_LEN_BUCKETS)
            chunk = getattr(self.scheduler_config,
                            "chunked_prefill_tokens", 0)
            if chunk and any(
                    getattr(md, "prefill_end", None) is not None
                    for md in seq_group_metadata_list):
                t_pad = _bucket(min(chunk, self.max_model_len),
                                self.PREFILL_LEN_BUCKETS)
            prefix_pages = 0
            if any(starts):
                prefix_pages = _bucket(max(table_lens),
                                       self.PREFIX_PAGE_BUCKETS)
            return ("P", batch, t_pad, prefix_pages)
        rows = sum(len(md.seq_data) for md in seq_group_metadata_list)
        return ("D", _bucket(rows, self.DECODE_BATCH_BUCKETS),
                num_decode_steps)

    def _execute_model_impl(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        kv_caches,
        num_decode_steps: int = 1,
        kv_stream=None,
        defer: bool = False,
    ) -> Tuple[Optional[SamplerOutput], Any]:
        is_prompt = seq_group_metadata_list[0].is_prompt

        if not is_prompt and not (num_decode_steps > 1
                                  and self.draft_model is None):
            # Tokens advance outside the fused-window path (plain decode,
            # spec steps, host-processor batches): the device-side window
            # carry no longer reflects these rows' last tokens.
            self._window_carry = None

        if not is_prompt and num_decode_steps > 1:
            if self.draft_model is not None:
                # A spec step plans a (k+1)-token window.  Eager fetch
                # (acceptance stats feed the scheduler) — wrap for the
                # defer contract.
                out, kv_caches = self._execute_spec_decode(
                    seq_group_metadata_list, kv_caches,
                    num_decode_steps - 1)
                return ((lambda: out) if defer else out), kv_caches
            return self._execute_multi_decode(seq_group_metadata_list,
                                              kv_caches, num_decode_steps,
                                              defer=defer)

        if is_prompt:
            input_ids, positions, metadata, _ = self._prepare_prompt(
                seq_group_metadata_list, as_numpy=True)
        else:
            input_ids, positions, metadata, _ = self._prepare_decode(
                seq_group_metadata_list, as_numpy=True)

        (tensors, seeds, sample_indices, needs_filtering, max_logprobs,
         plan) = self._prepare_sample(seq_group_metadata_list, is_prompt,
                                      as_numpy=True)

        has_processors = any(md.sampling_params.logits_processors
                             for md in seq_group_metadata_list)

        want_prompt_lp = is_prompt and any(
            md.sampling_params.prompt_logprobs is not None
            for md in seq_group_metadata_list)
        if want_prompt_lp:
            max_logprobs = max(
                max_logprobs,
                _bucket(
                    max((md.sampling_params.prompt_logprobs or 0) + 1
                        for md in seq_group_metadata_list),
                    self.LOGPROB_BUCKETS))

        lora = self._prepare_lora(seq_group_metadata_list,
                                  input_ids.shape[0])

        # Pack all metadata into two buffers even on the host-processor
        # path: the draft-model sync fns parse this exact layout (the
        # jitted step; see its docstring for why).
        batch = input_ids.shape[0]
        s_pad = sample_indices.shape[0]
        parts = [input_ids.ravel(), positions.ravel()]
        if is_prompt:
            t_pad = input_ids.shape[1]
            pages = 0
            parts += [np.asarray(metadata.slot_mapping).ravel(),
                      metadata.seq_lens, metadata.start_positions]
            prefix_pages = 0
            if metadata.block_tables is not None:
                prefix_pages = metadata.block_tables.shape[1]
                parts += [metadata.block_tables.ravel(),
                          metadata.prefix_lens]
        else:
            t_pad = 1
            prefix_pages = 0
            pages = metadata.block_tables.shape[1]
            parts += [metadata.slot_mapping, metadata.context_lens,
                      metadata.block_tables.ravel()]
        parts += [sample_indices, tensors.top_k, seeds.view(np.int32),
                  tensors.prompt_tokens.ravel(),
                  tensors.output_tokens.ravel()]
        ibuf = np.concatenate(parts)
        fbuf = np.concatenate([
            tensors.temperature, tensors.top_p, tensors.min_p,
            tensors.greedy_mask.astype(np.float32),
            tensors.presence_penalty, tensors.frequency_penalty,
            tensors.repetition_penalty
        ])

        ibuf_dev = jnp.asarray(ibuf)

        if has_processors:
            # Slow path (guided decoding): logits -> host processors ->
            # jitted sampler.  Keeps LoRA, prompt logprobs, and the
            # draft-cache sync — only sampling moves to the host side.
            sampler_output, kv_caches = self._execute_with_host_processors(
                seq_group_metadata_list, kv_caches, is_prompt, tensors,
                seeds, sample_indices, needs_filtering, max_logprobs, plan,
                (input_ids, positions, metadata), lora, want_prompt_lp)
            self._sync_draft_caches(ibuf_dev, is_prompt, batch,
                                    t_pad if is_prompt else 1,
                                    prefix_pages, pages)
            # Host processors force an eager fetch; keep the contract.
            return ((lambda: sampler_output)
                    if defer else sampler_output), kv_caches

        seg_plan = self._prefill_segment_plan(kv_caches, lora) \
            if (is_prompt and self.segment_prefill) else None
        if seg_plan is not None:
            out, prompt_lp, kv_caches = self._execute_prefill_segmented(
                kv_caches, ibuf_dev, jnp.asarray(fbuf), lora, kv_stream,
                plan=seg_plan, batch=batch, t_pad=t_pad,
                prefix_pages=prefix_pages, s_pad=s_pad,
                lp=tensors.prompt_tokens.shape[1],
                lo=tensors.output_tokens.shape[1],
                needs_filtering=needs_filtering,
                max_logprobs=max_logprobs, want_prompt_lp=want_prompt_lp)
        else:
            out, prompt_lp, kv_caches = self._step_fn(
                self.params, kv_caches, ibuf_dev, jnp.asarray(fbuf),
                lora, needs_filtering=needs_filtering,
                max_logprobs=max_logprobs, is_prefill=is_prompt,
                batch=batch, t_pad=t_pad, pages=pages,
                prefix_pages=prefix_pages, s_pad=s_pad,
                lp=tensors.prompt_tokens.shape[1],
                lo=tensors.output_tokens.shape[1],
                return_prompt_logprobs=want_prompt_lp)

        self._sync_draft_caches(ibuf_dev, is_prompt, batch, t_pad,
                                 prefix_pages, pages)

        def finish():
            sampler_output = self._process_sampler_output(
                _unpack_sampler_output(out, max_logprobs), plan)
            if prompt_lp is not None:
                self._attach_prompt_logprobs(sampler_output, prompt_lp,
                                             max_logprobs, plan,
                                             seq_group_metadata_list)
            return sampler_output

        return (finish if defer else finish()), kv_caches

    def _prefill_segment_plan(self, kv_caches, lora):
        """Layer-group plan [(layer_start, num_layers)] for the streamed
        prefill, or None when the model / cache layout / config can't
        segment (those prefills run the monolithic step fn and the
        migration manager bulk-migrates at commit)."""
        segs = self.parallel_config.kv_stream_segments
        model = self.model
        if segs <= 1 or not all(
                hasattr(model, a)
                for a in ("embed", "forward_layers", "finalize")):
            return None
        # Same stacked-cache shape test as the model's __call__ routing.
        if not (isinstance(kv_caches, tuple) and len(kv_caches) == 2
                and not isinstance(kv_caches[0], tuple)
                and getattr(kv_caches[0], "ndim", 0) == 5):
            return None
        can_scan = getattr(model, "_can_scan", None)
        if can_scan is None or not can_scan(self.params, lora):
            return None
        n_layers = model.num_layers
        size = cdiv(n_layers, min(segs, n_layers))
        plan = []
        start = 0
        while start < n_layers:
            n = min(size, n_layers - start)
            plan.append((start, n))
            start += n
        return plan

    def _execute_prefill_segmented(self, kv_caches, ibuf_dev, fbuf_dev,
                                   lora, kv_stream, *, plan, batch, t_pad,
                                   prefix_pages, s_pad, lp, lo,
                                   needs_filtering, max_logprobs,
                                   want_prompt_lp):
        """Splitwise layer-streamed prefill: embed, then one dispatch per
        layer group with a KV-page push to the decode pool right after
        each group's dispatch, then the sampling tail.  All dispatches
        are async, so each push's gather + cross-mesh device_put rides
        the DMA engines while the NEXT groups' compute occupies the
        cores; per-device program order keeps the gather ahead of the
        following group's donated-buffer reuse.  Analog of the
        reference's per-layer put() inside the attention forward
        (flash_attn.py:82-86, worker.py:318-331)."""
        hidden = self._seg_embed_fn(self.params, ibuf_dev, lora,
                                    batch=batch, t_pad=t_pad)
        for layer_start, num_layers in plan:
            hidden, kv_caches = self._seg_layers_fn(
                self.params, kv_caches, hidden, ibuf_dev, lora,
                layer_start=layer_start, num_layers=num_layers,
                batch=batch, t_pad=t_pad, prefix_pages=prefix_pages)
            if kv_stream is not None:
                kv_stream.push(layer_start, num_layers, kv_caches)
        out, prompt_lp = self._seg_tail_fn(
            self.params, hidden, ibuf_dev, fbuf_dev, lora,
            needs_filtering=needs_filtering, max_logprobs=max_logprobs,
            batch=batch, t_pad=t_pad, prefix_pages=prefix_pages,
            s_pad=s_pad, lp=lp, lo=lo,
            return_prompt_logprobs=want_prompt_lp)
        return out, prompt_lp, kv_caches

    def _sync_draft_caches(self, ibuf_dev, is_prompt, batch, t_pad,
                           prefix_pages, pages) -> None:
        """Speculative decoding: keep the draft model's KV in lockstep
        with the target (the already-uploaded ibuf is reused, so this
        costs one dispatch and no extra transport).  Prefill ingests the
        prompt; a window-ineligible decode step writes the committed
        token — skipping either leaves holes the next speculative window
        proposes against."""
        if self.draft_model is None:
            return
        if is_prompt:
            self.draft_caches = self._draft_prefill_fn(
                self.draft_params, self.draft_caches, ibuf_dev,
                batch=batch, t_pad=t_pad, prefix_pages=prefix_pages)
        else:
            self.draft_caches = self._draft_decode_fn(
                self.draft_params, self.draft_caches, ibuf_dev,
                batch=batch, pages=pages)

    def execute_mixed(self, prompt_meta, decode_meta, kv_caches,
                      num_decode_steps: int = 1):
        """One mixed engine step (--mixed-batch): dispatch the decode
        window FIRST, then the prompt(-chunk) batch, and only then fetch
        — the decode fetch's transport rides under the prefill compute,
        and the device never idles between the halves.  A prompt half
        whose rows are ALL mid-chunk (no sampled token or prompt
        logprobs can be consumed) skips its fetch entirely: the engine
        discards mid-chunk outputs anyway (llm_engine
        _process_model_outputs), so the sampler output stays an unread
        device array.

        Returns (prompt_output, decode_output, kv_caches)."""
        decode_thunk = prompt_thunk = None
        if decode_meta:
            decode_thunk, kv_caches = self.execute_model(
                decode_meta, kv_caches, num_decode_steps, defer=True)
        skip_prompt_fetch = False
        if prompt_meta:
            prompt_thunk, kv_caches = self.execute_model(
                prompt_meta, kv_caches, defer=True)
            skip_prompt_fetch = all(
                getattr(md, "prefill_end", None) is not None
                and md.prefill_end < next(
                    iter(md.seq_data.values())).num_tokens
                for md in prompt_meta)
        decode_out = decode_thunk() if decode_thunk is not None else []
        if prompt_thunk is None:
            prompt_out = []
        elif skip_prompt_fetch:
            prompt_out = [None] * len(prompt_meta)
        else:
            prompt_out = prompt_thunk()
        return prompt_out, decode_out, kv_caches

    @staticmethod
    def _window_key(seq_group_metadata_list):
        """Row-composition key of a decode window: chained dispatch is
        valid only when the next window's rows are EXACTLY the previous
        window's (same sequences, same order) — then the device-resident
        carry tokens line up row-for-row."""
        return tuple(sid for md in seq_group_metadata_list
                     for sid in sorted(md.seq_data))

    def window_chainable(self, seq_group_metadata_list) -> bool:
        """True iff a multi-step window over these groups can consume
        the PREVIOUS window's device-side token carry (the engine's
        pipelined step gates on this before deferring the fetch)."""
        if self._window_carry is None:
            return False
        _, key, batch = self._window_carry
        return (key == self._window_key(seq_group_metadata_list)
                and batch == _bucket(len(key), self.DECODE_BATCH_BUCKETS))

    def _execute_multi_decode(self, seq_group_metadata_list, kv_caches,
                              num_steps: int, defer: bool = False):
        """Run a fused K-step decode window; returns (list of per-step
        SamplerOutputs, caches).  The scheduler guarantees eligibility
        (single-seq groups, no beam/penalties/processors/LoRA) and has
        reserved the lookahead KV pages.  All metadata ships as two
        packed buffers — one i32, one f32 — so the window costs exactly
        two uploads and one fetch on the transport.

        When the previous dispatch was a window over the SAME rows, the
        step chains: first tokens come from the previous window's
        device-side carry (the host ibuf's token slots hold engine
        placeholders), so the dispatch needs NO output from the previous
        fetch — the engine overlaps this window's device time with the
        previous window's transport + host processing."""
        input_ids, _, metadata, _ = self._prepare_decode(
            seq_group_metadata_list, as_numpy=True)
        (tensors, seeds0, sample_indices, needs_filtering, max_logprobs,
         plan) = self._prepare_sample(seq_group_metadata_list, False,
                                      as_numpy=True)
        seeds = self._multi_step_seeds(plan, seeds0, num_steps)

        batch = input_ids.shape[0]
        pages = metadata.block_tables.shape[1]
        s_pad = sample_indices.shape[0]
        ibuf, fbuf = self._pack_decode_window_bufs(
            input_ids, metadata, sample_indices, tensors, seeds)
        use_carry = self.window_chainable(seq_group_metadata_list)
        carry = (self._window_carry[0] if use_carry
                 else jnp.zeros((batch, ), jnp.int32))
        outs, last_tokens, kv_caches = self._multi_step_fn(
            self.params, kv_caches, jnp.asarray(ibuf), jnp.asarray(fbuf),
            carry, num_steps=num_steps, batch=batch, pages=pages,
            s_pad=s_pad, needs_filtering=needs_filtering,
            max_logprobs=max_logprobs, use_carry=use_carry)
        self._window_carry = (last_tokens,
                              self._window_key(seq_group_metadata_list),
                              batch)
        self.dispatch_stats["chained_windows" if use_carry
                            else "unchained_windows"] += 1

        def finish():
            arrs = _unpack_sampler_output(outs, max_logprobs)  # [K, S, .]
            return [
                self._process_sampler_output(
                    SamplerOutputArrays(arrs.sampled_tokens[k],
                                        arrs.sampled_logprobs[k],
                                        arrs.topk_logprobs[k],
                                        arrs.topk_token_ids[k]), plan)
                for k in range(num_steps)
            ]

        return (finish if defer else finish()), kv_caches

    def _multi_step_seeds(self, plan, seeds0: np.ndarray,
                          num_steps: int) -> np.ndarray:
        """[K, rows] per-step sampling seeds.  Step 0 reuses the seeds
        built by _prepare_sample; later steps advance the same stateless
        per-(seed, step) stream, so a seeded request reproduces the
        identical token sequence regardless of the window size."""
        seeds = np.zeros((num_steps, seeds0.shape[0]), dtype=np.uint32)
        seeds[0] = seeds0
        for k in range(1, num_steps):
            for md, row_ids, parent_ids in plan:
                sp = md.sampling_params
                for row, parent in zip(row_ids, parent_ids):
                    base = md.seq_data[parent].output_len
                    if sp.seed is not None:
                        seeds[k, row] = _mix_seed(sp.seed, base + k, 0)
                    else:
                        seeds[k, row] = int(self._rng.randint(0, 2**31))
        return seeds

    def _prepare_lora(self, seq_group_metadata_list, padded_batch):
        """Build the per-step LoRA pytree: stacked adapter tensors + one
        slot index per (padded) model row.  None when LoRA is off or no
        scheduled group uses an adapter."""
        if self.lora_manager is None:
            return None
        requests = [getattr(md, "lora_request", None)
                    for md in seq_group_metadata_list]
        if not any(requests):
            return None
        mapping = self.lora_manager.set_active_loras(requests)
        idx = np.zeros((padded_batch, ), dtype=np.int32)
        row = 0
        is_prompt = seq_group_metadata_list[0].is_prompt
        for md in seq_group_metadata_list:
            lora_id = md.lora_request.lora_int_id if md.lora_request else 0
            n_rows = 1 if is_prompt else len(md.seq_data)
            for _ in range(n_rows):
                idx[row] = mapping.get(lora_id, 0)
                row += 1
        lora = dict(self.lora_manager.stacks)
        lora["idx"] = jnp.asarray(idx)
        return lora

    def _execute_with_host_processors(self, seq_group_metadata_list,
                                      kv_caches, is_prompt, tensors, seeds,
                                      sample_indices, needs_filtering,
                                      max_logprobs, plan, inputs,
                                      lora=None, want_prompt_lp=False):
        """Slow path for guided decoding: raw logits come to the host,
        per-row logits processors mutate them, sampling goes back through
        the jitted sampler.  One extra device<->host round trip per step
        for the affected batch only."""
        input_ids, positions, metadata = inputs
        logits, prompt_lp, kv_caches = self._logits_fn(
            self.params, jnp.asarray(input_ids), jnp.asarray(positions),
            kv_caches, metadata, jnp.asarray(sample_indices), lora,
            is_prefill=is_prompt, return_prompt_logprobs=want_prompt_lp,
            max_logprobs=max_logprobs)
        logits_np = np.asarray(logits).copy()

        for md, row_ids, parent_ids in plan:
            procs = md.sampling_params.logits_processors
            for r, parent in zip(row_ids, parent_ids):
                if procs:
                    out_tokens = md.seq_data[parent].output_token_ids
                    for proc in procs:
                        logits_np[r] = np.asarray(
                            proc(out_tokens, logits_np[r]))

        out = self._sample_fn(jnp.asarray(logits_np), tensors,
                              jnp.asarray(seeds),
                              needs_filtering=needs_filtering,
                              max_logprobs=max_logprobs)
        sampler_output = self._process_sampler_output(
            _unpack_sampler_output(out, max_logprobs), plan)
        if prompt_lp is not None:
            self._attach_prompt_logprobs(sampler_output, prompt_lp,
                                         max_logprobs, plan,
                                         seq_group_metadata_list)
        return sampler_output, kv_caches

    def _attach_prompt_logprobs(self, sampler_output, prompt_lp,
                                max_logprobs, plan,
                                seq_group_metadata_list) -> None:
        # Packed [B, T, 1+2L] (see the step fn): chosen | topk_lp | topk_id.
        arr = np.asarray(prompt_lp)
        chosen_lp = arr[..., 0]
        topk_lp = arr[..., 1:1 + max_logprobs]
        topk_ids = arr[..., 1 + max_logprobs:].astype(np.int32)
        for row, (group_out, md) in enumerate(
                zip(sampler_output, seq_group_metadata_list)):
            num = md.sampling_params.prompt_logprobs
            if num is None:
                continue
            seq_id = next(iter(md.seq_data))
            token_ids = md.seq_data[seq_id].token_ids
            # The device buffer covers only the prefix-stripped SUFFIX
            # (prefill ran on token_ids[prefix_len:]); suffix logits row
            # j scores full-prompt token prefix_len + j + 1.  Tokens at
            # or inside the cached prefix have no computed logits and
            # report None (position 0 is None by OpenAI semantics).
            prefix_len = getattr(md, "prefix_len", 0) or 0
            none_head = min(prefix_len + 1, len(token_ids))
            result: List[Optional[Dict[int, Logprob]]] = [None] * none_head
            for i in range(none_head, len(token_ids)):
                tok = token_ids[i]
                j = i - prefix_len - 1
                entry: Dict[int, Logprob] = {
                    tok: Logprob(float(chosen_lp[row, j]))
                }
                for k in range(min(num, topk_lp.shape[-1])):
                    entry.setdefault(int(topk_ids[row, j, k]),
                                     Logprob(float(topk_lp[row, j, k])))
                result.append(entry)
            group_out.prompt_logprobs = result

    def _process_sampler_output(self, out: SamplerOutputArrays,
                                plan) -> SamplerOutput:
        sampled = np.asarray(out.sampled_tokens)
        sampled_lp = np.asarray(out.sampled_logprobs)
        topk_lp = np.asarray(out.topk_logprobs)
        topk_ids = np.asarray(out.topk_token_ids)

        results: SamplerOutput = []
        for md, row_ids, parent_ids in plan:
            sp = md.sampling_params
            samples: List[SequenceOutput] = []
            if sp.use_beam_search:
                # Beam expansion happens in the engine; emit the top
                # 2*best_of candidates of each parent row so the engine
                # can run its beam bookkeeping (reference sampler.py
                # _beam_search_sample).
                width = 2 * sp.best_of
                for row, parent in zip(row_ids, parent_ids):
                    for j in range(width):
                        tok = int(topk_ids[row, j])
                        lp = self._row_logprobs(sp, row, topk_lp, topk_ids,
                                                tok, float(topk_lp[row, j]))
                        samples.append(SequenceOutput(parent, tok, lp))
            else:
                for row, parent in zip(row_ids, parent_ids):
                    tok = int(sampled[row])
                    lp = self._row_logprobs(sp, row, topk_lp, topk_ids, tok,
                                            float(sampled_lp[row]))
                    samples.append(SequenceOutput(parent, tok, lp))
            results.append(SequenceGroupOutput(samples, None))
        return results

    def _row_logprobs(self, sp: SamplingParams, row: int,
                      topk_lp: np.ndarray, topk_ids: np.ndarray,
                      sampled_token: int,
                      sampled_logprob: float) -> Dict[int, Logprob]:
        logprobs: Dict[int, Logprob] = {
            sampled_token: Logprob(sampled_logprob)
        }
        num = sp.logprobs or 0
        for j in range(min(num, topk_lp.shape[1])):
            logprobs.setdefault(int(topk_ids[row, j]),
                                Logprob(float(topk_lp[row, j])))
        return logprobs

    # ---- warmup / profiling ----

    @staticmethod
    def _num_device_pages(kv_caches) -> int:
        """LOGICAL page count of the live cache, for any layout: stacked
        ``(k_all, v_all)`` of ``[L, pages, kvh, ps, hd]``, fused
        ``(kv_all, None)`` of ``[L, 2*pages, ...]``, or a per-layer list
        of ``(k, v)`` pairs of ``[pages, kvh, ps, hd]``."""
        first = kv_caches[0]
        if hasattr(first, "ndim") and first.ndim == 5:
            phys = first.shape[1]
            return phys // 2 if kv_caches[1] is None else phys
        return first[0].shape[0]

    def warm_up(self, kv_caches, decode: bool = True,
                prefill: bool = True):
        """Eagerly compile the serving-critical bucket programs (analog of
        the reference's CUDA-graph capture over ``_BATCH_SIZES_TO_CAPTURE``,
        model_runner.py:700-779).

        Without this, each new (batch-bucket, len-bucket) shape compiles
        lazily mid-traffic — a multi-second (on some transports,
        multi-minute) stall for the request that trips it.  Covers the
        greedy decode buckets up to the scheduler's max batch, plus the
        homogeneous prefill batches that fit the token budget.  Dummy
        tokens write garbage into low-numbered KV pages, which is fine
        before any real traffic.  Returns the (donated-through) caches.
        """
        from vllm_splitwise_tpu.sequence import SequenceData

        if getattr(self.scheduler_config, "warmup_mode",
                   "diagonal") == "off":
            return kv_caches
        self._in_warmup = True
        try:
            return self._warm_up(kv_caches, SequenceData, decode=decode,
                                 prefill=prefill)
        finally:
            self._in_warmup = False
            # Warmup windows use dummy seq ids that can collide with real
            # traffic's row keys — their carry must never chain.
            self._window_carry = None

    def _warm_up(self, kv_caches, SequenceData, decode: bool = True,
                 prefill: bool = True):
        sp = SamplingParams(temperature=0.0)
        max_seqs = self.scheduler_config.max_num_seqs
        budget = self.scheduler_config.max_num_batched_tokens

        top = _bucket(max_seqs, self.DECODE_BATCH_BUCKETS)
        for b in ([x for x in self.DECODE_BATCH_BUCKETS if x <= top]
                  if decode else []):
            mds = []
            for i in range(b):
                data = SequenceData([1])
                data.append_token(1, 0.0)
                mds.append(
                    SequenceGroupMetadata(
                        request_id=f"warmup-d{b}-{i}",
                        is_prompt=False,
                        seq_data={0: data},
                        sampling_params=sp,
                        block_tables={0: [0]},
                    ))
            t0 = time.time()
            _, kv_caches = self.execute_model(mds, kv_caches)
            logger.info("warmup: decode bucket b=%d ready (%.1fs)", b,
                        time.time() - t0)
            num_steps = self.scheduler_config.num_decode_steps
            if num_steps > 1:
                pages = [0] * cdiv(num_steps + 1, self.block_size)
                for md in mds:
                    md.block_tables = {0: pages}
                # The scheduler quantizes shrunk windows (max_tokens /
                # context-end clamps) to powers of two — warm that exact
                # ladder so no window length compiles mid-traffic.
                ladder = [k for k in (2, 4, 8, 16, 32, 64)
                          if k < num_steps] + [num_steps]
                for k in ladder:
                    t0 = time.time()
                    _, kv_caches = self.execute_model(
                        mds, kv_caches, num_decode_steps=k)
                    logger.info(
                        "warmup: multi-step decode bucket b=%d k=%d "
                        "ready (%.1fs)", b, k, time.time() - t0)

        seen = set()
        for b, plen in (self._warmup_prefill_grid(max_seqs, budget)
                        if prefill else ()):
            key = (b, _bucket(plen, self.PREFILL_LEN_BUCKETS))
            if key in seen:
                continue
            seen.add(key)
            num_pages = self._num_device_pages(kv_caches)
            pages = [p % num_pages
                     for p in range(cdiv(plen, self.block_size))]
            mds = [
                SequenceGroupMetadata(
                    request_id=f"warmup-p{b}-{i}",
                    is_prompt=True,
                    seq_data={0: SequenceData([1] * plen)},
                    sampling_params=sp,
                    block_tables={0: pages},
                ) for i in range(b)
            ]
            t0 = time.time()
            _, kv_caches = self.execute_model(mds, kv_caches)
            logger.info("warmup: prefill bucket b=%d t=%d ready (%.1fs)",
                        b, plen, time.time() - t0)

        # Chunked-prefill continuation programs: the dispatch shape is
        # (batch bucket, prefix-page bucket) at the fixed chunk length —
        # warm every combo a served prompt can reach.  A combo whose
        # prefix-attention scores exceed HBM is skipped with a warning
        # (live traffic reaching it would OOM identically — the chunk/
        # max_model_len config should be adjusted).
        chunk = getattr(self.scheduler_config, "chunked_prefill_tokens",
                        0)
        if chunk and chunk < self.max_model_len and prefill:
            prompt_cap = getattr(self.scheduler_config,
                                 "max_num_prompt_seqs", 0) or max_seqs
            max_prefix_pages = _bucket(
                cdiv(self.max_model_len, self.block_size),
                self.PREFIX_PAGE_BUCKETS)
            for b in self.PREFILL_BATCH_BUCKETS:
                if b > min(max_seqs,
                           _bucket(prompt_cap,
                                   self.PREFILL_BATCH_BUCKETS)):
                    break
                for pb in self.PREFIX_PAGE_BUCKETS:
                    if pb > max_prefix_pages:
                        break
                    prefix = pb * self.block_size
                    plen = min(prefix + chunk, self.max_model_len)
                    if plen <= prefix:
                        break
                    num_pages = self._num_device_pages(kv_caches)
                    pages = [p % num_pages
                             for p in range(cdiv(plen, self.block_size))]
                    mds = [
                        SequenceGroupMetadata(
                            request_id=f"warmup-c{b}-{pb}-{i}",
                            is_prompt=True,
                            seq_data={0: SequenceData([1] * plen)},
                            sampling_params=sp,
                            block_tables={0: pages},
                            prefix_len=prefix,
                            prefill_end=plen,
                        ) for i in range(b)
                    ]
                    t0 = time.time()
                    try:
                        _, kv_caches = self.execute_model(mds, kv_caches)
                    except Exception as exc:  # noqa: BLE001 - OOM combos
                        logger.warning(
                            "warmup: chunked-continuation b=%d "
                            "prefix_pages=%d does not fit (%s) — traffic "
                            "hitting this shape will fail; lower "
                            "--chunked-prefill-tokens or "
                            "--max-num-prompt-seqs", b, pb,
                            type(exc).__name__)
                        continue
                    logger.info(
                        "warmup: chunked-continuation b=%d "
                        "prefix_pages=%d ready (%.1fs)", b, pb,
                        time.time() - t0)
        return kv_caches

    def _warmup_prefill_grid(self, max_seqs: int, budget: int):
        """(batch, prompt_len) combos to pre-compile.

        "diagonal" (default): one length per batch bucket — the largest
        that fits the token budget.  "full": every (batch bucket, length
        bucket) the scheduler can legally produce (a batch of b prompts
        with max raw length L costs b*L <= budget; the padded bucket is
        feasible iff some L in its range fits) — serving traffic hits
        arbitrary combos, and one uncovered combo compiling mid-traffic
        stalls the engine for minutes on remote-compile transports (the
        r3 serving collapse: p50 TTFT 79 s at 0.25 req/s)."""
        mode = getattr(self.scheduler_config, "warmup_mode", "diagonal")
        if mode == "off":
            return
        chunk = getattr(self.scheduler_config, "chunked_prefill_tokens",
                        0)
        # With chunked prefill no prompt dispatch exceeds the chunk.
        len_cap = min(self.max_model_len, chunk) if chunk \
            else self.max_model_len
        prompt_cap = getattr(self.scheduler_config,
                             "max_num_prompt_seqs", 0) or max_seqs
        for b in self.PREFILL_BATCH_BUCKETS:
            if b > min(max_seqs, _bucket(prompt_cap,
                                         self.PREFILL_BATCH_BUCKETS)):
                break
            if mode == "full":
                for t in self.PREFILL_LEN_BUCKETS:
                    if t > len_cap:
                        break
                    prev = ([x for x in self.PREFILL_LEN_BUCKETS
                             if x < t] or [0])[-1]
                    # Feasible iff SOME raw batch padding up to bucket b
                    # and SOME raw length padding up to bucket t fit the
                    # budget — the scheduler admits raw counts/lengths,
                    # not buckets, so the minimum raw pair is
                    # (prev_batch_bucket+1, prev_len_bucket+1).  Keying
                    # on b*(prev_len+1) missed shapes like (16, 512):
                    # 9 prompts x 455 tokens (4095 <= 4096) pads there
                    # and would compile mid-traffic.
                    prev_b = ([x for x in self.PREFILL_BATCH_BUCKETS
                               if x < b] or [0])[-1]
                    if (prev_b + 1) * (prev + 1) <= budget:
                        yield b, min(t, len_cap)
            else:
                t = _bucket(min(len_cap, max(budget // b, 16)),
                            self.PREFILL_LEN_BUCKETS)
                yield b, min(t, len_cap)

    def profile_run(self, kv_caches):
        """Run a max-shape dummy prefill to bound live compute memory
        (analog of the reference's profile_run, model_runner.py:620).
        Returns the (donated-through) caches."""
        max_tokens = self.scheduler_config.max_num_batched_tokens
        t = _bucket(min(max_tokens, self.max_model_len),
                    self.PREFILL_LEN_BUCKETS)
        sp = SamplingParams(temperature=0.0)
        from vllm_splitwise_tpu.sequence import SequenceData
        data = SequenceData([1] * t)
        num_pages = self._num_device_pages(kv_caches)
        pages = [i % num_pages for i in range(cdiv(t, self.block_size))]
        md = SequenceGroupMetadata(
            request_id="profile",
            is_prompt=True,
            seq_data={0: data},
            sampling_params=sp,
            block_tables={0: pages},
        )
        _, kv_caches = self.execute_model([md], kv_caches)
        return kv_caches
