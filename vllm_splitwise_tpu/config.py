"""Engine configuration objects.

Role-parity with the reference's ``vllm/config.py`` (ModelConfig,
CacheConfig, ParallelConfig, SchedulerConfig, DeviceConfig, LoRAConfig with
cross-validation; ``ParallelConfig.sep_prompt_token`` doubling the worker
fleet, reference vllm/config.py:414-438), re-designed for a JAX/TPU
single-controller runtime: parallelism is expressed as a device mesh
(tensor axis, optional prefill/decode stage split) instead of NCCL ranks.
"""
from __future__ import annotations

import os
from typing import Optional, Union

import jax.numpy as jnp

from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.transformers_utils.config import get_hf_config

logger = init_logger(__name__)

_GiB = 1 << 30


class ModelConfig:
    """Model + checkpoint configuration.

    Args mirror the reference surface (vllm/config.py:21): model path/HF id,
    tokenizer, load format, dtype, seed, revision, max_model_len,
    quantization, enforce_eager.  ``dtype='auto'`` resolves to bfloat16 —
    the TPU-native compute dtype — rather than float16.
    """

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        tokenizer_mode: str = "auto",
        trust_remote_code: bool = False,
        download_dir: Optional[str] = None,
        load_format: str = "auto",
        dtype: Union[str, jnp.dtype] = "auto",
        seed: int = 0,
        revision: Optional[str] = None,
        code_revision: Optional[str] = None,
        tokenizer_revision: Optional[str] = None,
        max_model_len: Optional[int] = None,
        quantization: Optional[str] = None,
        enforce_eager: bool = False,
        max_context_len_to_capture: Optional[int] = None,
        max_logprobs: int = 5,
        hf_config=None,
        quantize_lm_head: Optional[str] = None,
    ) -> None:
        # Weight-only LM-head quantization ("int8"): per-channel W8A16
        # with f32 accumulate — halves the head's HBM bytes (~3% of a 7B
        # decode step).  GPTQ/AWQ checkpoints keep the head in fp16, so
        # this is applied at load time (no-op for tied embeddings).
        if quantize_lm_head not in (None, "int8"):
            raise ValueError(
                f"quantize_lm_head must be None or 'int8', "
                f"got {quantize_lm_head!r}")
        self.quantize_lm_head = quantize_lm_head
        self.model = model
        self.tokenizer = tokenizer if tokenizer is not None else model
        self.tokenizer_mode = tokenizer_mode
        self.trust_remote_code = trust_remote_code
        self.download_dir = download_dir
        self.load_format = load_format
        self.seed = seed
        self.revision = revision
        self.code_revision = code_revision
        self.tokenizer_revision = tokenizer_revision
        self.quantization = quantization
        self.enforce_eager = enforce_eager
        self.max_context_len_to_capture = max_context_len_to_capture
        # Cap on per-request logprobs (OpenAI default; reference
        # config.py:85,100).
        self.max_logprobs = max_logprobs

        self.hf_config = hf_config if hf_config is not None else get_hf_config(
            model, trust_remote_code=trust_remote_code, revision=revision,
            code_revision=code_revision)
        self.dtype = _get_and_verify_dtype(self.hf_config, dtype)
        self.max_model_len = _get_and_verify_max_len(self.hf_config,
                                                     max_model_len)
        self._verify_load_format()
        self._verify_tokenizer_mode()
        self._verify_quantization()

    def _verify_load_format(self) -> None:
        load_format = self.load_format.lower()
        if load_format not in ("auto", "pt", "safetensors", "npcache", "dummy"):
            raise ValueError(
                f"Unknown load format: {self.load_format}. Must be one of "
                "'auto', 'pt', 'safetensors', 'npcache', or 'dummy'.")
        self.load_format = load_format

    def _verify_tokenizer_mode(self) -> None:
        tokenizer_mode = self.tokenizer_mode.lower()
        if tokenizer_mode not in ("auto", "slow"):
            raise ValueError(
                f"Unknown tokenizer mode: {self.tokenizer_mode}. Must be "
                "either 'auto' or 'slow'.")
        self.tokenizer_mode = tokenizer_mode

    def _verify_quantization(self) -> None:
        supported = ("gptq", "awq", "squeezellm", "marlin", "int8")
        if self.quantization is not None:
            self.quantization = self.quantization.lower()
        hf_quant_config = getattr(self.hf_config, "quantization_config", None)
        if hf_quant_config is not None:
            hf_quant_method = str(hf_quant_config.get("quant_method",
                                                      "")).lower()
            if self.quantization is None:
                self.quantization = hf_quant_method
            elif self.quantization != hf_quant_method:
                raise ValueError(
                    "Quantization method specified in the model config "
                    f"({hf_quant_method}) does not match the quantization "
                    f"method specified in the `quantization` argument "
                    f"({self.quantization}).")
        if self.quantization is not None and self.quantization not in supported:
            raise ValueError(
                f"Unknown quantization method: {self.quantization}. Must "
                f"be one of {supported}.")

    def verify_with_parallel_config(self,
                                    parallel_config: "ParallelConfig") -> None:
        total_num_attention_heads = self.hf_config.num_attention_heads
        tp = parallel_config.tensor_parallel_size
        if total_num_attention_heads % tp != 0:
            raise ValueError(
                f"Total number of attention heads ({total_num_attention_heads}) "
                f"must be divisible by tensor parallel size ({tp}).")
        total_num_hidden_layers = self.hf_config.num_hidden_layers
        pp = parallel_config.pipeline_parallel_size
        if total_num_hidden_layers % pp != 0:
            raise ValueError(
                f"Total number of hidden layers ({total_num_hidden_layers}) "
                f"must be divisible by pipeline parallel size ({pp}).")

    def get_sliding_window(self) -> Optional[int]:
        return getattr(self.hf_config, "sliding_window", None)

    def get_vocab_size(self) -> int:
        return self.hf_config.vocab_size

    def get_hidden_size(self) -> int:
        return self.hf_config.hidden_size

    def get_head_size(self) -> int:
        if hasattr(self.hf_config, "head_dim") and self.hf_config.head_dim:
            return self.hf_config.head_dim
        return self.hf_config.hidden_size // self.hf_config.num_attention_heads

    def get_total_num_kv_heads(self) -> int:
        """Number of KV heads before tensor-parallel sharding."""
        # Falcon-style flags.
        falcon_new_decoder_arch = getattr(self.hf_config, "new_decoder_architecture",
                                          False)
        if falcon_new_decoder_arch:
            return self.hf_config.num_kv_heads
        if getattr(self.hf_config, "multi_query", False):
            return 1
        for attr in ("n_head_kv", "num_kv_heads", "num_key_value_heads",
                     "multi_query_group_num"):
            v = getattr(self.hf_config, attr, None)
            if v is not None:
                return v
        attn_config = getattr(self.hf_config, "attn_config", None)
        if attn_config is not None:
            v = attn_config.get("kv_n_heads", None)
            if v is not None:
                return v
        return self.hf_config.num_attention_heads

    def get_num_kv_heads(self, parallel_config: "ParallelConfig") -> int:
        """KV heads per tensor-parallel shard (at least 1 — heads may be
        replicated when TP exceeds the KV head count)."""
        total = self.get_total_num_kv_heads()
        return max(1, total // parallel_config.tensor_parallel_size)

    def get_num_attention_heads(self,
                                parallel_config: "ParallelConfig") -> int:
        return (self.hf_config.num_attention_heads //
                parallel_config.tensor_parallel_size)

    def get_num_layers(self, parallel_config: "ParallelConfig") -> int:
        return (self.hf_config.num_hidden_layers //
                parallel_config.pipeline_parallel_size)


class CacheConfig:
    """Paged KV-cache configuration.

    Role-parity with reference vllm/config.py:303. ``block_size`` is the
    page length in tokens; the TPU default of 16 matches the bf16 minimum
    tile (16 sublanes x 128 lanes) so one page of one KV head is exactly
    one tile.  ``hbm_utilization`` plays the role of
    ``gpu_memory_utilization``; ``swap_space`` is host memory for preempted
    sequences.
    """

    def __init__(
        self,
        block_size: int = 16,
        hbm_utilization: float = 0.90,
        swap_space: float = 4.0,
        cache_dtype: str = "auto",
        sliding_window: Optional[int] = None,
        kv_scale: Optional[float] = None,
        kv_layout: str = "split",
    ) -> None:
        self.block_size = block_size
        self.hbm_utilization = hbm_utilization
        self.swap_space_bytes = int(swap_space * _GiB)
        self.cache_dtype = cache_dtype
        self.sliding_window = sliding_window
        # "split": separate K and V page arrays (two attention DMAs per
        # logical page).  "fused": ONE interleaved array where logical
        # block b keeps K at physical page 2b and V at 2b+1, so decode
        # attention issues one DMA per logical page (the decode kernel is
        # DMA-issue-bound at serving batch sizes).  Fused requires a
        # stacked-KV-capable model (all flagship families).
        self.kv_layout = kv_layout
        # Quantized caches store x / kv_scale; attention multiplies back
        # on read.  Default: 1/16 for int8 (step 0.0625, range +-7.9 --
        # covers typical RMSNorm'd K/V with headroom), 1.0 for fp8
        # (e4m3/e5m2 dynamic range absorbs the magnitudes directly).
        if kv_scale is None:
            kv_scale = 1.0 / 16.0 if cache_dtype == "int8" else 1.0
        self.kv_scale = float(kv_scale)
        self._verify_args()
        self._verify_cache_dtype()

        # Set after memory profiling.
        self.num_device_blocks: Optional[int] = None
        self.num_host_blocks: Optional[int] = None

    # Back-compat aliases used in a few call sites / tests.
    @property
    def num_gpu_blocks(self) -> Optional[int]:
        return self.num_device_blocks

    @property
    def num_cpu_blocks(self) -> Optional[int]:
        return self.num_host_blocks

    def _verify_args(self) -> None:
        if not 0.0 < self.hbm_utilization <= 1.0:
            raise ValueError(
                f"HBM utilization must be in (0, 1], got {self.hbm_utilization}.")
        if self.block_size < 1:
            raise ValueError(f"block_size must be >= 1, got {self.block_size}")

    def _verify_cache_dtype(self) -> None:
        if self.kv_layout not in ("split", "fused"):
            raise ValueError(f"Unknown kv layout: {self.kv_layout}")
        if self.cache_dtype not in ("auto", "fp8_e5m2", "fp8_e4m3",
                                    "int8", "int4"):
            raise ValueError(f"Unknown kv cache dtype: {self.cache_dtype}")
        if self.cache_dtype != "auto":
            logger.info("Using %s KV cache. The model weights are not "
                        "quantized by this flag.", self.cache_dtype)

    def verify_with_parallel_config(self,
                                    parallel_config: "ParallelConfig") -> None:
        pass


class ParallelConfig:
    """Device-mesh parallelism configuration.

    The reference expresses parallelism as NCCL rank groups
    (vllm/config.py:387-471); here it is a JAX mesh: a ``model`` axis of
    size ``tensor_parallel_size`` (optionally times a ``pipe`` axis), and —
    under ``sep_prompt_token`` — TWO meshes of that shape, one for the
    prefill pool and one for the decode pool (doubling the chip count,
    matching the reference's 2x world size at vllm/config.py:434-438).
    """

    def __init__(
        self,
        pipeline_parallel_size: int = 1,
        tensor_parallel_size: int = 1,
        sep_prompt_token: bool = False,
        worker_use_ray: bool = False,  # accepted for CLI parity; unused
        max_parallel_loading_workers: Optional[int] = None,
        disable_custom_all_reduce: bool = True,
        ray_workers_use_nsight: bool = False,
        num_prefill_hosts: int = 1,
        kv_stream_segments: int = 4,
    ) -> None:
        self.pipeline_parallel_size = pipeline_parallel_size
        self.tensor_parallel_size = tensor_parallel_size
        self.sep_prompt_token = sep_prompt_token
        self.worker_use_ray = worker_use_ray
        self.max_parallel_loading_workers = max_parallel_loading_workers
        self.disable_custom_all_reduce = disable_custom_all_reduce
        self.ray_workers_use_nsight = ray_workers_use_nsight
        # Splitwise prefill runs as this many layer-group segments so each
        # group's freshly written KV pages stream to the decode pool while
        # the remaining groups compute (the reference's per-layer put(),
        # flash_attn.py:82-86, at layer-group granularity).  <=1 disables
        # streaming (one bulk migration after the prefill).
        self.kv_stream_segments = kv_stream_segments
        # Multi-host disaggregation: processes [0, num_prefill_hosts)
        # of the jax.distributed cluster form the prefill pool
        # (executor/multihost_splitwise.py).  Only meaningful when the
        # process count exceeds 1.
        self.num_prefill_hosts = num_prefill_hosts

        # Chips per pool; total chip requirement doubles with the
        # prefill/decode split.
        self.world_size = pipeline_parallel_size * tensor_parallel_size
        if sep_prompt_token:
            self.num_prefill_workers = self.world_size
            self.num_decode_workers = self.world_size
            self.world_size *= 2
        else:
            self.num_prefill_workers = 0
            self.num_decode_workers = 0
        self._verify_args()

    def _verify_args(self) -> None:
        if self.pipeline_parallel_size > 1:
            raise NotImplementedError(
                "Pipeline parallelism is not supported yet.")


class SchedulerConfig:
    """Continuous-batching budgets (reference vllm/config.py:474).

    ``max_num_batched_tokens``: per-step token budget (prefill chunking
    bound).  ``max_num_seqs``: max sequences per decode step.
    ``max_paddings``: bound on wasted pad tokens in a prompt batch.
    """

    def __init__(
        self,
        max_num_batched_tokens: Optional[int] = None,
        max_num_seqs: int = 256,
        max_model_len: int = 2048,
        max_paddings: int = 256,
        num_decode_steps: int = 1,
        warmup_mode: str = "diagonal",
        max_num_prompt_seqs: int = 0,
        chunked_prefill_tokens: int = 0,
        decode_priority_steps: int = 0,
        mixed_batch: bool = False,
        pipeline_decode: bool = False,
    ) -> None:
        if max_num_batched_tokens is not None:
            self.max_num_batched_tokens = max_num_batched_tokens
        else:
            self.max_num_batched_tokens = max(max_model_len, 2048)
        self.max_num_seqs = max_num_seqs
        self.max_model_len = max_model_len
        self.max_paddings = max_paddings
        # TPU extension (no reference analog): decode steps fused into
        # one device dispatch (lax.scan window).  Each host<->device sync
        # over the axon transport costs ~30 ms; fusing K steps divides
        # that by K.  Batches with beam search / >1-seq groups / logits
        # processors / penalties fall back to 1 per step.
        self.num_decode_steps = num_decode_steps
        # Set when the window is a SPECULATIVE window (k+1): spec steps
        # return only top-1 logprobs, so logprobs-bearing requests must
        # degrade the window.
        self.spec_decode = False
        # Startup compile coverage (TPU): "diagonal" pre-compiles the
        # decode batch buckets plus one prefill length per prefill batch
        # bucket; "full" pre-compiles EVERY feasible (prefill batch,
        # padded length) bucket combo under the token budget — required
        # for latency-SLO serving, where a single uncovered bucket
        # compiling mid-traffic stalls the engine loop for minutes on
        # remote-compile transports (measured: the r3 serving collapse,
        # p50 TTFT 79 s).  "off" skips warmup entirely.
        self.warmup_mode = warmup_mode
        # Cap on sequences per PROMPT batch (0 = bounded only by the
        # token budget).  Every (prompt batch bucket, padded length
        # bucket) combo is a separate compiled program on TPU, so
        # capping this multiplicatively shrinks both the compile space
        # and "full" warmup time; prefill at these lengths is compute-
        # bound, so large prompt batches add little throughput.
        self.max_num_prompt_seqs = max_num_prompt_seqs
        # Chunked prefill (TPU extension, 0 = off): long prompts prefill
        # in fixed-size chunks via the prefix-attention path, so (a) a
        # long prompt can never stall the decode batch longer than one
        # chunk, and (b) prefill dispatches collapse onto one padded
        # length bucket.  Incompatible with sep_prompt_token (the
        # disaggregated prefill pool makes chunking moot — migration
        # streams layer groups instead).
        self.chunked_prefill_tokens = chunked_prefill_tokens
        # Decode-priority scheduling (0 = reference prompt-first): when
        # set, after a prompt run the scheduler requires this many
        # decode runs before admitting the next prompt batch (while
        # decodes are pending).  Under load, strict prompt-first lets a
        # steady prompt arrival stream starve the decode batch and
        # inflate TPOT; this bounds the prefill duty cycle at the cost
        # of a little queueing TTFT.
        self.decode_priority_steps = decode_priority_steps
        # Mixed prefill+decode stepping (TPU extension; single pool):
        # every engine step schedules BOTH the decode window and a
        # prompt(-chunk) batch, dispatched back-to-back on the device so
        # decode advances every step instead of stalling behind whole
        # prompt batches (the prompt-first p99-TPOT failure mode).  The
        # per-step decode stall is bounded by the prompt half's padded
        # size — pair with --chunked-prefill-tokens and
        # --max-num-prompt-seqs to bound it tightly.
        self.mixed_batch = mixed_batch
        # Pipelined decode windows (requires mixed_batch): dispatch the
        # next window with the previous window's DEVICE-side token carry
        # before its outputs are fetched, hiding all transport + host
        # time under device compute.  The engine appends placeholder
        # tokens for in-flight windows and reconciles at fetch.
        self.pipeline_decode = pipeline_decode
        self._verify_args()

    def _verify_args(self) -> None:
        if not 1 <= self.num_decode_steps <= 64:
            raise ValueError(
                f"num_decode_steps ({self.num_decode_steps}) must be in "
                "[1, 64].")
        if self.max_num_batched_tokens < self.max_model_len:
            raise ValueError(
                f"max_num_batched_tokens ({self.max_num_batched_tokens}) is "
                f"smaller than max_model_len ({self.max_model_len}). "
                "This effectively limits the maximum sequence length to "
                "max_num_batched_tokens and makes the scheduler reject "
                "longer sequences.")
        if self.max_num_batched_tokens < self.max_num_seqs:
            raise ValueError(
                f"max_num_batched_tokens ({self.max_num_batched_tokens}) must "
                f"be >= max_num_seqs ({self.max_num_seqs}).")
        if self.chunked_prefill_tokens < 0:
            raise ValueError("chunked_prefill_tokens must be >= 0 "
                             f"(got {self.chunked_prefill_tokens}).")


class SpeculativeConfig:
    """Speculative decoding (TPU extension — the reference ships
    vllm/spec_decode/ as scaffolding without an engine flag; here a
    fused draft-scan + multi-query-verify + rejection-sample step wires
    it end-to-end).

    ``draft_model_config``: the small proposer model; must share the
    target's tokenizer/vocab.  ``num_speculative_tokens``: draft tokens
    proposed per step (k); each accepted step emits 1..k+1 tokens.
    """

    def __init__(self, draft_model_config: "ModelConfig",
                 num_speculative_tokens: int) -> None:
        self.draft_model_config = draft_model_config
        self.num_speculative_tokens = num_speculative_tokens
        self._verify_args()

    def _verify_args(self) -> None:
        if not 1 <= self.num_speculative_tokens <= 16:
            raise ValueError(
                f"num_speculative_tokens ({self.num_speculative_tokens}) "
                "must be in [1, 16].")

    def verify_with_model_config(self, model_config: "ModelConfig") -> None:
        if (self.draft_model_config.get_vocab_size() !=
                model_config.get_vocab_size()):
            raise ValueError(
                "Speculative draft model must share the target model's "
                f"vocab (draft {self.draft_model_config.get_vocab_size()} "
                f"vs target {model_config.get_vocab_size()}).")


class DeviceConfig:

    def __init__(self, device: str = "auto") -> None:
        if device == "auto":
            device = _detect_device()
        self.device = device

    @property
    def is_tpu(self) -> bool:
        return self.device == "tpu"


class LoRAConfig:
    """Multi-LoRA serving limits (reference vllm/config.py:548)."""

    def __init__(
        self,
        max_lora_rank: int = 16,
        max_loras: int = 1,
        max_cpu_loras: Optional[int] = None,
        lora_dtype: Optional[Union[str, jnp.dtype]] = None,
        lora_extra_vocab_size: int = 256,
    ) -> None:
        self.max_lora_rank = max_lora_rank
        self.max_loras = max_loras
        self.max_cpu_loras = max_cpu_loras
        self.lora_dtype = lora_dtype
        self.lora_extra_vocab_size = lora_extra_vocab_size
        possible_ranks = (8, 16, 32, 64, 128, 256)
        if max_lora_rank not in possible_ranks:
            raise ValueError(f"max_lora_rank ({max_lora_rank}) must be one "
                             f"of {possible_ranks}.")
        possible_vocab = (256, 512)
        if lora_extra_vocab_size not in possible_vocab:
            raise ValueError(
                f"lora_extra_vocab_size ({lora_extra_vocab_size}) must be "
                f"one of {possible_vocab}.")
        if max_loras < 1:
            raise ValueError(f"max_loras ({max_loras}) must be >= 1.")
        if max_cpu_loras is None:
            self.max_cpu_loras = max_loras
        elif max_cpu_loras < max_loras:
            raise ValueError(f"max_cpu_loras ({max_cpu_loras}) must be >= "
                             f"max_loras ({max_loras})")

    def verify_with_model_config(self, model_config: ModelConfig) -> None:
        if self.lora_dtype in (None, "auto"):
            self.lora_dtype = model_config.dtype

    def verify_with_scheduler_config(
            self, scheduler_config: SchedulerConfig) -> None:
        pass


def _detect_device() -> str:
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return "cpu"
    try:
        import jax
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no devices at all
        return "cpu"
    if platform in ("tpu", "axon"):
        return "tpu"
    return platform


_STR_DTYPE_TO_JNP = {
    "half": jnp.float16,
    "float16": jnp.float16,
    "float": jnp.float32,
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
}


def _get_and_verify_dtype(hf_config, dtype: Union[str, jnp.dtype]) -> jnp.dtype:
    config_dtype = getattr(hf_config, "torch_dtype", None)
    config_dtype = str(config_dtype).replace("torch.", "") if config_dtype else "float32"
    if isinstance(dtype, str):
        dtype = dtype.lower()
        if dtype == "auto":
            # TPU-native default: bfloat16 regardless of checkpoint dtype
            # (the MXU computes bf16 natively; fp16 has no advantage here).
            return jnp.dtype(jnp.bfloat16)
        if dtype not in _STR_DTYPE_TO_JNP:
            raise ValueError(f"Unknown dtype: {dtype}")
        resolved = jnp.dtype(_STR_DTYPE_TO_JNP[dtype])
    else:
        resolved = jnp.dtype(dtype)
    if resolved == jnp.dtype(jnp.float16):
        logger.warning("float16 has no native TPU support; using it anyway "
                       "(consider bfloat16).")
    return resolved


def _get_and_verify_max_len(hf_config, max_model_len: Optional[int]) -> int:
    derived_max_len = float("inf")
    possible_keys = [
        "max_position_embeddings",
        "n_positions",
        "max_seq_len",
        "seq_length",
        "max_sequence_length",
        "max_seq_length",
        "seq_len",
        "model_max_length",
    ]
    for key in possible_keys:
        v = getattr(hf_config, key, None)
        if v is not None:
            derived_max_len = min(derived_max_len, v)
    if derived_max_len == float("inf"):
        if max_model_len is not None:
            return max_model_len
        default_max_len = 2048
        logger.warning(
            "The model's config.json does not contain any of the following "
            "keys to determine the original maximum length of the model: "
            "%s. Assuming the model's maximum length is %d.", possible_keys,
            default_max_len)
        derived_max_len = default_max_len

    rope_scaling = getattr(hf_config, "rope_scaling", None)
    if rope_scaling is not None:
        rope_type = rope_scaling.get("type",
                                     rope_scaling.get("rope_type", None))
        if rope_type != "su":
            scaling_factor = rope_scaling.get("factor", 1.0)
            if rope_type == "yarn":
                derived_max_len = rope_scaling.get(
                    "original_max_position_embeddings", derived_max_len)
            derived_max_len *= scaling_factor

    if max_model_len is None:
        return int(derived_max_len)
    if max_model_len > derived_max_len:
        raise ValueError(
            f"User-specified max_model_len ({max_model_len}) is greater "
            f"than the derived max_model_len ({derived_max_len}) from the "
            "model config. Increase rope scaling or lower max_model_len.")
    return int(max_model_len)
