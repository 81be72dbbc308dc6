"""CLI flag surface -> typed config objects.

Role-parity with the reference's ``vllm/engine/arg_utils.py`` (EngineArgs
dataclass :10, add_cli_args :57, create_engine_configs :297,
AsyncEngineArgs :345) including the fork's ``--sep-prompt-token`` flag
(arg_utils.py:27).  GPU-ism flags (worker_use_ray, block-swap streams …)
are accepted for CLI compatibility and ignored where meaningless on TPU.
"""
from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

from vllm_splitwise_tpu.config import (CacheConfig, DeviceConfig,
                                       LoRAConfig, ModelConfig,
                                       ParallelConfig, SchedulerConfig,
                                       SpeculativeConfig)


@dataclass
class EngineArgs:
    model: str
    tokenizer: Optional[str] = None
    tokenizer_mode: str = "auto"
    trust_remote_code: bool = False
    download_dir: Optional[str] = None
    load_format: str = "auto"
    dtype: str = "auto"
    kv_cache_dtype: str = "auto"
    kv_scale: 'Optional[float]' = None
    kv_layout: str = "split"
    max_logprobs: int = 5  # OpenAI default value
    seed: int = 0
    max_model_len: Optional[int] = None
    worker_use_ray: bool = False
    pipeline_parallel_size: int = 1
    tensor_parallel_size: int = 1
    sep_prompt_token: bool = False
    max_parallel_loading_workers: Optional[int] = None
    block_size: int = 16
    enable_prefix_caching: bool = False
    swap_space: float = 4.0  # GiB
    gpu_memory_utilization: float = 0.90  # alias kept for CLI parity
    num_gpu_blocks_override: Optional[int] = None
    max_num_batched_tokens: Optional[int] = None
    max_num_seqs: int = 256
    max_paddings: int = 256
    num_decode_steps: int = 1
    warmup_mode: str = "diagonal"
    max_num_prompt_seqs: int = 0
    chunked_prefill_tokens: int = 0
    decode_priority_steps: int = 0
    mixed_batch: bool = False
    pipeline_decode: bool = False
    speculative_model: Optional[str] = None
    num_speculative_tokens: int = 4
    speculative_model_quantization: Optional[str] = None
    disable_log_stats: bool = False
    revision: Optional[str] = None
    code_revision: Optional[str] = None
    tokenizer_revision: Optional[str] = None
    quantization: Optional[str] = None
    quantize_lm_head: Optional[str] = None
    enforce_eager: bool = False
    max_context_len_to_capture: int = 8192
    # Multi-host (jax.distributed) cluster membership.
    distributed_coordinator: 'Optional[str]' = None
    distributed_num_processes: int = 1
    distributed_process_id: int = 0
    cross_host_transfer_address: 'Optional[str]' = None
    num_prefill_hosts: int = 1
    kv_stream_segments: int = 4
    disable_custom_all_reduce: bool = True
    enable_lora: bool = False
    max_loras: int = 1
    max_lora_rank: int = 16
    lora_extra_vocab_size: int = 256
    lora_dtype: str = "auto"
    max_cpu_loras: Optional[int] = None
    device: str = "auto"

    def __post_init__(self):
        if self.tokenizer is None:
            self.tokenizer = self.model

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        parser.add_argument("--model", type=str,
                            default="facebook/opt-125m",
                            help="name or path of the HF model to use")
        parser.add_argument("--tokenizer", type=str,
                            default=EngineArgs.tokenizer)
        parser.add_argument("--tokenizer-mode", type=str,
                            default=EngineArgs.tokenizer_mode,
                            choices=["auto", "slow"])
        parser.add_argument("--revision", type=str, default=None)
        parser.add_argument("--code-revision", type=str, default=None)
        parser.add_argument("--tokenizer-revision", type=str, default=None)
        parser.add_argument("--trust-remote-code", action="store_true")
        parser.add_argument("--download-dir", type=str,
                            default=EngineArgs.download_dir)
        parser.add_argument("--load-format", type=str,
                            default=EngineArgs.load_format,
                            choices=["auto", "pt", "safetensors", "npcache",
                                     "dummy"])
        parser.add_argument("--dtype", type=str, default=EngineArgs.dtype,
                            choices=["auto", "half", "float16", "bfloat16",
                                     "float", "float32"])
        parser.add_argument("--kv-cache-dtype", type=str,
                            default=EngineArgs.kv_cache_dtype,
                            choices=["auto", "fp8_e5m2", "fp8_e4m3", "int8",
                                     "int4"])
        parser.add_argument("--kv-scale", type=float, default=None,
                            help="dequant scale for quantized KV caches "
                            "(default: 1/16 for int8, 1.0 for fp8)")
        parser.add_argument("--kv-layout", type=str,
                            default=EngineArgs.kv_layout,
                            choices=["split", "fused"],
                            help="KV page layout: split K/V arrays or one "
                            "interleaved fused array (one attention DMA "
                            "per logical page)")
        parser.add_argument("--max-logprobs", type=int,
                            default=EngineArgs.max_logprobs,
                            help="max number of log probs to return per "
                            "token")
        parser.add_argument("--ray-workers-use-nsight",
                            action="store_true",
                            help="accepted for CLI parity; profile with "
                            "jax.profiler traces on TPU instead")
        parser.add_argument("--max-model-len", type=int, default=None)
        parser.add_argument("--worker-use-ray", action="store_true",
                            help="accepted for CLI parity; unused on TPU")
        parser.add_argument("--pipeline-parallel-size", "-pp", type=int,
                            default=EngineArgs.pipeline_parallel_size)
        parser.add_argument("--tensor-parallel-size", "-tp", type=int,
                            default=EngineArgs.tensor_parallel_size)
        parser.add_argument("--sep-prompt-token", action="store_true",
                            help="disaggregate prefill and decode onto "
                            "separate device pools (Splitwise)")
        parser.add_argument("--distributed-coordinator", type=str,
                            default=None,
                            help="host:port of the jax.distributed "
                            "coordinator (multi-host serving)")
        parser.add_argument("--distributed-num-processes", type=int,
                            default=EngineArgs.distributed_num_processes)
        parser.add_argument("--distributed-process-id", type=int,
                            default=EngineArgs.distributed_process_id)
        parser.add_argument("--cross-host-transfer-address", type=str,
                            default=None,
                            help="host:port this process serves DCN "
                            "device transfers on (cross-host KV path)")
        parser.add_argument("--num-prefill-hosts", type=int,
                            default=EngineArgs.num_prefill_hosts,
                            help="processes [0,N) of the cluster form "
                            "the prefill pool under --sep-prompt-token")
        parser.add_argument("--kv-stream-segments", type=int,
                            default=EngineArgs.kv_stream_segments,
                            help="layer-group segments the Splitwise "
                            "prefill dispatches in, so each group's KV "
                            "pages stream to the decode pool while the "
                            "rest compute; <=1 = one bulk migration")
        parser.add_argument("--max-parallel-loading-workers", type=int,
                            default=None)
        parser.add_argument("--block-size", type=int,
                            default=EngineArgs.block_size,
                            choices=[8, 16, 32, 64, 128])
        parser.add_argument("--enable-prefix-caching", action="store_true")
        parser.add_argument("--seed", type=int, default=EngineArgs.seed)
        parser.add_argument("--swap-space", type=float,
                            default=EngineArgs.swap_space,
                            help="CPU swap space (GiB) per device")
        parser.add_argument("--gpu-memory-utilization", type=float,
                            default=EngineArgs.gpu_memory_utilization,
                            help="fraction of device HBM for weights+KV")
        parser.add_argument("--num-gpu-blocks-override", type=int,
                            default=None,
                            help="skip memory profiling and use this many "
                            "KV pages")
        parser.add_argument("--max-num-batched-tokens", type=int,
                            default=EngineArgs.max_num_batched_tokens)
        parser.add_argument("--max-num-seqs", type=int,
                            default=EngineArgs.max_num_seqs)
        parser.add_argument("--max-paddings", type=int,
                            default=EngineArgs.max_paddings)
        parser.add_argument("--speculative-model", type=str,
                            default=EngineArgs.speculative_model,
                            help="draft model for speculative decoding "
                            "(TPU extension: fused draft+verify step)")
        parser.add_argument("--num-speculative-tokens", type=int,
                            default=EngineArgs.num_speculative_tokens,
                            help="draft tokens proposed per spec step")
        parser.add_argument("--speculative-model-quantization", type=str,
                            default=None,
                            choices=["gptq", "awq", "squeezellm", "int8"],
                            help="quantization of the draft checkpoint")
        parser.add_argument("--num-decode-steps", type=int,
                            default=EngineArgs.num_decode_steps,
                            help="decode steps fused into one device "
                            "dispatch (TPU multi-step decode; amortizes "
                            "host<->device sync latency)")
        parser.add_argument("--max-num-prompt-seqs", type=int,
                            default=EngineArgs.max_num_prompt_seqs,
                            help="cap on sequences per prompt batch "
                            "(0 = token-budget bound); smaller caps "
                            "shrink the prefill compile space on TPU")
        parser.add_argument("--chunked-prefill-tokens", type=int,
                            default=EngineArgs.chunked_prefill_tokens,
                            help="prefill long prompts in chunks of this "
                            "many tokens (0 = whole-prompt prefill); "
                            "bounds how long a prompt can stall the "
                            "decode batch")
        parser.add_argument("--decode-priority-steps", type=int,
                            default=EngineArgs.decode_priority_steps,
                            help="require this many decode runs between "
                            "prompt runs while decodes are pending "
                            "(0 = prompt-first); bounds TPOT inflation "
                            "under prompt load")
        parser.add_argument("--mixed-batch", action="store_true",
                            help="schedule the decode window AND a "
                            "prompt(-chunk) batch every engine step, "
                            "dispatched back-to-back on the device, so "
                            "decode never skips a step behind prefill; "
                            "pair with --chunked-prefill-tokens and "
                            "--max-num-prompt-seqs to bound the "
                            "per-step stall")
        parser.add_argument("--pipeline-decode", action="store_true",
                            help="pipeline decode windows (needs "
                            "--mixed-batch): dispatch the next window "
                            "with the previous one's device-side token "
                            "carry before fetching its outputs, hiding "
                            "transport+host time under device compute")
        parser.add_argument("--warmup-mode", type=str,
                            choices=["diagonal", "full", "off"],
                            default=EngineArgs.warmup_mode,
                            help="startup compile coverage: 'full' "
                            "pre-compiles every feasible prefill "
                            "(batch, length) bucket so no shape "
                            "compiles mid-traffic (use for serving); "
                            "'diagonal' covers decode buckets + one "
                            "length per prefill batch bucket")
        parser.add_argument("--disable-log-stats", action="store_true")
        parser.add_argument("--quantization", "-q", type=str,
                            choices=["awq", "gptq", "squeezellm", "marlin",
                                     "int8", None],
                            default=EngineArgs.quantization)
        parser.add_argument("--quantize-lm-head", type=str,
                            choices=["int8", None], default=None,
                            help="weight-only LM-head quantization "
                            "(per-channel W8A16, f32 out); halves the "
                            "head's HBM bytes at decode")
        parser.add_argument("--enforce-eager", action="store_true")
        parser.add_argument("--max-context-len-to-capture", type=int,
                            default=EngineArgs.max_context_len_to_capture)
        parser.add_argument("--disable-custom-all-reduce",
                            action="store_true")
        parser.add_argument("--enable-lora", action="store_true")
        parser.add_argument("--max-loras", type=int,
                            default=EngineArgs.max_loras)
        parser.add_argument("--max-lora-rank", type=int,
                            default=EngineArgs.max_lora_rank)
        parser.add_argument("--lora-extra-vocab-size", type=int,
                            default=EngineArgs.lora_extra_vocab_size)
        parser.add_argument("--lora-dtype", type=str, default="auto",
                            choices=["auto", "float32", "bfloat16",
                                     "float16"])
        parser.add_argument("--max-cpu-loras", type=int, default=None)
        parser.add_argument("--device", type=str,
                            default=EngineArgs.device,
                            choices=["auto", "tpu", "cpu"])
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        attrs = [f.name for f in dataclasses.fields(cls)]
        return cls(**{a: getattr(args, a) for a in attrs if hasattr(args, a)})

    def create_engine_configs(
        self,
    ) -> Tuple[ModelConfig, CacheConfig, ParallelConfig, SchedulerConfig,
               DeviceConfig, Optional[LoRAConfig],
               Optional[SpeculativeConfig]]:
        if (self.distributed_coordinator
                and self.distributed_num_processes > 1):
            from vllm_splitwise_tpu.parallel.distributed import \
                init_distributed
            init_distributed(
                self.distributed_coordinator,
                self.distributed_num_processes,
                self.distributed_process_id,
                cross_host_transfer_address=self.cross_host_transfer_address)
        device_config = DeviceConfig(self.device)
        model_config = ModelConfig(
            self.model, self.tokenizer, self.tokenizer_mode,
            self.trust_remote_code, self.download_dir, self.load_format,
            self.dtype, self.seed, self.revision, self.code_revision,
            self.tokenizer_revision, self.max_model_len, self.quantization,
            self.enforce_eager, self.max_context_len_to_capture,
            self.max_logprobs,
            quantize_lm_head=self.quantize_lm_head)
        cache_config = CacheConfig(
            block_size=self.block_size,
            hbm_utilization=self.gpu_memory_utilization,
            swap_space=self.swap_space,
            cache_dtype=self.kv_cache_dtype,
            sliding_window=model_config.get_sliding_window(),
            kv_scale=self.kv_scale,
            kv_layout=self.kv_layout)
        cache_config.enable_prefix_caching = self.enable_prefix_caching
        if self.num_gpu_blocks_override is not None:
            cache_config.num_device_blocks = self.num_gpu_blocks_override
        parallel_config = ParallelConfig(
            self.pipeline_parallel_size, self.tensor_parallel_size,
            self.sep_prompt_token, self.worker_use_ray,
            self.max_parallel_loading_workers,
            self.disable_custom_all_reduce,
            num_prefill_hosts=self.num_prefill_hosts,
            kv_stream_segments=self.kv_stream_segments)
        speculative_config = None
        if self.speculative_model is not None:
            if self.num_decode_steps > 1:
                raise ValueError(
                    "--num-decode-steps and --speculative-model are "
                    "mutually exclusive (a spec step IS a fused window).")
            if self.enable_lora:
                raise ValueError("Speculative decoding is not supported "
                                 "with LoRA yet.")
            draft_model_config = ModelConfig(
                self.speculative_model, self.speculative_model,
                self.tokenizer_mode, self.trust_remote_code,
                self.download_dir, self.load_format, self.dtype, self.seed,
                None, None, None, model_config.max_model_len,
                self.speculative_model_quantization, self.enforce_eager,
                self.max_context_len_to_capture, self.max_logprobs)
            speculative_config = SpeculativeConfig(
                draft_model_config, self.num_speculative_tokens)
            speculative_config.verify_with_model_config(model_config)

        # A spec step plans a (k+1)-token window: the scheduler reserves
        # that many lookahead slots per sequence each step.
        num_decode_steps = (
            speculative_config.num_speculative_tokens + 1
            if speculative_config is not None else self.num_decode_steps)
        scheduler_config = SchedulerConfig(self.max_num_batched_tokens,
                                           self.max_num_seqs,
                                           model_config.max_model_len,
                                           self.max_paddings,
                                           num_decode_steps,
                                           self.warmup_mode,
                                           self.max_num_prompt_seqs,
                                           self.chunked_prefill_tokens,
                                           self.decode_priority_steps,
                                           self.mixed_batch,
                                           self.pipeline_decode)
        if self.pipeline_decode and not self.mixed_batch:
            raise ValueError(
                "--pipeline-decode requires --mixed-batch (the pipelined "
                "step is the dual-dispatch mixed step with deferred "
                "fetches).")
        if self.mixed_batch and self.sep_prompt_token:
            raise ValueError(
                "--mixed-batch is incompatible with --sep-prompt-token: "
                "the disaggregated executor already steps both phases "
                "concurrently on separate meshes.")
        if self.chunked_prefill_tokens and self.sep_prompt_token:
            raise ValueError(
                "--chunked-prefill-tokens is incompatible with "
                "--sep-prompt-token: the disaggregated prefill pool "
                "already keeps prompts off the decode mesh.")
        if self.chunked_prefill_tokens and self.enable_prefix_caching:
            raise ValueError(
                "--chunked-prefill-tokens is incompatible with "
                "--enable-prefix-caching: computed-block promotion "
                "assumes whole-prompt prefills.")
        if self.chunked_prefill_tokens % self.block_size != 0:
            raise ValueError(
                f"--chunked-prefill-tokens ({self.chunked_prefill_tokens}) "
                f"must be a multiple of --block-size ({self.block_size}): "
                "chunk boundaries must land on page boundaries so each "
                "chunk's KV fills whole pages for the next chunk's "
                "prefix attention.")
        scheduler_config.spec_decode = speculative_config is not None
        lora_config = LoRAConfig(
            max_lora_rank=self.max_lora_rank,
            max_loras=self.max_loras,
            max_cpu_loras=self.max_cpu_loras,
            lora_dtype=self.lora_dtype,
            lora_extra_vocab_size=self.lora_extra_vocab_size,
        ) if self.enable_lora else None

        model_config.verify_with_parallel_config(parallel_config)
        cache_config.verify_with_parallel_config(parallel_config)
        if lora_config:
            lora_config.verify_with_model_config(model_config)
            lora_config.verify_with_scheduler_config(scheduler_config)
        return (model_config, cache_config, parallel_config,
                scheduler_config, device_config, lora_config,
                speculative_config)


@dataclass
class AsyncEngineArgs(EngineArgs):
    """Extra knobs of the async serving engine (reference arg_utils.py:345)."""
    engine_use_ray: bool = False
    disable_log_requests: bool = False
    max_log_len: Optional[int] = None

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
        parser = EngineArgs.add_cli_args(parser)
        parser.add_argument("--engine-use-ray", action="store_true",
                            help="accepted for CLI parity; unused on TPU")
        parser.add_argument("--disable-log-requests", action="store_true")
        parser.add_argument("--max-log-len", type=int, default=None)
        return parser
