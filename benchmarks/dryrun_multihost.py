"""Two-process multi-host disaggregation dryrun + stress harness (CPU).

Validates the full multi-host Splitwise path without TPU hardware, as a
set of LEGS, each a fresh (prefill-host, decode-host) process pair joined
via jax.distributed with KV pages moved device-to-device over the
cross-host socket transfer:

  streamed  layer-streamed DCN migration (the default), greedy-exact vs
            HF and vs the single-host Splitwise engine; records
            decode-node TTFT.
  bulk      the same prompts with --kv-stream-segments 1 (one bulk
            transfer after the whole prefill) — the A/B baseline the
            streamed TTFT is compared against.
  stress    staggered arrivals (a new prompt every engine step) over a
            deliberately tight KV budget with n=2 fan-out: many
            migrations, prefill bursts landing during decode, and
            decode-side preemption all cross the host boundary.
  spec      speculative decoding across hosts: the prefill host runs the
            draft prefill, draft pages ride the wire, the decode host
            runs fused verify windows — greedy-exact vs HF.
  lora      a LoRA adapter served across hosts (lazy-loaded on both) —
            greedy-exact vs the merged-weights HF oracle.
  scaling   tokens/s at 1-pool (single-process, same devices-per-pool)
            vs 2-pool (disaggregated pair) under the same offered load —
            the scaling-efficiency probe (meaningful on real hardware;
            on CPU it proves the measurement plumbing).

Run:  python benchmarks/dryrun_multihost.py            # all legs
      python benchmarks/dryrun_multihost.py --legs streamed,bulk
(The parent spawns the process pairs and writes MULTIHOST_DRYRUN.json.)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TP = 2  # per pool
ALL_LEGS = ("streamed", "bulk", "stress", "spec", "lora", "scaling")
# Each leg gets its own port block (coordinator, 2 transfer sockets).
_BASE_PORT = 9951


def _ports(leg: str) -> dict:
    i = ALL_LEGS.index(leg)
    base = _BASE_PORT + 10 * i
    return {"coord": f"127.0.0.1:{base}",
            "xfer": [f"127.0.0.1:{base + 1}", f"127.0.0.1:{base + 2}"]}


def _engine_kwargs(leg: str, model_dir: str, process_id: int) -> dict:
    ports = _ports(leg)
    kwargs = dict(
        model=model_dir,
        dtype="float32",
        max_model_len=256,
        tensor_parallel_size=TP,
        sep_prompt_token=True,
        num_gpu_blocks_override=64,
        max_num_seqs=8,
        max_paddings=512,
        swap_space=0.05,
        distributed_coordinator=ports["coord"],
        distributed_num_processes=2,
        distributed_process_id=process_id,
        cross_host_transfer_address=ports["xfer"][process_id],
        num_prefill_hosts=1,
    )
    if leg == "bulk":
        kwargs["kv_stream_segments"] = 1
    elif leg == "stress":
        # Tight budget: 4 requests' worth of pages for 10 in flight.
        kwargs["num_gpu_blocks_override"] = 28
        kwargs["swap_space"] = 0.02
    elif leg == "spec":
        kwargs["speculative_model"] = model_dir
        kwargs["num_speculative_tokens"] = 2
    elif leg == "lora":
        kwargs.update(enable_lora=True, max_loras=2, max_lora_rank=8)
    return kwargs


def _prompts(config, rng_seed: int = 7, lens=(6, 11, 17, 23)):
    import numpy as np
    rng = np.random.RandomState(rng_seed)
    return [rng.randint(3, config.vocab_size, size=n).tolist()
            for n in lens]


def child(leg: str, process_id: int, model_dir: str,
          out_path: str) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vllm_splitwise_tpu.parallel.distributed import init_distributed
    kwargs = _engine_kwargs(leg, model_dir, process_id)
    ports = _ports(leg)
    init_distributed(ports["coord"], 2, process_id,
                     cross_host_transfer_address=kwargs[
                         "cross_host_transfer_address"])

    if process_id == 0:
        from vllm_splitwise_tpu.engine.arg_utils import EngineArgs
        from vllm_splitwise_tpu.executor.multihost_splitwise import \
            run_prefill_host
        run_prefill_host(EngineArgs(**kwargs))
        return

    result = _run_leg(leg, kwargs, model_dir)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"MULTIHOST LEG {leg}:", json.dumps(result), flush=True)
    if not result["ok"]:
        sys.exit(1)


def _migration_stats(executor) -> dict:
    stats = {
        "num_migrations": executor.num_migrations,
        "num_streamed": executor.num_streamed,
        "num_pages_moved": executor.num_pages_moved,
        "last_migration_seconds": executor.last_migration_seconds,
        "bytes_moved": executor.mover.bytes_moved,
        "num_transfers": executor.mover.num_transfers,
    }
    if getattr(executor, "phase_seconds", None):
        stats["phase_seconds"] = {
            k: round(v, 4) for k, v in executor.phase_seconds.items()}
        stats["phase_counts"] = dict(executor.phase_counts)
    return stats


def _ttfts(outs):
    return [
        (o.metrics.first_token_time - o.metrics.first_scheduled_time)
        for o in outs if o.metrics.first_token_time is not None
        and o.metrics.first_scheduled_time is not None
    ]


def _run_leg(leg: str, kwargs: dict, model_dir: str) -> dict:
    import numpy as np
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from vllm_splitwise_tpu import LLM, SamplingParams

    config = LlamaConfig.from_pretrained(model_dir)
    t0 = time.time()
    llm = LLM(**kwargs)
    startup_s = time.time() - t0
    engine = llm.llm_engine
    executor = engine.executor

    if leg == "stress":
        return _run_stress(llm, config, startup_s)
    if leg == "scaling":
        return _run_scaling_probe(llm, config, startup_s, model_dir)

    hf = LlamaForCausalLM.from_pretrained(model_dir,
                                          torch_dtype=torch.float32)
    hf.eval()
    prompts = _prompts(config)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    lora_request = None
    if leg == "lora":
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from lora.test_lora import _make_adapter
        from vllm_splitwise_tpu.lora.request import LoRARequest
        adapter_dir = os.path.join(model_dir, "adapter")
        deltas = _make_adapter(adapter_dir, config, seed=11)
        state = hf.state_dict()
        for name, delta in deltas.items():
            state[name] = state[name] + torch.tensor(delta)
        hf.load_state_dict(state)  # hf becomes the merged oracle
        lora_request = LoRARequest("a1", 1, adapter_dir)

    if leg in ("streamed", "bulk"):
        # Warm the compile caches with the SAME batch/length buckets the
        # timed run hits, so the A/B TTFT numbers measure serving, not
        # compilation.
        import numpy as np
        wrng = np.random.RandomState(99)
        warm = [wrng.randint(3, config.vocab_size, size=n).tolist()
                for n in (6, 11, 17, 23)]
        llm.generate(prompt_token_ids=warm,
                     sampling_params=SamplingParams(temperature=0.0,
                                                    max_tokens=9,
                                                    ignore_eos=True),
                     use_tqdm=False)

    t0 = time.time()
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        lora_request=lora_request, use_tqdm=False)
    gen_s = time.time() - t0

    hf_matches = []
    for ids, out in zip(prompts, outs):
        got = out.outputs[0].token_ids
        with torch.no_grad():
            ref = hf.generate(torch.tensor([ids]), max_new_tokens=8,
                              do_sample=False)
        expected = ref[0, len(ids):].tolist()
        # HF stops at EOS; the engine runs ignore_eos=True — compare the
        # overlapping prefix (tokens past HF's EOS are unconstrained).
        hf_matches.append(got[:len(expected)] == expected)

    matches = hf_matches
    engine_matches = None
    ref_path = os.path.join(model_dir, "reference_tokens.json")
    if leg in ("streamed", "bulk", "spec") and os.path.exists(ref_path):
        # Same prompts through the single-host Splitwise engine (spec
        # decode is lossless under greedy, so it shares the oracle).
        with open(ref_path) as f:
            engine_ref = json.load(f)
        engine_matches = [out.outputs[0].token_ids == engine_ref[i]
                          for i, out in enumerate(outs)]
        matches = [a and b for a, b in zip(hf_matches, engine_matches)]

    result = {
        "leg": leg,
        "ok": all(matches),
        "matches_hf_greedy": hf_matches,
        "matches_single_host_engine": engine_matches,
        "decode_node_ttft_s": _ttfts(outs),
        "startup_s": startup_s,
        "generate_s": gen_s,
        **_migration_stats(executor),
    }
    if leg == "streamed":
        result["ok"] = result["ok"] and executor.num_streamed >= 1
        # Overlap evidence: each segment's DCN transfer was enqueued at
        # push_rel_s[i] into a prefill forward lasting prefill_exec_s —
        # transfers dispatched before the forward's end ride under the
        # remaining layer groups' compute.
        result["stream_timeline"] = executor.last_stream_timeline
    if leg == "bulk":
        result["ok"] = result["ok"] and executor.num_streamed == 0
    if leg == "spec":
        stats = executor.decode_worker.model_runner.spec_stats
        result["spec_steps"] = stats.num_steps
        result["spec_acceptance_rate"] = stats.acceptance_rate
        result["ok"] = result["ok"] and stats.num_steps > 0
    executor.shutdown()
    return result


def _run_stress(llm, config, startup_s: float) -> dict:
    """Staggered arrivals over a tight KV budget: prefill bursts land
    while earlier requests decode (multiple cross-host migrations per
    run), n=2 fan-out crosses the boundary, and the scheduler preempts
    under page pressure."""
    import numpy as np

    from vllm_splitwise_tpu import SamplingParams
    engine = llm.llm_engine
    executor = engine.executor
    rng = np.random.RandomState(13)
    num_requests = 10
    prompts = [rng.randint(3, config.vocab_size,
                           size=int(rng.randint(8, 32))).tolist()
               for _ in range(num_requests)]

    max_tokens = 40  # decode growth outruns the page budget -> preemption

    def params_for(i: int) -> SamplingParams:
        if i % 3 == 2:  # n>1 across the host boundary (sampled; greedy
            # rejects best_of>1, matching the reference's validation)
            return SamplingParams(temperature=0.8, seed=1000 + i,
                                  max_tokens=max_tokens, ignore_eos=True,
                                  n=2, best_of=2)
        return SamplingParams(temperature=0.0, max_tokens=max_tokens,
                              ignore_eos=True)

    t0 = time.time()
    engine.add_request("r0", None, params_for(0), prompts[0])
    next_i = 1
    finished = {}
    steps = 0
    while engine.has_unfinished_requests():
        if next_i < num_requests:
            engine.add_request(f"r{next_i}", None, params_for(next_i),
                               prompts[next_i])
            next_i += 1
        for out in engine.step():
            if out.finished:
                finished[out.request_id] = out
        steps += 1
        assert steps < 2000, "stress leg livelocked"
    gen_s = time.time() - t0

    ok = len(finished) == num_requests
    lengths_ok = all(
        len(c.token_ids) == max_tokens for out in finished.values()
        for c in out.outputs)
    n_ok = all(
        len(finished[f"r{i}"].outputs) == (2 if i % 3 == 2 else 1)
        for i in range(num_requests))
    stats = _migration_stats(executor)
    preempted = getattr(engine.scheduler, "num_swapped_total", None)
    # Recompute-preempted sequences re-prefill on the prefill host and
    # re-migrate: more migrations than requests proves preemption crossed
    # the host boundary.
    recompute_evidence = stats["num_migrations"] > num_requests
    result = {
        "leg": "stress",
        "ok": bool(ok and lengths_ok and n_ok
                   and stats["num_migrations"] > 3),
        "preemption_crossed_boundary": bool(
            recompute_evidence or (preempted or 0) > 0),
        "finished": len(finished),
        "lengths_ok": lengths_ok,
        "n_fanout_ok": n_ok,
        "engine_steps": steps,
        "num_preempted": preempted,
        "startup_s": startup_s,
        "generate_s": gen_s,
        **stats,
    }
    executor.shutdown()
    return result


def _run_scaling_probe(llm, config, startup_s: float,
                       model_dir: str) -> dict:
    """Tokens/s at 2-pool (this disaggregated pair) vs 1-pool (a fresh
    single-process engine on the same per-pool device count), same
    offered load.  On real multi-host TPU hardware this is the
    scaling-efficiency number; on CPU it validates the measurement."""
    import numpy as np

    from vllm_splitwise_tpu import SamplingParams
    rng = np.random.RandomState(23)
    prompts = [rng.randint(3, config.vocab_size,
                           size=int(rng.randint(12, 48))).tolist()
               for _ in range(12)]
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)

    t0 = time.time()
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    dis_s = time.time() - t0
    dis_tokens = sum(len(c.token_ids) for o in outs for c in o.outputs)
    executor = llm.llm_engine.executor
    stats = _migration_stats(executor)
    executor.shutdown()

    # 1-pool baseline: same tp on this host's devices, no disaggregation.
    one = subprocess.run(
        [sys.executable, __file__, "--one-pool-probe",
         "--model-dir", model_dir],
        capture_output=True, text=True, cwd=REPO)
    baseline = None
    for line in one.stdout.splitlines():
        if line.startswith("ONE_POOL "):
            baseline = json.loads(line[len("ONE_POOL "):])
    ok = one.returncode == 0 and baseline is not None and dis_tokens > 0
    result = {
        "leg": "scaling",
        "ok": bool(ok),
        "two_pool_tokens_per_s": dis_tokens / dis_s,
        "two_pool_tokens": dis_tokens,
        "two_pool_seconds": dis_s,
        "one_pool": baseline,
        "startup_s": startup_s,
        **stats,
    }
    if baseline:
        ratio = (dis_tokens / dis_s) / baseline["tokens_per_s"]
        result["throughput_ratio_2pool_over_1pool"] = ratio
        # North-star: >=85% scaling efficiency on real 2-host hardware
        # (BASELINE.md).  The CPU-mesh number is NOT that measurement —
        # virtual-device compute is serialized on host cores — but the
        # phase breakdown shows WHERE 2-pool time goes: decode_execute
        # (device), send_prefill (serialize+ship, control plane),
        # collect_prefill (exposed remote-prefill latency the concurrent
        # decode did not hide), scatter (page landing).
        result["scaling_efficiency_target"] = 0.85
        ph = result.get("phase_seconds", {})
        # scatter is a sub-phase of collect_prefill — exclude it from
        # the denominator.
        total = sum(v for k, v in ph.items() if k != "scatter") or None
        if total:
            result["phase_fraction"] = {
                k: round(v / total, 3) for k, v in ph.items()}
            dominant = max((k for k in ph if k != "scatter"),
                           key=lambda k: ph[k])
            result["analysis"] = {
                "dominant_phase": dominant,
                "note": (
                    "collect_prefill is remote-prefill latency the "
                    "concurrent decode window did NOT hide; on this CPU "
                    "mesh the interpreted prefill compute alone exceeds "
                    "all decode work, so the 2-pool ratio is bounded by "
                    "prefill, not by the control plane (send_prefill = "
                    "metadata pickle + posting DCN segment receives). "
                    "On real v5e the same phases are ~100 ms-scale and "
                    "the overlap covers them; this leg's value is the "
                    "attribution, not the ratio."
                ) if dominant == "collect_prefill" else (
                    "control-plane bound: send_prefill dominates — "
                    "serialize/ship cost exceeds the compute it "
                    "overlaps."),
            }
    return result


def one_pool_probe(model_dir: str) -> None:
    """Single-process, single-pool baseline for the scaling probe."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from transformers import LlamaConfig

    from vllm_splitwise_tpu import LLM, SamplingParams
    config = LlamaConfig.from_pretrained(model_dir)
    llm = LLM(model=model_dir, dtype="float32", max_model_len=256,
              tensor_parallel_size=TP, num_gpu_blocks_override=64,
              max_num_seqs=8, max_paddings=512, swap_space=0.05)
    rng = np.random.RandomState(23)
    prompts = [rng.randint(3, config.vocab_size,
                           size=int(rng.randint(12, 48))).tolist()
               for _ in range(12)]
    sp = SamplingParams(temperature=0.0, max_tokens=16, ignore_eos=True)
    t0 = time.time()
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    dt = time.time() - t0
    tokens = sum(len(c.token_ids) for o in outs for c in o.outputs)
    print("ONE_POOL " + json.dumps({
        "tokens": tokens, "seconds": dt, "tokens_per_s": tokens / dt}),
        flush=True)


def single_host_reference(model_dir: str, ref_path: str) -> None:
    """Oracle: the SAME prompts through the single-process Splitwise
    engine (4 virtual devices, 2 per pool) — the multi-host run must
    reproduce these tokens exactly."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=4"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from transformers import LlamaConfig

    from vllm_splitwise_tpu import LLM, SamplingParams
    config = LlamaConfig.from_pretrained(model_dir)
    llm = LLM(model=model_dir, dtype="float32", max_model_len=256,
              tensor_parallel_size=TP, sep_prompt_token=True,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.05)
    prompts = _prompts(config)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    with open(ref_path, "w") as f:
        json.dump([o.outputs[0].token_ids for o in outs], f)


def _run_pair(leg: str, model_dir: str, leg_out: str,
              timeout: float) -> dict:
    def spawn(pid: int) -> subprocess.Popen:
        return subprocess.Popen(
            [sys.executable, __file__, "--leg", leg,
             "--process-id", str(pid), "--model-dir", model_dir,
             "--out", leg_out],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)

    procs = [spawn(0), spawn(1)]
    deadline = time.time() + timeout
    rcs = [None, None]
    while time.time() < deadline and None in rcs:
        for i, p in enumerate(procs):
            if rcs[i] is None:
                rcs[i] = p.poll()
        time.sleep(1)
    for i, p in enumerate(procs):
        if rcs[i] is None:
            p.kill()
            rcs[i] = -9
    logs = [p.stdout.read() for p in procs]
    if rcs != [0, 0]:
        for i, log in enumerate(logs):
            print(f"==== {leg} process {i} (rc={rcs[i]}) ====")
            print(log[-4000:])
        return {"leg": leg, "ok": False, "rcs": rcs}
    with open(leg_out) as f:
        return json.load(f)


def parent(out_path: str, timeout: float, legs) -> int:
    import tempfile
    model_dir = tempfile.mkdtemp(prefix="mh_tiny_")
    build = subprocess.run(
        [sys.executable, "-c", f"""
import sys
sys.path.insert(0, {REPO!r})
sys.path.insert(0, {os.path.join(REPO, 'tests')!r})
from models.utils import (hf_model_and_weights, save_local_checkpoint,
                          save_tiny_tokenizer, tiny_llama_config)
config = tiny_llama_config()
hf, weights = hf_model_and_weights(config)
save_local_checkpoint(config, weights, {model_dir!r})
save_tiny_tokenizer({model_dir!r}, config.vocab_size)
"""],
        capture_output=True, text=True, cwd=REPO)
    if build.returncode != 0:
        print(build.stdout, build.stderr)
        return 1

    if any(leg in ("streamed", "bulk", "spec") for leg in legs):
        ref_path = os.path.join(model_dir, "reference_tokens.json")
        ref = subprocess.run(
            [sys.executable, __file__, "--single-host-ref",
             "--model-dir", model_dir, "--out", ref_path],
            capture_output=True, text=True, cwd=REPO)
        if ref.returncode != 0:
            print(ref.stdout[-3000:], ref.stderr[-3000:])
            return 1

    results = {}
    per_leg_timeout = max(timeout / max(len(legs), 1), 120.0)
    for leg in legs:
        leg_out = os.path.join(model_dir, f"leg_{leg}.json")
        results[leg] = _run_pair(leg, model_dir, leg_out, per_leg_timeout)
        print(f"leg {leg}: {'OK' if results[leg].get('ok') else 'FAIL'}")

    combined = {
        "ok": all(r.get("ok") for r in results.values()),
        "legs": results,
    }
    if "streamed" in results and "bulk" in results and combined["ok"]:
        s = results["streamed"]["decode_node_ttft_s"]
        b = results["bulk"]["decode_node_ttft_s"]
        combined["ttft_streamed_mean_s"] = sum(s) / len(s)
        combined["ttft_bulk_mean_s"] = sum(b) / len(b)
    with open(out_path, "w") as f:
        json.dump(combined, f, indent=1)
    print(("multi-host dryrun OK" if combined["ok"] else
           "multi-host dryrun FAILED") + f"; result in {out_path}")
    return 0 if combined["ok"] else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", type=str, default="streamed")
    ap.add_argument("--legs", type=str, default=",".join(ALL_LEGS),
                    help="comma-separated legs for the parent to run")
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--model-dir", type=str, default=None)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "MULTIHOST_DRYRUN.json"))
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--single-host-ref", action="store_true")
    ap.add_argument("--one-pool-probe", action="store_true")
    args = ap.parse_args()
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    if args.single_host_ref:
        single_host_reference(args.model_dir, args.out)
        sys.exit(0)
    if args.one_pool_probe:
        one_pool_probe(args.model_dir)
        sys.exit(0)
    if args.process_id is None:
        sys.exit(parent(args.out, args.timeout,
                        [x for x in args.legs.split(",") if x]))
    child(args.leg, args.process_id, args.model_dir, args.out)
