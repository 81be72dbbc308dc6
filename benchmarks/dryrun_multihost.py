"""Two-process multi-host disaggregation dryrun (CPU devices).

Validates the full multi-host Splitwise path without TPU hardware:

  process 0 (prefill host): PrefillHostServer on a 2-device CPU mesh
  process 1 (decode host):  the ENGINE (LLM) on its own 2-device mesh

joined via jax.distributed, prompts prefilled remotely, KV pages moved
device-to-device over JAX's cross-host socket transfer, decode running
locally — and greedy outputs checked token-for-token against HF.

Run:  python benchmarks/dryrun_multihost.py
(The parent spawns both processes and writes MULTIHOST_DRYRUN.json.)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COORD = "127.0.0.1:9951"
TP = 2  # per pool


def _engine_kwargs(model_dir: str, process_id: int) -> dict:
    return dict(
        model=model_dir,
        dtype="float32",
        max_model_len=256,
        tensor_parallel_size=TP,
        sep_prompt_token=True,
        num_gpu_blocks_override=64,
        max_num_seqs=8,
        max_paddings=512,
        swap_space=0.05,
        distributed_coordinator=COORD,
        distributed_num_processes=2,
        distributed_process_id=process_id,
        cross_host_transfer_address=f"127.0.0.1:{9955 + process_id}",
        num_prefill_hosts=1,
    )


def child(process_id: int, model_dir: str, out_path: str) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=2"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vllm_splitwise_tpu.parallel.distributed import init_distributed
    kwargs = _engine_kwargs(model_dir, process_id)
    init_distributed(COORD, 2, process_id,
                     cross_host_transfer_address=kwargs[
                         "cross_host_transfer_address"])

    if process_id == 0:
        from vllm_splitwise_tpu.engine.arg_utils import EngineArgs
        from vllm_splitwise_tpu.executor.multihost_splitwise import \
            run_prefill_host
        run_prefill_host(EngineArgs(**kwargs))
        return

    # ---- decode host: the engine ----
    import numpy as np
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from vllm_splitwise_tpu import LLM, SamplingParams

    t0 = time.time()
    llm = LLM(**kwargs)
    startup_s = time.time() - t0

    config = LlamaConfig.from_pretrained(model_dir)
    hf = LlamaForCausalLM.from_pretrained(model_dir,
                                          torch_dtype=torch.float32)
    hf.eval()

    rng = np.random.RandomState(7)
    prompts = [
        rng.randint(3, config.vocab_size, size=n).tolist()
        for n in (6, 11, 17, 23)
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    t0 = time.time()
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    gen_s = time.time() - t0

    matches = []
    hf_matches = []
    ref_path = os.path.join(model_dir, "reference_tokens.json")
    with open(ref_path) as f:
        engine_ref = json.load(f)
    for i, (ids, out) in enumerate(zip(prompts, outs)):
        got = out.outputs[0].token_ids
        matches.append(got == engine_ref[i])
        with torch.no_grad():
            ref = hf.generate(torch.tensor([ids]), max_new_tokens=8,
                              do_sample=False)
        expected = ref[0, len(ids):].tolist()
        # HF stops at EOS; the engine runs ignore_eos=True — compare the
        # overlapping prefix (tokens past HF's EOS are unconstrained).
        hf_matches.append(got[:len(expected)] == expected)

    executor = llm.llm_engine.executor
    ttfts = [
        (o.metrics.first_token_time - o.metrics.first_scheduled_time)
        for o in outs if o.metrics.first_token_time is not None
        and o.metrics.first_scheduled_time is not None
    ]
    result = {
        "ok": all(matches),
        "matches_single_host_engine": matches,
        "matches_hf_greedy": hf_matches,
        "num_migrations": executor.num_migrations,
        "num_pages_moved": executor.num_pages_moved,
        "last_migration_seconds": executor.last_migration_seconds,
        "bytes_moved": executor.mover.bytes_moved,
        "decode_node_ttft_s": ttfts,
        "startup_s": startup_s,
        "generate_s": gen_s,
    }
    executor.shutdown()
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print("MULTIHOST DRYRUN:", json.dumps(result), flush=True)
    if not all(matches):
        sys.exit(1)


def single_host_reference(model_dir: str, ref_path: str) -> None:
    """Oracle: the SAME prompts through the single-process Splitwise
    engine (4 virtual devices, 2 per pool) — the multi-host run must
    reproduce these tokens exactly."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=4"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from transformers import LlamaConfig

    from vllm_splitwise_tpu import LLM, SamplingParams
    config = LlamaConfig.from_pretrained(model_dir)
    llm = LLM(model=model_dir, dtype="float32", max_model_len=256,
              tensor_parallel_size=TP, sep_prompt_token=True,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.05)
    rng = np.random.RandomState(7)
    prompts = [rng.randint(3, config.vocab_size, size=n).tolist()
               for n in (6, 11, 17, 23)]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    with open(ref_path, "w") as f:
        json.dump([o.outputs[0].token_ids for o in outs], f)


def parent(out_path: str, timeout: float) -> int:
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

    ref_path = os.path.join(model_dir, "reference_tokens.json")
    ref = subprocess.run(
        [sys.executable, __file__, "--single-host-ref",
         "--model-dir", model_dir, "--out", ref_path],
        capture_output=True, text=True, cwd=REPO)
    if ref.returncode != 0:
        print(ref.stdout[-3000:], ref.stderr[-3000:])
        return 1

    def spawn(pid: int) -> subprocess.Popen:
        return subprocess.Popen(
            [sys.executable, __file__, "--process-id", str(pid),
             "--model-dir", model_dir, "--out", out_path],
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
            print(f"==== process {i} (rc={rcs[i]}) ====")
            print(log[-4000:])
        return 1
    print(f"multi-host dryrun OK; result in {out_path}")
    tail = [ln for ln in logs[1].splitlines() if "MULTIHOST DRYRUN" in ln]
    if tail:
        print(tail[-1])
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--model-dir", type=str, default=None)
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "MULTIHOST_DRYRUN.json"))
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--single-host-ref", action="store_true")
    args = ap.parse_args()
    if args.single_host_ref:
        sys.path.insert(0, REPO)
        sys.path.insert(0, os.path.join(REPO, "tests"))
        single_host_reference(args.model_dir, args.out)
        sys.exit(0)
    if args.process_id is None:
        sys.exit(parent(args.out, args.timeout))
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    child(args.process_id, args.model_dir, args.out)
