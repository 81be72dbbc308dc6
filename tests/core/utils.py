"""Helpers for scheduler/block-manager tests."""
import time
from typing import List, Optional, Tuple

from vllm_splitwise_tpu.sampling_params import SamplingParams
from vllm_splitwise_tpu.sequence import Sequence, SequenceGroup


def create_dummy_prompt(
    request_id: str,
    prompt_length: int,
    block_size: Optional[int] = None,
    best_of: int = 1,
    max_tokens: int = 16,
) -> Tuple[Sequence, SequenceGroup]:
    if not block_size:
        block_size = prompt_length
    # Token ids 0..prompt_length-1, arbitrary content.
    prompt_tokens = list(range(prompt_length))
    prompt_str = " ".join([str(t) for t in prompt_tokens])
    seq_id = int(request_id) if request_id.isdigit() else abs(hash(request_id))
    prompt = Sequence(seq_id, prompt_str, prompt_tokens, block_size)
    seq_group = SequenceGroup(
        request_id,
        [prompt],
        SamplingParams(best_of=best_of,
                       temperature=1.0 if best_of > 1 else 0.0,
                       max_tokens=max_tokens),
        time.time(),
    )
    return prompt, seq_group


def create_seq_group(
    seq_prompt_lens: int = 1024,
    seq_output_lens: Optional[List[int]] = None,
    request_id: str = "0",
    seq_id_start: int = 0,
    block_size: int = 16,
) -> SequenceGroup:
    from vllm_splitwise_tpu.sequence import Logprob

    if seq_output_lens is None:
        seq_output_lens = [128]
    assert len(seq_output_lens) > 0
    prompt_token_ids = [0] * seq_prompt_lens
    seqs = []
    for seq_id_offset, output_len in enumerate(seq_output_lens):
        seq = Sequence(
            seq_id=seq_id_start + seq_id_offset,
            prompt="",
            prompt_token_ids=prompt_token_ids,
            block_size=block_size,
        )
        for i in range(output_len):
            seq.append_token(token_id=i, logprobs={i: Logprob(0.0)})
        seqs.append(seq)

    return SequenceGroup(
        request_id=request_id,
        seqs=seqs,
        sampling_params=SamplingParams(best_of=len(seq_output_lens),
                                       temperature=1.0),
        arrival_time=time.time(),
    )
