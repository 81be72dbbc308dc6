"""Tokenizer loading + streaming-safe incremental detokenization.

Role-parity with the reference's ``vllm/transformers_utils/tokenizer.py``
(get_tokenizer, TokenizerGroup, detokenize_incrementally:187).  The
incremental detokenizer solves the classic streaming problem: BPE/SP
tokenizers are not prefix-stable, so decoding token-by-token can emit
garbage at multi-byte boundaries.  The fix is the two-offset scheme —
re-decode a small sliding window of tokens and only emit the text that
extends beyond the previously read offset, holding back replacement
characters (incomplete UTF-8).
"""
from __future__ import annotations

from typing import List, Optional, Tuple, Union

from transformers import (AutoTokenizer, PreTrainedTokenizer,
                          PreTrainedTokenizerFast)

from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.utils import LRUCache

logger = init_logger(__name__)

AnyTokenizer = Union[PreTrainedTokenizer, PreTrainedTokenizerFast]

# Number of tokens re-decoded to give the tokenizer context at the window
# start (enough for any sane merge rule / multi-byte sequence).
INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET = 5


def get_tokenizer(
    tokenizer_name: str,
    *args,
    tokenizer_mode: str = "auto",
    trust_remote_code: bool = False,
    tokenizer_revision: Optional[str] = None,
    **kwargs,
) -> AnyTokenizer:
    if tokenizer_mode == "slow":
        if kwargs.get("use_fast", False):
            raise ValueError("Cannot use the fast tokenizer in slow tokenizer mode.")
        kwargs["use_fast"] = False
    try:
        tokenizer = AutoTokenizer.from_pretrained(
            tokenizer_name,
            *args,
            trust_remote_code=trust_remote_code,
            revision=tokenizer_revision,
            **kwargs)
    except ValueError as e:
        if (not trust_remote_code
                and "requires you to execute the tokenizer file" in str(e)):
            raise RuntimeError(
                "Failed to load the tokenizer. Consider setting "
                "`trust_remote_code=True`.") from e
        raise
    if not isinstance(tokenizer, PreTrainedTokenizerFast):
        logger.warning(
            "Using a slow tokenizer. This may cause a significant "
            "slowdown. Consider using a fast tokenizer instead.")
    return tokenizer


class TokenizerGroup:
    """A base tokenizer plus per-LoRA tokenizers cached by adapter id
    (reference vllm/transformers_utils/tokenizer.py:91)."""

    def __init__(self,
                 tokenizer_id: str,
                 enable_lora: bool = False,
                 max_num_seqs: Optional[int] = None,
                 **tokenizer_config) -> None:
        self.tokenizer_id = tokenizer_id
        self.tokenizer_config = tokenizer_config
        self.enable_lora = enable_lora
        self.tokenizer = get_tokenizer(tokenizer_id, **tokenizer_config)
        if enable_lora:
            self.lora_tokenizers = LRUCache(capacity=max_num_seqs or 128)
        else:
            self.lora_tokenizers = None

    def encode(self,
               prompt: str,
               request_id: Optional[str] = None,
               lora_request=None) -> List[int]:
        tokenizer = self.get_lora_tokenizer(lora_request)
        return tokenizer.encode(prompt)

    def get_lora_tokenizer(self, lora_request=None) -> AnyTokenizer:
        if not lora_request or self.lora_tokenizers is None:
            return self.tokenizer
        lora_id = lora_request.lora_int_id
        tok = self.lora_tokenizers.get(lora_id)
        if tok is None:
            try:
                tok = get_tokenizer(lora_request.lora_local_path,
                                    **self.tokenizer_config)
            except (OSError, ValueError):
                # Adapter dir ships no tokenizer: use the base model's.
                tok = self.tokenizer
            self.lora_tokenizers.put(lora_id, tok)
        return tok


def _convert_tokens_to_string_with_added_encoders(
    tokenizer: AnyTokenizer,
    output_tokens: List[str],
    skip_special_tokens: bool,
    spaces_between_special_tokens: bool,
) -> str:
    # Added/special tokens must not pass through the underlying decoder
    # (sentencepiece would mangle them); stitch them around decoded runs.
    sub_texts: List[str] = []
    current: List[str] = []
    all_special_tokens = set(tokenizer.all_special_tokens)
    added_vocab = set(tokenizer.get_added_vocab())
    for token in output_tokens:
        if skip_special_tokens and token in all_special_tokens:
            continue
        if token in added_vocab:
            if current:
                sub_texts.append(tokenizer.convert_tokens_to_string(current))
                current = []
            sub_texts.append(token)
        else:
            current.append(token)
    if current:
        sub_texts.append(tokenizer.convert_tokens_to_string(current))
    if spaces_between_special_tokens:
        return " ".join(sub_texts)
    return "".join(sub_texts)


def detokenize_incrementally(
    tokenizer: AnyTokenizer,
    all_input_ids: List[int],
    prev_tokens: Optional[List[str]],
    prefix_offset: int = 0,
    read_offset: int = 0,
    skip_special_tokens: bool = False,
    spaces_between_special_tokens: bool = True,
) -> Tuple[List[str], str, int, int]:
    """Decode only the newly stable text after appending one token.

    Returns (new_tokens, new_decoded_text, new_prefix_offset,
    new_read_offset).  Call once per generated token, threading the offsets
    and token list through (stored on the Sequence).
    """
    new_token_id = all_input_ids[-1]
    if prev_tokens is None:
        # First call: convert the whole prefix.
        new_tokens = tokenizer.convert_ids_to_tokens(
            all_input_ids, skip_special_tokens=skip_special_tokens)
        # Out-of-vocab ids decode to None on fast tokenizers; never let a
        # bad id crash the streaming path.
        new_tokens = [t if t is not None else "" for t in new_tokens]
        output_tokens = new_tokens
        prefix_offset = max(
            len(output_tokens) - INITIAL_INCREMENTAL_DETOKENIZATION_OFFSET, 0)
        if skip_special_tokens and new_token_id in getattr(
                tokenizer, "all_special_ids", ()):
            # The newest id was dropped from output_tokens entirely —
            # nothing is newly readable.  Without this, the last PROMPT
            # token lands in the [read_offset:] window and is re-emitted
            # as generated text (e.g. an immediate EOS produced the
            # previous token's text instead of "").
            read_offset = len(output_tokens)
        else:
            read_offset = max(len(output_tokens) - 1, 0)
    else:
        if skip_special_tokens and new_token_id in getattr(
                tokenizer, "all_special_ids", ()):
            return [], "", prefix_offset, read_offset
        new_tokens = tokenizer.convert_ids_to_tokens(
            [new_token_id], skip_special_tokens=skip_special_tokens)
        new_tokens = [t if t is not None else "" for t in new_tokens]
        output_tokens = prev_tokens + new_tokens

    # Fast path for plain tokenizers; slow path handles added vocab.
    if tokenizer.is_fast or not tokenizer.get_added_vocab():
        prefix_text = tokenizer.convert_tokens_to_string(
            output_tokens[prefix_offset:read_offset])
        new_text = tokenizer.convert_tokens_to_string(
            output_tokens[prefix_offset:])
    else:
        prefix_text = _convert_tokens_to_string_with_added_encoders(
            tokenizer,
            output_tokens[prefix_offset:read_offset],
            skip_special_tokens=skip_special_tokens,
            spaces_between_special_tokens=spaces_between_special_tokens)
        new_text = _convert_tokens_to_string_with_added_encoders(
            tokenizer,
            output_tokens[prefix_offset:],
            skip_special_tokens=skip_special_tokens,
            spaces_between_special_tokens=spaces_between_special_tokens)

    if len(new_text) > len(prefix_text) and not new_text.endswith("�"):
        # Stable text extends past what was already read: emit the suffix
        # and advance both offsets.
        new_text = new_text[len(prefix_text):]
        return new_tokens, new_text, read_offset, len(output_tokens)
    # Otherwise the tail is an incomplete multi-byte sequence — emit
    # nothing and keep the window.
    return new_tokens, "", prefix_offset, read_offset
