"""Guided-decoding request plumbing (reference role:
vllm/model_executor/guided_decoding.py): build the right logits processor
from an OpenAI-surface request, cached per (guide, tokenizer), off the
event loop."""
from __future__ import annotations

import asyncio
import concurrent.futures
import json
from typing import Optional, Tuple

_executor = concurrent.futures.ThreadPoolExecutor(max_workers=2)


async def get_guided_decoding_logits_processor(request, tokenizer):
    """request: CompletionRequest | ChatCompletionRequest.  Returns a
    logits processor or None."""
    guide, mode = _get_guide_and_mode(request)
    if guide is None:
        return None
    loop = asyncio.get_running_loop()
    return await loop.run_in_executor(_executor,
                                      _get_cached_logits_processor, guide,
                                      mode, tokenizer)


def _get_guide_and_mode(request) -> Tuple[Optional[str], Optional[str]]:
    given = [name for name in ("guided_json", "guided_regex",
                               "guided_choice")
             if getattr(request, name, None) not in (None, [], "")]
    if len(given) > 1:
        raise ValueError(
            f"You can only use one kind of guided decoding, got: {given}")
    if getattr(request, "guided_json", None) is not None:
        json_schema = request.guided_json
        if hasattr(json_schema, "model_dump"):
            json_schema = json_schema.model_dump()
        if isinstance(json_schema, dict):
            json_schema = json.dumps(json_schema)
        return json_schema, "json"
    if getattr(request, "guided_regex", None):
        return request.guided_regex, "regex"
    if getattr(request, "guided_choice", None):
        return json.dumps(request.guided_choice), "choice"
    return None, None


_processor_cache = {}


def _get_cached_logits_processor(guide: str, mode: str, tokenizer):
    from vllm_splitwise_tpu.layers.guided_logits_processors import (
        ChoiceLogitsProcessor, JSONLogitsProcessor, RegexLogitsProcessor)
    key = (guide, mode, id(tokenizer))
    if key in _processor_cache:
        return _processor_cache[key]
    if mode == "json":
        proc = JSONLogitsProcessor(guide, tokenizer)
    elif mode == "regex":
        proc = RegexLogitsProcessor(guide, tokenizer)
    elif mode == "choice":
        proc = ChoiceLogitsProcessor(json.loads(guide), tokenizer)
    else:
        raise ValueError(f"Unknown guided decoding mode {mode}")
    _processor_cache[key] = proc
    return proc
