"""HF model-config loading (reference role: vllm/transformers_utils/config.py)."""
from __future__ import annotations

from typing import Optional

from transformers import AutoConfig, PretrainedConfig


def get_hf_config(
    model: str,
    trust_remote_code: bool = False,
    revision: Optional[str] = None,
    code_revision: Optional[str] = None,
) -> PretrainedConfig:
    try:
        config = AutoConfig.from_pretrained(
            model,
            trust_remote_code=trust_remote_code,
            revision=revision,
            code_revision=code_revision,
        )
    except ValueError as e:
        if (not trust_remote_code
                and "requires you to execute the configuration file" in str(e)):
            raise RuntimeError(
                "Failed to load the model config. If the model is a custom "
                "model not yet available in the HuggingFace transformers "
                "library, consider setting `trust_remote_code=True` or using "
                "the `--trust-remote-code` flag.") from e
        raise
    return config
